package graft.stats

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Weighted second-moment (Gram) accumulation — the single distributed
  * primitive behind GREG calibration, closed-form OLS/WLS, IRLS logistic,
  * and linearization variance (SURVEY.md §7.3; reference call sites
  * `RegDI2.R:188-193,209`, `PC.R:221-230,272`).
  *
  * Design note (100 TB): rather than a `TypedImperativeAggregate`, the
  * moments are expressed as a single multi-column `agg` of plain `sum`
  * expressions (`Σ w·xᵢ·xⱼ` for i≤j, `Σ w·xᵢ`, `Σ w·xᵢ·y`, …). Catalyst
  * compiles this to one whole-stage-codegen'd partial/final HashAggregate:
  * O(k²) state per task (k ≤ ~8 here), map-side combine, one shuffle of a
  * single tiny row, zero driver-side data movement. The k×k solve happens
  * on the driver via breeze (`\`), and the solution is broadcast back
  * implicitly as literals in subsequent projections.
  */
final case class GramResult(
    xtwx: DenseMatrix[Double], // Σ w · x xᵀ   (k×k)
    xtw: DenseVector[Double],  // Σ w · x      (k)
    xtwy: DenseVector[Double], // Σ w · x · y  (k; zeros when y absent)
    sw: Double,                // Σ w
    swy: Double,               // Σ w · y
    swyy: Double,              // Σ w · y²
    n: Long                    // row count
) {
  /** Solve (XᵀWX) b = XᵀWy — WLS/OLS coefficients. */
  def solve(): DenseVector[Double] = solve(xtwy)
  /** Solve (XᵀWX) b = rhs — e.g. calibration λ.
    *
    * k ≤ [[Det.maxCramerK]] uses the deterministic Cramer expansion so the
    * result is the exact expression the SQL oracles evaluate (see [[Det]]);
    * larger systems fall back to pivoted LU. */
  def solve(rhs: DenseVector[Double]): DenseVector[Double] = {
    val k = rhs.length
    if (k <= Det.maxCramerK) {
      val m = IndexedSeq.tabulate(k, k)((i, j) => xtwx(i, j))
      DenseVector(Det.solve(m, IndexedSeq.tabulate(k)(rhs(_))).toArray)
    } else xtwx \ rhs
  }
}

/** One Gram computation inside a fused [[Gram.momentsMulti]] pass:
  * moments of `xCols` (optionally with `y`) under weight `w`, restricted
  * to rows where `mask` holds. Masking via `when(mask, term)` (no
  * otherwise) makes excluded rows contribute NULL, which `sum`/`count`
  * skip — bit-identical to `df.filter(mask)` + a standalone
  * [[Gram.moments]] because the exact-decimal sums see the same multiset
  * of addends. */
final case class GramSpec(
    xCols: Seq[Column],
    w: Column = lit(1.0),
    y: Option[Column] = None,
    mask: Option[Column] = None,
    completeCase: Boolean = false)

object Gram {

  /** One-pass weighted moments of `xCols` (and optionally `yCol`) under
    * weight `w`. Null rows contribute null products, which Spark's `sum`
    * skips — matching the reference's pervasive `na.rm=TRUE`.
    */
  def moments(
      df: DataFrame,
      xCols: Seq[Column],
      w: Column = lit(1.0),
      yCol: Option[Column] = None,
      exact: Boolean = true,
      completeCase: Boolean = false
  ): GramResult = {
    val (res, _) = momentsMulti(df,
      Seq("g" -> GramSpec(xCols, w, yCol, completeCase = completeCase)),
      Nil, exact)
    res("g")
  }

  /** SEVERAL Gram computations (each with its own mask/weight/terms) plus
    * arbitrary extra aggregate columns, fused into ONE distributed pass.
    *
    * This is the scale lever for the estimator pipelines: RegDI/PC need a
    * calibration Gram, an outcome-model Gram, and a handful of totals —
    * all independent given the driver-side solves between them. Fusing
    * them turns 3-4 full-table scans into one partial/final HashAggregate
    * job (still O(k²) state per task, one tiny shuffled row). Returns the
    * per-spec [[GramResult]]s and the Row of `extraAggs` values.
    */
  def momentsMulti(
      df: DataFrame,
      specs: Seq[(String, GramSpec)],
      extraAggs: Seq[Column] = Nil,
      exact: Boolean = true
  ): (Map[String, GramResult], Row) = {
    // dsum = exact-decimal summation: order-independent, so the moments
    // (and everything solved from them) are bit-identical under any
    // repartitioning — a tested invariant (SURVEY.md §5 property tests).
    // `exact = false` uses plain double sums (~4× faster) where run-to-
    // run bit determinism isn't required (e.g. ANOVA's wide Gram).
    val dsum: Column => Column =
      if (exact) graft.util.Tables.dsum else sum
    require(specs.map(_._1).distinct.size == specs.size,
      "duplicate Gram spec names")
    require(specs.nonEmpty || extraAggs.nonEmpty,
      "momentsMulti needs at least one spec or extra aggregate")
    def aggsFor(p: String, s: GramSpec): Seq[Column] = {
      val k = s.xCols.size
      val y = s.y.getOrElse(lit(0.0))
      // completeCase = R's lm/glm row-wise deletion: a row with ANY
      // null term/response/weight is excluded from EVERY moment. The
      // default per-term null-skip (na.rm semantics, right for totals)
      // is silently WRONG for model fits — sums not referencing the
      // null column keep rows the others drop, so the solved system
      // mixes two row multisets and beta matches no dataset (r15
      // review). Fit paths (Ols.fit, Logistic.fit, the estimators'
      // outcome/measurement-error specs) set it.
      val ccMask: Option[Column] =
        if (!s.completeCase) s.mask
        else {
          val allPresent = (s.xCols ++ s.y.toSeq :+ s.w)
            .map(_.isNotNull).reduce(_ && _)
          Some(s.mask.map(_ && allPresent).getOrElse(allPresent))
        }
      def m(term: Column): Column = ccMask match {
        case Some(f) => when(f, term)
        case None    => term
      }
      val upper = for { i <- 0 until k; j <- i until k }
        yield dsum(m(s.w * s.xCols(i) * s.xCols(j))).as(s"${p}_xx_${i}_$j")
      val firsts = (0 until k).map(i => dsum(m(s.w * s.xCols(i))).as(s"${p}_xw_$i"))
      // y-less specs skip the k+2 y-moment aggregates entirely — each
      // was an exact-decimal cast + sum of w·x·0.0 per row on the
      // full-table fused pass, pure waste (r15 review); the zeros are
      // synthesized in the result assembly below
      val xy =
        if (s.y.isEmpty) Nil
        else (0 until k).map(i =>
          dsum(m(s.w * s.xCols(i) * y)).as(s"${p}_xy_$i"))
      val yTail =
        if (s.y.isEmpty) Nil
        else Seq(dsum(m(s.w * y)).as(s"${p}_swy"),
          dsum(m(s.w * y * y)).as(s"${p}_swyy"))
      upper ++ firsts ++ xy ++ Seq(dsum(m(s.w)).as(s"${p}_sw")) ++
        yTail :+ count(m(lit(1))).as(s"${p}_n")
    }
    val aggs = specs.flatMap { case (p, s) => aggsFor(p, s) } ++ extraAggs
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()

    // NULL aggregate → 0.0 is the na.rm contract for an empty mask or
    // an all-NULL column (R: sum(c(NA), na.rm=TRUE) = 0). Under the
    // default ANSI mode a decimal-sum OVERFLOW throws before reaching
    // here; only a session that disables ANSI could conflate overflow
    // with the legitimate zero (r15 review note).
    def d(name: String): Double =
      if (row.isNullAt(row.fieldIndex(name))) 0.0
      else row.getAs[Number](name).doubleValue()

    val results = specs.map { case (p, s) =>
      val k = s.xCols.size
      val m = DenseMatrix.zeros[Double](k, k)
      for { i <- 0 until k; j <- i until k } {
        val v = d(s"${p}_xx_${i}_$j"); m(i, j) = v; m(j, i) = v
      }
      p -> GramResult(
        xtwx = m,
        xtw = DenseVector((0 until k).map(i => d(s"${p}_xw_$i")).toArray),
        xtwy =
          if (s.y.isEmpty) DenseVector.zeros[Double](k)
          else DenseVector((0 until k).map(i => d(s"${p}_xy_$i")).toArray),
        sw = d(s"${p}_sw"),
        swy = if (s.y.isEmpty) 0.0 else d(s"${p}_swy"),
        swyy = if (s.y.isEmpty) 0.0 else d(s"${p}_swyy"),
        n = row.getAs[Long](s"${p}_n")
      )
    }.toMap
    (results, row)
  }

  def moments(df: DataFrame, xCols: Seq[String], wCol: Option[String],
              yColName: Option[String]): GramResult =
    moments(df, xCols.map(col), wCol.map(col).getOrElse(lit(1.0)),
      yColName.map(col))

  /** Linear predictor `b0? + Σ bᵢ·termᵢ` as a Column (broadcast-β score,
    * `RegDI2.R:212`, `PC.R:280-283`). `beta` is laid out intercept-first
    * when `intercept` is true. */
  def linearPredictor(terms: Seq[String], beta: DenseVector[Double],
                      intercept: Boolean): Column = {
    val (b0, bs) =
      if (intercept) (beta(0), beta.toArray.drop(1)) else (0.0, beta.toArray)
    terms.zip(bs).foldLeft(lit(b0): Column) { case (acc, (t, b)) =>
      acc + col(t) * lit(b)
    }
  }
}
