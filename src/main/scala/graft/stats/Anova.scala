package graft.stats

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.commons.math3.distribution.FDistribution
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-factor ANOVA with interaction, Type-I (sequential) sums of squares
  * — `aov(Bias ~ factor(Sd) * factor(Gamma))`, `ipynb:2828-2836 (cell 42)`.
  *
  * R's `aov` fits the nested model sequence (1) → (1+A) → (1+A+B) →
  * (1+A+B+A:B) and reports SS as successive RSS drops. Because each
  * design is a PREFIX of the next (treatment-coded dummies), one Gram
  * pass over the widest design yields every nested RSS: solve the
  * leading p×p sub-system for each prefix p and use
  * RSS_p = Σy² − βᵀ(Xᵀy). So the whole table costs ONE distributed
  * aggregation of O(k²) state (k = 1+(a−1)+(b−1)+(a−1)(b−1)) plus driver
  * solves — no per-model scans, no data collected.
  */
final case class AnovaRow(term: String, df: Long, sumSq: Double,
                          meanSq: Double, fValue: Double, pValue: Double)

object Anova {

  /** Treatment-coded dummy columns for a factor (first level dropped —
    * R's default contr.treatment). */
  def factorDummies(data: DataFrame, c: String): Seq[Column] =
    dummies(c, factorLevels(data, Seq(c))(c))

  /** [[factorDummies]] for several factors from ONE [[factorLevels]]
    * pass — per-factor calls each re-scan the data for their level set
    * (gridAnova paid three full scans for three factors, r14 review). */
  def factorDummiesMulti(data: DataFrame,
                         cols: Seq[String]): Map[String, Seq[Column]] = {
    val lv = factorLevels(data, cols)
    cols.map(c => c -> dummies(c, lv(c))).toMap
  }

  private def dummies(c: String, levels: Seq[String]): Seq[Column] = {
    require(levels.size >= 2, s"factor $c needs ≥2 levels")
    levels.drop(1).map(l => (col(c).cast("string") === l).cast("double"))
  }

  /** Hard cap on distinct levels per factor. A "factor" with hundreds
    * of levels is almost always a mis-specified continuous/id column,
    * and letting it through builds a (1+Σ(kᵢ−1)+…)-wide dummy design
    * whose O(k²) Gram state then fails confusingly (or grinds) far from
    * the cause (r15 verdict finding 4). 64 is an order of magnitude
    * above any reference workload (≤ 5 levels) while keeping the dummy
    * expansion and the driver-side level sets trivially bounded. */
  val maxFactorLevels = 64

  /** Level sets of several factors: one cheap DISTRIBUTIVE guard pass,
    * then one level pass. Fails loudly on NULL factor values:
    * `collect_set` silently drops NULLs, which would otherwise let
    * null-level rows contribute all-zero dummies while still being
    * counted in the Gram's n — silently inconsistent ANOVA sums. The
    * null counts ride the level pass.
    *
    * The [[maxFactorLevels]] guard runs as its own FIRST pass with
    * `approx_count_distinct` at the DEFAULT rsd (bounded HLL state,
    * partial-aggregable): a mis-specified id column must be named
    * BEFORE anything builds or collects its full level set — a
    * post-collect-only check would OOM the aggregation buffers and the
    * driver on the way to its own error (r16 review). The estimate is
    * approximate (measured: 200 true → 202 at the default rsd; Spark's
    * HLL++ is dense-only, and rsd 0.01's 2¹⁴-register buffers measured
    * ~4× the default's agg cost for precision the slack makes
    * irrelevant), so the distributive guard fires only past 2× the cap
    * — a true ≤ cap cardinality estimates nowhere near 2·cap, and
    * cardinalities in (cap, 2·cap] fall through to the EXACT
    * post-collect check below, whose set is then ≤ ~128 strings,
    * trivially bounded. The extra scan is one column of HLL state,
    * noise next to the Gram pass the caller is about to run. Both
    * checks share the choke point (every dummy builder and the
    * `sequential` wrappers come through here), mirroring
    * Det.maxCramerK's named cap on factorB. */
  def factorLevels(data: DataFrame, cols: Seq[String]): Map[String, Seq[String]] = {
    val guards = cols.map(c => approx_count_distinct(col(c)).as(c))
    val gRow = data.agg(guards.head, guards.tail: _*).head()
    cols.foreach { c =>
      val est = gRow.getLong(gRow.fieldIndex(c))
      require(est <= 2L * maxFactorLevels,
        s"factor column $c has ~$est distinct levels (max $maxFactorLevels); " +
          "a high-cardinality column is not a factor — bin it or fix the model")
    }
    val aggs = cols.map(c => collect_set(col(c).cast("string")).as(c)) ++
      cols.map(c => count(when(col(c).isNull, 1)).as(s"__nulls_$c"))
    val row = data.agg(aggs.head, aggs.tail: _*).head()
    cols.foreach { c =>
      val nNull = row.getLong(row.fieldIndex(s"__nulls_$c"))
      require(nNull == 0L,
        s"factor column $c has $nNull NULL values; drop or impute them before ANOVA")
      val nLv = row.getSeq[String](row.fieldIndex(c)).size
      require(nLv <= maxFactorLevels,
        s"factor column $c has $nLv distinct levels (max $maxFactorLevels); " +
          "a high-cardinality column is not a factor — bin it or fix the model")
    }
    cols.map(c => c -> row.getSeq[String](row.fieldIndex(c)).sorted.toSeq).toMap
  }

  /** Sequential (Type-I) ANOVA over arbitrary ordered terms, each a
    * named group of design columns (`aov(y ~ t1 + t2 + …)`). One Gram
    * pass over the widest design; each prefix's RSS comes from a
    * sub-block solve. */
  def sequential(data0: DataFrame, yCol: String,
                 terms: Seq[(String, Seq[Column])]): Seq[AnovaRow] = {
    // guard at the shared choke point, not only the twoFactor wrappers:
    // Reporting.gridAnova calls here directly, and a NULL response
    // reaches the documented asymmetric-moment corruption unguarded
    // otherwise (r15 review)
    val data = requireY(data0, yCol)
    val features = Seq(lit(1.0)) ++ terms.flatMap(_._2)
    val g = Gram.moments(data, features, lit(1.0), Some(col(yCol)),
      exact = false)
    val n = g.n

    def rssAt(p: Int): Double = {
      val sub = g.xtwx(0 until p, 0 until p).toDenseMatrix
      val rhs = g.xtwy(0 until p).toDenseVector
      val beta = sub \ rhs
      g.swyy - (beta dot rhs)
    }

    val prefixes = terms.scanLeft(1)((p, t) => p + t._2.size)
    val rss = prefixes.map(rssAt)
    val pFull = prefixes.last
    val dfResid = n - pFull
    val msResid = rss.last / dfResid

    def row(term: String, df: Long, ss: Double): AnovaRow = {
      val ms = ss / df
      val f = ms / msResid
      val p = 1.0 - new FDistribution(df.toDouble, dfResid.toDouble)
        .cumulativeProbability(f)
      AnovaRow(term, df, ss, ms, f, p)
    }

    terms.zipWithIndex.map { case ((name, cols), i) =>
      row(name, cols.size.toLong, rss(i) - rss(i + 1))
    } :+ AnovaRow("Residuals", dfResid, rss.last, msResid,
      Double.NaN, Double.NaN)
  }

  /** Guard shared by both ANOVA entry points: a NULL y corrupts the
    * moments ASYMMETRICALLY (xx-cells and n count the row, xy/yy skip
    * it) — beta/RSS/df become mutually inconsistent with no error. R's
    * aov na.omits whole rows; we fail loudly instead (factor NULLs
    * already do, via factorLevels). */
  private def requireY(data: DataFrame, yCol: String): DataFrame =
    data.withColumn(yCol, when(col(yCol).isNull, raise_error(lit(
      s"ANOVA: NULL in response column '$yCol'"))).otherwise(col(yCol)))

  def twoFactor(data: DataFrame, yCol: String, factorA: String,
                factorB: String): Seq[AnovaRow] = {
    // y-guard lives in sequential() (the shared choke point, r15);
    // factorLevels still needs the raw frame for its own NULL checks
    val data0 = data
    val lv = factorLevels(data0, Seq(factorA, factorB).distinct)
    val aD = dummies(factorA, lv(factorA))
    val bD = dummies(factorB, lv(factorB))
    val abD = for (a <- aD; b <- bD) yield a * b
    // empty (A,B) cells make the interaction block singular; breeze
    // throws an opaque MatrixSingularException — name the real cause
    try sequential(data0, yCol, Seq(
      factorA -> aD, factorB -> bD, s"$factorA:$factorB" -> abD))
    catch {
      case e: breeze.linalg.MatrixSingularException =>
        throw new IllegalArgumentException(
          s"ANOVA design is singular — an empty ($factorA, $factorB) " +
            "cell or aliased factor level; aggregate or recode first", e)
    }
  }

  /** DataFrame rendition for the query catalog. */
  def twoFactorDf(data: DataFrame, yCol: String, factorA: String,
                  factorB: String): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    twoFactor(data, yCol, factorA, factorB).toDF()
  }

  /** Oracle-parity rendition: the [[AnovaTypeI]] tree at `Double`, fed
    * by ONE distributed pass of per-cell exact-decimal moments. Emits
    * (term, df, sum_sq, mean_sq, f_value) — no p-values, because the F
    * CDF is libm territory no SQL engine reproduces bitwise; p-values
    * stay on [[twoFactor]] (AnovaSuite's golden-F tests cover them).
    * Requires every a×b cell nonempty and b−1 ≤ [[Det.maxCramerK]],
    * matching the structure of the generated SQL (`AnovaOracle`). */
  def twoFactorTypeIDf(data0: DataFrame, yCol: String, factorA: String,
                       factorB: String): DataFrame = {
    import graft.util.Tables.dsum
    val data = requireY(data0, yCol)
    val spark = data.sparkSession
    import spark.implicits._
    val lv = factorLevels(data, Seq(factorA, factorB).distinct)
    val (la, lb) = (lv(factorA), lv(factorB))
    val (a, b) = (la.size, lb.size)
    // single-level factors: B would hand Det a 0×0 system (opaque
    // 'det needs a square matrix'), A would silently emit df=0 rows
    // with NaN mean_sq/F — name the cause like the dummies() guard on
    // the sibling path (r15 review)
    require(a >= 2, s"factor $factorA has only $a level(s) — a " +
      "two-factor ANOVA needs at least 2")
    require(b >= 2, s"factor $factorB has only $b level(s) — a " +
      "two-factor ANOVA needs at least 2")
    require(b - 1 <= Det.maxCramerK,
      s"factor $factorB has $b levels; the shared Cramer tree caps at ${Det.maxCramerK + 1}")

    val y = col(yCol)
    val cellRows = data.groupBy(col(factorA).cast("string").as("__fa"),
        col(factorB).cast("string").as("__fb"))
      .agg(count(lit(1)).as("n"), dsum(y).as("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    la.foreach(ai => lb.foreach(bj => require(cellRows.contains((ai, bj)),
      s"cell ($ai, $bj) is empty; the Type-I oracle tree needs the full grid")))
    val glob = data.agg(dsum(y * y).as("syy"), count(lit(1)).as("n")).head()
    val (syy, nTot) = (glob.getDouble(0), glob.getLong(1))

    val cells = AnovaTypeI.Cells[Double](
      IndexedSeq.tabulate(a, b)((i, j) => cellRows((la(i), lb(j)))._1.toDouble),
      IndexedSeq.tabulate(a, b)((i, j) => cellRows((la(i), lb(j)))._2),
      syy, nTot.toDouble, 0.0)
    val rowNs = IndexedSeq.tabulate(a)(AnovaTypeI.rowN(cells, _))
    val rowSs = IndexedSeq.tabulate(a)(AnovaTypeI.rowS(cells, _))
    val r0 = AnovaTypeI.rss0(cells, AnovaTypeI.sy(rowSs))
    val rA = AnovaTypeI.rssA(cells, rowNs, rowSs)
    val rF = AnovaTypeI.rssFull(cells)
    val k = b - 1
    val sbb = IndexedSeq.tabulate(k, k)((j, l) =>
      AnovaTypeI.sbb(cells, rowNs, j + 1, l + 1))
    val rhs = IndexedSeq.tabulate(k)(j => AnovaTypeI.rhsB(cells, rowNs, rowSs, j + 1))
    val rAdd = AnovaTypeI.rssAdditive(rA, Det.solve(sbb, rhs), rhs)

    val dfA = (a - 1).toLong; val dfB = (b - 1).toLong
    val dfAB = dfA * dfB; val dfResid = nTot - a.toLong * b
    val msResid = rF / (nTot.toDouble - (a * b).toDouble)
    def row(term: String, df: Long, ss: Double) =
      (term, df, ss, ss / df.toDouble, Some(ss / df.toDouble / msResid))
    Seq(
      row(factorA, dfA, r0 - rA),
      row(factorB, dfB, rA - rAdd),
      row(s"$factorA:$factorB", dfAB, rAdd - rF),
      ("Residuals", dfResid, rF, msResid, Option.empty[Double])
    ).toDF("term", "df", "sum_sq", "mean_sq", "f_value")
  }
}

/** Two-factor Type-I SS as ONE shared arithmetic expression tree over
  * per-cell aggregates, generic in [[Det.Arith]] — the same
  * engine-parity device as the m20–m25 Cramer oracles: instantiated at
  * `Double` it is the driver's solve, instantiated at [[Det.SqlArith]]
  * it renders the structurally identical DuckDB SQL (see
  * `queries.AnovaOracle`), so `m12_anova` hash-matches under the
  * driver's value-exact gate.
  *
  * The sequential RSS chain needs no large solve when the terms are two
  * factors and their interaction (`aov(y ~ A*B)`, `ipynb:2828-2836`):
  *  - RSS(1)     = Σy² − (Σy)²/n            (grand mean)
  *  - RSS(A)     = Σy² − Σᵢ Sᵢ²/nᵢ          (within-A SS; also y′M_Ay)
  *  - RSS(A+B)   via Frisch–Waugh: absorb A, then solve only the
  *    (b−1)×(b−1) system (D_B′M_A D_B)β = D_B′M_A y and subtract β′rhs
  *    from y′M_Ay — entries are cell-count/cell-sum arithmetic, and
  *    b−1 ≤ [[Det.maxCramerK]] keeps the Cramer tree shared;
  *  - RSS(A+B+AB) = Σy² − Σᵢⱼ Sᵢⱼ²/nᵢⱼ      (within-cell SS — the full
  *    treatment-coded design spans the nonempty-cell indicators).
  *
  * All inputs are exact across engines: counts are integers and the
  * cell sums come from the `dsum`/`sqlDsum` exact-decimal pair, so both
  * engines start from bit-identical leaves; every fold below runs in a
  * FIXED (row-major, ascending) order so they stay bit-identical at the
  * root. Requires every a×b cell nonempty — the SQL text is generated
  * for the full grid, so an empty cell would silently change the tree
  * (the Scala entry point `require`s it instead). */
object AnovaTypeI {
  import Det.Arith

  /** Per-cell leaves (row-major a×b) + global exact moments. `zero` is
    * the instance's 0.0 literal (Arith has no constants). */
  final case class Cells[T](n: IndexedSeq[IndexedSeq[T]],
                            s: IndexedSeq[IndexedSeq[T]],
                            syy: T, nTot: T, zero: T)

  /** Left fold in index order — THE accumulation order both engines use. */
  def fsum[T](ts: Seq[T])(implicit A: Arith[T]): T = ts.reduceLeft(A.add)

  def rowN[T](c: Cells[T], i: Int)(implicit A: Arith[T]): T = fsum(c.n(i))
  def rowS[T](c: Cells[T], i: Int)(implicit A: Arith[T]): T = fsum(c.s(i))

  /** Σy (over the per-row-of-A sums, ascending i). */
  def sy[T](rowSs: IndexedSeq[T])(implicit A: Arith[T]): T = fsum(rowSs)

  def rss0[T](c: Cells[T], syT: T)(implicit A: Arith[T]): T =
    A.sub(c.syy, A.div(A.mul(syT, syT), c.nTot))

  def rssA[T](c: Cells[T], rowNs: IndexedSeq[T], rowSs: IndexedSeq[T])
             (implicit A: Arith[T]): T =
    A.sub(c.syy, fsum(rowNs.indices.map(i =>
      A.div(A.mul(rowSs(i), rowSs(i)), rowNs(i)))))

  def rssFull[T](c: Cells[T])(implicit A: Arith[T]): T =
    A.sub(c.syy, fsum(for (i <- c.n.indices; j <- c.n(i).indices)
      yield A.div(A.mul(c.s(i)(j), c.s(i)(j)), c.n(i)(j))))

  /** (D_B′M_A D_B)_{jk} for B dummy levels j,k ∈ 1..b−1 (first level
    * dropped): Σᵢ [δ_jk·nᵢⱼ − nᵢⱼnᵢₖ/nᵢ]. */
  def sbb[T](c: Cells[T], rowNs: IndexedSeq[T], j: Int, k: Int)
            (implicit A: Arith[T]): T =
    fsum(c.n.indices.map { i =>
      val cross = A.div(A.mul(c.n(i)(j), c.n(i)(k)), rowNs(i))
      A.sub(if (j == k) c.n(i)(j) else c.zero, cross)
    })

  /** (D_B′M_A y)_j = Σᵢ [Sᵢⱼ − nᵢⱼSᵢ/nᵢ]. */
  def rhsB[T](c: Cells[T], rowNs: IndexedSeq[T], rowSs: IndexedSeq[T],
              j: Int)(implicit A: Arith[T]): T =
    fsum(c.n.indices.map(i => A.sub(c.s(i)(j),
      A.div(A.mul(c.n(i)(j), rowSs(i)), rowNs(i)))))

  /** RSS(A+B) = y′M_Ay − β′rhs (β from the Cramer solve). */
  def rssAdditive[T](rssAT: T, beta: IndexedSeq[T], rhs: IndexedSeq[T])
                    (implicit A: Arith[T]): T =
    A.sub(rssAT, fsum(beta.indices.map(j => A.mul(beta(j), rhs(j)))))
}
