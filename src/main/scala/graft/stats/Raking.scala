package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Tables.dsum

/** Raking / iterative proportional fitting (IPF) — the multiplicative
  * sibling of the reference's linear GREG calibration (`RegDI2.R:188-193`;
  * `survey::rake`): adjust design weights so the weighted counts match
  * known population margins on two categorical factors, alternating
  * margins until (approximate) convergence (Deming & Stephan 1940).
  *
  * Scale design (100 TB): raking margins are categorical BY DEFINITION,
  * so the full iteration state is the (f1 × f2) contingency table of
  * weight sums — computed in ONE partial-aggregable pass (exact-decimal
  * cell sums ⇒ order/partitioning-invariant), then iterated on the
  * driver over the tiny cell table. Because each half-step multiplies
  * every row of a category by one scalar, the final weight factorizes as
  * `w = d · R1(f1) · R2(f2)`: the output is a codegen'd projection with
  * two literal CASE chains — no per-iteration data passes, no joins, no
  * second shuffle, regardless of row count or iteration count.
  *
  * Float parity: cell sums are exact decimal ([[graft.util.Tables.dsum]]);
  * the driver loop folds cells in ascending category order with
  * left-associated IEEE adds/multiplies, so an oracle that unrolls the
  * same half-steps over the same pivoted cell scalars is bit-identical.
  */
object Raking {

  /** IPF multipliers per category of each margin after `iters` full
    * rounds (each round adjusts margin 1 then margin 2). */
  final case class RakeFactors(r1: Map[Long, Double], r2: Map[Long, Double])

  /** Run IPF on the contingency table of `dCol` sums over the two
    * integer factor columns. `targets1` / `targets2` are the known
    * population margin totals keyed by category value; every category
    * present in the data must appear in its target map.
    *
    * `totalTol` is the relative disagreement allowed between the two
    * margins' population totals. Published margin tables are routinely
    * rounded to integers, so legitimate inputs disagree by far more
    * than float noise — the default 1e-3 admits rounding while still
    * catching the counts-vs-proportions unit mix-up (off by ~N×) that
    * makes IPF oscillate forever. Tighten it when both margins come
    * from the same exact frame.
    */
  def factors(
      df: DataFrame,
      dCol: String,
      f1Col: String,
      f2Col: String,
      targets1: Map[Long, Double],
      targets2: Map[Long, Double],
      iters: Int,
      totalTol: Double = 1e-3
  ): RakeFactors = {
    require(iters > 0, "raking needs at least one iteration")
    require(targets1.nonEmpty && targets2.nonEmpty, "empty raking margin")
    require(totalTol >= 0.0, "totalTol must be non-negative")
    // inconsistent margins (counts vs proportions — a common unit
    // mix-up) make IPF oscillate forever: after the fixed rounds margin
    // 2 matches while every margin-1 total is off by ~Σt1/Σt2, and the
    // wrong weights would return with no error. survey::rake reports
    // non-convergence; here the totals are checkable up front.
    val (s1, s2) = (targets1.values.sum, targets2.values.sum)
    require(math.abs(s1 - s2) <= totalTol * math.max(math.abs(s1), math.abs(s2)),
      s"raking margins disagree on the population total: " +
        s"margin 1 sums to $s1, margin 2 to $s2 (relative gap beyond " +
        s"totalTol=$totalTol) — IPF cannot satisfy both")
    val cells: Map[(Long, Long), Double] = df
      .groupBy(col(f1Col).cast("long").as("f1"), col(f2Col).cast("long").as("f2"))
      .agg(dsum(col(dCol)).as("cw"))
      .collect()
      .map { r =>
        // a NULL factor (or a non-castable string category) groups
        // under a null key; getLong would NPE deep in the map — name
        // the problem instead (the olsKFold non-null-fold contract)
        require(!r.isNullAt(0) && !r.isNullAt(1),
          s"raking factors must be non-null and integer-castable: a " +
            s"('$f1Col', '$f2Col') group keyed (${r.get(0)}, ${r.get(1)})")
        require(!r.isNullAt(2),
          s"raking cell (${r.get(0)}, ${r.get(1)}) has all-NULL '$dCol'")
        ((r.getLong(0), r.getLong(1)), r.getDouble(2))
      }
      .toMap
    val k1 = targets1.keys.toSeq.sorted
    val k2 = targets2.keys.toSeq.sorted
    val badCat = cells.keys.collectFirst {
      case (a, b) if !targets1.contains(a) || !targets2.contains(b) => (a, b)
    }
    require(badCat.isEmpty, s"data category $badCat missing from raking targets")
    def cell(a: Long, b: Long): Double = cells.getOrElse((a, b), 0.0)

    val r1 = scala.collection.mutable.Map(k1.map(_ -> 1.0): _*)
    val r2 = scala.collection.mutable.Map(k2.map(_ -> 1.0): _*)
    var it = 0
    while (it < iters) {
      // within a half-step every category's ratio uses only its OWN
      // running multiplier, so the k1 updates are order-independent
      for (a <- k1) {
        val s = k2.foldLeft(0.0)((acc, b) => acc + cell(a, b) * r1(a) * r2(b))
        require(s != 0.0, s"raking margin 1 category $a has zero weight in the data")
        r1(a) = r1(a) * (targets1(a) / s)
      }
      for (b <- k2) {
        val s = k1.foldLeft(0.0)((acc, a) => acc + cell(a, b) * r1(a) * r2(b))
        require(s != 0.0, s"raking margin 2 category $b has zero weight in the data")
        r2(b) = r2(b) * (targets2(b) / s)
      }
      it += 1
    }
    RakeFactors(r1.toMap, r2.toMap)
  }

  /** CASE chain mapping a factor column to its literal multiplier, in
    * ascending category order. The LAST category gets an explicit WHEN
    * and the ELSE arm raises: the factors were fitted against a
    * collect-time snapshot, and a category appearing only in the
    * projection-time scan (streaming source, concurrently-updated
    * table) would otherwise silently receive the last category's
    * multiplier — fail loudly instead. */
  private def multExpr(f: Column, ks: Seq[Long], m: Map[Long, Double]): Column = {
    val chained = ks.drop(1).foldLeft(
      when(f === lit(ks.head), lit(m(ks.head)))
    )((acc, k) => acc.when(f === lit(k), lit(m(k))))
    chained.otherwise(raise_error(concat(
      lit("raking: factor value absent from the fitted margins: "),
      f.cast("string"))))
  }

  /** Post-stratification (`survey::postStratify`): the one-margin,
    * one-step special case of raking — scale each stratum's weights so
    * their sum equals the known population stratum total. Exact after a
    * single adjustment (no iteration), same one-pass + literal-CASE
    * projection shape as [[rake]]. */
  def poststratify(
      df: DataFrame,
      dCol: String,
      fCol: String,
      targets: Map[Long, Double],
      wOut: String = "w_post"
  ): DataFrame = {
    require(targets.nonEmpty, "empty post-stratification margin")
    val sums: Map[Long, Double] = df
      .groupBy(col(fCol).cast("long").as("f"))
      .agg(dsum(col(dCol)).as("s"))
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"post-stratification factor '$fCol' must be non-null and " +
            "integer-castable")
        require(!r.isNullAt(1),
          s"post-stratum ${r.get(0)} has all-NULL '$dCol'")
        r.getLong(0) -> r.getDouble(1)
      }.toMap
    val badCat = sums.keys.find(!targets.contains(_))
    require(badCat.isEmpty, s"data stratum $badCat missing from targets")
    val ks = targets.keys.toSeq.sorted
    val ratios = ks.map { f =>
      val s = sums.getOrElse(f, 0.0)
      require(s != 0.0, s"post-stratum $f has zero weight in the data")
      f -> targets(f) / s
    }.toMap
    df.withColumn(wOut,
      col(dCol) * multExpr(col(fCol).cast("long"), ks, ratios))
  }

  /** Full raking: compute [[factors]] and attach the raked weight
    * `wOut = d · R1(f1) · R2(f2)` as a pure projection. */
  def rake(
      df: DataFrame,
      dCol: String,
      f1Col: String,
      f2Col: String,
      targets1: Map[Long, Double],
      targets2: Map[Long, Double],
      iters: Int,
      wOut: String = "w_rake"
  ): DataFrame = {
    val f = factors(df, dCol, f1Col, f2Col, targets1, targets2, iters)
    df.withColumn(
      wOut,
      col(dCol) *
        multExpr(col(f1Col).cast("long"), targets1.keys.toSeq.sorted, f.r1) *
        multExpr(col(f2Col).cast("long"), targets2.keys.toSeq.sorted, f.r2))
  }
}
