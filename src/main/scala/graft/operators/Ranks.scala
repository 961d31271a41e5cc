package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact global row numbering WITHOUT a single-task window — the
  * scalable rank primitive for order statistics (Gini, quantile cuts,
  * leaderboards) over groups too large for one task.
  *
  * `Window.partitionBy()` (or one giant group) funnels every row through
  * one task; this instead range-partitions on the sort key (a
  * distributed sort shuffle) and numbers rows with `zipWithIndex` —
  * a per-partition count job plus a pure index map, no single point of
  * concentration. The result equals the global-window rank provided the
  * sort columns form a TOTAL order (include a tie-break key), which
  * also makes the rank independent of where the sampled range
  * boundaries land.
  */
object Ranks {

  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
                      out: String = "rn",
                      numPartitions: Option[Int] = None): DataFrame = {
    require(sortCols.nonEmpty, "globalRowNumber needs sort columns")
    val spark = df.sparkSession
    val sorted = numPartitions
      .map(n => df.repartitionByRange(n, sortCols: _*))
      .getOrElse(df.repartitionByRange(sortCols: _*))
      .sortWithinPartitions(sortCols: _*)
    // zipWithIndex, NOT a second range shuffle + window: the range
    // boundaries are SAMPLED, so counting partition sizes in one
    // execution and ranking in another can disagree (observed at sf0.1).
    // zipWithIndex's internal count job and the index map share ONE
    // sorted RDD — same boundaries, same shuffle files — and the final
    // rank is boundary-independent anyway because the sort columns form
    // a total order.
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        out, org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Exact selection quantiles by global rank: value at rank
    * ⌈bp·n/10000⌉ for each basis-point probability. The target rank is
    * PURE INTEGER arithmetic ((bp·n + 9999) div 10000) — a float
    * `ceil(p·n)` diverges between binary-double and decimal engines
    * when p·n lands on an integer. One [[globalRowNumber]] pass + a
    * two-row filter; scalars return to the driver. */
  def quantileSelect(df: DataFrame, valueCol: String, tieCol: String,
                     bps: Seq[Int]): Map[Int, Double] = {
    require(bps.nonEmpty && bps.forall(b => b >= 1 && b <= 10000),
      s"basis points must be in [1, 10000]: $bps")
    // NULL values would sort first and occupy the smallest ranks —
    // every quantile silently shifts down, and a target rank landing on
    // a NULL row NPEs at getDouble. Raise instead (the samplers' NULL
    // convention); the cast makes int/long/decimal value columns work
    // (getDouble on a collected Long row would ClassCastException).
    val v = when(col(valueCol).isNull, raise_error(lit(
      s"quantileSelect: NULL in value column '$valueCol'")))
      .otherwise(col(valueCol)).cast("double").as("__v")
    // The count and the rank pass must see the SAME rows: on an input
    // with a non-deterministic stage (sample(), shuffle-order-sensitive
    // generators — the exact two-execution disagreement
    // globalRowNumber's own comment documents), a separate df.count()
    // can disagree with the re-executed rank pass, so a target rank
    // matches nothing (bare key-not-found) or every quantile silently
    // shifts. Pin ONE materialization of the narrow 2-column
    // projection; both numbers then derive from it. The cache is the
    // spill-aware price of determinism — 2 columns wide, not the row.
    val proj = df.select(v, col(tieCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = proj.count()
      require(n > 0, "quantileSelect on an empty frame")
      val target = bps.map(bp => bp -> ((bp.toLong * n + 9999L) / 10000L)).toMap
      val ranked = globalRowNumber(proj,
        Seq(col("__v"), col(tieCol)), out = "__rn")
      val hits = ranked.filter(col("__rn").isin(target.values.toSeq: _*))
        .select(col("__rn"), col("__v"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      target.map { case (bp, rk) => bp -> hits(rk) }
    } finally proj.unpersist()
  }

  /** Winsorization: clip `valueCol` to its exact [loBp, hiBp]
    * selection quantiles (basis points). The clip itself is a pure
    * projection with two broadcast scalar literals — the data is
    * scanned once for the rank pass and once for the clip. */
  def winsorize(df: DataFrame, valueCol: String, tieCol: String,
                loBp: Int, hiBp: Int,
                out: String = "v_winsor"): DataFrame = {
    require(loBp < hiBp, s"loBp $loBp must be below hiBp $hiBp")
    val q = quantileSelect(df, valueCol, tieCol, Seq(loBp, hiBp))
    df.withColumn(out,
      least(greatest(col(valueCol), lit(q(loBp))), lit(q(hiBp))))
  }

  /** Per-group Gini concentration coefficient from the rank formula
    * G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) — inequality of a value
    * across group members (corpus-source share, revenue concentration).
    *
    * The within-group index i comes from ONE [[globalRowNumber]] over
    * (group, value, tie) — ranks within a group are contiguous in the
    * grouped total order, so i = global rank − group's min rank + 1.
    * No single-task window even when one group holds most of the data;
    * the min-rank frame is |groups| rows, broadcast back. Exact-decimal
    * sums + one fixed IEEE expression → engine-portable. */
  def giniByGroup(df: DataFrame, groupCol: String, valueCol: String,
                  tieCol: String): DataFrame = {
    import graft.util.Tables.dsum
    // a NULL value would occupy a rank (NULLs sort first) while dsum
    // skips it — n and the index weights silently inflate and the
    // coefficient comes back plausible but wrong. Raise instead.
    val vGuarded = when(col(valueCol).isNull, raise_error(lit(
      s"giniByGroup: NULL in value column '$valueCol'")))
      .otherwise(col(valueCol)).as(valueCol)
    val ranked = globalRowNumber(
      df.select(col(groupCol), vGuarded, col(tieCol)),
      Seq(col(groupCol), col(valueCol), col(tieCol)), out = "__r")
    val minR = ranked.groupBy(groupCol).agg(min(col("__r")).as("__r0"))
    val indexed = ranked.join(broadcast(minR), groupCol)
      .withColumn("__i", col("__r") - col("__r0") + lit(1L))
    val agg = indexed.groupBy(groupCol).agg(
      count(lit(1)).cast("double").as("n"),
      dsum(col(valueCol)).as("sx"),
      dsum(col("__i") * col(valueCol)).as("six"))
    // the rank formula needs Σx > 0: an all-zero group yields 0/0 = NaN
    // under non-ANSI double division and a negative sum flips the sign —
    // both come back plausible-shaped instead of failing. The guard
    // rides the denominator of gini's OWN tree (the m44/aspectBuckets
    // lesson: a guard on a separate output column is droppable by
    // column pruning).
    agg.select(col(groupCol), col("n").cast("long").as("n_rows"),
      ((lit(2.0) * col("six") - (col("n") + lit(1.0)) * col("sx")) /
        when(col("sx") <= lit(0.0), raise_error(lit(
          "giniByGroup: group with non-positive value sum — the Gini " +
            "rank formula is undefined")))
          .otherwise(col("n") * col("sx"))).as("gini"))
  }
}
