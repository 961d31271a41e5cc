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
  *
  * Cache lifecycle (r17 advice): [[giniByGroup]] leases a
  * MEMORY_AND_DISK pin of its ranked frame via
  * `graft.util.QueryLeases`; long-lived non-harness callers must call
  * `QueryLeases.releaseAll()` after materializing the result.
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
    // INTERNAL-row path (r18): `sorted.rdd` would convert every row
    // InternalRow→Row, and createDataFrame(RDD[Row]) converts straight
    // back — two full conversions of the whole frame for an appended
    // long. zipWithIndex over queryExecution.toRdd appends the rank as
    // a JoinedRow instead. The sort operator REUSES its output row
    // buffer, so each row is copy()d before retention (the same reason
    // the old Row path was safe: Row conversion copied too).
    val rdd = sorted.queryExecution.toRdd.zipWithIndex()
      .map { case (row, i) =>
        new org.apache.spark.sql.catalyst.expressions.JoinedRow(
          row.copy(),
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](i + 1L)))
          : org.apache.spark.sql.catalyst.InternalRow
      }
    org.apache.spark.sql.GraftBridge.internalDf(spark, rdd, schema)
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

  /** Exact INTERPOLATED percentiles — SQL `percentile` / DuckDB
    * `quantile_cont` semantics — for several columns in ONE distributed
    * selection pass with bounded state everywhere.
    *
    * Spark's exact `percentile` buffers a value→count map per partition
    * and merges the maps on a SINGLE task — O(distinct values) memory at
    * one point of concentration, the last unbounded-state aggregation
    * shape in the catalog (r16 verdict). This replaces it with
    * selection: interpolated percentiles are a weighted pair of
    * ADJACENT ORDER STATISTICS, and order statistics come from a
    * range-partitioned sort + [[globalRowNumber]] — a distributed
    * shuffle with O(1) per-task state — plus an O(|cols|·|ps|) rank
    * filter back to the driver.
    *
    * One scan fans the k columns into (column-index, value) rows
    * (`stack` — NULLs drop, matching SQL percentile's NULL handling);
    * the global sort is on (index, value), so each column's ranks form
    * a CONTIGUOUS block whose start is the running sum of the earlier
    * columns' non-NULL counts — no second pass to locate blocks. Ties
    * need no tie-break column here: equal values occupy a contiguous
    * rank run, so the value AT a rank is the k-th order statistic no
    * matter how the run permutes (unlike rank-PER-ROW uses of
    * globalRowNumber, which require a total order).
    *
    * Bit parity: the driver-side interpolation replicates
    * `Percentile.getPercentile`'s arithmetic exactly — position =
    * (n−1)·p as Long·Double, floor/ceil ranks, the equal-key shortcut
    * (the two-product form can differ from the key by 1 ulp when both
    * keys are equal), and (higher−pos)·lo + (pos−lower)·hi — so results
    * hash-match Spark `percentile` and (transitively, a14's standing
    * parity) DuckDB `quantile_cont`. */
  def percentileSelect(df: DataFrame, cols: Seq[String],
                       ps: Seq[Double]): Map[(String, Double), Double] = {
    require(cols.nonEmpty, "percentileSelect: need at least one column")
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentages must be in [0, 1]: $ps")
    // aggregate `percentile` REJECTS non-numeric columns at analysis;
    // the cast-to-double below would instead silently NULL every value
    // (and the NULL filter would then drop the whole column into the
    // "no non-NULL values" error, or worse, census only the castable
    // rows of a mixed-content string column) — keep the loud contract
    cols.foreach { c =>
      val dt = df.schema.fields.find(_.name == c)
        .orElse(df.schema.fields.find(_.name.equalsIgnoreCase(c)))
        .getOrElse(throw new IllegalArgumentException(
          s"percentileSelect: column '$c' not in schema")).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"percentileSelect: column '$c' is ${dt.simpleString}, not numeric")
    }
    def bq(c: String): String = "`" + c.replace("`", "``") + "`"
    val stackArgs = cols.zipWithIndex
      .map { case (c, i) => s"$i, cast(${bq(c)} as double)" }.mkString(", ")
    // pin ONE materialization of the narrow 2-column fan-out: the count
    // pass and the rank pass must see the same rows (the quantileSelect
    // two-execution discipline)
    val proj = df
      .selectExpr(s"stack(${cols.size}, $stackArgs) as (__i, __v)")
      .filter(col("__v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = proj.groupBy("__i").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      cols.zipWithIndex.foreach { case (c, i) =>
        require(counts.contains(i),
          s"percentileSelect: column '$c' has no non-NULL values")
      }
      // block starts: ranks are assigned over the (index, value) sort,
      // so column i's ranks are [r0(i), r0(i)+n(i)) with r0 cumulative
      val r0 = cols.indices.scanLeft(1L)((acc, i) => acc + counts(i))
      val ranked = globalRowNumber(proj,
        Seq(col("__i"), col("__v")), out = "__rn")
      val ranksNeeded = (for {
        i <- cols.indices
        p <- ps
        pos = (counts(i) - 1).toDouble * p
        r <- Seq(pos.floor.toLong, pos.ceil.toLong)
      } yield r0(i) + r).distinct
      val hits = ranked.filter(col("__rn").isin(ranksNeeded: _*))
        .select(col("__rn"), col("__v"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      (for { (c, i) <- cols.zipWithIndex; p <- ps } yield {
        val pos = (counts(i) - 1).toDouble * p
        val lower = pos.floor.toLong
        val higher = pos.ceil.toLong
        val lowerKey = hits(r0(i) + lower)
        val v =
          if (higher == lower) lowerKey
          else {
            val higherKey = hits(r0(i) + higher)
            if (higherKey == lowerKey) lowerKey
            else (higher - pos) * lowerKey + (pos - lower) * higherKey
          }
        (c, p) -> v
      }).toMap
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
    // leased pin (r18): `ranked` feeds TWO consumers (the min-rank
    // frame and the index join), and its subtree is the expensive part
    // — range shuffle + in-partition sort + zipWithIndex — so unpinned
    // it executed twice per query (shuffle files reuse across jobs,
    // but the sort read, index map and downstream aggs re-ran)
    val ranked = graft.util.QueryLeases.leased(globalRowNumber(
      df.select(col(groupCol), vGuarded, col(tieCol)),
      Seq(col(groupCol), col(valueCol), col(tieCol)), out = "__r")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
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
