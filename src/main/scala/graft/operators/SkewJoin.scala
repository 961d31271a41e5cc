package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SCALE.md §Relational).
  *
  * AQE's skew-join split handles moderate skew at runtime; salting is
  * the static fallback when one key dominates so heavily that even a
  * split partition is a straggler (e.g. a null-ish default key holding
  * 10% of 100 TB). The big (skewed) side gets a random salt in
  * [0, factor); the small side is replicated `factor`× with every salt
  * value; the join key becomes (key, salt), spreading the hot key over
  * `factor` tasks. Results are row-identical to the plain join for the
  * supported join types below; right/full outer are rejected because the
  * replicated small side would emit each unmatched small-side row
  * `factor` times instead of once. */
object SkewJoin {

  private val supportedJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 factor: Int, joinType: String = "inner",
                 seed: Long = 42L): DataFrame = {
    require(factor >= 1)
    require(supportedJoinTypes(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin does not preserve $joinType semantics: the small side " +
      "is replicated, so unmatched small-side rows would be duplicated. " +
      "Supported: inner, left/left_outer, left_semi, left_anti, cross.")
    val salted = big.withColumn("__salt",
      (rand(seed) * factor).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(array((0 until factor).map(lit): _*)))
    val out = salted.join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
    out
  }

  /** Per-key frequency profile to decide whether salting is warranted:
    * returns keys holding more than `threshold` of all rows. ONE scan
    * of `df`: both the per-key counts and their grand total hang off
    * the same groupBy exchange (Spark's ReuseExchange collapses the
    * two branches onto one shuffle, so the input is read once — a
    * separate `df.count()` action would read it twice). The total is
    * a scalar aggregate crossJoined back as a broadcast 1-row frame,
    * NOT an empty-partition window: on the high-cardinality key this
    * profiler exists for, a global window would funnel every grouped
    * count through ONE task — the exact unsplittable-partition hazard
    * hotKeys is meant to detect. */
  def hotKeys(df: DataFrame, key: String, threshold: Double): DataFrame = {
    val counts = df.groupBy(key).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", col("n").cast("double") / col("__total"))
      .drop("__total")
      .filter(col("share") > threshold)
      .orderBy(desc("share"))
  }
}
