package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping: interleaving the bits of two key columns and laying files
  * out in z-value ranges makes every file's per-column min/max stats a
  * tight bounding box on BOTH keys, so a reader filtering on either key
  * (or both) prunes most files/row-groups — the layout trick behind
  * lakehouse OPTIMIZE ZORDER BY, expressed with plain Spark primitives.
  *
  * Scale design (100 TB): the z-value is a pure codegen'd integer
  * projection (five shift-mask rounds per key — no UDF); the layout is
  * one `repartitionByRange` shuffle on z (range boundaries from Spark's
  * reservoir sample) + an in-partition sort. Writes stream through; no
  * driver-side state. Pruning then happens at scan time from parquet
  * footer stats — no index to maintain.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to the even bit positions (classic
    * magic-number bit dilation). */
  private def spread(v: Column): Column = {
    val m0 = v.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton z-value of two non-negative integer keys (low 16 bits each
    * — callers bucket/normalize wider domains first): x on even bits,
    * y on odd. Pure integer expression, engine-portable.
    *
    * The 16-bit contract is ENFORCED: silently masking a wider key
    * (epoch seconds, a ~10⁹-range id) to its noise-like low bits would
    * destroy the clustering — every file gets near-full-range min/max
    * stats and scan pruning degrades to nothing, the operator's entire
    * purpose — with no error (r15 review). The guard rides the z
    * expression itself, so no caller can prune it away. */
  def zValue(x: Column, y: Column): Column = {
    def inRange(v: Column, name: String): Column =
      when(v.isNull || v < 0 || v > 0xFFFFL, raise_error(lit(
        s"zValue: $name key outside the non-negative 16-bit contract " +
          "[0, 65535] — bucket/normalize wider domains before z-ordering " +
          "(a masked key would silently destroy data-skipping)")))
        .otherwise(v)
    spread(inRange(x, "x")).bitwiseOR(shiftleft(spread(inRange(y, "y")), 1))
  }

  /** Write `df` z-clustered on (xCol, yCol) into `numFiles` range
    * partitions of the z-value, each internally z-sorted — the layout
    * whose parquet footer stats give two-dimensional pruning. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, numFiles: Int): Unit = {
    // withColumn REPLACES an existing column of the same name, and the
    // drop below would then remove the caller's data from the written
    // output silently (r16 review) — refuse the collision by name
    require(!df.columns.contains("__z"),
      "writeZOrdered: input already has a '__z' column — it would be " +
        "clobbered by the internal z-value and dropped from the output; " +
        "rename it first")
    df.withColumn("__z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
