package graft.util

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** util.Tables contracts that aren't covered by the catalog queries:
  * the events.ts physical-type dispatch edge cases. */
class TablesSuite extends SparkSpec {
  import spark.implicits._

  test("withEventTs FLOORS negative (pre-epoch) nano timestamps to " +
    "micros — `div` truncation rounded them UP by 1 µs (r15 review)") {
    // -1500 ns is 1.5 µs before epoch: floor = -2 µs, truncate = -1 µs
    val raw = Seq(-1500L, -1000L, -1L, 0L, 1500L).toDF("ts")
    val micros = Tables.withEventTs(raw)
      .select(unix_micros(col("ts"))).as[Long].collect().toSeq
    assert(micros === Seq(-2L, -1L, -1L, 0L, 1L),
      s"got $micros — pre-epoch nanos must floor like the Parquet " +
        "MICROS rendition of the same instant")
  }
}
