package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Tables.dsum

/** Structured-Streaming surface. The reference has no streaming
  * (SURVEY.md §2.12); these operators extend the engine for the `events`
  * table's shape. Each transform is a plain DataFrame→DataFrame function
  * applied identically to a batch frame or a `readStream` frame — the
  * unified Dataset API is the point: the SAME logical plan incrementalizes
  * under a streaming sink with watermark-bounded state.
  *
  * Scale: tumbling-window aggregation shuffles on (window, event_type) —
  * state per key is O(1) aggregate buffers, bounded by the watermark;
  * no per-event state growth.
  */
object Streams {

  /** Tumbling-window per-type counts/sums. In streaming mode the
    * watermark bounds state and drops events later than `lateness`. */
  def tumblingEventStats(events: DataFrame, windowLen: String = "1 hour",
                         lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))

  /** Batch-friendly projection of [[tumblingEventStats]] with sortable,
    * string-rendered window bounds (oracle-comparable). */
  def tumblingEventStatsFlat(events: DataFrame,
                             windowLen: String = "1 hour"): DataFrame =
    tumblingEventStats(events, windowLen)
      .select(col("w.start").cast("string").as("w_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sessionization by user with a max-gap session window. */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
                   lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
}
