package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Sliding-window per-type counts/sums: each event lands in
    * windowLen/slide overlapping windows (Spark's `window` expands the
    * event, no self-join). State per open window is O(1) aggregate
    * buffers and the watermark closes windows `lateness` past their
    * end — the overlap factor multiplies key count, not state size
    * per key, so a 2×/hour slide is ~2× tumbling state, still bounded. */
  def slidingEventStats(events: DataFrame, windowLen: String = "2 hours",
                        slide: String = "1 hour",
                        lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))

  /** Batch-friendly projection of [[slidingEventStats]] with sortable,
    * string-rendered window bounds (oracle-comparable). */
  def slidingEventStatsFlat(events: DataFrame,
                            windowLen: String = "2 hours",
                            slide: String = "1 hour"): DataFrame =
    slidingEventStats(events, windowLen, slide)
      .select(col("w.start").cast("string").as("w_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Batch-friendly projection of [[tumblingEventStats]] with sortable,
    * string-rendered window bounds (oracle-comparable). */
  def tumblingEventStatsFlat(events: DataFrame,
                             windowLen: String = "1 hour"): DataFrame =
    tumblingEventStats(events, windowLen)
      .select(col("w.start").cast("string").as("w_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Watermark late-data accounting (the batch rendition of Structured
    * Streaming's event-time watermark, which advances at MICRO-BATCH
    * boundaries): `batchCol` is the event's arrival micro-batch; the
    * watermark visible while batch b processes is
    * max(event time over batches < b) − delay, and an event is LATE iff
    * its window's END is at or below that watermark — the engine drops
    * an event only once the whole window's state has been evicted, so
    * an old event whose window is still open (end > watermark) is
    * aggregated normally. Emits per tumbling window: total events,
    * late events, on-time events. The first batch has no watermark
    * (NULL prev-max), so nothing in it is late — exactly Structured
    * Streaming's cold-start behavior.
    *
    * Cross-engine determinism: event times compare as exact integer
    * microseconds (unix_micros/epoch_us) and the watermark is a max
    * minus an integer constant — no float anywhere.
    *
    * Scale shape: ONE partial-aggregable groupBy(batch) reduces the
    * stream to #batches rows; the running max runs on that bounded
    * frame (the constant-partition window discipline), which then
    * broadcasts back onto the event scan. Nothing event-sized is ever
    * sorted globally. */
  def watermarkLateAccounting(events: DataFrame, batchCol: String,
                              tsCol: String, delayMicros: Long,
                              windowLen: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(delayMicros >= 0, s"delayMicros=$delayMicros must be >= 0")
    // the running-max watermark below ORDERS BY the batch column — a
    // string batch id would order lexicographically ("10" < "2") and
    // compute each batch's watermark over the wrong prefix, silently
    // miscounting late events (r16 review); require an integral type
    events.schema(batchCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"watermarkLateAccounting: batch column '$batchCol' must be an " +
          s"integral type (batches are ordered by it), got " +
          s"${other.simpleString}")
    }
    // a NULL batch or timestamp would silently vanish through the
    // watermark join / window assignment, under-counting the stream —
    // fail loudly instead (the ppsPoisson/doremiReweight contract)
    val e = events.select(
      when(col(batchCol).isNull, raise_error(lit(
        s"watermarkLateAccounting: NULL in batch column '$batchCol'")))
        .otherwise(col(batchCol)).as("__b"),
      when(col(tsCol).isNull, raise_error(lit(
        s"watermarkLateAccounting: NULL in time column '$tsCol'")))
        .otherwise(col(tsCol)).as("__ts"),
      // typed unix_micros(col(...)), not an expr() splice: a column
      // name with a dot/space would fail the parse — or silently
      // resolve as a struct-field access (r15 review)
      unix_micros(col(tsCol)).as("__tus"))
    val wmWin = Window.partitionBy(lit(1)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wm = e.groupBy(col("__b")).agg(max(col("__tus")).as("__mx"))
      .select(col("__b"),
        (max(col("__mx")).over(wmWin) - lit(delayMicros)).as("__wm"))
    e.join(broadcast(wm), Seq("__b"))
      .select(window(col("__ts"), windowLen).as("__w"), col("__wm"))
      .select(col("__w").getField("start").cast("string").as("w_start"),
        when(col("__wm").isNotNull &&
            expr("unix_micros(__w.end)") <= col("__wm"), 1L)
          .otherwise(0L).as("__late"))
      .groupBy(col("w_start"))
      .agg(count(lit(1)).as("n_events"), sum(col("__late")).as("n_late"),
        (count(lit(1)) - sum(col("__late"))).as("n_on_time"))
  }

  /** Trending-topic counts: the streaming-stateful half of per-window
    * top-k — tumbling per-type counts, watermark-closed, append-mode
    * emittable. Window functions can't run mid-stream, so the rank
    * ([[rankTopK]]) is applied on the sink side (foreachBatch or a
    * downstream batch job over closed windows) — exact, because append
    * mode emits each window exactly once, complete. */
  def trendingCounts(events: DataFrame, windowLen: String = "1 hour",
                     lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Per-window top-k rank over [[trendingCounts]] output (count desc,
    * event_type tie-break). The window partition holds one row per
    * event type — bounded, so the rank never needs a global sort. */
  def rankTopK(counts: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val rk = row_number().over(
      Window.partitionBy(col("w")).orderBy(col("n").desc, col("event_type")))
    counts.withColumn("rank", rk).filter(col("rank") <= k)
      .select(col("w.start").cast("string").as("w_start"),
        col("event_type"), col("n"), col("rank"))
  }

  /** Batch rendition: counts + rank in one plan. */
  def trendingTopK(events: DataFrame, windowLen: String = "1 hour",
                   k: Int = 3): DataFrame =
    rankTopK(trendingCounts(events, windowLen), k)

  /** Streaming deduplication on `keyCols` with watermark-bounded state
    * (`dropDuplicatesWithinWatermark`). Dedup is exact ONLY for
    * duplicates arriving within the `lateness` horizon of the
    * `tsCol` event time: a replay landing after the watermark has
    * advanced past the original's state eviction will survive. That is
    * the deliberate trade — state holds one entry per key seen inside
    * the lateness horizon, O(keys per window) not O(stream), which is
    * what makes dedup viable on an unbounded 100 TB/day ingest: dedup by
    * content key FIRST, before any expensive enrichment fans the
    * duplicates out. On a batch frame this is a plain `dropDuplicates`
    * (exact, no horizon) — Spark rejects the WithinWatermark variant
    * outside streaming, so the unified-API adaptation is explicit here. */
  def dedupEvents(events: DataFrame, keyCols: Seq[String],
                  lateness: String = "2 hours",
                  tsCol: String = "ts"): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, lateness)
        .dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /** Sessionization by user with a max-gap session window. */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
                   lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))

  /** Stream-stream interval join: pairs every left row with the right
    * rows of the same `key` whose event time lies in
    * [leftTs - before, leftTs + after]. Column names must already be
    * disjoint apart from `key` (rename upfront).
    *
    * In streaming mode BOTH sides carry watermarks and the join
    * condition is time-bounded in both directions, which is exactly what
    * lets Spark's symmetric stateful hash join evict buffered rows: each
    * side's state holds only rows inside
    * watermark + interval — O(rate × horizon), not O(stream). Without
    * the two-sided time bound the state would grow forever; Spark
    * rejects such joins in append mode for that reason.
    *
    * The SAME call on batch frames plans as an ordinary non-equi join —
    * correct, but at batch scale prefer
    * `TemporalJoins.rangeJoinBucketed`, which meets each qualifying pair
    * exactly once through a bucketed equi-join instead of filtering a
    * key-equi fan-out. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   before: String, after: String,
                   lateness: String = "2 hours",
                   joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer").contains(joinType),
      s"intervalJoin supports inner/left_outer, got $joinType")
    // backtick-quote the user-supplied names (the watermarkLateAccounting
    // discipline, r15/r16 review): a key like "user.id" would otherwise
    // resolve as a struct-field access — silently or as a deep Catalyst
    // error — instead of the column the caller named
    def bq(c: String): String = "`" + c.replace("`", "``") + "`"
    // validate the interval literals EAGERLY with a NAMED error:
    // functions.expr defers parsing to analysis (Spark 4 ColumnNode),
    // so a malformed duration would otherwise surface as a bare
    // ParseException out of the join's analysis, pointing at generated
    // SQL instead of at the argument. Validation MUST use the same
    // grammar the literal does: an earlier rendition pre-checked with
    // IntervalUtils.stringToInterval, which parses only the 'N unit'
    // form and so rejected ANSI interval strings the join itself
    // accepts (e.g. "'1 2:03:04' DAY TO SECOND") — r16 advice
    def iv(s: String, what: String): Column = {
      val parsed =
        try org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseExpression(s"INTERVAL $s")
        catch {
          case e: org.apache.spark.sql.catalyst.parser.ParseException =>
            throw new IllegalArgumentException(
              s"intervalJoin: $what = '$s' is not a valid interval", e)
        }
      // parsing alone is not enough: "1 minute + no_such_col" parses as
      // a valid EXPRESSION, defers to the join's analysis, and surfaces
      // as an UNRESOLVED_COLUMN error pointing at generated SQL — the
      // exact late failure this guard exists to prevent (r17 review).
      // A well-formed interval literal parses to a bare Literal of an
      // interval type; anything else is rejected eagerly by name
      parsed match {
        case lit: org.apache.spark.sql.catalyst.expressions.Literal
          if lit.dataType.isInstanceOf[
               org.apache.spark.sql.types.CalendarIntervalType] ||
             lit.dataType.isInstanceOf[
               org.apache.spark.sql.types.DayTimeIntervalType] ||
             lit.dataType.isInstanceOf[
               org.apache.spark.sql.types.YearMonthIntervalType] => ()
        case _ =>
          throw new IllegalArgumentException(
            s"intervalJoin: $what = '$s' is not a valid interval " +
              "(must be a single interval literal, e.g. \"10 minutes\" " +
              "or \"'1 2:03:04' DAY TO SECOND\")")
      }
      expr(s"INTERVAL $s")
    }
    val beforeIv = iv(before, "before")
    val afterIv = iv(after, "after")
    val l = (if (left.isStreaming) left.withWatermark(leftTs, lateness)
             else left).alias("l")
    val r = (if (right.isStreaming) right.withWatermark(rightTs, lateness)
             else right).alias("r")
    // left_outer emits the NULL-padded left row only once the watermark
    // proves no in-range right row can still arrive — same state bound
    // as inner, plus the deferred-emit buffer the semantics require
    l.join(r,
      col(s"l.${bq(key)}") === col(s"r.${bq(key)}") &&
        col(s"r.${bq(rightTs)}") >= col(s"l.${bq(leftTs)}") - beforeIv &&
        col(s"r.${bq(rightTs)}") <= col(s"l.${bq(leftTs)}") + afterIv,
      joinType)
      .drop(col(s"r.${bq(key)}"))
  }

  /** Stream-static enrichment: left-join each arriving event against a
    * static dimension (the classic "attach the user/domain/source
    * profile" step). The dimension is explicitly broadcast — a
    * stream-static join never shuffles the stream, needs no watermark
    * (the static side cannot be late), and holds NO join state: each
    * micro-batch probes the broadcast table and moves on. Unmatched
    * stream rows survive with NULL dimension columns (left join — an
    * enrichment must not drop events). Same call works on batch frames
    * for oracle parity (w07). */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Duration string → fixed milliseconds, with failures ATTRIBUTED to
    * the named parameter: a malformed string ("10 minuts") previously
    * surfaced as Spark's bare 'Error parsing ... to interval' with no
    * mention of which argument was wrong (r17 review — the same advice
    * this round applied to intervalJoin's before/after). Shared by the
    * lateness and evictAfter guards, which previously hand-maintained
    * two copies of this conversion. Calendar-length units (months) have
    * no fixed millis and are rejected; state timestamps are
    * millisecond-granular, so sub-ms components truncate (a duration
    * under 1 ms is indistinguishable from zero). */
  private def fixedMs(s: String, what: String): Long = {
    val iv =
      try org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      catch {
        case e: IllegalArgumentException =>
          throw new IllegalArgumentException(
            s"$what = '$s' is not a valid duration", e)
      }
    require(iv.months == 0, s"$what must be a fixed-length duration: '$s'")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** STREAMING near-duplicate detection — flag each arriving document
    * against everything seen before it, without ever holding the corpus.
    *
    * The batch pipeline (Dedup.simhashCandidates, d04) blocks on the
    * four 16-bit SimHash bands; this is its incremental form. Each doc
    * computes its 64-bit SimHash scan-side (native expression) and
    * explodes to its 4 (band, band_val) keys; state lives per BUCKET —
    * the last `maxBucket` (doc_id, sig) pairs, 16 bytes each — and a
    * new arrival compares its full signature against the bucket's
    * residents (Hamming ≤ maxHamming), emitting a [[NearDupPair]] per
    * hit with the EARLIER doc as `id_a`.
    *
    * State discipline: the key space is bounded by construction
    * (4 bands × 2¹⁶ values), so the default `NoTimeout` is safe — total
    * state is at most 4·65536·maxBucket entries REGARDLESS of stream
    * length, and a boilerplate mega-bucket degrades to "remembers the
    * last maxBucket docs" instead of growing without bound (same cap
    * philosophy as the batch LSH `maxBucket`). Pairs colliding in k>1
    * bands are emitted up to k times (bucket states are independent);
    * downstream consumers dedup on (id_a, id_b) — the suite asserts the
    * DEDUPED set equals the batch `simhashCandidates` pair set on the
    * same documents. The same call works on a batch Dataset (each
    * bucket's group runs once over its rows in `ts, doc_id` order).
    *
    * `evictAfter = Some(duration)` adds the EVENT-TIME eviction mode an
    * UNBOUNDED banding scheme needs (more bands, wider band values, or
    * a per-tenant key pushes the key space past "bounded by
    * construction" — then NoTimeout state grows with distinct keys
    * forever). Semantics: a resident stays pairable for `duration` of
    * event time — once the watermark passes resident.ts + duration it
    * is dropped from its bucket (recall trades against state, exactly
    * like `dropDuplicatesWithinWatermark`'s horizon) — and a bucket
    * QUIET for `duration` past its newest event times out wholesale
    * (`EventTimeTimeout` + `state.remove()`), so state is
    * O(buckets active within the horizon), not O(buckets ever seen).
    * Requires a streaming input (the mode is meaningless on bounded
    * batch inputs, which should use Dedup.simhashCandidates);
    * `lateness` sets the input watermark delay.
    *
    * TRANSIENT memory caveat: `maxBucket` bounds the PERSISTED state,
    * not the working set. Arrival order must be imposed inside the
    * group (the engine hands rows unordered), so one invocation buffers
    * every row of its (band, band_val) bucket that arrived IN THIS
    * micro-batch — O(batch bucket occupancy), held as three flat long
    * arrays plus an int sort-index (~30 B/row, no per-row boxing).
    * A boilerplate mega-bucket is therefore bounded
    * operationally, by the micro-batch size: cap the source rate
    * (`maxFilesPerTrigger` / `maxOffsetsPerTrigger`) so that
    * rate × trigger interval rows fit an executor even if they all
    * share one bucket. In the batch rendition the "micro-batch" is the
    * whole input — run the batch path (Dedup.simhashCandidates) for
    * large offline corpora instead.
    *
    * CHECKPOINT COMPATIBILITY: adding the eviction mode widened the
    * Kryo state record from (id, sig) to (id, sig, eventMs) — a
    * checkpoint written by the earlier shape does not restore into
    * this one (Kryo offers no tuple migration). Restart affected
    * streams from a fresh checkpoint; the state rebuilds from the
    * source within one eviction horizon. */
  def streamNearDupPairs(docs: Dataset[StreamDoc], maxHamming: Int = 3,
                         maxBucket: Int = 64,
                         evictAfter: Option[String] = None,
                         lateness: String = "0 seconds",
                         portableSig: Boolean = false): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val st = Encoders.kryo[Vector[(Long, Long, Long)]]
    require(evictAfter.isEmpty || docs.isStreaming,
      "evictAfter is an event-time watermark mode: batch inputs are " +
        "bounded (use the default NoTimeout, or Dedup.simhashCandidates)")
    // a 4-band split of a 64-bit signature pigeonholes only Hamming ≤ 3
    // — a larger maxHamming would silently miss qualifying pairs, and
    // maxBucket ≤ 0 would keep an always-empty resident list (zero
    // pairs forever, no error)
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming=$maxHamming outside the 4-band guarantee [0, 3]")
    require(maxBucket > 0, s"maxBucket=$maxBucket must be positive")
    // lateness ONLY takes effect through the watermark the eviction
    // mode installs — without evictAfter no watermark is applied at
    // all, and a caller passing an explicit lateness would believe a
    // bound exists when none does (r16 review): make that loud. The
    // check is SEMANTIC, not textual — "0 minutes" / "0 second" are
    // zero too (a string-equality guard against the default literal
    // rejected them with a message implying a nonzero lateness — r16
    // advice); parse once and compare the fixed-length millis
    val latenessMs = fixedMs(lateness, "lateness")
    require(latenessMs == 0L || evictAfter.isDefined,
      s"lateness ('$lateness') has no effect without evictAfter — it " +
        "sets the event-time watermark the eviction horizon reads; " +
        "pass evictAfter, or drop lateness")
    // duration → fixed millis, driver-side, so the group function's
    // horizon filter needs no per-row parsing; calendar-length units
    // (months) have no fixed millis and are rejected. State timestamps
    // have MILLISECOND granularity (ts.getTime), so sub-ms components
    // truncate — a duration under 1 ms is indistinguishable from zero
    val evictMs = evictAfter.map { s =>
      val ms = fixedMs(s, "evictAfter")
      // a zero/negative horizon would put setTimeoutTimestamp at or
      // behind the watermark — a mid-batch IllegalArgumentException
      // instead of a construction-time error
      require(ms > 0,
        s"evictAfter must be at least 1 millisecond (state timestamps " +
          s"are millisecond-granular): got '$s'")
      ms
    }
    val src =
      if (evictAfter.isDefined) docs.toDF().withWatermark("ts", lateness)
      else docs.toDF()
    // portableSig swaps the 64-bit XXH64 signature for the 60-bit
    // MD5-keyed portable SimHash (the d04 oracle family) — same
    // pigeonhole guarantee under the 16-bit banding below (4 disjoint
    // bands cover all signature bits; any Hamming ≤ 3 pair shares one),
    // but the whole pair set replays in ANSI SQL, which is what lets
    // the w06 batch rendition carry a full hash oracle. Default stays
    // XXH64 (production path; StreamingSuite pins it).
    val sigOf: Column => Column =
      if (portableSig) graft.expressions.TextExpressions.simhashPortable60
      else graft.operators.Dedup.simhash64
    // fail loudly at the first NULL text/ts instead of killing the
    // unbounded query mid-batch with an opaque non-nullable-field or
    // NPE error (the watermarkLateAccounting construction-side guard):
    // one poison record should name itself, not abort the stream
    // anonymously. BOTH guards ride the sig column — rewrapping the ts
    // column itself would strip its watermark metadata and break the
    // EventTimeTimeout mode
    val guardedText = when(col("text").isNull, raise_error(concat(
      lit("streamNearDupPairs: NULL text for doc_id "),
      col("doc_id").cast("string")))).otherwise(col("text"))
    val sigGuarded = when(col("ts").isNull, raise_error(concat(
      lit("streamNearDupPairs: NULL ts for doc_id "),
      col("doc_id").cast("string")))).otherwise(sigOf(guardedText))
    // band keys come from Dedup.simhashBandCols — the ONE banding
    // definition (r16 review). Width stays 16 for BOTH signature
    // variants here (4×16 covers 64 and 60 bits alike, so the
    // pigeonhole holds; the batch portable path bands at 15, a
    // different CANDIDATE set but the same final Hamming-filtered
    // pairs) — do not change it casually: bucket keys are state keys,
    // and a width change orphans every existing checkpoint.
    val banded = src
      .select(col("doc_id"), col("ts"), sigGuarded.as("sig"))
      .select(col("doc_id"), col("ts"), col("sig"), posexplode(array(
        graft.operators.Dedup.simhashBandCols(col("sig"), 16): _*)))
      .select(col("pos").as("band"), col("col").as("band_val"),
        col("doc_id"), col("ts"), col("sig"))
      .as[(Int, Long, Long, java.sql.Timestamp, Long)]
    val timeoutConf =
      if (evictAfter.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    banded.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Vector[(Long, Long, Long)], NearDupPair](
        OutputMode.Append(), timeoutConf) {
        (_: (Int, Long), rows: Iterator[(Int, Long, Long, java.sql.Timestamp, Long)],
         state: GroupState[Vector[(Long, Long, Long)]]) =>
          if (state.hasTimedOut) {
            // quiet-bucket cleanup: no event for evictAfter past the
            // bucket's newest event — drop the whole bucket
            state.remove()
            Iterator.empty
          } else {
            var residents = state.getOption.getOrElse(Vector.empty)
            // horizon eviction: a resident stops being pairable once
            // the watermark passes its event time + evictAfter
            evictMs.foreach { ms =>
              val wm = state.getCurrentWatermarkMs()
              if (wm > 0) residents = residents.filter(_._3 + ms > wm)
            }
            val out = Vector.newBuilder[NearDupPair]
            // The engine hands group rows unordered: impose arrival order.
            // Buffer as three FLAT long arrays (24 B/row + one int index
            // array — no per-row boxing) — the unavoidable
            // O(batch-bucket-occupancy) working set at its minimal width
            // (see the transient-memory caveat in the scaladoc).
            val tsB = Array.newBuilder[Long]
            val idB = Array.newBuilder[Long]
            val sigB = Array.newBuilder[Long]
            rows.foreach { case (_, _, id, ts, sig) =>
              tsB += ts.getTime; idB += id; sigB += sig
            }
            val tsA = tsB.result(); val idA = idB.result()
            val sigA = sigB.result()
            val order = Array.range(0, tsA.length)
              .sortBy(i => (tsA(i), idA(i)))
            order.foreach { i =>
              val id = idA(i); val sig = sigA(i)
              residents.foreach { case (pid, psig, _) =>
                val h = java.lang.Long.bitCount(psig ^ sig)
                if (h <= maxHamming && pid != id) out += NearDupPair(pid, id, h)
              }
              residents = (residents :+ ((id, sig, tsA(i)))).takeRight(maxBucket)
            }
            state.update(residents)
            evictMs.foreach { ms =>
              // bucket-level timeout re-arms on every batch with data:
              // evictAfter past the newest event among the UPDATED
              // residents (clamped above the watermark — Spark rejects
              // timestamps at/behind it). Arming from the batch-local
              // max instead would let a LATE-arriving older event pull
              // the timeout EARLIER than a previous arming, and the
              // hasTimedOut wholesale remove() would drop residents
              // still inside their pairable horizon (silent missed
              // pairs). Residents are non-empty here — the batch just
              // appended — and their max ts is the bucket's newest
              // surviving event, so the timeout fires exactly when the
              // whole bucket is past the horizon.
              var maxTs = Long.MinValue
              residents.foreach { r => if (r._3 > maxTs) maxTs = r._3 }
              state.setTimeoutTimestamp(
                math.max(maxTs, state.getCurrentWatermarkMs() + 1) + ms)
            }
            out.result().iterator
          }
      }
  }

  /** Per-user running statistics via CUSTOM state
    * (`flatMapGroupsWithState`): Welford-updated count/mean/M2 per user,
    * emitted on every update. State per key is three doubles — O(users)
    * total, independent of event volume; `NoTimeout` here because the
    * key space is bounded (pair with event-time timeout when it isn't).
    * The same call works on a batch Dataset (state spans the batch). */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    implicit val se = Encoders.product[UserStats]
    implicit val st = Encoders.product[WelfordState]
    implicit val k = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[WelfordState, UserStats](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[UserEvent],
         state: GroupState[WelfordState]) =>
          var s = state.getOption.getOrElse(WelfordState(0L, 0.0, 0.0))
          rows.foreach { e =>
            val n1 = s.n + 1
            val d = e.value - s.mean
            val mean1 = s.mean + d / n1
            s = WelfordState(n1, mean1, s.m2 + d * (e.value - mean1))
          }
          state.update(s)
          Iterator(UserStats(user, s.n, s.mean,
            if (s.n > 1) s.m2 / (s.n - 1) else 0.0))
      }
  }

  /** Stateful ORDERED-funnel progression — the streaming counterpart of
    * [[graft.operators.Behavior.funnelTimes]]: per user, stage k's
    * timestamp is the earliest `stages(k)` event STRICTLY AFTER stage
    * k−1's, carried across micro-batches as one O(k)-long state vector
    * per user. Emits the user's current stage times (epoch MICROSECONDS
    * — millisecond Timestamp.getTime would drop sub-ms and disagree
    * with the window rendition on micro-spaced events) on every update;
    * the same call on a batch Dataset reproduces funnelTimes exactly
    * (the graded w09 rendition).
    *
    * Within one invocation the row iterator carries NO event-time
    * order, so each (user, batch) slice is buffered and sorted —
    * transient memory is bounded by a user's events per micro-batch
    * (same operational contract as streamNearDupPairs' group buffer),
    * while the PERSISTENT state is k longs regardless of volume.
    * Ascending-order folding makes greedy assignment exact: the first
    * qualifying event per stage IS the minimum. */
  def funnelProgress(events: Dataset[FunnelEvent],
                     stages: Seq[String]): Dataset[FunnelProgress] = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be non-empty and distinct: $stages")
    implicit val st = Encoders.product[FunnelState]
    implicit val out = Encoders.product[FunnelProgress]
    implicit val k = Encoders.scalaLong
    val stageIdx = stages.zipWithIndex.toMap
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[FunnelEvent],
         state: GroupState[FunnelState]) =>
          // floorDiv, not `/`: getTime of a pre-epoch timestamp with a
          // sub-second part is e.g. -500 ms for -0.5 s, and truncating
          // division would emit +500000 µs — non-monotone ordering and
          // a fork from Behavior.funnelTimes on pre-epoch events
          def micros(t: java.sql.Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          // reconcile RESTORED state length with this run's stage list:
          // a redeploy that added a stage would otherwise AIOOBE on the
          // first event of the new stage (length-k₀ array, index k₀),
          // and one that removed a stage would emit wrong-length times
          // silently (r16 review). Growing pads with None (the new
          // stage was never reached); shrinking truncates the dropped
          // tail — completed prefix stages survive either way.
          val times = state.getOption.map { st0 =>
            val old = st0.times.toArray
            if (old.length == stages.size) old
            else old.take(stages.size)
              .padTo(stages.size, None: Option[Long])
          }.getOrElse(Array.fill(stages.size)(None: Option[Long]))
          val arr = rows.toArray
          // a NULL ts/event_type would NPE inside the stateful operator
          // and kill the unbounded query with an anonymous executor
          // stack — name the poison row instead (the
          // watermarkLateAccounting / streamNearDupPairs contract)
          arr.foreach { e =>
            require(e.ts != null && e.event_type != null,
              s"funnelProgress: NULL ts or event_type for user $user — " +
                "poison row in the stream")
          }
          val sorted = arr.sortBy(e => (micros(e.ts), e.event_type))
          sorted.foreach { e =>
            stageIdx.get(e.event_type).foreach { i =>
              val t = micros(e.ts)
              val qualifies = times(i).isEmpty &&
                (i == 0 || times(i - 1).exists(_ < t))
              if (qualifies) times(i) = Some(t)
            }
          }
          val s = FunnelState(times.toSeq)
          state.update(s)
          Iterator(FunnelProgress(user, s.times))
      }
  }
}

final case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
                             event_type: String)
final case class FunnelState(times: Seq[Option[Long]])
final case class FunnelProgress(user_id: Long, times: Seq[Option[Long]])

final case class UserEvent(user_id: Long, value: Double)
final case class WelfordState(n: Long, mean: Double, m2: Double)
final case class UserStats(user_id: Long, n: Long, mean: Double,
                           var_samp: Double)
final case class StreamDoc(doc_id: Long, ts: java.sql.Timestamp, text: String)
final case class NearDupPair(id_a: Long, id_b: Long, hamming: Int)
