package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

final case class Ev(ts: Timestamp, event_type: String, value: Double)
final case class Pur(p_id: Long, user_id: Long, p_ts: Timestamp)
final case class Clk(c_id: Long, user_id: Long, c_ts: Timestamp)

class StreamingSuite extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("tumbling window agg: identical results batch vs streaming") {
    val events = Seq(
      Ev(t("2026-01-01 10:05:00"), "click", 1.0),
      Ev(t("2026-01-01 10:40:00"), "click", 2.0),
      Ev(t("2026-01-01 10:50:00"), "view", 5.0),
      Ev(t("2026-01-01 11:10:00"), "click", 3.0))

    val batch = Streams.tumblingEventStatsFlat(events.toDF(), "1 hour")
      .orderBy("w_start", "event_type")
      .as[(String, String, Long, Double)].collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(events: _*)
    val q = Streams.tumblingEventStats(mem.toDF(), "1 hour")
      .select(col("w.start").cast("string").as("w_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_test")
        .orderBy("w_start", "event_type")
        .as[(String, String, Long, Double)].collect().toSeq
      assert(streamed === batch)
      assert(batch === Seq(
        ("2026-01-01 10:00:00", "click", 2L, 3.0),
        ("2026-01-01 10:00:00", "view", 1L, 5.0),
        ("2026-01-01 11:00:00", "click", 1L, 3.0)))
    } finally q.stop()
  }

  test("trending top-k: sink-side rank over streamed counts == batch rendition") {
    val events = Seq(
      Ev(t("2026-01-01 10:05:00"), "click", 1.0),
      Ev(t("2026-01-01 10:10:00"), "click", 1.0),
      Ev(t("2026-01-01 10:20:00"), "view", 1.0),
      Ev(t("2026-01-01 10:30:00"), "view", 1.0),
      Ev(t("2026-01-01 10:40:00"), "buy", 1.0),   // ties view? no: 2/2/1
      Ev(t("2026-01-01 11:05:00"), "view", 1.0))

    val batch = Streams.trendingTopK(events.toDF(), "1 hour", k = 2)
      .orderBy("w_start", "rank")
      .as[(String, String, Long, Int)].collect().toSeq
    // hour 10: click 2 / view 2 → tie broken lexicographically; buy cut
    assert(batch === Seq(
      ("2026-01-01 10:00:00", "click", 2L, 1),
      ("2026-01-01 10:00:00", "view", 2L, 2),
      ("2026-01-01 11:00:00", "view", 1L, 1)))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(events: _*)
    val q = Streams.trendingCounts(mem.toDF(), "1 hour")
      .writeStream.format("memory").queryName("trending_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = Streams.rankTopK(spark.table("trending_counts"), k = 2)
        .orderBy("w_start", "rank")
        .as[(String, String, Long, Int)].collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-static enrichment join: batch == streaming, unmatched " +
      "events kept with NULL dim") {
    val events = Seq(
      UserEvent(1L, 1.0), UserEvent(1L, 2.0),
      UserEvent(2L, 5.0),
      UserEvent(9L, 7.0)) // no dim row
    val dim = Seq((1L, "gold"), (2L, "silver"), (3L, "unused"))
      .toDF("user_id", "segment")

    def agg(df: org.apache.spark.sql.DataFrame) =
      Streams.enrichWithDim(df, dim, "user_id")
        .groupBy(coalesce(col("segment"), lit("none")).as("segment"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))

    val batch = agg(events.toDF()).orderBy("segment")
      .as[(String, Long, Double)].collect().toSeq
    assert(batch === Seq(("gold", 2L, 3.0), ("none", 1L, 7.0),
      ("silver", 1L, 5.0)))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    mem.addData(events: _*)
    val q = agg(mem.toDF())
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich_test").orderBy("segment")
        .as[(String, Long, Double)].collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("sliding window agg: each event in windowLen/slide windows, " +
      "batch == streaming") {
    val events = Seq(
      Ev(t("2026-01-01 10:05:00"), "click", 1.0),
      Ev(t("2026-01-01 11:10:00"), "click", 3.0))

    val batch = Streams.slidingEventStatsFlat(events.toDF(), "2 hours", "1 hour")
      .orderBy("w_start", "event_type")
      .as[(String, String, Long, Double)].collect().toSeq
    // 10:05 lands in [09:00,11:00) and [10:00,12:00); 11:10 in
    // [10:00,12:00) and [11:00,13:00)
    assert(batch === Seq(
      ("2026-01-01 09:00:00", "click", 1L, 1.0),
      ("2026-01-01 10:00:00", "click", 2L, 4.0),
      ("2026-01-01 11:00:00", "click", 1L, 3.0)))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(events: _*)
    val q = Streams.slidingEventStats(mem.toDF(), "2 hours", "1 hour")
      .select(col("w.start").cast("string").as("w_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .writeStream.format("memory").queryName("sliding_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sliding_test")
        .orderBy("w_start", "event_type")
        .as[(String, String, Long, Double)].collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("watermark drops events later than the allowed lateness") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streams.tumblingEventStats(mem.toDF(), "1 hour", "30 minutes")
      .select(col("w.start").cast("string").as("w_start"), col("n_events"))
      .writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    try {
      mem.addData(Ev(t("2026-01-01 10:10:00"), "click", 1.0))
      q.processAllAvailable()
      // advance watermark far past the 10:00 window (wm = 14:30)
      mem.addData(Ev(t("2026-01-01 15:00:00"), "click", 1.0))
      q.processAllAvailable()
      // too-late event for the closed 10:00 window: must be dropped
      mem.addData(Ev(t("2026-01-01 10:20:00"), "click", 100.0))
      q.processAllAvailable()
      val rows = spark.table("wm_test")
        .as[(String, Long)].collect().toMap
      assert(rows("2026-01-01 10:00:00") === 1L) // late row not counted
    } finally q.stop()
  }

  test("file-source stream over real events parquet == batch result") {
    val sfDir = "/root/testdata/sf0.001"
    val batchEvents = graft.util.Tables.loadEvents(spark, sfDir)
    val batch = Streams.tumblingEventStatsFlat(batchEvents, "1 hour")
      .orderBy("w_start", "event_type")
      .as[(String, String, Long, Double)].collect().toSeq

    // file stream sources consume a DIRECTORY of files
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("part-0.parquet"))
    // same schema-adaptive ts dispatch as the batch loader — shared
    // via Tables.withEventTs so a physical-type change is fixed once
    val rawSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val streamEvents = graft.util.Tables.withEventTs(
      spark.readStream.schema(rawSchema).parquet(dir.toString))
    val q = Streams.tumblingEventStats(streamEvents, "1 hour")
      .select(col("w.start").cast("string").as("w_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .writeStream.format("memory").queryName("file_stream_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_stream_test")
        .orderBy("w_start", "event_type")
        .as[(String, String, Long, Double)].collect().toSeq
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("flatMapGroupsWithState: running per-user stats accumulate across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = Streams.runningUserStats(mem.toDS())
      .writeStream.format("memory").queryName("state_test")
      .outputMode("append").start()
    try {
      mem.addData(UserEvent(1L, 10.0), UserEvent(1L, 20.0), UserEvent(2L, 5.0))
      q.processAllAvailable()
      mem.addData(UserEvent(1L, 30.0)) // state must carry over
      q.processAllAvailable()
      val last = spark.table("state_test")
        .orderBy(col("user_id"), col("n"))
        .as[(Long, Long, Double, Double)].collect()
        .groupBy(_._1).map { case (u, rs) => u -> rs.last }.toMap
      // user 1 after both batches: n=3, mean=20, var=100
      assert(last(1L)._2 === 3L)
      assert(math.abs(last(1L)._3 - 20.0) < 1e-12)
      assert(math.abs(last(1L)._4 - 100.0) < 1e-12)
      assert(last(2L)._2 === 1L)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark collapses replayed events, batch == streaming") {
    val events = Seq(
      Ev(t("2026-01-01 10:00:00"), "click", 1.0),
      Ev(t("2026-01-01 10:00:10"), "click", 1.0), // broker replay
      Ev(t("2026-01-01 10:05:00"), "view", 2.0))

    val batch = Streams.dedupEvents(
        events.toDF().withColumn("user_id", lit(1L)),
        Seq("user_id", "event_type", "value"), "1 hour")
      .select("event_type", "value")
      .as[(String, Double)].collect().sorted.toSeq
    assert(batch === Seq(("click", 1.0), ("view", 2.0)))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streams.dedupEvents(
        mem.toDF().withColumn("user_id", lit(1L)),
        Seq("user_id", "event_type", "value"), "1 hour")
      .select(col("event_type"), col("value"))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      mem.addData(events(0), events(1))
      q.processAllAvailable()
      mem.addData(events(2),
        Ev(t("2026-01-01 10:06:00"), "click", 1.0)) // cross-batch replay
      q.processAllAvailable()
      val streamed = spark.table("dedup_test")
        .as[(String, Double)].collect().sorted.toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-stream interval join: batch == streaming, state evicted by watermark") {
    val purchases = Seq(
      Pur(1L, 10L, t("2026-01-01 10:10:00")),
      Pur(2L, 10L, t("2026-01-01 11:00:00")),
      Pur(3L, 20L, t("2026-01-01 10:10:00")))
    val clicks = Seq(
      Clk(101L, 10L, t("2026-01-01 10:05:00")), // within 10 min of p1
      Clk(102L, 10L, t("2026-01-01 10:10:00")), // simultaneous: included
      Clk(103L, 10L, t("2026-01-01 10:20:00")), // after p1, outside p2's window
      Clk(104L, 20L, t("2026-01-01 10:09:00"))) // other user → p3 only

    def join(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      Streams.intervalJoin(l, r, "user_id", "p_ts", "c_ts",
        before = "10 minutes", after = "0 seconds", lateness = "1 hour")

    val batch = join(purchases.toDF(), clicks.toDF())
      .select("p_id", "c_id").as[(Long, Long)].collect().sorted.toSeq
    assert(batch === Seq((1L, 101L), (1L, 102L), (3L, 104L)))

    implicit val sqlCtx = spark.sqlContext
    val memP = MemoryStream[Pur]
    val memC = MemoryStream[Clk]
    val q = join(memP.toDF(), memC.toDF())
      .select(col("p_id"), col("c_id"))
      .writeStream.format("memory").queryName("interval_join_test")
      .outputMode("append").start()
    try {
      memP.addData(purchases(0)); memC.addData(clicks(0), clicks(1))
      q.processAllAvailable()
      memP.addData(purchases(1), purchases(2)) // across batches
      memC.addData(clicks(2), clicks(3))
      q.processAllAvailable()
      val streamed = spark.table("interval_join_test")
        .as[(Long, Long)].collect().sorted.toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-stream interval LEFT join: unmatched left rows emerge " +
      "NULL-padded once the watermark closes their window") {
    val purchases = Seq(
      Pur(1L, 10L, t("2026-01-01 10:10:00")), // has clicks
      Pur(2L, 10L, t("2026-01-01 11:00:00")), // no click in window
      Pur(3L, 20L, t("2026-01-01 10:10:00")))
    val clicks = Seq(
      Clk(101L, 10L, t("2026-01-01 10:05:00")),
      Clk(102L, 10L, t("2026-01-01 10:10:00")),
      Clk(104L, 20L, t("2026-01-01 10:09:00")))

    def join(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      Streams.intervalJoin(l, r, "user_id", "p_ts", "c_ts",
        before = "10 minutes", after = "0 seconds", lateness = "10 minutes",
        joinType = "left_outer")

    val batch = join(purchases.toDF(), clicks.toDF())
      .select(col("p_id"), col("c_id"))
      .as[(Long, Option[Long])].collect().sorted.toSeq
    assert(batch === Seq((1L, Some(101L)), (1L, Some(102L)),
      (2L, None), (3L, Some(104L))))

    implicit val sqlCtx = spark.sqlContext
    val memP = MemoryStream[Pur]
    val memC = MemoryStream[Clk]
    val q = join(memP.toDF(), memC.toDF())
      .select(col("p_id"), col("c_id"))
      .writeStream.format("memory").queryName("interval_left_test")
      .outputMode("append").start()
    try {
      memP.addData(purchases: _*); memC.addData(clicks: _*)
      q.processAllAvailable()
      // push both watermarks far past p2's window so its NULL row emits
      memP.addData(Pur(99L, 99L, t("2026-01-01 14:00:00")))
      memC.addData(Clk(999L, 99L, t("2026-01-01 14:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("interval_left_test")
        .filter(col("p_id") < 99L)
        .as[(Long, Option[Long])].collect().sorted.toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("session windows group by gap") {
    val events = Seq(
      Ev(t("2026-01-01 10:00:00"), "u1", 1.0),
      Ev(t("2026-01-01 10:10:00"), "u1", 1.0),
      Ev(t("2026-01-01 12:00:00"), "u1", 1.0))
      .toDF("ts", "utype", "value")
      .withColumn("user_id", lit(1L))
    val sess = Streams.sessionStats(events, "30 minutes")
      .select("n_events").as[Long].collect().sorted.toSeq
    assert(sess === Seq(1L, 2L)) // two sessions: (10:00,10:10) and (12:00)
  }

  // streamed (deduped) pair set over the real documents fixture, with
  // ts = arrival in doc_id order — the shared ground for both neardup
  // tests below
  private def fixtureDocs(n: Int): Seq[StreamDoc] = {
    import org.apache.spark.sql.Row
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").limit(n).collect()
      .map { case Row(id: Long, text: String) =>
        StreamDoc(id, new Timestamp(1700000000000L + id * 1000), text)
      }.toSeq
  }

  test("streaming near-dup: deduped pair set == batch simhashCandidates") {
    val docs = fixtureDocs(500)
    val got = Streams.streamNearDupPairs(docs.toDS(), maxHamming = 3,
        maxBucket = 1024) // cap above fixture bucket sizes: exact parity
      .collect().map(p => (p.id_a, p.id_b)).toSet
    val want = graft.operators.Dedup.simhashCandidates(
        docs.toDF(), "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture has no simhash near-dups — vacuous test")
    assert(got === want)
  }

  test("streaming near-dup: state carries across batches (MemoryStream)") {
    val docs = fixtureDocs(500)
    val (first, second) = docs.splitAt(250)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val q = Streams.streamNearDupPairs(mem.toDS(), maxHamming = 3,
        maxBucket = 1024)
      .writeStream.format("memory").queryName("neardup_test")
      .outputMode("append").start()
    try {
      mem.addData(first: _*); q.processAllAvailable()
      mem.addData(second: _*); q.processAllAvailable()
      val got = spark.table("neardup_test")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val want = graft.operators.Dedup.simhashCandidates(
          docs.toDF(), "doc_id", "text", maxHamming = 3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // pairs straddling the two micro-batches prove cross-batch state
      val straddling = want.filter { case (a, b) => a < 250 && b >= 250 }
      assert(straddling.nonEmpty, "no cross-batch pair in fixture — vacuous")
      assert(got === want)
    } finally q.stop()
  }

  test("streaming near-dup evictAfter: horizon bounds which pairs are emitted") {
    // Event-time eviction mode (round-9): residents stop being pairable
    // once the watermark passes their ts + evictAfter. Identical texts
    // doc 1/2 pair inside the horizon; after fillers push the watermark
    // far past their horizon, the SAME text arriving again (doc 5) must
    // NOT pair with them — only with its own fresh neighbor (doc 6).
    val base = 1700000000000L
    def doc(id: Long, min: Long, text: String) =
      StreamDoc(id, new Timestamp(base + min * 60000L), text)
    val same = "spark streams near duplicate detection with simhash bands"
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val q = Streams.streamNearDupPairs(mem.toDS(), maxHamming = 3,
        maxBucket = 64, evictAfter = Some("30 minutes"))
      .writeStream.format("memory").queryName("neardup_evict")
      .outputMode("append").start()
    try {
      mem.addData(doc(1, 0, same), doc(2, 10, same))
      q.processAllAvailable() // wm → 10min; (1,2) inside horizon
      mem.addData(doc(30, 100, "a completely different filler document"))
      q.processAllAvailable() // wm → 100min: 1/2 horizon (30/40min) passed
      mem.addData(doc(5, 210, same))
      q.processAllAvailable() // same text, evicted residents: no pair
      mem.addData(doc(6, 212, same))
      q.processAllAvailable() // pairs with 5 only
      val got = spark.table("neardup_evict")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 2L), (5L, 6L)))
    } finally q.stop()
  }

  test("streaming near-dup evictAfter: a LATE-arriving older event must " +
      "not pull the bucket timeout earlier and evict pairable residents") {
    // r15 review: the timeout used to re-arm from the BATCH-local max
    // event time, so a late (but in-watermark) older event moved the
    // bucket timeout backwards and hasTimedOut wholesale-removed
    // residents still inside their horizon — silently missed pairs.
    // Now it re-arms from the newest surviving RESIDENT.
    val base = 1700000000000L
    def doc(id: Long, min: Long, text: String) =
      StreamDoc(id, new Timestamp(base + min * 60000L), text)
    val same = "spark streams near duplicate detection with simhash bands"
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val q = Streams.streamNearDupPairs(mem.toDS(), maxHamming = 3,
        maxBucket = 64, evictAfter = Some("30 minutes"),
        lateness = "2 hours")
      .writeStream.format("memory").queryName("neardup_late_rearm")
      .outputMode("append").start()
    try {
      mem.addData(doc(1, 180, same))
      q.processAllAvailable() // wm -> 60; bucket timeout 180+30 = 210
      mem.addData(doc(2, 90, same)) // LATE but in-watermark: pairs with 1
      q.processAllAvailable() // old bug: re-arm from batch max 90 -> 120
      mem.addData(doc(30, 260, "a completely different filler document"))
      q.processAllAvailable() // wm -> 140 (> 120, <= 210)
      mem.addData(doc(31, 261, "another unrelated filler text entry"))
      q.processAllAvailable() // old bug: bucket timed out, residents gone
      mem.addData(doc(5, 195, same))
      q.processAllAvailable() // doc 1 (horizon 210 > wm 141) must pair;
                              // doc 2 (horizon 120) is horizon-evicted
      val got = spark.table("neardup_late_rearm")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 2L), (1L, 5L)), got.toString)
    } finally q.stop()
  }

  test("funnelProgress names the poison row instead of an anonymous NPE " +
      "when ts or event_type is NULL") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val q = Streams.funnelProgress(mem.toDS(),
        Seq("view", "cart", "purchase"))
      .writeStream.format("memory").queryName("funnel_poison")
      .outputMode("append").start()
    try {
      mem.addData(FunnelEvent(1L, null, "view"))
      val e = intercept[Exception] { q.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("funnelProgress: NULL")),
        messages(e).mkString(" | "))
    } finally q.stop()
  }

  test("streaming near-dup evictAfter: quiet buckets time out of the state store") {
    // The state-size half of the round-9 eviction mode: with NoTimeout a
    // bucket key lives forever (fine for the bounded 4×2¹⁶ simhash key
    // space, unbounded growth for larger banding schemes). With
    // evictAfter, a bucket quiet past its horizon must be REMOVED —
    // observable as stateOperators.numRowsTotal falling back to the
    // live buckets only. Three distinct texts at t0/t100/t200 hold
    // 4 bucket keys each; once the watermark reaches 200min the t0 and
    // t100 buckets (timeouts 30+ε and 130+ε min) have fired, so ≤ 8 of
    // the 12 keys may remain (12 is exactly what NoTimeout would hold).
    val base = 1700000000000L
    def doc(id: Long, min: Long, text: String) =
      StreamDoc(id, new Timestamp(base + min * 60000L), text)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val q = Streams.streamNearDupPairs(mem.toDS(), maxHamming = 3,
        maxBucket = 64, evictAfter = Some("30 minutes"))
      .writeStream.format("memory").queryName("neardup_timeout")
      .outputMode("append").start()
    try {
      mem.addData(doc(1, 0, "first corpus document about spark engines"))
      q.processAllAvailable()
      mem.addData(doc(2, 100, "second unrelated text on stream state"))
      q.processAllAvailable()
      mem.addData(doc(3, 200, "third distinct entry covering watermarks"))
      q.processAllAvailable()
      val rows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(rows <= 8, s"quiet buckets not evicted: $rows state rows")
      assert(rows >= 4, s"live bucket must survive: $rows state rows")
    } finally q.stop()
  }

  test("funnelProgress carries ordered-funnel state across micro-batches") {
    def ts(m: Long) = new java.sql.Timestamp(m * 60000L)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val q = Streams.funnelProgress(mem.toDS(),
        Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_state_test")
      .outputMode("append").start()
    try {
      // batch 1: u1 views+clicks; u2's purchase arrives BEFORE any view
      mem.addData(FunnelEvent(1L, ts(0), "view"),
        FunnelEvent(1L, ts(10), "click"),
        FunnelEvent(2L, ts(5), "purchase"))
      q.processAllAvailable()
      // batch 2: u1 purchases (must convert via carried state);
      // u2 views then clicks — its old purchase must NOT count
      mem.addData(FunnelEvent(1L, ts(20), "purchase"),
        FunnelEvent(2L, ts(30), "view"), FunnelEvent(2L, ts(40), "click"))
      q.processAllAvailable()
      val last = spark.table("funnel_state_test")
        .as[(Long, Seq[Option[Long]])].collect()
        .groupBy(_._1).map { case (u, rs) =>
          u -> rs.map(_._2).maxBy(_.flatten.size) }.toMap
      def micros(m: Long) = m * 60000000L
      assert(last(1L) ===
        Seq(Some(micros(0)), Some(micros(10)), Some(micros(20))))
      assert(last(2L) === Seq(Some(micros(30)), Some(micros(40)), None))
    } finally q.stop()
  }

  test("funnelProgress batch rendition equals Behavior.funnelTimes") {
    val ev = Seq(
      (1L, new java.sql.Timestamp(1000L), "view"),
      (1L, new java.sql.Timestamp(2000L), "purchase"), // before click
      (1L, new java.sql.Timestamp(3000L), "click"),
      (1L, new java.sql.Timestamp(4000L), "purchase"),
      (2L, new java.sql.Timestamp(500L), "click")      // click, no view
    ).toDF("user_id", "ts", "event_type")
    val fromState = Streams.funnelProgress(
        ev.as[FunnelEvent], Seq("view", "click", "purchase"))
      .collect().map(p => p.user_id -> p.times).toMap
    val fromWindows = graft.operators.Behavior.funnelTimes(
        ev, "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .collect().map { r =>
        r.getLong(0) -> (1 to 3).map(i => Option(r.getTimestamp(i))
          .map(t => (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L))
      }.toMap
    assert(fromState === fromWindows)
  }

  test("watermarkLateAccounting: hand-checked lateness with cold-start " +
      "first batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // batch 0: 10:00 and 10:30 (sets the max; nothing late — no prior
    // watermark). batch 1 with a 45-min delay sees wm = 09:45:
    //  - 08:30 → window [08:00,09:00) ends 09:00 ≤ wm → LATE
    //  - 09:30 → BELOW the watermark but its window [09:00,10:00) ends
    //    10:00 > wm, so state is still open → on time (the event-time-
    //    only rule would wrongly flag it)
    //  - 10:45 → on time
    val ev = Seq(
      (0L, "2026-01-01 10:00:00"), (0L, "2026-01-01 10:30:00"),
      (1L, "2026-01-01 08:30:00"), (1L, "2026-01-01 09:30:00"),
      (1L, "2026-01-01 10:45:00"))
      .toDF("b", "s").select(col("b"), col("s").cast("timestamp").as("ts"))
    val got = graft.streaming.Streams.watermarkLateAccounting(
        ev, "b", "ts", delayMicros = 45L * 60 * 1000000)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("2026-01-01 08:00:00", 1L, 1L, 0L),
      ("2026-01-01 09:00:00", 1L, 0L, 1L),
      ("2026-01-01 10:00:00", 3L, 0L, 3L)))
    // a NULL batch would otherwise vanish through the watermark join
    val withNull = Seq((java.lang.Long.valueOf(0L), "2026-01-01 10:00:00"),
      (null.asInstanceOf[java.lang.Long], "2026-01-01 10:30:00"))
      .toDF("b", "s").select(col("b"), col("s").cast("timestamp").as("ts"))
    val e = intercept[Exception] {
      graft.streaming.Streams.watermarkLateAccounting(
        withNull, "b", "ts", delayMicros = 0L).collect()
    }
    assert(e.getMessage.contains("NULL in batch column"), e.getMessage)
  }

  test("streamNearDupPairs: a NULL text or ts names its doc_id instead " +
      "of killing the query with an opaque encoder error; bad shape " +
      "params fail at construction") {
    val nullText = Seq(
      StreamDoc(1L, new Timestamp(1700000000000L), "hello world"),
      StreamDoc(2L, new Timestamp(1700000001000L), null)).toDS()
    val e1 = intercept[Exception] {
      Streams.streamNearDupPairs(nullText, maxHamming = 3).collect()
    }
    assert(e1.getMessage.contains("NULL text for doc_id"), e1.getMessage)
    val nullTs = Seq(
      StreamDoc(3L, null, "hello world")).toDS()
    val e2 = intercept[Exception] {
      Streams.streamNearDupPairs(nullTs, maxHamming = 3).collect()
    }
    assert(e2.getMessage.contains("NULL ts for doc_id"), e2.getMessage)
    // maxBucket <= 0 would silently emit zero pairs forever; a
    // maxHamming past the 4-band pigeonhole would silently miss pairs
    val ok = Seq(StreamDoc(1L, new Timestamp(0L), "x")).toDS()
    assert(intercept[IllegalArgumentException] {
      Streams.streamNearDupPairs(ok, maxBucket = 0)
    }.getMessage.contains("maxBucket"))
    assert(intercept[IllegalArgumentException] {
      Streams.streamNearDupPairs(ok, maxHamming = 4)
    }.getMessage.contains("maxHamming"))
  }

  test("funnelProgress micros are floor-based: pre-epoch sub-second " +
      "events order correctly (truncating division flipped their sign)") {
    implicit val sqlCtx = spark.sqlContext
    // -0.5 s: getTime = -500 ms; truncating (t/1000)*1e6 + nanos/1000
    // gave +500000 µs — sorting AFTER a +0.25 s event. Events: view at
    // -0.5 s, click at +0.25 s must qualify as an ordered funnel.
    val preEpoch = new java.sql.Timestamp(-500L)   // 1969-12-31T23:59:59.5
    val postEpoch = new java.sql.Timestamp(250L)
    val mem = MemoryStream[FunnelEvent]
    val q = Streams.funnelProgress(mem.toDS(), Seq("view", "click"))
      .writeStream.format("memory").queryName("funnel_pre_epoch")
      .outputMode("append").start()
    try {
      mem.addData(FunnelEvent(1L, preEpoch, "view"),
        FunnelEvent(1L, postEpoch, "click"))
      q.processAllAvailable()
      val times = spark.table("funnel_pre_epoch")
        .as[(Long, Seq[Option[Long]])].collect()
        .maxBy(_._2.flatten.size)._2
      assert(times === Seq(Some(-500000L), Some(250000L)))
    } finally q.stop()
  }

  test("r16 guards: string batch column, bad interval literal, and " +
      "lateness-without-evictAfter all fail NAMED at construction") {
    // a string batch id would order lexicographically ("10" < "2") and
    // silently compute each batch's watermark over the wrong prefix
    val strBatch = Seq(("1", t("2026-01-01 10:00:00")),
      ("10", t("2026-01-01 11:00:00"))).toDF("b", "ts")
    val exB = intercept[IllegalArgumentException] {
      Streams.watermarkLateAccounting(strBatch, "b", "ts", 0L)
    }
    assert(exB.getMessage.contains("integral type"), exB.getMessage)
    // a malformed duration names the ARGUMENT, not a parse stack
    val l = Seq(Pur(1L, 1L, t("2026-01-01 10:00:00"))).toDF()
    val r = Seq(Clk(1L, 1L, t("2026-01-01 10:05:00"))).toDF()
    val exI = intercept[IllegalArgumentException] {
      Streams.intervalJoin(l, r, "user_id", "p_ts", "c_ts",
        before = "not a duration", after = "10 minutes")
    }
    assert(exI.getMessage.contains("before = 'not a duration'"),
      exI.getMessage)
    // ...and the quoted-name discipline: the join still works (batch)
    assert(Streams.intervalJoin(l, r, "user_id", "p_ts", "c_ts",
      before = "1 minute", after = "10 minutes").count() === 1L)
    // lateness without evictAfter installs NO watermark — loud, not
    // silently unbounded
    val docs = Seq(StreamDoc(1L, t("2026-01-01 10:00:00"), "a b c")).toDS()
    val exL = intercept[IllegalArgumentException] {
      Streams.streamNearDupPairs(docs, lateness = "2 hours")
    }
    assert(exL.getMessage.contains("no effect without evictAfter"),
      exL.getMessage)
    // sub-millisecond evictAfter truncates to zero — the message names
    // the real (millisecond-granularity) floor
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val exMs = intercept[IllegalArgumentException] {
      Streams.streamNearDupPairs(mem.toDS(),
        evictAfter = Some("500 microseconds"))
    }
    assert(exMs.getMessage.contains("at least 1 millisecond"),
      exMs.getMessage)
  }

  test("r17: intervalJoin accepts ANSI interval strings; a semantically-" +
      "zero lateness in any unit passes the no-evictAfter guard") {
    val l = Seq(Pur(1L, 1L, t("2026-01-01 10:00:00"))).toDF()
    val r = Seq(Clk(1L, 1L, t("2026-01-01 10:05:00"))).toDF()
    // the INTERVAL literal's own grammar includes the ANSI form — the
    // stringToInterval pre-check rejected it as "not a valid interval"
    // even though the join itself planned it fine (r16 advice)
    assert(Streams.intervalJoin(l, r, "user_id", "p_ts", "c_ts",
      before = "'0 00:01:00' DAY TO SECOND",
      after = "'0 00:10:00' DAY TO SECOND").count() === 1L)
    // ...and a malformed ANSI string still fails NAMED at construction
    val exA = intercept[IllegalArgumentException] {
      Streams.intervalJoin(l, r, "user_id", "p_ts", "c_ts",
        before = "'oops' DAY TO SECOND", after = "10 minutes")
    }
    assert(exA.getMessage.contains("before = "), exA.getMessage)
    // "0 minutes" IS zero: the guard compares parsed millis, not the
    // "0 seconds" default literal (r16 advice)
    val docs = Seq(StreamDoc(1L, t("2026-01-01 10:00:00"), "a b c")).toDS()
    assert(Streams.streamNearDupPairs(docs, lateness = "0 minutes")
      .collect().isEmpty)
  }

  test("r17: interval guards reject what merely PARSES — a non-literal " +
      "expression fails named at construction, and a malformed " +
      "lateness is attributed to its parameter") {
    val l = Seq(Pur(1L, 1L, t("2026-01-01 10:00:00"))).toDF()
    val r = Seq(Clk(1L, 1L, t("2026-01-01 10:05:00"))).toDF()
    // "1 minute + no_such_col" is a valid EXPRESSION, so a parse-only
    // pre-check admitted it and the failure resurfaced as an
    // UNRESOLVED_COLUMN analysis error pointing at generated SQL —
    // the exact late failure the eager guard exists to prevent
    val exE = intercept[IllegalArgumentException] {
      Streams.intervalJoin(l, r, "user_id", "p_ts", "c_ts",
        before = "1 minute + no_such_col", after = "10 minutes")
    }
    assert(exE.getMessage.contains("before = '1 minute + no_such_col'"),
      exE.getMessage)
    // a malformed lateness names ITS parameter, not svydesign-style
    // cross-attribution or Spark's bare parse stack
    val docs = Seq(StreamDoc(1L, t("2026-01-01 10:00:00"), "a b c")).toDS()
    val exL = intercept[IllegalArgumentException] {
      Streams.streamNearDupPairs(docs, lateness = "10 minuts")
    }
    assert(exL.getMessage.contains("lateness"), exL.getMessage)
  }
}
