package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Single-session A/B isolating the r13 t23/t28 bench ambiguity
  * (BENCH_r13.json: t23_unigram_segment 4.54 s / t28_fertility 4.55 s
  * — 2.5–2.6× the 1.74/1.80 s committed-close run and r12's numbers —
  * while every neighboring t-query got FASTER and the a01 cheap-scan
  * sentinel stayed flat).
  *
  * The two queries share ONE path: TextQueries.unigramPerdoc =
  * Tokenize.unigramVocab (capped distributed word-count collect +
  * driver-side substring loop over ≤50k words + distinct-char collect)
  * followed by a broadcast-vocab Viterbi projection. The doubled cost
  * on BOTH queries with flat neighbors is the signature of driver
  * contention during the vocab build (the load-average markers show
  * bursts to 7.1 in that run) — but the a24 lesson from r11 stands:
  * ambiguity is resolved by a same-session A/B, not a shrug.
  *
  * The probe, in ONE session at the given SF dir:
  *   - N interleaved rounds of control (t24 CCNet buckets, t27 char
  *     entropy — same corpus scan class, no vocab build) vs suspect
  *     (t23, t28), load printed per timing;
  *   - a component split: unigramVocab alone (the driver-heavy half)
  *     vs the full t23 query, so a real regression localizes to the
  *     vocab build or the segment projection in the same artifact.
  * Verdict rule: suspects ≈ their 1.8 s committed-close values at
  * matched load → the 4.5 s rows were host contention (record in
  * SCALE.md, rows back to `done`); suspects ≈ 4.5 s with flat controls
  * → real regression, profile the component split and bisect.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.tools.TextAbProbe"
  */
object TextAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    spark.read.parquet(s"$sfDir/documents.parquet").limit(1).write
      .format("noop").mode("overwrite").save()

    def load(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    def time(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[text-ab] $label%-24s $s%6.2f s  (load=${load()}%.1f)")
      s
    }
    def timeQ(label: String, name: String): Double = time(label) {
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }

    println(f"[text-ab] start load=${load()}%.1f sf=$sfDir rounds=$rounds")
    val acc = scala.collection.mutable.Map[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    def rec(n: String, s: Double): Unit =
      acc.getOrElseUpdate(n, scala.collection.mutable.ArrayBuffer()) += s
    for (r <- 1 to rounds) {
      rec("t24", timeQ(s"r$r control t24", "t24_ccnet_buckets"))
      rec("t23", timeQ(s"r$r suspect t23", "t23_unigram_segment"))
      rec("t27", timeQ(s"r$r control t27", "t27_char_entropy"))
      rec("t28", timeQ(s"r$r suspect t28", "t28_fertility"))
    }
    // component split: the driver-heavy vocab build alone vs full t23
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (r <- 1 to 2) {
      time(s"c$r unigramVocab only") {
        graft.operators.Tokenize.unigramVocab(docs, "text",
          topWords = 50000, topPieces = 400, maxLen = 4)
      }
    }
    println("[text-ab] ---- summary (min / median over rounds) ----")
    acc.toSeq.sortBy(_._1).foreach { case (n, ts) =>
      val sorted = ts.sorted
      println(f"[text-ab] $n  min=${sorted.head}%5.2f  " +
        f"med=${sorted(sorted.size / 2)}%5.2f  n=${ts.size}")
    }
    println(f"[text-ab] end load=${load()}%.1f")
    spark.stop()
  }
}
