package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-session A/B isolating the a24 PageRank bench delta
  * (BENCH_r11 14.45 s min-of-2 vs round-10's 8.0 s quiet-host solo
  * record at sf0.1).
  *
  * Hypothesis (same class as the e03 artifact AnnAbProbe closed):
  * a24's slot inside a 203-query bench pass runs against a JVM whose
  * heap carries the history of every preceding query — old-gen
  * occupancy, promoted shuffle buffers, JIT state — so its 12
  * distributed jobs (5 materialized rank rounds + edge/deg caches +
  * top-k) pay GC tax a solo run never sees. The operator itself was
  * not touched in round 11 (Graphs.scala diff = probe additions only).
  *
  * The probe times, in ONE session at the given SF dir:
  *   A. a24 solo, twice (memo-free — a24 shares no memo), right after
  *      session warmup: the operator's honest cold/warm cost;
  *   B. the full bench prefix that precedes a24 alphabetically
  *      (a01–a23), once, exactly as Bench runs it (noop sink);
  *   C. a24 again, twice, on the now-aged heap: the in-run conditions.
  * Load average is printed around every leg so host drift is visible
  * in the artifact. Verdict rule: C_min ≈ A_min → the bench number is
  * in-run heap/GC context, not a regression; C_min ≈ A_min but both
  * ≫ 8 s → host drift (compare load to r10's quiet-host session);
  * A_min ≫ 8 s at matched load → real regression, bisect.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.tools.GraphAbProbe"
  */
object GraphAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).write
      .format("noop").mode("overwrite").save()

    def load(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    def time(label: String, name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[graph-ab] $label%-24s $s%6.2f s  (load=${load()}%.1f)")
      s
    }

    println(f"[graph-ab] start load=${load()}%.1f sf=$sfDir")
    // A: solo on a young heap
    val a1 = time("solo_run1", "a24_pagerank")
    val a2 = time("solo_run2", "a24_pagerank")

    // B: the alphabetical bench prefix (a01..a23), one pass, noop sink
    val prefix = graft.SparkEntry.queries.keys.toSeq.sorted
      .takeWhile(_ != "a24_pagerank")
    val tB0 = System.nanoTime()
    prefix.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    println(f"[graph-ab] prefix a01..a23 (${prefix.size} q)  " +
      f"${(System.nanoTime() - tB0) / 1e9}%6.2f s  (load=${load()}%.1f)")

    // C: in-run conditions — aged heap, same session
    val c1 = time("aged_run1", "a24_pagerank")
    val c2 = time("aged_run2", "a24_pagerank")

    println(f"[graph-ab] summary solo_min=${math.min(a1, a2)}%.2f " +
      f"aged_min=${math.min(c1, c2)}%.2f " +
      f"(solo $a1%.2f/$a2%.2f aged $c1%.2f/$c2%.2f) load=${load()}%.1f")
    spark.stop()
  }
}
