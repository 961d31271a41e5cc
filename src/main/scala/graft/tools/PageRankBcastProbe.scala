package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Graphs

/** Single-session interleaved A/B for the graph kernels'
  * broadcast-node-frame lever (Graphs.bcastIfSmall): each round's
  * node-sized frame (ranks, labels, distances, scores, survivors) is a
  * rewrapped LogicalRDD with NO stats, so Spark plans the per-round
  * join against the cached edge list as an edge-sized exchange+sort
  * every round unless the driver — which knows the frame's exact row
  * count — hands it the broadcast hint. Solo bench runs could not
  * adjudicate this (host load 3–11 across attempts moved a24
  * 9.0→15.6 s with NO code change), so this probe interleaves the two
  * arms in ONE session, alternating off/on so host drift hits both
  * equally.
  *
  * Legs 1–5: a24/a36/a37/a40/a26-shaped runs on the sf transaction
  * graph (orders⋈lineitem distinct — the GraphQueries.transactionEdges
  * build). Leg 6: planted hubs at probe scale, where the rank frame is
  * ~1M nodes — the boundary case the auto gate deliberately does NOT
  * broadcast. Each leg: 3 alternating pairs, result rows asserted
  * IDENTICAL between arms (exact integer/decimal kernels, so the join
  * strategy cannot move a value).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.tools.PageRankBcastProbe [rawEdges]"
  */
object PageRankBcastProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nEdges = args.headOption.map(_.toLong).getOrElse(5000000L)
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

    def loadAvg(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    // comma-separated leg-name substrings to run (default: all) — the
    // re-adjudication lever, so one noisy leg can re-run quiet without
    // paying the full battery
    val legs = sys.env.get("SPARK_GRAFT_BCAST_LEGS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)

    def ab(leg: String,
           run: Option[Boolean] => Seq[org.apache.spark.sql.Row]): Unit = {
      if (legs.exists(!_.exists(leg.contains(_)))) return
      val off = scala.collection.mutable.ArrayBuffer[Double]()
      val on = scala.collection.mutable.ArrayBuffer[Double]()
      var rowsOff: Seq[org.apache.spark.sql.Row] = null
      var rowsOn: Seq[org.apache.spark.sql.Row] = null
      for (i <- 1 to 3) {
        for (bcast <- Seq(false, true)) {
          val t0 = System.nanoTime()
          val rows = run(Some(bcast))
          val s = (System.nanoTime() - t0) / 1e9
          println(f"[graph-bcast] $leg%-18s pair$i bcast=$bcast%-5s " +
            f"$s%6.2f s (load=${loadAvg()}%.1f)")
          if (bcast) { on += s; rowsOn = rows }
          else { off += s; rowsOff = rows }
        }
      }
      assert(rowsOff == rowsOn,
        s"$leg: result rows differ between join strategies")
      println(f"[graph-bcast] $leg%-18s OFF min=${off.min}%.2f " +
        f"median=${off.sorted.apply(1)}%.2f | ON min=${on.min}%.2f " +
        f"median=${on.sorted.apply(1)}%.2f | min ratio " +
        f"${on.min / off.min}%.2f")
    }

    // the a24-family edge build at the graded SF (the
    // GraphQueries.transactionEdges shape, encoded ids)
    val edges = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), (col("o_custkey") * 2).as("src"))
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(col("l_orderkey"), (col("l_suppkey") * 2 + 1).as("dst")),
        col("o_orderkey") === col("l_orderkey"))
      .select("src", "dst").distinct()
    val rawKeyEdges = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey").as("src"))
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_suppkey").as("dst")),
        col("o_orderkey") === col("l_orderkey"))
      .select("src", "dst").distinct()

    val tag = sfDir.split('/').last
    ab(s"a24_pr@$tag", b =>
      Graphs.pageRankTopK(edges, iters = 5, k = 25,
        symmetrizeInput = true, broadcastRanks = b).collect().toSeq)
    ab(s"a36_lpa@$tag", b =>
      Graphs.labelPropCensus(edges, iters = 3, k = 25,
        symmetrizeInput = true, broadcastLabels = b).collect().toSeq)
    ab(s"a37_mod@$tag", b =>
      Graphs.modularityCensus(edges, iters = 3, k = 25,
        symmetrizeInput = true, broadcastLabels = b).collect().toSeq)
    ab(s"a40_cc@$tag", b =>
      Graphs.ccCensus(edges, rounds = 3, k = 25,
        symmetrizeInput = true, broadcastLabels = b).collect().toSeq)
    ab(s"a26_hits@$tag", b =>
      Graphs.hitsTopK(rawKeyEdges, iters = 2, k = 10,
        broadcastScores = b).collect().toSeq)
    ab(s"a29_bfs@$tag", b =>
      Graphs.bfsCensus(edges,
        seedPred = col("id") % 2 === 0 && col("id") < 6,
        maxHops = 3, symmetrizeInput = true,
        broadcastFrontier = b).collect().toSeq)
    ab(s"a38_kcore@$tag", b =>
      Graphs.kcoreCensus(edges, k = 3, rounds = 4,
        symmetrizeInput = true, broadcastSurvivors = b).collect().toSeq)

    // planted hubs at probe scale: ~1M nodes — the rank frame the
    // auto gate deliberately does NOT broadcast (boundary case).
    // Guarded so a filtered re-adjudication skips the edge build too.
    // node count overridable as arg 2: nEdges/5 reproduces the
    // GraphScaleProbe leg-2 shape (~1M nodes at 5M edges — gate
    // CLOSED); an explicit small node count (e.g. 100000 at 50M
    // edges) probes the dense regime where the gate OPENS at scale
    val nNodes = args.lift(1).map(_.toLong).getOrElse(nEdges / 5)
    if (legs.forall(_.exists(s => s"hubs@${nEdges}x$nNodes".contains(s)))) {
    val raw = spark.range(nEdges).select(
      (pmod(hash(col("id")), lit(nNodes)) + lit(100L)).as("src"),
      when(col("id") % 5 === 0,
        pmod(hash(col("id") * 7 + 1), lit(20L)))
        .otherwise(pmod(hash(col("id") * 13 + 3), lit(nNodes)) + lit(100L))
        .as("dst"))
      .filter(col("src") =!= col("dst"))
    val sym = Graphs.symmetrize(raw.distinct())
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[graph-bcast] synthetic symmetrized edges: ${sym.count()}" +
      s" nodes<=$nNodes")
    ab(s"hubs@${nEdges}x$nNodes", b =>
      Graphs.pageRankTopK(sym, iters = 5, k = 20, completeInbound = true,
        broadcastRanks = b).collect().toSeq)
    sym.unpersist(blocking = false)
    }
    spark.stop()
  }
}
