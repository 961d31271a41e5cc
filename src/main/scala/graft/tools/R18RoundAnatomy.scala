package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-18 anatomy of ONE graph-loop round: replicates pageRankTopK's
  * per-round shape (broadcast pr ⋈ cached edges → dsum agg → rewrap →
  * count) and times plan vs broadcast vs execute separately, at the
  * graded sf shapes, AQE on/off via PROBE_AQE. Pure diagnostic.
  */
object R18RoundAnatomy {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("PROBE_WSCG", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.util.Tables.dsum
    spark.range(1000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()

    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val si = sc.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield c - s).getOrElse(-1L)
          val run = si.taskMetrics.executorRunTime
          val deser = si.taskMetrics.executorDeserializeTime
          if (wall >= 20) println(
            f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
              f"wall=${wall}%5d ms run=${run}%5d ms deser=${deser}%5d ms " +
              si.name.take(60))
        }
      })

    def load(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[anat] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    // PROBE_LC=true: truncate lineage with localCheckpoint instead of
    // persist — hypothesis: the ~1.5 MiB per-task binaries (serialized
    // plan lineage: parquet relations + hadoop conf + codegen) are the
    // per-round fixed cost
    val lc = sys.env.getOrElse("PROBE_LC", "false").toBoolean
    val e0 = load("orders").select(col("o_orderkey"),
        (col("o_custkey") * 2).as("src"))
      .join(load("lineitem").select(col("l_orderkey"),
        (col("l_suppkey") * 2 + 1).as("dst")),
        col("o_orderkey") === col("l_orderkey"))
      .select("src", "dst").distinct()
    val e = if (lc) e0.localCheckpoint()
      else e0.persist(StorageLevel.MEMORY_AND_DISK)
    val full = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val deg0 = full.groupBy("src")
      .agg(count(lit(1)).cast("double").as("__deg"))
    val deg = if (lc) deg0.localCheckpoint()
      else deg0.persist(StorageLevel.MEMORY_AND_DISK)
    val n = deg.count()
    val edgesDeg0 = full.join(deg, "src")
    val edgesDeg = if (lc) edgesDeg0.localCheckpoint()
      else edgesDeg0.persist(StorageLevel.MEMORY_AND_DISK)
    edgesDeg.count()
    println(s"[anat] n=$n")

    var pr = deg.select(col("src").as("id"),
      (lit(1.0) / lit(n.toDouble)).as("pr"))
    var prRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    val rounds = sys.env.getOrElse("PROBE_ROUNDS", "6").toInt
    for (i <- 1 to rounds) {
      val prSrc = pr.withColumnRenamed("id", "src")
      val next = t(s"r$i build step df") {
        edgesDeg.join(broadcast(prSrc), Seq("src"))
          .select(col("dst"), (col("pr") / col("__deg")).as("__share"))
          .groupBy("dst").agg(dsum(col("__share")).as("__s"))
          .select(col("dst").as("id"),
            (lit(0.15 / n) + lit(0.85) * col("__s")).as("pr"))
      }
      if (lc) {
        val wrapped = t(s"r$i localCheckpoint") { next.localCheckpoint() }
        t(s"r$i df.count (cached)") { wrapped.count() }
        pr = wrapped
      } else {
        val rdd = t(s"r$i plan (.rdd+persist)") {
          next.rdd.persist(StorageLevel.MEMORY_AND_DISK)
        }
        val wrapped = t(s"r$i createDataFrame") {
          spark.createDataFrame(rdd, next.schema)
        }
        t(s"r$i execute rdd.count") { rdd.count() }
        t(s"r$i df.count (cached)") { wrapped.count() }
        if (prRdd != null) prRdd.unpersist(blocking = false)
        prRdd = rdd
        pr = wrapped
      }
    }
    spark.stop()
  }
}
