package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every catalog query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * Each query is forced through the `noop` sink so the FULL plan
  * (projections included) executes — `.count()` would let Catalyst prune
  * the very columns being benchmarked. */
object Bench {
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
    // warm up executor threads + parquet footers so the first measured
    // query doesn't carry session-startup cost
    spark.range(1000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).write
      .format("noop").mode("overwrite").save()
    // Optional comma-separated filter for profiling single queries
    // locally (SPARK_GRAFT_ONLY=j04_json_props,r02_pivot_longer);
    // unset = full catalog, which is what the driver runs.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_(n)) }
    // A query that throws records -1 (not its elapsed-until-failure time)
    // so a crash can't read as a fast success in the machine-consumed JSON.
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val sec =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
