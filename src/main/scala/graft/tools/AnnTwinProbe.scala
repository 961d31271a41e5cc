package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the per-query `twin_overlap` agreement of the five
  * production ANN catalog queries (e03/e04/e07–e09, xxhash-seeded —
  * legitimately un-replayable in DuckDB) against their HASH-GRADED
  * portable twins (e20/e21/e22) at every graded SF. The minimum
  * observed per-SF overlap is the floor AnnSuite asserts — a silent
  * production-path break (seed drift, bucketing bug) moves the
  * in-row metric below that floor and fails the suite instead of
  * passing rows-only (r13-verdict task 4).
  *
  * Run: sbt "runMain graft.tools.AnnTwinProbe"
  */
object AnnTwinProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("e03_ann_lsh_topk", "e04_ann_ivf_topk",
      "e07_ann_pq_topk", "e08_ann_ivfpq_topk", "e09_ann_ivfpq_residual")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); n <- names) {
      graft.queries.AnnQueries.clearExactMemo()
      val df = graft.queries.Catalog.queries(n)(spark, s"/root/testdata/$sf")
      val r = df.groupBy("qid").agg(max("twin_overlap").as("o"))
        .agg(min("o"), avg("o"), count(lit(1))).head()
      println(f"[twin] $sf $n%-24s twin=${df.head().getAs[String]("twin")} " +
        f"min=${r.getDouble(0)}%.2f avg=${r.getDouble(1)}%.3f nq=${r.getLong(2)}")
    }
    spark.stop()
  }
}
