package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 SemDeDup cell-occupancy audit (r17 verdict item 5): the
  * e10/e31 same-cell pair join is quadratic WITHIN cells, so a skew-hot
  * cell would put n_c² pair rows on one task. This prints the per-cell
  * histogram, Σ n_c² (the pair-join volume) and the max/median ratio at
  * the graded shape (portable k-means, 8 cells) so the salt-or-not
  * decision is measured, not assumed. Pure diagnostic.
  */
object R18CellSkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val out = graft.queries.DedupQueries.semanticDedupAssign(emb)
    val cellCounts = out.groupBy("cell").count()
      .orderBy("cell").collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    graft.util.QueryLeases.releaseAll()
    val ns = cellCounts.map(_._2).sorted
    val pairVolume = ns.map(n => n * n).sum
    println(s"[cellskew] sf=$sfDir cells=${ns.length}")
    cellCounts.foreach { case (c, n) => println(f"[cellskew]   cell $c%2d: $n%6d") }
    println(f"[cellskew] total=${ns.sum} max=${ns.max} " +
      f"median=${ns(ns.length / 2)} max/median=${ns.max.toDouble / ns(ns.length / 2)}%.2f " +
      f"sum_nc2=$pairVolume")
    spark.stop()
  }
}
