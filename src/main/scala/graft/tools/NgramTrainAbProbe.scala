package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, NgramLm}

/** Single-session interleaved A/B for the r17 NgramLm.train rewrite
  * (one corpus pass deriving unigram counts from the bigram pair
  * counts, vs the old two independent tokenize+explode+shuffle
  * passes). The OLD shape is replicated INLINE here — the library only
  * ships the new one — so the two arms run against the same session,
  * cache state, and host load, alternating old/new. Model equality is
  * asserted exactly: same (tok, c1) set, same (prev, tok, c2) set,
  * same N and V — the t13/t24/t25 hash oracles cannot move.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.tools.NgramTrainAbProbe"
  */
object NgramTrainAbProbe {
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
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    spark.range(1000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()

    def loadAvg(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("lang") === "en")

    // the pre-r17 train(), verbatim: two independent corpus passes
    def oldTrain(): (DataFrame, DataFrame, Long, Long) = {
      val toks = corpus
        .select(explode(Dedup.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
      val unigrams = toks.groupBy("tok").agg(count(lit(1)).as("c1"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bigrams = corpus
        .select(explode(Dedup.tokenLagPairs(col("text"))).as("bg"))
        .select(col("bg._1").as("prev"), col("bg._2").as("tok"))
        .filter(col("prev").isNotNull)
        .groupBy("prev", "tok").agg(count(lit(1)).as("c2"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val row = unigrams
        .agg(coalesce(sum("c1"), lit(0L)).as("n"), count(lit(1)).as("v"))
        .collect().head
      bigrams.count()
      (unigrams, bigrams, row.getLong(0), row.getLong(1))
    }

    val offS = scala.collection.mutable.ArrayBuffer[Double]()
    val onS = scala.collection.mutable.ArrayBuffer[Double]()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val (uO, bO, nO, vO) = oldTrain()
      val sOld = (System.nanoTime() - t0) / 1e9
      println(f"[ngram-ab] pair$i old-two-pass $sOld%6.2f s " +
        f"(load=${loadAvg()}%.1f)")
      val t1 = System.nanoTime()
      val m = NgramLm.train(corpus, "text")
      val sNew = (System.nanoTime() - t1) / 1e9
      println(f"[ngram-ab] pair$i new-one-pass $sNew%6.2f s " +
        f"(load=${loadAvg()}%.1f)")
      offS += sOld; onS += sNew
      // exact model equality (set semantics; both sides are count
      // tables so exceptAll both ways pins multiplicity too)
      assert(nO == m.nTokens && vO == m.vocabSize,
        s"scalars differ: old ($nO, $vO) vs new (${m.nTokens}, ${m.vocabSize})")
      assert(uO.exceptAll(m.unigrams).isEmpty &&
             m.unigrams.exceptAll(uO).isEmpty, "unigram tables differ")
      assert(bO.exceptAll(m.bigrams).isEmpty &&
             m.bigrams.exceptAll(bO).isEmpty, "bigram tables differ")
      uO.unpersist(blocking = false); bO.unpersist(blocking = false)
      m.unpersist()
    }
    println(f"[ngram-ab] OLD min=${offS.min}%.2f median=${offS.sorted.apply(1)}%.2f" +
      f" | NEW min=${onS.min}%.2f median=${onS.sorted.apply(1)}%.2f" +
      f" | min ratio ${onS.min / offS.min}%.2f")
    spark.stop()
  }
}
