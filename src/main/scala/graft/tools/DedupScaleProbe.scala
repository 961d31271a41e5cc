package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Planted-truth scale leg for incremental ingestion dedup (d08's
  * operator): a 2M-doc corpus and a 20k-doc incoming batch where every
  * batch doc with id ≡ 1 (mod 10) is an EXACT copy of a corpus doc and
  * the rest are fresh (TextScaleProbe's hash-token construction: with a
  * 50k vocabulary, a spurious shared 3-shingle between unrelated docs
  * is ~(1/50k)³-improbable per pair — zero at any feasible scale). The
  * claims under test:
  *
  *  - every planted copy is flagged against its exact source
  *    (recall 1.0 at Jaccard threshold 0.9 — copies score 1.0);
  *  - no fresh doc is flagged (precision 1.0 on this gap);
  *  - wall time is candidate-bound, not |corpus × batch|-bound: the
  *    batch's band keys join the corpus's band keys, so the corpus is
  *    scanned twice (bands + shingle fetch) and never paired densely.
  *
  * Run: sbt "runMain graft.tools.DedupScaleProbe [nCorpus] [nBatch]"
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val nCorpus = if (args.length > 0) args(0).toLong else 2000000L
    val nBatch = if (args.length > 1) args(1).toLong else 20000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tokensPerDoc = 60
    def text(base: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(0), lit(tokensPerDoc - 1)),
        j => concat(lit("w"), pmod(xxhash64(base, j), lit(50000L)))))

    val corpus = spark.range(nCorpus)
      .select(col("id").as("doc_id"), text(col("id")).as("text"))
    // batch ids live above the corpus range; ids ≡ 1 (mod 10) copy the
    // corpus doc with id = (id - nCorpus), the rest draw fresh tokens
    val batch = spark.range(nCorpus, nCorpus + nBatch)
      .select(col("id").as("doc_id"),
        text(when(col("id") % 10 === 1, col("id") - nCorpus)
          .otherwise(col("id"))).as("text"))

    val t0 = System.nanoTime()
    val out = Dedup.incrementalNearDup(batch, corpus, "doc_id", "text",
        threshold = 0.9)
      .select(col("new_id"), col("dup_of"), col("best_jaccard"))
    val got = out.agg(count(lit(1)).as("n"),
      count(when(col("new_id") % 10 =!= 1, 1)).as("false_flags"),
      count(when(col("new_id") % 10 === 1 &&
        col("dup_of") === col("new_id") - nCorpus &&
        col("best_jaccard") === 1.0, 1)).as("exact_hits")).head()
    val t = (System.nanoTime() - t0) / 1e9

    val planted = (nCorpus until nCorpus + nBatch).count(_ % 10 == 1)
    require(got.getLong(1) == 0L, s"${got.getLong(1)} fresh docs flagged")
    require(got.getLong(0) == planted,
      s"flagged ${got.getLong(0)} != $planted planted copies")
    require(got.getLong(2) == planted,
      "a planted copy missed its exact source at jaccard 1.0")
    println(f"incrementalNearDup (cold): corpus=$nCorpus%,d " +
      f"batch=$nBatch%,d -> $planted%,d/$planted%,d planted copies " +
      f"flagged against their exact source, 0 false flags, in $t%.1fs")

    // ---- amortized path: corpus bands + shingles stored at ingest ----
    val tIngest0 = System.nanoTime()
    val storedBands = Dedup.lshBands(corpus, "doc_id", "text").persist()
    val storedShingles = corpus.select(col("doc_id"),
      Dedup.wordShingles(col("text"), 3).as("sh")).persist()
    storedBands.count(); storedShingles.count()
    val tIngest = (System.nanoTime() - tIngest0) / 1e9
    val t1 = System.nanoTime()
    val got2 = Dedup.incrementalNearDup(batch, corpus, "doc_id", "text",
        threshold = 0.9,
        corpusBands = Some(storedBands),
        corpusShingles = Some(storedShingles))
      .agg(count(lit(1)).as("n")).head()
    val tWarm = (System.nanoTime() - t1) / 1e9
    require(got2.getLong(0) == planted, "stored-column path disagrees")
    println(f"incrementalNearDup (stored corpus columns): ingest " +
      f"$tIngest%.1fs once, then each batch $tWarm%.1fs — the " +
      f"per-batch cost is batch-side + candidate-bound")
    storedBands.unpersist(); storedShingles.unpersist()
    spark.stop()
  }
}
