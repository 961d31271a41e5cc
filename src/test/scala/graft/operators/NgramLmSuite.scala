package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NgramLmSuite extends SparkSpec {
  import spark.implicits._

  // train counts: unigrams a=3 b=2 c=1 (N=6, V=3); bigrams (a,b)=2 (a,c)=1
  private def trainCorpus =
    Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")

  test("scoreDocs matches the closed-form Stupid-Backoff arithmetic") {
    val model = NgramLm.train(trainCorpus, "text")
    assert(model.nTokens === 6L && model.vocabSize === 3L)
    val got = NgramLm.scoreDocs(model,
        Seq((10L, "a b c")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    // a: first token, base = ln((3+1)/(6+3+1)); b|a: ln(2/3);
    // c|b: unseen bigram -> ln(0.4) + ln((1+1)/10)
    val want = (math.log(4.0 / 10) + math.log(2.0 / 3) +
      (math.log(0.4) + math.log(2.0 / 10))) / 3
    assert(got.getAs[Long]("n_toks") === 3L)
    assert(math.abs(got.getAs[Double]("avg_logp") - want) < 1e-12)
  }

  test("empty and whitespace-only docs are token-less: no score row, " +
      "no '' unigram in the trained vocab (split('', ' ') is [''])") {
    val withEmpty = trainCorpus.unionByName(
      Seq((4L, ""), (5L, "  ")).toDF("doc_id", "text"))
    val model = NgramLm.train(withEmpty, "text")
    // same counts as the clean corpus: '' must not enter vocab or N
    assert(model.nTokens === 6L && model.vocabSize === 3L)
    val scored = NgramLm.scoreDocs(model,
        Seq((10L, "a b"), (11L, ""), (12L, "   ")).toDF("doc_id", "text"),
        "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(scored === Set(10L),
      "token-less docs must emit no row (the documented contract)")
  }

  test("OOV text scores through the backoff path, never throws") {
    val model = NgramLm.train(trainCorpus, "text")
    val got = NgramLm.scoreDocs(model,
        Seq((20L, "z z")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    // first z: ln((0+1)/10); second: unseen bigram, OOV unigram ->
    // ln(0.4) + ln(1/10)
    val want = (math.log(0.1) + (math.log(0.4) + math.log(0.1))) / 2
    assert(math.abs(got.getAs[Double]("avg_logp") - want) < 1e-12)
    // and an in-domain doc outranks the OOV one
    val inDomain = NgramLm.scoreDocs(model,
        Seq((21L, "a b")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head.getAs[Double]("avg_logp")
    assert(inDomain > got.getAs[Double]("avg_logp"))
  }

  test("minCount prunes bigrams into the backoff path") {
    val pruned = NgramLm.train(trainCorpus, "text", minCount = 2L)
    assert(pruned.bigrams.collect().map(r =>
      (r.getString(0), r.getString(1))).toSet === Set(("a", "b")))
    val got = NgramLm.scoreDocs(pruned,
        Seq((30L, "a c")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    // c|a now backs off even though (a,c) occurred once in training
    val want = (math.log(4.0 / 10) + (math.log(0.4) + math.log(2.0 / 10))) / 2
    assert(math.abs(got.getAs[Double]("avg_logp") - want) < 1e-12)
  }

  test("reference-corpus scoring tilts toward the reference on the " +
      "graded fixture") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val model = NgramLm.train(docs.filter(col("lang") === "en"), "text")
    val scored = NgramLm.scoreDocs(model, docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val byLang = scored.groupBy(col("lang") === "en")
      .agg(avg("avg_logp").as("m")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false),
      s"en mean ${byLang(true)} must beat non-en ${byLang(false)}")
    // every document scored exactly once
    assert(scored.count() === docs.count())
  }

  test("quantized scores are stable under repartitioning (the t13 " +
      "oracle contract)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def q(parts: Int): Map[Long, Long] = {
      val d = docs.repartition(parts)
      val m = NgramLm.train(d.filter(col("lang") === "en"), "text")
      NgramLm.scoreDocs(m, d, "doc_id", "text")
        .select(col("doc_id"),
          floor(col("avg_logp") * lit(1048576.0) + lit(0.5))
            .cast("long").as("qlp"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(q(1) === q(7))
  }

  test("t24 terciles: exact rank-based sizes, head outranks tail per lang") {
    val out = graft.queries.Catalog.queries("t24_ccnet_buckets")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getString(3)))
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val n = rows.length
      val by = rows.groupBy(_._3).view.mapValues(_.length).toMap
      // 3·rk ≤ n ⇔ rk ≤ floor(n/3); middle gets floor(2n/3) − floor(n/3)
      assert(by.getOrElse("head", 0) === n / 3, s"$lang head size")
      assert(by.getOrElse("middle", 0) === 2 * n / 3 - n / 3,
        s"$lang middle size")
      // bucket boundaries respect the score order (ties split by id,
      // so compare strictly across non-equal scores)
      val minHead = rows.filter(_._3 == "head").map(_._2).min
      val maxTail = rows.filter(_._3 == "tail").map(_._2).max
      assert(minHead >= maxTail, s"$lang head/tail score inversion")
    }
  }

  test("train() persists the count tables so scoring runs don't re-run " +
    "the training aggregations (r15 review)") {
    import spark.implicits._
    val corpus = Seq((1L, "the cat sat"), (2L, "the dog ran"))
      .toDF("doc_id", "text")
    val m = NgramLm.train(corpus, "text")
    assert(m.unigrams.storageLevel.useMemory || m.unigrams.storageLevel.useDisk,
      "unigram table must be persisted")
    assert(m.bigrams.storageLevel.useMemory || m.bigrams.storageLevel.useDisk,
      "bigram table must be persisted")
    m.unigrams.unpersist(); m.bigrams.unpersist()
  }
}
