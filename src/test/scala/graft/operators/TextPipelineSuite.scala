package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextPipelineSuite extends SparkSpec {
  import spark.implicits._

  test("topTermsByRarity ranks rarest-then-frequent, k rows per doc") {
    // "common" is in every doc (df=3); "rare" only in doc 1 (df=1);
    // "pair" in docs 1 and 2 (df=2)
    val docs = Seq(
      (1L, "common rare pair common"),
      (2L, "common pair"),
      (3L, "common common")).toDF("doc_id", "text")
    val top = TextPipeline.topTermsByRarity(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val d1 = top.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3).toSeq == Seq("rare", "pair"),
      s"doc 1 ranking was ${d1.toSeq}")
    assert(d1.head._4 == 1L && d1.head._5 == 1L) // rare: tf=1, df=1
    // every doc emits at most k rows, ranks are 1..k contiguous
    top.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= 2)
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length).toSeq)
    }
    // tf is counted, not deduplicated: common appears twice in doc 3
    val d3common = top.filter(t => t._1 == 3L && t._3 == "common").head
    assert(d3common._4 == 2L && d3common._5 == 3L)
  }

  test("qualityRules evaluates every rule family on hand-checked docs") {
    val docs = Seq(
      // 6 tokens, all distinct, stopword 'the', mean len 25/6 ≈ 4.17
      (1L, "the quick brown fox jumps high"),
      // repetition: 'spam' is 5 of 6 tokens → top_frac .833, distinct 1/3
      (2L, "spam spam spam spam spam ham"),
      // too short (2 tokens), no stopwords
      (3L, "hello world"),
      // long words: mean token length 8.0
      (4L, "absolute absolute absolute")).toDF("doc_id", "text")
    val out = TextPipeline.qualityRules(docs, "doc_id", "text",
        minTokens = 3L, maxTokens = 10L,
        minMeanTokLen = 3.0, maxMeanTokLen = 6.0,
        maxTopTokenFrac = 0.5, minDistinctRatio = 0.5,
        minStopwordRatio = 0.1)
      .collect().map(r => r.getLong(0) -> r).toMap
    def flags(id: Long): (Long, Int, Int, Int, Int, Int, Int) = {
      val r = out(id)
      (r.getLong(1), r.getInt(6), r.getInt(7), r.getInt(8), r.getInt(9),
        r.getInt(10), r.getInt(11))
    }
    // doc 1 passes everything: 6 toks, mean 25/6, top 1/6, distinct 1.0,
    // stop 1/6 ≥ .1
    assert(flags(1L) == ((6L, 1, 1, 1, 1, 1, 1)))
    assert(out(1L).getDouble(2) == 25.0 / 6.0)
    // doc 2 fails repetition both ways and has no stopwords
    assert(flags(2L) == ((6L, 1, 1, 0, 0, 0, 0)))
    assert(out(2L).getDouble(3) == 5.0 / 6.0)
    // doc 3 fails the length floor (2 < 3) and stopwords; top_frac is
    // exactly 0.5 (boundary pass), mean len 10/2 = 5.0
    assert(flags(3L) == ((2L, 0, 1, 1, 1, 0, 0)))
    // doc 4 fails mean-token-length ceiling (8 > 6), top frac 1.0,
    // distinct 1/3
    assert(flags(4L) == ((3L, 1, 0, 0, 0, 0, 0)))
    assert(out(4L).getDouble(2) == 8.0)
  }

  test("quantileThresholdFilter: exact mode keeps the upper quartile; " +
      "approx mode honors the n/accuracy rank bound") {
    // deterministic scores: 500 docs' quality over the real fixture
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        graft.operators.TextFunctions.qualityScore(col("text")).as("q"))
    val scores = docs.select("q").as[Double].collect().sorted
    val n = scores.length
    // exact: the kept set IS {q >= interpolated p25} — cross-check the
    // threshold semantics against a driver-side quantile_cont
    val p = 0.25
    val h = (n - 1) * p
    val exactThr = scores(h.toInt) +
      (h - h.toInt) * (scores(h.toInt + 1) - scores(h.toInt))
    val keptExact = TextPipeline.quantileThresholdFilter(docs, "q", p)
      .select("doc_id").as[Long].collect().toSet
    val wantExact = docs.filter(col("q") >= exactThr)
      .select("doc_id").as[Long].collect().toSet
    assert(keptExact === wantExact)
    assert(keptExact.nonEmpty && keptExact.size < n)
    // approx: Spark's approx_percentile (QuantileSummaries with
    // relativeError = 1/accuracy) guarantees a returned MEMBER value
    // whose rank r satisfies ⌊(p−ε)n⌋ ≤ r ≤ ⌈(p+ε)n⌉ — i.e. within
    // εn = n/accuracy of p·n plus the floor/ceil slack, and the exact
    // threshold is additionally INTERPOLATED between two members, which
    // can shift boundary membership by one more row. Pin the honest
    // bound n/accuracy + 2 (measured 6 at accuracy=100, n=500).
    val accuracy = 100
    val keptApprox = TextPipeline.quantileThresholdFilter(docs, "q", p,
        exact = false, accuracy = accuracy)
      .select("doc_id").as[Long].collect().toSet
    val bound = n / accuracy + 2
    val diff = (keptExact diff keptApprox).size +
      (keptApprox diff keptExact).size
    assert(diff <= bound,
      s"approx kept set differs from exact by $diff rows (bound $bound)")
    // a tight sketch (accuracy ≥ n) nails the rank but still returns a
    // MEMBER value where the exact mode interpolates between two
    // members (p·(n−1) = 124.75 here), so exactly the one boundary row
    // may differ — never more
    val keptTight = TextPipeline.quantileThresholdFilter(docs, "q", p,
        exact = false, accuracy = 10000)
      .select("doc_id").as[Long].collect().toSet
    val tightDiff = (keptTight diff keptExact).size +
      (keptExact diff keptTight).size
    assert(tightDiff <= 1,
      s"tight sketch differs from exact by $tightDiff rows")
  }

  test("decontaminate flags shared 5-grams, leaves disjoint docs clean") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val cands = Seq(
      // contains the benchmark 5-gram "alpha beta gamma delta epsilon"
      (1L, "xx alpha beta gamma delta epsilon yy"),
      // same vocabulary, different order — no shared 5-gram
      (2L, "epsilon delta gamma beta alpha zeta xx"),
      // shorter than 5 tokens: whole text is the single shingle
      (3L, "tiny doc")).toDF("doc_id", "text")
    val prof = TextPipeline.decontaminate(cands, bench, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(prof(1L)._3 == 1 && prof(1L)._2 >= 1L, s"doc 1: ${prof(1L)}")
    assert(prof(2L) == ((3L, 0L, 0)), s"doc 2: ${prof(2L)}")
    assert(prof(3L) == ((1L, 0L, 0)), s"doc 3: ${prof(3L)}")
  }

  test("decontaminate keeps NULL-text candidates: 0 shingles, clean") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val cands = Seq((1L, "xx alpha beta gamma delta epsilon yy"),
        (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val prof = TextPipeline.decontaminate(cands, bench, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(prof.keySet == Set(1L, 2L), "every candidate must profile")
    assert(prof(2L) == ((0L, 0L, 0)), s"null doc: ${prof(2L)}")
    assert(prof(1L)._3 == 1)
  }

  test("packSequences matches the greedy-contiguous local fold") {
    val docs = (1L to 40L).map { i =>
      val words = Seq.fill(((i * 7) % 13 + 1).toInt)("w").mkString(" ")
      (i, if (i % 2 == 0) "g0" else "g1", words)
    }.toDF("doc_id", "grp", "text")
    val got = TextPipeline.packSequences(docs, Seq("grp"), "doc_id", "text",
        budget = 20)
      .select("grp", "doc_id", "n_tok", "bin_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    got.groupBy(_._1).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, id, nTok, bin) =>
        assert(bin == cum / 20, s"doc $id: bin $bin, cum-before $cum")
        cum += nTok
      }
    }
    // a doc longer than the budget still lands in a bin of its own
    val big = Seq((1L, "g", Seq.fill(50)("w").mkString(" ")))
      .toDF("doc_id", "grp", "text")
    val bigRow = TextPipeline.packSequences(big, Seq("grp"), "doc_id",
      "text", 20).select("bin_id").head()
    assert(bigRow.getLong(0) == 0L)
  }

  test("packSequences bins are dense per group: every bin index up to " +
      "the max is used") {
    val docs = (1L to 60L).map(i => (i, "g", "a b c")).toDF("doc_id", "grp", "text")
    val bins = TextPipeline.packSequences(docs, Seq("grp"), "doc_id", "text",
        budget = 7)
      .select("bin_id").distinct().collect().map(_.getLong(0)).sorted
    assert(bins.toSeq == (0L until bins.length).toSeq)
  }

  test("bm25 matches the task-local reference (multi-term, with idf)") {
    val docs = Seq(
      (1L, "spark shuffle join spark spark"),   // tf(spark)=3 tf(join)=1 dl=5
      (2L, "join join table row"),              // tf(join)=2 dl=4
      (3L, "row scan filter"),                  // no query terms → dropped
      (4L, "spark")                             // tf(spark)=1 dl=1
    ).toDF("doc_id", "text")
    val got = TextPipeline.bm25(docs, "doc_id", "text",
        Seq("spark", "join"), k1 = 1.2, b = 0.75)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap

    // local reference, textbook formula
    val corpus = Map(1L -> Seq("spark", "shuffle", "join", "spark", "spark"),
      2L -> Seq("join", "join", "table", "row"),
      3L -> Seq("row", "scan", "filter"), 4L -> Seq("spark"))
    val n = corpus.size.toDouble
    val avgdl = corpus.values.map(_.size).sum / n
    def score(doc: Seq[String]): Double = Seq("spark", "join").map { t =>
      val tf = doc.count(_ == t).toDouble
      val df = corpus.values.count(_.contains(t)).toDouble
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      idf * (2.2 * tf / (tf + 1.2 * (0.25 + 0.75 * (doc.size / avgdl))))
    }.sum
    assert(got.keySet === Set(1L, 2L, 4L), "doc 3 has no query term")
    got.foreach { case (id, s) =>
      assert(math.abs(s - score(corpus(id))) < 1e-12, s"doc $id") }
    // short all-matching doc 4 outranks long doc 1 on 'spark' alone?
    // no — doc 1 has tf 3 AND a join hit; sanity-pin the order
    assert(got(1L) > got(4L) && got(4L) > got(2L))
  }

  test("noveltyScores: full copy 0.0, disjoint 1.0, half-overlap exact") {
    val ref = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    // grams(ref) = {a b c, b c d, c d e, d e f}
    val cands = Seq(
      (10L, "a b c d e f"),    // identical → novelty 0
      (11L, "x y z w v u"),    // disjoint → novelty 1
      (12L, "a b c d x y z")   // grams: {abc,bcd,cdx,dxy,xyz} → 2 known
    ).toDF("doc_id", "text")
    val got = TextPipeline.noveltyScores(cands, ref, "doc_id", "text", 3)
      .orderBy("doc_id")
      .select("doc_id", "n_grams", "n_known", "novelty")
      .as[(Long, Long, Long, Double)].collect()
    assert(got(0) === ((10L, 4L, 4L, 0.0)))
    assert(got(1) === ((11L, 4L, 0L, 1.0)))
    assert(got(2) === ((12L, 5L, 2L, 3.0 / 5.0)))
  }

  test("groupQuantileFilter keeps each group's exact top fraction; " +
      "small groups never starve") {
    // group a: scores 1..10 (keep 6..10); group b: 2 rows (keep the top 1)
    val df = ((1 to 10).map(i => (i.toLong, "a", i.toDouble)) ++
      Seq((100L, "b", 0.1), (101L, "b", 0.2)))
      .toDF("id", "grp", "score")
    val out = TextPipeline.groupQuantileFilter(df, "grp", "score",
        p = 0.5, tieCol = "id")
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(out.filter(_._2 == "a").map(_._1).toSeq ===
      (6L to 10L).toSeq)
    assert(out.filter(_._2 == "b").map(_._1).toSeq === Seq(101L))
    // deterministic under repartitioning
    val again = TextPipeline.groupQuantileFilter(df.repartition(5), "grp",
      "score", p = 0.5, tieCol = "id").orderBy("id")
      .as[(Long, String, Double)].collect()
    assert(out.toSeq === again.toSeq)
  }

  test("groupQuantileFilter: a NULL score ranks lowest and is dropped " +
      "(NULLS FIRST pinned — DuckDB's window default differs)") {
    val df = Seq((1L, "a", Option(1.0)), (2L, "a", Option.empty[Double]),
      (3L, "a", Option(2.0)), (4L, "a", Option(3.0)))
      .toDF("id", "grp", "score")
    val kept = TextPipeline.groupQuantileFilter(df, "grp", "score",
        p = 0.5, tieCol = "id")
      .orderBy("id").select("id").as[Long].collect().toSeq
    assert(kept === Seq(3L, 4L)) // NULL ranked first, cut with 1.0
  }

  test("url helpers: host/path/registered-domain on edge cases") {
    import graft.operators.TextFunctions._
    val urls = Seq(
      "https://www.example.com/a/b?q=1#frag",
      "http://sub.deep.host.co.uk/path",
      "https://bare.io",
      "ftp://files.example.org/x",
      "not a url"
    ).toDF("url")
    val got = urls.select(urlHost(col("url")).as("h"),
        urlPath(col("url")).as("p"),
        registeredDomain(urlHost(col("url"))).as("d"))
      .as[(String, String, String)].collect()
    assert(got(0) === (("www.example.com", "/a/b", "example.com")))
    assert(got(1) === (("sub.deep.host.co.uk", "/path", "co.uk"))) // 2-label heuristic
    assert(got(2) === (("bare.io", "", "bare.io")))
    assert(got(3) === (("files.example.org", "/x", "example.org")))
    assert(got(4) === (("", "", "")))
  }

  test("bpePairCounts: frequency-weighted adjacent pairs, hand-checked") {
    // corpus: "abab ab cd" + "abab xy" → word freqs: abab 2, ab 1, cd 1, xy 1
    // pairs: abab → ab, ba, ab (per occurrence); so ab: 2*2 + 1 = 5,
    // ba: 2, cd: 1, xy: 1
    val docs = Seq("abab ab cd", "abab  xy").toDF("text")
    val got = TextPipeline.bpePairCounts(docs, "text", k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("ab", 5L), ("ba", 2L), ("cd", 1L), ("xy", 1L)))
  }

  test("bpePairCounts: 1-char words contribute nothing; k cuts on (cnt, pair)") {
    val docs = Seq("a b c dd dd ee").toDF("text")
    val got = TextPipeline.bpePairCounts(docs, "text", k = 1)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("dd", 2L))) // "ee" ties nothing; singles dropped
  }

  test("t22 classifier-filter composition: the trained model separates " +
      "the weak label and reruns bit-exactly") {
    def run() = graft.queries.TextQueries.qs
      .find(_.name == "t22_quality_classifier").get
      .run(spark, "/root/testdata/sf0.001")
      .as[(Long, Int, Double, Boolean)].collect().toSeq
    val got = run()
    assert(got.nonEmpty)
    val (en, other) = got.partition(_._2 == 1)
    assert(en.nonEmpty && other.nonEmpty) // the fixture has both classes
    // the one-feature model must order the classes by mean score —
    // the point of training before filtering
    val mean = (xs: Seq[(Long, Int, Double, Boolean)]) =>
      xs.map(_._3).sum / xs.size
    assert(mean(en) > mean(other))
    // keep is exactly the 0.5 threshold on the quantized score
    assert(got.forall(r => r._4 == (r._3 >= 0.5)))
    assert(got === run()) // deterministic training + scoring
  }

  test("thresholdSweep emits the full grid with hand-checked retention") {
    val df = Seq((0.0, 10L), (0.5, 20L), (0.95, 30L), (1.0, 40L))
      .toDF("score", "w")
    val out = TextPipeline.thresholdSweep(df, "score", "w", nSteps = 20)
      .as[(Double, Long, Long, Double)].collect().toSeq
    assert(out.size == 20) // empty buckets still emit their grid row
    assert(out.map(_._1) == (0 until 20).map(_.toDouble / 20))
    val byTau = out.map(r => r._1 -> r).toMap
    assert(byTau(0.0) == ((0.0, 4L, 100L, 1.0)))    // everything survives
    assert(byTau(0.05) == ((0.05, 3L, 90L, 0.9)))   // drops the 0.0 doc
    assert(byTau(0.5)._2 == 3L)                     // 0.5 passes tau=0.5
    assert(byTau(0.55) == ((0.55, 2L, 70L, 0.7)))   // drops the 0.5 doc
    assert(byTau(0.95)._2 == 2L && byTau(0.95)._3 == 70L)
    // retention is monotone non-increasing in tau
    assert(out.map(_._3) == out.map(_._3).sorted.reverse)
  }

  test("charEntropy matches hand-computed quantized bits and excludes " +
      "empty/NULL texts") {
    val docs = Seq((1L, "aaaa"), (2L, "ab"), (3L, "abcd"), (4L, ""),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextPipeline.charEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L)) // no distribution, no row
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L) == ((1L, 4L, 1L, 0L)))       // single symbol: 0 bits
    assert(byId(2L) == ((2L, 2L, 2L, 1048576L))) // uniform 2: 1 bit
    assert(byId(3L) == ((3L, 4L, 4L, 2097152L))) // uniform 4: 2 bits
  }

  test("thresholdSweep fails loudly on NULL scores and NULL weights") {
    val nullScore = Seq((Some(0.5), 10L), (None, 20L))
      .toDF("score", "w")
    val e1 = intercept[Exception] {
      TextPipeline.thresholdSweep(nullScore, "score", "w").collect()
    }
    assert(e1.getMessage.contains("NULL in score column"), e1.getMessage)
    val nullWeight = Seq((0.5, Some(10L)), (0.9, None))
      .toDF("score", "w")
    val e2 = intercept[Exception] {
      TextPipeline.thresholdSweep(nullWeight, "score", "w").collect()
    }
    assert(e2.getMessage.contains("NULL in weight column"), e2.getMessage)
  }

  test("domainKl: hand-computed quantized divergence; identical domains " +
      "have zero KL") {
    val docs = Seq((1L, "A", "a a b"), (2L, "B", "b")).toDF("id", "dom", "text")
    val got = TextPipeline.domainKl(docs, "dom", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def tq(p: Double, q: Double): Long =
      math.floor(p * math.log(p / q) * 1048576.0 + 0.5).toLong
    // corpus: a:2 b:2 (C=4, q=0.5 each). A: p_a=2/3, p_b=1/3; B: p_b=1
    assert(got("A") == ((3L, 2L,
      tq(2.0 / 3.0, 0.5) + tq(1.0 / 3.0, 0.5))))
    assert(got("B") == ((1L, 1L, tq(1.0, 0.5))))
    // two identical domains: p == q everywhere -> every term quantizes to 0
    val same = Seq((1L, "X", "a b"), (2L, "Y", "a b")).toDF("id", "dom", "text")
    TextPipeline.domainKl(same, "dom", "text").collect()
      .foreach(r => assert(r.getLong(3) == 0L))
    // NULL domains would deflate every other domain's q — raise
    val withNull = Seq((1L, Option("A"), "a"), (2L, Option.empty[String], "b"))
      .toDF("id", "dom", "text")
    val e = intercept[Exception] {
      TextPipeline.domainKl(withNull, "dom", "text").collect()
    }
    assert(e.getMessage.contains("NULL in domain column"), e.getMessage)
  }

  test("canonicalUrl: case, default ports, tracking params, fragments, " +
      "and trailing slashes normalize; real ports and path case survive") {
    import graft.operators.TextFunctions.canonicalUrl
    val cases = Seq(
      "https://WWW.Ex.COM/A/b/" -> "https://www.ex.com/A/b",
      "HTTPS://ex.com:443/a?utm_x=1#f" -> "https://ex.com/a",
      "http://ex.com:80/a" -> "http://ex.com/a",
      "http://ex.com:8080/a" -> "http://ex.com:8080/a", // real port kept
      "http://ex.com:443/a" -> "http://ex.com:443/a",   // cross-scheme port kept
      "https://ex.com:80/a" -> "https://ex.com:80/a",   // cross-scheme port kept
      "https://ex.com/" -> "https://ex.com",
      "https://ex.com" -> "https://ex.com",
      // content-bearing query params identify DISTINCT resources — kept
      "https://ex.com/watch?v=AAA" -> "https://ex.com/watch?v=AAA",
      "https://ex.com/a?id=3&utm_source=x" -> "https://ex.com/a?id=3",
      "https://ex.com/a?utm_a=1&utm_b=2" -> "https://ex.com/a",
      "https://ex.com/a?utm_a=1&page=2&fbclid=z#frag" ->
        "https://ex.com/a?page=2")
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), canonicalUrl(col("url")).as("c"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"$in -> ${got(in)} (want $want)")
    }
    // schemeless/malformed input fails loudly instead of collapsing to
    // the constant key "://"
    val e = intercept[Exception] {
      Seq("example.com/a").toDF("url")
        .select(canonicalUrl(col("url"))).collect()
    }
    assert(e.getMessage.contains("no <scheme>:// prefix"), e.getMessage)
  }
  test("redactPii URL redaction stops at ANY whitespace (a literal-space" +
      "-only class ate newline-separated content after a URL)") {
    val df = Seq("see https://x.com\nImportant: value").toDF("text")
    val out = df.select(
      graft.operators.TextFunctions.redactPii(col("text")).as("c"))
      .as[String].head()
    assert(out === "see <URL>\nImportant: value", out)
  }

  test("packSequences raises on NULL text instead of silently binning " +
      "the doc nowhere") {
    val docs = Seq((1L, 0L, Option("a b")), (1L, 1L, None: Option[String]))
      .toDF("g", "ord", "text")
    val e = intercept[Exception] {
      TextPipeline.packSequences(docs, Seq("g"), "ord", "text",
        budget = 4).collect()
    }
    assert(e.getMessage.contains("NULL in text column"), e.getMessage)
  }

  test("occurrences rejects an empty needle (division by zero would " +
      "return NULL counts)") {
    val e = intercept[IllegalArgumentException] {
      graft.operators.TextFunctions.occurrences(lit("abc"), "")
    }
    assert(e.getMessage.contains("empty needle"))
  }

  test("charEntropy accepts column names needing quoting") {
    val df = Seq((1L, "aab")).toDF("id", "text col")
    val out = TextPipeline.charEntropy(df, "id", "text col").head()
    assert(out.getLong(1) === 3L && out.getLong(2) === 2L)
  }

  test("r17: QueryLeases drain releases the trained-model and pipeline " +
      "caches; released frames still recompute correctly") {
    import graft.util.QueryLeases
    import org.apache.spark.storage.StorageLevel
    val docs = Seq((1L, "a b c a b"), (2L, "b c d e"), (3L, "a a d"))
      .toDF("doc_id", "text")
    // start clean w.r.t. any leases earlier tests registered
    QueryLeases.releaseAll()
    val model = NgramLm.train(docs, "text")
    QueryLeases.lease(model.unpersist())
    val before = NgramLm.scoreDocs(model, docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // the count tables are resident while the query materializes...
    assert(model.unigrams.storageLevel != StorageLevel.NONE)
    assert(model.bigrams.storageLevel != StorageLevel.NONE)
    // charEntropy leases its internal cc frame on construction
    val ent = TextPipeline.charEntropy(docs, "doc_id", "text")
    val entBefore = ent.orderBy("doc_id").collect()
    // ...and the harness drain (Verify/Bench after each query) frees them
    QueryLeases.releaseAll()
    assert(model.unigrams.storageLevel == StorageLevel.NONE)
    assert(model.bigrams.storageLevel == StorageLevel.NONE)
    // release is an optimization boundary, not a correctness one: the
    // same plans recompute to the same results
    assert(NgramLm.scoreDocs(model, docs, "doc_id", "text")
      .orderBy("doc_id").collect() === before)
    assert(ent.orderBy("doc_id").collect() === entBefore)
    // double drain is a no-op
    QueryLeases.releaseAll()
  }

}
