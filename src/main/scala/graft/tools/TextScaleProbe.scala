package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dsir, NgramLm, Samplers, TextPipeline}

/** Scale probe for the text-pipeline operators: synthesizes a corpus
  * 100-1000× the test tables' size with deterministic hash-drawn tokens
  * (no rand streams), runs each operator fully distributed, and checks a
  * closed-form invariant of the result so a fast-but-wrong run can't
  * pass. Run:
  *   sbt "runMain graft.tools.TextScaleProbe [nDocs]"
  * Expect LINEAR wall-time in corpus size: top-terms is one cached
  * (doc, token) aggregation feeding a bounded df agg + skew-splittable
  * join, decontamination is a broadcast collision join, packing is one
  * shard-keyed window, and mixture resampling is one group-keyed
  * window. NOTE the corpus draws tokens uniformly from the vocabulary —
  * it measures throughput scaling, not Zipfian skew; the skew defenses
  * (partial aggs, AQE skew-join, no tok-windows) are design properties
  * asserted in PlanSuite, not here.
  *
  * Corpus construction: doc i carries 60 tokens `w<h>` with
  * h = xxhash64(base, j) mod 50k, where base = i except that every
  * id ≡ 1 (mod 1000) doc REUSES base i−1 — an exact copy of a
  * benchmark doc (ids ≡ 0 mod 1000), giving decontamination a planted
  * truth: copies must all flag, and with a 50k vocabulary the chance
  * of a spurious shared 5-gram elsewhere is ~(1/50k)⁵ per pair — zero
  * at any feasible scale.
  */
object TextScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 2000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tokensPerDoc = 60
    val base = when(col("id") % 1000 === 1, col("id") - 1).otherwise(col("id"))
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(tokensPerDoc - 1)),
        j => concat(lit("w"), pmod(xxhash64(base, j), lit(50000L))))).as("text"),
      pmod(xxhash64(col("id"), lit(7)), lit(1024L)).as("shard"))

    // ---- top terms: every doc has ≥3 distinct tokens w.h.p., so the
    // result must carry exactly k rows per doc with tf ≥ 1 ---------------
    val t0 = System.nanoTime()
    val top = TextPipeline.topTermsByRarity(docs, "doc_id", "text", k = 3)
    val a = top.agg(count(lit(1)).as("n"),
      count(when(col("tf") < 1 || col("df") < 1, 1)).as("bad"),
      countDistinct(col("doc_id")).as("docs")).head()
    val tTop = (System.nanoTime() - t0) / 1e9
    require(a.getLong(1) == 0L, "top-terms emitted a zero tf/df")
    require(a.getLong(2) == nDocs, "top-terms lost documents")
    require(a.getLong(0) == 3L * nDocs,
      s"expected ${3 * nDocs} rows (3 per doc), got ${a.getLong(0)}")

    // ---- decontamination: planted copies must flag, nothing else ------
    val t1 = System.nanoTime()
    val bench = docs.filter(col("doc_id") % 1000 === 0)
    val cands = docs.filter(col("doc_id") % 1000 =!= 0)
    val prof = TextPipeline.decontaminate(cands, bench, "doc_id", "text", 5)
    val d = prof.agg(count(lit(1)).as("n"),
      sum(col("contaminated")).as("flagged"),
      count(when(col("doc_id") % 1000 === 1 && col("contaminated") === 0, 1))
        .as("missed_copies"),
      count(when(col("doc_id") % 1000 =!= 1 && col("contaminated") === 1, 1))
        .as("false_flags")).head()
    val tDecon = (System.nanoTime() - t1) / 1e9
    // planted copies: ids ≡ 1 (mod 1000) below nDocs
    val nCopies = (nDocs - 2) / 1000 + 1
    require(d.getLong(0) == cands.count(), "decontaminate dropped candidates")
    require(d.getLong(1) == nCopies,
      s"flagged ${d.getLong(1)} != $nCopies planted copies")
    require(d.getLong(2) == 0L, "a planted benchmark copy was not flagged")
    require(d.getLong(3) == 0L, "a vocabulary-random doc was flagged")

    // ---- packing: constant 60-token docs ⇒ per-shard bins are dense
    // with max = floor(60·(cnt−1)/512) ----------------------------------
    val t2 = System.nanoTime()
    val packed = TextPipeline.packSequences(docs, Seq("shard"), "doc_id",
      "text", budget = 512)
    val shardCheck = packed.groupBy("shard").agg(
        count(lit(1)).as("cnt"), max(col("bin_id")).as("max_bin"),
        countDistinct(col("bin_id")).as("n_bins"))
      .agg(count(when(col("max_bin") =!=
          floor((col("cnt") - 1) * tokensPerDoc / lit(512)), 1)).as("bad_max"),
        count(when(col("n_bins") =!= col("max_bin") + 1, 1)).as("gappy"))
      .head()
    val tPack = (System.nanoTime() - t2) / 1e9
    require(shardCheck.getLong(0) == 0L, "a shard's max bin is off")
    require(shardCheck.getLong(1) == 0L, "a shard has bin-index gaps")

    // ---- mixture resampling: exact-n per group at corpus scale --------
    val t3 = System.nanoTime()
    val grouped = docs.withColumn("grp",
      concat(lit("g"), pmod(xxhash64(col("doc_id"), lit(9)), lit(5L))))
    val sizes = grouped.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets = Map("g0" -> 0.5, "g1" -> 0.2, "g2" -> 0.1, "g3" -> 0.05)
    val nTotal = math.min(nDocs / 2, Int.MaxValue.toLong).toInt
    val got = Samplers.mixtureExact(grouped, "grp", targets, nTotal, seed = 3)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tMix = (System.nanoTime() - t3) / 1e9
    targets.foreach { case (g, f) =>
      val want = math.min(sizes(g), math.floor(nTotal * f + 0.5).toLong)
      require(got.getOrElse(g, 0L) == want, s"group $g: ${got.get(g)} != $want")
    }
    require(!got.contains("g4"), "untargeted group must be dropped")

    // ---- BM25: matched-doc count has a closed form ---------------------
    // Querying w0..w2 (3 of 50k vocab terms): a doc matches iff any of
    // its 60 hash-drawn tokens lands on one of them — recompute the
    // match set exactly with an independent filter and require identical
    // counts, plus score-range sanity (idf-weighted sum of 3 bounded
    // per-term factors).
    val t4 = System.nanoTime()
    val terms = Seq("w0", "w1", "w2")
    val scored = TextPipeline.bm25(docs, "doc_id", "text", terms)
    val b = scored.agg(count(lit(1)).as("n"),
      count(when(col("score") <= 0.0, 1)).as("nonpos"),
      max(col("score")).as("mx")).head()
    val tBm = (System.nanoTime() - t4) / 1e9
    val wantMatches = docs.filter(
      terms.map(t => array_contains(split(col("text"), " "), t))
        .reduce(_ || _)).count()
    require(b.getLong(0) == wantMatches,
      s"bm25 matched ${b.getLong(0)} docs, filter says $wantMatches")
    require(b.getLong(1) == 0L, "bm25 emitted a non-positive score")
    // 3 terms × (k1+1) × idf(df ≈ n/838 ± hash noise) ≈ 3 · 2.2 · ~6.7,
    // bounded generously at 60 (df would have to be 10× rarer to breach)
    require(b.getDouble(2) < 60.0, s"bm25 score ${b.getDouble(2)} out of range")

    // ---- DSIR + bigram LM: planted two-domain corpus -------------------
    // Domain A (half the docs, by id hash) draws its 60 tokens from the
    // NARROW vocab [0, 25k); domain B from the FULL [0, 50k). Target =
    // the A sub-corpus. Planted truth: every A doc must outscore every
    // B doc under both scorers — a B doc has ≈30 upper-half tokens with
    // zero target mass (smoothing-only llr / OOV backoff), a gap of
    // tens of log units, so min(A) > max(B) is exact, not statistical.
    // (P(a B doc draws all 60 tokens narrow) = 2⁻⁶⁰ — and the corpus is
    // a fixed hash draw, so the assertion is deterministic anyway.)
    val isA = pmod(xxhash64(col("id"), lit(13)), lit(2L)) === 0
    val corpus2 = spark.range(nDocs).select(col("id").as("doc_id"),
      isA.as("is_a"),
      concat_ws(" ", transform(sequence(lit(0), lit(tokensPerDoc - 1)),
        j => concat(lit("w"), pmod(xxhash64(col("id"), j),
          when(isA, lit(25000L)).otherwise(lit(50000L)))))).as("text"))
    val target2 = corpus2.filter(col("is_a"))

    val t5 = System.nanoTime()
    // Unigram features ON PURPOSE: this corpus encodes its domain in
    // the unigram distribution only — tokens are independent uniform
    // draws, so its bigrams are ~unique random pairs whose hashed
    // counts are domain-flat. Adding them (nGramMax = 2) injects
    // zero-signal noise that breaks EXACT min/max separation (measured:
    // min(A) −7.68 < max(B) −6.58 at 200k docs) — the right feature
    // bag follows the data, and the bigram bag's correctness is pinned
    // closed-form in DsirSuite instead.
    val dsirScored = Dsir.importanceWeights(corpus2, target2, "doc_id",
        "text", hashBuckets = Some(1 << 18)) // the B-bounded broadcast path
      .groupBy("is_a").agg(min("logw").as("mn"), max("logw").as("mx"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> r).toMap
    val tDsir = (System.nanoTime() - t5) / 1e9
    require(dsirScored(true).getAs[Long]("n") +
      dsirScored(false).getAs[Long]("n") == nDocs, "DSIR dropped docs")
    require(dsirScored(true).getAs[Double]("mn") >
      dsirScored(false).getAs[Double]("mx"),
      s"DSIR domains overlap: min(A)=${dsirScored(true).getAs[Double]("mn")}" +
        s" max(B)=${dsirScored(false).getAs[Double]("mx")}")

    val t6 = System.nanoTime()
    val lm = NgramLm.train(target2, "text", minCount = 2)
    val lmScored = NgramLm.scoreDocs(lm, corpus2, "doc_id", "text")
      .join(corpus2.select("doc_id", "is_a"), "doc_id")
      .groupBy("is_a").agg(min("avg_logp").as("mn"),
        max("avg_logp").as("mx"), count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> r).toMap
    val tLm = (System.nanoTime() - t6) / 1e9
    require(lmScored(true).getAs[Long]("n") +
      lmScored(false).getAs[Long]("n") == nDocs, "LM scoring dropped docs")
    require(lmScored(true).getAs[Double]("mn") >
      lmScored(false).getAs[Double]("mx"),
      s"LM domains overlap: min(A)=${lmScored(true).getAs[Double]("mn")}" +
        s" max(B)=${lmScored(false).getAs[Double]("mx")}")

    // ---- BPE: train on the bounded word-count table, encode corpus ----
    // The vocab has ≤ 50k distinct words over the 11-char alphabet
    // {w,0-9}; training must return exactly nMerges chain-consistent
    // merges, and encoding with them must ROUNDTRIP — the concatenated
    // tokens of every doc equal its space-free text (the corpus is
    // already normalized, so the target is exact). Scale claims under
    // test: training's corpus cost is ONE distributed word-count pass
    // (the merge loop runs over ≤ 50k driver rows), encoding is a pure
    // broadcast-map projection.
    val t7 = System.nanoTime()
    val merges = graft.operators.Tokenize.bpeTrain(docs, "text",
      nMerges = 50)
    val tTrain = (System.nanoTime() - t7) / 1e9
    require(merges.length == 50, s"trained ${merges.length} merges")
    val producedSeq = merges.map { case (a, b) => a + b }
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      Seq(a, b).filter(_.length > 1).foreach { s0 =>
        require(producedSeq.take(r).contains(s0), s"chain break at rank $r")
      }
    }
    val t8 = System.nanoTime()
    val enc = graft.operators.Tokenize.bpeEncode(docs, "text", merges)
    val rt = enc.agg(count(lit(1)).as("n"),
      count(when(expr("concat_ws('', bpe)") =!=
        regexp_replace(col("text"), " ", ""), 1)).as("bad")).head()
    val tEnc = (System.nanoTime() - t8) / 1e9
    require(rt.getLong(0) == nDocs && rt.getLong(1) == 0L,
      s"BPE roundtrip failed on ${rt.getLong(1)} of ${rt.getLong(0)} docs")

    // ---- classifier filter (t22's shape): train + score at scale ------
    // Weak label = domain A; feature = narrow-vocab token fraction read
    // from the TEXT (1.0 exactly for A docs, ≈0.5 for B — the same
    // planted-truth corpus as the DSIR leg, so min(A) > max(B) is a
    // property of the fixed hash draw). Scale claims under test: the
    // whole train+score pipeline is 3 quantized-IRLS scans plus ONE
    // broadcast-scored scan regardless of N, and the monotone model
    // must separate the domains exactly.
    val t9 = System.nanoTime()
    val feats = corpus2.select(col("doc_id"),
      col("is_a").cast("double").as("y"),
      (expr("size(filter(split(text, ' '), " +
        "t -> CAST(substr(t, 2, 10) AS LONG) < 25000))")
        .cast("double") / tokensPerDoc).as("x"))
    val coefs = graft.stats.Logistic.fitPortable2(feats, "y", "x", iters = 3)
    val qz = lit(1048576.0)
    val clsScored = feats.crossJoin(broadcast(coefs))
      .withColumn("score",
        floor((lit(1.0) / (lit(1.0) +
          exp(-(col("b0") + col("b1") * col("x"))))) * qz + lit(0.5)) / qz)
      .groupBy("y").agg(min("score").as("mn"), max("score").as("mx"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getDouble(0) -> r).toMap
    val tCls = (System.nanoTime() - t9) / 1e9
    require(clsScored(1.0).getAs[Long]("n") +
      clsScored(0.0).getAs[Long]("n") == nDocs, "classifier dropped docs")
    require(clsScored(1.0).getAs[Double]("mn") >
      clsScored(0.0).getAs[Double]("mx"),
      s"classifier domains overlap: min(A)=" +
        s"${clsScored(1.0).getAs[Double]("mn")} max(B)=" +
        s"${clsScored(0.0).getAs[Double]("mx")}")

    // ---- unigram-LM segmentation: vocab + Viterbi over the corpus -----
    // Scale claims under test: vocab from the bounded capped-word pass
    // (driver substring loop over ≤ 50k rows), segmentation a pure
    // broadcast-vocab DP projection. Invariants: every doc keeps all 60
    // words, every word segments to ≥ 1 piece with a finite negative
    // score (full char coverage guarantees reachability).
    val t10 = System.nanoTime()
    val uv = graft.operators.Tokenize.unigramVocab(docs, "text",
      topWords = 50000, topPieces = 400, maxLen = 4)
    val tUvoc = (System.nanoTime() - t10) / 1e9
    val t11 = System.nanoTime()
    val seg = graft.operators.Tokenize.unigramSegment(docs, "text", uv)
      .select(col("doc_id"), explode(col("seg")).as("w"))
    val sAgg = seg.agg(count(lit(1)).as("n"),
      count(when(col("w._1") < 1 ||
        col("w._2") >= 0.0 || isnan(col("w._2")) ||
        col("w._2") === Double.NegativeInfinity, 1)).as("bad")).head()
    val tUseg = (System.nanoTime() - t11) / 1e9
    require(sAgg.getLong(0) == nDocs * tokensPerDoc,
      s"unigram segmentation lost words: ${sAgg.getLong(0)}")
    require(sAgg.getLong(1) == 0L,
      "a word segmented to an empty/non-finite/non-negative score")

    // ---- DoReMi reweighting (t25's shape): one EG step at scale --------
    // Scored frame = the classifier corpus with its quantized narrow-
    // vocab fraction as the per-doc score (A docs score 2^20 exactly, B
    // ≈ 2^19). Scale claims under test: ONE doc-keyed scan partial-
    // aggregates to |domains| = 2 rows, everything downstream is
    // domain-bounded. Invariants: the at/above-mean domain (A) keeps
    // boost exactly 2^20 (lam = 0), the below-mean domain (B) is
    // up-weighted past its n_d/N baseline, weights sum to 1.
    val t12 = System.nanoTime()
    val drScored = corpus2.select(
      when(col("is_a"), lit("A")).otherwise(lit("B")).as("dom"),
      floor(
        (expr("size(filter(split(text, ' '), " +
          "t -> CAST(substr(t, 2, 10) AS LONG) < 25000))")
          .cast("double") / tokensPerDoc) * lit(1048576.0) + lit(0.5))
        .cast("long").as("s"))
    val dr = graft.operators.Samplers.doremiReweight(drScored, "dom", "s")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val tDoremi = (System.nanoTime() - t12) / 1e9
    require(dr.size == 2, s"expected 2 domains, got ${dr.size}")
    require(dr("A")._1 + dr("B")._1 == nDocs, "doremi dropped docs")
    require(dr("A")._2 == 1048576L,
      s"above-mean domain boost drifted: ${dr("A")._2}")
    require(dr("B")._3 > dr("B")._1.toDouble / nDocs,
      s"below-mean domain not up-weighted: w=${dr("B")._3}")
    require(math.abs(dr("A")._3 + dr("B")._3 - 1.0) < 1e-12,
      "doremi weights do not normalize")

    // ---- threshold sweep (t26's shape): one pass over the corpus ------
    // Score = a per-doc uniform in [0,1) from the fixed hash draw;
    // weight = the constant doc length. Scale claims under test: one
    // scan bucketing to a 20-row frame. Invariants: full grid, total
    // retention at tau = 0, monotone non-increasing token mass.
    val t13 = System.nanoTime()
    val swept = TextPipeline.thresholdSweep(
      docs.select(
        (pmod(xxhash64(col("doc_id"), lit(11)), lit(1048576L))
          .cast("double") / lit(1048576.0)).as("q"),
        lit(tokensPerDoc.toLong).as("ntok")),
      "q", "ntok", nSteps = 20).collect()
    val tSweep = (System.nanoTime() - t13) / 1e9
    require(swept.length == 20, s"sweep grid incomplete: ${swept.length}")
    require(swept.head.getLong(1) == nDocs &&
      swept.head.getDouble(3) == 1.0, "tau=0 must retain everything")
    val masses = swept.map(_.getLong(2)).toSeq
    require(masses == masses.sorted.reverse, "retention not monotone")

    // ---- domain KL (t30's shape): two planted domains ------------------
    // Domain A (ids < nDocs/2) draws from the FULL 50k vocabulary,
    // domain B from the w0..w499 slice. Invariants: B (concentrated,
    // far from the pooled corpus distribution) must diverge strictly
    // more than A, both non-negative up to quantization, and every
    // token is accounted for. Scale claims under test: one explode
    // pass to the (domain, token) frame; marginals join
    // vocabulary-keyed; corpus totals on the 2-row domain frame.
    val t14 = System.nanoTime()
    val klDocs = spark.range(nDocs).select(col("id").as("doc_id"),
      when(col("id") < nDocs / 2, lit("A")).otherwise(lit("B")).as("dom"),
      concat_ws(" ", transform(sequence(lit(0), lit(tokensPerDoc - 1)),
        j => concat(lit("w"), pmod(xxhash64(col("id"), j),
          when(col("id") < nDocs / 2, lit(50000L)).otherwise(lit(500L))))))
        .as("text"))
    val kl = TextPipeline.domainKl(klDocs, "dom", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val tKl = (System.nanoTime() - t14) / 1e9
    require(kl("A")._1 + kl("B")._1 == nDocs * tokensPerDoc,
      "domainKl lost tokens")
    require(kl("B")._2 <= 500L, "narrow domain exceeded its vocabulary")
    require(kl("B")._3 > kl("A")._3 && kl("B")._3 > 0L,
      s"concentrated domain must out-diverge the broad one: $kl")

    // ---- shard census (c04's shape): one pass to nShards rows ---------
    val t15 = System.nanoTime()
    val sc = Samplers.shardCensus(
      docs.select(col("doc_id"), lit(tokensPerDoc.toLong).as("ntok")),
      "doc_id", "ntok", nShards = 64).collect()
    val tShard = (System.nanoTime() - t15) / 1e9
    require(sc.length == 64 && sc.map(_.getLong(1)).sum == nDocs,
      "shard census lost documents")
    // multiplicative-hash balance at 2M keys: every shard within ±5%
    require(sc.forall(r => math.abs(r.getDouble(3) - 1.0) < 0.05),
      s"shard imbalance beyond 5%: ${sc.map(_.getDouble(3)).max}")

    println(f"docs=$nDocs%,d topTerms=$tTop%.1fs decontaminate=$tDecon%.1fs " +
      f"pack=$tPack%.1fs mixture=$tMix%.1fs bm25($wantMatches%,d matched)=$tBm%.1fs " +
      f"dsir=$tDsir%.1fs ngramLm=$tLm%.1fs bpeTrain=$tTrain%.1fs " +
      f"bpeEncode=$tEnc%.1fs classifier=$tCls%.1fs " +
      f"unigramVocab=$tUvoc%.1fs unigramSegment=$tUseg%.1fs " +
      f"doremi=$tDoremi%.1fs sweep=$tSweep%.1fs domainKl=$tKl%.1fs " +
      f"shardCensus=$tShard%.1fs")
    spark.stop()
  }
}
