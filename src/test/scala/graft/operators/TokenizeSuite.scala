package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TokenizeSuite extends SparkSpec {
  import spark.implicits._

  test("wordpieceWord: classic greedy longest-match tiling") {
    val vocab = Set("un", "##aff", "##able", "##a", "a", "b", "##b", "ab",
      "abc")
    def enc(w: String) = Tokenize.wordpieceWord(w, vocab)
    assert(enc("unaffable") === Seq("un", "##aff", "##able"))
    assert(enc("abc") === Seq("abc"))     // longest whole-word match wins
    assert(enc("aba") === Seq("ab", "##a"))
    assert(enc("abd") === Seq(Tokenize.Unk)) // 'd' untileable → whole-word UNK
    assert(enc("") === Seq.empty)
  }

  test("wordpieceEncode: normalization, multi-word docs, broadcast vocab") {
    val vocab = Set("the", "cat", "##s", "s", "t", "##h", "##e", "c",
      "##a", "##t")
    val df = Seq((1L, "The  cats"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Tokenize.wordpieceEncode(df, "text", vocab)
      .select("doc_id", "pieces")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) === Seq("the", "cat", "##s"))
    assert(out(2L) === Seq.empty)
  }

  test("corpusVocab covers every character: no UNK, exact roundtrip") {
    val docs = Seq(
      (1L, "spark builds distributed plans"),
      (2L, "distributed plans need spark executors"),
      (3L, "zzz-unusual punct: 42!")).toDF("doc_id", "text")
    val vocab = Tokenize.corpusVocab(docs, "text", topWords = 3)
    val enc = Tokenize.wordpieceEncode(docs, "text", vocab)
    val stripped = expr("concat_ws('', transform(pieces, p -> " +
      "CASE WHEN substring(p, 1, 2) = '##' THEN substring(p, 3) " +
      "ELSE p END))")
    val target = regexp_replace(Dedup.normalize(col("text")), " ", "")
    val checks = enc.select(
        (stripped === target).as("rt"),
        (!array_contains(col("pieces"), Tokenize.Unk)).as("uf")).collect()
    assert(checks.forall(r => r.getBoolean(0) && r.getBoolean(1)))
    // deterministic across partitionings
    val a = Tokenize.wordpieceEncode(docs.repartition(1), "text", vocab)
      .orderBy("doc_id").select("pieces").collect().map(_.getSeq[String](0)).toSeq
    val b = Tokenize.wordpieceEncode(docs.repartition(5), "text", vocab)
      .orderBy("doc_id").select("pieces").collect().map(_.getSeq[String](0)).toSeq
    assert(a === b)
  }

  test("bpeTrain: hand-computable merge sequence on a planted corpus") {
    // corpus "aaab aaab ab": pair counts round 1 (a,a)=4 (a,b)=3 →
    // merge (a,a), all occurrences left-to-right: aaab → [aa,a,b];
    // round 2 (a,b)=3 beats (aa,a)=2 → aaab → [aa,ab], ab → [ab];
    // round 3 merges the only remaining pair (aa,ab)
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val merges = Tokenize.bpeTrain(docs, "text", nMerges = 3)
    assert(merges === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    // asking for more merges than pairs exist stops early (after the
    // third merge every word is a single symbol — no pairs remain)
    assert(Tokenize.bpeTrain(docs, "text", nMerges = 10).length === 3)
  }

  test("bpeWord: lowest-rank-leftmost replay reaches the trained tiling") {
    val rank = Map(("a", "a") -> 0, ("a", "b") -> 1, ("aa", "ab") -> 2)
    assert(Tokenize.bpeWord("aaab", rank) === Seq("aaab"))
    assert(Tokenize.bpeWord("ab", rank) === Seq("ab"))
    assert(Tokenize.bpeWord("ba", rank) === Seq("b", "a"))
    assert(Tokenize.bpeWord("aaa", rank) === Seq("aa", "a"))
    assert(Tokenize.bpeWord("", rank) === Seq.empty)
  }

  test("bpeEncode: normalization, null text, layout determinism") {
    val docs = Seq((1L, "The AAAB  ab"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rank = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val out = Tokenize.bpeEncode(docs, "text", rank)
      .orderBy("doc_id").select("bpe").collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("t", "h", "e", "aaab", "ab"))
    assert(out(1) === Seq.empty)
    val p5 = Tokenize.bpeEncode(docs.repartition(5), "text", rank)
      .orderBy("doc_id").select("bpe").collect().map(_.getSeq[String](0))
    assert(out.toSeq === p5.toSeq)
  }

  test("unigramWord: Viterbi picks max score, then fewer pieces, then " +
      "the shorter final piece") {
    // multi-piece split wins on score
    val v1 = Map("a" -> -2.0, "b" -> -2.0, "ab" -> -3.0)
    assert(Tokenize.unigramWord("abab", v1, 4) === ((2, -6.0)))
    // exact score tie (-4.0 both ways) -> fewer pieces
    val v2 = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    assert(Tokenize.unigramWord("abab", v2, 4) === ((2, -4.0)))
    // score + piece-count tie impossible here; score tie alone: "aa" as
    // one piece (-2.0, 1) beats a|a (-2.0, 2)
    val v3 = Map("a" -> -1.0, "aa" -> -2.0)
    assert(Tokenize.unigramWord("aa", v3, 4) === ((1, -2.0)))
    // maxLen bounds the pieces considered
    val v4 = Map("a" -> -1.0, "aaa" -> -0.5)
    assert(Tokenize.unigramWord("aaa", v4, 2) === ((3, -3.0)))
    assert(Tokenize.unigramWord("aaa", v4, 3) === ((1, -0.5)))
  }

  test("unigramVocab: full char coverage, quantized negative logps, " +
      "segmentation reaches every corpus word") {
    val docs = Seq((1L, "the cat  The hat"), (2L, "zq zq thecat"))
      .toDF("doc_id", "text")
    val v = Tokenize.unigramVocab(docs, "text", topWords = 100,
      topPieces = 10, maxLen = 4)
    // every normalized-corpus char is a piece
    "thecaz q".replace(" ", "").foreach(c =>
      assert(v.contains(c.toString), s"missing char piece '$c'"))
    v.values.foreach { lp =>
      assert(lp < 0.0)
      assert(lp * 1048576.0 === math.rint(lp * 1048576.0)) // 2^-20 grid
    }
    // DP reaches the end of every corpus word with a finite score
    val segged = Tokenize.unigramSegment(docs, "text", v)
      .select(explode(col("seg")).as("w")).select("w._1", "w._2")
      .as[(Int, Double)].collect()
    assert(segged.nonEmpty)
    segged.foreach { case (np, sc) =>
      assert(np >= 1 && !sc.isNegInfinity && sc < 0.0)
    }
  }

  test("unigramWord: code-point semantics (surrogate pairs are one " +
      "char) and loud failure on an uncoverable word") {
    // a supplementary-plane char must be ONE piece, not two surrogate
    // halves — the SQL oracle's substring counts code points
    val emoji = new String(Character.toChars(0x1F600))
    val v = Map(emoji -> -1.0, "a" -> -2.0, "a" + emoji -> -2.5)
    assert(Tokenize.unigramWord(emoji, v, 4) === ((1, -1.0)))
    assert(Tokenize.unigramWord("a" + emoji, v, 4) === ((1, -2.5)))
    // and vocab built from an emoji corpus covers it as one char
    val docs = Seq((1L, s"a$emoji b")).toDF("doc_id", "text")
    val uv = Tokenize.unigramVocab(docs, "text", topWords = 10,
      topPieces = 5, maxLen = 4)
    assert(uv.contains(emoji))
    // a word outside the vocab's char set fails loudly, not with a
    // sentinel that poisons downstream sums
    intercept[IllegalArgumentException] {
      Tokenize.unigramWord("zzz", Map("a" -> -1.0), 4)
    }
  }

  test("unigramWord equals brute-force enumeration of every " +
      "segmentation on random small words") {
    // the DP's per-position tie-break picks A path; the graded outputs
    // are (pieces, score), which must equal the global optimum:
    // max score (left-to-right IEEE sum), then fewest pieces
    val rng = new scala.util.Random(11)
    val basePieces =
      Seq("a", "b", "c", "ab", "bc", "ca", "abc", "aa", "bb", "cab")
    for (_ <- 1 to 300) {
      val vocab = basePieces
        .filter(p => p.length == 1 || rng.nextBoolean())
        .map(p => p -> Tokenize.quantize20(-0.5 - rng.nextInt(8) * 0.37))
        .toMap
      val w = Seq.fill(1 + rng.nextInt(8))("abc"(rng.nextInt(3))).mkString
      def segs(start: Int): Seq[List[String]] =
        if (start == w.length) Seq(Nil)
        else (1 to math.min(4, w.length - start)).flatMap { l =>
          val p = w.substring(start, start + l)
          if (vocab.contains(p)) segs(start + l).map(p :: _) else Seq.empty
        }
      val scored = segs(0).map(ps =>
        (ps.length, ps.foldLeft(0.0)((acc, p) => acc + vocab(p))))
      assert(scored.nonEmpty, s"'$w' unreachable — singles are in vocab")
      val bestScore = scored.map(_._2).max
      val want = (scored.filter(_._2 == bestScore).map(_._1).min, bestScore)
      assert(Tokenize.unigramWord(w, vocab, 4) === want,
        s"word '$w' vocab $vocab")
    }
  }

  test("r16 guards: duplicate BPE merge pairs and a segment maxLen " +
      "below the longest vocab piece fail NAMED instead of silently") {
    import spark.implicits._
    val docs = Seq("aa bb aa").toDF("text")
    // duplicate pair: toMap would keep the LAST rank, inverting the
    // merge priority relative to the list order
    val e1 = intercept[IllegalArgumentException] {
      Tokenize.bpeEncode(docs, "text",
        Seq(("a", "a"), ("b", "b"), ("a", "a")))
    }
    assert(e1.getMessage.contains("duplicate pairs"), e1.getMessage)
    // a maxLen smaller than the longest trained piece would silently
    // segment against a truncated model
    val vocab = Map("a" -> -1.0, "abcde" -> -0.5)
    val e2 = intercept[IllegalArgumentException] {
      Tokenize.unigramSegment(docs, "text", vocab, maxLen = 4)
    }
    assert(e2.getMessage.contains("longest vocab piece"), e2.getMessage)
  }

  test("r16: incremental bpeTrain merge sequence equals the full-recount " +
      "reference on a mixed-frequency corpus") {
    import spark.implicits._
    // hand-replayable reference: the full recount each round, over the
    // SAME capped word table — pins that the incremental count/index
    // maintenance changes nothing about the chosen merges
    val docs = Seq("banana band ban banana", "band ban ana ana nab",
      "abba abba nab band").toDF("text")
    def reference(nMerges: Int): Seq[(String, String)] = {
      val words = docs.select(explode(split(
          graft.operators.Dedup.normalize(col("text")), " ")).as("w"))
        .filter(col("w") =!= "").groupBy("w").count()
        .collect().map(r => (r.getString(0), r.getLong(1)))
      var syms = words.map { case (w, n) => (w.split("").toSeq, n) }
      val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
      var round = 0
      var go = true
      while (round < nMerges && go) {
        val cnt = scala.collection.mutable.Map[(String, String), Long]()
        syms.foreach { case (s, n) =>
          s.sliding(2).filter(_.size == 2).foreach { p =>
            cnt((p(0), p(1))) = cnt.getOrElse((p(0), p(1)), 0L) + n
          }
        }
        if (cnt.isEmpty) go = false
        else {
          val best = cnt.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
          out += best
          syms = syms.map { case (s, n) =>
            val o = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == best._1 && s(i + 1) == best._2) {
                o += best._1 + best._2; i += 2
              } else { o += s(i); i += 1 }
            }
            (o.toSeq, n)
          }
          round += 1
        }
      }
      out.toSeq
    }
    // ASCII corpus: Java-string tie order == UTF-8 byte order here
    assert(Tokenize.bpeTrain(docs, "text", nMerges = 12) === reference(12))
  }
}
