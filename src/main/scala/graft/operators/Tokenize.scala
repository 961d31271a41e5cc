package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer application (Wu et al. 2016; the BERT encoding
  * loop): each whitespace word is greedily split into the LONGEST vocab
  * pieces, continuation pieces carrying the `##` prefix; a word with no
  * full tiling becomes `[UNK]`. This is the apply-side of tokenizer
  * training (t18 counts BPE merge candidates; this runs a trained
  * vocab over the corpus).
  *
  * Scale design: the vocab is a task-shared broadcast (one copy per
  * executor, not per row); encoding is a pure per-row function —
  * no shuffle, no state, trivially parallel over 100 TB of text. The
  * greedy loop is O(word-length²) worst case per word (standard for
  * WordPiece), over [[Dedup.normalize]]d whitespace tokens.
  */
object Tokenize {

  val Unk = "[UNK]"

  /** Greedy longest-match tiling of one word; `Seq(Unk)` when some
    * position has no matching piece. */
  def wordpieceWord(word: String, vocab: String => Boolean): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val out = ArrayBuffer[String]()
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found: String = null
      while (end > start && found == null) {
        val raw = word.substring(start, end)
        val piece = if (start > 0) "##" + raw else raw
        if (vocab(piece)) found = piece else end -= 1
      }
      if (found == null) return Seq(Unk)
      out += found
      start = end
    }
    out.toSeq
  }

  /** Encode `textCol` into a pieces array column: normalize, split on
    * whitespace, tile each word. The vocab set rides a broadcast.
    *
    * Deliberately a Scala UDF — the one in this codebase: the tiling
    * loop is imperative string matching against a DATA-DEPENDENT vocab
    * (no expression-tree arithmetic for codegen to fuse), its cost is
    * the loop itself, and the broadcast keeps the vocab off the rows.
    * A native Expression would buy only the Row-conversion overhead at
    * the price of serializing the vocab into every plan copy. */
  def wordpieceEncode(df: DataFrame, textCol: String, vocab: Set[String],
                      out: String = "pieces"): DataFrame = {
    require(vocab.nonEmpty, "empty wordpiece vocab")
    val bc = df.sparkSession.sparkContext.broadcast(vocab)
    val enc = udf { text: String =>
      if (text == null) Seq.empty[String]
      else {
        val v = bc.value
        normalizedWords(text).flatMap(w => wordpieceWord(w, v))
      }
    }
    df.withColumn(out, enc(col(textCol)))
  }

  /** The one word-splitting contract every encode UDF here applies —
    * normalize, split on single spaces, drop empties — in lockstep with
    * the distributed [[Dedup.tokens]] and the SQL oracles' renditions;
    * previously copy-pasted into all three UDF bodies, where a missed
    * edit would fork them silently (r16 review). */
  private def normalizedWords(text: String): Seq[String] =
    Dedup.normalizeString(text).split(" ").toSeq.filter(_.nonEmpty)

  /** Byte-pair-encoding TRAINING (Sennrich et al. 2016; the HF design):
    * ONE distributed pass reduces the corpus to its distinct-word count
    * table (capped at `topWords` by count desc / word asc — web-scale
    * corpora have unbounded tail vocab), then the merge loop runs
    * driver-side over that bounded table: each round takes the most
    * frequent adjacent symbol pair weighted by word frequency (ties to
    * the lexicographically smaller pair under [[utf8Ordering]]) and
    * merges ALL its occurrences left-to-right in every word. No
    * per-round corpus scan — the corpus is touched exactly once, the
    * standard scale shape for tokenizer training.
    *
    * The pair-count table and a pair → word-ids index are maintained
    * INCREMENTALLY: each round re-counts only the words that actually
    * contain the chosen pair (subtract their old adjacencies, add the
    * new), so a round costs O(|distinct pairs| for the argmin +
    * Σ hit-word lengths) instead of the full O(corpus symbols) recount
    * the previous rendition paid per round — at production merge counts
    * (tens of thousands of rounds over a 50k-word table) that recount
    * was ~10⁹ map operations of pure overwork (r16 review). The counts
    * after every round are IDENTICAL to the full recount's, so the
    * merge sequence (and the t20/t21 oracles) is unchanged.
    * Returns the ranked merge list. */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int,
               topWords: Int = 50000): Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges=$nMerges must be >= 1")
    val words = cappedWordCounts(df, textCol, topWords)
    val syms: Array[Array[String]] =
      words.map { case (w, _) => w.split("").filter(_.nonEmpty) }
    val wn: Array[Long] = words.map(_._2)
    val counts = scala.collection.mutable.Map[(String, String), Long]()
    val where =
      scala.collection.mutable.Map[(String, String),
        scala.collection.mutable.Set[Int]]()
    // add (sign = +1) or remove (sign = −1) word wi's adjacencies from
    // the count table and the occurrence index
    def account(wi: Int, sign: Long): Unit = {
      val s = syms(wi)
      val n = wn(wi)
      var i = 0
      while (i + 1 < s.length) {
        val p = (s(i), s(i + 1))
        val nv = counts.getOrElse(p, 0L) + sign * n
        if (nv == 0L) counts.remove(p) else counts(p) = nv
        if (sign > 0L) {
          where.getOrElseUpdate(
            p, scala.collection.mutable.Set[Int]()) += wi
        } else {
          // drop wi now; the add pass re-registers pairs still present
          where.get(p).foreach { ws =>
            ws -= wi
            if (ws.isEmpty) where.remove(p)
          }
        }
        i += 1
      }
    }
    syms.indices.foreach(account(_, 1L))
    val merges = ArrayBuffer[(String, String)]()
    var round = 0
    while (round < nMerges && counts.nonEmpty) {
      // tie-break under utf8Ordering, NOT Java's UTF-16 code-unit
      // order: on ties involving supplementary characters the two
      // orders disagree (surrogates sort below U+E000 in UTF-16 but
      // above in UTF-8 bytes), and the SQL oracle compares strings
      // byte-wise — the unigramVocab rule applied to BPE merges
      val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }(
        Ordering.Tuple3(Ordering.Long, utf8Ordering, utf8Ordering))._1
      merges += best
      val merged = best._1 + best._2
      // per-word merges are independent, so the (unordered) set
      // iteration order cannot affect the resulting counts
      where.getOrElse(best, scala.collection.mutable.Set.empty[Int])
        .toArray.foreach { wi =>
          account(wi, -1L)
          val s = syms(wi)
          val out = ArrayBuffer[String]()
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == best._1 && s(i + 1) == best._2) {
              out += merged; i += 2
            } else { out += s(i); i += 1 }
          }
          syms(wi) = out.toArray
          account(wi, 1L)
        }
      round += 1
    }
    merges.toSeq
  }

  /** BPE encoding of one word against a rank map: start from single
    * characters, repeatedly merge the LOWEST-RANK adjacent pair present
    * (leftmost occurrence) until none applies. One-occurrence-at-a-time
    * equals the all-occurrences-per-round algorithm because a merge can
    * only create pairs involving its own output symbol, whose merges
    * were necessarily learned LATER (higher rank) — so the remaining
    * occurrences of the current lowest-rank pair stay minimal. This is
    * the formulation an ANSI SQL engine can replay one recursion step
    * at a time (t20's oracle). */
  def bpeWord(word: String, rank: Map[(String, String), Int]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var s = word.split("").filter(_.nonEmpty).toVector
    var done = false
    while (!done && s.length > 1) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i + 1 < s.length) {
        rank.get((s(i), s(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestPos = i }
        }
        i += 1
      }
      if (bestPos < 0) done = true
      else s = (s.take(bestPos) :+ (s(bestPos) + s(bestPos + 1))) ++
        s.drop(bestPos + 2)
    }
    s
  }

  /** Encode `textCol` into a BPE-token array column: normalize, split
    * on whitespace, [[bpeWord]] each word against the broadcast ranked
    * merge list. Same Scala-UDF rationale as [[wordpieceEncode]]. */
  def bpeEncode(df: DataFrame, textCol: String,
                merges: Seq[(String, String)],
                out: String = "bpe"): DataFrame = {
    require(merges.nonEmpty, "empty BPE merge list")
    // a duplicated pair would keep its LAST rank through toMap —
    // silently inverting merge priority relative to the list order
    // (and diverging from a SQL oracle taking the MIN rank); a trained
    // list can't contain duplicates, so one in a hand-authored list is
    // an error worth naming (r16 review)
    require(merges.distinct.size == merges.size,
      s"duplicate pairs in the BPE merge list: " +
        merges.diff(merges.distinct).distinct.mkString(", "))
    val rank = merges.zipWithIndex.toMap
    val bc = df.sparkSession.sparkContext.broadcast(rank)
    val enc = udf { text: String =>
      if (text == null) Seq.empty[String]
      else normalizedWords(text).flatMap(w => bpeWord(w, bc.value))
    }
    df.withColumn(out, enc(col(textCol)))
  }

  /** The capped distinct-word count table every tokenizer trainer here
    * starts from: ONE distributed pass over the normalized corpus to
    * (word, count), kept to the `topWords` most frequent (count desc,
    * word asc) — web-scale corpora have unbounded tail vocab. Shared by
    * [[bpeTrain]], [[corpusVocab]], and [[unigramVocab]] so the
    * normalization/tie-break contract their oracles replay has ONE
    * definition. */
  private[operators] def cappedWordCounts(df: DataFrame, textCol: String,
                                          topWords: Int)
      : Array[(String, Long)] =
    df.select(explode(Dedup.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(topWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /** Binary UTF-8 byte order — the collation BOTH engines use for the
    * distributed sorts (Spark's UTF8String compare, DuckDB's default),
    * unlike Java's UTF-16 code-unit `String` ordering, which ranks
    * supplementary-plane characters differently. Driver-side tie-break
    * sorts must use this to match their SQL renditions. */
  private val utf8ByteOrdering: Ordering[Array[Byte]] =
    new Ordering[Array[Byte]] {
      def compare(x: Array[Byte], y: Array[Byte]): Int = {
        var i = 0
        while (i < x.length && i < y.length) {
          val c = (x(i) & 0xff) - (y(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        x.length - y.length
      }
    }

  private val utf8Ordering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int =
      utf8ByteOrdering.compare(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
  }

  /** The string's Unicode code points, each as its own String — the
    * character unit DuckDB's `substring`/`length` (and Spark SQL's,
    * via UTF8String) count, unlike Java's UTF-16 `String.substring`,
    * which would split a supplementary-plane character into surrogate
    * halves and silently diverge from the SQL oracle. */
  private def codePoints(s: String): Array[String] = {
    val out = ArrayBuffer[String]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Unigram-LM vocabulary with quantized log-probabilities (the
    * SentencePiece model family, Kudo 2018 §3 — simplified to a
    * frequency-derived piece distribution instead of EM, which keeps
    * every step deterministic and ANSI-replayable):
    *
    *  - candidate pieces = every substring of length 1..`maxLen` of the
    *    `topWords` capped word-count table (counts weighted by word
    *    frequency, every start position counted);
    *  - vocab = ALL length-1 pieces (every character observed anywhere
    *    in the normalized corpus — full coverage; characters outside
    *    the capped table get count 1) plus the `topPieces` most
    *    frequent multi-character pieces (count desc, piece asc);
    *  - logp(piece) = ln(count / total) over the vocab's own counts,
    *    quantized at 2⁻²⁰ — ln is not correctly rounded cross-engine,
    *    the quantum absorbs that (the m06 convention).
    *
    * Characters mean Unicode CODE POINTS throughout (the distributed
    * char pass is [[distinctChars]], the driver loop [[codePoints]]),
    * matching the oracle's semantics for any input, surrogate pairs
    * included. Scale shape: ONE distributed word-count pass (the same
    * capped table BPE training uses) + one bounded distinct-char pass;
    * the substring loop runs driver-side over ≤ topWords rows. */
  def unigramVocab(df: DataFrame, textCol: String, topWords: Int = 50000,
                   topPieces: Int = 400, maxLen: Int = 4)
      : Map[String, Double] = {
    val words = cappedWordCounts(df, textCol, topWords)
    val chars = distinctChars(df, textCol)
    val cnt = scala.collection.mutable.Map[String, Long]()
    words.foreach { case (w, n) =>
      val cps = codePoints(w)
      var i = 0
      while (i < cps.length) {
        var l = 1
        while (l <= maxLen && i + l <= cps.length) {
          val p = cps.slice(i, i + l).mkString
          cnt(p) = cnt.getOrElse(p, 0L) + n
          l += 1
        }
        i += 1
      }
    }
    // precompute the UTF-8 sort keys: utf8Ordering allocates two byte
    // arrays PER COMPARISON, and this sort runs over every distinct
    // piece (up to millions at default caps) to keep topPieces rows
    // (r16 review)
    val multi = cnt.toSeq
      .filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
      .map { case (p, n) => (p, n, p.getBytes("UTF-8")) }
      .sortBy { case (_, n, b) => (-n, b) }(
        Ordering.Tuple2(Ordering.Long, utf8ByteOrdering))
      .take(topPieces)
      .map { case (p, n, _) => (p, n) }
    val singles = chars.map(c => c -> cnt.getOrElse(c, 1L))
    val vocab = (singles ++ multi).toMap
    val total = vocab.values.sum.toDouble
    vocab.map { case (p, n) =>
      p -> quantize20(math.log(n.toDouble / total))
    }
  }

  /** floor(x·2²⁰ + 0.5) / 2²⁰ — the shared logp/score quantum. */
  def quantize20(x: Double): Double =
    math.floor(x * 1048576.0 + 0.5) / 1048576.0

  /** Viterbi segmentation of one word under a unigram-LM vocab:
    * dp[i] = best (score, pieces) over dp[i−l] + logp(word[i−l..i]) for
    * l = 1..maxLen, chosen by score DESC (IEEE double compare), then
    * FEWER pieces, then SHORTER final piece — a total order, so the
    * same DP replays in any engine computing the same doubles (scores
    * accumulate left-to-right along the chosen path; logp values are
    * pre-quantized). Positions are Unicode CODE POINTS ([[codePoints]])
    * to match SQL substring semantics. A word the vocab cannot cover
    * fails LOUDLY — silently returning a sentinel would let a
    * foreign-corpus vocab poison downstream sums by Int.MaxValue per
    * word ([[unigramVocab]] over the same corpus guarantees coverage).
    * Returns (nPieces, score). */
  def unigramWord(word: String, logp: Map[String, Double],
                  maxLen: Int): (Int, Double) = {
    val cps = codePoints(word)
    val L = cps.length
    val score = new Array[Double](L + 1)
    val np = new Array[Int](L + 1)
    var i = 1
    while (i <= L) {
      var bestS = Double.NegativeInfinity
      var bestN = Int.MaxValue
      var found = false
      var l = 1
      while (l <= maxLen && l <= i) {
        logp.get(cps.slice(i - l, i).mkString).foreach { lp =>
          // previous position must itself be reachable
          if (!score(i - l).isNegInfinity) {
            val s = score(i - l) + lp
            val n = np(i - l) + 1
            if (!found || s > bestS || (s == bestS && n < bestN)) {
              bestS = s; bestN = n; found = true
            }
          }
        }
        l += 1
      }
      score(i) = if (found) bestS else Double.NegativeInfinity
      np(i) = if (found) bestN else Int.MaxValue
      i += 1
    }
    require(L == 0 || !score(L).isNegInfinity,
      s"word '$word' is not coverable by this vocab — the vocab must " +
        "come from unigramVocab over the same (or a superset) corpus")
    (np(L), score(L))
  }

  /** Segment `textCol` under a broadcast unigram vocab: one
    * (nPieces, score) struct per word, in word order. Same Scala-UDF
    * rationale as [[wordpieceEncode]] — data-dependent broadcast vocab,
    * imperative DP, no expression-tree equivalent. */
  def unigramSegment(df: DataFrame, textCol: String,
                     logp: Map[String, Double], maxLen: Int = 4,
                     out: String = "seg"): DataFrame = {
    require(logp.nonEmpty, "empty unigram vocab")
    // nothing else ties this maxLen to the one the vocab was TRAINED
    // with, and a smaller value silently segments against a truncated
    // model (length-maxLen+ pieces carry probability mass the DP can
    // never match). maxLen ≥ the longest vocab piece is exactly the
    // condition that makes the DP complete — larger is harmless, the
    // extra lengths just miss the map (r16 review).
    val maxPiece =
      logp.keysIterator.map(p => p.codePointCount(0, p.length)).max
    require(maxLen >= maxPiece,
      s"maxLen=$maxLen is smaller than the longest vocab piece " +
        s"($maxPiece code points) — pieces the model carries mass for " +
        "could never match; pass the training maxLen")
    val bc = df.sparkSession.sparkContext.broadcast(logp)
    val enc = udf { text: String =>
      if (text == null) Seq.empty[(Int, Double)]
      else normalizedWords(text).map(w => unigramWord(w, bc.value, maxLen))
    }
    df.withColumn(out, enc(col(textCol)))
  }

  /** The distinct code points of the normalized corpus — ONE
    * definition for the coverage passes of [[unigramVocab]] and
    * [[corpusVocab]] (three split/substring renditions of the same job
    * existed before and had to stay semantically identical by hand —
    * r16 review).
    *
    * split-by-"" yields CODE POINTS, not UTF-16 units: since Java 8 a
    * zero-width regex split never lands inside a surrogate pair
    * (JDK-6695369), and Spark's split() rides the same regex engine,
    * so "𝄞".split("") is ONE element. DuckDB's
    * string_split('') is likewise per-code-point, so the t19/t20
    * oracles replay the same contract; on the BMP fixtures code
    * points coincide with UTF-16 units anyway, and wordpieceWord's
    * 2-unit Java substrings still match the full code points this
    * emits. (An earlier rendition of this note claimed UTF-16-unit
    * semantics — false since Java 8; corrected in the r15 review.) */
  private def distinctChars(df: DataFrame, textCol: String): Array[String] =
    df.select(explode(Dedup.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .select(explode(split(col("w"), "")).as("c"))
      .filter(col("c") =!= "")
      .distinct()
      .collect().map(_.getString(0))

  /** A deterministic corpus-derived vocab: every character observed in
    * the normalized corpus (plus its `##` continuation form) and the
    * `topWords` most frequent whole words (count desc, word asc
    * tie-break) — the char pieces guarantee full coverage, the word
    * pieces give realistic long matches. Two aggregation jobs.
    *
    * CONTRACT: the corpus must not itself contain '#' — a literal
    * '##'-prefixed corpus word would be indistinguishable from a
    * continuation piece to any consumer keying on the prefix (the t19
    * oracle's continuation test does exactly that). Enforcing it would
    * cost a corpus scan; the normalized fixtures are '#'-free, and at
    * ingest the usual normalization strips punctuation anyway —
    * callers with '#'-bearing corpora must strip it first. */
  def corpusVocab(df: DataFrame, textCol: String,
                  topWords: Int): Set[String] = {
    val words = cappedWordCounts(df, textCol, topWords).map(_._1)
    val chars = distinctChars(df, textCol)
    (chars ++ chars.map("##" + _) ++ words).toSet
  }
}
