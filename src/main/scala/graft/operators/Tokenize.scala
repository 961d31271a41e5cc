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
        Dedup.normalizeString(text).split(" ").toSeq
          .filter(_.nonEmpty).flatMap(w => wordpieceWord(w, v))
      }
    }
    df.withColumn(out, enc(col(textCol)))
  }

  /** Byte-pair-encoding TRAINING (Sennrich et al. 2016; the HF design):
    * ONE distributed pass reduces the corpus to its distinct-word count
    * table (capped at `topWords` by count desc / word asc — web-scale
    * corpora have unbounded tail vocab), then the merge loop runs
    * driver-side over that bounded table: each round counts adjacent
    * symbol pairs weighted by word frequency, takes the most frequent
    * (ties to the lexicographically smaller pair), and merges ALL its
    * occurrences left-to-right in every word. No per-round corpus scan
    * — the corpus is touched exactly once, the standard scale shape for
    * tokenizer training. Returns the ranked merge list. */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int,
               topWords: Int = 50000): Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges=$nMerges must be >= 1")
    val words = df.select(
        explode(Dedup.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(topWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var syms: Array[(Array[String], Long)] =
      words.map { case (w, n) => (w.split("").filter(_.nonEmpty), n) }
    val merges = ArrayBuffer[(String, String)]()
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      syms.foreach { case (s, n) =>
        var i = 0
        while (i + 1 < s.length) {
          val p = (s(i), s(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val merged = best._1 + best._2
        syms = syms.map { case (s, n) =>
          // fast path: words not containing the pair keep their array
          // untouched — at production merge counts (tens of thousands)
          // rebuilding every word every round is the dominant cost
          var hit = false
          var j = 0
          while (!hit && j + 1 < s.length) {
            hit = s(j) == best._1 && s(j + 1) == best._2
            j += 1
          }
          if (!hit) (s, n)
          else {
            val out = ArrayBuffer[String]()
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == best._1 && s(i + 1) == best._2) {
                out += merged; i += 2
              } else { out += s(i); i += 1 }
            }
            (out.toArray, n)
          }
        }
        round += 1
      }
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
    val rank = merges.zipWithIndex.toMap
    val bc = df.sparkSession.sparkContext.broadcast(rank)
    val enc = udf { text: String =>
      if (text == null) Seq.empty[String]
      else Dedup.normalizeString(text).split(" ").toSeq
        .filter(_.nonEmpty).flatMap(w => bpeWord(w, bc.value))
    }
    df.withColumn(out, enc(col(textCol)))
  }

  /** A deterministic corpus-derived vocab: every character observed in
    * the normalized corpus (plus its `##` continuation form) and the
    * `topWords` most frequent whole words (count desc, word asc
    * tie-break) — the char pieces guarantee full coverage, the word
    * pieces give realistic long matches. Two aggregation jobs. */
  def corpusVocab(df: DataFrame, textCol: String,
                  topWords: Int): Set[String] = {
    val toks = df.select(
      explode(Dedup.tokens(col(textCol))).as("w")).filter(col("w") =!= "")
    val words = toks.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(topWords)
      .collect().map(_.getString(0))
    val chars = toks
      .select(explode(split(col("w"), "")).as("c"))
      .filter(col("c") =!= "")
      .distinct()
      .collect().map(_.getString(0))
    (chars ++ chars.map("##" + _) ++ words).toSet
  }
}
