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
