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
}
