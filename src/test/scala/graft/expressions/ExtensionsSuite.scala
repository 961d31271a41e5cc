package graft.expressions

import graft.SparkSpec

class ExtensionsSuite extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.register(spark)
  }

  test("SQL surface: float_vec_dot") {
    val d = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    d.createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT float_vec_dot(a, b) FROM vecs")
      .head().getDouble(0) === 11.0)
  }

  test("SQL surface: word_shingles / simhash64 / minhash_signature") {
    Seq(("the quick brown fox", 1L)).toDF("text", "id")
      .createOrReplaceTempView("docs")
    val sh = spark.sql("SELECT word_shingles(text, 3) FROM docs")
      .head().getSeq[String](0)
    assert(sh === Seq("the quick brown", "quick brown fox"))
    val h = spark.sql("SELECT simhash64(text) FROM docs").head().getLong(0)
    assert(h === TextOps.simhash64("the quick brown fox"))
    val sig = spark.sql("SELECT minhash_signature(text, 3, 16) FROM docs")
      .head().getSeq[Long](0)
    assert(sig.length === 16)
  }

  test("SQL functions equal their Column-API counterparts") {
    val docs = Seq(("alpha beta gamma delta epsilon", 1L)).toDF("text", "id")
    docs.createOrReplaceTempView("docs2")
    val viaSql = spark.sql("SELECT simhash64(text) FROM docs2").head().getLong(0)
    val viaCol = docs.select(TextExpressions.simhash64($"text"))
      .head().getLong(0)
    assert(viaSql === viaCol)
  }

  test("SQL surface: padded_occurrences") {
    Seq(("The cat and the dog and the bird", 1L)).toDF("text", "id")
      .createOrReplaceTempView("docs3")
    // lowercased scan: 'the' matches 3x ('The' included), 'and' 2x
    assert(spark.sql("SELECT padded_occurrences(text, 'the,and') FROM docs3")
      .head().getLong(0) === 5L)
  }

  test("non-literal n is rejected with a clear error") {
    Seq(("x", 3)).toDF("text", "n").createOrReplaceTempView("bad")
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(text, n) FROM bad").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }

  test("paddedOccurrences lowercases its WORDS along with the text — " +
    "uppercase words silently counted 0 before (r15 review)") {
    import org.apache.spark.sql.functions._
    val df = Seq("The cat and The dog").toDF("text")
    val n = df.select(graft.expressions.TextExpressions
      .paddedOccurrences(col("text"), Seq("The", "AND")).as("n"))
      .head().getLong(0)
    assert(n === 3L) // 2× "the" + 1× "and" in the lowercased text
  }
}
