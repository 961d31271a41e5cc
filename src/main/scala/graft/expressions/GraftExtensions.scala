package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the native expressions: registers
  *   float_vec_dot(a, b)        — codegen'd float-array dot product
  *   word_shingles(text, n)     — distinct word n-grams
  *   simhash64(text)            — 64-bit SimHash
  *   minhash_signature(text, n, numHashes)
  * with the session, so they compose in `spark.sql(...)` exactly like
  * built-ins. Install either at session build time:
  *   SparkSession.builder.withExtensions(new GraftExtensions).…
  * or via `spark.sql.extensions=graft.expressions.GraftExtensions`,
  * or late onto a live session with [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.JaccardPrefilterRule)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def strLit(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private[graft] val definitions: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("float_vec_dot",
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "float_vec_dot(a, b)")
        FloatVecDot(args(0), args(1))
      }),
    ("word_shingles",
      new ExpressionInfo(classOf[WordShinglesExpr].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "word_shingles(text, n)")
        WordShinglesExpr(args(0), intLit(args(1), "n"))
      }),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "simhash64(text)")
        SimHash64Expr(args(0))
      }),
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSignatureExpr].getName,
        "minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.size == 3, "minhash_signature(text, n, numHashes)")
        MinHashSignatureExpr(args(0), intLit(args(1), "n"),
          intLit(args(2), "numHashes"))
      }),
    ("padded_occurrences",
      new ExpressionInfo(classOf[PaddedOccurrencesExpr].getName,
        "padded_occurrences"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "padded_occurrences(text, 'w1,w2,…')")
        PaddedOccurrencesExpr(args(0),
          strLit(args(1), "words").split(",").toSeq.map(_.trim))
      }))

  /** Late registration onto an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    definitions.foreach { case (name, info, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, info,
        builder)
    }
    // keep the late path equivalent to withExtensions: attach the
    // optimizer rule too (experimental hook; guard against re-adding)
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(graft.plans.JaccardPrefilterRule))
      spark.experimental.extraOptimizations =
        extra :+ graft.plans.JaccardPrefilterRule
  }
}
