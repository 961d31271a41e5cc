package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DataFrame-level text-pipeline operators a large-scale training-data
  * pipeline needs beyond per-column text functions: term importance,
  * benchmark decontamination, and sequence packing.
  *
  * Scale notes (the 100 TB contract for each op):
  *  - [[topTermsByRarity]]: ONE corpus scan. The obvious formulation
  *    (tf frame feeding both a document-frequency aggregate and the
  *    top-k join) recomputes the corpus explode + partial agg twice —
  *    Spark's exchange reuse does NOT fire across the two branches
  *    (verified in PlanSuite), and at 100 TB the duplicated scan is the
  *    dominant cost. Instead df rides a tok-partitioned window over the
  *    already-aggregated tf frame: three narrow shuffles of the
  *    (doc, token) frame, no join, no recomputation, no global sort.
  *  - [[decontaminate]]: benchmark suites are tiny next to the corpus
  *    (≤ ~10⁶ n-grams), so the collision join broadcasts the benchmark
  *    shingle set; the corpus side is explode → broadcast-join →
  *    one partial-agged groupBy(doc). The corpus is never shuffled on
  *    the shingle key and the pair space is never materialized.
  *  - [[packSequences]]: the running token sum windows over
  *    (partition keys) — parallelism = #groups (language × source in
  *    the catalog query), each group streams through one task sorted
  *    by doc id. Packing is greedy-contiguous BY DESIGN: deterministic,
  *    one shuffle, no driver loop. Docs longer than the budget still get
  *    a bin (alone, over-budget) rather than being dropped silently.
  */
object TextPipeline {

  /** Per-document top-k terms ranked rarest-first: ORDER BY document
    * frequency ASC, term frequency DESC, token ASC. This is TF-IDF's
    * ranking with the log removed — for a FIXED document the idf
    * ln(N/df) is monotone decreasing in df, so ranking by (df ASC,
    * tf DESC) preserves the classic ordering wherever one factor
    * dominates, while staying in integer arithmetic (bit-identical
    * across engines; ln is not). Output: (idCol, rnk, tok, tf, df).
    */
  def topTermsByRarity(docs: DataFrame, idCol: String, textCol: String,
                       k: Int): DataFrame = {
    val flat = docs.select(col(idCol),
      explode(Dedup.tokens(col(textCol))).as("tok"))
    val tf = flat.groupBy(idCol, "tok").agg(count(lit(1)).as("tf"))
    // (doc, tok) is unique after the tf groupBy, so df = partition row
    // count in a tok-partitioned window — keeps the plan one lineage
    // (a second aggregate branch would recompute the corpus scan; see
    // the object scaladoc)
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy("tok")))
    val win = Window.partitionBy(idCol)
      .orderBy(col("df").asc, col("tf").desc, col("tok").asc)
    withDf
      .withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("tok"), col("tf"), col("df"))
  }

  /** Test-set decontamination profile: for every candidate document,
    * how many of its distinct word `n`-gram shingles also occur anywhere
    * in the benchmark corpus. Returns every candidate row:
    * (idCol, n_shingles, n_hit, contaminated) — callers drop or down-
    * weight `contaminated` docs before training. Shingling reuses the
    * native one-pass [[Dedup.wordShingles]] expression.
    */
  def decontaminate(candidates: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String, n: Int): DataFrame = {
    val benchGrams = benchmark
      .select(explode(Dedup.wordShingles(col(textCol), n)).as("gram"))
      .distinct()
    val candGrams = candidates.select(col(idCol),
      explode(Dedup.wordShingles(col(textCol), n)).as("gram"))
    val hits = candGrams
      .join(broadcast(benchGrams.withColumn("__hit", lit(1))),
        Seq("gram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hit"))
    hits.withColumn("contaminated", (col("n_hit") > 0).cast("int"))
  }

  /** Greedy-contiguous sequence packing: within each group (e.g. a
    * language/source shard), documents are taken in `orderCol` order and
    * a document opens a new bin exactly when the tokens BEFORE it already
    * fill a whole number of budgets — bin = floor((running_sum − n_tok)
    * / budget). Bins can overflow by at most one document (the straddler
    * stays in the bin it started in), the standard best-effort packing
    * semantics for training-sequence assembly; exact-capacity packing is
    * inherently sequential and would serialize the corpus.
    * Output: input columns + (n_tok, bin_id). */
  def packSequences(docs: DataFrame, groupCols: Seq[String],
                    orderCol: String, textCol: String,
                    budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val win = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("n_tok", TextFunctions.tokenCount(col(textCol)))
      .withColumn("__cum", sum(col("n_tok")).over(win))
      .withColumn("bin_id",
        floor((col("__cum") - col("n_tok")) / budget).cast("long"))
      .drop("__cum")
  }
}
