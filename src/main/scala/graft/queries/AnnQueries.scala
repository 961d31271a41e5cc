package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.util.Tables.load

/** Similarity search over `embeddings.parquet` (Array[Float], dim 64).
  *
  * e01 is the brute-force cosine top-k BASELINE, made hash-checkable
  * against DuckDB by computing every dot product with an exact
  * DECIMAL(38,18) accumulator (exact decimal addition is associative, so
  * Spark's per-row left fold equals DuckDB's unnest+group-by sum bit for
  * bit; the final cos division happens in IEEE doubles in both engines).
  * Ranking ties break on candidate id, so the top-k sets are identical.
  *
  * The 100 TB scale path (LSH-bucketed, never all-pairs) lives in
  * `graft.operators.Ann` with rows-only grading + ScalaTest recall
  * checks, since its hash functions are engine-specific.
  */
object AnnQueries {

  // 30,18: element products are < 10³, so every pairwise '+' stays within
  // precision 31 ≤ 38 — EXACT decimal arithmetic (no per-step rounding,
  // fold order irrelevant), unlike 38,18 where Spark rounds each add.
  private val accType = DecimalType(30, 18)

  /** Exact-decimal dot product of two float arrays, as a double. */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(accType)),
      lit(java.math.BigDecimal.ZERO).cast(accType),
      (acc, x) => (acc + x).cast(accType)).cast("double")

  /** Cosine, emitted as float32: the decimal dot products can differ
    * from another engine's in their final (1e-18) digit because
    * double→decimal rounding is not specified identically everywhere;
    * the float cast absorbs that last-ulp noise deterministically. */
  def cosineExact(a: Column, b: Column): Column =
    (dotExact(a, b) / (sqrt(dotExact(a, a)) * sqrt(dotExact(b, b))))
      .cast("float")

  /** Brute-force cosine top-k of `cand` for each row of `queries`.
    *
    * The self-norms are computed ONCE per row on each side before the
    * cross join (not per pair inside it): the pair space only pays one
    * decimal dot product instead of three. Same IEEE operation tree per
    * value as the inlined `cosineExact`, so the output is bit-identical
    * — at |Q|·|C| pairs this is the difference between O(|Q|·|C|) and
    * O(3·|Q|·|C|) interpreted decimal folds. */
  /** Projection barrier: CollapseProject would otherwise inline a
    * once-per-row norm back into the per-pair projection after the join
    * (recomputing it |Q| or |C| times); a Generate node is opaque to
    * project collapsing, so the value is materialized exactly once per
    * input row. explode(array(x)) is 1-row-in → 1-row-out. */
  private def perRow(df: DataFrame, named: Column, name: String): DataFrame =
    df.select(df.columns.map(col) :+ explode(array(named)).as(name): _*)

  def bruteForceTopK(queries: DataFrame, cand: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = perRow(queries.select(col("vec_id").as("qid"), col("embedding").as("qe")),
      sqrt(dotExact(col("qe"), col("qe"))), "nq")
    val c = perRow(cand.select(col("vec_id").as("cid"), col("embedding").as("ce")),
      sqrt(dotExact(col("ce"), col("ce"))), "nc")
    val pairs = broadcast(q).crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (dotExact(col("qe"), col("ce")) / (col("nq") * col("nc")))
          .cast("float").as("cos"))
    val win = Window.partitionBy("qid").orderBy(desc("cos"), col("cid"))
    pairs.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= k)
      .orderBy("qid", "rk")
  }

  val qs: Seq[Q] = Seq(
    Q("e01_cosine_topk",
      (s, d) => {
        val emb = load(s, d, "embeddings")
        bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe
                         FROM embeddings WHERE vec_id < 10),
                   c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
                   el AS (SELECT qid, cid,
                            CAST(CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) AS DECIMAL(38,18)) AS p,
                            CAST(CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE) AS DECIMAL(38,18)) AS pq,
                            CAST(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) AS DECIMAL(38,18)) AS pc
                          FROM q CROSS JOIN c, generate_series(1, 64) AS t(i)
                          WHERE qid <> cid),
                   dots AS (SELECT qid, cid,
                              CAST(sum(p) AS DOUBLE) AS dot,
                              CAST(sum(pq) AS DOUBLE) AS nq,
                              CAST(sum(pc) AS DOUBLE) AS nc
                            FROM el GROUP BY qid, cid),
                   sims AS (SELECT qid, cid,
                              CAST(dot / (sqrt(nq) * sqrt(nc)) AS FLOAT) AS cos
                            FROM dots),
                   ranked AS (SELECT qid, cid, cos,
                                CAST(row_number() OVER
                                  (PARTITION BY qid ORDER BY cos DESC, cid) AS INT) AS rk
                              FROM sims)
              SELECT qid, cid, cos, rk FROM ranked WHERE rk <= 5
              ORDER BY qid, rk""")),

    // ---- E5 per-label embedding centroids (vector aggregation) --------
    // Class centroids / domain means over an embedding column — the
    // aggregation half of k-means and the lookup table for centroid-
    // based routing. posexplode → groupBy (label, dim): map-side partial
    // aggs, one shuffle of (labels × dim) keys, never a per-label
    // collect. Means use the exact-decimal numerator (dmean) so the
    // doubles are bit-identical cross-engine.
    Q("e05_label_centroids",
      (s, d) => load(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos").as("idx"))
        .agg(graft.util.Tables.dmean(col("col").cast("double")).as("centroid"))
        .orderBy("label", "idx"),
      Some(s"""WITH f AS (SELECT label,
                   unnest(generate_series(0, len(embedding) - 1)) AS idx,
                   unnest(embedding) AS v
                 FROM embeddings)
               SELECT label, idx,
                      ${graft.util.Tables.sqlDmean("CAST(v AS DOUBLE)")} AS centroid
               FROM f GROUP BY label, idx ORDER BY label, idx"""))
  )
}
