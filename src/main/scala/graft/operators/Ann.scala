package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate nearest neighbour search over an `Array[Float]` embedding
  * column.
  *
  * Baseline: brute-force cosine top-k (see graft.queries.AnnQueries.e01 —
  * broadcast queries × candidates, exact-decimal dot products).
  *
  * Scale path: random-hyperplane LSH (Charikar 2002). Each of `tables`
  * hash tables projects the vector onto `bits` seeded Gaussian hyperplanes
  * and packs the signs into a bucket key; a vector lands in `tables` buckets
  * total. Similar vectors (small angle) collide with probability
  * (1 − θ/π)^bits per table, OR-amplified across tables.
  *
  * 100 TB design: candidates come from ONE equi-join on (table, bucket) —
  * the all-pairs space is never formed. Hyperplanes are tiny literal
  * arrays compiled into the plan (no broadcast variables needed), the
  * projection is a codegen'd higher-order-function fold, and the final
  * top-k is a per-query-partition window over bucket-colliding rows only.
  * Recall tunes with (bits ↓, tables ↑) at higher join fan-out cost.
  */
object Ann {

  /** Deterministic seeded Gaussian hyperplanes (dim × bits per table). */
  private[operators] def hyperplanes(dim: Int, bits: Int, table: Int,
                                     seed: Long): Seq[Seq[Double]] = {
    val rng = new java.util.Random(seed * 7919L + table)
    Seq.fill(bits)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Dot product of the embedding with a literal plane — a native
    * codegen'd expression (graft.expressions.FloatVecDotConst). */
  private def dotLit(vec: Column, plane: Seq[Double]): Column =
    graft.expressions.VectorExpressions.dotConst(vec, plane)

  /** Bucket key for one table: sign bits packed into a Long. */
  def bucketKey(vec: Column, dim: Int, bits: Int, table: Int,
                seed: Long): Column =
    hyperplanes(dim, bits, table, seed).zipWithIndex
      .map { case (p, k) =>
        when(dotLit(vec, p) > 0, lit(1L << k)).otherwise(lit(0L))
      }
      .reduce((a, b) => a.bitwiseOR(b))

  /** (id, table, bucket) rows — `tables` rows per vector. */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                 bits: Int, tables: Int, seed: Long): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      posexplode(array((0 until tables).map(t =>
        bucketKey(col(vecCol), dim, bits, t, seed)): _*)))
      .withColumnsRenamed(Map("pos" -> "table", "col" -> "bucket"))

  /** Exact cosine in plain doubles over float arrays — native codegen'd
    * dot products (the cross-engine hash-checkable decimal variant lives
    * in AnnQueries.cosineExact). */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.cosineF(a, b)

  /** LSH-bucketed approximate top-k: for each query vector, the k most
    * cosine-similar candidates among bucket collisions. */
  def annTopK(queries: DataFrame, cand: DataFrame, idCol: String,
              vecCol: String, dim: Int, k: Int, bits: Int = 12,
              tables: Int = 6, seed: Long = 42L): DataFrame = {
    val qb = lshBuckets(queries, idCol, vecCol, dim, bits, tables, seed)
      .withColumnsRenamed(Map("id" -> "qid", "vec" -> "qe"))
    val cb = lshBuckets(cand, idCol, vecCol, dim, bits, tables, seed)
      .withColumnsRenamed(Map("id" -> "cid", "vec" -> "ce"))
    // score BEFORE the cross-table dedup: cos is functionally dependent
    // on (qid, cid), so distinct over (qid, cid, cos) keeps the same
    // pairs while shuffling three scalars instead of two dim-length
    // arrays per row — the multi-table collision dedup is the widest
    // shuffle in this plan at scale. Re-scoring a duplicate collision is
    // one codegen'd dot product; shuffling its vectors is ~dim×8 bytes.
    val pairs = qb.join(cb, Seq("table", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        cosine(col("qe"), col("ce")).cast("float").as("cos"))
      .distinct()
    val win = Window.partitionBy("qid").orderBy(desc("cos"), col("cid"))
    pairs.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= k)
  }

  /** IVF coarse quantizer: assign a vector to the centroid with the
    * largest dot product — a deterministic argmax over `cents.size`
    * literal codegen'd dot products (ties break toward the higher cell
    * via the struct comparison). */
  def cellFor(vec: Column, cents: Seq[Seq[Double]]): Column = {
    val scored = cents.zipWithIndex.map { case (p, i) =>
      struct(dotLit(vec, p).as("score"), lit(i).as("cell"))
    }
    greatest(scored: _*).getField("cell")
  }

  /** Seeded Gaussian-direction centroids — the k-means INIT (and the
    * pre-round-3 assignment when `lloydIters = 0`). */
  private[operators] def seedCentroids(dim: Int, nCells: Int,
                                       seed: Long): Seq[Seq[Double]] =
    (0 until nCells).map(c =>
      normalize(hyperplanes(dim, 1, c, seed * 31L + 17L).head))

  private def normalize(c: Seq[Double]): Seq[Double] = {
    val n = math.sqrt(c.map(x => x * x).sum)
    if (n == 0.0) c else c.map(_ / n)
  }

  /** Spherical k-means (Lloyd) refinement of the seeded centroids over
    * `data`, run for `iters` assign→mean rounds.
    *
    * Each round is ONE distributed job: assign every vector to its cell
    * (argmax of literal dot products, codegen'd), explode components, and
    * take the per-(cell, component) mean with order-independent
    * exact-decimal sums — so the centroids are bit-stable under any
    * repartitioning, keeping e04's output deterministic across runs.
    * Only k×dim aggregated scalars reach the driver (never data rows);
    * they re-enter the next round's plan as literals. Empty cells keep
    * their previous centroid. */
  def kmeansCentroids(data: DataFrame, vecCol: String, dim: Int,
                      nCells: Int, iters: Int = 1,
                      seed: Long = 42L): Seq[Seq[Double]] = {
    import graft.util.Tables.dsum
    var cents = seedCentroids(dim, nCells, seed)
    for (_ <- 0 until iters) {
      val means = data
        .select(cellFor(col(vecCol), cents).as("cell"),
          posexplode(col(vecCol)))
        .groupBy("cell", "pos")
        .agg((dsum(col("col").cast("double")) / count(lit(1))).as("m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (prev, cIdx) =>
        byCell.get(cIdx) match {
          case Some(rows) =>
            val m = Array.fill(dim)(0.0)
            rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
            normalize(m.toSeq)
          case None => prev
        }
      }
    }
    cents
  }

  /** IVF-bucketed approximate top-k: centroids are spherical-k-means
    * refined (`lloydIters` Lloyd rounds over the candidate corpus, seeded
    * deterministic init), then both sides get their cell from the same
    * literal centroids and only same-cell pairs are scored — one
    * equi-join, never all-pairs. */
  def ivfTopK(queries: DataFrame, cand: DataFrame, idCol: String,
              vecCol: String, dim: Int, k: Int, nCells: Int = 16,
              seed: Long = 42L, lloydIters: Int = 1): DataFrame = {
    val cents =
      if (lloydIters <= 0) seedCentroids(dim, nCells, seed)
      else kmeansCentroids(cand.select(col(vecCol)), vecCol, dim, nCells,
        lloydIters, seed)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qe"),
      cellFor(col(vecCol), cents).as("cell"))
    val c = cand.select(col(idCol).as("cid"), col(vecCol).as("ce"),
      cellFor(col(vecCol), cents).as("cell"))
    val pairs = q.join(c, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        cosine(col("qe"), col("ce")).cast("float").as("cos"))
    val win = Window.partitionBy("qid").orderBy(desc("cos"), col("cid"))
    pairs.withColumn("rk", row_number().over(win)).filter(col("rk") <= k)
  }
}
