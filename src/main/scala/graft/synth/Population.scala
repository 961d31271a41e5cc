package graft.synth

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic population generation (SURVEY.md §2.9 G1–G3, S1), mirroring
  * the reference's Monte-Carlo populations:
  *  - cell 2 (`ipynb:138-168`): x ~ N(2,1), y = 3 + 0.7(x−2) + η with
  *    η ~ N(0, √(1−0.7²)) so Var(y)=1 and E[y]=3; threshold indicators.
  *  - cell 7 (`ipynb:574-601`): adds z ~ Bernoulli(0.5) and a 4-way
  *    stratum from (x, z).
  *  - cell 18 (`ipynb:1243-1294`): NMAR — B-selection propensity
  *    depends on y itself via a logistic in gamma.
  *
  * Built on `spark.range` + PARTITION-INVARIANT hash-derived variates:
  * uniforms are 53-bit mantissas of `xxhash64(id, seed)` and normals
  * come from Box–Muller over two such uniforms — pure functions of
  * (id, seed), so the SAME population materializes under any
  * partitioning or AQE re-plan (a `randn(seed)` stream shifts with the
  * physical layout). No driver data; parity with R is distributional
  * (SURVEY.md §7.5 #4).
  */
object Population {

  val rho = 0.7

  /** Seeded uniform in [0,1) as a pure function of the `id` column. */
  private def idUniform(seed: Long): Column =
    shiftrightunsigned(xxhash64(col("id"), lit(seed)), 11)
      .cast("double") / lit(9007199254740992.0) // 2^53

  /** Seeded standard normal via Box–Muller on two id-keyed uniforms
    * (u1 clamped away from 0 so log stays finite — caps |z| ≈ 8.6σ). */
  private def idNormal(seed: Long): Column = {
    val u1 = greatest(idUniform(seed), lit(1.1102230246251565e-16)) // 2^-53
    val u2 = idUniform(seed + 0x9E3779B97F4A7C15L)
    sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
  }

  /** Cell-2 population: id, x_i, y_i, e1_i/x1_i threshold indicators. */
  def cell2(spark: SparkSession, n: Long, seed: Long): DataFrame =
    spark.range(1, n + 1).toDF("id")
      .withColumn("x_i", idNormal(seed) + lit(2.0))
      .withColumn("eta_i", idNormal(seed + 1) * math.sqrt(1 - rho * rho))
      .withColumn("y_i", lit(3.0) + lit(rho) * (col("x_i") - lit(2.0)) + col("eta_i"))
      .withColumn("x1_i", (col("x_i") <= 2.0).cast("int"))
      .withColumn("e1_i", (col("y_i") <= 3.0).cast("int"))
      .drop("eta_i")

  /** Cell-7 stratified population: adds z_i ~ Bern(0.5) and stratum 1–4
    * from the (x≤2, z) grid (`ipynb:577-582`). */
  def cell7(spark: SparkSession, n: Long, seed: Long): DataFrame =
    cell2(spark, n, seed)
      .withColumn("z_i", (idUniform(seed + 2) < 0.5).cast("int"))
      .withColumn("stratum",
        when(col("x_i") <= 2.0 && col("z_i") === 0, 1)
          .when(col("x_i") <= 2.0 && col("z_i") === 1, 2)
          .when(col("x_i") > 2.0 && col("z_i") === 0, 3)
          .otherwise(4))

  /** NMAR selection propensity π_B ∝ logistic(gamma·(y − c)), normalized
    * to a target expected size (`ipynb:1277-1282`). */
  def nmarPropensity(df: DataFrame, gamma: Double, center: Double = 3.0,
                     targetSize: Long = 50000): DataFrame = {
    val raw = lit(1.0) / (lit(1.0) + exp(-lit(gamma) * (col("y_i") - lit(center))))
    val withRaw = df.withColumn("pi_raw", raw)
    // exact-decimal sum (dsum): a plain double sum is accumulation-
    // order-dependent, so the normalizer — and through it every pi_B
    // and any draw comparing a uniform against it — would violate the
    // module's partition-invariance contract (r14 review)
    val sumRow = withRaw.agg(graft.util.Tables.dsum(col("pi_raw"))).head()
    // empty frame (or all-NULL y_i) sums to NULL → a bare NPE on the
    // unbox; and a zero normalizer would divide-by-zero downstream.
    // Name the cause (the NgramLm empty-corpus convention, r15 review).
    require(!sumRow.isNullAt(0),
      "nmarPropensity: no rows with non-NULL y_i to normalize over")
    val sumRaw = sumRow.getDouble(0)
    require(sumRaw > 0.0,
      s"nmarPropensity: propensity normalizer is $sumRaw — need a " +
        "positive sum of raw propensities")
    withRaw.withColumn("pi_B",
      least(col("pi_raw") * (targetSize / sumRaw), lit(1.0))).drop("pi_raw")
  }
}
