package graft.estimators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Samplers
import graft.synth.Population

/** Golden-slice tests (SURVEY.md §7.2): seeded cell-2 population with
  * known true mean 3.0, biased big sample B, SRS probability sample A —
  * a consistent estimator must land near 3.0 while the naive B mean is
  * visibly biased (BASELINE.md Scenario I: naive bias ≈ −0.11, RegDI
  * bias ≈ −0.001, SE ≈ 0.022 at N=100k/1000 reps; single-rep tolerances
  * here are wider).
  */
class EstimatorGoldenSuite extends SparkSpec {

  private val N = 20000L
  private lazy val pop = Population.cell2(spark, N, seed = 4242).cache()

  // biased B: selection favours small y (like the reference's Scenario I
  // where S_B under-covers) — naive mean(B) underestimates 3.0
  private lazy val popB = pop
    .withColumn("u", pmod(hash(col("id")), lit(1000)).cast("double") / 1000.0)
    .withColumn("p_B", when(col("y_i") < 3.0, 0.7).otherwise(0.3))
    .withColumn("in_B", (col("u") < col("p_B")).cast("int"))

  private lazy val dataB = popB.filter(col("in_B") === 1)
    .select("id", "x_i", "y_i")
  private lazy val dataA = Samplers
    .srsExact(pop.select("id", "x_i", "y_i"), 800, seed = 7)
    .withColumn("d_A", lit(N.toDouble / 800))
    .cache()

  test("naive B mean is biased; RegDI correction 1 removes the bias") {
    val naiveB = dataB.agg(avg("y_i")).head().getDouble(0)
    assert(naiveB < 2.95, s"expected visible bias, got $naiveB") // ~2.8

    val res = RegDI.twoSample(dataA, dataB, "id", "id",
      RegDIConfig(yACol = "y_i", yBCol = "y_i", auxVars = Seq("x_i"),
        nTotal = Some(N.toDouble), weightsA = Some("d_A"), correction = 1))
    assert(math.abs(res.mean - 3.0) < 0.1,
      s"RegDI mean ${res.mean} not within 0.1 of 3.0")
    assert(res.variance > 0 && res.variance < 0.01)
  }

  test("RegDI correction 0 equals correction 1 (same calibrated mean path)") {
    def run(c: Int) = RegDI.twoSample(dataA, dataB, "id", "id",
      RegDIConfig(yACol = "y_i", yBCol = "y_i", nTotal = Some(N.toDouble),
        weightsA = Some("d_A"), correction = c))
    assert(math.abs(run(0).mean - run(1).mean) < 1e-9)
  }

  test("RegDI correction 2 (measurement error) recovers despite distorted y_A") {
    // Reference semantics (RegDI2.R:258-265): B carries the truth scale;
    // the survey A measures with linear error. Fit y_A ~ y_B on the
    // overlap, invert A back onto the B scale: estimate ≈ true mean 3.
    val dataAdistorted = dataA.withColumn("y_i", col("y_i") * 1.25 + 0.5)
    val res = RegDI.twoSample(dataAdistorted, dataB, "id", "id",
      RegDIConfig(yACol = "y_i", yBCol = "y_i", auxVars = Seq("x_i"),
        nTotal = Some(N.toDouble), weightsA = Some("d_A"), correction = 2))
    assert(math.abs(res.mean - 3.0) < 0.1,
      s"RegDI-ME mean ${res.mean} not within 0.1 of 3.0")
  }

  // one-table population frame with explicit indicators — the shape the
  // reference uses for every correction-3/scenario-3 call (ipynb cell 23:
  // `data = poblacion, ind_var_A = "muestra_A", ind_var_B = "muestra_B"`)
  private lazy val popOneTable = popB
    .withColumn("in_A", (pmod(hash(col("id") + 17), lit(25)) === 0).cast("int"))
    .select("id", "x_i", "y_i", "in_A", "in_B")
    .cache()

  test("RegDI correction 3 (doubly robust, one-table) with a good outcome model") {
    val res = RegDI.oneTable(popOneTable, "in_A", "in_B",
      RegDIConfig(yACol = "y_i", yBCol = "y_i", auxVars = Seq("x_i"),
        correction = 3,
        outcomeModel = Some("y_i ~ x_i"), evalModelPerformance = true))
    assert(math.abs(res.mean - 3.0) < 0.1, s"DR mean ${res.mean}")
    assert(res.rmse.exists(r => r > 0 && r < 1.5))
    assert(res.r2.exists(r => r > 0.2 && r <= 1.0))
  }

  test("PC scenario 1 calibrated mean corrects the B bias") {
    val res = PC.twoSample(dataA, dataB, "id", "id",
      PCConfig(yACol = Some("y_i"), yBCol = Some("y_i"),
        auxVars = Seq("x_i"), nTotal = Some(N.toDouble),
        weightsA = Some("d_A"), scenario = 1))
    // x-only calibration can't fully fix y-driven selection (NMAR), but
    // must move the estimate toward 3.0 vs the naive ~2.8
    val naiveB = dataB.agg(avg("y_i")).head().getDouble(0)
    assert(math.abs(res.estimator - 3.0) < math.abs(naiveB - 3.0))
    assert(res.se.exists(_ > 0))
  }

  test("PC scenario 2 (B-side proxy, distinct y names — ipynb cell 12 shape)") {
    // B observes only an exact linear proxy tilde_y = 0.8·y + 1; the
    // overlap model y_i ~ tilde_y_i inverts it perfectly, so ŷ_B ≡ y_B
    // and the A-residual term vanishes — the estimator must then equal
    // the plain unweighted B mean EXACTLY (d_B = N/n_B uniform, no aux):
    // a sharp invariant of the scenario-2 combination arithmetic.
    // (The reference itself carries bias here under NMAR — BASELINE.md
    // PC_X1_II bias 0.284 — so unbiasedness is NOT the right assertion.)
    val dataBproxy = dataB
      .withColumn("tilde_y_i", col("y_i") * 0.8 + 1.0)
      .drop("y_i", "x_i")
    val naiveB = dataB.agg(avg("y_i")).head().getDouble(0)
    val res = PC.twoSample(dataA.drop("x_i"), dataBproxy, "id", "id",
      PCConfig(yACol = Some("y_i"), yBCol = Some("tilde_y_i"),
        auxVars = Nil, nTotal = Some(N.toDouble),
        weightsA = Some("d_A"), scenario = 2,
        outcomeModel = Some("y_i ~ tilde_y_i")))
    assert(math.abs(res.estimator - naiveB) < 1e-6,
      s"PC-2 ${res.estimator} should equal naive B mean $naiveB")
  }

  test("PC scenario 3 (DR1, one-table) with a perfect outcome model hits exactly") {
    // y_det is an exact function of x ⇒ residuals vanish ⇒ DR1 equals
    // the true population mean of y_det regardless of selection bias
    val popDet = popOneTable
      .withColumn("y_det", lit(1.0) + lit(2.0) * col("x_i"))
      .withColumn("in_B_det", (col("y_det") < lit(5.0)).cast("int"))
    val trueMean = popDet.agg(avg("y_det")).head().getDouble(0)
    val res = PC.oneTable(popDet, "in_A", "in_B_det",
      PCConfig(yACol = Some("y_det"), yBCol = Some("y_det"),
        auxVars = Seq("x_i"), scenario = 3,
        outcomeModel = Some("y_det ~ x_i"), evalModelPerformance = true))
    assert(math.abs(res.estimator - trueMean) < 1e-6,
      s"DR1 ${res.estimator} vs true $trueMean")
    assert(res.rmse.exists(_ < 1e-9))
    assert(res.r2.exists(r => math.abs(r - 1.0) < 1e-9))
  }

  test("default d = N/n_A (fallback Gram pass) equals explicit uniform weights (fused pass)") {
    // weightsA present ⇒ the calibration Gram fuses into the first pass;
    // absent ⇒ d_i_A depends on n_A and the Gram runs as a second pass.
    // With a uniform weight column equal to N/n_A the two paths see the
    // same addend multiset, so the estimates must agree bitwise — a
    // direct cross-check of the fused vs fallback code paths.
    val n = popOneTable.count().toDouble
    val nA = popOneTable.filter(col("in_A") === 1).count().toDouble
    val withW = popOneTable.withColumn("d_u", lit(n / nA))
    val noW = RegDI.oneTable(popOneTable, "in_A", "in_B",
      RegDIConfig(yACol = "y_i", yBCol = "y_i", auxVars = Seq("x_i"),
        nTotal = Some(n), correction = 1))
    val expW = RegDI.oneTable(withW, "in_A", "in_B",
      RegDIConfig(yACol = "y_i", yBCol = "y_i", auxVars = Seq("x_i"),
        nTotal = Some(n), weightsA = Some("d_u"), correction = 1))
    assert(noW.mean === expW.mean)
    assert(noW.variance === expW.variance)

    val pcNoW = PC.twoSample(dataA.drop("d_A"), dataB, "id", "id",
      PCConfig(yACol = Some("y_i"), yBCol = Some("y_i"),
        auxVars = Seq("x_i"), nTotal = Some(N.toDouble), scenario = 1))
    val nA2 = dataA.count().toDouble
    val pcExpW = PC.twoSample(
      dataA.drop("d_A").withColumn("d_u", lit(N.toDouble / nA2)), dataB,
      "id", "id",
      PCConfig(yACol = Some("y_i"), yBCol = Some("y_i"),
        auxVars = Seq("x_i"), nTotal = Some(N.toDouble),
        weightsA = Some("d_u"), scenario = 1))
    assert(pcNoW.estimator === pcExpW.estimator)
  }

  test("PC logistic model type (one-table) fits a binary outcome under MAR-x") {
    // selection into B depends on x only (MAR) — the regime where the
    // DR1 estimator with a correct-in-x outcome model is consistent
    val popBin = popOneTable
      .withColumn("y_bin", (col("y_i") > 3.0).cast("double"))
      .withColumn("u2", pmod(hash(col("id") * 31), lit(1000)).cast("double") / 1000.0)
      .withColumn("in_B_mar",
        (col("u2") < when(col("x_i") < 2.0, 0.7).otherwise(0.3)).cast("int"))
    val trueP = popBin.agg(avg("y_bin")).head().getDouble(0)
    val res = PC.oneTable(popBin, "in_A", "in_B_mar",
      PCConfig(yACol = Some("y_bin"), yBCol = Some("y_bin"),
        auxVars = Seq("x_i"), scenario = 3, modelType = "logistic",
        outcomeModel = Some("y_bin ~ x_i")))
    assert(math.abs(res.estimator - trueP) < 0.1,
      s"logistic DR1 ${res.estimator} vs true $trueP")
  }
}

class SamplersSuite extends SparkSpec {

  private lazy val pop = Population.cell7(spark, 5000, seed = 1).cache()

  test("srsExact returns exactly n distinct rows") {
    val s = Samplers.srsExact(pop, 250, seed = 5)
    assert(s.count() == 250)
    assert(s.select("id").distinct().count() == 250)
  }

  test("weightedExact: exact n and weight-tilted inclusion") {
    val weighted = pop.withColumn("w",
      when(col("id") <= 500, 50.0).otherwise(1.0))
    val s = Samplers.weightedExact(weighted, col("w"), 400, seed = 5)
    assert(s.count() == 400)
    // heavy ids (w=50, 10% of pop) should dominate the sample
    val heavy = s.filter(col("id") <= 500).count()
    assert(heavy > 200, s"only $heavy heavy rows of 400")
  }

  test("stratifiedExact: per-stratum sizes equal proportional allocation") {
    val total = pop.count().toDouble
    val expected = pop.groupBy("stratum").count().collect()
      .map(r => r.getInt(0) -> math.floor(r.getLong(1) * 500 / total + 0.5).toLong)
      .toMap
    val s = Samplers.stratifiedExact(pop, "stratum", 500, seed = 5)
    val got = s.groupBy("stratum").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("seeded determinism: same seed twice gives the identical sample") {
    val a = Samplers.srsExact(pop, 100, seed = 77).select("id").collect().map(_.getLong(0)).sorted
    val b = Samplers.srsExact(pop, 100, seed = 77).select("id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("mixtureExact: target-driven sizes, clamped to group size, " +
      "absent groups dropped") {
    // strata 1..4 with sizes from cell7; ask for a mix that over-asks one
    // stratum and omits another entirely
    val sizes = pop.groupBy("stratum").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // 0.90 of the FULL population size over-asks stratum 2 for certain
    // (no stratum holds 90% of rows: z_i splits each x-side ~50/50)
    val nTotal = pop.count().toInt
    val targets = Map("1" -> 0.10, "2" -> 0.90, "3" -> 0.05)
    val byStr = pop.withColumn("s", col("stratum").cast("string"))
    val got = Samplers.mixtureExact(byStr, "s", targets, nTotal, seed = 3)
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = targets.map { case (g, f) =>
      g -> math.min(sizes(g.toInt), math.floor(nTotal * f + 0.5).toLong)
    }.filter(_._2 > 0)
    assert(got == expected)
    assert(!got.contains("4"), "stratum absent from targets must be dropped")
    // the over-asked stratum must actually have been clamped for the
    // test to exercise that branch
    assert(expected("2") == sizes(2), "stratum 2 expected to clamp")
  }

  test("splitByHash: disjoint, exhaustive, layout-invariant, no " +
      "example migration across reruns") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s1 = Samplers.splitByHash(pop.repartition(1), splits, seed = 21)
    val s7 = Samplers.splitByHash(pop.repartition(7), splits, seed = 21)
    // exhaustive: every row gets exactly one label
    assert(s1.count() == pop.count())
    assert(s1.filter(col("split").isNull).count() == 0)
    // identical assignment under any physical layout
    assert(s1.exceptAll(s7).isEmpty && s7.exceptAll(s1).isEmpty)
    // proportions near targets (5000 rows: ±5σ bands)
    val n = pop.count().toDouble
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") / n - 0.8) < 0.03, counts.toString)
    assert(math.abs(counts("val") / n - 0.1) < 0.025, counts.toString)
    // no migration: the same id never changes split between reruns
    val again = Samplers.splitByHash(pop, splits, seed = 21)
      .select("id", "split")
    assert(s1.select("id", "split").exceptAll(again).isEmpty)
  }
}
