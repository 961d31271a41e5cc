package graft.stats

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.SurveyDesign

class RatioDomainSuite extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (10.0, 2.0, 1.0),
    (20.0, 4.0, 2.0),
    (30.0, 5.0, 1.0),
    (40.0, 9.0, 2.0)
  ).toDF("y", "x", "w")
  private lazy val design = SurveyDesign(df, "w")

  test("svyratio matches the hand-computed ratio and variance") {
    // Σwy = 10+40+30+80 = 160 ; Σwx = 2+8+5+18 = 33 ; R = 160/33
    val r = WeightedStats.svyratio(design, "y", "x")
    val rHat = 160.0 / 33.0
    assert(r.ratio === rHat)
    val z = Seq((10.0, 2.0, 1.0), (20.0, 4.0, 2.0), (30.0, 5.0, 1.0), (40.0, 9.0, 2.0))
      .map { case (y, x, w) => w * (y - rHat * x) / 33.0 }
    val n = 4.0
    val expect = n / (n - 1.0) *
      (z.map(v => v * v).sum - math.pow(z.sum, 2) / n)
    assert(math.abs(r.variance - expect) < 1e-8)
  }

  test("svyratio against a unit denominator reduces to svymean") {
    val withOne = df.withColumn("one", lit(1.0))
    val r = WeightedStats.svyratio(SurveyDesign(withOne, "w"), "y", "one")
    val m = WeightedStats.svymean(design, "y")
    assert(r.ratio === m.mean) // bit-identical: same score expression
    assert(r.variance === m.variance)
  }

  test("svymeanDomain on the full domain reduces to svymean") {
    val dres = WeightedStats.svymeanDomain(design, "y", lit(true))
    val m = WeightedStats.svymean(design, "y")
    assert(dres.mean === m.mean)
    assert(dres.variance === m.variance)
  }

  test("svymeanDomain keeps the realized-domain-size variance") {
    // domain = y >= 30: μ_D = (30 + 80) / (1 + 2) = 110/3
    val dres = WeightedStats.svymeanDomain(design, "y", col("y") >= 30.0)
    assert(dres.mean === 110.0 / 3.0)
    // filtering first drops the two zero scores AND shrinks n: variance
    // differs (and here understates — 2 zero scores widen the spread)
    val filtered = WeightedStats.svymean(
      SurveyDesign(df.filter(col("y") >= 30.0), "w"), "y")
    assert(dres.mean === filtered.mean)
    assert(dres.variance !== filtered.variance)
    val z = Seq(0.0, 0.0, 1.0 * (30.0 - 110.0 / 3.0) / 3.0, 2.0 * (40.0 - 110.0 / 3.0) / 3.0)
    val n = 4.0
    val expect = n / (n - 1.0) * (z.map(v => v * v).sum - math.pow(z.sum, 2) / n)
    assert(math.abs(dres.variance - expect) < 1e-8)
  }

  test("svybyMean per group equals svymeanDomain of that group bit-exactly") {
    val withG = df.withColumn("g", col("x").cast("long") % 2)
    val design2 = SurveyDesign(withG, "w")
    val by = WeightedStats.svybyMean(design2, "y", "g")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    for (g <- Seq(0L, 1L)) {
      val dom = WeightedStats.svymeanDomain(design2, "y",
        col("g") === g)
      assert(by(g)._1 === dom.mean)
      assert(by(g)._2 === dom.variance)
    }
  }

  test("an empty domain fails loudly") {
    val e = intercept[IllegalArgumentException] {
      WeightedStats.svymeanDomain(design, "y", lit(false))
    }
    assert(e.getMessage.contains("empty estimation domain"))
  }

  test("svymean variance survives large n (the z-score DECIMAL(38,10) " +
    "quantization collapse — r15 review)") {
    // unit weights, n = 200k, y in [0, 1): the OLD normalized scores
    // z = (y − μ)/n had z² ~ 6e-12 — below the decimal quantum, so
    // every addend rounded to 0 and the variance silently collapsed.
    // The unnormalized-score path must land at s²/n within a normal
    // band.
    val n = 200000
    val big = spark.range(n)
      .select(col("id"), (pmod(col("id") * 2654435761L, lit(1000003L))
        .cast("double") / lit(1000003.0)).as("y"), lit(1.0).as("w"))
    val res = WeightedStats.svymean(SurveyDesign(big, "w"), "y")
    // uniform-ish y: var ≈ 1/12, so s²/n ≈ 4.17e-7
    val expected = 1.0 / 12.0 / n
    assert(res.variance > 0.5 * expected && res.variance < 2.0 * expected,
      s"variance ${res.variance} vs expected ~$expected — scores are " +
        "being quantized away")
  }

  test("svybyMean raises on NULL group keys instead of silently " +
    "dropping the group (r15 review)") {
    val withNull = df.withColumn("g",
      when(col("y") >= 30.0, lit(null).cast("long")).otherwise(lit(0L)))
    val e = intercept[Exception] {
      WeightedStats.svybyMean(SurveyDesign(withNull, "w"), "y", "g")
        .collect()
    }
    assert(e.getMessage.contains("NULL in group column"), e.getMessage)
  }
}
