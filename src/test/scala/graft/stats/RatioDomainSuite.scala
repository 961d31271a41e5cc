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

  test("r16 guards: NULL y/weights raise NAMED (not silently-biased " +
      "means), empty frames name themselves, and variance never goes " +
      "negative") {
    def chain(t: Throwable): String = {
      var c: Throwable = t; val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append(" | "); c = c.getCause }
      sb.toString
    }
    // NULL y: the decimal sum would SKIP it while n and Σw keep the row
    val nullY = Seq((Option(10.0), 1.0), (None: Option[Double], 2.0))
      .toDF("y", "w")
    val e1 = intercept[Exception] {
      WeightedStats.svymean(SurveyDesign(nullY, "w"), "y")
    }
    assert(chain(e1).contains("NULL in the response"), chain(e1))
    val e2 = intercept[Exception] {
      WeightedStats.svytotal(SurveyDesign(nullY, "w"), Seq("y"))
    }
    assert(chain(e2).contains("NULL in 'y'"), chain(e2))
    val e3 = intercept[Exception] {
      WeightedStats.svybyMean(
        SurveyDesign(nullY.withColumn("g", lit(1L)), "w"), "y", "g")
        .collect()
    }
    assert(chain(e3).contains("NULL in 'y'"), chain(e3))
    // ...but a NULL y OUTSIDE the domain is legitimate
    val nullOutside = Seq((Option(10.0), 1.0, true),
      (None: Option[Double], 2.0, false)).toDF("y", "w", "d")
    val dm = WeightedStats.svymeanDomain(
      SurveyDesign(nullOutside, "w"), "y", col("d"))
    assert(dm.mean === 10.0)
    // ...while INSIDE it raises
    val e4 = intercept[Exception] {
      WeightedStats.svymeanDomain(
        SurveyDesign(nullY, "w"), "y", lit(true))
    }
    assert(chain(e4).contains("inside the domain"), chain(e4))
    // empty frame: a named error, not an anonymous NPE
    val empty = Seq.empty[(Double, Double)].toDF("y", "w")
    val e5 = intercept[IllegalArgumentException] {
      WeightedStats.svymean(SurveyDesign(empty, "w"), "y")
    }
    assert(e5.getMessage.contains("empty input frame"), e5.getMessage)
    // constant y: variance must clamp at 0, se must not be NaN
    val const = Seq.tabulate(1000)(i => (5.0, 1.0 + (i % 3) * 0.5))
      .toDF("y", "w")
    val m = WeightedStats.svymean(SurveyDesign(const, "w"), "y")
    assert(m.variance >= 0.0 && !m.se.isNaN)
    // zero-weight group names the group
    val zeroW = Seq((1.0, 1.0, 1L), (2.0, 0.0, 2L)).toDF("y", "w", "g")
    val e6 = intercept[Exception] {
      WeightedStats.svybyMean(SurveyDesign(zeroW, "w"), "y", "g").collect()
    }
    assert(chain(e6).contains("summed weight is zero in group"), chain(e6))
  }
}
