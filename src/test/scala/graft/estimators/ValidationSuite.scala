package graft.estimators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Fusion

/** M14: the reference's defensive `stop()` contracts (`RegDI2.R:26-42,
  * 95-123,254-256`, `PC.R:69-85,177-178,262-264`) as typed exceptions. */
class ValidationSuite extends SparkSpec {
  import spark.implicits._

  // big enough that the calibration system is non-singular
  private lazy val pop = (1 to 60).map(i =>
      (i.toLong, i * 1.7 % 11.0, if (i % 3 == 0) 1 else 0,
        if (i % 2 == 0) 1 else 0))
    .toDF("id", "y", "in_A", "in_B")

  test("fusion rejects a missing id column") {
    val df = Seq((1L, 1.0)).toDF("id", "y")
    val e = intercept[IllegalArgumentException](
      Fusion.fuse(df, df, "nope", "id"))
    assert(e.getMessage.contains("nope"))
  }

  test("RegDI rejects an empty sample A") {
    val noA = pop.withColumn("in_A", lit(0))
    val e = intercept[IllegalArgumentException](
      RegDI.oneTable(noA, "in_A", "in_B",
        RegDIConfig(yACol = "y", yBCol = "y")))
    assert(e.getMessage.contains("sample A"))
  }

  test("RegDI rejects an out-of-range correction") {
    val e = intercept[IllegalArgumentException](
      RegDI.oneTable(pop, "in_A", "in_B",
        RegDIConfig(yACol = "y", yBCol = "y", correction = 7)))
    assert(e.getMessage.contains("correction"))
  }

  test("RegDI correction 3 requires an outcome model") {
    val e = intercept[IllegalArgumentException](
      RegDI.oneTable(pop, "in_A", "in_B",
        RegDIConfig(yACol = "y", yBCol = "y", correction = 3)))
    assert(e.getMessage.contains("outcomeModel"))
  }

  test("two-sample RegDI without weights cannot approximate N_total") {
    val a = pop.filter(col("in_A") === 1).select("id", "y")
    val b = pop.filter(col("in_B") === 1).select("id", "y")
    val e = intercept[IllegalArgumentException](
      RegDI.twoSample(a, b, "id", "id",
        RegDIConfig(yACol = "y", yBCol = "y")))
    assert(e.getMessage.toLowerCase.contains("n_total"))
  }

  test("PC scenario 2 requires overlap and an outcome model") {
    val e1 = intercept[IllegalArgumentException](
      PC.oneTable(pop, "in_A", "in_B",
        PCConfig(yACol = Some("y"), yBCol = Some("y"), scenario = 2)))
    assert(e1.getMessage.contains("outcomeModel") ||
      e1.getMessage.contains("Scenario 2"))

    val disjoint = pop.withColumn("in_B",
      when(col("in_A") === 1, 0).otherwise(1))
    val e2 = intercept[IllegalArgumentException](
      PC.oneTable(disjoint, "in_A", "in_B",
        PCConfig(yACol = Some("y"), yBCol = Some("y"), scenario = 2,
          outcomeModel = Some("y ~ y"))))
    assert(e2.getMessage.contains("∩") || e2.getMessage.contains("intersect")
      || e2.getMessage.toLowerCase.contains("no units"))
  }

  test("PC rejects an unknown scenario and model type") {
    val e = intercept[IllegalArgumentException](
      PC.oneTable(pop, "in_A", "in_B",
        PCConfig(yACol = Some("y"), yBCol = Some("y"), scenario = 9)))
    assert(e.getMessage.contains("scenario"))
    val e2 = intercept[IllegalArgumentException](
      PC.oneTable(pop, "in_A", "in_B",
        PCConfig(yACol = Some("y"), yBCol = Some("y"), scenario = 3,
          outcomeModel = Some("y ~ y"), modelType = "poisson")))
    assert(e2.getMessage.contains("poisson"))
  }
}
