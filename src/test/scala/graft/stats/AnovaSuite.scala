package graft.stats

import graft.SparkSpec

/** Balanced 2×2 fixture where Type-I sums of squares have closed forms
  * (balanced ⇒ sequential SS equal the textbook factor SS):
  * cells (a1,b1)=(1,2) (a1,b2)=(3,4) (a2,b1)=(5,6) (a2,b2)=(9,10)
  * ⇒ SS_A=50, SS_B=18, SS_AB=2, SS_resid=2 (df 1,1,1,4). */
class AnovaSuite extends SparkSpec {
  import spark.implicits._

  private lazy val fixture = Seq(
    (1.0, "a1", "b1"), (2.0, "a1", "b1"), (3.0, "a1", "b2"), (4.0, "a1", "b2"),
    (5.0, "a2", "b1"), (6.0, "a2", "b1"), (9.0, "a2", "b2"), (10.0, "a2", "b2")
  ).toDF("y", "fa", "fb")

  test("two-factor Type-I SS matches the balanced closed form") {
    val rows = Anova.twoFactor(fixture, "y", "fa", "fb")
      .map(r => r.term -> r).toMap
    assert(math.abs(rows("fa").sumSq - 50.0) < 1e-9)
    assert(math.abs(rows("fb").sumSq - 18.0) < 1e-9)
    assert(math.abs(rows("fa:fb").sumSq - 2.0) < 1e-9)
    assert(math.abs(rows("Residuals").sumSq - 2.0) < 1e-9)
    assert(rows("fa").df === 1L)
    assert(rows("Residuals").df === 4L)
  }

  test("F statistics and p-values") {
    val rows = Anova.twoFactor(fixture, "y", "fa", "fb")
      .map(r => r.term -> r).toMap
    assert(math.abs(rows("fa").fValue - 100.0) < 1e-9)
    assert(math.abs(rows("fb").fValue - 36.0) < 1e-9)
    assert(math.abs(rows("fa:fb").fValue - 4.0) < 1e-9)
    // p for F(1,4)=100 ≈ 0.00056; F(1,4)=4 ≈ 0.116
    assert(rows("fa").pValue < 0.001)
    assert(rows("fa:fb").pValue > 0.05)
    assert(rows("Residuals").fValue.isNaN)
  }

  test("unbalanced data: sequential SS still sum to total SS") {
    val unb = fixture.union(Seq((7.0, "a2", "b1")).toDF("y", "fa", "fb"))
    val rows = Anova.twoFactor(unb, "y", "fa", "fb")
    val totalFromParts = rows.map(_.sumSq).sum
    val g = Gram.moments(unb, Seq(org.apache.spark.sql.functions.lit(1.0)),
      org.apache.spark.sql.functions.lit(1.0),
      Some(org.apache.spark.sql.functions.col("y")))
    val sst = g.swyy - g.swy * g.swy / g.sw
    assert(math.abs(totalFromParts - sst) < 1e-9)
  }
}
