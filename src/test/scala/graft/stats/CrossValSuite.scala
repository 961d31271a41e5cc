package graft.stats

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CrossValSuite extends SparkSpec {
  import spark.implicits._

  test("leave-fold-out coefficients equal a direct fit on the other folds") {
    val rnd = new scala.util.Random(5)
    val data = Seq.tabulate(300) { i =>
      val x = rnd.nextInt(50).toDouble
      (i.toLong, x, 3.0 + 2.0 * x + rnd.nextGaussian(), i % 3)
    }
    val df = data.toDF("id", "x", "y", "fold")
    val cv = CrossVal.olsKFold(df, "x", "y", "fold")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (f <- 0 until 3) {
      val train = data.filter(_._4 != f)
      val n = train.size.toDouble
      val sx = train.map(_._2).sum; val sy = train.map(_._3).sum
      val sxy = train.map(t => t._2 * t._3).sum
      val sxx = train.map(t => t._2 * t._2).sum
      val b1 = (sxy - sx * sy / n) / (sxx - sx * sx / n)
      val b0 = sy / n - b1 * (sx / n)
      assert(math.abs(cv(f.toLong).getDouble(1) - b0) < 1e-6)
      assert(math.abs(cv(f.toLong).getDouble(2) - b1) < 1e-8)
      assert(cv(f.toLong).getLong(3) === data.count(_._4 == f).toLong)
      // the fit is good, so held-out rmse ≈ noise sd
      assert(cv(f.toLong).getDouble(4) < 2.0)
    }
  }

  test("fewer than 2 folds fails loudly") {
    val df = Seq((1L, 1.0, 2.0, 0), (2L, 2.0, 4.0, 0))
      .toDF("id", "x", "y", "fold")
    val e = intercept[IllegalArgumentException] {
      CrossVal.olsKFold(df, "x", "y", "fold")
    }
    assert(e.getMessage.contains("at least 2 folds"))
  }

  test("empty input names the cause instead of a bare None.get " +
    "(r15 review)") {
    val df = Seq((1L, Option.empty[Double], 2.0, 0))
      .toDF("id", "x", "y", "fold")
    val e = intercept[IllegalArgumentException] {
      CrossVal.olsKFold(df, "x", "y", "fold")
    }
    assert(e.getMessage.contains("no rows"), e.getMessage)
  }
}
