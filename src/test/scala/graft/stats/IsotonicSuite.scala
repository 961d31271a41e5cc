package graft.stats

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IsotonicSuite extends SparkSpec {
  import spark.implicits._

  test("pava: classic pooling fixtures") {
    // single violation pools the last two: [1, 3, 2] → [1, 2.5, 2.5]
    assert(Isotonic.pava(Seq(1.0, 1.0, 1.0), Seq(1.0, 3.0, 2.0)) ===
      Seq(1.0, 2.5, 2.5))
    // already monotone: untouched
    assert(Isotonic.pava(Seq(1.0, 2.0, 3.0), Seq(1.0, 1.0, 4.0)) ===
      Seq(1.0, 1.0, 4.0))
    // full reversal pools everything to the weighted mean
    val all = Isotonic.pava(Seq(1.0, 2.0, 1.0), Seq(3.0, 2.0, 1.0))
    val wm = (3.0 + 2.0 * 2.0 + 1.0) / 4.0
    assert(all === Seq(wm, wm, wm))
    // cascading violation: [4, 1] w=[1, 3] pools to 1.75 then stays
    assert(Isotonic.pava(Seq(1.0, 3.0, 1.0), Seq(4.0, 1.0, 5.0)) ===
      Seq(1.75, 1.75, 5.0))
  }

  test("pava preserves the weighted mean and minimizes vs naive clamps") {
    val w = Seq(2.0, 1.0, 3.0, 1.0, 2.0)
    val m = Seq(0.1, 0.5, 0.3, 0.2, 0.9)
    val f = Isotonic.pava(w, m)
    assert(f.sliding(2).forall(p => p.head <= p.last + 1e-15)) // monotone
    val before = w.zip(m).map { case (a, b) => a * b }.sum
    val after = w.zip(f).map { case (a, b) => a * b }.sum
    assert(math.abs(before - after) < 1e-12)
  }

  test("fitBinned: monotone calibration recovering a noisy monotone truth") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(20000) { i =>
      val x = rnd.nextDouble() * 10.0
      // true P(label) rises with x; noisy labels
      val p = 0.1 + 0.08 * x
      (x, if (rnd.nextDouble() < p) 1.0 else 0.0)
    }
    val fit = Isotonic.fitBinned(rows.toDF("score", "label"),
      "score", "label", lo = 0.0, hi = 10.0, nBins = 20)
      .orderBy("bin").collect()
    val fitted = fit.map(_.getDouble(4))
    assert(fitted.sliding(2).forall(p => p.head <= p.last + 1e-15))
    // ends near the true probabilities
    assert(math.abs(fitted.head - 0.12) < 0.08)
    assert(math.abs(fitted.last - 0.86) < 0.08)
    // weighted mean preserved across pooling
    val wSum = fit.map(r => r.getLong(2).toDouble * r.getDouble(3)).sum
    val fSum = fit.map(r => r.getLong(2).toDouble * r.getDouble(4)).sum
    assert(math.abs(wSum - fSum) < 1e-6)
  }
  test("fitBinned raises on NaN scores/labels (NaN passes isNotNull and " +
      "would silently land in bin 0)") {
    val nanScore = Seq((Double.NaN, 1.0), (1.0, 0.0)).toDF("s", "l")
    val e1 = intercept[Exception] {
      graft.stats.Isotonic.fitBinned(nanScore, "s", "l", 0.0, 2.0, 2)
        .collect()
    }
    assert(e1.getMessage.contains("NaN in score column"), e1.getMessage)
    val nanLabel = Seq((1.0, Double.NaN), (1.5, 0.0)).toDF("s", "l")
    val e2 = intercept[Exception] {
      graft.stats.Isotonic.fitBinned(nanLabel, "s", "l", 0.0, 2.0, 2)
        .collect()
    }
    assert(e2.getMessage.contains("NaN in label column"), e2.getMessage)
  }

}
