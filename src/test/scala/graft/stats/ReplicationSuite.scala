package graft.stats

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ReplicationSuite extends SparkSpec {
  import spark.implicits._

  // fixture: 9 rows, 3 PSUs, unequal weights
  private def fixture = Seq(
    (1.0, 1.0, 0), (2.0, 2.0, 0), (3.0, 1.5, 0),
    (4.0, 1.0, 1), (5.0, 0.5, 1), (6.0, 2.0, 1),
    (7.0, 1.0, 2), (8.0, 1.0, 2), (9.0, 3.0, 2)
  ).toDF("y", "w", "psu")

  /** The JK1 formulas recomputed with plain doubles on the driver. */
  private def expected(rows: Seq[(Double, Double, Int)])
      : (Double, Double, Double) = {
    val byPsu = rows.groupBy(_._3).toSeq.sortBy(_._1)
    val tg = byPsu.map(_._2.map(r => r._1 * r._2).sum)
    val wg = byPsu.map(_._2.map(_._2).sum)
    val (t, w, g) = (tg.sum, wg.sum, byPsu.size.toDouble)
    val theta = tg.zip(wg).map { case (a, b) => (t - a) / (w - b) }
    val bar = theta.sum / g
    val full = t / w
    val vj = (g - 1) / g * theta.map(x => (x - bar) * (x - bar)).sum
    val vm = (g - 1) / g * theta.map(x => (x - full) * (x - full)).sum
    (full, vj, vm)
  }

  test("jk1Mean matches the hand-computed JK1 formulas") {
    val r = Replication.jk1Mean(fixture, col("y"), col("w"), col("psu"))
      .head()
    val (mu, vj, vm) = expected(Seq(
      (1.0, 1.0, 0), (2.0, 2.0, 0), (3.0, 1.5, 0),
      (4.0, 1.0, 1), (5.0, 0.5, 1), (6.0, 2.0, 1),
      (7.0, 1.0, 2), (8.0, 1.0, 2), (9.0, 3.0, 2)))
    assert(math.abs(r.getAs[Double]("mean_y") - mu) < 1e-9)
    assert(r.getAs[Long]("g_psus") === 3L)
    assert(math.abs(r.getAs[Double]("var_jk") - vj) < 1e-9)
    assert(math.abs(r.getAs[Double]("var_jk_mse") - vm) < 1e-9)
    // mse-centered variance dominates the replicate-mean-centered one
    assert(r.getAs[Double]("var_jk_mse") >= r.getAs[Double]("var_jk"))
  }

  test("jk1Mean construction runs exactly ONE distributed action " +
      "(the groupBy collect) — replicates never re-scan the data") {
    val n = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = n.incrementAndGet()
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = n.incrementAndGet()
    }
    spark.listenerManager.register(listener)
    try {
      Replication.jk1Mean(fixture, col("y"), col("w"), col("psu"))
      // listener events ride the async bus: first wait for the action's
      // own event to land (else a slow bus flakes the == 1 as 0), then
      // drain until stable to catch any EXTRA actions
      val deadline = System.nanoTime() + 10_000_000_000L
      while (System.nanoTime() < deadline && n.get < 1) Thread.sleep(50)
      var last = -1
      while (System.nanoTime() < deadline && n.get != last) {
        last = n.get; Thread.sleep(100)
      }
    } finally spark.listenerManager.unregister(listener)
    assert(n.get === 1, s"expected 1 action, saw ${n.get}")
  }

  test("jk1Mean is partition-invariant (bit-exact)") {
    val a = Replication.jk1Mean(fixture, col("y"), col("w"), col("psu"))
      .collect().toSeq
    val b = Replication.jk1Mean(fixture.repartition(7), col("y"), col("w"),
      col("psu")).collect().toSeq
    assert(a === b)
  }

  test("jknMean with a single stratum reduces exactly to jk1Mean's " +
      "mse-centered variance (the stratum reweight factor cancels)") {
    val jk1 = Replication.jk1Mean(fixture, col("y"), col("w"), col("psu"))
      .head()
    val jkn = Replication.jknMean(fixture, col("y"), col("w"),
      lit(0), col("psu")).head()
    assert(jkn.getAs[Double]("mean_y") === jk1.getAs[Double]("mean_y"))
    assert(jkn.getAs[Long]("n_strata") === 1L)
    assert(jkn.getAs[Long]("g_psus") === 3L)
    assert(math.abs(jkn.getAs[Double]("var_jkn") -
      jk1.getAs[Double]("var_jk_mse")) < 1e-12)
  }

  test("jknMean matches the hand-computed JKn formulas on 2 strata") {
    val rows = Seq(
      (1.0, 1.0, 0, 0), (2.0, 2.0, 0, 1), (3.0, 1.5, 0, 1),
      (4.0, 1.0, 1, 2), (5.0, 0.5, 1, 2), (6.0, 2.0, 1, 3),
      (7.0, 1.0, 1, 4))
    val df = rows.toDF("y", "w", "h", "psu")
    val r = Replication.jknMean(df, col("y"), col("w"), col("h"),
      col("psu")).head()
    // driver-side reference with plain doubles
    val byHg = rows.groupBy(x => (x._3, x._4)).toSeq
    val tg = byHg.map { case (k, rs) =>
      (k, rs.map(x => x._1 * x._2).sum, rs.map(_._2).sum) }
    val byH = tg.groupBy(_._1._1)
    val th = byH.map { case (h, gs) =>
      h -> ((gs.map(_._2).sum, gs.map(_._3).sum, gs.size.toDouble)) }
    val t = th.values.map(_._1).sum
    val w = th.values.map(_._2).sum
    val full = t / w
    var v = 0.0
    tg.foreach { case ((h, _), tgv, wgv) =>
      val (thv, whv, nh) = th(h)
      val theta = (t - thv + nh / (nh - 1) * (thv - tgv)) /
        (w - whv + nh / (nh - 1) * (whv - wgv))
      v += (nh - 1) / nh * (theta - full) * (theta - full)
    }
    assert(math.abs(r.getAs[Double]("mean_y") - full) < 1e-9)
    assert(r.getAs[Long]("n_strata") === 2L)
    assert(r.getAs[Long]("g_psus") === 5L)
    assert(math.abs(r.getAs[Double]("var_jkn") - v) < 1e-9)
  }

  test("jknMean fails loudly on single-PSU strata") {
    val df = Seq((1.0, 1.0, 0, 0), (2.0, 1.0, 0, 1), (3.0, 1.0, 1, 2))
      .toDF("y", "w", "h", "psu")
    val e = intercept[IllegalArgumentException] {
      Replication.jknMean(df, col("y"), col("w"), col("h"), col("psu"))
    }
    assert(e.getMessage.contains("single-PSU"))
  }

  test("brrMean matches the hand-computed Sylvester-sign expansion on " +
      "2 strata x 2 PSUs") {
    val rows = Seq(
      (1.0, 1.0, 0, 0), (2.0, 2.0, 0, 0), // h=0 psu=0
      (3.0, 1.5, 0, 1),                   // h=0 psu=1
      (4.0, 1.0, 1, 0), (5.0, 0.5, 1, 0), // h=1 psu=0
      (6.0, 2.0, 1, 1), (7.0, 1.0, 1, 1)) // h=1 psu=1
    val df = rows.toDF("y", "w", "h", "psu")
    val r = Replication.brrMean(df, col("y"), col("w"), col("h"),
      col("psu")).head()
    // driver reference: totals per (h, psu), R=4 Sylvester replicates
    val tg = rows.groupBy(x => (x._3, x._4)).map { case (k, rs) =>
      k -> ((rs.map(x => x._1 * x._2).sum, rs.map(_._2).sum)) }
    val (t, wsum) = (tg.values.map(_._1).sum, tg.values.map(_._2).sum)
    val full = t / wsum
    val thetas = (0 until 4).map { rr =>
      val kept = (0 until 2).map { h =>
        val slot = Integer.bitCount(rr & (h + 1)) % 2
        tg((h, slot))
      }
      kept.map(_._1 * 2).sum / kept.map(_._2 * 2).sum
    }
    val v = thetas.map(th => (th - full) * (th - full)).sum / 4.0
    assert(math.abs(r.getAs[Double]("mean_y") - full) < 1e-9)
    assert(r.getAs[Long]("n_strata") === 2L)
    assert(r.getAs[Long]("n_reps") === 4L)
    assert(math.abs(r.getAs[Double]("var_brr") - v) < 1e-9)
    // balance: across the 4 replicates each stratum keeps each PSU
    // exactly twice (the Hadamard property)
    (0 until 2).foreach { h =>
      val keeps = (0 until 4).map(rr => Integer.bitCount(rr & (h + 1)) % 2)
      assert(keeps.count(_ == 0) === 2 && keeps.count(_ == 1) === 2)
    }
  }

  test("Fay's BRR: rho=0 is classic BRR bit-exactly; rho=0.5 recovers " +
      "the same variance when the replicate weight sums are constant") {
    val rows = Seq(
      (1.0, 1.0, 0, 0), (2.0, 2.0, 0, 0),
      (3.0, 1.5, 0, 1),
      (4.0, 1.0, 1, 0), (5.0, 0.5, 1, 0),
      (6.0, 2.0, 1, 1), (7.0, 1.0, 1, 1))
    val df = rows.toDF("y", "w", "h", "psu")
    val classic = Replication.brrMean(df, col("y"), col("w"), col("h"),
      col("psu")).head()
    val fay0 = Replication.brrMean(df, col("y"), col("w"), col("h"),
      col("psu"), fayRho = 0.0).head()
    assert(fay0.getDouble(0) === classic.getDouble(0))
    assert(fay0.getDouble(3) === classic.getDouble(3)) // bit-identical
    // equal PSU weight sums ⇒ every replicate's wr is the same constant
    // ⇒ the mean is linear in the Fay factors ⇒ dd_fay = (1-ρ)·dd and
    // the divisor (1-ρ)² cancels exactly (up to IEEE rounding)
    val eq = Seq(
      (1.0, 1.0, 0, 0), (3.0, 1.0, 0, 1),
      (4.0, 1.0, 1, 0), (6.0, 1.0, 1, 1))
      .toDF("y", "w", "h", "psu")
    val vClassic = Replication.brrMean(eq, col("y"), col("w"), col("h"),
      col("psu")).head().getDouble(3)
    val vFay = Replication.brrMean(eq, col("y"), col("w"), col("h"),
      col("psu"), fayRho = 0.5).head().getDouble(3)
    assert(math.abs(vFay - vClassic) <= 1e-12 * math.abs(vClassic))
    val e = intercept[IllegalArgumentException] {
      Replication.brrMean(df, col("y"), col("w"), col("h"), col("psu"),
        fayRho = 1.0)
    }
    assert(e.getMessage.contains("rho"))
  }

  test("poissonBootstrapMean: deterministic, partition-invariant, and " +
      "close to s²/n on a unit-weight SRS") {
    val n = 400
    val rnd = new scala.util.Random(3)
    val data = Seq.tabulate(n)(i => (i.toLong, 10.0 + rnd.nextGaussian()))
    val df = data.toDF("id", "y").withColumn("w", lit(1.0))
    val a = Replication.poissonBootstrapMean(df.repartition(2), col("y"),
      col("w"), col("id"), reps = 200).head()
    val b = Replication.poissonBootstrapMean(df.repartition(11), col("y"),
      col("w"), col("id"), reps = 200).head()
    assert(a.getDouble(0) === b.getDouble(0))
    assert(a.getDouble(2) === b.getDouble(2)) // bit-identical reruns
    val ys = data.map(_._2)
    val mean = ys.sum / n
    val s2n = ys.map(v => (v - mean) * (v - mean)).sum / (n - 1) / n
    assert(math.abs(a.getDouble(2) - s2n) < 0.5 * s2n,
      s"bootstrap var ${a.getDouble(2)} vs s²/n $s2n")
    // the full-sample estimate is the weighted mean itself
    assert(math.abs(a.getDouble(0) - mean) < 1e-9)
  }

  test("poissonBootstrapMean: unbiased on an id-CORRELATED response " +
      "(the affine-hash rotation defect — r15 review)") {
    // y = linear trend in id, the adversarial case for the old
    // multiplicative hash: h(id, r+1) − h(id, r) was a global constant,
    // so all replicates were rotations of one uniform vector and
    // var_boot came out at ~1.4% of s²/n here (measured 70×
    // underestimate). The md5-unit draw must land in a normal
    // tolerance band.
    val n = 2000
    val df = spark.range(n).select(col("id"),
      (col("id") + 1).cast("double").as("y"), lit(1.0).as("w"))
    val r = Replication.poissonBootstrapMean(df, col("y"), col("w"),
      col("id"), reps = 96).head()
    val s2n = (1 to n).map(_.toDouble).map { v =>
      val mu = (n + 1) / 2.0; (v - mu) * (v - mu)
    }.sum / (n - 1) / n
    val vb = r.getDouble(2)
    assert(math.abs(vb - s2n) < 0.5 * s2n,
      s"bootstrap var $vb vs s²/n $s2n — replicates are not independent")
  }

  test("poissonBootstrapMean raises on an all-zero replicate instead " +
      "of an ANSI divide-by-zero (tiny-n contract — r15)") {
    // a single-row input: each replicate is empty with prob e^−1, so
    // 16 replicates are near-certain (1 − 0.63¹⁶) to contain one —
    // and the md5 draws are fixed, so this is deterministic
    val df = Seq((1L, 5.0, 1.0)).toDF("id", "y", "w")
    val e = intercept[Exception] {
      Replication.poissonBootstrapMean(df, col("y"), col("w"),
        col("id"), reps = 16).collect()
    }
    assert(e.getMessage.contains("empty resample"), e.getMessage)
  }

  test("brrMean fails loudly unless every stratum has exactly 2 PSUs") {
    val df = Seq((1.0, 1.0, 0, 0), (2.0, 1.0, 0, 1), (3.0, 1.0, 1, 0))
      .toDF("y", "w", "h", "psu")
    val e = intercept[IllegalArgumentException] {
      Replication.brrMean(df, col("y"), col("w"), col("h"), col("psu"))
    }
    assert(e.getMessage.contains("exactly 2 PSUs"))
  }

  test("jk1Mean with one row per PSU equals the classic jackknife of " +
      "the unweighted mean") {
    // equal weights, PSU = row: JK1 reduces to the textbook delete-one
    // jackknife, whose variance for the mean is s²/n exactly
    val ys = Seq(2.0, 4.0, 9.0, 1.0, 7.0)
    val df = ys.zipWithIndex.map { case (y, i) => (y, 1.0, i) }
      .toDF("y", "w", "psu")
    val r = Replication.jk1Mean(df, col("y"), col("w"), col("psu")).head()
    val n = ys.size.toDouble
    val mu = ys.sum / n
    val s2 = ys.map(y => (y - mu) * (y - mu)).sum / (n - 1)
    assert(math.abs(r.getAs[Double]("var_jk") - s2 / n) < 1e-9)
  }
  test("poissonBootstrapMean raises on NULL ids (they would get K = 8 " +
      "in every replicate, shifting all replicate means)") {
    val df = Seq((Option(1L), 1.0, 1.0), (None: Option[Long], 2.0, 1.0))
      .toDF("id", "y", "w")
    val e = intercept[Exception] {
      Replication.poissonBootstrapMean(df, col("y"), col("w"),
        col("id"), reps = 4).collect()
    }
    assert(e.getMessage.contains("NULL in id column"), e.getMessage)
  }

  test("r16 guards: NULL y raises named; empty bootstrap input raises; " +
      "NULL stratum raises (it used to vanish through the JKn join)") {
    import spark.implicits._
    def chain(t: Throwable): String = {
      var c: Throwable = t; val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append(" | "); c = c.getCause }
      sb.toString
    }
    val nullY = Seq((Option(1.0), 1.0, 1L), (None: Option[Double], 1.0, 2L))
      .toDF("y", "w", "psu")
    val e1 = intercept[Exception] {
      Replication.jk1Mean(nullY, col("y"), col("w"), col("psu")).collect()
    }
    assert(chain(e1).contains("NULL in the response"), chain(e1))
    val e2 = intercept[IllegalArgumentException] {
      Replication.poissonBootstrapMean(
        Seq.empty[(Double, Double, Long)].toDF("y", "w", "id"),
        col("y"), col("w"), col("id"), reps = 4)
    }
    assert(e2.getMessage.contains("empty input frame"), e2.getMessage)
    // a NULL stratum groups fine and passes the lonely check, but the
    // stratum equi-join would silently drop its PSUs from the replicate
    // frame while the grand totals keep them
    val nullH = Seq((1.0, 1.0, None: Option[Long], 1L),
      (2.0, 1.0, None: Option[Long], 2L),
      (3.0, 1.0, Option(1L), 3L), (4.0, 1.0, Option(1L), 4L))
      .toDF("y", "w", "h", "psu")
    val e3 = intercept[Exception] {
      Replication.jknMean(nullH, col("y"), col("w"), col("h"), col("psu"))
        .collect()
    }
    assert(chain(e3).contains("NULL in the stratum column"), chain(e3))
    // empty JKn input is a named error, not a one-row all-NULL result
    val e4 = intercept[IllegalArgumentException] {
      Replication.jknMean(Seq.empty[(Double, Double, Long, Long)]
        .toDF("y", "w", "h", "psu"), col("y"), col("w"), col("h"),
        col("psu"))
    }
    assert(e4.getMessage.contains("empty input frame"), e4.getMessage)
  }

  test("r16: scale-18 deviation sums keep a small-magnitude variance " +
      "that the scale-10 quantum rounded to exactly zero") {
    import spark.implicits._
    // y ~ 1e-3 with per-PSU means differing by ~1e-4: replicate
    // deviations ~1e-5, squares ~1e-10 — AT the old quantum, where
    // half the addends died; at scale 18 the variance is real
    val df = Seq.tabulate(400) { i =>
      (0.001 + (i % 4) * 0.0001, 1.0, (i % 4).toLong)
    }.toDF("y", "w", "psu")
    val row = Replication.jk1Mean(df, col("y"), col("w"), col("psu"))
      .head()
    val varJk = row.getAs[Double]("var_jk")
    assert(varJk > 0.0, s"var_jk collapsed to $varJk")
    // IEEE reference: 4 equal-weight PSUs, delete-one thetas
    val means = Seq(0.001, 0.0011, 0.0012, 0.0013)
    val t = means.map(_ * 100).sum
    val thetas = means.map(m => (t - m * 100) / 300.0)
    val bar = thetas.sum / 4.0
    val ref = (3.0 / 4.0) * thetas.map(x => (x - bar) * (x - bar)).sum
    assert(math.abs(varJk - ref) / ref < 1e-6,
      s"var_jk=$varJk ref=$ref")
  }
}
