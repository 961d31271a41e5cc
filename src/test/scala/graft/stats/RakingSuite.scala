package graft.stats

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RakingSuite extends SparkSpec {
  import spark.implicits._

  // cells: (f1=0)×{f2=0,f2=1} one row each; (f1=1)×{f2=0,f2=1} two rows each
  private def fixture = Seq(
    (1L, 0L, 0L), (2L, 0L, 1L),
    (3L, 1L, 0L), (4L, 1L, 0L),
    (5L, 1L, 1L), (6L, 1L, 1L)
  ).toDF("id", "f1", "f2").withColumn("d", lit(1.0))

  test("one round reproduces the hand-computed IPF ratios") {
    // f1-step: s(0)=2 → r1_0=4/2=2 ; s(1)=4 → r1_1=8/4=2
    // f2-step: both margins already 6/6 → r2 = 1
    val f = Raking.factors(fixture, "d", "f1", "f2",
      targets1 = Map(0L -> 4.0, 1L -> 8.0),
      targets2 = Map(0L -> 6.0, 1L -> 6.0), iters = 1)
    assert(f.r1 === Map(0L -> 2.0, 1L -> 2.0))
    assert(f.r2 === Map(0L -> 1.0, 1L -> 1.0))
    val w = Raking.rake(fixture, "d", "f1", "f2",
      Map(0L -> 4.0, 1L -> 8.0), Map(0L -> 6.0, 1L -> 6.0), iters = 1)
      .select("w_rake").as[Double].collect()
    assert(w.forall(_ === 2.0))
  }

  test("margins converge to the targets on an uneven problem") {
    val t1 = Map(0L -> 3.0, 1L -> 9.0)
    val t2 = Map(0L -> 8.0, 1L -> 4.0)
    val raked = Raking.rake(fixture, "d", "f1", "f2", t1, t2, iters = 40)
    val m1 = raked.groupBy("f1").agg(sum("w_rake").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val m2 = raked.groupBy("f2").agg(sum("w_rake").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    t1.foreach { case (k, t) => assert(math.abs(m1(k) - t) < 1e-9) }
    t2.foreach { case (k, t) => assert(math.abs(m2(k) - t) < 1e-9) }
    // the LAST-adjusted margin is matched exactly up to one IEEE rounding
    t2.foreach { case (k, t) => assert(math.abs(m2(k) - t) < 1e-12 * t) }
  }

  test("factors are bit-identical under repartitioning") {
    val t1 = Map(0L -> 3.0, 1L -> 9.0)
    val t2 = Map(0L -> 8.0, 1L -> 4.0)
    val a = Raking.factors(fixture, "d", "f1", "f2", t1, t2, iters = 5)
    val b = Raking.factors(fixture.repartition(7), "d", "f1", "f2", t1, t2, iters = 5)
    assert(a === b)
  }

  test("poststratify hits every stratum target exactly in one step") {
    val t = Map(0L -> 5.0, 1L -> 7.0)
    val post = Raking.poststratify(
      fixture.withColumn("f", col("f1")), "d", "f", t)
    val sums = post.groupBy("f").agg(sum("w_post").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // cells: f=0 holds 2 unit weights, f=1 holds 4 → ratios 2.5 and 1.75
    assert(sums(0L) === 5.0 && sums(1L) === 7.0)
    val w = post.select("f", "w_post").distinct().collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(0L) === 2.5 && w(1L) === 1.75)
  }

  test("poststratify rejects empty strata and unknown data strata") {
    assert(intercept[IllegalArgumentException] {
      Raking.poststratify(fixture.withColumn("f", col("f1")), "d", "f",
        Map(0L -> 5.0, 1L -> 7.0, 9L -> 1.0))
    }.getMessage.contains("zero weight"))
    assert(intercept[IllegalArgumentException] {
      Raking.poststratify(fixture.withColumn("f", col("f1")), "d", "f",
        Map(0L -> 5.0))
    }.getMessage.contains("missing from targets"))
  }

  test("data categories missing from the targets fail loudly") {
    // margin totals agree (12 = 12) so the consistency check passes and
    // the missing-category check is what fires
    val e = intercept[IllegalArgumentException] {
      Raking.factors(fixture, "d", "f1", "f2",
        Map(0L -> 12.0), Map(0L -> 6.0, 1L -> 6.0), iters = 1)
    }
    assert(e.getMessage.contains("missing from raking targets"))
  }

  test("margin totals disagreeing within rounding tolerance proceed " +
      "(published tables rounded to integers are legitimate input)") {
    // totals 12.0 vs 12.004 — relative gap ~3.3e-4, inside the 1e-3
    // default; survey::rake would proceed on these, so must we
    val f = Raking.factors(fixture, "d", "f1", "f2",
      targets1 = Map(0L -> 4.0, 1L -> 8.0),
      targets2 = Map(0L -> 6.0, 1L -> 6.004), iters = 1)
    assert(f.r1.keySet === Set(0L, 1L))
    // and a caller with exact same-frame margins can opt back in to
    // the strict check
    val e = intercept[IllegalArgumentException] {
      Raking.factors(fixture, "d", "f1", "f2",
        Map(0L -> 4.0, 1L -> 8.0), Map(0L -> 6.0, 1L -> 6.004),
        iters = 1, totalTol = 1e-6)
    }
    assert(e.getMessage.contains("margins disagree"), e.getMessage)
  }

  test("margins that disagree on the population total fail loudly " +
      "(IPF cannot satisfy both — it would oscillate forever)") {
    val e = intercept[IllegalArgumentException] {
      Raking.factors(fixture, "d", "f1", "f2",
        Map(0L -> 4.0, 1L -> 8.0), Map(0L -> 0.5, 1L -> 0.5), iters = 1)
    }
    assert(e.getMessage.contains("margins disagree"), e.getMessage)
  }

  test("a zero-weight margin category fails loudly") {
    // consistent totals (17 = 17); category 2 has no data weight
    val e = intercept[IllegalArgumentException] {
      Raking.factors(fixture, "d", "f1", "f2",
        Map(0L -> 4.0, 1L -> 8.0, 2L -> 5.0), Map(0L -> 8.0, 1L -> 9.0),
        iters = 1)
    }
    assert(e.getMessage.contains("zero weight"))
  }
}
