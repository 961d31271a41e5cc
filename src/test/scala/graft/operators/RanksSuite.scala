package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RanksSuite extends SparkSpec {
  import spark.implicits._

  test("globalRowNumber equals the single-task window rank") {
    val rnd = new scala.util.Random(7)
    val df = Seq.tabulate(500)(i => (rnd.nextInt(40).toDouble, i.toLong))
      .toDF("v", "id")
    val viaWindow = df.withColumn("rn",
        row_number().over(Window.partitionBy(lit(1)).orderBy(col("v"), col("id")))
          .cast("long"))
      .orderBy("rn").as[(Double, Long, Long)].collect().toSeq
    val viaRanks = Ranks.globalRowNumber(df.repartition(7),
        Seq(col("v"), col("id")), "rn", numPartitions = Some(5))
      .orderBy("rn").as[(Double, Long, Long)].collect().toSeq
    assert(viaRanks === viaWindow)
  }

  test("giniByGroup: uniform group scores 0, fully concentrated (n-1)/n") {
    val df = Seq(
      ("u", 5.0, 1L), ("u", 5.0, 2L), ("u", 5.0, 3L), ("u", 5.0, 4L),
      ("c", 0.0, 5L), ("c", 0.0, 6L), ("c", 0.0, 7L), ("c", 12.0, 8L)
    ).toDF("g", "v", "tie")
    val out = Ranks.giniByGroup(df, "g", "v", "tie")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("u") === ((4L, 0.0)))
    assert(out("c") === ((4L, 3.0 / 4.0)))
  }

  test("quantileSelect picks exact order statistics; winsorize clips") {
    val df = spark.range(1, 101).toDF("id")
      .withColumn("v", col("id").cast("double"))
    val q = Ranks.quantileSelect(df, "v", "id", Seq(2500, 2501, 10000))
    assert(q(2500) === 25.0) // ceil(25.00) = 25
    assert(q(2501) === 26.0) // ceil(25.01) = 26
    assert(q(10000) === 100.0)
    val w = Ranks.winsorize(df, "v", "id", 1000, 9000)
      .orderBy("id").select("v_winsor").as[Double].collect()
    assert(w.head === 10.0 && w.last === 90.0)
    assert(w(49) === 50.0) // mid-range untouched
    assert(w.min === 10.0 && w.max === 90.0)
  }

  test("giniByGroup is bit-identical under repartitioning") {
    val rnd = new scala.util.Random(11)
    val df = Seq.tabulate(300)(i =>
      (s"g${i % 3}", rnd.nextInt(1000) / 7.0, i.toLong)).toDF("g", "v", "tie")
    val a = Ranks.giniByGroup(df.repartition(1), "g", "v", "tie")
      .orderBy("g").collect().toSeq
    val b = Ranks.giniByGroup(df.repartition(13), "g", "v", "tie")
      .orderBy("g").collect().toSeq
    assert(a === b)
  }
  test("quantileSelect works on integer columns and raises on NULL " +
      "values (which would otherwise shift every rank)") {
    val longs = spark.range(1, 101)
      .select(col("id"), col("id").as("v")) // v is LongType
    val q = Ranks.quantileSelect(longs, "v", "id", Seq(5000))
    assert(q(5000) === 50.0)
    val withNull = Seq((1L, Option(1.0)), (2L, None: Option[Double]))
      .toDF("id", "v")
    val e = intercept[Exception] {
      Ranks.quantileSelect(withNull, "v", "id", Seq(5000))
    }
    assert(e.getMessage.contains("NULL in value column"), e.getMessage)
  }

  test("giniByGroup raises on NULL values instead of returning a " +
      "plausible-but-wrong coefficient") {
    val df = Seq((1L, "g", Option(10.0)), (2L, "g", None: Option[Double]))
      .toDF("tie", "g", "v")
    val e = intercept[Exception] {
      Ranks.giniByGroup(df, "g", "v", "tie").collect()
    }
    assert(e.getMessage.contains("NULL in value column"), e.getMessage)
  }

  test("giniByGroup raises on a non-positive group sum instead of " +
      "emitting NaN (0/0) or a sign-flipped coefficient") {
    val df = Seq((1L, "z", 0.0), (2L, "z", 0.0), (3L, "g", 1.0),
      (4L, "g", 3.0)).toDF("tie", "g", "v")
    val e = intercept[Exception] {
      Ranks.giniByGroup(df, "g", "v", "tie").collect()
    }
    assert(e.getMessage.contains("non-positive value sum"), e.getMessage)
  }

  test("r17: percentileSelect is bit-identical to SQL percentile over " +
      "random data with NULLs, duplicates, and multiple columns") {
    val rnd = new scala.util.Random(23)
    // duplicates (quantized values), NULLs, and two columns with
    // DIFFERENT non-NULL counts (block starts must be cumulative)
    val df = Seq.tabulate(997) { i =>
      val a = if (i % 13 == 0) None else Some(rnd.nextInt(80) / 7.0)
      val b = if (i % 5 == 0) None else Some(rnd.nextDouble() * 1e6 - 5e5)
      (i.toLong, a, b)
    }.toDF("id", "a", "b")
    val ps = Seq(0.0, 0.25, 0.5, 0.733, 0.95, 0.99, 1.0)
    val got = Ranks.percentileSelect(df.repartition(7), Seq("a", "b"), ps)
    val pList = ps.mkString("array(", ", ", ")")
    val exp = df.agg(
      expr(s"percentile(a, $pList)").as("qa"),
      expr(s"percentile(b, $pList)").as("qb")).head()
    ps.zipWithIndex.foreach { case (p, j) =>
      assert(got(("a", p)) === exp.getSeq[Double](0)(j), s"a@$p")
      assert(got(("b", p)) === exp.getSeq[Double](1)(j), s"b@$p")
    }
    // an all-NULL column fails NAMED instead of a bare key-not-found
    val allNull = df.withColumn("c", lit(null).cast("double"))
    val e = intercept[IllegalArgumentException] {
      Ranks.percentileSelect(allNull, Seq("a", "c"), Seq(0.5))
    }
    assert(e.getMessage.contains("'c' has no non-NULL values"),
      e.getMessage)
    // a non-numeric column fails loudly like aggregate percentile would
    // (the cast would otherwise silently NULL every value)
    val withStr = df.withColumn("s", lit("x"))
    val eS = intercept[IllegalArgumentException] {
      Ranks.percentileSelect(withStr, Seq("s"), Seq(0.5))
    }
    assert(eS.getMessage.contains("not numeric"), eS.getMessage)
    val eM = intercept[IllegalArgumentException] {
      Ranks.percentileSelect(df, Seq("nope"), Seq(0.5))
    }
    assert(eM.getMessage.contains("not in schema"), eM.getMessage)
  }

  test("quantileSelect derives n and the ranks from ONE materialization " +
      "(a separate count() can disagree with a re-executed rank pass)") {
    // an input whose row set is only pinned by materialization: under
    // the old separate df.count(), n came from one execution and the
    // ranks from another — any disagreement (the sampled-boundary class
    // globalRowNumber's comment documents) made a target rank miss the
    // rank pass entirely (bare key-not-found) or silently shift
    // quantiles. With the persisted projection both derive from the
    // same cached rows, so this must return an in-range, monotone
    // quantile set every time.
    val df = spark.range(1, 10001)
      .select(col("id"), col("id").cast("double").as("v"))
      .sample(0.5)
    (1 to 3).foreach { _ =>
      val q = Ranks.quantileSelect(df, "v", "id", Seq(2500, 5000, 9999))
      assert(q.values.forall(v => v >= 1.0 && v <= 10000.0))
      assert(q(2500) <= q(5000) && q(5000) <= q(9999))
    }
  }

}
