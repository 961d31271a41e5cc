package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-10 sampler additions: stratified k-fold balance/determinism and
  * temperature-scaled mixture targets. */
class SamplersRound10Suite extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.range(1000).select(
    col("id").as("doc_id"),
    concat(lit("s"), (col("id") % 7).cast("string")).as("stratum"))

  test("kFoldStratified: exact per-stratum balance, folds differ by <= 1") {
    val sizes = Samplers.kFoldStratified(docs, "stratum", "doc_id", k = 5)
      .groupBy("stratum", "fold").count()
      .groupBy("stratum")
      .agg((max("count") - min("count")).as("spread"),
        countDistinct("fold").as("nf"))
      .as[(String, Long, Long)].collect()
    assert(sizes.length === 7)
    assert(sizes.forall(_._2 <= 1), sizes.mkString(","))
    assert(sizes.forall(_._3 === 5L))
  }

  test("kFoldStratified is partitioning-invariant (portable hash + id tiebreak)") {
    val a = Samplers.kFoldStratified(docs, "stratum", "doc_id", k = 4)
      .select("doc_id", "fold").as[(Long, Int)].collect().sortBy(_._1)
    val b = Samplers.kFoldStratified(docs.repartition(17), "stratum",
        "doc_id", k = 4)
      .select("doc_id", "fold").as[(Long, Int)].collect().sortBy(_._1)
    assert(a === b)
  }

  test("temperatureMixture: alpha=0.5 up-weights small sources; counts match closed form") {
    // two sources, 900 vs 100 rows: plain mixing gives 9:1, sqrt gives 3:1
    val df = spark.range(1000).select(col("id"),
      when(col("id") < 900, "big").otherwise("small").as("src"))
    val got = Samplers.temperatureMixture(df, "src", alpha = 0.5,
        nTotal = 200, seed = 5)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    // w_big = 30, w_small = 10, Z = 40 → n_big = 150, n_small = 50
    assert(got === Map("big" -> 150L, "small" -> 50L))
  }

  test("temperatureMixture: alpha=1 reproduces proportional allocation; clamps to group size") {
    val df = spark.range(110).select(col("id"),
      when(col("id") < 100, "a").otherwise("b").as("src"))
    val got = Samplers.temperatureMixture(df, "src", alpha = 1.0,
        nTotal = 220, seed = 5)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    // targets 200/20 — both clamp to the group sizes
    assert(got === Map("a" -> 100L, "b" -> 10L))
  }

  test("temperatureMixture selection is deterministic across reruns") {
    val df = spark.range(500).select(col("id"),
      (col("id") % 3).cast("string").as("src"))
    def ids = Samplers.temperatureMixture(df, "src", 0.5, 90, seed = 11)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids === ids)
    val again = Samplers.temperatureMixture(df.repartition(7), "src",
      0.5, 90, seed = 11).select("id").as[Long].collect().sorted.toSeq
    assert(ids === again)
  }

  test("ppsPoisson: valid inclusion probs, size-biased, deterministic, " +
      "zero-size rows never drawn") {
    val df = spark.range(1, 5001).toDF("id")
      .withColumn("x", (col("id") % 100).cast("double"))
    val s = Samplers.ppsPoisson(df, "x", "id", targetN = 200)
    val rows = s.select("id", "x", "pi").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.forall { case (_, _, pi) => pi > 0.0 && pi <= 1.0 })
    assert(rows.forall { case (_, x, _) => x > 0.0 }) // π=0 excluded
    // E[n] ≈ 200 (slightly less via the min(1, ·) clamp); loose band
    assert(rows.length > 120 && rows.length < 280, s"drew ${rows.length}")
    // size-biased: mean size of the sample exceeds the population mean
    val popMean = (0 until 100).sum / 100.0
    val sampMean = rows.map(_._2).sum / rows.length
    assert(sampMean > popMean * 1.2, s"$sampMean vs $popMean")
    val again = Samplers.ppsPoisson(df.repartition(7), "x", "id", 200)
      .select("id").as[Long].collect().sorted.toSeq
    assert(again === rows.map(_._1).sorted.toSeq) // bit-identical draw
  }

  test("systematic: exact interval sizes, starts partition the frame, " +
      "deterministic") {
    val df = spark.range(1, 1001).toDF("id")
    val k = 7
    val parts = (0 until k).map(s0 =>
      Samplers.systematic(df, "id", k, s0)
        .select("id").as[Long].collect().toSet)
    assert(parts.head.size === 143) // ceil(1000/7)
    assert(parts.map(_.size).sum === 1000)
    assert(parts.reduce(_ ++ _).size === 1000) // disjoint + exhaustive
    val again = Samplers.systematic(df.repartition(9), "id", k)
      .select("id").as[Long].collect().toSet
    assert(again === parts.head)
  }

  test("doremiReweight: at-or-above-mean domains keep boost 1, a domain " +
      "one unit below the mean gets the softmax e-fold up-weight") {
    val quantum = 1048576L
    // A: 2 docs at score 0 (above the global mean); B: 2 docs one full
    // un-quantized unit lower — lam_A = 0, lam_B = 1 exactly
    val scored = Seq(("A", 0L), ("A", 0L),
      ("B", -2L * quantum), ("B", -2L * quantum)).toDF("dom", "s")
    val out = Samplers.doremiReweight(scored, "dom", "s")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val Seq(a, b) = out
    assert(a._2 == 2L && b._2 == 2L)
    assert(a._3 == quantum) // exp(0) = 1 requantizes to exactly 2^20
    assert(b._3 == math.floor(math.exp(1.0) * quantum + 0.5).toLong)
    // equal domain sizes reduce the update to softmax(0, 1): the
    // boost ratio is e up to one quantum of libm requantization
    assert(math.abs(b._3.toDouble / a._3 - math.exp(1.0)) < 1e-6)
    assert(math.abs(a._4 + b._4 - 1.0) < 1e-12)
    assert(b._4 > a._4) // the harder domain is up-weighted
    // partitioning-invariant: same table under a different layout
    val again = Samplers.doremiReweight(scored.repartition(7), "dom", "s")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(again === out)
  }

  test("doremiReweight fails loudly on NULL scores and on boost overflow") {
    val withNull = Seq(("A", java.lang.Long.valueOf(1L)),
      ("B", null.asInstanceOf[java.lang.Long])).toDF("dom", "s")
    val e1 = intercept[Exception] {
      Samplers.doremiReweight(withNull, "dom", "s").collect()
    }
    assert(e1.getMessage.contains("NULL in score column"),
      e1.getMessage)
    // lam_B = 45 un-quantized units -> exp(45)*2^20 >> Long.MaxValue:
    // the pre-cast guard must raise rather than saturate silently
    val q = 1048576L
    val huge = Seq(("A", 0L), ("A", 0L),
      ("B", -90L * q), ("B", -90L * q)).toDF("dom", "s")
    val e2 = intercept[Exception] {
      Samplers.doremiReweight(huge, "dom", "s").collect()
    }
    assert(e2.getMessage.contains("overflows long"), e2.getMessage)
  }

  test("shardCensus: every shard emits a grid row, totals add up, the " +
      "assignment matches the portable hash, and NULL ids raise") {
    val df = (0L until 40L).map(i => (i, 10L)).toDF("id", "w")
    val out = Samplers.shardCensus(df, "id", "w", nShards = 8)
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(out.map(_._1) == (0 until 8))          // full grid, ordered
    assert(out.map(_._2).sum == 40L)
    assert(out.map(_._3).sum == 400L)
    // independent replay of the assignment rule
    val want = (0L until 40L)
      .groupBy(i => ((i % 100000007L) * 1315423911L % 100000007L % 8).toInt)
      .view.mapValues(_.size.toLong).toMap
    out.foreach { case (sh, nd, nt, lr) =>
      assert(nd == want.getOrElse(sh, 0L), s"shard $sh")
      assert(nt == nd * 10L)
      assert(lr == (nt * 8).toDouble / 400.0)
    }
    val withNull = Seq((java.lang.Long.valueOf(1L), 1L),
      (null.asInstanceOf[java.lang.Long], 1L)).toDF("id", "w")
    val e = intercept[Exception] {
      Samplers.shardCensus(withNull, "id", "w", 4).collect()
    }
    assert(e.getMessage.contains("NULL in id column"), e.getMessage)
  }

  test("epochMix: hand-checked shares, cap engagement, and NULL raise") {
    // T = (100, 400): w = (10, 20), z = 30, B = 2 * 500 = 1000
    // raw_A = (10/30)*1000/100 = 3.333..; raw_B = (20/30)*1000/400 = 1.666..
    val df = (0 until 100).map(_ => ("A", 1L)) ++
      (0 until 100).map(_ => ("B", 4L))
    val zSum = 10.0 + 20.0 // dsum over exact-decimal(38,10) of 10.0, 20.0
    val rawA = 10.0 / zSum * 1000.0 / 100.0
    val rawB = 20.0 / zSum * 1000.0 / 400.0
    // collect as tuples keyed by domain
    val byDom = Samplers.epochMix(df.toDF("dom", "w"), "dom", "w", 2L, 4.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getInt(4))).toMap
    assert(byDom("A") == ((100L, rawA, math.floor(rawA * 100.0 + 0.5).toLong, 0)))
    assert(byDom("B") == ((400L, rawB, math.floor(rawB * 400.0 + 0.5).toLong, 0)))
    // a tight cap engages: maxEpochs = 2 caps domain A
    val capped = Samplers.epochMix(df.toDF("dom", "w"), "dom", "w", 2L, 2.0)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getLong(3), r.getInt(4))).toMap
    assert(capped("A") == ((2.0, 200L, 1)))
    assert(capped("B")._3 == 0)
    val withNull = Seq(("A", java.lang.Long.valueOf(1L)),
      ("B", null.asInstanceOf[java.lang.Long])).toDF("dom", "w")
    val e = intercept[Exception] {
      Samplers.epochMix(withNull, "dom", "w", 2L, 4.0).collect()
    }
    assert(e.getMessage.contains("NULL in weight column"), e.getMessage)
    val nullDom = Seq((Option("A"), 1L), (Option.empty[String], 1L))
      .toDF("dom", "w")
    val e2 = intercept[Exception] {
      Samplers.epochMix(nullDom, "dom", "w", 2L, 4.0).collect()
    }
    assert(e2.getMessage.contains("NULL in domain column"), e2.getMessage)
  }
  test("r14 guards: non-positive weights, NULL strata/groups, and " +
      "missing-target strata raise instead of silently biasing") {
    val negW = Seq((1L, 1.0), (2L, -1.0)).toDF("id", "w")
    val e1 = intercept[Exception] {
      Samplers.weightedExact(negW, col("w"), n = 1, seed = 7L).collect()
    }
    assert(e1.getMessage.contains("weight must be > 0"), e1.getMessage)

    val nullStratum = Seq((1L, Option("a")), (2L, None: Option[String]))
      .toDF("id", "h")
    val e2 = intercept[Exception] {
      Samplers.stratifiedExact(nullStratum, "h", nTotal = 1, seed = 7L)
        .collect()
    }
    assert(e2.getMessage.contains("NULL in stratum column"), e2.getMessage)

    val e3 = intercept[Exception] {
      Samplers.temperatureMixture(nullStratum, "h", alpha = 0.5,
        nTotal = 1, seed = 7L).collect()
    }
    assert(e3.getMessage.contains("NULL in group column"), e3.getMessage)

    // a stratum absent from targets used to vanish wholesale (inner
    // join) — it must now name itself
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "h")
    val targets = Seq(("a", 1.0)).toDF("h", "target")
    val e4 = intercept[Exception] {
      Samplers.stratifiedBernoulliAdjusted(df, "h", "id", lit(0.5),
        targets, seed = 7L).collect()
    }
    assert(e4.getMessage.contains("stratum missing from targets"),
      e4.getMessage)
  }

}
