package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ann
import graft.queries.AnnQueries

/** Single-session A/B isolating the apparent e03 regression
  * (BENCH_r10 1.56 s vs BENCH_r08 0.64 s at sf0.1).
  *
  * Hypothesis: round 8's number was a CACHE-LEAK ARTIFACT, not a faster
  * operator. The round-8 `withExactRecall` returned a lazy frame whose
  * `res`/`exact` subtrees stayed persisted after the bench's noop write;
  * the bench's min-of-2 then timed the SECOND pass against warm caches
  * (the ANN pipeline and the exact oracle never re-ran). The round-9/10
  * eager-collect + unpersist discipline (adopted to stop unbounded cache
  * accumulation across a 200-query session) makes BOTH passes pay full
  * cost — so min-of-2 now reports the honest cold time.
  *
  * The probe times, in ONE session at the given SF dir:
  *   A. current e03 shape (eager validate + unpersist), twice;
  *   B. the round-8 lazy shape, twice, withOUT unpersisting between the
  *      two runs (exactly the bench's min-of-2 conditions at r8);
  *   C. the bare annTopK operator (no validation), twice.
  * Expected: A flat across runs ≈ B run 1; B run 2 ≪ B run 1 (the leak);
  * C ≈ the operator's true cost. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.AnnAbProbe"
  */
object AnnAbProbe {

  /** The round-8 lazy withExactRecall, verbatim shape: persists both
    * subtrees and returns the joined frame WITHOUT eager collect or
    * unpersist. Kept private to the probe — the production path is
    * AnnQueries.withExactRecall. */
  private def lazyWithExactRecall(res0: DataFrame, queries: DataFrame,
                                  cand: DataFrame, k: Int,
                                  strongThr: Double,
                                  floor: Double): DataFrame = {
    val res = res0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = cand.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val win = Window.partitionBy("qid").orderBy(desc("cos_x"), col("cid"))
    val exact = broadcast(q).crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        Ann.cosine(col("qe"), col("ce")).cast("float").as("cos_x"))
      .withColumn("rk_x", row_number().over(win))
      .filter(col("rk_x") <= k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perQ = exact
      .join(res.select(col("qid"), col("cid"), lit(1).as("f")),
        Seq("qid", "cid"), "left")
      .groupBy("qid").agg(
        sum(coalesce(col("f"), lit(0))).as("n_exact_found"),
        sum((col("cos_x") >= strongThr).cast("int")).as("n_strong"),
        sum(((col("cos_x") >= strongThr).cast("int") *
          coalesce(col("f"), lit(0)))).as("n_strong_found"))
    res.join(exact.select(col("qid"), col("cid"), lit(1).as("in_exact_topk")),
        Seq("qid", "cid"), "left")
      .withColumn("in_exact_topk", coalesce(col("in_exact_topk"), lit(0)))
      .join(perQ, Seq("qid"))
      .withColumn("query_recall", col("n_exact_found").cast("double") / k)
      .withColumn("strong_recall",
        when(col("n_strong") === 0, lit(1.0))
          .otherwise(col("n_strong_found").cast("double") / col("n_strong")))
      .withColumn("recall_ok", col("strong_recall") >= floor)
      .drop("n_exact_found", "n_strong", "n_strong_found")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()

    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def q = emb.filter(col("vec_id") < 10)
    def time(label: String)(mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[ab] $label%-28s $s%6.2f s")
      s
    }

    // A: current (eager validate + unpersist) — both runs honest
    val a1 = time("current_run1") {
      AnnQueries.withExactRecall(
        Ann.annTopK(q, emb, "vec_id", "embedding", dim = 64, k = 5,
          bits = 6, tables = 64), q, emb, k = 5, strongThr = 0.45,
        floor = 1.0).orderBy("qid", "rk")
    }
    val a2 = time("current_run2") {
      AnnQueries.withExactRecall(
        Ann.annTopK(q, emb, "vec_id", "embedding", dim = 64, k = 5,
          bits = 6, tables = 64), q, emb, k = 5, strongThr = 0.45,
        floor = 1.0).orderBy("qid", "rk")
    }

    // B: round-8 lazy shape, caches deliberately LEFT warm between runs
    val b1 = time("r8lazy_run1") {
      lazyWithExactRecall(
        Ann.annTopK(q, emb, "vec_id", "embedding", dim = 64, k = 5,
          bits = 6, tables = 64), q, emb, k = 5, strongThr = 0.45,
        floor = 1.0).orderBy("qid", "rk")
    }
    val b2 = time("r8lazy_run2_warmcache") {
      lazyWithExactRecall(
        Ann.annTopK(q, emb, "vec_id", "embedding", dim = 64, k = 5,
          bits = 6, tables = 64), q, emb, k = 5, strongThr = 0.45,
        floor = 1.0).orderBy("qid", "rk")
    }
    spark.sharedState.cacheManager.clearCache()

    // C: bare operator, no validation
    val c1 = time("bare_annTopK_run1") {
      Ann.annTopK(q, emb, "vec_id", "embedding", dim = 64, k = 5,
        bits = 6, tables = 64).orderBy("qid", "rk")
    }
    val c2 = time("bare_annTopK_run2") {
      Ann.annTopK(q, emb, "vec_id", "embedding", dim = 64, k = 5,
        bits = 6, tables = 64).orderBy("qid", "rk")
    }

    println(f"""[ab] summary current=${math.min(a1, a2)}%.2f """ +
      f"""r8lazy_min2=${math.min(b1, b2)}%.2f (run1=$b1%.2f run2=$b2%.2f) """ +
      f"""bare=${math.min(c1, c2)}%.2f""")
    spark.stop()
  }
}
