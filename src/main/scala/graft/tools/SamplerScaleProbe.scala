package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Samplers
import graft.stats.Replication

/** Planted-truth scale legs for the round-10 operators:
  *
  *  1. capPerGroup on a deliberately skewed corpus — one "domain" holds
  *     half the rows (the Zipf head every real crawl has). The claim
  *     under test: the WindowGroupLimit rewrite keeps the hot group's
  *     shuffle contribution at cap × #tasks, so wall time is scan-bound,
  *     not hot-partition-bound. Output sizes are asserted exactly.
  *  2. jk1Mean / jknMean at the same scale — the replicate variances
  *     must cost ONE aggregation pass regardless of PSU count.
  *  3. the exact-n path switch: srsExact's two renditions — the
  *     TakeOrderedAndProject limit path and the distributed-rank path
  *     the operator auto-selects at n ≥ exactNSwitch — must pick the
  *     IDENTICAL row multiset at n = 5M (the key is a total order up
  *     to hash ties). (The rank path's no-driver-funnel property is a
  *     plan shape, pinned by PlanSuite, not re-asserted here.)
  *
  * Run: sbt "runMain graft.tools.SamplerScaleProbe [nRows]"
  */
object SamplerScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // half the corpus in domain 0; the rest spread over 1000 domains
    val df = spark.range(n).select(col("id"),
      when(col("id") % 2 === 0, lit(0L))
        .otherwise(pmod(hash(col("id")), lit(1000L)) + 1L).as("grp"))

    val cap = 1000
    val t0 = System.nanoTime()
    val out = Samplers.capPerGroup(df, "grp", "id", cap)
      .groupBy("grp").count()
      .agg(count(lit(1)).as("groups"), max("count").as("maxPerGroup"),
        sum("count").as("kept"))
      .head()
    val tCap = (System.nanoTime() - t0) / 1e9
    val (groups, maxPer, kept) =
      (out.getLong(0), out.getLong(1), out.getLong(2))
    assert(maxPer <= cap, s"group exceeded cap: $maxPer")
    println(f"capPerGroup: N=$n%,d hot-domain=${n / 2}%,d cap=$cap " +
      f"-> kept=$kept%,d across $groups%,d groups " +
      f"(max $maxPer) in $tCap%.1fs")

    val withY = df.withColumn("y", (col("id") % 97).cast("double"))
      .withColumn("w", lit(1.0) + (col("id") % 5).cast("double"))
    val t1 = System.nanoTime()
    val jk1 = Replication.jk1Mean(withY, col("y"), col("w"),
      pmod(col("id"), lit(500L))).head()
    val tJk1 = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val jkn = Replication.jknMean(withY, col("y"), col("w"),
      pmod(col("id"), lit(20L)), pmod(col("id"), lit(500L))).head()
    val tJkn = (System.nanoTime() - t2) / 1e9
    println(f"jk1Mean: 500 PSUs over $n%,d rows -> mean=" +
      f"${jk1.getAs[Double]("mean_y")}%.4f se=" +
      f"${math.sqrt(jk1.getAs[Double]("var_jk"))}%.6f in $tJk1%.1fs; " +
      f"jknMean: 20 strata x 25 PSUs -> se=" +
      f"${math.sqrt(jkn.getAs[Double]("var_jkn"))}%.6f in $tJkn%.1fs")

    // leg 3: both exact-n paths on the same keyed frame at n = 5M —
    // forced through each path via switchAt, compared as multisets
    val nSample = math.min(5000000L, n / 4).toInt
    val pop = spark.range(n).select(col("id"))
    val key = xxhash64(col("id"), lit(42L))
    val tie = xxhash64(col("id"), lit(43L))
    val t3 = System.nanoTime()
    // persist both samples: each feeds a count plus two exceptAll
    // branches — unpersisted, every branch would re-run its full
    // 20M-row sort/rank pipeline (~3×) and inflate the reported time
    val viaLimit = Samplers.keepTopNByKey(pop, key, tie, nSample,
      switchAt = Int.MaxValue)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val viaRank = Samplers.keepTopNByKey(pop, key, tie, nSample,
      switchAt = 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (nLimit, nRank, nDiff) =
      try {
        (viaLimit.count(), viaRank.count(),
          viaLimit.exceptAll(viaRank)
            .union(viaRank.exceptAll(viaLimit)).count())
      } finally { viaLimit.unpersist(); viaRank.unpersist() }
    val tSwitch = (System.nanoTime() - t3) / 1e9
    assert(nLimit == nSample && nRank == nSample,
      s"exact-n sizes: limit=$nLimit rank=$nRank want=$nSample")
    assert(nDiff == 0, s"exact-n paths disagree on $nDiff rows")
    println(f"exactN switch: n=$nSample%,d of $n%,d -> " +
      f"limit=$nLimit%,d rank=$nRank%,d diff=$nDiff in $tSwitch%.1fs")
    spark.stop()
  }
}
