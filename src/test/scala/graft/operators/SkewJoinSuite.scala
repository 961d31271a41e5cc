package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSuite extends SparkSpec {
  import spark.implicits._

  // heavy skew: key 1 holds 80% of the big side
  private lazy val big = (1 to 5000).map { i =>
    (if (i <= 4000) 1L else (i % 40).toLong, i.toDouble)
  }.toDF("k", "v")
  private lazy val small = (0L to 40L).map(k => (k, s"dim$k")).toDF("k", "name")

  test("salted join returns exactly the plain join's rows") {
    val plain = big.join(small, Seq("k"), "inner")
      .select("k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    val salted = SkewJoin.saltedJoin(big, small, "k", factor = 8)
      .select("k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    assert(salted === plain)
  }

  test("left join preserves unmatched big-side rows") {
    val bigExtra = big.union(Seq((999L, -1.0)).toDF("k", "v"))
    val res = SkewJoin.saltedJoin(bigExtra, small, "k", 4, "left")
    assert(res.filter(col("k") === 999L).count() === 1L)
    assert(res.filter(col("k") === 999L).select("name").head().isNullAt(0))
  }

  test("hotKeys flags the dominant key") {
    val hot = SkewJoin.hotKeys(big, "k", threshold = 0.5)
      .select("k").as[Long].collect()
    assert(hot.toSeq === Seq(1L))
  }

  test("hotKeys computes the total without a global window (no " +
      "single-partition funnel on high-cardinality keys)") {
    val plan = SkewJoin.hotKeys(big, "k", threshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"hotKeys must not route grouped counts through a global window:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"expected the 1-row total to come back as a broadcast:\n$plan")
  }

  test("salt spreads the hot key across partitions") {
    val salted = big.withColumn("__salt", (rand(42L) * 8).cast("int"))
    val spread = salted.filter(col("k") === 1L)
      .groupBy("__salt").count().count()
    assert(spread === 8L)
  }
}
