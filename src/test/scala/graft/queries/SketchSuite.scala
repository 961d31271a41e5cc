package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Tables.load

/** Sketch-aggregate checks: HLL approx-distinct within its error bound
  * and determinism of the interpolated percentile. */
class SketchSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact") {
    val r = load(spark, sf, "lineitem").agg(
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx"),
      countDistinct(col("l_orderkey")).as("exact")).head()
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("percentile is deterministic across partitionings") {
    val li = load(spark, sf, "lineitem")
    def p50(parts: Int) = li.repartition(parts)
      .agg(expr("percentile(l_extendedprice, 0.5)")).head().getDouble(0)
    assert(p50(1) === p50(7))
  }
}
