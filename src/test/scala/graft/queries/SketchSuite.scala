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

  test("a15's realized HLL relative error stays within the graded 5σ " +
      "bound at two SFs (the engine-specific number the hash-graded " +
      "boolean pins; r14-verdict task 5)") {
    // the graded row only carries the boolean; the suite is where the
    // realized error is visible and asserted against the same bound
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val r = load(spark, d, "lineitem").agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx"),
        countDistinct(col("l_orderkey")).as("exact")).head()
      val relErr = math.abs(r.getLong(0).toDouble - r.getLong(1)) /
        r.getLong(1)
      info(f"$d: rel_err = $relErr%.5f (bound 0.10)")
      assert(relErr <= 0.10, s"$d: rel_err $relErr exceeds the 5σ bound")
      // and the graded query itself must report the pinned invariant
      val row = Catalog.queries("a15_approx_distinct")(spark, d).head()
      assert(row.getAs[Boolean]("within_5sigma"),
        s"$d: graded within_5sigma flipped false")
    }
  }

  test("percentile is deterministic across partitionings") {
    val li = load(spark, sf, "lineitem")
    def p50(parts: Int) = li.repartition(parts)
      .agg(expr("percentile(l_extendedprice, 0.5)")).head().getDouble(0)
    assert(p50(1) === p50(7))
  }

  test("count-min sketch never under-counts and stays within eps·N") {
    val li = load(spark, sf, "lineitem")
    val n = li.count()
    val eps = 0.001
    val cms = li.stat.countMinSketch(col("l_suppkey"),
      eps = eps, confidence = 0.99, seed = 42)
    val exact = li.groupBy("l_suppkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"CMS under-counted key $k: $est < $c")
      assert(est <= c + (eps * n).ceil.toLong + 1,
        s"CMS over-count beyond eps*N for key $k: $est vs $c (N=$n)")
    }
  }

  test("a18/a19 self-validating columns are all true (the rows-only invariant)") {
    // the catalog queries themselves carry their error bounds as columns;
    // these assertions are keyed to the exact same bounds, so the driver's
    // rows-only check and this suite check one and the same contract
    val a18 = Catalog.queries("a18_cms_frequency")(spark, sf)
    assert(a18.filter(!col("no_undercount") || !col("within_bound")).isEmpty,
      "a CMS estimate violated its own emitted bound")
    val a19 = Catalog.queries("a19_bloom_membership")(spark, sf).head()
    assert(a19.getAs[Boolean]("no_false_negatives"),
      "Bloom reported a present key absent")
    assert(a19.getAs[Boolean]("fp_within_bound"),
      s"Bloom false-positive count ${a19.getAs[Int]("false_pos")} above bound")
  }

  test("bloom filter has no false negatives; false positives near fpp") {
    val ords = load(spark, sf, "orders")
    val present = ords.select("o_orderkey").collect().map(_.getLong(0))
    // capacity from the real key count — a fixed size saturates at
    // larger inputs and silently voids the fpp contract (same sizing
    // rule as a19)
    val bf = ords.stat.bloomFilter(col("o_orderkey"), present.length.toLong, 0.03)
    assert(present.forall(bf.mightContain),
      "a present key reported absent — Bloom contract broken")
    val absentProbes = (1L to 2000L).map(_ + present.max)
    val fp = absentProbes.count(bf.mightContain)
    // fpp 0.03 with slack: 2000 probes ⇒ expect ~60, fail above 5×
    assert(fp <= absentProbes.length * 0.15,
      s"false-positive rate ${fp.toDouble / absentProbes.length}")
  }
}
