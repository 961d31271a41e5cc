package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

class JaccardPrefilterSuite extends SparkSpec {
  import spark.implicits._

  // parquet-backed pairs (a LocalRelation would be constant-folded away
  // before the user optimizer batch ever sees the filter)
  private def query = {
    val sh = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("sh"))
    val a = sh.select(col("doc_id").as("ia"), col("sh").as("sa"))
    val b = sh.select(col("doc_id").as("ib"), col("sh").as("sb"))
    a.join(b, col("ib") === col("ia") + 1)
      .filter(Dedup.jaccard(col("sa"), col("sb")) >= 0.5)
      .select("ia", "ib")
  }

  test("rule injects the size-ratio guard, preserves results, idempotent") {
    val before = query.collect().toSeq
    val saved = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = saved :+ JaccardPrefilterRule
      val optimized = query
      val optPlan = optimized.queryExecution.optimizedPlan.toString
      assert(optPlan.contains("(0.5 * cast(size("), optPlan)
      assert(optimized.collect().toSeq === before)
      // idempotence: exactly one guard pair despite the fixpoint batch
      assert("\\(0\\.5 \\* cast\\(size\\(sa".r.findAllIn(optPlan).size === 1,
        optPlan)
    } finally spark.experimental.extraOptimizations = saved
  }

  test("duplicate-bearing arrays are NOT rewritten (results preserved)") {
    // a=[s], b=[s,s,s]: SET Jaccard (what size(intersect)/size(union)
    // computes — both dedupe) is 1.0, but a raw-length guard
    // size(a) >= 0.5*size(b) is 1 >= 1.5 = false and would silently
    // drop every row. The rule must leave this predicate alone.
    def q = {
      val base = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), substring(col("text"), 1, 1).as("s"))
      base
        .select(col("doc_id"), array(col("s")).as("sa"),
          array(col("s"), col("s"), col("s")).as("sb"))
        .filter(Dedup.jaccard(col("sa"), col("sb")) >= 0.5)
        .select("doc_id")
    }
    val before = q.collect().toSeq
    assert(before.nonEmpty) // the trap only bites if rows exist to drop
    val saved = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = saved :+ JaccardPrefilterRule
      val opt = q
      val optPlan = opt.queryExecution.optimizedPlan.toString
      assert(!optPlan.contains("(0.5 * cast(size("), optPlan)
      assert(opt.collect().toSeq === before)
    } finally spark.experimental.extraOptimizations = saved
  }

  test("array_distinct-wrapped arrays still get the guard") {
    def q = {
      val base = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("w"))
      val a = base.select(col("doc_id").as("ia"), col("w").as("wa"))
      val b = base.select(col("doc_id").as("ib"), col("w").as("wb"))
      a.join(b, col("ib") === col("ia") + 1)
        .filter(Dedup.jaccard(col("wa"), col("wb")) >= 0.5)
        .select("ia", "ib")
    }
    val before = q.collect().toSeq
    val saved = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = saved :+ JaccardPrefilterRule
      val opt = q
      val optPlan = opt.queryExecution.optimizedPlan.toString
      assert(optPlan.contains("(0.5 * cast(size("), optPlan)
      assert(opt.collect().toSeq === before)
    } finally spark.experimental.extraOptimizations = saved
  }

  test("union of a distinct and a duplicate-bearing branch: only the " +
      "safe branch is rewritten") {
    // Union.output reuses the FIRST child's exprIds — naively following
    // the lineage would see the first branch's array_distinct and wrongly
    // bless rows that also flow from the duplicate-bearing second branch.
    // (Catalyst usually pushes the filter below the union first, in which
    // case each branch is judged on its own arrays — the safe branch may
    // gain the guard, the raw branch must not; if the filter stays above
    // the union, the producers() blacklist blocks the rewrite entirely.)
    def q = {
      val base = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), substring(col("text"), 1, 1).as("s"))
      val clean = base.select(col("doc_id"),
        array_distinct(array(col("s"), col("s"))).as("sa"),
        array_distinct(array(col("s"))).as("sb"))
      val dup = base.select(col("doc_id") + 100000,
        array(col("s")).as("sa"),
        array(col("s"), col("s"), col("s")).as("sb"))
      clean.union(dup)
        .filter(Dedup.jaccard(col("sa"), col("sb")) >= 0.5)
        .select("doc_id")
    }
    val before = q.collect().toSeq
    assert(before.nonEmpty)
    val saved = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = saved :+ JaccardPrefilterRule
      val opt = q
      val optPlan = opt.queryExecution.optimizedPlan.toString
      // the raw-array guard (no array_distinct inside the size) must
      // never appear — it is the semantics-changing rewrite
      assert(!optPlan.contains("* cast(size(array(substring"), optPlan)
      assert(opt.collect().toSeq === before)
    } finally spark.experimental.extraOptimizations = saved
  }

  test("guard math: size ratio below threshold implies jaccard below it") {
    // the rewrite must never drop a qualifying pair: exhaustive check on
    // small sizes — if min/max < t then J < t
    for (na <- 1 to 8; nb <- 1 to 8; inter <- 0 to math.min(na, nb)) {
      val j = inter.toDouble / (na + nb - inter)
      val ratio = math.min(na, nb).toDouble / math.max(na, nb)
      if (ratio < 0.5) assert(j < 0.5, s"($na,$nb,$inter)")
    }
  }
}
