package graft.queries

import graft.SparkSpec

/** Physical-plan assertions for the scale-critical properties
  * (SCALE.md): filters and projections reach the parquet scan, small
  * joins broadcast, membership tests are semi-joins, aggregations run
  * inside whole-stage codegen. Guards against regressions that would
  * only show up as silent slowdowns at scale. */
class PlanSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    Catalog.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("p09: predicate pushed down to the parquet scan") {
    val p = plan("p09_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag)") ||
      p.contains("EqualTo(l_returnflag,R)"), p.take(2000))
  }

  test("p01: column pruning reaches the scan (ReadSchema only 3 cols)") {
    val p = plan("p01_select")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("c_custkey") && read.contains("c_name") &&
      read.contains("c_mktsegment"))
    assert(!read.contains("c_acctbal") && !read.contains("c_address"),
      read)
  }

  test("j02: dimension joins are broadcast-hash, not sort-merge") {
    val p = plan("j02_left_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("p10: %in% membership plans as a LeftSemi join") {
    val p = plan("p10_semijoin")
    assert(p.contains("LeftSemi"), p.take(2000))
  }

  test("a07: grouped aggregation is hash-based with map-side partial agg") {
    // (AQE shows codegen spans only in the final executed plan; the
    // partial_* functions prove the map-side combine before the shuffle)
    val p = plan("a07_grouped_agg")
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(p.contains("partial_sum"), p.take(2000))
  }

  test("e02: native dot-product expression appears in the plan (no HOF lambda)") {
    val p = plan("e02_embed_neardup")
    assert(p.contains("float_vec_dot"), p.take(3000))
  }

  test("e02: candidates come from a bucket equi-join, never all-pairs") {
    // Round-6 verdict item: the embedding near-dup default must be the
    // LSH-bucketed shape — a hash-shuffle equi-join on (table, bucket)
    // that AQE can skew-split — not a theta-join BroadcastNestedLoopJoin
    // whose pair space is quadratic in the corpus.
    val p = plan("e02_embed_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("Generate"), p.take(3000)) // posexplode bucket rows
  }

  test("t10: BM25 aggregates by document — nothing token-keyed shuffles") {
    // the skew-free property BM25 is designed around: a Zipfian
    // stopword in the query must cost nothing, so no exchange may
    // hash-partition on the token and no window may group by it
    val p = plan("t10_bm25_retrieval")
    assert(!p.contains("hashpartitioning(tok"), p.take(3000))
    assert(p.contains("partial_count"), p.take(3000)) // map-side combine
  }

  test("j05: as-of join is union+window — no join operator, no range fan-out") {
    // the whole as-of resolution must be ONE keyed window over a union;
    // any *Join node would mean the O(left·right) pair space came back
    val p = plan("j05_asof_join")
    assert(p.contains("Window"), p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
  }

  test("j06: range join is an equi-join on (key, bucket) — never nested-loop") {
    val p = plan("j06_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(3000))
  }

  test("t07: tf computes once (cached) and df is an aggregate+join, " +
      "never a tok-partitioned window") {
    // Two skew/cost hazards, both measured before pinning this shape:
    // (a) without the persist, the tf subtree feeds two branches and
    // exchange reuse does NOT fire — two full corpus scans; (b) a
    // Window.partitionBy(tok) df puts a stopword's every (doc, tok) row
    // into ONE task's window group (windows cannot skew-split; the
    // join's shuffle can, via AQE).
    val p = plan("t07_tfidf_topterms")
    assert(p.contains("InMemoryTableScan"),
      s"tf frame must be cached:\n${p.take(3000)}")
    // the only window allowed is the per-doc top-k rank
    assert(!p.contains("windowspecdefinition(tok"),
      s"df must not be a tok-partitioned window:\n${p.take(3000)}")
  }

  test("a16: all rollup grouping sets ride ONE Expand + aggregate") {
    val p = plan("a16_rollup")
    assert(p.contains("Expand"), p.take(2000))
    assert(p.contains("partial_count"), p.take(2000))
  }

  test("j07: set subtraction plans as LeftAnti — no row multiplication") {
    val p = plan("j07_anti_join")
    assert(p.contains("LeftAnti"), p.take(2000))
  }

  test("e03: recall-validated ANN queries cache their shared subtrees") {
    // withExactRecall feeds the ANN result and the exact oracle into
    // two branches each; without the persists both pipelines execute
    // twice (measured ~2× on e03/e04/e07/e08 — round-8 review fix)
    val p = plan("e03_ann_lsh_topk")
    assert(p.contains("InMemoryTableScan"), p.take(3000))
  }

  test("e08: IVF-PQ probe join broadcasts; candidate side never all-pairs") {
    // The composed path's scale contract: the (query, cell) probe frame
    // is broadcast (candidates never shuffle to meet it), scoring is
    // the fused per-pair ADC lookup, and no nested-loop/cartesian pair
    // space ever forms.
    val p = plan("e08_ann_ivfpq_topk")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("pq_adc_cosine_at"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }
}
