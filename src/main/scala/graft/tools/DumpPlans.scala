package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.queries.Catalog

/** Writes PLANS.md: the formatted physical plan of each flagship query,
  * so the scale-critical properties (pushed filters, pruned schemas,
  * broadcast joins, partial aggregation, native expressions) are
  * reviewable without a Spark session. Run:
  *   sbt "runMain graft.tools.DumpPlans"
  */
object DumpPlans {

  private val flagship = Seq(
    "p09_filter" -> "predicate pushdown into the parquet scan",
    "p01_select" -> "column pruning (ReadSchema)",
    "j02_left_join_broadcast" -> "broadcast dimension joins",
    "p10_semijoin" -> "%in% as LeftSemi",
    "a07_grouped_agg" -> "partial/final hash aggregation",
    "m20_regdi_corr1" -> "estimator pipeline (broadcast fusion, Gram aggs)",
    "d03_minhash_lsh_neardup" -> "LSH banding + bucket self-join",
    "e03_ann_lsh_topk" -> "hyperplane-LSH bucket join + windowed top-k",
    "e02_embed_neardup" -> "hyperplane-LSH bucket equi-join candidates (never all-pairs) + double prefilter + exact-decimal confirm",
    "m12_anova" -> "two-factor Type-I ANOVA: one cell-moments aggregate, driver-side shared Cramer tree",
    "e04_ann_ivf_topk" -> "k-means IVF cell equi-join (literal centroids, codegen'd argmax)",
    "j04_json_props" -> "one typed from_json parse (no per-path re-parse)",
    "w01_tumbling_window" -> "window aggregation over events",
    "w03_stream_dedup" -> "key dedup before the per-type aggregate",
    "e01_cosine_topk" -> "per-row norms hoisted behind a Generate barrier (one decimal fold per pair)",
    "j05_asof_join" -> "as-of join as union + running window: ONE exchange on the key, no join operator",
    "j06_range_join" -> "range join as a bucketed equi-join (never nested-loop)",
    "w04_interval_join" -> "interval join (batch rendition; streaming adds two-sided watermark state)",
    "t07_tfidf_topterms" -> "tf/df top terms: persisted tf, bounded df agg + skew-splittable join, per-doc top-k",
    "t10_bm25_retrieval" -> "BM25: doc-keyed aggregate (no token shuffle), one-row stats broadcast back",
    "e06_hybrid_rrf" -> "hybrid retrieval: BM25 + cosine rank lists fused full-outer on integer ranks",
    "d06_decontaminate" -> "decontamination: benchmark shingles broadcast, corpus never shuffled on the gram",
    "c02_sequence_packing" -> "sequence packing: ONE exchange on the shard key, running-sum window",
    "a16_rollup" -> "grouping sets via Expand + partial aggs: one shuffle for all subtotal levels",
    "j07_anti_join" -> "set subtraction as LeftAnti hash join (no row multiplication)",
    "g11_dsir_rank" -> "DSIR weights: bounded llr table broadcast to the scoring scan, doc-keyed agg (no token-keyed shuffle)",
    "t13_ngram_logprob_rank" -> "bigram-LM scoring: count tables broadcast, scan-side bigram zip (no per-doc window)",
    "g14_group_cap" -> "per-group cap: rank window rewritten to WindowGroupLimit (partial top-cap before the shuffle)",
    "d08_incremental_neardup" -> "incremental dedup: new-batch bands equi-join corpus bands (never all-pairs), dedup before exact-Jaccard confirm",
    "m26_jackknife_var" -> "JK1 jackknife: graded plan is scan-free (replicates derive from the eagerly-collected G-row totals frame)",
    // (s06 deliberately absent: its graded frame is a cleaned-up local
    // relation, so the interesting PRUNED scan plan is pinned in
    // PlanSuite's reconstructed round-trip instead)
    "w07_stream_static_join" -> "stream-static enrichment: broadcast dim left join, stream never shuffled",
    "a22_funnel" -> "ordered funnel: k no-sort window mins over ONE user-keyed exchange, explode-of-structs pivot",
    "a25_triangles" -> "triangle census: degree-ordered orientation bounds wedge fan-out, semi-join close confirm",
    "d09_fuzzy_pairs" -> "SymSpell fuzzy join: deletion-variant equi-join candidates (never all-pairs) + levenshtein confirm",
    "a28_time_range_avg" -> "event-time RANGE frame ordered by integer microseconds",
    "r05_scd2_intervals" -> "SCD2 intervals: lead window with deterministic (ts, event_id) tie order",
    "j10_merge_upsert" -> "CDC merge: change-log-only window, base anti-joined against broadcast winner keys (never shuffled)",
    "j11_record_linkage" -> "Fellegi-Sunter linkage: blocking equi-join only, codegen'd agreement vector + in-plan threshold",
    "a31_gini" -> "per-group Gini: distributed global rank (no single-task window), broadcast min-rank frame, exact-decimal sums",
    "a32_association" -> "association rules: per-basket dedup before the size-bounded self-join, partial-agg counts, broadcast totals",
    "m31_raking" -> "raking/IPF: one contingency-cell pass; graded weight is a literal-CASE projection (no per-iteration scans)",
    "m36_poisson_bootstrap" -> "Poisson bootstrap: xR broadcast replicate expansion, ONE partial-aggregable groupBy(r) of O(R) state",
    "e14_random_projection" -> "JL projection: hash-derived signs (no matrix), one explode + one partial-aggregable groupBy",
    "w10_trending" -> "trending top-k: windowed counts (streaming-stateful half) + per-window rank on bounded partitions",
    "e20_ann_lsh_portable" -> "portable LSH: fused exact-decimal bucket keys (one vector walk), band equi-join candidates (never all-pairs), distinct on bare ids before re-joining vectors for scoring",
    "e21_ann_ivf_portable" -> "portable IVF: fused exact-decimal cell ranking, broadcast 2-probe query frame, cell equi-join",
    "e22_ann_pq_portable" -> "portable PQ: fused exact-decimal encode + reconstruction in the candidate scan, exhaustive ADC as a broadcast cross join over bare id pairs re-joined to the reconstructed vectors for scoring",
    "t22_quality_classifier" -> "classifier filter: 3 quantized-IRLS scans with exact-decimal moments, 1-row coefficient frame broadcast into the corpus-wide scoring scan",
    "mm05_frame_sample" -> "frame-sample plan: per-row stride sequence + bounded explode, no shuffle before the presentation sort",
    "e24_sim_calibration" -> "threshold calibration: band equi-join candidate pairs (never all-pairs), bare-id dedup shuffle, exact-decimal cosine binned to a 20-row histogram + cumulative window",
    "e25_sq8_mips_topk" -> "SQ8 MIPS: shuffle-free int8 encode in both scans, broadcast-query exhaustive integer-dot scan, windowed top-k",
    "t25_doremi_mixture" -> "DoReMi EG step: one doc-keyed partial agg to |domains| rows, all windows domain-bounded",
    "t26_threshold_sweep" -> "threshold sweep: one scan bucketing to a 20-row grid, reverse-cumulative window on the grid only",
    "t27_char_entropy" -> "char entropy: per-char explode through ONE doc-keyed partial agg, quantized terms summed as exact integers",
    "e28_prototype_prune" -> "prototype pruning: ONE fused argmax+score walk (no centroid join), per-cell bounded rank windows",
    "d13_soft_dedup" -> "soft dedup: one fingerprint groupBy, group table joined back doc-keyed, weight a single projection",
    "w12_late_data" -> "late-data accounting: stream reduced to a bounded per-batch max frame, running watermark broadcast back onto the scan",
    "c04_shard_assign" -> "shard census: portable-hash routing as a pure projection, ONE partial-aggregable pass to nShards rows, balance window on the grid",
    "t30_domain_kl" -> "domain KL: one explode to the (domain, token) frame, vocabulary-keyed marginals join, corpus totals on the |domains|-row window",
    "mm07_aspect_bucket" -> "aspect bucketing: broadcast 25-row bucket grid, doc-keyed argmin window, partial-aggregable census",
    "e29_ann_recall" -> "ANN recall eval: exact and IVF retrievals share the scan; the overlap join broadcasts the |Q|-bounded approximate side",
    "a38_kcore" -> "k-core peel: per-round degree partial agg + both-ends semi joins, materialized each round (bounded plan depth)",
    "m44_mannwhitney" -> "Mann-Whitney: one grouped pass to the distinct-value frame, window + moments on that bounded frame only",
    "e30_ivf_nprobe_sweep" -> "nProbe sweep: ONE max-depth candidate generation, pairs scored once, per-depth rankings filter the probe rank",
    "a40_connected_components" -> "min-label CC: per-round node-keyed join + partial-aggregable min, materialized each round",
    "a41_cms_portable" -> "portable CMS twin: ONE partial-aggregable pass to the bounded 4x256 table, broadcast 4-row depth frame, broadcast probe join (no data-scale concentration)",
    "a42_bloom_portable" -> "portable Bloom twin: bit set bounded by m via distinct, broadcast 7-row hash frame, probe membership as an equi-join on bit position",
    "e31_semdedup_portable" -> "portable SemDeDup: fused cell assignment in the scan, cell equi-join pair search (never all-pairs), fixed min-label rounds, partial-aggregable census")
    // (e26 deliberately absent: like m26/e23, its graded frame is the
    // collected ≤|Q|·k selection; the interesting per-round shape —
    // pool/pair-sim joins + window argmax — reuses e01's pinned
    // Generate-barrier cross-join plan plus bounded broadcast joins)
    // (e23 deliberately absent: like m26, its graded frame is a local
    // relation — the interesting assignment/update plans are the e21
    // fused-expression scan and one partial-aggregable explode-groupBy,
    // both pinned by shapes already in this list; a36 likewise — its
    // census is a collected local relation, and the per-round
    // join + count + argmax-window shape matches a24's pinned rounds;
    // a37 ditto, its modularity tail being two node-keyed label joins
    // + community-bounded aggs on the same loop; e27 reuses e01's
    // pinned Generate-barrier cross-join shape with a pair-space
    // label filter)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of flagship queries\n\n")
    sb.append("Generated by `sbt \"runMain graft.tools.DumpPlans\"` at sf0.001.\n")
    sb.append("What to look for per query is noted above each plan.\n")
    flagship.foreach { case (name, why) =>
      // e31's graded frame is a collected local relation (bounded-census
      // contract) — dump its LAZY builder instead so the pair-search
      // join and census shapes are actually reviewable
      val df =
        if (name == "e31_semdedup_portable")
          graft.queries.AnnQueries.semDedupPortablePlan(
            spark.read.parquet(s"$sf/embeddings.parquet"),
            dim = 64, nCells = 8, threshold = 0.45, ccRounds = 3)
        else Catalog.queries(name)(spark, sf)
      sb.append(s"\n## $name — $why\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(6000))
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${flagship.size} plans)")
    spark.stop()
  }
}
