package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Dsir, Samplers}
import graft.synth.Population
import graft.util.Tables.load

/** Sampling / synthesis operators (SURVEY.md §2.9) as driver-gradable
  * queries. Random DATA can't be hash-matched cross-engine, but the
  * exact-n invariants CAN: sizes are deterministic given the allocation
  * rule, so the oracles check them. Distributional properties (inclusion
  * ∝ weight, seeded determinism) are covered in ScalaTest.
  */
object SamplingQueries {

  /** DuckDB rendition of the md5-unit parse: first 13 hex digits of an
    * md5 VARCHAR column `c` as an exact integer (≤ 2⁵², exact in
    * DOUBLE) — the e20/o04/m36 portable-draw convention, shared by the
    * g07/g18/g20 sampling-design oracles. */
  private def sqlHexParse13(c: String): String =
    (0 until 13).map { i =>
      s"(strpos('0123456789abcdef', substring($c, ${i + 1}, 1)) - 1) * " +
        s"${BigInt(16).pow(12 - i)}"
    }.mkString("(", " + ", ")")

  val qs: Seq[Q] = Seq(

    // ---- S1+G1 population synthesis: size + moment sanity -------------
    // mean(x)≈2, mean(y)≈3 at n=20k: |err| < 5σ/√n ≈ 0.036 — assert the
    // rounded-to-0-decimals values, which ARE deterministic at this n.
    Q("g01_population_synth",
      (s, _) => {
        val pop = Population.cell2(s, 20000, seed = 42)
        pop.agg(count(lit(1)).as("n"),
          floor(avg("x_i") + 0.5).cast("long").as("mean_x_rounded"),
          floor(avg("y_i") + 0.5).cast("long").as("mean_y_rounded"))
      },
      Some("SELECT CAST(20000 AS BIGINT) AS n, CAST(2 AS BIGINT) AS mean_x_rounded, CAST(3 AS BIGINT) AS mean_y_rounded")),

    // ---- G2 Bernoulli with per-row p: realized fraction ≈ p -----------
    Q("g02_bernoulli",
      (s, _) => {
        val pop = Population.cell7(s, 20000, seed = 7)
        val drawn = Samplers.bernoulli(pop, lit(0.2), seed = 11)
        drawn.agg(count(lit(1)).as("n"),
          floor(avg("selected") * 10 + 0.5).cast("long").as("frac_x10"))
      },
      Some("SELECT CAST(20000 AS BIGINT) AS n, CAST(2 AS BIGINT) AS frac_x10")),

    // ---- G4 SRS without replacement, EXACT n --------------------------
    Q("g04_srs_exact",
      (s, d) => {
        val sample = Samplers.srsExact(load(s, d, "customer"), 500, seed = 42)
        sample.agg(count(lit(1)).as("n_sampled"),
          countDistinct(col("c_custkey")).as("n_distinct"))
      },
      // least(): SF-robust — at sf0.001 customer has fewer than 500 rows
      // and the sampler returns them all
      Some("""SELECT least(CAST(500 AS BIGINT), count(*)) AS n_sampled,
                     least(CAST(500 AS BIGINT), count(*)) AS n_distinct
              FROM customer""")),

    // ---- G5 weighted sampling w/o replacement, exact n (E–S keys) -----
    // Size is exact; the weighted-ness shows as a higher mean weight in
    // the sample than the population (checked distributionally in specs;
    // here: exact size + all-distinct).
    Q("g05_weighted_exact",
      (s, d) => {
        val pop = load(s, d, "customer")
          .withColumn("w", col("c_acctbal") + lit(1000.1))
        val sample = Samplers.weightedExact(pop, col("w"), 500, seed = 42)
        sample.agg(count(lit(1)).as("n_sampled"),
          countDistinct(col("c_custkey")).as("n_distinct"))
      },
      Some("""SELECT least(CAST(500 AS BIGINT), count(*)) AS n_sampled,
                     least(CAST(500 AS BIGINT), count(*)) AS n_distinct
              FROM customer""")),

    // ---- G6 stratified exact-n, proportional allocation ----------------
    // Realized per-stratum sizes must equal round(N_h/N·1000) — the
    // oracle recomputes the allocation from the population itself.
    Q("g06_stratified_exact",
      (s, d) => {
        val cust = load(s, d, "customer")
        val sample = Samplers.stratifiedExact(cust, "c_mktsegment", 1000, seed = 42)
        sample.groupBy("c_mktsegment").agg(count(lit(1)).as("n_sampled"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH sizes AS (SELECT c_mktsegment, count(*) AS n_h FROM customer
                             GROUP BY c_mktsegment),
                   tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM customer)
              SELECT c_mktsegment,
                     least(CAST(floor(n_h * 1000 / tot.n + 0.5) AS BIGINT),
                           n_h) AS n_sampled
              FROM sizes, tot ORDER BY c_mktsegment""")),

    // ---- G7 stratified Bernoulli with size adjustment ------------------
    // Draw at π=0.05, rescale per-stratum toward target = N_h/10
    // (factor ≈ 2, exercising the adjustment), redraw. Both draws are
    // seeded md5-unit uniforms of the customer key (independent
    // channels — r15), so the ENTIRE
    // design — draw → realized counts → factors → redraw — reruns
    // bit-identically in DuckDB: full row-level hash oracle, like
    // g18/g19. (Reference semantics ipynb:631-646 unchanged: Bernoulli,
    // rescale π by target/realized, redraw once.)
    Q("g07_bernoulli_adjusted",
      (s, d) => {
        val cust = load(s, d, "customer")
          .select(col("c_custkey").as("id"),
            col("c_mktsegment").as("stratum"))
        val targets = cust.groupBy("stratum")
          .agg((count(lit(1)).cast("double") / 10.0).as("target"))
        Samplers.stratifiedBernoulliAdjusted(
            cust, "stratum", "id", lit(0.05), targets, seed = 13)
          .filter(col("selected") === 1)
          .select("id", "stratum")
          .orderBy("id")
      },
      Some(s"""WITH c AS (SELECT c_custkey AS id, c_mktsegment AS stratum
                         FROM customer),
              d1 AS (SELECT id, stratum,
                       CAST(${sqlHexParse13(
                         "md5('bern1:13:' || CAST(id AS VARCHAR))")}
                            AS DOUBLE) / 4503599627370496.0 AS u1,
                       CAST(${sqlHexParse13(
                         "md5('bern2:13:' || CAST(id AS VARCHAR))")}
                            AS DOUBLE) / 4503599627370496.0 AS u2
                     FROM c),
              t AS (SELECT stratum, CAST(count(*) AS DOUBLE) / 10.0 AS target
                    FROM c GROUP BY stratum),
              r AS (SELECT stratum,
                      CAST(sum(CASE WHEN u1 < 0.05 THEN 1 ELSE 0 END)
                           AS DOUBLE) AS realized
                    FROM d1 GROUP BY stratum),
              f AS (SELECT r.stratum, t.target / greatest(r.realized, 1.0)
                             AS f
                    FROM r JOIN t USING (stratum))
              SELECT id, stratum
              FROM d1 JOIN f USING (stratum)
              WHERE u2 < least(0.05 * f, 1.0)
              ORDER BY id""")),

    // ---- G8 seeded determinism: same seed ⇒ identical sample ----------
    Q("g08_seeded_rng",
      (s, d) => {
        val cust = load(s, d, "customer")
        val s1 = Samplers.srsExact(cust, 300, seed = 99).select("c_custkey")
        val s2 = Samplers.srsExact(cust, 300, seed = 99).select("c_custkey")
        s1.exceptAll(s2).union(s2.exceptAll(s1))
          .agg(count(lit(1)).as("n_diff"))
      },
      Some("SELECT CAST(0 AS BIGINT) AS n_diff")),

    // ---- G9 dataset-mixture resampling (target language proportions) --
    // Rebalance the corpus toward a prescribed language mix with exact-n
    // per group: en 30%, fr 40% (over-asks fr → clamped to its group
    // size at sf0.01, exercising the clamp), 15% each for the rest of a
    // 200-doc budget. Group sizes are deterministic, so the realized
    // per-group counts are too — the oracle recomputes the allocation
    // arithmetic; membership/randomness properties live in SamplersSuite.
    Q("g09_mixture_resample",
      (s, d) => {
        val docs = load(s, d, "documents")
        val targets = Map("en" -> 0.30, "de" -> 0.15, "es" -> 0.15,
          "fr" -> 0.40, "zh" -> 0.15)
        Samplers.mixtureExact(docs, "lang", targets, nTotal = 200, seed = 77)
          .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
          .orderBy("lang")
      },
      Some("""WITH g AS (SELECT lang, count(*) AS n_docs
                         FROM documents GROUP BY lang)
              SELECT lang, least(n_docs, CAST(floor(200 *
                       CASE lang WHEN 'en' THEN 0.30
                                 WHEN 'fr' THEN 0.40
                                 ELSE 0.15 END + 0.5) AS BIGINT)) AS n_sampled
              FROM g ORDER BY lang""")),

    // ---- G10 deterministic train/val/test split -----------------------
    // 80/10/10 over lineitem (60k rows at sf0.01): realized fractions
    // are hash-deterministic and, at this n, dozens of sigma inside the
    // one-decimal rounding band the oracle checks. Membership
    // properties (disjoint, exhaustive, layout-invariant, no example
    // migration) are SamplersSuite's job.
    Q("g10_train_test_split",
      (s, d) => {
        val split = Samplers.splitByHash(load(s, d, "lineitem"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 21)
        // scalar total via a broadcast one-row cross join, NOT a global
        // window: `sum(...).over()` with no partition spec funnels the
        // (3-row) frame through a single-partition Window and Spark
        // rightly warns about it on every run
        val counts = split.groupBy("split").agg(count(lit(1)).as("__n"))
        val total = counts.agg(sum("__n").as("__tot"))
        counts.crossJoin(broadcast(total))
          .select(col("split"),
            floor(col("__n") * 10.0 / col("__tot") + 0.5)
              .cast("long").as("frac_x10"))
          .orderBy("split")
      },
      Some("""SELECT 'test' AS split, CAST(1 AS BIGINT) AS frac_x10
              UNION ALL SELECT 'train', CAST(8 AS BIGINT)
              UNION ALL SELECT 'val', CAST(1 AS BIGINT)
              ORDER BY split""")),

    // ---- G11 DSIR importance weights (Xie et al. 2023), rank oracle ---
    // Target = the English sub-corpus; every document scored by
    // Σ c_f·(ln p_f − ln q_f) over the add-1-smoothed unigram models.
    // Hash-compare strategy: ln is libm, and the per-doc double sum is
    // merge-order-nondeterministic at the ulp level, so the graded
    // output carries the weight QUANTIZED to 2⁻²⁰ (≈1e-6 — far above
    // ulp noise, far below the ~1e-2 gaps between distinct docs) and
    // the rank ordered by that integer: bit-exact across engines and
    // runs unless a true weight straddles a quantization boundary
    // (verified hash-exact at sf0.001/0.01/0.1). Unhashed features for
    // SQL parity; the hashed scale path is g12's job + DsirSuite.
    Q("g11_dsir_rank",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // NULL-text parity: the operator scores token-less docs as
        // logw = 0 (its documented contract), but string_split(NULL)
        // unnests to zero rows in the oracle, which would silently drop
        // them — filter them out on BOTH sides (the oracle by
        // construction, Spark explicitly) so a fixture refresh with
        // NULL texts cannot flip the graded hash. EMPTY text ('') is
        // likewise filtered on both sides since r15: both engines
        // tokenize it to [''], and that spurious feature violated the
        // logw = 0 contract and perturbed every smoothed llr (featurize
        // drops it; the toks CTEs below mirror with tok <> '').
        val docs = load(s, d, "documents").filter(col("text").isNotNull)
        val target = docs.filter(col("lang") === "en")
        Dsir.importanceWeights(docs, target, "doc_id", "text")
          .select(col("doc_id"),
            floor(col("logw") * lit(1048576.0) + lit(0.5))
              .cast("long").as("qlogw"))
          .orderBy(desc("qlogw"), col("doc_id"))
          .limit(50)
          // constant partition key: post-limit the window sees ≤ 50 rows
          .select(col("doc_id"), col("qlogw"), row_number().over(
            Window.partitionBy(lit(1))
              .orderBy(desc("qlogw"), col("doc_id"))).as("r"))
      },
      Some(s"""WITH toks0 AS (SELECT doc_id, lang, unnest(string_split(lower(trim(
                   regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS tok
               FROM documents),
              toks AS (SELECT * FROM toks0 WHERE tok <> ''),
              cnt AS (SELECT tok, count(*) AS cs,
                             count(CASE WHEN lang = 'en' THEN 1 END) AS ct
                      FROM toks GROUP BY tok),
              tot AS (SELECT sum(cs) AS s, sum(ct) AS t, count(*) AS v
                      FROM cnt),
              llr AS (SELECT tok,
                        ln((CAST(ct AS DOUBLE) + 1.0) /
                           (CAST(t AS DOUBLE) + 1.0 * v))
                      - ln((CAST(cs AS DOUBLE) + 1.0) /
                           (CAST(s AS DOUBLE) + 1.0 * v)) AS llr
                      FROM cnt, tot),
              w AS (SELECT doc_id, CAST(floor(${graft.util.Tables.sqlDsum("llr")} * 1048576.0 + 0.5)
                                        AS BIGINT) AS qlogw
                    FROM toks JOIN llr USING (tok) GROUP BY doc_id),
              top AS (SELECT doc_id, qlogw FROM w
                      ORDER BY qlogw DESC, doc_id LIMIT 50)
              SELECT doc_id, qlogw,
                     CAST(row_number() OVER (ORDER BY qlogw DESC, doc_id)
                          AS INT) AS r
              FROM top ORDER BY r""")),

    // ---- G12 DSIR resampling on the hashed-feature scale path --------
    // Gumbel-top-k over log weights (never exp — no overflow), hashed
    // unigram+bigram features (DSIR §3's configuration; 2¹⁶ buckets:
    // the B-bounded llr frame broadcasts at any corpus size). The
    // xxhash selection can't be replayed in an ANSI engine (no xxhash64
    // there), so the graded row carries invariants recomputed from the
    // data in-query: exact n, bit-identical rerun, identical selection
    // under a different partitioning (the rowUniform partition-
    // invariance claim, proven in the graded output), and the
    // distribution ACTUALLY tilts (sampled mean logw > corpus mean, en
    // share strictly up). The oracle is the row's unique correct value
    // — constant by construction at every SF — so the driver's hash
    // gate now ENFORCES the invariants (a broken one fails the round)
    // instead of recording rows-only; the values are computed from
    // three real sampler runs + corpus stats, never asserted, and
    // DsirSuite asserts the same booleans at test time. The
    // SELECTION-level check lives in g20, the portable twin whose
    // whole chain hash-matches end-to-end. (A d04-style selection
    // agreement between the two noise families was measured and
    // rejected: overlap is 62/100 at sf0.001 but 4/100 at sf0.1 —
    // with a 5000-doc pool the fixture's weights don't concentrate,
    // so two legitimate Gumbel draws share almost nothing; an overlap
    // floor would grade the FIXTURE's weight concentration, not the
    // sampler. Gumbel inclusion is inherently non-robust to the noise
    // source — only distributional properties transfer, and those are
    // exactly the tilt invariants graded here.)
    Q("g12_dsir_resample",
      (s, d) => {
        val docs = load(s, d, "documents")
        val target = docs.filter(col("lang") === "en")
        val scored = Dsir.importanceWeights(docs, target, "doc_id", "text",
            hashBuckets = Some(1 << 16), nGramMax = 2)
          .select(col("doc_id"), col("lang"), col("logw"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val s1 = Dsir.resampleByLogWeight(scored, "logw", 100, seed = 31)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // s2/s3 each feed BOTH sides of a symmetric exceptAll — pinned,
        // each sampler pass over the cached weights runs once, not
        // twice (r18; same values, the diffs read the caches)
        val s2 = Dsir.resampleByLogWeight(scored, "logw", 100, seed = 31)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val s3 = Dsir.resampleByLogWeight(scored.repartition(7), "logw",
          100, seed = 31)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val stats = scored.agg(
          avg("logw").as("mean_all"),
          avg(when(col("lang") === "en", 1.0).otherwise(0.0)).as("en_all"))
        val out = s1.agg(
            count(lit(1)).as("n_sampled"),
            avg("logw").as("mean_sampled"),
            avg(when(col("lang") === "en", 1.0).otherwise(0.0))
              .as("en_sampled"))
          .crossJoin(broadcast(stats))
          .crossJoin(broadcast(s1.exceptAll(s2).union(s2.exceptAll(s1))
            .agg(count(lit(1)).as("n_diff_rerun"))))
          .crossJoin(broadcast(s1.exceptAll(s3).union(s3.exceptAll(s1))
            .agg(count(lit(1)).as("n_diff_repart"))))
          .select(col("n_sampled"), col("n_diff_rerun"),
            col("n_diff_repart"),
            (col("mean_sampled") > col("mean_all")).as("shift_ok"),
            (col("en_sampled") > col("en_all")).as("en_boost_ok"))
        // eager materialization + unpersist (round-9 cache discipline,
        // same shape as AnnQueries.withExactRecall): the result is ONE
        // row; holding it as a local relation frees both cache entries.
        // finally-guarded so a failed collect can't leak the pins.
        // (Bench-cost note: this row IS the validation harness — the
        // full weight pipeline plus THREE sampler runs and two set
        // diffs; the operator's own cost is g11/g13's. Same class as
        // o02's determinism rerun.)
        val rows =
          try out.collect()
          finally {
            scored.unpersist(); s1.unpersist(); s2.unpersist()
            s3.unpersist()
          }
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      },
      // constant-valued enforcement oracle — see the block comment above
      Some("""SELECT CAST(100 AS BIGINT) AS n_sampled,
                     CAST(0 AS BIGINT) AS n_diff_rerun,
                     CAST(0 AS BIGINT) AS n_diff_repart,
                     true AS shift_ok, true AS en_boost_ok""")),

    // ---- G13 DSIR with the paper's unigram+bigram bag, rank oracle ----
    // Same contract as g11 but nGramMax = 2 (DSIR §3's configuration),
    // so the bigram feature path is itself hash-graded — unhashed
    // features for SQL parity, quantized-weight ranking for ulp
    // immunity. The oracle unions unigram and lag-1 bigram occurrences
    // per document and reruns g11's arithmetic over that bag.
    Q("g13_dsir_bigram_rank",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = load(s, d, "documents").filter(col("text").isNotNull)
        val target = docs.filter(col("lang") === "en")
        Dsir.importanceWeights(docs, target, "doc_id", "text",
            nGramMax = 2)
          .select(col("doc_id"),
            floor(col("logw") * lit(1048576.0) + lit(0.5))
              .cast("long").as("qlogw"))
          .orderBy(desc("qlogw"), col("doc_id"))
          .limit(50)
          .select(col("doc_id"), col("qlogw"), row_number().over(
            Window.partitionBy(lit(1))
              .orderBy(desc("qlogw"), col("doc_id"))).as("r"))
      },
      Some(s"""WITH base AS (SELECT doc_id, lang, string_split(lower(trim(
                   regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS l
               FROM documents WHERE text IS NOT NULL),
              feats0 AS (SELECT doc_id, lang, unnest(l) AS f FROM base
                        UNION ALL
                        SELECT doc_id, lang, l[i-1] || ' ' || l[i] AS f
                        FROM base,
                             unnest(generate_series(2, len(l))) AS t(i)),
              feats AS (SELECT * FROM feats0 WHERE f <> ''),
              cnt AS (SELECT f, count(*) AS cs,
                             count(CASE WHEN lang = 'en' THEN 1 END) AS ct
                      FROM feats GROUP BY f),
              tot AS (SELECT sum(cs) AS s, sum(ct) AS t, count(*) AS v
                      FROM cnt),
              llr AS (SELECT f,
                        ln((CAST(ct AS DOUBLE) + 1.0) /
                           (CAST(t AS DOUBLE) + 1.0 * v))
                      - ln((CAST(cs AS DOUBLE) + 1.0) /
                           (CAST(s AS DOUBLE) + 1.0 * v)) AS llr
                      FROM cnt, tot),
              w AS (SELECT doc_id, CAST(floor(${graft.util.Tables.sqlDsum("llr")} * 1048576.0 + 0.5)
                                        AS BIGINT) AS qlogw
                    FROM feats JOIN llr USING (f) GROUP BY doc_id),
              top AS (SELECT doc_id, qlogw FROM w
                      ORDER BY qlogw DESC, doc_id LIMIT 50)
              SELECT doc_id, qlogw,
                     CAST(row_number() OVER (ORDER BY qlogw DESC, doc_id)
                          AS INT) AS r
              FROM top ORDER BY r""")),

    // ---- G14 per-source cap (domain mixing) ---------------------------
    // Keep ≤ 5 docs per source by deterministic multiplicative-hash
    // rank — the corpus-rebalancing step of a CCNet-style pipeline,
    // reproducible bit-for-bit across engines/partitionings (the hash
    // is pure int64 arithmetic). Spark ≥ 3.5 rewrites the rank ≤ cap
    // window to WindowGroupLimit: per-task partial top-cap before the
    // shuffle (PlanSuite pins the node). See Samplers.capPerGroup.
    Q("g14_group_cap",
      (s, d) => Samplers.capPerGroup(
          load(s, d, "documents"), "source", "doc_id", cap = 5)
        .select(col("doc_id"), col("source"))
        .orderBy("source", "doc_id"),
      Some("""WITH k AS (SELECT doc_id, source,
                    ((doc_id % 100000007) * 1315423911) % 100000007 AS key
                  FROM documents),
                r AS (SELECT doc_id, source,
                        row_number() OVER
                          (PARTITION BY source ORDER BY key, doc_id) AS rk
                      FROM k)
              SELECT doc_id, source FROM r WHERE rk <= 5
              ORDER BY source, doc_id""")),

    // ---- G15 leakage-free train/test split ----------------------------
    // Split assignment hashes the near-dup CLUSTER label, not the doc
    // id, so near-duplicates can never straddle train and test — the
    // standard guard against eval contamination (same reason d06
    // decontaminates against benchmarks). Clusters come from the d05
    // machinery (LSH pairs → connected components, singletons = own
    // id); the split is the portable multiplicative hash, so the whole
    // chain hash-matches the oracle's recursive-CTE rendition.
    Q("g15_leakfree_split",
      (s, d) => {
        import graft.operators.Dedup
        val docs = load(s, d, "documents")
        val pairs = Dedup.nearDuplicates(docs, "doc_id", "text",
          threshold = 0.5)
        val cc = Dedup.connectedComponents(pairs)
          .withColumnsRenamed(Map("id" -> "doc_id", "cluster" -> "cl"))
        val labeled = docs.select("doc_id")
          .join(cc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cl"), col("doc_id")).as("cluster_id"))
        Samplers.splitByPortableHash(labeled, "cluster_id",
            Seq("train" -> 0.8, "test" -> 0.2))
          .orderBy("doc_id")
      },
      // shingle + inverted-index pair fragments shared with the dedup
      // oracles (DedupQueries.sqlShingles/sqlInvPairs) — the same ~1 s
      // rendition that replaced the O(n²) list_intersect scan
      Some(s"""WITH RECURSIVE ${DedupQueries.sqlShingles},
              ${DedupQueries.sqlInvPairs},
              edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
                        UNION SELECT id_b, id_a FROM pairs),
              cc(id, lbl) AS (
                SELECT DISTINCT src, src FROM edges
                UNION
                SELECT e.src, c.lbl FROM edges e JOIN cc c ON c.id = e.dst),
              lbl AS (SELECT id AS doc_id, min(lbl) AS cl FROM cc GROUP BY id),
              labeled AS (SELECT d.doc_id,
                            coalesce(l.cl, d.doc_id) AS cluster_id
                          FROM documents d LEFT JOIN lbl l USING (doc_id)),
              u AS (SELECT doc_id, cluster_id,
                      CAST(((cluster_id % 100000007) * 1315423911)
                           % 100000007 AS DOUBLE) / 100000007.0 AS u
                    FROM labeled)
              SELECT doc_id, cluster_id,
                     CASE WHEN u < 0.8 THEN 'train' ELSE 'test' END AS split
              FROM u ORDER BY doc_id""")),

    // ---- G16 temperature-scaled mixture (n_g^alpha reweighting) -------
    // The multilingual-pretraining recipe: source g's sample share is
    // n_g^0.5 / Z, up-weighting low-resource sources. The whole target
    // computation lives IN the plan (no driver collect); alpha = 0.5
    // routes through correctly-rounded sqrt and Z through the exact-
    // decimal dsum, so the realized per-source counts hash-match.
    // Graded like g09: realized counts = least(n_g, n_h) closed form.
    Q("g16_temperature_mixture",
      (s, d) => Samplers.temperatureMixture(load(s, d, "documents"),
          "source", alpha = 0.5, nTotal = 300, seed = 99)
        .groupBy("source").agg(count(lit(1)).as("n_sampled"))
        .orderBy("source"),
      Some(s"""WITH g AS (SELECT source, CAST(count(*) AS DOUBLE) AS n_g
                          FROM documents GROUP BY source),
                   w AS (SELECT source, n_g, sqrt(n_g) AS w FROM g),
                   z AS (SELECT ${graft.util.Tables.sqlDsum("w")} AS z FROM w),
                   nh AS (SELECT source,
                            least(CAST(n_g AS BIGINT),
                                  CAST(floor(300.0 * w / z + 0.5) AS BIGINT))
                              AS n_sampled
                          FROM w, z)
               -- a zero-target source keeps no rows, so the Spark side
               -- has no group for it at all: mirror that here
               SELECT source, n_sampled FROM nh WHERE n_sampled > 0
               ORDER BY source""")),

    // ---- G17 stratified k-fold assignment -----------------------------
    // Within each lang stratum, fold = (portable-hash rank − 1) mod k:
    // exact per-stratum balance (fold sizes differ by ≤ 1 in every
    // stratum), unlike hash-mod-k's in-expectation-only balance. The
    // full assignment table is deterministic in both engines, so the
    // oracle grades every row, not just counts.
    Q("g17_stratified_kfold",
      (s, d) => Samplers.kFoldStratified(
          load(s, d, "documents").select("doc_id", "lang"),
          "lang", "doc_id", k = 5)
        .orderBy("doc_id"),
      Some("""WITH k AS (SELECT doc_id, lang,
                    ((doc_id % 100000007) * 1315423911) % 100000007 AS key
                  FROM documents),
                   r AS (SELECT doc_id, lang,
                           row_number() OVER
                             (PARTITION BY lang ORDER BY key, doc_id) AS rk
                         FROM k)
              SELECT doc_id, lang, CAST((rk - 1) % 5 AS INTEGER) AS fold
              FROM r ORDER BY doc_id""")),

    // ---- G18 πps Poisson sampling (size-biased design) ----------------
    // π = min(1, n·x/Σx) with an md5-unit uniform (iid draws — the
    // Poisson design variance Σπ(1−π) assumes them, r15) — the sampling
    // DESIGN itself reruns bit-identically in DuckDB, so the drawn
    // sample (and its 1/π HT weights) carries a full hash oracle.
    // One exact-decimal total + a selection projection, no shuffle.
    Q("g18_pps_poisson",
      (s, d) => Samplers.ppsPoisson(
          load(s, d, "customer").select(col("c_custkey").as("id"),
            greatest(col("c_acctbal"), lit(0.0)).as("x")),
          "x", "id", targetN = 100)
        .orderBy("id"),
      Some(s"""WITH c AS (SELECT c_custkey AS id,
                                 greatest(c_acctbal, 0.0) AS x,
                                 md5('pps:' || CAST(c_custkey AS VARCHAR))
                                   AS hx
                          FROM customer),
                    t AS (SELECT ${graft.util.Tables.sqlDsum("x")} AS tot
                          FROM c)
               SELECT id, x, least(1.0, 100.0 * x / t.tot) AS pi
               FROM c, t
               WHERE CAST(${sqlHexParse13("hx")} AS DOUBLE) / 4503599627370496.0
                     < least(1.0, 100.0 * x / t.tot)
               ORDER BY id""")),

    // ---- G20 portable Gumbel-top-k DSIR resampling --------------------
    // The hash-gradable rendition of g12's sampler: uniforms from the
    // md5-unit draw of "gumbel:<seed>:<doc_id>" mapped strictly inside
    // (0,1) as (parsed + 0.5)/2⁵² (iid draws — the Gumbel-max trick's
    // P(select) ∝ w assumes them; the old affine hash's lattice broke
    // that, r15), Gumbel key logw − ln(−ln u) quantized at 2⁻²⁰ (ln is
    // not correctly rounded — the g11/m06 convention), doc_id tie-break. The oracle
    // replays the ENTIRE chain — unigram importance weights included —
    // so the weighted-without-replacement selection itself is
    // hash-graded end-to-end; g12 keeps grading the hashed-feature
    // scale path's invariants.
    Q("g20_dsir_gumbel_portable",
      (s, d) => {
        val docs = load(s, d, "documents").filter(col("text").isNotNull)
        val target = docs.filter(col("lang") === "en")
        val scored = Dsir.importanceWeights(docs, target, "doc_id", "text")
          .select(col("doc_id"), col("logw"))
        Dsir.resampleByLogWeightPortable(scored, "logw", "doc_id",
            n = 100, seed = 31)
          .select(col("doc_id"), col("qg"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks0 AS (SELECT doc_id, lang, unnest(string_split(lower(trim(
                   regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS tok
               FROM documents WHERE text IS NOT NULL),
              toks AS (SELECT * FROM toks0 WHERE tok <> ''),
              cnt AS (SELECT tok, count(*) AS cs,
                             count(CASE WHEN lang = 'en' THEN 1 END) AS ct
                      FROM toks GROUP BY tok),
              tot AS (SELECT sum(cs) AS s, sum(ct) AS t, count(*) AS v
                      FROM cnt),
              llr AS (SELECT tok,
                        ln((CAST(ct AS DOUBLE) + 1.0) /
                           (CAST(t AS DOUBLE) + 1.0 * v))
                      - ln((CAST(cs AS DOUBLE) + 1.0) /
                           (CAST(s AS DOUBLE) + 1.0 * v)) AS llr
                      FROM cnt, tot),
              w AS (SELECT doc_id, ${graft.util.Tables.sqlDsum("llr")} AS logw
                    FROM toks JOIN llr USING (tok) GROUP BY doc_id),
              u AS (SELECT doc_id, logw,
                      (CAST(${sqlHexParse13(
                        "md5('gumbel:31:' || CAST(doc_id AS VARCHAR))")}
                            AS DOUBLE) + 0.5) / 4503599627370496.0
                        AS u
                    FROM w),
              key AS (SELECT doc_id,
                        CAST(floor((logw - ln(-ln(u))) * 1048576.0 + 0.5)
                             AS BIGINT) AS qg
                      FROM u),
              top AS (SELECT doc_id, qg FROM key
                      ORDER BY qg DESC, doc_id LIMIT 100)
              SELECT doc_id, qg FROM top ORDER BY doc_id""")),

    // ---- G19 systematic sampling (interval k over a hashed order) -----
    // Every 7th customer in the portable-hash order (the deterministic
    // rendition of classical list-randomized systematic sampling) —
    // exact sample size ⌈n/7⌉, engine-identical, no single-task window
    // on the Spark side (distributed rank).
    Q("g19_systematic",
      (s, d) => Samplers.systematic(
          load(s, d, "customer").select(col("c_custkey"), col("c_nationkey")),
          "c_custkey", k = 7)
        .orderBy("c_custkey"),
      Some("""WITH h AS (SELECT c_custkey, c_nationkey,
                                ((c_custkey % 100000007) * 1315423911)
                                  % 100000007 AS hk
                         FROM customer),
                   r AS (SELECT c_custkey, c_nationkey,
                           row_number() OVER (ORDER BY hk, c_custkey) AS rn
                         FROM h)
              SELECT c_custkey, c_nationkey FROM r
              WHERE (rn - 1) % 7 = 0 ORDER BY c_custkey"""))
  )
}
