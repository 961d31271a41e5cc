package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Graphs
import graft.util.Tables.{load, sqlDsum}

/** Graph analytics: PageRank entity importance over the customer ↔
  * supplier transaction graph (who trades with whom, via
  * orders ⋈ lineitem). The bipartite edge set is symmetrized — both
  * directions — which also satisfies pageRank's every-node-is-a-source
  * contract (no dangling mass). 5 fixed iterations; the oracle unrolls
  * them as chained CTEs with the same exact-decimal contribution sums
  * and string-cast double constants, so the final ranks are
  * BIT-identical and the query hash-matches.
  */
object GraphQueries {

  /** Double constants embedded as string→double casts: DuckDB's bare
    * `0.85` literal is DECIMAL (its decimal arithmetic would give
    * 1.0 − 0.85 = exactly 0.15, a DIFFERENT double than IEEE
    * 1.0 − 0.85); a VARCHAR→DOUBLE parse is correctly rounded in both
    * engines, so embedding the Scala-computed double's shortest repr
    * pins the exact bits. */
  private def dbl(x: Double): String = s"CAST('$x' AS DOUBLE)"

  private val damping = 0.85
  private val iters = 5

  /** Shared LPA oracle fragment (a36 census + a37 modularity): the
    * symmetrized transaction graph, self-labeled start, and 3 unrolled
    * synchronous rounds with the (count DESC, label) argmax — ending in
    * l3 = (id, lbl). ONE definition so the two graders cannot diverge. */
  private val sqlLpaChain: String = {
    val rounds = (1 to 3).map { r =>
      s"""c$r AS (SELECT ue.dst AS id, l${r - 1}.lbl AS lbl,
                    count(*) AS n
                  FROM ue JOIN l${r - 1} ON ue.src = l${r - 1}.id
                  GROUP BY ue.dst, l${r - 1}.lbl),
          l$r AS (SELECT id, lbl FROM (
                    SELECT id, lbl, row_number() OVER
                      (PARTITION BY id ORDER BY n DESC, lbl) AS rk
                    FROM c$r) WHERE rk = 1)"""
    }.mkString(",\n")
    s"""e AS (SELECT DISTINCT o_custkey * 2 AS src,
                l_suppkey * 2 + 1 AS dst
              FROM orders
              JOIN lineitem ON o_orderkey = l_orderkey),
       ue AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM ue),
       $rounds"""
  }

  private def oracleSql: String = {
    val d = dbl(damping)
    val base = dbl(1.0 - damping)
    val rounds = (1 to iters).map { k =>
      s"""c$k AS (SELECT dst, ${sqlDsum("pr / deg")} AS s
                  FROM ed JOIN p${k - 1} ON ed.src = p${k - 1}.id
                  GROUP BY dst),
          p$k AS (SELECT nodes.id,
                    $base / n.n + $d * coalesce(s, ${dbl(0.0)}) AS pr
                  FROM nodes CROSS JOIN n
                  LEFT JOIN c$k ON nodes.id = c$k.dst)"""
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT o_custkey * 2 AS src,
                     l_suppkey * 2 + 1 AS dst
                   FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        ue AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        nodes AS (SELECT DISTINCT src AS id FROM ue),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM ue
                GROUP BY src),
        ed AS (SELECT ue.src, ue.dst, deg.deg FROM ue
               JOIN deg ON ue.src = deg.src),
        p0 AS (SELECT id, ${dbl(1.0)} / n.n AS pr FROM nodes CROSS JOIN n),
        $rounds
        SELECT id, pr FROM p$iters ORDER BY pr DESC, id LIMIT 25"""
  }

  /** The shared customer→supplier transaction edge list: orders joined
    * to lineitem on the order key, distinct (src, dst). With
    * `encodeIds` the two key spaces disambiguate arithmetically
    * (customer c → 2c, supplier s → 2s+1 — pure integer ops both
    * engines); a26's bipartite HITS keeps the raw keys. ONE definition
    * for all eight graph queries, mirrored by the shared SQL edge CTEs
    * — a drift in one copy used to be able to silently fork a query
    * from its siblings and its oracle (r15 review). */
  private def transactionEdges(s: SparkSession, d: String,
                               encodeIds: Boolean = true)
      : org.apache.spark.sql.DataFrame = {
    val (srcE, dstE) =
      if (encodeIds) ((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      else (col("o_custkey").as("src"), col("l_suppkey").as("dst"))
    load(s, d, "orders").select(col("o_orderkey"), srcE)
      .join(load(s, d, "lineitem").select(col("l_orderkey"), dstE),
        col("o_orderkey") === col("l_orderkey"))
      .select("src", "dst").distinct()
  }

  val qs: Seq[Q] = Seq(

    // ---- A24 PageRank over the transaction graph ----------------------
    // Node ids disambiguate the two key spaces arithmetically
    // (customer c → 2c, supplier s → 2s+1 — pure integer ops both
    // engines). Top-25 entities by rank, id tiebreak.
    Q("a24_pagerank",
      (s, d) => {
        val edges = transactionEdges(s, d)
        // symmetrizeInput: the directed edge build (join + distinct) is
        // persisted once and unioned in-cache — a lazy symmetrize would
        // re-evaluate it ~4× across the deg/nodes/edge derivations —
        // and the symmetry guarantee engages the no-dangling fast path
        Graphs.pageRankTopK(edges, iters = iters, k = 25,
          damping = damping, symmetrizeInput = true)
      },
      Some(oracleSql)),

    // ---- A25 triangle census over the supplier co-occurrence graph ---
    // Edge s1—s2 iff both supply one order's high-quantity lines
    // (l_quantity > 45 sparsifies to a realistic co-occurrence
    // density). Degree-ordered orientation bounds the wedge join's
    // fan-out to O(√m) per node — the scale lever (see
    // Graphs.triangleStats). All-integer output → trivially hash-exact.
    Q("a25_triangles",
      (s, d) => {
        val l = load(s, d, "lineitem")
          .filter(col("l_quantity") > 45)
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
          .distinct()
        val edges = l.as("a").join(l.as("b"),
            col("a.ok") === col("b.ok") && col("a.sk") < col("b.sk"))
          .select(col("a.sk").as("src"), col("b.sk").as("dst"))
          .distinct()
        Graphs.triangleStats(edges)
      },
      Some("""WITH l AS (SELECT DISTINCT l_orderkey ok, l_suppkey sk
                         FROM lineitem WHERE l_quantity > 45),
                   e AS (SELECT DISTINCT a.sk s1, b.sk s2 FROM l a
                         JOIN l b ON a.ok = b.ok AND a.sk < b.sk),
                   sym AS (SELECT s1 u, s2 v FROM e
                           UNION ALL SELECT s2, s1 FROM e),
                   deg AS (SELECT u, count(*) d FROM sym GROUP BY u),
                   o AS (SELECT s.u, s.v FROM sym s
                         JOIN deg du ON s.u = du.u
                         JOIN deg dv ON s.v = dv.u
                         WHERE (du.d, s.u) < (dv.d, s.v)),
                   w AS (SELECT a.u, a.v m, b.v w FROM o a
                         JOIN o b ON a.v = b.u),
                   t AS (SELECT count(*) nt FROM w
                         WHERE EXISTS (SELECT 1 FROM o
                                       WHERE o.u = w.u AND o.v = w.w))
              SELECT (SELECT count(*) FROM e) AS n_edges,
                     (SELECT count(*) FROM w) AS n_wedges,
                     nt AS n_triangles
              FROM t""")),

    // ---- A26 HITS hubs & authorities on the bipartite graph ----------
    // Customers as hubs, suppliers as authorities over the directed
    // cust→supp transaction edges; 2 mutual-reinforcement rounds, L2
    // normalization through exact-decimal sums of squares + correctly-
    // rounded sqrt → scores bit-identical, top-10 per role graded.
    Q("a26_hits",
      (s, d) => {
        val edges = transactionEdges(s, d, encodeIds = false)
        // eager path: edge cache + per-half-round materialization (the
        // lazy hits() plan doubles per half-round — see Graphs scaladoc)
        Graphs.hitsTopK(edges, iters = 2, k = 10)
      },
      Some(s"""WITH e AS (SELECT DISTINCT o_custkey src, l_suppkey dst
                          FROM orders
                          JOIN lineitem ON o_orderkey = l_orderkey),
                   h0 AS (SELECT DISTINCT src,
                            CAST('1.0' AS DOUBLE) AS score FROM e),
                   a1r AS (SELECT dst, ${sqlDsum("score")} AS score
                           FROM e JOIN h0 USING (src) GROUP BY dst),
                   a1z AS (SELECT sqrt(${sqlDsum("score * score")}) z
                           FROM a1r),
                   a1 AS (SELECT dst, score / z AS score
                          FROM a1r CROSS JOIN a1z),
                   h1r AS (SELECT src, ${sqlDsum("score")} AS score
                           FROM e JOIN a1 USING (dst) GROUP BY src),
                   h1z AS (SELECT sqrt(${sqlDsum("score * score")}) z
                           FROM h1r),
                   h1 AS (SELECT src, score / z AS score
                          FROM h1r CROSS JOIN h1z),
                   a2r AS (SELECT dst, ${sqlDsum("score")} AS score
                           FROM e JOIN h1 USING (src) GROUP BY dst),
                   a2z AS (SELECT sqrt(${sqlDsum("score * score")}) z
                           FROM a2r),
                   a2 AS (SELECT dst, score / z AS score
                          FROM a2r CROSS JOIN a2z),
                   h2r AS (SELECT src, ${sqlDsum("score")} AS score
                           FROM e JOIN a2 USING (dst) GROUP BY src),
                   h2z AS (SELECT sqrt(${sqlDsum("score * score")}) z
                           FROM h2r),
                   h2 AS (SELECT src, score / z AS score
                          FROM h2r CROSS JOIN h2z),
                   ranked AS (
                     SELECT 'hub' AS role, src AS id, score,
                            CAST(row_number() OVER
                              (ORDER BY score DESC, src) AS INTEGER) AS rk
                     FROM h2
                     UNION ALL
                     SELECT 'authority', dst, score,
                            CAST(row_number() OVER
                              (ORDER BY score DESC, dst) AS INTEGER)
                     FROM a2)
              SELECT role, id, score, rk FROM ranked
              WHERE rk <= 10 ORDER BY role, rk""")),

    // ---- A36 label-propagation communities ----------------------------
    // Synchronous LPA over the symmetrized transaction graph (same
    // 2c / 2s+1 node encoding as a24), 3 fixed rounds, smallest-label
    // tie-break — all-integer argmax, so the community census is
    // trivially hash-exact. The oracle unrolls the rounds as chained
    // CTEs with the same (count DESC, label) row_number argmax. Top-25
    // communities by size.
    Q("a36_label_prop",
      (s, d) => {
        val edges = transactionEdges(s, d)
        Graphs.labelPropCensus(edges, iters = 3, k = 25,
          symmetrizeInput = true)
      },
      Some(s"""WITH $sqlLpaChain
            SELECT lbl AS community, count(*) AS n_members,
                   min(id) AS min_id, max(id) AS max_id
            FROM l3 GROUP BY lbl
            ORDER BY n_members DESC, community LIMIT 25""")),

    // ---- A37 modularity census of the LPA partition -------------------
    // Newman & Girvan 2004 §II partition quality over the SAME graph,
    // rounds, and tie-break as a36 (the LPA chain is shared verbatim):
    // for each of the 25 largest communities, the intra-edge count, the
    // degree mass, and the per-community modularity term
    // Q_c = e_c/m − (d_c/2m)². Per-community terms stay exact —
    // integers plus single IEEE divisions — where the summed scalar
    // would drag in cross-community accumulation order.
    Q("a37_modularity",
      (s, d) => {
        val edges = transactionEdges(s, d)
        Graphs.modularityCensus(edges, iters = 3, k = 25,
          symmetrizeInput = true)
      },
      Some(s"""WITH $sqlLpaChain,
            dg AS (SELECT src AS id, count(*) AS d FROM ue GROUP BY src),
            dc AS (SELECT l.lbl, CAST(sum(g.d) AS BIGINT) AS d_c,
                     count(*) AS n_members
                   FROM l3 l JOIN dg g USING (id) GROUP BY l.lbl),
            ei AS (SELECT a.lbl, count(*) AS e2
                   FROM ue JOIN l3 a ON ue.src = a.id
                           JOIN l3 b ON ue.dst = b.id
                   WHERE a.lbl = b.lbl GROUP BY a.lbl),
            m2 AS (SELECT count(*) AS m2 FROM ue)
            SELECT dc.lbl AS community, dc.n_members, dc.d_c,
                   coalesce(ei.e2, 0) // 2 AS e_intra,
                   CAST(coalesce(ei.e2, 0) AS DOUBLE) / CAST(m2.m2 AS DOUBLE)
                     - (CAST(dc.d_c AS DOUBLE) / CAST(m2.m2 AS DOUBLE))
                       * (CAST(dc.d_c AS DOUBLE) / CAST(m2.m2 AS DOUBLE))
                     AS q_c
            FROM dc LEFT JOIN ei ON ei.lbl = dc.lbl CROSS JOIN m2
            ORDER BY n_members DESC, community LIMIT 25""")),

    // ---- A29 bounded-depth BFS (k-hop reachability) -------------------
    // Min hop distance from the customer-0/1/2 seed nodes over the
    // symmetrized transaction graph, 3 hops; graded as per-distance
    // census rows (n, min id, max id) — pure integer arithmetic. The
    // oracle unrolls the same frontier-join + min rounds.
    Q("a29_bfs_hops",
      (s, d) => {
        val edges = transactionEdges(s, d)
        // eager census: directed edges persisted once + symmetrized
        // in-cache; per-round materialization (lazy bfsHops doubles its
        // plan per round — see Graphs scaladoc)
        Graphs.bfsCensus(edges,
          seedPred = col("id") % 2 === 0 && col("id") < 6,
          maxHops = 3, symmetrizeInput = true)
      },
      Some("""WITH e AS (SELECT DISTINCT o_custkey * 2 AS src,
                           l_suppkey * 2 + 1 AS dst
                         FROM orders
                         JOIN lineitem ON o_orderkey = l_orderkey),
                   ue AS (SELECT src, dst FROM e
                          UNION ALL SELECT dst, src FROM e),
                   d0 AS (SELECT DISTINCT src AS id, 0 AS dist FROM ue
                          WHERE src % 2 = 0 AND src < 6),
                   d1 AS (SELECT id, min(dist) AS dist FROM (
                            SELECT id, dist FROM d0
                            UNION ALL
                            SELECT ue.dst, d0.dist + 1 FROM ue
                            JOIN d0 ON ue.src = d0.id) GROUP BY id),
                   d2 AS (SELECT id, min(dist) AS dist FROM (
                            SELECT id, dist FROM d1
                            UNION ALL
                            SELECT ue.dst, d1.dist + 1 FROM ue
                            JOIN d1 ON ue.src = d1.id) GROUP BY id),
                   d3 AS (SELECT id, min(dist) AS dist FROM (
                            SELECT id, dist FROM d2
                            UNION ALL
                            SELECT ue.dst, d2.dist + 1 FROM ue
                            JOIN d2 ON ue.src = d2.id) GROUP BY id)
              SELECT dist, count(*) AS n_nodes, min(id) AS min_id,
                     max(id) AS max_id
              FROM d3 GROUP BY dist ORDER BY dist""")),

    // ---- A38 k-core peeling census -------------------------------------
    // Batagelj–Zaveršnik synchronous peel of the 3-core, 4 fixed rounds
    // over the same symmetrized transaction graph as a36/a29 (fixed-
    // round semantics — deterministic whether or not the peel has
    // converged). Graded as the surviving degree histogram — all
    // integers. The oracle unrolls the same degree-filter + both-ends
    // semi-join rounds.
    Q("a38_kcore",
      (s, d) => {
        val edges = transactionEdges(s, d)
        Graphs.kcoreCensus(edges, k = 3, rounds = 4,
          symmetrizeInput = true)
      },
      Some {
        val rounds = (1 to 4).map { r =>
          s"""k$r AS (SELECT src AS id FROM ue${r - 1}
                      GROUP BY src HAVING count(*) >= 3),
              ue$r AS (SELECT ue${r - 1}.src, ue${r - 1}.dst
                       FROM ue${r - 1}
                       JOIN k$r a ON ue${r - 1}.src = a.id
                       JOIN k$r b ON ue${r - 1}.dst = b.id)"""
        }.mkString(",\n")
        s"""WITH e AS (SELECT DISTINCT o_custkey * 2 AS src,
                  l_suppkey * 2 + 1 AS dst
                FROM orders
                JOIN lineitem ON o_orderkey = l_orderkey),
             ue0 AS (SELECT src, dst FROM e UNION ALL
                     SELECT dst, src FROM e),
             $rounds,
             d AS (SELECT src, count(*) AS degree FROM ue4 GROUP BY src)
            SELECT degree, count(*) AS n_nodes, min(src) AS min_id,
                   max(src) AS max_id
            FROM d GROUP BY degree ORDER BY degree"""
      }),

    // ---- A40 min-label connected components -----------------------------
    // The HashToMin label-spreading census over the same symmetrized
    // transaction graph: 3 fixed synchronous min-rounds, top-25 label
    // groups (fixed-round semantics — converged components carry their
    // global min id; unconverged ones the R-hop min). All integers;
    // the oracle unrolls the same join + union + min rounds.
    Q("a40_connected_components",
      (s, d) => {
        val edges = transactionEdges(s, d)
        Graphs.ccCensus(edges, rounds = 3, k = 25,
          symmetrizeInput = true)
      },
      Some {
        val rounds = (1 to 3).map { r =>
          s"""c$r AS (SELECT ue.dst AS id, min(l${r - 1}.lbl) AS lbl
                      FROM ue JOIN l${r - 1} ON ue.src = l${r - 1}.id
                      GROUP BY ue.dst),
              l$r AS (SELECT id, min(lbl) AS lbl FROM (
                        SELECT id, lbl FROM c$r UNION ALL
                        SELECT id, lbl FROM l${r - 1})
                      GROUP BY id)"""
        }.mkString(",\n")
        s"""WITH e AS (SELECT DISTINCT o_custkey * 2 AS src,
                  l_suppkey * 2 + 1 AS dst
                FROM orders
                JOIN lineitem ON o_orderkey = l_orderkey),
             ue AS (SELECT src, dst FROM e UNION ALL
                    SELECT dst, src FROM e),
             l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM ue),
             $rounds
            SELECT lbl AS component, count(*) AS n_members,
                   min(id) AS min_id, max(id) AS max_id
            FROM l3 GROUP BY lbl
            ORDER BY n_members DESC, component LIMIT 25"""
      }),

    // ---- A39 degree assortativity ---------------------------------------
    // Newman 2002's degree-mixing coefficient over the same symmetrized
    // graph: r = (Σjk/M − (Σj/M)²) / (Σj²/M − (Σj/M)²) over directed
    // stubs (j, k = endpoint degrees; on a symmetrized list Σj = Σk).
    // A strongly negative r is the hub-leaf signature typical of
    // crawl/transaction graphs. The stub moments are exact integer
    // sums (graded verbatim); r is one mirrored IEEE tree over them.
    // Two node-keyed degree joins + one partial-aggregable pass.
    Q("a39_assortativity",
      (s, d) => {
        val edges = transactionEdges(s, d)
        val ue = Graphs.symmetrize(edges)
        val deg = ue.groupBy("src").agg(count(lit(1)).as("__deg"))
        val m = ue
          .join(deg.select(col("src"), col("__deg").as("j")), Seq("src"))
          .join(deg.select(col("src").as("dst"), col("__deg").as("k")),
            Seq("dst"))
          .agg(count(lit(1)).as("m_stubs"),
            sum(col("j") * col("k")).as("s_jk"),
            sum(col("j")).as("s_j"),
            sum(col("j") * col("j")).as("s_j2"))
        val mean = col("s_j").cast("double") / col("m_stubs").cast("double")
        m.select(col("m_stubs"), col("s_jk"), col("s_j"), col("s_j2"),
          ((col("s_jk").cast("double") / col("m_stubs").cast("double")
            - mean * mean)
            / (col("s_j2").cast("double") / col("m_stubs").cast("double")
              - mean * mean)).as("r"))
      },
      Some("""WITH e AS (SELECT DISTINCT o_custkey * 2 AS src,
                  l_suppkey * 2 + 1 AS dst
                FROM orders
                JOIN lineitem ON o_orderkey = l_orderkey),
             ue AS (SELECT src, dst FROM e UNION ALL
                    SELECT dst, src FROM e),
             dg AS (SELECT src, count(*) AS deg FROM ue GROUP BY src),
             st AS (SELECT a.deg AS j, b.deg AS k
                    FROM ue JOIN dg a ON ue.src = a.src
                            JOIN dg b ON ue.dst = b.src),
             mo AS (SELECT count(*) AS m_stubs,
                      CAST(sum(j * k) AS BIGINT) AS s_jk,
                      CAST(sum(j) AS BIGINT) AS s_j,
                      CAST(sum(j * j) AS BIGINT) AS s_j2
                    FROM st)
            SELECT m_stubs, s_jk, s_j, s_j2,
                   (CAST(s_jk AS DOUBLE) / CAST(m_stubs AS DOUBLE)
                     - (CAST(s_j AS DOUBLE) / CAST(m_stubs AS DOUBLE))
                       * (CAST(s_j AS DOUBLE) / CAST(m_stubs AS DOUBLE)))
                   / (CAST(s_j2 AS DOUBLE) / CAST(m_stubs AS DOUBLE)
                     - (CAST(s_j AS DOUBLE) / CAST(m_stubs AS DOUBLE))
                       * (CAST(s_j AS DOUBLE) / CAST(m_stubs AS DOUBLE)))
                     AS r
            FROM mo"""))
  )
}
