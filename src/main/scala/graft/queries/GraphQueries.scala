package graft.queries

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

  val qs: Seq[Q] = Seq(

    // ---- A24 PageRank over the transaction graph ----------------------
    // Node ids disambiguate the two key spaces arithmetically
    // (customer c → 2c, supplier s → 2s+1 — pure integer ops both
    // engines). Top-25 entities by rank, id tiebreak.
    Q("a24_pagerank",
      (s, d) => {
        val ord = load(s, d, "orders")
          .select(col("o_orderkey"), (col("o_custkey") * 2).as("src"))
        val li = load(s, d, "lineitem")
          .select(col("l_orderkey"), (col("l_suppkey") * 2 + 1).as("dst"))
        val edges = ord
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .select("src", "dst").distinct()
        // symmetrizeInput: the directed edge build (join + distinct) is
        // persisted once and unioned in-cache — a lazy symmetrize would
        // re-evaluate it ~4× across the deg/nodes/edge derivations —
        // and the symmetry guarantee engages the no-dangling fast path
        Graphs.pageRankTopK(edges, iters = iters, k = 25,
          damping = damping, symmetrizeInput = true)
      },
      Some(oracleSql))
  )
}
