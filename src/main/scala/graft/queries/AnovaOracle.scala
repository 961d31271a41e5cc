package graft.queries

import graft.stats.{AnovaTypeI, Det}
import graft.util.Tables.sqlDsum

/** Generated DuckDB oracle SQL for `m12_anova` — the two-factor Type-I
  * ANOVA (`aov(Bias ~ factor(Sd)*factor(Gamma))`, `ipynb:2828-2836`),
  * here exercised over orders(o_totalprice ~ o_orderstatus *
  * o_orderpriority).
  *
  * Same engine-parity device as [[EstimatorOracles]]: every scalar below
  * is an [[AnovaTypeI]] node instantiated at [[Det.SqlArith]], so DuckDB
  * evaluates the structurally identical IEEE expression tree
  * `Anova.twoFactorTypeIDf` evaluates at `Double` — leaves are exact
  * (integer cell counts + `dsum`/`sqlDsum` decimal cell sums), folds run
  * in the same fixed order, and the (b−1)×(b−1) additive-model solve is
  * the shared Cramer expansion. CTE layering (cells → row totals → RSS /
  * Gram → β → SS) only names intermediate values; it does not change the
  * tree.
  *
  * Levels are hardcoded to the fixed TPC-H domains IN SORTED ORDER — the
  * exact sets `Anova.factorLevels` derives from the data at any SF (the
  * Scala side `require`s the full grid, so a divergence fails loudly
  * there rather than silently here).
  */
object AnovaOracle {

  private implicit val S: Det.Arith[String] = Det.SqlArith

  private val la = Seq("F", "O", "P")
  private val lb = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")
  private val a = la.size
  private val b = lb.size
  private val k = b - 1

  /** [[AnovaTypeI.Cells]] whose leaves are column refs into CTE `p`. */
  private def cells(p: String) = AnovaTypeI.Cells[String](
    IndexedSeq.tabulate(a, b)((i, j) => s"$p.n_${i}_$j"),
    IndexedSeq.tabulate(a, b)((i, j) => s"$p.s_${i}_$j"),
    s"$p.syy", s"$p.n_tot", "0.0")

  val m12: String = {
    def pred(i: Int, j: Int) =
      s"o_orderstatus = '${la(i)}' AND o_orderpriority = '${lb(j)}'"
    val cellCols = (for { i <- 0 until a; j <- 0 until b } yield Seq(
      s"CAST(count(CASE WHEN ${pred(i, j)} THEN 1 END) AS DOUBLE) AS n_${i}_$j",
      s"${sqlDsum(s"CASE WHEN ${pred(i, j)} THEN o_totalprice END")} AS s_${i}_$j"
    )).flatten ++ Seq(
      s"${sqlDsum("(o_totalprice * o_totalprice)")} AS syy",
      "CAST(count(*) AS DOUBLE) AS n_tot",
      "count(*) AS n_tot_i")

    // row-of-A totals over the cell leaves (Anova.twoFactorTypeIDf's
    // rowNs/rowSs vals)
    val cC = cells("c")
    val aggCols = (0 until a).flatMap(i => Seq(
      s"${AnovaTypeI.rowN(cC, i)} AS rn_$i",
      s"${AnovaTypeI.rowS(cC, i)} AS rs_$i"))

    // RSS chain + the additive-model Gram entries, over agg's names
    val cA = cells("agg")
    val rn = IndexedSeq.tabulate(a)(i => s"agg.rn_$i")
    val rs = IndexedSeq.tabulate(a)(i => s"agg.rs_$i")
    val sysCols =
      Seq(s"${AnovaTypeI.rss0(cA, AnovaTypeI.sy(rs))} AS rss0",
          s"${AnovaTypeI.rssA(cA, rn, rs)} AS rss_a",
          s"${AnovaTypeI.rssFull(cA)} AS rss_full") ++
      (for { j <- 0 until k; l <- j until k } yield
        s"${AnovaTypeI.sbb(cA, rn, j + 1, l + 1)} AS sbb_${j}_$l") ++
      (0 until k).map(j =>
        s"${AnovaTypeI.rhsB(cA, rn, rs, j + 1)} AS rhs_$j")

    // Cramer solve over the (symmetric) named Gram — sbb(j,l) and
    // sbb(l,j) are bitwise equal (the cross product commutes), so the
    // j≤l triangle serves both, exactly like EstimatorOracles.gramRefs
    val sbbRefs = IndexedSeq.tabulate(k, k)((j, l) =>
      s"sys.sbb_${math.min(j, l)}_${math.max(j, l)}")
    val rhsRefs = IndexedSeq.tabulate(k)(j => s"sys.rhs_$j")
    val betaCols = Det.solve(sbbRefs, rhsRefs).zipWithIndex
      .map { case (e, j) => s"$e AS b_$j" }

    // ss_b/ss_ab keep the literal (rss_a − rssAdd) shape of the Double
    // side — NOT simplified to β′rhs — so the subtraction order matches
    val rssAdd = AnovaTypeI.rssAdditive("sys.rss_a",
      IndexedSeq.tabulate(k)(j => s"beta.b_$j"), rhsRefs)
    val ab = a * b
    val finCols = Seq(
      "(sys.rss0 - sys.rss_a) AS ss_a",
      s"(sys.rss_a - $rssAdd) AS ss_b",
      s"($rssAdd - sys.rss_full) AS ss_ab",
      "sys.rss_full AS ss_resid",
      s"(sys.rss_full / (sys.n_tot - $ab.0)) AS ms_resid",
      s"(sys.n_tot_i - $ab) AS df_resid")

    def termRow(term: String, df: Long, ss: String) =
      s"""SELECT '$term' AS term, CAST($df AS BIGINT) AS df, $ss AS sum_sq,
         |       ($ss / $df.0) AS mean_sq,
         |       (($ss / $df.0) / ms_resid) AS f_value FROM fin""".stripMargin

    s"""WITH c AS (SELECT
       |    ${cellCols.mkString(",\n    ")}
       |  FROM orders),
       |agg AS (SELECT c.*,
       |    ${aggCols.mkString(",\n    ")}
       |  FROM c),
       |sys AS (SELECT agg.*,
       |    ${sysCols.mkString(",\n    ")}
       |  FROM agg),
       |beta AS (SELECT
       |    ${betaCols.mkString(",\n    ")}
       |  FROM sys),
       |fin AS (SELECT
       |    ${finCols.mkString(",\n    ")}
       |  FROM sys, beta)
       |${termRow("fa", (a - 1).toLong, "ss_a")}
       |UNION ALL ${termRow("fb", (b - 1).toLong, "ss_b")}
       |UNION ALL ${termRow("fa:fb", ((a - 1) * (b - 1)).toLong, "ss_ab")}
       |UNION ALL SELECT 'Residuals', CAST(df_resid AS BIGINT), ss_resid,
       |       ms_resid, CAST(NULL AS DOUBLE) FROM fin
       |ORDER BY term""".stripMargin
  }
}
