package graft.queries

import graft.util.Tables.{sqlDsum, sqlDmean, sqlDvarSamp}

/** DuckDB oracle for o04_mc_portable — a full textual replay of
  * [[graft.mc.PortableSim]]'s grid → population → selection → battery
  * → summarize pipeline. Every arithmetic tree here mirrors the Scala
  * side token-for-token (same association, same division operands,
  * exact-decimal sums via sqlDsum); change one only with the other.
  */
object McOracle {

  // PortableSim.uniform: h1 = (id·1000003 + seed) % P,
  // h2 = (h1² + seed) % P, u = (h2·K % P) / P — the squaring breaks the
  // affine channel correlation of a linear hash (see PortableSim)
  private def u(k: Int): String =
    s"CAST(((((id * 1000003 + seedb + $k) % 100000007) " +
      s"* ((id * 1000003 + seedb + $k) % 100000007) + seedb + $k) " +
      s"% 100000007) * 1315423911 % 100000007 AS DOUBLE) / 100000007.0"

  val o04: String =
    s"""WITH grid AS (
         SELECT gi, gamma, sim
         FROM (VALUES (0, 0.0), (1, 1.0)) AS g(gi, gamma),
              generate_series(1, 3) AS s(sim)),
       pop0 AS (
         SELECT gi, gamma, sim, 1000000000000 * gi + 10000 * sim AS seedb, id
         FROM grid, generate_series(1, 2000) AS t(id)),
       pop1 AS (
         SELECT gi, gamma, sim, id,
                ${u(1)} + ${u(2)} + ${u(3)} + ${u(4)} AS x,
                ${u(5)} + ${u(6)} + ${u(7)} + ${u(8)} - 2.0 AS eta,
                ${u(9)} AS ua,
                ${u(10)} AS ub
         FROM pop0),
       pop2 AS (
         SELECT gi, gamma, sim, id, x,
                3.0 + 0.7 * (x - 2.0) + eta AS y,
                ua < 0.1 AS in_a, ub
         FROM pop1),
       pop AS (
         SELECT gi, gamma, sim, id, x, y, in_a,
                ub < least(greatest(0.5 + gamma * (y - 3.0) * 0.15,
                                    0.05), 0.95) AS in_b
         FROM pop2),
       agg AS (
         SELECT gamma, sim,
                CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                CAST(sum(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                count(*) AS n_pop,
                ${sqlDsum("CASE WHEN in_b THEN y END")} AS sy_b,
                ${sqlDsum("CASE WHEN in_b THEN x END")} AS sx_b,
                ${sqlDsum("CASE WHEN in_b THEN (x)*(y) END")} AS sxy_b,
                ${sqlDsum("CASE WHEN in_b THEN (x)*(x) END")} AS sxx_b,
                ${sqlDsum("CASE WHEN in_a THEN y END")} AS sy_a,
                ${sqlDsum("x")} AS sx_pop
         FROM pop GROUP BY gamma, sim),
       coef AS (
         SELECT gamma, sim, n_a, n_b,
                sy_b / n_b AS mean_s_b,
                sy_a / n_a AS mean_s_a,
                sx_pop / n_pop AS xbar_pop,
                sx_b / n_b AS xbar_b,
                (sxy_b - sx_b * sy_b / CAST(n_b AS DOUBLE))
                  / (sxx_b - sx_b * sx_b / CAST(n_b AS DOUBLE)) AS beta
         FROM agg),
       coef2 AS (
         SELECT gamma, sim, n_a, n_b, mean_s_b, mean_s_a,
                mean_s_b + beta * (xbar_pop - xbar_b) AS reg,
                mean_s_b - beta * xbar_b AS alpha, beta
         FROM coef),
       resid AS (
         SELECT p.gamma, p.sim,
                ${sqlDsum("(y) - (alpha + beta * (x))")} AS sres_a
         FROM pop p JOIN coef2 c USING (gamma, sim)
         WHERE in_a GROUP BY p.gamma, p.sim),
       est AS (
         SELECT c.gamma, c.sim, 'DR_X1' AS estimator,
                reg + sres_a / n_a AS estimate
         FROM coef2 c JOIN resid r USING (gamma, sim)
         UNION ALL
         SELECT gamma, sim, 'Mean_S_A', mean_s_a FROM coef2
         UNION ALL
         SELECT gamma, sim, 'Mean_S_B', mean_s_b FROM coef2
         UNION ALL
         SELECT gamma, sim, 'Reg_X1', reg FROM coef2),
       summary AS (
         SELECT gamma, estimator,
                ${sqlDmean("(estimate) - 3.0")} AS bias,
                sqrt(${sqlDvarSamp("estimate")}) AS se,
                sqrt(${sqlDsum("((estimate) - 3.0)*((estimate) - 3.0)")}
                     / count(*)) AS rmse,
                count(*) AS n_sims
         FROM est GROUP BY gamma, estimator)
       SELECT CAST(e.sim AS INTEGER) AS sim,
              CAST(e.gamma AS DOUBLE) AS gamma, e.estimator,
              e.estimate, s.bias, s.se, s.rmse, s.n_sims
       FROM est e JOIN summary s USING (gamma, estimator)
       ORDER BY gamma, estimator, sim"""
}
