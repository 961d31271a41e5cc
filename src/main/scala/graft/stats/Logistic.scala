package graft.stats

import breeze.linalg.{norm, DenseVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.FormulaSpec

/** Unregularized logistic regression via IRLS (Fisher scoring) — the same
  * algorithm R `glm(family=binomial)` uses (`PC.R:274,311`), so coefficients
  * match the reference to ~1e-8 rather than the ~1e-5 an LBFGS fit gives.
  *
  * Each iteration is ONE distributed Gram pass with working weights
  * wᵢ = pᵢ(1−pᵢ) and working response zᵢ = ηᵢ + (yᵢ−pᵢ)/wᵢ, then a tiny
  * driver solve; p ≤ ~8 covariates ⇒ O(k²) aggregate state. Converges in
  * < 10 iterations on the reference's workloads.
  */
final case class LogisticFit(
    spec: FormulaSpec,
    beta: DenseVector[Double],
    iterations: Int,
    converged: Boolean
) {
  /** type="response" prediction: sigmoid of the linear predictor. */
  def predict: Column = {
    val eta = Gram.linearPredictor(spec.terms, beta, spec.intercept)
    lit(1.0) / (lit(1.0) + exp(-eta))
  }
}

object Logistic {

  def fit(df: DataFrame, spec: FormulaSpec, maxIter: Int = 25,
          tol: Double = 1e-9): LogisticFit = {
    val respName = spec.response.getOrElse(
      throw new IllegalArgumentException("logistic needs a response"))
    val y = col(respName)
    val xs0 = spec.terms.map(col)
    val xs = if (spec.intercept) lit(1.0) +: xs0 else xs0
    val k = xs.size
    // iterative ⇒ cache ONLY the referenced columns for the loop: each
    // IRLS pass then scans narrow in-memory columnar batches instead of
    // re-reading (and re-filtering) the source per iteration
    val work = df.select((respName +: spec.terms).distinct.map(col): _*).cache()
    try {
      var beta = DenseVector.zeros[Double](k)
      var iter = 0
      var converged = false
      while (iter < maxIter && !converged) {
        val eta = xs.zipWithIndex.foldLeft(lit(0.0): Column) {
          case (acc, (x, i)) => acc + x * lit(beta(i))
        }
        val p = lit(1.0) / (lit(1.0) + exp(-eta))
        // clamp keeps the working weight invertible on separable data
        val w = greatest(p * (lit(1.0) - p), lit(1e-10))
        val z = eta + (y - p) / w
        val g = Gram.moments(work, xs, w, Some(z))
        val newBeta = g.solve()
        converged = norm(newBeta - beta) < tol
        beta = newBeta
        iter += 1
      }
      LogisticFit(spec, beta, iter, converged)
    } finally work.unpersist()
  }

  def fit(df: DataFrame, formula: String): LogisticFit =
    fit(df, FormulaSpec.parse(formula))
}
