package graft.stats

import breeze.linalg.DenseVector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.FormulaSpec

/** Closed-form (W)LS via the Gram primitive: β = (XᵀWX)⁻¹ XᵀWy — exact and
  * deterministic, matching R `lm` coefficients to float precision
  * (`RegDI2.R:209,258-262`, `PC.R:272,308`). One distributed pass + a p×p
  * driver solve (p ≤ ~8); never collects data rows.
  */
final case class OlsFit(
    spec: FormulaSpec,
    beta: DenseVector[Double],
    n: Long
) {
  /** Score new data: ŷ = β₀ + Σ βⱼ xⱼ with broadcast coefficients
    * (`predict(model, newdata)`, `RegDI2.R:212`). */
  def predict: Column = Gram.linearPredictor(spec.terms, beta, spec.intercept)
  def coef(term: String): Double = {
    val off = if (spec.intercept) 1 else 0
    if (term == "(Intercept)") { require(spec.intercept); beta(0) }
    else beta(spec.terms.indexOf(term) + off)
  }
}

final case class FitMetrics(rmse: Double, r2: Double)

object Ols {

  def fit(df: DataFrame, spec: FormulaSpec,
          weight: Column = lit(1.0)): OlsFit = {
    val y = spec.response.getOrElse(
      throw new IllegalArgumentException("OLS needs a response"))
    val xs0 = spec.terms.map(col)
    val xs = if (spec.intercept) lit(1.0) +: xs0 else xs0
    val g = Gram.moments(df, xs, weight, Some(col(y)))
    OlsFit(spec, g.solve(), g.n)
  }

  def fit(df: DataFrame, formula: String): OlsFit =
    fit(df, FormulaSpec.parse(formula))

  /** Closed-form fit from a PRECOMPUTED Gram of the design matrix
    * (intercept-first when the spec has one) — lets callers fuse the model
    * Gram with other aggregates into one pass ([[Gram.momentsMulti]]). */
  def fitFromGram(spec: FormulaSpec, g: GramResult): OlsFit =
    OlsFit(spec, g.solve(), g.n)

  /** The spec's design-matrix columns, intercept-first — the xCols a
    * caller must hand [[Gram.momentsMulti]] for [[fitFromGram]]. */
  def designCols(spec: FormulaSpec): Seq[Column] = {
    val xs0 = spec.terms.map(col)
    if (spec.intercept) lit(1.0) +: xs0 else xs0
  }

  /** RMSE = sqrt(mean(e²)) and R² = 1 − SSR/SST over `df`
    * (`RegDI2.R:228-235`, `PC.R:331-338`), one pass. */
  def metrics(df: DataFrame, yCol: String, predicted: Column): FitMetrics = {
    val e = col(yCol) - predicted
    val r = df.agg(
      sum(e * e).as("ssr"), sum(col(yCol)).as("sy"),
      sum(col(yCol) * col(yCol)).as("syy"), count(col(yCol)).as("n")).head()
    val ssr = r.getAs[Number]("ssr").doubleValue()
    val sy = r.getAs[Number]("sy").doubleValue()
    val syy = r.getAs[Number]("syy").doubleValue()
    val n = r.getAs[Long]("n").toDouble
    val sst = syy - sy * sy / n
    FitMetrics(rmse = math.sqrt(ssr / n), r2 = 1.0 - ssr / sst)
  }
}
