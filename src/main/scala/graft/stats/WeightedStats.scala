package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.SurveyDesign

/** Weighted survey statistics with linearization variance, re-expressing
  * `survey::svymean` / `svytotal` for `ids=~1` designs (`RegDI2.R:246-248`,
  * `PC.R:190-193,245-247`).
  *
  * For an element-level design the with-replacement linearization is
  *   μ̂ = Σwy/Σw,   zᵢ = wᵢ(yᵢ−μ̂)/Σw,   V̂(μ̂) = n/(n−1) · Σ(zᵢ−z̄)²
  * For a GREG-calibrated design, y is replaced by the residual
  * eᵢ = yᵢ − xᵢᵀB̂ of the d-weighted regression of y on the calibration
  * variables, with the calibrated weights in the score (Särndal et al.,
  * standard g-weight linearization). Each estimate is two aggregation
  * passes, each a single codegen'd job; no data leaves the executors.
  */
final case class MeanResult(mean: Double, variance: Double) {
  def se: Double = math.sqrt(variance)
}

object WeightedStats {

  /** `svytotal(~x1+…+xk, design)` — Horvitz–Thompson totals, one job. */
  def svytotal(design: SurveyDesign, xCols: Seq[String]): Map[String, Double] = {
    import graft.util.Tables.dsum
    val aggs = xCols.map(c => dsum(design.weights * col(c)).as(c))
    val row = design.df.agg(aggs.head, aggs.tail: _*).head()
    xCols.map(c => c -> row.getAs[Number](c).doubleValue()).toMap
  }

  /** `svymean(~y, design)` on an uncalibrated design. */
  def svymean(design: SurveyDesign, yCol: String): MeanResult =
    meanWithScores(design.df, col(yCol), design.weights, design.weights)

  /** `svymean(~y, calibrated_design)`: mean under calibrated weights,
    * variance from d-weighted WLS residuals on the calibration variables.
    * `dCol` is the pre-calibration design weight.
    */
  def svymeanCalibrated(
      df: DataFrame,
      yCol: String,
      wCalCol: String,
      dCol: String,
      calXCols: Seq[String]
  ): MeanResult = {
    val g = Gram.moments(df, calXCols, Some(dCol), Some(yCol))
    svymeanCalibrated(df, yCol, wCalCol, calXCols, g)
  }

  /** As above with the d-weighted Gram (INCLUDING y moments) precomputed —
    * callers that already ran the calibration Gram with `y` attached reuse
    * it here, saving a full-table pass ([[Gram.momentsMulti]]). */
  def svymeanCalibrated(
      df: DataFrame,
      yCol: String,
      wCalCol: String,
      calXCols: Seq[String],
      g: GramResult
  ): MeanResult = {
    val beta = g.solve()
    val resid = calXCols.zipWithIndex.foldLeft(col(yCol)) {
      case (acc, (c, i)) => acc - col(c) * lit(beta(i))
    }
    meanWithScores(df, col(yCol), col(wCalCol), col(wCalCol), resid)
  }

  /** Shared two-pass mean + linearization variance. `scoreY` defaults to
    * the centered y itself; for calibrated designs it is the WLS residual.
    */
  private def meanWithScores(
      df: DataFrame,
      y: Column,
      w: Column,
      scoreW: Column,
      scoreYOpt: Column = null
  ): MeanResult = {
    import graft.util.Tables.dsum
    val first = df.agg(
      dsum(w * y).as("swy"), dsum(w).as("sw"), count(lit(1)).as("n")).head()
    val sw = first.getAs[Number]("swy").doubleValue()
    val w0 = first.getAs[Number]("sw").doubleValue()
    val mu = sw / w0
    val scoreBase = Option(scoreYOpt).getOrElse(y - lit(mu))
    val z = scoreW * scoreBase / lit(w0)
    val second = df.agg(dsum(z * z).as("szz"), dsum(z).as("sz"),
      count(lit(1)).as("n")).head()
    val szz = second.getAs[Number]("szz").doubleValue()
    val sz = second.getAs[Number]("sz").doubleValue()
    val n = second.getAs[Long]("n").toDouble
    val varEst =
      if (n <= 1) 0.0 else n / (n - 1.0) * (szz - sz * sz / n)
    MeanResult(mu, varEst)
  }
}
