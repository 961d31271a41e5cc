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

final case class RatioResult(ratio: Double, variance: Double) {
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

  /** `svyratio(~y, ~x, design)` — ratio of HT totals R̂ = Σwy/Σwx with
    * Taylor linearization variance: zᵢ = wᵢ(yᵢ − R̂xᵢ)/Σwx, then the same
    * with-replacement score variance as [[svymean]]. Two aggregation jobs.
    */
  def svyratio(design: SurveyDesign, yCol: String, xCol: String): RatioResult = {
    import graft.util.Tables.dsum
    val w = design.weights
    val first = design.df.agg(
      dsum(w * col(yCol)).as("swy"), dsum(w * col(xCol)).as("swx")).head()
    val swx = first.getAs[Number]("swx").doubleValue()
    require(swx != 0.0, "svyratio denominator total is zero")
    val r = first.getAs[Number]("swy").doubleValue() / swx
    val z = w * (col(yCol) - lit(r) * col(xCol)) / lit(swx)
    RatioResult(r, scoreVariance(design.df, z))
  }

  /** Domain (subpopulation) mean with design-correct variance: the domain
    * indicator u stays IN the score — zᵢ = wᵢuᵢ(yᵢ − μ̂_D)/Σ_D w over the
    * FULL sample with the full n — so the randomness of the realized
    * domain size is kept in the variance (filtering the frame first and
    * reusing [[svymean]] would understate it; Särndal et al. §5.8).
    */
  def svymeanDomain(design: SurveyDesign, yCol: String, domain: Column): MeanResult = {
    import graft.util.Tables.dsum
    val w = design.weights
    val u = when(domain, lit(1.0)).otherwise(lit(0.0))
    val first = design.df.agg(
      dsum(w * u * col(yCol)).as("swy"), dsum(w * u).as("sw")).head()
    val swD = first.getAs[Number]("sw").doubleValue()
    require(swD != 0.0, "empty estimation domain")
    val mu = first.getAs[Number]("swy").doubleValue() / swD
    val z = w * u * (col(yCol) - lit(mu)) / lit(swD)
    MeanResult(mu, scoreVariance(design.df, z))
  }

  /** `svyby(~y, ~g, design, svymean)` — per-group domain means with the
    * design-correct domain variance for EVERY group in two grouped
    * passes (each one shuffle, any group count): each group is a
    * domain, so its score z = w(y−μ_g)/Σ_g w is zero outside the group
    * and the variance uses the FULL sample size. All closed-form IEEE
    * over exact-decimal sums — engine-portable. */
  def svybyMean(design: SurveyDesign, yCol: String,
                groupCol: String): DataFrame = {
    import graft.util.Tables.dsum
    val w = design.weights
    val df = design.df
    val m = df.groupBy(col(groupCol))
      .agg(dsum(w * col(yCol)).as("__sdy"), dsum(w).as("__sd"))
    val joined = df.join(broadcast(m), groupCol)
    val z = w * (col(yCol) - col("__sdy") / col("__sd")) / col("__sd")
    val v = joined.groupBy(col(groupCol))
      .agg(dsum(z * z).as("__szz"), dsum(z).as("__sz"))
    val n = df.agg(count(lit(1)).cast("double").as("__n"))
    m.join(v, groupCol).crossJoin(broadcast(n))
      .select(col(groupCol),
        (col("__sdy") / col("__sd")).as("mean_y"),
        (col("__n") / (col("__n") - lit(1.0)) *
          (col("__szz") - col("__sz") * col("__sz") / col("__n")))
          .as("var_mean"))
  }

  /** With-replacement score variance n/(n−1)·(Σz² − (Σz)²/n) from exact-
    * decimal sums — the shared second pass of every linearized estimator
    * here. */
  private def scoreVariance(df: DataFrame, z: Column): Double = {
    import graft.util.Tables.dsum
    val second = df.agg(dsum(z * z).as("szz"), dsum(z).as("sz"),
      count(lit(1)).as("n")).head()
    val szz = second.getAs[Number]("szz").doubleValue()
    val sz = second.getAs[Number]("sz").doubleValue()
    val n = second.getAs[Long]("n").toDouble
    if (n <= 1) 0.0 else n / (n - 1.0) * (szz - sz * sz / n)
  }

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
    MeanResult(mu, scoreVariance(df, z))
  }
}
