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
  * computed as n/(n−1)·(Σsᵢ² − (Σsᵢ)²/n)/(Σw)² over the UNNORMALIZED
  * scores sᵢ = wᵢ(yᵢ−μ̂): dividing each score by Σw before the exact-
  * decimal aggregation would put the z² addends at O(1/n²), below the
  * DECIMAL(38,10) quantum for n ≳ 10⁵ — every addend rounds to 0 and
  * the variance silently collapses (r15 review). The aggregated sums
  * keep O(w²y²) addends at any n; the (Σw)² division happens once,
  * driver-side, in IEEE.
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

  /** The fail-loud NULL contract of every estimator here: a NULL value
    * would be silently SKIPPED by the decimal sum while the row still
    * counts in n and its weight in Σw — a plausible-looking biased mean
    * and a variance on an inflated n, with no error (survey:: returns
    * NA; r16 review). Raise with the column named instead; rows a
    * caller wants excluded must be filtered before the design. */
  private def loud(c: Column, what: String, fn: String): Column =
    when(c.isNull, raise_error(lit(
      s"$fn: NULL in $what — it would silently drop from the weighted " +
        "sums while still counting in n and Σw; filter or impute first")))
      .otherwise(c)

  /** Named empty-frame guard for the driver-side sum reads: dsum over
    * zero rows is NULL, and getAs[Number](...).doubleValue() would NPE
    * with no message (r16 review). */
  private def num(row: org.apache.spark.sql.Row, field: String,
                  fn: String): Double = {
    val v = row.getAs[Number](field)
    require(v != null,
      s"$fn: aggregate '$field' is NULL — empty input frame?")
    v.doubleValue()
  }

  /** `svytotal(~x1+…+xk, design)` — Horvitz–Thompson totals, one job. */
  def svytotal(design: SurveyDesign, xCols: Seq[String]): Map[String, Double] = {
    import graft.util.Tables.dsum
    val w = loud(design.weights, "the design weights", "svytotal")
    val aggs = xCols.map(c => dsum(w * loud(col(c), s"'$c'", "svytotal")).as(c))
    val row = design.df.agg(aggs.head, aggs.tail: _*).head()
    xCols.map(c => c -> num(row, c, "svytotal")).toMap
  }

  /** `svymean(~y, design)` on an uncalibrated design. */
  def svymean(design: SurveyDesign, yCol: String): MeanResult =
    meanWithScores(design.df, col(yCol), design.weights)

  /** `svyratio(~y, ~x, design)` — ratio of HT totals R̂ = Σwy/Σwx with
    * Taylor linearization variance: zᵢ = wᵢ(yᵢ − R̂xᵢ)/Σwx, then the same
    * with-replacement score variance as [[svymean]]. Two aggregation jobs.
    */
  def svyratio(design: SurveyDesign, yCol: String, xCol: String): RatioResult = {
    import graft.util.Tables.dsum
    val w = loud(design.weights, "the design weights", "svyratio")
    val yG = loud(col(yCol), s"'$yCol'", "svyratio")
    val xG = loud(col(xCol), s"'$xCol'", "svyratio")
    val first = design.df.agg(
      dsum(w * yG).as("swy"), dsum(w * xG).as("swx")).head()
    val swx = num(first, "swx", "svyratio")
    require(swx != 0.0, "svyratio denominator total is zero")
    val r = num(first, "swy", "svyratio") / swx
    val s = w * (yG - lit(r) * xG)
    RatioResult(r, scoreVariance(design.df, s, swx))
  }

  /** Domain (subpopulation) mean with design-correct variance: the domain
    * indicator u stays IN the score — zᵢ = wᵢuᵢ(yᵢ − μ̂_D)/Σ_D w over the
    * FULL sample with the full n — so the randomness of the realized
    * domain size is kept in the variance (filtering the frame first and
    * reusing [[svymean]] would understate it; Särndal et al. §5.8).
    */
  def svymeanDomain(design: SurveyDesign, yCol: String, domain: Column): MeanResult = {
    import graft.util.Tables.dsum
    val w = loud(design.weights, "the design weights", "svymeanDomain")
    val u = when(domain, lit(1.0)).otherwise(lit(0.0))
    // y may legitimately be NULL OUTSIDE the domain (it never enters an
    // estimate there — though beware 0·NULL = NULL in SQL, hence the
    // explicit otherwise-0 below); INSIDE the domain a NULL y is the
    // silent-bias route loud() exists for
    val yG = when(u === lit(1.0),
      loud(col(yCol), s"'$yCol' (inside the domain)", "svymeanDomain"))
      .otherwise(lit(0.0))
    val first = design.df.agg(
      dsum(w * u * yG).as("swy"), dsum(w * u).as("sw")).head()
    val swD = num(first, "sw", "svymeanDomain")
    require(swD != 0.0, "empty estimation domain")
    val mu = num(first, "swy", "svymeanDomain") / swD
    val s = w * u * (yG - lit(mu))
    MeanResult(mu, scoreVariance(design.df, s, swD))
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
    import org.apache.spark.sql.expressions.Window
    val w = design.weights
    val df = design.df
    // a NULL group key would fall out of the equi-join below silently
    // (null ≠ null in a join), vanishing from the output while its rows
    // still inflate every other group's full-sample n — raise instead
    // (the aspectBuckets NULL convention); coalesce a sentinel first if
    // NULL-as-group is wanted (r15 review)
    val g = when(col(groupCol).isNull, raise_error(lit(
      s"svybyMean: NULL in group column '$groupCol' — the group would " +
        "silently vanish from the output; coalesce a sentinel first")))
      .otherwise(col(groupCol))
    val wG = loud(w, "the design weights", "svybyMean")
    val yG = loud(col(yCol), s"'$yCol'", "svybyMean")
    val m = df.groupBy(g.as(groupCol))
      .agg(dsum(wG * yG).as("__sdy"), dsum(wG).as("__sd"),
        count(lit(1)).as("__cnt"))
    // full-sample n rides the grouped frame via ONE empty-partition
    // window: m is group-count-sized and broadcast below, so the
    // single-task window is bounded by the same contract that makes
    // the join broadcastable (NOT the hotKeys unbounded-key hazard) —
    // the old separate df.agg(count) was a third full scan (r15 review)
    val mt = m.withColumn("__n",
      sum(col("__cnt")).over(Window.partitionBy()).cast("double"))
    val joined = df.join(broadcast(mt), groupCol)
    // a zero summed weight first bites HERE (the per-row score divides
    // by Σ_g w): an unnamed ANSI DIVIDE_BY_ZERO, or a silent NULL score
    // non-ANSI — name the group instead (r16 review)
    val sdLoud = when(col("__sd") === lit(0.0), raise_error(concat(
      lit("svybyMean: summed weight is zero in group "),
      col(groupCol).cast("string")))).otherwise(col("__sd"))
    // UNNORMALIZED scores (see the object scaladoc): the /Σ_g w happens
    // once per group after aggregation, not per decimal addend
    val s = w * (col(yCol) - col("__sdy") / sdLoud)
    // a zero summed weight makes mean_y a divide-by-zero (an unnamed
    // ANSI error, or a silent NULL row non-ANSI) — name the group
    // instead; n ≤ 1 gets variance 0 (the scoreVariance convention);
    // and the decimal quantum can zero every s² addend while the s
    // addends survive, leaving a small NEGATIVE variance whose sqrt is
    // NaN — clamp at 0 (r16 review)
    val sdOk = when(col("__sd2") === lit(0.0), raise_error(concat(
      lit("svybyMean: summed weight is zero in group "),
      col(groupCol).cast("string")))).otherwise(col("__sd2"))
    joined.groupBy(col(groupCol))
      .agg(first(col("__sdy")).as("__sdy2"), first(col("__sd")).as("__sd2"),
        first(col("__n")).as("__n2"),
        dsum(s * s).as("__sss"), dsum(s).as("__ss"))
      .select(col(groupCol),
        (col("__sdy2") / sdOk).as("mean_y"),
        when(col("__n2") <= lit(1.0), lit(0.0))
          .otherwise(greatest(lit(0.0),
            col("__n2") / (col("__n2") - lit(1.0)) *
              (col("__sss") - col("__ss") * col("__ss") / col("__n2")) /
              (sdOk * sdOk))).as("var_mean"))
  }

  /** With-replacement score variance n/(n−1)·(Σs² − (Σs)²/n)/denom²
    * from exact-decimal sums of the UNNORMALIZED scores s — the shared
    * second pass of every linearized estimator here. `denom` is the Σw
    * (or Σwx) the textbook z = s/denom would carry; dividing AFTER the
    * aggregation keeps the decimal addends at O(w²y²) instead of
    * O(1/n²), which the DECIMAL(38,10) quantum destroys at large n
    * (see the object scaladoc). */
  private def scoreVariance(df: DataFrame, s: Column,
                            denom: Double): Double = {
    import graft.util.Tables.dsum
    val second = df.agg(dsum(s * s).as("sss"), dsum(s).as("ss"),
      count(lit(1)).as("n")).head()
    val sss = num(second, "sss", "scoreVariance")
    val ss = num(second, "ss", "scoreVariance")
    val n = second.getAs[Long]("n").toDouble
    if (n <= 1) 0.0
    // clamped at 0: the decimal quantum can zero every s² addend while
    // the s addends survive (constant y at large n), leaving a tiny
    // NEGATIVE value whose sqrt in .se would be NaN (r16 review)
    else math.max(0.0,
      n / (n - 1.0) * (sss - ss * ss / n) / (denom * denom))
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
    meanWithScores(df, col(yCol), col(wCalCol), Some(resid),
      fn = "svymeanCalibrated")
  }

  /** Shared two-pass mean + linearization variance. `scoreYOpt` defaults
    * to the centered y itself; for calibrated designs it is the WLS
    * residual. (The former separate `scoreW` parameter was dead — every
    * caller passed the mean weight twice — and only invited a
    * mismatched-weights call; r16 review.) `fn` names the PUBLIC caller
    * in loud()/num() errors — a hardcoded "svymean" attributed
    * calibrated-path failures to the wrong entry point (r16 advice). */
  private def meanWithScores(
      df: DataFrame,
      y: Column,
      w: Column,
      scoreYOpt: Option[Column] = None,
      fn: String = "svymean"
  ): MeanResult = {
    import graft.util.Tables.dsum
    val wG = loud(w, "the weights", fn)
    val yG = loud(y, "the response", fn)
    val first = df.agg(
      dsum(wG * yG).as("swy"), dsum(wG).as("sw"),
      count(lit(1)).as("n")).head()
    val sw = num(first, "swy", fn)
    val w0 = num(first, "sw", fn)
    require(w0 != 0.0, s"$fn: weights sum to zero")
    val mu = sw / w0
    val s = wG * scoreYOpt.getOrElse(yG - lit(mu))
    MeanResult(mu, scoreVariance(df, s, w0))
  }
}
