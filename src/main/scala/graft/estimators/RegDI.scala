package graft.estimators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{ColumnResolver, FormulaSpec, Fusion, SurveyDesign}
import graft.stats.{Calibration, Gram, Logistic, Ols, WeightedStats}
import graft.util.Tables.{dsum, dvarSamp}

/** RegDI calibration estimator (Kim & Tam 2021), re-expressing
  * `RegDI2.R:5-333` Spark-first.
  *
  * Pipeline (one lazy plan + a handful of tiny-aggregate actions):
  *   fuse A/B (broadcast-A full-outer join) → indicator + delta feature
  *   columns → one multi-column totals agg → GREG calibration on the
  *   A-rows (Gram agg + k×k driver solve, k = 3 + #aux) → weighted mean
  *   with linearization variance. Corrections:
  *     0/1 — calibrated `svymean(~y_A)` (`RegDI2.R:244-248,320-325`)
  *     2   — measurement-error: OLS y_A ~ y_B on A∩B, invert, rebuild
  *           `delta_yi_corrected` totals, re-calibrate (`RegDI2.R:250-307`)
  *     3   — doubly robust: outcome model on A, predict all, combine
  *           (`RegDI2.R:196-241,309-313`)
  *
  * Scale: no data rows ever reach the driver. Per-correction cost is
  * O(#rows) scan work with O(k²) aggregate state; the only shuffle is the
  * fusion join (avoided when A broadcasts).
  */
final case class RegDIResult(
    mean: Double, variance: Double,
    rmse: Option[Double] = None, r2: Option[Double] = None) {
  def se: Double = math.sqrt(variance)
}

final case class RegDIConfig(
    yACol: String,
    yBCol: String,
    auxVars: Seq[String] = Nil,
    nTotal: Option[Double] = None,
    weightsA: Option[String] = None,
    outcomeModel: Option[String] = None,
    modelType: String = "normal",
    correction: Int = 0,
    evalModelPerformance: Boolean = false
)

object RegDI {

  /** Two-table API (`RegDI2.R` with data_A/data_B). */
  def twoSample(
      dataA: DataFrame,
      dataB: DataFrame,
      idVarA: String,
      idVarB: String,
      cfg: RegDIConfig
  ): RegDIResult = {
    val fusion = Fusion.fuse(dataA, dataB, idVarA, idVarB)
    // side-aware resolution (fixes the reference's cell-10 rename bug)
    val yA = fusion.fromA.getOrElse(cfg.yACol, cfg.yACol)
    val yB = fusion.fromB.getOrElse(cfg.yBCol, cfg.yBCol)
    val aux = cfg.auxVars.map(v => fusion.fromB.getOrElse(v, v))
    val df = fusion.df
      .withColumn("ind_var_A", col(yA).isNotNull.cast("int"))
      .withColumn("ind_var_B", col(yB).isNotNull.cast("int"))
    run(df, "ind_var_A", "ind_var_B", yA, yB, aux,
      cfg.weightsA.map(w => fusion.fromA.getOrElse(w, w)), cfg,
      nTotalDirect = None)
  }

  /** One-table API (`RegDI2.R` with `data` + indicator columns). */
  def oneTable(
      data: DataFrame,
      indVarA: String,
      indVarB: String,
      cfg: RegDIConfig
  ): RegDIResult =
    run(data, indVarA, indVarB, cfg.yACol, cfg.yBCol, cfg.auxVars,
      cfg.weightsA, cfg, nTotalDirect = Some(data.count().toDouble))

  // ------------------------------------------------------------------

  private def run(
      data0: DataFrame,
      indA: String, indB: String,
      yA: String, yB: String,
      aux: Seq[String],
      weightsA: Option[String],
      cfg: RegDIConfig,
      nTotalDirect: Option[Double]
  ): RegDIResult = {
    val isA = col(indA) === 1
    val isB = col(indB) === 1

    // N_total (RegDI2.R:91-103) + sample sizes in ONE aggregate job
    // (coalesce: an empty sample sums to NULL, which must surface as the
    // "No units" contract below, not a null-value read)
    val szRow = data0.agg(
      coalesce(dsum(when(isA, lit(1.0))), lit(0.0)).as("nA"),
      coalesce(dsum(when(isB, lit(1.0))), lit(0.0)).as("nB"),
      coalesce(weightsA.map(w => dsum(when(isA, col(w))))
        .getOrElse(lit(0.0)), lit(0.0)).as("sumWA")).head()
    val sizeA = szRow.getDouble(0)
    val sizeB = szRow.getDouble(1)
    require(sizeA > 0, "No units in sample A")
    require(sizeB > 0, "No units in sample B")
    val nTotal: Double = cfg.nTotal
      .orElse(nTotalDirect)
      .getOrElse {
        require(weightsA.nonEmpty,
          "To approximate N_total, provide weights for sample A")
        szRow.getDouble(2)
      }

    // d_i_A (RegDI2.R:106-116): given weights on A-rows, else N/n_A
    val dA: Column = weightsA match {
      case Some(w) => when(isA, col(w)).otherwise(lit(0.0))
      case None    => when(isA, lit(nTotal / sizeA)).otherwise(lit(0.0))
    }

    // delta feature columns (RegDI2.R:126-141)
    val data = data0
      .withColumn("d_i_A", dA)
      .withColumn("uno", lit(1.0))
      .withColumn("delta_i", when(isB, lit(1.0)).otherwise(lit(0.0)))
      .withColumn("delta_yi", when(isB, col(yB)).otherwise(lit(0.0)))
      .transform(d => aux.foldLeft(d) { (acc, z) =>
        acc.withColumn(s"delta_$z", when(isB, col(z)).otherwise(lit(0.0)))
      })
      .cache()

    try {
      // calibration totals (RegDI2.R:144-168) — one multi-agg job
      val deltaCols = Seq("delta_i", "delta_yi") ++ aux.map(z => s"delta_$z")
      val totRow = data.agg(
        dsum(col("delta_i")).as("t_di"),
        (dsum(col("delta_yi")) +: aux.map(z => dsum(col(s"delta_$z")))): _*
      ).head()
      val calCols = "uno" +: "delta_i" +: "delta_yi" +: aux.map(z => s"delta_$z")
      val totals = nTotal +: (0 until deltaCols.size).map(i =>
        if (totRow.isNullAt(i)) 0.0 else totRow.getDouble(i))

      // GREG calibration of the A-row design (RegDI2.R:181-193)
      val designA = SurveyDesign(data.filter(isA), "d_i_A")
      val (calDf, _) = Calibration.calibrate(designA, calCols, totals, "w_cal")

      cfg.correction match {
        case 0 | 1 =>
          val m = WeightedStats.svymeanCalibrated(
            calDf, yA, "w_cal", "d_i_A", calCols)
          RegDIResult(m.mean, m.variance)

        case 2 =>
          measurementError(data, isA, isB, yA, yB, aux, nTotal, totals)

        case 3 =>
          doublyRobust(data, calDf, isA, yA, aux, nTotal, sizeA, cfg)

        case c => throw new IllegalArgumentException(s"correction $c not in 0-3")
      }
    } finally data.unpersist()
  }

  /** Correction 2 (RegDI2.R:250-307): measurement-error inversion from the
    * A∩B validation overlap, then re-calibration on corrected totals. */
  private def measurementError(
      data: DataFrame,
      isA: Column, isB: Column,
      yA: String, yB: String,
      aux: Seq[String],
      nTotal: Double,
      totals: Seq[Double]
  ): RegDIResult = {
    val overlap = data.filter(isA && isB)
    val fit = Ols.fit(overlap, FormulaSpec(Some(yA), Seq(yB), intercept = true))
    val (b0, b1) = (fit.beta(0), fit.beta(1))
    require(fit.n >= 2,
      "Not enough validation data in sample A for the measurement-error model")

    val corrected = data
      .withColumn("y_corrected",
        when(isA, (col(yA) - lit(b0)) / lit(b1)).otherwise(col(yB)))
      .withColumn("delta_yi_corrected",
        when(isB, col("y_corrected")).otherwise(lit(0.0)))

    val tCorr = corrected.agg(dsum(col("delta_yi_corrected"))).head().getDouble(0)
    // totals: uno, delta_i unchanged; delta_yi replaced; aux appended
    val calCols = "uno" +: "delta_i" +: "delta_yi_corrected" +:
      aux.map(z => s"delta_$z")
    val totalsCorr = totals(0) +: totals(1) +: tCorr +: totals.drop(3)

    val designA = SurveyDesign(corrected.filter(isA), "d_i_A")
    val (calDf, _) = Calibration.calibrate(designA, calCols, totalsCorr, "w_cal")
    val m = WeightedStats.svymeanCalibrated(
      calDf, "y_corrected", "w_cal", "d_i_A", calCols)
    RegDIResult(m.mean, m.variance)
  }

  /** Correction 3 (RegDI2.R:196-241): outcome model on A, predict all,
    * DR combination (Σ w_cal·e + Σ ŷ)/N with its variance. */
  private def doublyRobust(
      data: DataFrame,
      calDf: DataFrame,
      isA: Column,
      yA: String,
      aux: Seq[String],
      nTotal: Double,
      sizeA: Double,
      cfg: RegDIConfig
  ): RegDIResult = {
    val model = cfg.outcomeModel.getOrElse(throw new IllegalArgumentException(
      "Correction 3 requires 'outcomeModel'"))
    val spec = ColumnResolver.resolve(FormulaSpec.parse(model), data)
    val predict: Column = cfg.modelType match {
      case "normal"   => Ols.fit(data.filter(isA), spec).predict
      case "logistic" => Logistic.fit(data.filter(isA), spec).predict
      case t => throw new IllegalArgumentException(s"model_type '$t' unsupported")
    }

    // calDf IS the A-row frame with w_cal attached; predict is a pure
    // column expression, so score each frame independently — no join.
    val aScored = calDf.withColumn("Y_pred", predict)
    val allScored = data.withColumn("Y_pred", predict)

    val wres = (col(yA) - col("Y_pred")) * col("w_cal")
    val aSums = aScored.agg(
      dsum(wres).as("s_wres"),
      (dvarSamp(wres) / lit(sizeA)).as("v_wres"),
      dsum(when(isA, col(yA))).as("s_yA"),
      dsum((col(yA) - col("Y_pred")) * (col(yA) - col("Y_pred"))).as("ssr")
    ).head()
    val uSums = allScored.agg(
      dsum(col("Y_pred")).as("s_pred"),
      (dvarSamp(col("Y_pred")) / lit(nTotal)).as("v_pred")).head()

    val mean = (aSums.getDouble(0) + uSums.getDouble(0)) / nTotal
    val variance = aSums.getDouble(1) + uSums.getDouble(1)
    if (!cfg.evalModelPerformance) RegDIResult(mean, variance)
    else {
      val ssr = aSums.getDouble(3)
      val meanYA = aSums.getDouble(2) / sizeA
      val sst = aScored
        .agg(dsum((col(yA) - lit(meanYA)) * (col(yA) - lit(meanYA))))
        .head().getDouble(0)
      RegDIResult(mean, variance,
        rmse = Some(math.sqrt(ssr / sizeA)), r2 = Some(1.0 - ssr / sst))
    }
  }
}
