package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Tables.dsum

/** Isotonic regression (pool-adjacent-violators) for score calibration:
  * the monotone-nondecreasing step function minimizing weighted squared
  * error to the observed (score, label) relationship — the standard
  * calibration layer over ML scores (Zadrozny & Elkan 2002).
  *
  * Scale design: raw (score, label) pairs are first reduced to BINNED
  * sufficient statistics (bin weight + label mean) in one partial-
  * aggregable pass — PAVA over bins is exactly PAVA over the raw data
  * when bins partition the score axis, because isotonic fits depend
  * only on (weight, mean) per distinct x. The driver then pools the
  * bounded bin table (nBins rows) and the calibrated mapping goes back
  * as a broadcastable step table. No per-row state, no second scan.
  */
object Isotonic {

  /** PAVA over (weight, mean) pairs already sorted by x ascending.
    * Returns the fitted (monotone) value per input position. */
  def pava(weights: Seq[Double], means: Seq[Double]): Seq[Double] = {
    require(weights.length == means.length, "weights/means length mismatch")
    require(weights.forall(_ > 0.0), "PAVA needs positive weights")
    case class Block(var w: Double, var mean: Double, var count: Int)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    weights.zip(means).foreach { case (w, m) =>
      stack += Block(w, m, 1)
      // pool while the monotonicity constraint is violated
      while (stack.length >= 2 &&
          stack(stack.length - 2).mean > stack.last.mean) {
        val top = stack.remove(stack.length - 1)
        val prev = stack.last
        val w2 = prev.w + top.w
        prev.mean = (prev.w * prev.mean + top.w * top.mean) / w2
        prev.w = w2
        prev.count += top.count
      }
    }
    stack.flatMap(b => Seq.fill(b.count)(b.mean)).toSeq
  }

  /** Fit a binned isotonic calibration: equal-width bins over
    * [lo, hi) — scores OUTSIDE the range are clamped into the edge
    * bins (the standard calibration treatment of out-of-range scores;
    * an edge bin's `x_lo` labels its in-range boundary, not the
    * clamped mass). Labels mean-pooled to monotone. Returns one row
    * per non-empty bin: (bin, x_lo, n, y_mean, fitted). */
  def fitBinned(df: DataFrame, scoreCol: String, labelCol: String,
                lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 1 && hi > lo, s"bad isotonic spec [$lo, $hi) x $nBins")
    val width = (hi - lo) / nBins
    val bin = least(lit(nBins - 1L),
      greatest(lit(0L),
        floor((col(scoreCol) - lit(lo)) / lit(width)).cast("long")))
    // NaN is neither filtered by isNotNull nor binned sanely: a NaN
    // score floor-casts to 0 under non-ANSI rules and lands in bin 0
    // (silently skewing the low end), and a NaN label NPEs later at
    // getDouble. Raise with the column named (NULLs stay silently
    // dropped — that IS the documented WHERE-clause contract the m43
    // oracle mirrors; NaN has no SQL rendition to mirror).
    val scoreG = when(isnan(col(scoreCol)), raise_error(lit(
      s"fitBinned: NaN in score column '$scoreCol'")))
      .otherwise(col(scoreCol))
    val labelG = when(isnan(col(labelCol)), raise_error(lit(
      s"fitBinned: NaN in label column '$labelCol'")))
      .otherwise(col(labelCol))
    val bins = df
      .select(scoreG.as(scoreCol), labelG.as(labelCol))
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).cast("double").as("w"),
        graft.util.Tables.dmean(col(labelCol)).as("y_mean"))
      .orderBy("bin")
      .collect()
    require(bins.nonEmpty, "no data to calibrate")
    val fitted = pava(bins.map(_.getDouble(1)).toSeq,
      bins.map(_.getDouble(2)).toSeq)
    val spark = df.sparkSession
    import spark.implicits._
    bins.zip(fitted).map { case (r, f) =>
      val b = r.getLong(0)
      (b, lo + b.toDouble * width, r.getDouble(1).toLong, r.getDouble(2), f)
    }.toSeq.toDF("bin", "x_lo", "n", "y_mean", "fitted")
  }
}
