package graft.stats

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.util.Tables.dsum

/** K-fold cross-validation for closed-form linear fits, built on moment
  * additivity: one grouped pass collects each fold's (Σx, Σy, Σxy, Σx²,
  * n); every fold's TRAINING moments are then total − fold — no second
  * scan, no per-fold jobs, the jackknife trick applied to model
  * selection. A second pass scores each fold's held-out rows against
  * its leave-fold-out coefficients (broadcast k-row frame).
  *
  * Scale: two data passes TOTAL for any k — fold moments are
  * partial-aggregable O(k) state; evaluation is a broadcast join plus a
  * codegen'd residual. Exact-decimal sums keep both passes
  * engine-portable (the closed forms and RMSE are fixed IEEE trees;
  * sqrt is correctly rounded everywhere).
  */
object CrossVal {

  /** Per-fold leave-fold-out OLS of y ~ 1 + x and held-out RMSE.
    * Returns (fold, b0, b1, n_test, rmse) — one row per fold. */
  def olsKFold(df: DataFrame, xCol: String, yCol: String,
               foldCol: String): DataFrame = {
    val spark = df.sparkSession
    val x = col(xCol); val y = col(yCol)
    // NULL x/y rows are excluded from BOTH passes, keeping n consistent
    // with the moment sums (dsum skips NULLs; count(lit(1)) would not)
    val data = df.filter(x.isNotNull && y.isNotNull)
    // ONE grouped pass yields every fold's moments as UNCAST decimals;
    // the grand totals are the DRIVER-side sums of the k fold decimals
    // — exact decimal addition is associative and these magnitudes are
    // far under the DECIMAL(38,10) range, so the totals are
    // bit-identical to a whole-frame aggregate (the property the
    // previous rollup rendition relied on), while every input row now
    // passes through the decimal accumulators ONCE instead of twice
    // (rollup's Expand duplicated each row into fold + total buckets —
    // r17 optimization; m37's full hash oracle re-proves the equality).
    val dec = (c: org.apache.spark.sql.Column) =>
      sum(c.cast("decimal(38,10)"))
    val g = data.groupBy(col(foldCol).cast("long").as("fold")).agg(
      dec(x).as("sx"), dec(y).as("sy"), dec(x * y).as("sxy"),
      dec(x * x).as("sxx"), count(lit(1)).as("n"))
      .collect()
    if (g.isEmpty) throw new IllegalArgumentException(
      "olsKFold: no rows with non-NULL x and y to cross-validate")
    require(g.length >= 2, s"k-fold needs at least 2 folds, got ${g.length}")
    // decimal→double conversion matches Spark's Cast(decimal, double)
    // (BigDecimal.doubleValue — both correctly rounded)
    def bd(r: Row, name: String): java.math.BigDecimal = {
      val i = r.fieldIndex(name)
      // rows are pre-filtered non-NULL, so a NULL moment sum can only
      // mean DECIMAL(38,10) overflow (Spark's non-ANSI decimal sum
      // returns NULL on overflow) — substituting ZERO would yield
      // plausible-but-wrong coefficients; fail loudly instead (r17
      // advice)
      if (r.isNullAt(i)) throw new ArithmeticException(
        s"olsKFold: fold moment '$name' is NULL after non-NULL " +
          "filtering — DECIMAL(38,10) overflow; rescale the inputs")
      else r.getAs[java.math.BigDecimal](i)
    }
    def d(r: Row, name: String): Double = bd(r, name).doubleValue()
    def tot(name: String): Double =
      g.map(bd(_, name)).reduce(_.add(_)).doubleValue()
    val (sxt, syt, sxyt, sxxt) =
      (tot("sx"), tot("sy"), tot("sxy"), tot("sxx"))
    val nt = g.map(_.getAs[Long]("n")).sum.toDouble
    val coefs = g.map { r =>
      require(!r.isNullAt(0), "NULL fold values are not allowed")
      val fold = r.getLong(0)
      val (sx2, sy2, sxy2, sxx2, n2) =
        (sxt - d(r, "sx"), syt - d(r, "sy"), sxyt - d(r, "sxy"),
          sxxt - d(r, "sxx"), nt - r.getAs[Long]("n").toDouble)
      require(n2 > 1, s"fold $fold leaves <2 training rows")
      val den = sxx2 - sx2 * sx2 / n2
      require(den != 0.0,
        s"fold $fold training x is constant — OLS slope is undefined")
      val b1 = (sxy2 - sx2 * sy2 / n2) / den
      val b0 = sy2 / n2 - b1 * (sx2 / n2)
      (fold, b0, b1)
    }.toSeq
    import spark.implicits._
    val coefDf = broadcast(coefs.toDF("fold", "b0", "b1"))
    val resid = y - (col("b0") + col("b1") * x)
    data.withColumn("fold", col(foldCol).cast("long"))
      .join(coefDf, "fold")
      .groupBy("fold")
      .agg(first(col("b0")).as("b0"), first(col("b1")).as("b1"),
        count(lit(1)).as("n_test"),
        sqrt(dsum(resid * resid) / count(lit(1)).cast("double")).as("rmse"))
  }
}
