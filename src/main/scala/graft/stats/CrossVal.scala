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
    // ONE rollup pass yields every fold's moments AND the grand total
    // (grouping_id 1) — exact decimal sums are associative, so the
    // total row is bit-identical to a separate whole-frame aggregate
    val gAll = data.rollup(col(foldCol).cast("long").as("fold")).agg(
      grouping_id().as("gid"),
      dsum(x).as("sx"), dsum(y).as("sy"), dsum(x * y).as("sxy"),
      dsum(x * x).as("sxx"), count(lit(1)).cast("double").as("n"))
      .collect()
    def d(r: Row, name: String): Double = {
      val i = r.fieldIndex(name)
      if (r.isNullAt(i)) 0.0 else r.getAs[Number](i).doubleValue()
    }
    // empty input (or all x/y NULL): rollup over zero rows yields no
    // grand-total row and the bare .get would die as an opaque
    // 'None.get' — name the cause instead (r15 review)
    val t = gAll.find(_.getAs[Long]("gid") == 1L).getOrElse(
      throw new IllegalArgumentException(
        "olsKFold: no rows with non-NULL x and y to cross-validate"))
    val g = gAll.filter(_.getAs[Long]("gid") == 0L)
    require(g.length >= 2, s"k-fold needs at least 2 folds, got ${g.length}")
    val (sxt, syt, sxyt, sxxt, nt) =
      (d(t, "sx"), d(t, "sy"), d(t, "sxy"), d(t, "sxx"), d(t, "n"))
    val coefs = g.map { r =>
      require(!r.isNullAt(0), "NULL fold values are not allowed")
      val fold = r.getLong(0)
      val (sx2, sy2, sxy2, sxx2, n2) =
        (sxt - d(r, "sx"), syt - d(r, "sy"), sxyt - d(r, "sxy"),
          sxxt - d(r, "sxx"), nt - d(r, "n"))
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
