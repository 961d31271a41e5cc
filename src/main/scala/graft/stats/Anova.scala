package graft.stats

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.commons.math3.distribution.FDistribution
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-factor ANOVA with interaction, Type-I (sequential) sums of squares
  * — `aov(Bias ~ factor(Sd) * factor(Gamma))`, `ipynb:2828-2836 (cell 42)`.
  *
  * R's `aov` fits the nested model sequence (1) → (1+A) → (1+A+B) →
  * (1+A+B+A:B) and reports SS as successive RSS drops. Because each
  * design is a PREFIX of the next (treatment-coded dummies), one Gram
  * pass over the widest design yields every nested RSS: solve the
  * leading p×p sub-system for each prefix p and use
  * RSS_p = Σy² − βᵀ(Xᵀy). So the whole table costs ONE distributed
  * aggregation of O(k²) state (k = 1+(a−1)+(b−1)+(a−1)(b−1)) plus driver
  * solves — no per-model scans, no data collected.
  */
final case class AnovaRow(term: String, df: Long, sumSq: Double,
                          meanSq: Double, fValue: Double, pValue: Double)

object Anova {

  def twoFactor(data: DataFrame, yCol: String, factorA: String,
                factorB: String): Seq[AnovaRow] = {
    def levels(c: String): Seq[String] =
      data.select(col(c).cast("string")).distinct()
        .collect().map(_.getString(0)).sorted.toSeq
    val aLv = levels(factorA)
    val bLv = levels(factorB)
    require(aLv.size >= 2 && bLv.size >= 2, "each factor needs ≥2 levels")

    // treatment coding, first level dropped (R default contr.treatment)
    def dummies(c: String, lv: Seq[String]): Seq[Column] =
      lv.drop(1).map(l => (col(c).cast("string") === l).cast("double"))
    val aD = dummies(factorA, aLv)
    val bD = dummies(factorB, bLv)
    val abD = for (a <- aD; b <- bD) yield a * b
    val features = Seq(lit(1.0)) ++ aD ++ bD ++ abD

    val g = Gram.moments(data, features, lit(1.0), Some(col(yCol)),
      exact = false)
    val n = g.n

    def rssAt(p: Int): Double = {
      val sub = g.xtwx(0 until p, 0 until p).toDenseMatrix
      val rhs = g.xtwy(0 until p).toDenseVector
      val beta = sub \ rhs
      g.swyy - (beta dot rhs)
    }

    val p0 = 1
    val p1 = p0 + aD.size
    val p2 = p1 + bD.size
    val p3 = p2 + abD.size
    val (r0, r1, r2, r3) = (rssAt(p0), rssAt(p1), rssAt(p2), rssAt(p3))
    val dfResid = n - p3
    val msResid = r3 / dfResid

    def row(term: String, df: Long, ss: Double): AnovaRow = {
      val ms = ss / df
      val f = ms / msResid
      val p = 1.0 - new FDistribution(df.toDouble, dfResid.toDouble)
        .cumulativeProbability(f)
      AnovaRow(term, df, ss, ms, f, p)
    }

    Seq(
      row(factorA, aD.size.toLong, r0 - r1),
      row(factorB, bD.size.toLong, r1 - r2),
      row(s"$factorA:$factorB", abD.size.toLong, r2 - r3),
      AnovaRow("Residuals", dfResid, r3, msResid, Double.NaN, Double.NaN))
  }

  /** DataFrame rendition for the query catalog. */
  def twoFactorDf(data: DataFrame, yCol: String, factorA: String,
                  factorB: String): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    twoFactor(data, yCol, factorA, factorB).toDF()
  }
}
