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

  /** Treatment-coded dummy columns for a factor (first level dropped —
    * R's default contr.treatment). */
  def factorDummies(data: DataFrame, c: String): Seq[Column] =
    dummies(c, data.select(col(c).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq)

  private def dummies(c: String, levels: Seq[String]): Seq[Column] = {
    require(levels.size >= 2, s"factor $c needs ≥2 levels")
    levels.drop(1).map(l => (col(c).cast("string") === l).cast("double"))
  }

  /** Level sets of several factors in ONE distributed pass (levels are
    * few; the scan is what costs at scale). Fails loudly on NULL factor
    * values: `collect_set` silently drops NULLs, which would otherwise
    * let null-level rows contribute all-zero dummies while still being
    * counted in the Gram's n — silently inconsistent ANOVA sums. The
    * null counts ride the same pass as the level sets. */
  def factorLevels(data: DataFrame, cols: Seq[String]): Map[String, Seq[String]] = {
    val aggs = cols.map(c => collect_set(col(c).cast("string")).as(c)) ++
      cols.map(c => count(when(col(c).isNull, 1)).as(s"__nulls_$c"))
    val row = data.agg(aggs.head, aggs.tail: _*).head()
    cols.foreach { c =>
      val nNull = row.getLong(row.fieldIndex(s"__nulls_$c"))
      require(nNull == 0L,
        s"factor column $c has $nNull NULL values; drop or impute them before ANOVA")
    }
    cols.map(c => c -> row.getSeq[String](row.fieldIndex(c)).sorted.toSeq).toMap
  }

  /** Sequential (Type-I) ANOVA over arbitrary ordered terms, each a
    * named group of design columns (`aov(y ~ t1 + t2 + …)`). One Gram
    * pass over the widest design; each prefix's RSS comes from a
    * sub-block solve. */
  def sequential(data: DataFrame, yCol: String,
                 terms: Seq[(String, Seq[Column])]): Seq[AnovaRow] = {
    val features = Seq(lit(1.0)) ++ terms.flatMap(_._2)
    val g = Gram.moments(data, features, lit(1.0), Some(col(yCol)),
      exact = false)
    val n = g.n

    def rssAt(p: Int): Double = {
      val sub = g.xtwx(0 until p, 0 until p).toDenseMatrix
      val rhs = g.xtwy(0 until p).toDenseVector
      val beta = sub \ rhs
      g.swyy - (beta dot rhs)
    }

    val prefixes = terms.scanLeft(1)((p, t) => p + t._2.size)
    val rss = prefixes.map(rssAt)
    val pFull = prefixes.last
    val dfResid = n - pFull
    val msResid = rss.last / dfResid

    def row(term: String, df: Long, ss: Double): AnovaRow = {
      val ms = ss / df
      val f = ms / msResid
      val p = 1.0 - new FDistribution(df.toDouble, dfResid.toDouble)
        .cumulativeProbability(f)
      AnovaRow(term, df, ss, ms, f, p)
    }

    terms.zipWithIndex.map { case ((name, cols), i) =>
      row(name, cols.size.toLong, rss(i) - rss(i + 1))
    } :+ AnovaRow("Residuals", dfResid, rss.last, msResid,
      Double.NaN, Double.NaN)
  }

  def twoFactor(data: DataFrame, yCol: String, factorA: String,
                factorB: String): Seq[AnovaRow] = {
    val lv = factorLevels(data, Seq(factorA, factorB).distinct)
    val aD = dummies(factorA, lv(factorA))
    val bD = dummies(factorB, lv(factorB))
    val abD = for (a <- aD; b <- bD) yield a * b
    sequential(data, yCol, Seq(
      factorA -> aD, factorB -> bD, s"$factorA:$factorB" -> abD))
  }

  /** DataFrame rendition for the query catalog. */
  def twoFactorDf(data: DataFrame, yCol: String, factorA: String,
                  factorB: String): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    twoFactor(data, yCol, factorA, factorB).toDF()
  }
}
