package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage in the Fellegi–Sunter style (Fellegi &
  * Sunter 1969): candidate pairs from a blocking join, a per-field
  * agreement vector, and a match score that sums per-field log-odds
  * weights (agreement weight when the field agrees, disagreement weight
  * when it doesn't — classically log2(m/u) and log2((1−m)/(1−u)); the
  * caller supplies the trained weights as literals).
  *
  * Scale design (100 TB×100 TB linkage): the ONLY join is the blocking
  * equi-join — pair volume is Σ_block |L_b|·|R_b|, never |L|·|R|; pick
  * block keys accordingly (the classic blocking-key tradeoff). The
  * agreement vector and score are pure codegen'd projections on the
  * joined rows; the threshold filter prunes before anything else sees
  * the pairs. A hot block (one huge postcode) is AQE skew-split; a
  * dimension-sized side broadcasts under normal join planning.
  */
object RecordLinkage {

  /** One field comparison: `agree` builds the boolean agreement column
    * from (left-side column, right-side column); weights are the
    * trained log-odds contributions. */
  final case class FieldComparison(
      name: String,
      agree: (Column, Column) => Column,
      wAgree: Double,
      wDisagree: Double)

  /** Score all blocked candidate pairs. Returns `(<keyCol>_l, <keyCol>_r,
    * agr_<field>… , score)`; `minScore` prunes below-threshold pairs
    * in-plan (pass `Double.NegativeInfinity` to keep the full surface).
    * Field columns must exist in BOTH frames under the same names. */
  def scorePairs(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      blockCols: Seq[String],
      comparisons: Seq[FieldComparison],
      minScore: Double = Double.NegativeInfinity
  ): DataFrame = {
    require(blockCols.nonEmpty, "record linkage needs at least one block key")
    require(comparisons.nonEmpty, "record linkage needs field comparisons")
    // a NULL blocking key never equi-joins, so the record silently
    // falls out of EVERY candidate pair (not even NULL-to-NULL) and
    // linkage recall drops with zero diagnostic — the silent-exclusion
    // shape ppsPoisson/resampleByLogWeight raise on. Field columns may
    // be NULL (the Fellegi–Sunter missing-comparison convention below);
    // block keys may not.
    def guarded(df: DataFrame, side: String): DataFrame =
      blockCols.foldLeft(df) { (d, c) =>
        d.withColumn(c, when(col(c).isNull, raise_error(lit(
          s"scorePairs: NULL in blocking column '$c' on the $side side — " +
            "the record would silently drop out of every candidate pair")))
          .otherwise(col(c)))
      }
    val l = guarded(left, "left").as("l")
    val r = guarded(right, "right").as("r")
    val cond = blockCols.map(c => col(s"l.$c") === col(s"r.$c")).reduce(_ && _)
    val joined = l.join(r, cond)
    val agrees = comparisons.map(fc =>
      fc.name -> fc.agree(col(s"l.${fc.name}"), col(s"r.${fc.name}")))
    // NULL comparison (a missing field on either side) contributes
    // weight 0 — the Fellegi–Sunter missing-comparison convention —
    // matching the NULL the agr_<field> column reports for that pair.
    // A bare otherwise(wDisagree) would penalize the pair as a
    // CONFIRMED disagreement while the agreement vector says "unknown",
    // an internally inconsistent row that silently prunes true matches
    // with sparse fields below minScore.
    val score = comparisons.zip(agrees).map { case (fc, (_, a)) =>
      when(a.isNull, lit(0.0))
        .when(a, lit(fc.wAgree)).otherwise(lit(fc.wDisagree))
    }.reduce(_ + _) // left fold: fixed, engine-portable association
    joined
      .select(
        Seq(col(s"l.$keyCol").as(s"${keyCol}_l"),
          col(s"r.$keyCol").as(s"${keyCol}_r")) ++
          agrees.map { case (n, a) => a.cast("int").as(s"agr_$n") } :+
          score.as("score"): _*)
      .filter(col("score") >= lit(minScore))
  }
}
