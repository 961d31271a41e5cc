package graft.core

import org.apache.spark.sql.DataFrame

/** R-style model formula, parsed from a string.
  *
  * Mirrors the reference's string-built formulas (`RegDI2.R:171-178`,
  * `PC.R:201-213`): `"y ~ x1 + x2"`, `"~0 + uno + delta_i + delta_yi"`.
  * Only the surface the reference uses is supported: a `+`-separated term
  * list, an optional response, and a leading `0` (or `-1`) meaning "no
  * intercept". `spark.ml.feature.RFormula` is deliberately NOT used — it
  * injects intercept/encoding behavior that breaks parity with the
  * reference's `~0 + ...` calibration formulas.
  */
final case class FormulaSpec(
    response: Option[String],
    terms: Seq[String],
    intercept: Boolean
) {
  /** R `all.vars(formula)` — response first, then predictors (`PC.R:9-10`). */
  def allVars: Seq[String] = response.toSeq ++ terms
}

object FormulaSpec {
  def parse(formula: String): FormulaSpec = {
    val s = formula.trim
    require(s.contains("~"), s"Not a formula (missing '~'): '$formula'")
    val Array(lhs, rhs) = s.split("~", 2).map(_.trim)
    val response = if (lhs.isEmpty) None else Some(lhs)
    var intercept = true
    val terms = rhs
      .split("\\+")
      .map(_.trim)
      .filter(_.nonEmpty)
      .flatMap {
        case "0" | "-1" => intercept = false; None
        case "1"        => intercept = true; None
        case t          => Some(t)
      }
      .toSeq
    require(terms.nonEmpty || response.nonEmpty, s"Empty formula: '$formula'")
    FormulaSpec(response, terms, intercept)
  }
}

/** Dynamic `_A`/`_B` suffix resolution against a joined schema.
  *
  * Re-expresses `construir_formula_dinamica` (`PC.R:1-39`): for each
  * predictor prefer `<v>_A`, else `<v>_B`, else `<v>` bare, else fail.
  * The response is kept as-is (the reference only rewrites predictors).
  */
object ColumnResolver {
  def resolveTerm(term: String, columns: Set[String]): String =
    if (columns.contains(term + "_A")) term + "_A"
    else if (columns.contains(term + "_B")) term + "_B"
    else if (columns.contains(term)) term
    else
      throw new IllegalArgumentException(
        s"Variable '$term' not found in data (tried ${term}_A, ${term}_B, $term)")

  def resolve(spec: FormulaSpec, df: DataFrame): FormulaSpec = {
    val cols = df.columns.toSet
    // The reference rewrites only predictors (PC.R:10,37) because its
    // responses happen never to collide post-join; in the fused frame a
    // shared y name becomes y_A/y_B, so the response needs the same
    // _A-preferring resolution (models are always fit on the A-side y).
    spec.copy(
      response = spec.response.map(resolveTerm(_, cols)),
      terms = spec.terms.map(resolveTerm(_, cols)))
  }
}
