package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** A survey design: a table plus its weight column.
  *
  * The reference always builds `svydesign(ids=~1, data, weights=~w)`
  * (`RegDI2.R:181-185`, `PC.R:190,216`) — no clustering, no strata — so the
  * design reduces to (DataFrame, weightCol). Variance formulas elsewhere
  * assume this element-level with-replacement design.
  */
final case class SurveyDesign(df: DataFrame, weightCol: String) {
  // case-INSENSITIVE, matching Spark's default column resolution: a
  // schema spelling the column "W" resolves col("w") fine everywhere
  // downstream, and a case-sensitive existence check would reject the
  // valid design (r15 review)
  require(df.columns.exists(_.equalsIgnoreCase(weightCol)),
    s"weight column '$weightCol' not in schema ${df.columns.mkString(",")}")
  def filter(cond: org.apache.spark.sql.Column): SurveyDesign =
    copy(df = df.filter(cond))
  def weights = col(weightCol)
}
