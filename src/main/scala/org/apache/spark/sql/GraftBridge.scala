package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion — the
  * standard pattern for libraries that ship native Catalyst expressions
  * (Spark 4 hid the classic `Column(expr)` constructor behind the
  * Spark-Connect-agnostic ColumnNode API). Used by
  * graft.expressions.VectorExpressions only. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
