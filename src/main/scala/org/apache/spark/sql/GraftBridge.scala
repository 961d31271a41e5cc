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

  /** Wrap an RDD of INTERNAL rows as a DataFrame without the
    * Row-encoder round-trip `createDataFrame(rdd: RDD[Row], schema)`
    * pays (external Row conversion both ways — measured per-row cost
    * in the rank operators). The rows must already match `schema`'s
    * physical types (UTF8String for strings, etc.) and must be SAFE to
    * retain (copied out of any reused buffer). */
  def internalDf(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[catalyst.InternalRow],
      schema: types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Register a function builder on a LIVE session (the extension-point
    * path requires registration at session build; this is the runtime
    * equivalent for sessions we did not construct, e.g. the driver's). */
  def registerFunction(spark: SparkSession, name: String,
      info: catalyst.expressions.ExpressionInfo,
      builder: Seq[catalyst.expressions.Expression] => catalyst.expressions.Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      catalyst.FunctionIdentifier(name), info, builder)
}
