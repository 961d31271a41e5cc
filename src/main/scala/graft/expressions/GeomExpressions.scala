package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused aspect-ratio bucket assignment: argmin over a CONSTANT bucket
  * ratio table of |w/h − ratio_i| (ties to the LOWER bucket id),
  * emitting struct(bucket, drift) in ONE per-row pass — the join-free
  * production rendition of Multimodal.aspectBuckets' broadcast-grid +
  * window argmin (the e28 ArgMaxDotScoreExact pattern: at 100 TB the
  * |buckets|-way compare belongs in the row, not in a join). The
  * ratios are precomputed driver-side with the SAME single IEEE
  * division the join rendition evaluates per row, and diff/abs are the
  * same correctly-rounded ops, so the two renditions agree bit-for-bit
  * (MultimodalSuite pins it). Inputs arrive pre-cast to double. */
final case class ArgMinAspectBucketConst(left: Expression,
                                         right: Expression,
                                         ratios: Seq[Double])
    extends BinaryExpression {
  require(ratios.nonEmpty, "need at least one bucket ratio")

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("drift",
        DoubleType, nullable = false)))
  override def prettyName: String = "argmin_aspect_bucket"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, double) inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  @transient private lazy val r: Array[Double] = ratios.toArray

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ar = a.asInstanceOf[Double] / b.asInstanceOf[Double]
    var best = 0
    var bestD = math.abs(ar - r(0))
    var i = 1
    while (i < r.length) {
      val d = math.abs(ar - r(i))
      if (d < bestD) { best = i; bestD = d }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(best, bestD)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("ratios", r, "double[]")
    val rowCls = classOf[org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow].getName
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ar = ctx.freshName("ar")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |double $ar = $a / $b;
         |int $best = 0;
         |double $bestD = java.lang.Math.abs($ar - $rRef[0]);
         |for (int $i = 1; $i < $rRef.length; $i++) {
         |  double $d = java.lang.Math.abs($ar - $rRef[$i]);
         |  if ($d < $bestD) { $best = $i; $bestD = $d; }
         |}
         |${ev.value} = new $rowCls(new Object[] {
         |  java.lang.Integer.valueOf($best),
         |  java.lang.Double.valueOf($bestD) });
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GeomExpressions {
  /** struct(bucket, drift) of the nearest aspect bucket — `buckets` as
    * (bw, bh) pairs; ratios precomputed with the identical IEEE
    * division the join rendition uses per row. */
  def argMinAspectBucket(w: Column, h: Column,
                         buckets: Seq[(Int, Int)]): Column = {
    // a bh = 0 bucket would precompute an Inf ratio (or NaN for 0/0,
    // which poisons the strict `d < best` argmin init) — the silent
    // fork the Multimodal renditions guard against; enforce it here
    // too for direct callers (r16 review)
    require(buckets.forall { case (bw, bh) => bw > 0 && bh > 0 },
      s"argMinAspectBucket: bucket dimensions must be positive: " +
        buckets.mkString(", "))
    GraftBridge.column(ArgMinAspectBucketConst(
      GraftBridge.expression(w.cast("double")),
      GraftBridge.expression(h.cast("double")),
      buckets.map { case (bw, bh) => bw.toDouble / bh.toDouble }))
  }
}
