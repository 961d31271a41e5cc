package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Analysis-time guard shared by the exact-decimal vector expressions
  * that read elements with `getFloat`: over an `array<double>` child
  * that call silently reads half of each element — wrong keys/codes/
  * cells with no error (the failure mode FloatVecDotExact's check was
  * written for). Mixing in this trait turns the misuse into an
  * AnalysisException instead.
  *
  * Element NULLABILITY is deliberately NOT rejected here: parquet list
  * schemas declare elements nullable even when no element ever is (the
  * repo's own embedding fixtures read back containsNull=true), so an
  * analysis-time rejection would refuse every healthy input. Instead
  * each expression runs [[VectorExpressions.checkNoNulls]] (or the
  * null-checking decode hoist) once per row: a null element would
  * otherwise be read as 0 by UnsafeArrayData's primitive getters —
  * silently wrong keys/codes/scores — or NPE on the generic path. */
trait RequiresFloatArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> input, got " +
          s"${other.simpleString}")
    }
  }
}

/** [[RequiresFloatArrayInput]]'s sibling for the PQ-code consumers
  * that read elements with `getInt`: over an `array<bigint>` child
  * (a Parquet round-trip or SQL transform that widened int codes)
  * that call reads 4 bytes of each 8-byte slot — garbage codebook
  * indices and silently wrong scores. Analysis-time failure instead. */
trait RequiresIntArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<int> input (PQ codes), got " +
          s"${other.simpleString}")
    }
  }
}

/** Binary sibling of [[RequiresFloatArrayInput]] for the two-vector
  * dot expressions — shared so a future fix to the check (e.g. element
  * nullability) cannot silently miss one of the pair (r15 review). */
trait RequiresTwoFloatArrayInputs { self: BinaryExpression =>
  protected def inputHint: String = ""
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val ok = Seq(left, right).forall(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}" +
        inputHint)
  }
}

/** Binary rendition for the (codes, query-index) ADC expressions:
  * array<int> codes on the left, int index on the right (a bigint
  * index would otherwise ClassCastException mid-job instead of
  * failing analysis). */
trait RequiresIntArrayAndIntInput { self: BinaryExpression =>
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, _),
        org.apache.spark.sql.types.IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int> codes, int index) inputs, " +
          s"got ${l.simpleString} and ${r.simpleString}")
    }
  }
}

/** (float vector, int cell-index) sibling of
  * [[RequiresIntArrayAndIntInput]] — shared for the same reason the
  * other traits exist: a type-check fix must not be able to silently
  * miss one expression's private copy (r16 review). */
trait RequiresFloatArrayAndIntInput { self: BinaryExpression =>
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _),
        org.apache.spark.sql.types.IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, int) inputs, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  }
}

/** Native Catalyst expressions for embedding arithmetic.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`) are
  * interpreted per-element lambdas — a measured ~6× slowdown on the
  * brute-force cosine queries (2M pairs × 64 dims at sf0.1). These
  * expressions generate a tight primitive `for` loop inside whole-stage
  * codegen instead, with an equivalent interpreted `nullSafeEval` for
  * non-codegen paths. Used by graft.operators.Ann and the
  * embedding-similarity queries.
  */
final case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with RequiresTwoFloatArrayInputs {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    VectorExpressions.checkNoNulls(x, n, prettyName)
    VectorExpressions.checkNoNulls(y, n, prettyName)
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |graft.expressions.VectorExpressions.checkNoNulls($a, $n, "$prettyName");
         |graft.expressions.VectorExpressions.checkNoNulls($b, $n, "$prettyName");
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product of a float-array column with a CONSTANT double vector
  * (LSH hyperplane / IVF centroid projections) — the constants are
  * compiled into a codegen'd array literal, so bucket keys cost one
  * primitive loop per plane with zero allocation. */
final case class FloatVecDotConst(child: Expression, weights: Seq[Double])
    extends UnaryExpression with RequiresFloatArrayInput {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot_const"

  @transient private lazy val w: Array[Double] = weights.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), w.length)
    VectorExpressions.checkNoNulls(x, n, prettyName)
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * w(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", w, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $wRef.length);
         |graft.expressions.VectorExpressions.checkNoNulls($a, $n, "$prettyName");
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * $wRef[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All LSH bucket keys of a vector in ONE expression: `weights` holds
  * tables×bits hyperplanes (table-major, flattened to a single constant
  * `double[]`), and the result is an `array<bigint>` with one packed
  * sign-bit key per table.
  *
  * Why not one `FloatVecDotConst` per plane composed with `when`/
  * `array`? Measured at (bits = 4, tables = 64, dim = 64): that builds
  * a 256-dot expression tree whose whole-stage-codegen method exceeds
  * HotSpot's 8 KB JIT bytecode ceiling (DontCompileHugeMethods), so the
  * hot path ran in the bytecode interpreter — 3× SLOWER than Spark's
  * interpreted eval. This expression is O(1) generated-code size no
  * matter how many tables, so it stays JIT-compiled; per-plane
  * arithmetic (sequential float→double dot, then sign) is identical. */
final case class LshBucketKeys(child: Expression, weights: Seq[Double],
                               dim: Int, bits: Int, tables: Int)
    extends UnaryExpression with RequiresFloatArrayInput {
  require(weights.length == tables * bits * dim,
    s"weights must be tables*bits*dim = ${tables * bits * dim} doubles")
  // bits > 64 would alias keys via Java's shift-count masking
  // (1L << 64 == 1L << 0): distinct sign patterns silently collide
  // into one packed key, inflating LSH collision rates with no error
  require(bits >= 1 && bits <= 64,
    s"bits=$bits outside [1, 64]: sign bits are packed into one long")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "lsh_bucket_keys"

  @transient private lazy val w: Array[Double] = weights.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    VectorExpressions.checkNoNulls(x, n, prettyName)
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var b = 0
      while (b < bits) {
        val off = (t * bits + b) * dim
        var s = 0.0
        var i = 0
        while (i < n) { s += x.getFloat(i).toDouble * w(off + i); i += 1 }
        if (s > 0) key |= (1L << b)
        b += 1
      }
      keys(t) = key
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", w, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val keys = ctx.freshName("keys")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val key = ctx.freshName("key")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |graft.expressions.VectorExpressions.checkNoNulls($a, $n, "$prettyName");
         |long[] $keys = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $key = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    int $off = ($t * $bits + $b) * $dim;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += (double) $a.getFloat($i) * $wRef[$off + $i];
         |    }
         |    if ($s > 0) $key |= (1L << $b);
         |  }
         |  $keys[$t] = $key;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** EXACT-DECIMAL dot product of two `array<float>` columns, as a
  * double — the native rendition of the zip_with/aggregate DECIMAL
  * (30,18) fold (AnnQueries.dotExact's reference formulation): each
  * element product is a correctly-rounded double, rounded to scale 18
  * with HALF_UP (java.math.BigDecimal.valueOf == scala
  * BigDecimal(double) == Spark's Cast-to-decimal path) and accumulated
  * EXACTLY, so the value is one number in any engine and fold order is
  * irrelevant; the final conversion is BigDecimal.doubleValue, the
  * same call Spark's Decimal.toDouble makes. Value-identical to the
  * HOF formulation (AnnSuite pins it on real vectors) at ~5× its
  * speed — the HOF pays per-element interpreted lambda dispatch.
  * Contract: equal-length arrays with non-null elements (the embedding
  * fixtures' shape). Inputs are type-checked to `array<float>` at
  * analysis time: this expression replaced a type-polymorphic HOF fold
  * in `cosineExact`, and getFloat over an `array<double>` would read
  * half of each element — silently wrong scores; the check turns that
  * misuse into an AnalysisException (double-array callers use the HOF
  * `dotExact`, as pqTopKPortable does for its reconstruction side).
  * CodegenFallback: the BigDecimal loop dominates. */
final case class FloatVecDotExact(left: Expression, right: Expression)
    extends BinaryExpression with RequiresTwoFloatArrayInputs
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot_exact"

  override protected def inputHint: String =
    " (use the HOF dotExact for double arrays)"

  override def nullSafeEval(a: Any, b: Any): Any = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    VectorExpressions.checkNoNulls(x, n, prettyName)
    VectorExpressions.checkNoNulls(y, n, prettyName)
    // same fold scheme as VectorExpressions.exactDotConst (scale-18
    // HALF_UP exact add) — two-ArrayData shape, kept inline; change
    // BOTH together (r15)
    var s = JBD.ZERO
    var i = 0
    while (i < n) {
      val p = x.getFloat(i).toDouble * y.getFloat(i).toDouble
      s = s.add(JBD.valueOf(p).setScale(18, RoundingMode.HALF_UP))
      i += 1
    }
    s.doubleValue()
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** PQ encoding with EXACT-DECIMAL L2² sums — the engine-portable
  * variant (e22). Per subspace s the code is the argmin over codewords
  * of Σ_j dec18((x_j − w_j)²) — subtraction and square are single
  * correctly-rounded double ops (identical in any engine), each
  * squared term is rounded to scale 18 with HALF_UP and accumulated
  * exactly, and codewords are compared by the DOUBLE value of their
  * exact sums with ties to the LOWER code — matching an ANSI engine
  * ranking `CAST(sum AS DOUBLE) ASC, w`. `books` is
  * [m][kCodes][subDim] flattened. CodegenFallback (BigDecimal loop
  * dominates). */
final case class PqEncodeExactConst(child: Expression, books: Seq[Double],
                                    dim: Int, m: Int, kCodes: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    with RequiresFloatArrayInput {
  require(m > 0 && dim % m == 0,
    s"dim=$dim must divide into m=$m (> 0) subspaces")
  require(books.length == kCodes * dim,
    s"books must be m*kCodes*subDim = ${kCodes * dim} doubles")

  private val subDim = dim / m

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode_exact"

  @transient private lazy val w: Array[Double] = books.toArray

  override def nullSafeEval(a: Any): Any = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    // decode hoist: the codeword loop revisits each element kCodes times
    val xa = VectorExpressions.decodeFloats(x, n, prettyName)
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var bestCode = 0
      var bestDist = Double.PositiveInfinity
      var cIdx = 0
      while (cIdx < kCodes) {
        val off = (s * kCodes + cIdx) * subDim
        var acc = JBD.ZERO
        var j = 0
        while (j < subDim) {
          val xi = s * subDim + j
          val xv = if (xi < n) xa(xi) else 0.0
          val d = xv - w(off + j)
          // same fold scheme as VectorExpressions.exactDotConst —
          // squared-distance shape, kept inline; change BOTH (r15)
          acc = acc.add(
            JBD.valueOf(d * d).setScale(18, RoundingMode.HALF_UP))
          j += 1
        }
        val dist = acc.doubleValue()
        if (dist < bestDist) { bestDist = dist; bestCode = cIdx }
        cIdx += 1
      }
      codes(s) = bestCode
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Reconstruction of a PQ code array back into the concatenated
  * codeword vector (`array<double>` of length dim) — pure lookup, no
  * arithmetic, so it is trivially engine-portable; the decimal-exact
  * scoring then runs over the reconstruction. */
final case class PqReconConst(child: Expression, books: Seq[Double],
                              dim: Int, m: Int, kCodes: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    with RequiresIntArrayInput {
  require(m > 0 && dim % m == 0,
    s"dim=$dim must divide into m=$m (> 0) subspaces")
  require(books.length == kCodes * dim,
    s"books must be m*kCodes*subDim = ${kCodes * dim} doubles")

  private val subDim = dim / m

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_recon"

  @transient private lazy val w: Array[Double] = books.toArray

  override def nullSafeEval(a: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val out = new Array[Double](dim)
    // clamp to the actual array length like every sibling PQ consumer
    // (min(m, numElements)): a short codes array would otherwise read
    // past the end of UnsafeArrayData — garbage codeword index, then an
    // out-of-bounds codebook read. Codes past a short array reconstruct
    // as the zero subvector (the file's documented convention).
    val mm = math.min(m, codes.numElements())
    VectorExpressions.checkNoNulls(codes, mm, prettyName)
    var s = 0
    while (s < mm) {
      val c = VectorExpressions.checkCode(codes.getInt(s), kCodes, s)
      val off = (s * kCodes + c) * subDim
      var j = 0
      while (j < subDim) { out(s * subDim + j) = w(off + j); j += 1 }
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[LshBucketKeys]] with EXACT-DECIMAL per-plane dot sums — the
  * engine-portable variant (e20). Each element product is rounded to
  * scale 18 with HALF_UP and accumulated exactly, reproducing the
  * `zip_with(..).cast(DECIMAL(30,18))` + `aggregate` formulation value
  * for value (java.math.BigDecimal.valueOf == scala BigDecimal(double)
  * == Spark's Cast-to-decimal path; addition at precision ≤ 30 is
  * exact, so fold order is irrelevant), while walking each vector ONCE
  * in a tight loop instead of tables×bits interpreted HOF folds.
  * Sign of the exact sum decides each bit, so the key replays in any
  * ANSI engine computing the same decimal sum (AnnSuite pins equality
  * with the HOF formulation on real vectors). Residual cross-engine
  * risk, accepted and shared with every decimal consumer here: an
  * engine whose double→decimal cast rounds the full binary expansion
  * (instead of the shortest-string value valueOf uses) can differ by
  * ~5e-18 per element, so a plane dot within ~dim·5e-18 of EXACTLY
  * zero could flip a bit — odds ~1e-15 per plane on these fixtures,
  * the same class as e01's final float cast absorbing conversion ulp;
  * quantizing before the sign would trade the single zero-crossing
  * for 2²⁰ grid boundaries and WORSEN the odds. CodegenFallback:
  * BigDecimal arithmetic gains nothing from codegen; the loop body
  * dominates. */
final case class LshBucketKeysExact(child: Expression, weights: Seq[Double],
                                    dim: Int, bits: Int, tables: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    with RequiresFloatArrayInput {
  require(weights.length == tables * bits * dim,
    s"weights must be tables*bits*dim = ${tables * bits * dim} doubles")
  // bits > 64 would alias keys via Java's shift-count masking
  // (1L << 64 == 1L << 0): distinct sign patterns silently collide
  // into one packed key, inflating LSH collision rates with no error
  require(bits >= 1 && bits <= 64,
    s"bits=$bits outside [1, 64]: sign bits are packed into one long")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "lsh_bucket_keys_exact"

  @transient private lazy val w: Array[Double] = weights.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    val xa = VectorExpressions.decodeFloats(x, n, prettyName)
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var b = 0
      while (b < bits) {
        val off = (t * bits + b) * dim
        val s = VectorExpressions.exactDotConst(xa, w, off)
        if (s.signum > 0) key |= (1L << b)
        b += 1
      }
      keys(t) = key
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(keys)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top-`p` centroid indices by EXACT-DECIMAL dot product — the
  * engine-portable IVF assignment (e21). Per cell the dot is the same
  * valueOf/setScale(18, HALF_UP)/exact-add fold as
  * [[LshBucketKeysExact]]; ranking compares the DOUBLE value of each
  * exact sum (descending, ties to the LOWER cell) so the order matches
  * an ANSI engine ranking `CAST(decimal_sum AS DOUBLE) DESC, cell` —
  * the double conversions agree except within one conversion ulp of a
  * comparison boundary, the same accepted residual as e01's final
  * float cast. One vector walk for all cells; CodegenFallback (the
  * BigDecimal loop dominates). */
final case class TopPDotExactConst(child: Expression, cents: Seq[Double],
                                   dim: Int, nCells: Int, p: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    with RequiresFloatArrayInput {
  require(nCells > 0, "nCells must be positive")
  require(p >= 1 && p <= nCells, s"p=$p must be in [1, $nCells]")
  require(cents.length == nCells * dim,
    s"cents must be nCells*dim = ${nCells * dim} doubles")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "top_p_dot_exact"

  @transient private lazy val w: Array[Double] = cents.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    val xa = VectorExpressions.decodeFloats(x, n, prettyName)
    val score = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      score(c) =
        VectorExpressions.exactDotConst(xa, w, c * dim).doubleValue()
      c += 1
    }
    // selection by (score DESC, cell ASC): nCells is small (≤ a few
    // thousand), p smaller still — simple repeated max
    val out = new Array[Int](p)
    val taken = new Array[Boolean](nCells)
    var r = 0
    while (r < p) {
      var best = -1
      var c2 = 0
      while (c2 < nCells) {
        if (!taken(c2) && (best < 0 || score(c2) > score(best))) best = c2
        c2 += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[TopPDotExactConst]]'s p = 1 argmax WITH its exact-decimal dot
  * value: one vector walk emitting struct(cell, sc) — for consumers
  * that need the assigned cell's score (e28's prototypicality ranking)
  * without paying a second decimal fold or a centroid join after the
  * assignment. Ties break toward the LOWER cell, and sc is the same
  * per-product-rounded DECIMAL(·,18) sum as TopPDotExactConst, so the
  * (cell, sc) pair replays in SQL as the d0/a0 argmax chain. */
final case class ArgMaxDotScoreExact(child: Expression, cents: Seq[Double],
                                     dim: Int, nCells: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    with RequiresFloatArrayInput {
  require(nCells > 0, "nCells must be positive")
  require(cents.length == nCells * dim,
    s"cents must be nCells*dim = ${nCells * dim} doubles")

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("sc",
        DoubleType, nullable = false)))
  override def prettyName: String = "argmax_dot_score_exact"

  @transient private lazy val w: Array[Double] = cents.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    val xa = VectorExpressions.decodeFloats(x, n, prettyName)
    var best = -1
    var bestScore = 0.0
    var c = 0
    while (c < nCells) {
      val sc =
        VectorExpressions.exactDotConst(xa, w, c * dim).doubleValue()
      // strict > under ascending iteration: ties keep the lower cell
      if (best < 0 || sc > bestScore) { best = c; bestScore = sc }
      c += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(best, bestScore)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** IVF coarse-quantizer cell assignment in ONE expression: `cents`
  * holds nCells centroids (cell-major, flattened to a single constant
  * `double[]`), and the result is the INT index of the centroid with
  * the largest dot product against the vector. Ties break toward the
  * HIGHER cell index — identical to the `greatest(struct(score, cell))`
  * rendition this replaces.
  *
  * Why not `greatest` over per-centroid FloatVecDotConst structs? Same
  * pathology LshBucketKeys documents: the expression tree grows with
  * nCells×dim and the generated method blows past Janino/HotSpot code
  * limits — measured stalling at ~16 cells × 64 dims (SCALE.md), while
  * real IVF wants hundreds–thousands of cells. This loop is O(1)
  * generated-code size for any nCells, so codegen holds at nCells=4096
  * and beyond. (With NaN vector elements Java `>=` differs from
  * Spark's NaN-is-greatest struct ordering; embeddings are finite.) */
final case class ArgMaxDotConst(child: Expression, cents: Seq[Double],
                                dim: Int, nCells: Int)
    extends UnaryExpression with RequiresFloatArrayInput {
  require(nCells > 0, "nCells must be positive")
  require(cents.length == nCells * dim,
    s"cents must be nCells*dim = ${nCells * dim} doubles")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "argmax_dot_const"

  @transient private lazy val w: Array[Double] = cents.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    VectorExpressions.checkNoNulls(x, n, prettyName)
    var best = Double.NegativeInfinity
    var bestCell = 0
    var c = 0
    while (c < nCells) {
      val off = c * dim
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getFloat(i).toDouble * w(off + i); i += 1 }
      if (s >= best) { best = s; bestCell = c }
      c += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("cents", w, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestCell = ctx.freshName("bestCell")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |graft.expressions.VectorExpressions.checkNoNulls($a, $n, "$prettyName");
         |double $best = Double.NEGATIVE_INFINITY;
         |int $bestCell = 0;
         |for (int $c = 0; $c < $nCells; $c++) {
         |  int $off = $c * $dim;
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.getFloat($i) * $wRef[$off + $i];
         |  }
         |  if ($s >= $best) { $best = $s; $bestCell = $c; }
         |}
         |${ev.value} = $bestCell;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Multi-probe IVF cell ranking: the `p` cells with the LARGEST dot
  * products against the vector, as `array<int>` ordered by descending
  * score (equal scores order the higher cell first — consistent with
  * [[ArgMaxDotConst]], whose result always equals element 0 here).
  * One O(nCells·p) insertion pass per row, O(1) generated-code size in
  * both nCells and p — p is a small constant (≤ ~8 probes). */
final case class ArgTopPDotConst(child: Expression, cents: Seq[Double],
                                 dim: Int, nCells: Int, p: Int)
    extends UnaryExpression with RequiresFloatArrayInput {
  require(nCells > 0, "nCells must be positive")
  require(p > 0 && p <= nCells, s"p must be in [1, $nCells]")
  require(cents.length == nCells * dim,
    s"cents must be nCells*dim = ${nCells * dim} doubles")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "argtopp_dot_const"

  @transient private lazy val w: Array[Double] = cents.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    VectorExpressions.checkNoNulls(x, n, prettyName)
    val ts = Array.fill(p)(Double.NegativeInfinity)
    val tc = new Array[Int](p)
    var c = 0
    while (c < nCells) {
      val off = c * dim
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getFloat(i).toDouble * w(off + i); i += 1 }
      if (s >= ts(p - 1)) {
        var j = p - 1
        while (j > 0 && s >= ts(j - 1)) { ts(j) = ts(j - 1); tc(j) = tc(j - 1); j -= 1 }
        ts(j) = s; tc(j) = c
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(tc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("cents", w, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val ts = ctx.freshName("ts")
      val tc = ctx.freshName("tc")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |graft.expressions.VectorExpressions.checkNoNulls($a, $n, "$prettyName");
         |double[] $ts = new double[$p];
         |int[] $tc = new int[$p];
         |java.util.Arrays.fill($ts, Double.NEGATIVE_INFINITY);
         |for (int $c = 0; $c < $nCells; $c++) {
         |  int $off = $c * $dim;
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.getFloat($i) * $wRef[$off + $i];
         |  }
         |  if ($s >= $ts[$p - 1]) {
         |    int $j = $p - 1;
         |    while ($j > 0 && $s >= $ts[$j - 1]) {
         |      $ts[$j] = $ts[$j - 1]; $tc[$j] = $tc[$j - 1]; $j--;
         |    }
         |    $ts[$j] = $s; $tc[$j] = $c;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($tc);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encoder: split the `dim`-float vector into `m`
  * contiguous subvectors of dim/m and emit, per subspace, the index of
  * the L2-nearest of its `k` codebook centroids — `array<int>` of
  * length m. argmin‖x−c‖² == argmax(x·c − ‖c‖²/2), so `bias` carries
  * the precomputed −‖c‖²/2 per (subspace, code) and the loop stays a
  * dot-product fold like the other fused expressions: O(m·k·subDim)
  * work per row, O(1) generated-code size. Ties break toward the
  * higher code (consistent with [[ArgMaxDotConst]]). */
final case class PqEncode(child: Expression, cents: Seq[Double],
                          bias: Seq[Double], dim: Int, m: Int, k: Int)
    extends UnaryExpression with RequiresFloatArrayInput {
  require(m > 0 && dim % m == 0, s"dim=$dim must be divisible by m=$m")
  require(cents.length == m * k * (dim / m),
    s"cents must be m*k*subDim = ${m * k * (dim / m)} doubles")
  require(bias.length == m * k, s"bias must be m*k = ${m * k} doubles")

  private val subDim = dim / m

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val w: Array[Double] = cents.toArray
  @transient private lazy val bz: Array[Double] = bias.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    VectorExpressions.checkNoNulls(x, n, prettyName)
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      // clamp like the sibling expressions: a short array contributes
      // zeros past its end instead of reading out of bounds
      val lim = math.max(0, math.min(subDim, n - j * subDim))
      var best = Double.NegativeInfinity
      var bc = 0
      var c = 0
      while (c < k) {
        val off = (j * k + c) * subDim
        var s = 0.0
        var i = 0
        while (i < lim) {
          s += x.getFloat(j * subDim + i).toDouble * w(off + i); i += 1
        }
        s += bz(j * k + c)
        if (s >= best) { best = s; bc = c }
        c += 1
      }
      codes(j) = bc
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("cents", w, "double[]")
    val bRef = ctx.addReferenceObj("bias", bz, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bc = ctx.freshName("bc")
      val n = ctx.freshName("n")
      val lim = ctx.freshName("lim")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |graft.expressions.VectorExpressions.checkNoNulls($a, $n, "$prettyName");
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $lim = java.lang.Math.max(0, java.lang.Math.min($subDim, $n - $j * $subDim));
         |  double $best = Double.NEGATIVE_INFINITY;
         |  int $bc = 0;
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $off = ($j * $k + $c) * $subDim;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $lim; $i++) {
         |      $s += (double) $a.getFloat($j * $subDim + $i) * $wRef[$off + $i];
         |    }
         |    $s += $bRef[$j * $k + $c];
         |    if ($s >= $best) { $best = $s; $bc = $c; }
         |  }
         |  $codes[$j] = $bc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance scoring of PQ codes against `nQ` query vectors
  * in one expression: `lut(q, j, c)` holds the query-subvector ·
  * codebook-centroid dot products, `sqnorm(j, c)` the centroid squared
  * norms, and the result is `array<float>` of length nQ with
  *
  *   approxCos(q) = Σ_j lut(q, j, code_j) /
  *                  (qnorm(q) · sqrt(Σ_j sqnorm(j, code_j)))
  *
  * — the PQ estimate of cosine(q, x) from the m-byte code instead of
  * the dim-float vector (the point of PQ at 100 TB: the scored scan
  * reads 16 B/row, not 256 B). O(nQ·m) per row, O(1) generated-code
  * size; the per-row reconstruction norm is shared across queries. */
final case class PqAdcCosine(child: Expression, lut: Seq[Double],
                             sqnorm: Seq[Double], qnorms: Seq[Double],
                             m: Int, k: Int)
    extends UnaryExpression with RequiresIntArrayInput {
  private val nQ = qnorms.length
  require(nQ > 0, "need at least one query")
  require(lut.length == nQ * m * k, s"lut must be nQ*m*k = ${nQ * m * k}")
  require(sqnorm.length == m * k, s"sqnorm must be m*k = ${m * k}")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, containsNull = false)
  override def prettyName: String = "pq_adc_cosine"

  @transient private lazy val lutA: Array[Double] = lut.toArray
  @transient private lazy val snA: Array[Double] = sqnorm.toArray
  @transient private lazy val qnA: Array[Double] = qnorms.toArray

  override def nullSafeEval(a: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val mm = math.min(m, codes.numElements())
    VectorExpressions.checkNoNulls(codes, mm, prettyName)
    // hoist the ArrayData decode: the query loop below would otherwise
    // pay nQ·m virtual getInt reads per row where m suffice — ~98% of
    // the array-decode work on the 100 TB scan hot path (r15 review)
    val cA = new Array[Int](mm)
    var cn = 0.0
    var j = 0
    while (j < mm) {
      cA(j) = VectorExpressions.checkCode(codes.getInt(j), k, j)
      cn += snA(j * k + cA(j)); j += 1
    }
    val rn = math.sqrt(cn)
    val out = new Array[Float](nQ)
    var q = 0
    while (q < nQ) {
      var s = 0.0
      var jj = 0
      while (jj < mm) {
        s += lutA((q * m + jj) * k + cA(jj)); jj += 1
      }
      // degenerate denominators (empty codes array, zero-norm centroids
      // or queries) would emit NaN, which Spark orders ABOVE every real
      // double — a broken row would outrank all genuine candidates in
      // the desc(cos) top-k. −∞ sorts it last instead.
      val d = qnA(q) * rn
      out(q) = if (d > 0) (s / d).toFloat else Float.NegativeInfinity
      q += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("lut", lutA, "double[]")
    val snRef = ctx.addReferenceObj("sqnorm", snA, "double[]")
    val qnRef = ctx.addReferenceObj("qnorms", qnA, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val cn = ctx.freshName("cn")
      val rn = ctx.freshName("rn")
      val out = ctx.freshName("out")
      val q = ctx.freshName("q")
      val j = ctx.freshName("j")
      val jj = ctx.freshName("jj")
      val s = ctx.freshName("s")
      val mm = ctx.freshName("mm")
      val d = ctx.freshName("d")
      val cArr = ctx.freshName("cArr")
      s"""
         |int $mm = java.lang.Math.min($m, $a.numElements());
         |graft.expressions.VectorExpressions.checkNoNulls($a, $mm, "$prettyName");
         |int[] $cArr = new int[$mm];
         |double $cn = 0.0;
         |for (int $j = 0; $j < $mm; $j++) {
         |  $cArr[$j] = graft.expressions.VectorExpressions.checkCode($a.getInt($j), $k, $j);
         |  $cn += $snRef[$j * $k + $cArr[$j]];
         |}
         |double $rn = java.lang.Math.sqrt($cn);
         |float[] $out = new float[$nQ];
         |for (int $q = 0; $q < $nQ; $q++) {
         |  double $s = 0.0;
         |  for (int $jj = 0; $jj < $mm; $jj++) {
         |    $s += $lutRef[($q * $m + $jj) * $k + $cArr[$jj]];
         |  }
         |  double $d = $qnRef[$q] * $rn;
         |  $out[$q] = $d > 0 ? (float) ($s / $d) : Float.NEGATIVE_INFINITY;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-pair PQ ADC scoring: like [[PqAdcCosine]] but for ONE query per
  * row — `right` is the query INDEX column (0-based into the same
  * [nQ][m][k] `lut`). Used by the IVF-PQ composition, where the cell
  * join already pairs each candidate row with the specific queries
  * probing its cell (scoring all nQ queries per joined row would be
  * nQ× overwork). */
final case class PqAdcCosineAt(left: Expression, right: Expression,
                               lut: Seq[Double], sqnorm: Seq[Double],
                               qnorms: Seq[Double], m: Int, k: Int)
    extends BinaryExpression with RequiresIntArrayAndIntInput {
  private val nQ = qnorms.length
  require(nQ > 0, "need at least one query")
  require(lut.length == nQ * m * k, s"lut must be nQ*m*k = ${nQ * m * k}")
  require(sqnorm.length == m * k, s"sqnorm must be m*k = ${m * k}")

  override def dataType: DataType = org.apache.spark.sql.types.FloatType
  override def prettyName: String = "pq_adc_cosine_at"

  @transient private lazy val lutA: Array[Double] = lut.toArray
  @transient private lazy val snA: Array[Double] = sqnorm.toArray
  @transient private lazy val qnA: Array[Double] = qnorms.toArray

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val q = VectorExpressions.checkQuery(b.asInstanceOf[Int], nQ)
    val mm = math.min(m, codes.numElements())
    VectorExpressions.checkNoNulls(codes, mm, prettyName)
    var cn = 0.0
    var s = 0.0
    var j = 0
    while (j < mm) {
      val code = VectorExpressions.checkCode(codes.getInt(j), k, j)
      cn += snA(j * k + code)
      s += lutA((q * m + j) * k + code)
      j += 1
    }
    // same NaN discipline as PqAdcCosine: −∞ (sorts last), never NaN
    // (sorts FIRST under desc in Spark's double ordering)
    val d = qnA(q) * math.sqrt(cn)
    if (d > 0) (s / d).toFloat else Float.NegativeInfinity
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("lut", lutA, "double[]")
    val snRef = ctx.addReferenceObj("sqnorm", snA, "double[]")
    val qnRef = ctx.addReferenceObj("qnorms", qnA, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cn = ctx.freshName("cn")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val code = ctx.freshName("code")
      val mm = ctx.freshName("mm")
      val d = ctx.freshName("d")
      s"""
         |int $mm = java.lang.Math.min($m, $a.numElements());
         |graft.expressions.VectorExpressions.checkQuery($b, $nQ);
         |graft.expressions.VectorExpressions.checkNoNulls($a, $mm, "$prettyName");
         |double $cn = 0.0;
         |double $s = 0.0;
         |for (int $j = 0; $j < $mm; $j++) {
         |  int $code = graft.expressions.VectorExpressions.checkCode($a.getInt($j), $k, $j);
         |  $cn += $snRef[$j * $k + $code];
         |  $s += $lutRef[(($b) * $m + $j) * $k + $code];
         |}
         |double $d = $qnRef[$b] * java.lang.Math.sqrt($cn);
         |${ev.value} = $d > 0 ? (float) ($s / $d) : Float.NEGATIVE_INFINITY;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Residual against a constant centroid table: `left` is the float
  * vector, `right` the cell index, and the result is the length-`dim`
  * float array x − centroid(cell) — the quantity classical IVF-PQ
  * (Jégou et al., TPAMI 2011, §IV.B) encodes instead of the raw vector:
  * residuals concentrate near the origin, so the same m·log₂k code bits
  * buy strictly finer quantization. Elements past a short input count
  * as zero (the [[PqEncode]] clamp convention), so the residual of a
  * short vector equals the residual of its zero-padded form. */
final case class SubCentroidConst(left: Expression, right: Expression,
                                  cents: Seq[Double], dim: Int, nCells: Int)
    extends BinaryExpression with RequiresFloatArrayAndIntInput {
  require(nCells > 0, "nCells must be positive")
  require(cents.length == nCells * dim,
    s"cents must be nCells*dim = ${nCells * dim} doubles")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, containsNull = false)
  override def prettyName: String = "sub_centroid_const"

  @transient private lazy val w: Array[Double] = cents.toArray

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val cell = VectorExpressions.checkCell(b.asInstanceOf[Int], nCells)
    val n = math.min(x.numElements(), dim)
    VectorExpressions.checkNoNulls(x, n, prettyName)
    val out = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      val xv = if (d < n) x.getFloat(d).toDouble else 0.0
      out(d) = (xv - w(cell * dim + d)).toFloat
      d += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("cents", w, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val d = ctx.freshName("d")
      val xv = ctx.freshName("xv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |graft.expressions.VectorExpressions.checkCell($b, $nCells);
         |graft.expressions.VectorExpressions.checkNoNulls($a, $n, "$prettyName");
         |float[] $out = new float[$dim];
         |for (int $d = 0; $d < $dim; $d++) {
         |  double $xv = $d < $n ? (double) $a.getFloat($d) : 0.0;
         |  $out[$d] = (float) ($xv - $wRef[($b) * $dim + $d]);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared norm of the IVF-PQ reconstruction x̂ = centroid(cell) +
  * concat_j book(j, code_j): `left` is the residual-code array, `right`
  * the cell index. Needed by the residual scoring path's cosine
  * denominator — unlike raw-vector PQ, ‖x̂‖² has a cell–code cross term
  * (2·c·r̂), so it cannot be read off per-(subspace, code) tables alone.
  * Computing it here, where the row still carries (cell, codes), keeps
  * the constants tiny (nCells·dim + m·k·subDim doubles) instead of the
  * nCells·m·k cross-term table the LUT formulation would need — at 100
  * TB this runs in the same ingest-time scan that encodes the codes,
  * and the stored (cell, codes, rnorm2) triple is what query-time scans
  * read. Codes past a short array count as a zero residual (clamp
  * convention shared with the ADC scorers). */
final case class PqReconNorm2(left: Expression, right: Expression,
                              cents: Seq[Double], books: Seq[Double],
                              dim: Int, nCells: Int, m: Int, k: Int)
    extends BinaryExpression with RequiresIntArrayAndIntInput {
  require(m > 0 && dim % m == 0, s"dim=$dim must be divisible by m=$m")
  require(nCells > 0, "nCells must be positive")
  require(cents.length == nCells * dim,
    s"cents must be nCells*dim = ${nCells * dim} doubles")
  require(books.length == m * k * (dim / m),
    s"books must be m*k*subDim = ${m * k * (dim / m)} doubles")

  private val subDim = dim / m

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_recon_norm2"

  @transient private lazy val cw: Array[Double] = cents.toArray
  @transient private lazy val bw: Array[Double] = books.toArray

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val cell = VectorExpressions.checkCell(b.asInstanceOf[Int], nCells)
    val mm = math.min(m, codes.numElements())
    VectorExpressions.checkNoNulls(codes, mm, prettyName)
    var s = 0.0
    var j = 0
    while (j < m) {
      val off = if (j < mm)
        (j * k + VectorExpressions.checkCode(codes.getInt(j), k, j)) *
          subDim
      else -1
      var i = 0
      while (i < subDim) {
        val r = if (off >= 0) bw(off + i) else 0.0
        val v = cw(cell * dim + j * subDim + i) + r
        s += v * v
        i += 1
      }
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", cw, "double[]")
    val bRef = ctx.addReferenceObj("books", bw, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val mm = ctx.freshName("mm")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val v = ctx.freshName("v")
      s"""
         |int $mm = java.lang.Math.min($m, $a.numElements());
         |graft.expressions.VectorExpressions.checkCell($b, $nCells);
         |graft.expressions.VectorExpressions.checkNoNulls($a, $mm, "$prettyName");
         |double $s = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $off = $j < $mm ? ($j * $k + graft.expressions.VectorExpressions.checkCode($a.getInt($j), $k, $j)) * $subDim : -1;
         |  for (int $i = 0; $i < $subDim; $i++) {
         |    double $v = $cRef[($b) * $dim + $j * $subDim + $i]
         |      + ($off >= 0 ? $bRef[$off + $i] : 0.0);
         |    $s += $v * $v;
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-pair ADC dot-product term Σ_j lut(qi, j, code_j) — the residual
  * scoring path's numerator contribution dot(q, r̂), kept separate from
  * the raw-path [[PqAdcCosineAt]] because the residual cosine assembles
  * from three row-local pieces (the broadcast per-probe dot(q, c), this
  * LUT sum, and [[PqReconNorm2]]) in plain Column arithmetic. */
final case class PqAdcDotAt(left: Expression, right: Expression,
                            lut: Seq[Double], m: Int, k: Int)
    extends BinaryExpression with RequiresIntArrayAndIntInput {
  require(m > 0 && k > 0, "m and k must be positive")
  require(lut.nonEmpty && lut.length % (m * k) == 0,
    s"lut must be nQ*m*k doubles, got ${lut.length}")

  private val nQ = lut.length / (m * k)

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dot_at"

  @transient private lazy val lutA: Array[Double] = lut.toArray

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val q = VectorExpressions.checkQuery(b.asInstanceOf[Int], nQ)
    val mm = math.min(m, codes.numElements())
    VectorExpressions.checkNoNulls(codes, mm, prettyName)
    var s = 0.0
    var j = 0
    while (j < mm) {
      s += lutA((q * m + j) * k +
        VectorExpressions.checkCode(codes.getInt(j), k, j))
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("lut", lutA, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val mm = ctx.freshName("mm")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      s"""
         |int $mm = java.lang.Math.min($m, $a.numElements());
         |graft.expressions.VectorExpressions.checkQuery($b, $nQ);
         |graft.expressions.VectorExpressions.checkNoNulls($a, $mm, "$prettyName");
         |double $s = 0.0;
         |for (int $j = 0; $j < $mm; $j++) {
         |  $s += $lutRef[(($b) * $m + $j) * $k + graft.expressions.VectorExpressions.checkCode($a.getInt($j), $k, $j)];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Range-check a PQ code against [0, kCodes). The Requires* traits
    * catch TYPE drift at analysis, but a code VALUE from an encoder
    * configured with a different kCodes would index the NEXT subspace's
    * codewords — plausible reconstructions and silently wrong ADC
    * rankings with no error (only the final subspace can AIOOBE).
    * Called from both interpreted evals and generated code (static
    * forwarder), throwing with the subspace named (r15 review). */
  def checkCode(c: Int, kCodes: Int, subspace: Int): Int = {
    if (c < 0 || c >= kCodes)
      throw new IllegalArgumentException(
        s"PQ code $c at subspace $subspace is outside [0, $kCodes) — " +
          "the codes were encoded with a different kCodes than this " +
          "consumer is configured for")
    c
  }

  /** [[checkCode]]'s sibling for the per-pair ADC query index: a stale
    * probe table joining indices from a DIFFERENT query set would
    * either AIOOBE unhelpfully (q ≥ nQ) or — for q large enough that
    * (q·m + j)·k wraps 32-bit int into a VALID lut slot — silently
    * score against the wrong query's LUT rows. Once q < nQ every
    * derived index is < lut.length, so the overflow route is closed
    * too. Called from interpreted evals and generated code. */
  def checkQuery(q: Int, nQ: Int): Int = {
    if (q < 0 || q >= nQ)
      throw new IllegalArgumentException(
        s"ADC query index $q is outside [0, $nQ) — the LUT was built " +
          "for a different query set than this index column refers to")
    q
  }

  /** [[checkCode]]'s sibling for IVF cell indices (SubCentroidConst /
    * PqReconNorm2): cells encoded against a differently-sized centroid
    * table would AIOOBE unhelpfully, or for cell·dim past 2³¹ wrap into
    * a VALID slot of the wrong centroid — a silently wrong residual.
    * Once cell < nCells every derived index is < cents.length. */
  def checkCell(c: Int, nCells: Int): Int = {
    if (c < 0 || c >= nCells)
      throw new IllegalArgumentException(
        s"IVF cell index $c is outside [0, $nCells) — the cell was " +
          "assigned against a different centroid table than this " +
          "consumer is configured for")
    c
  }

  private def nullElement(name: String, i: Int): Nothing =
    throw new IllegalArgumentException(
      s"$name: NULL element at index $i of the input array — the " +
        "vector expressions read primitive slots, and a null element " +
        "would be silently read as 0 (wrong keys/codes/scores with no " +
        "error); fill or filter null elements upstream")

  /** One pass of cheap null-bit reads over the first `n` elements,
    * run ONCE per row by every expression whose loops then read
    * primitive slots unchecked (the per-read alternative would re-pay
    * the branch on every table/bit/cell revisit). Called from
    * interpreted evals and generated code (static forwarder). */
  def checkNoNulls(x: org.apache.spark.sql.catalyst.util.ArrayData,
                   n: Int, name: String): Unit = {
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) nullElement(name, i)
      i += 1
    }
  }

  /** Null-checked decode of the first `n` float elements into a local
    * double[] — the exact-decimal expressions' per-row hoist: their
    * plane/cell loops revisit each element tables×bits (or nCells×)
    * times, and a virtual getFloat per revisit was measured as the
    * dominant non-BigDecimal cost (same hoist PqAdcCosine carries for
    * codes, r15 review; generalized here, r16). */
  private[expressions] def decodeFloats(
      x: org.apache.spark.sql.catalyst.util.ArrayData, n: Int,
      name: String): Array[Double] = {
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) nullElement(name, i)
      out(i) = x.getFloat(i).toDouble
      i += 1
    }
    out
  }

  /** ONE definition of the exact-decimal dot fold (valueOf → scale-18
    * HALF_UP → exact add) of a pre-decoded vector against a constant
    * weight slice — shared by the *Exact const-weight expressions
    * (LshBucketKeysExact, TopPDotExactConst, ArgMaxDotScoreExact) so a
    * rounding-scheme change cannot silently fork the documented
    * cross-engine invariant between them (r15 review; the two
    * non-const-shape folds, FloatVecDotExact and PqEncodeExactConst,
    * carry pointer comments to here). Takes the [[decodeFloats]] hoist,
    * not ArrayData: callers revisit the vector once per plane/cell. */
  private[expressions] def exactDotConst(
      x: Array[Double], w: Array[Double], off: Int): java.math.BigDecimal = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    var s = JBD.ZERO
    var i = 0
    while (i < x.length) {
      val p = x(i) * w(off + i)
      s = s.add(JBD.valueOf(p).setScale(18, RoundingMode.HALF_UP))
      i += 1
    }
    s
  }

  /** Codegen'd dot product of two `array<float>` columns (double out). */
  def dotF(a: Column, b: Column): Column =
    GraftBridge.column(FloatVecDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Codegen'd dot of an `array<float>` column with constant weights. */
  def dotConst(a: Column, weights: Seq[Double]): Column =
    GraftBridge.column(FloatVecDotConst(
      GraftBridge.expression(a), weights))

  /** Exact-decimal dot of two `array<float>` columns (double out) —
    * the native hot-path rendition of AnnQueries.dotExact. */
  def dotExactF(a: Column, b: Column): Column =
    GraftBridge.column(FloatVecDotExact(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** All `tables` LSH bucket keys of a vector as `array<bigint>` — one
    * JIT-friendly nested loop over table-major flattened hyperplanes. */
  def lshKeys(a: Column, planes: Seq[Seq[Double]], dim: Int, bits: Int,
              tables: Int): Column =
    GraftBridge.column(LshBucketKeys(
      GraftBridge.expression(a), planes.flatten, dim, bits, tables))

  /** [[lshKeys]] with exact-decimal dot sums (engine-portable sign
    * bits) — one vector walk for all tables×bits planes. */
  def lshKeysExact(a: Column, planes: Seq[Seq[Double]], dim: Int,
                   bits: Int, tables: Int): Column =
    GraftBridge.column(LshBucketKeysExact(
      GraftBridge.expression(a), planes.flatten, dim, bits, tables))

  /** [[argTopPDot]] with exact-decimal dot sums (engine-portable cell
    * ranking) — one vector walk for all cells. */
  def topPDotExact(a: Column, cents: Seq[Seq[Double]], p: Int): Column = {
    require(cents.nonEmpty, "topPDotExact: centroid table must be non-empty")
    GraftBridge.column(TopPDotExactConst(
      GraftBridge.expression(a), cents.flatten,
      cents.head.length, cents.length, p))
  }

  /** [[topPDotExact]]'s p = 1 argmax PLUS its exact-decimal dot value —
    * one walk, struct(cell, sc), ties to the lower cell. */
  def argMaxDotScoreExact(a: Column, cents: Seq[Seq[Double]]): Column = {
    require(cents.nonEmpty,
      "argMaxDotScoreExact: centroid table must be non-empty")
    GraftBridge.column(ArgMaxDotScoreExact(
      GraftBridge.expression(a), cents.flatten,
      cents.head.length, cents.length))
  }

  /** [[pqEncode]] with exact-decimal L2² sums (engine-portable codes).
    * `books` is [m][kCodes][subDim]. */
  def pqEncodeExact(a: Column, books: Seq[Seq[Seq[Double]]],
                    dim: Int): Column = {
    require(books.nonEmpty && books.head.nonEmpty,
      "pqEncodeExact: codebook table must be non-empty")
    GraftBridge.column(PqEncodeExactConst(
      GraftBridge.expression(a), books.flatten.flatten, dim,
      books.length, books.head.length))
  }

  /** Concatenated-codeword reconstruction of a PQ code array. */
  def pqRecon(codes: Column, books: Seq[Seq[Seq[Double]]],
              dim: Int): Column = {
    require(books.nonEmpty && books.head.nonEmpty,
      "pqRecon: codebook table must be non-empty")
    GraftBridge.column(PqReconConst(
      GraftBridge.expression(codes), books.flatten.flatten, dim,
      books.length, books.head.length))
  }

  /** Index of the max-dot-product centroid (IVF cell) as INT — one
    * JIT-friendly nested loop over cell-major flattened centroids. */
  def argMaxDot(a: Column, cents: Seq[Seq[Double]]): Column = {
    require(cents.nonEmpty, "argMaxDot: centroid table must be non-empty")
    GraftBridge.column(ArgMaxDotConst(
      GraftBridge.expression(a), cents.flatten,
      cents.head.length, cents.length))
  }

  /** Top-`p` centroid indices by dot product as `array<int>` (score-
    * descending; element 0 == [[argMaxDot]]) — the multi-probe IVF
    * query-side assignment. */
  def argTopPDot(a: Column, cents: Seq[Seq[Double]], p: Int): Column = {
    require(cents.nonEmpty, "argTopPDot: centroid table must be non-empty")
    GraftBridge.column(ArgTopPDotConst(
      GraftBridge.expression(a), cents.flatten,
      cents.head.length, cents.length, p))
  }

  /** PQ codes of a float vector: per-subspace L2-nearest codebook index,
    * `array<int>` of length m. `cents` is [m][k][subDim]. */
  def pqEncode(a: Column, cents: Seq[Seq[Seq[Double]]], dim: Int): Column = {
    require(cents.nonEmpty && cents.head.nonEmpty,
      "pqEncode: codebook table must be non-empty")
    val m = cents.length
    val k = cents.head.length
    val bias = cents.flatMap(_.map(c => -c.map(x => x * x).sum / 2.0))
    GraftBridge.column(PqEncode(
      GraftBridge.expression(a), cents.flatten.flatten, bias, dim, m, k))
  }

  /** Approximate cosine of PQ codes against each of nQ query vectors
    * (`array<float>` of length nQ). `lut` is [nQ][m][k] query-centroid
    * dots, `sqnorm` [m][k] centroid squared norms, `qnorms` the query
    * vector norms. */
  def pqAdcCosine(codes: Column, lut: Seq[Double], sqnorm: Seq[Double],
                  qnorms: Seq[Double], m: Int, k: Int): Column =
    GraftBridge.column(PqAdcCosine(
      GraftBridge.expression(codes), lut, sqnorm, qnorms, m, k))

  /** Per-pair ADC cosine: codes column × query-index column (0-based
    * into the same [nQ][m][k] lut). */
  def pqAdcCosineAt(codes: Column, qi: Column, lut: Seq[Double],
                    sqnorm: Seq[Double], qnorms: Seq[Double],
                    m: Int, k: Int): Column =
    GraftBridge.column(PqAdcCosineAt(
      GraftBridge.expression(codes), GraftBridge.expression(qi),
      lut, sqnorm, qnorms, m, k))

  /** Residual x − centroid(cell) as `array<float>` of length dim; `cell`
    * is an INT column indexing `cents`. */
  def subCentroid(vec: Column, cell: Column,
                  cents: Seq[Seq[Double]]): Column = {
    require(cents.nonEmpty, "subCentroid: centroid table must be non-empty")
    GraftBridge.column(SubCentroidConst(
      GraftBridge.expression(vec), GraftBridge.expression(cell),
      cents.flatten, cents.head.length, cents.length))
  }

  /** ‖centroid(cell) + r̂(codes)‖² — the residual-PQ reconstruction
    * squared norm. `books` is the residual codebook [m][k][subDim]. */
  def pqReconNorm2(codes: Column, cell: Column, cents: Seq[Seq[Double]],
                   books: Seq[Seq[Seq[Double]]]): Column = {
    require(cents.nonEmpty && books.nonEmpty && books.head.nonEmpty,
      "pqReconNorm2: centroid/codebook tables must be non-empty")
    val dim = cents.head.length
    GraftBridge.column(PqReconNorm2(
      GraftBridge.expression(codes), GraftBridge.expression(cell),
      cents.flatten, books.flatten.flatten, dim, cents.length,
      books.length, books.head.length))
  }

  /** Σ_j lut(qi, j, code_j) — the per-pair ADC dot-product term. */
  def pqAdcDotAt(codes: Column, qi: Column, lut: Seq[Double],
                 m: Int, k: Int): Column =
    GraftBridge.column(PqAdcDotAt(
      GraftBridge.expression(codes), GraftBridge.expression(qi),
      lut, m, k))

  /** Cosine similarity from codegen'd dots. */
  def cosineF(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dotF(a, b) / (sqrt(dotF(a, a)) * sqrt(dotF(b, b)))
  }
}
