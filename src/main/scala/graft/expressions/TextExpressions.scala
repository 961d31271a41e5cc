package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Analysis-time input guard for the text-signature expressions: they
  * are SQL-registered (GraftExtensions), so without a check a
  * non-string argument — `simhash64(42)` — passes analysis and dies
  * per-row with a raw ClassCastException on an executor. This turns it
  * into an AnalysisException at plan time (r16 review; the vector
  * expressions' Requires* discipline applied here). */
trait RequiresStringInput { self: UnaryExpression =>
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.simpleString}")
    }
  }
}

/** Native text-signature expressions.
  *
  * The HOF formulations (`transform(sequence…, slice…)` shingles, a
  * nested `aggregate`/`zip_with` SimHash) evaluate one interpreted
  * lambda per element — measured multi-second cost per 5k docs. These
  * expressions do the same work in one tight JVM pass per document
  * (CodegenFallback: the per-document eval dominates, codegen of the
  * loop itself is immaterial).
  *
  * Semantics kept IDENTICAL to the Column formulations they replace
  * (and to the DuckDB oracle SQL) on the fixtures' ASCII-ish text:
  * normalize = lowercase + collapse `\s+` + trim; shingles = distinct
  * space-joined word n-grams in first-occurrence order, whole-text
  * fallback below n tokens; SimHash = sign of per-bit ±1 sums over
  * xxhash64(token, seed=42) — the same hash family as Spark's
  * `xxhash64`. ONE deliberate divergence: [[TextOps.normalize]]
  * lowercases with Locale.ROOT, while Spark's `lower()` uses the JVM
  * default locale — on a tr_TR-locale JVM Spark's 'I' → 'ı' but here
  * 'I' → 'i'. ROOT is the cross-engine-portable choice (the DuckDB
  * oracles are locale-independent), so the signatures stay stable
  * across differently-configured clusters; do NOT "fix" this to match
  * `lower()` without re-deriving every text-signature oracle. */
object TextOps {
  // compiled once: String.replaceAll would Pattern.compile("\\s+") on
  // EVERY call — once per document per signature column (r16 review)
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def normalize(s: String): String =
    WS.matcher(s.toLowerCase(java.util.Locale.ROOT)).replaceAll(" ").trim

  def shingles(text: String, n: Int): Array[String] = {
    val toks = normalize(text).split(" ")
    if (toks.length >= n) {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
      seen.toArray(new Array[String](seen.size))
    } else Array(toks.mkString(" "))
  }

  /** The minhash signature loop shared VERBATIM by
    * [[MinHashSignatureExpr]] and [[MinHashBandKeysExpr]] — one
    * definition, so a seed-scheme or hash-family change cannot
    * silently fork the documented invariant that band keys fold the
    * same signature values the signature expression emits. */
  def minhashSig(text: String, n: Int, numHashes: Int): Array[Long] = {
    val sh = shingles(text, n)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val u = UTF8String.fromString(sh(i))
      var j = 0
      while (j < numHashes) {
        val h = hashUtf8(u, j.toLong)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  def hashUtf8(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** The per-bit ±1-vote / sign-collapse loop shared by BOTH SimHash
    * widths — one definition, so a tie-break or vote change cannot
    * silently fork the 64-bit production hash from the 60-bit portable
    * one (same reason minhashSig is shared). `hash` maps a token to
    * its per-token hash; only the low `width` bits vote. */
  def simhashSign(toks: Array[String], width: Int,
                  hash: String => Long): Long = {
    val counts = new Array[Int](width)
    var t = 0
    while (t < toks.length) {
      val h = hash(toks(t))
      var k = 0
      while (k < width) {
        if (((h >>> k) & 1L) != 0L) counts(k) += 1 else counts(k) -= 1
        k += 1
      }
      t += 1
    }
    var out = 0L
    var k = 0
    while (k < width) { if (counts(k) > 0) out |= (1L << k); k += 1 }
    out
  }

  def simhash64(text: String): Long =
    simhashSign(normalize(text).split(" "), 64,
      t => hashUtf8(UTF8String.fromString(t), 42L))
}

final case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with RequiresStringInput {
  require(n >= 1, s"shingle width n=$n must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextOps.shingles(input.asInstanceOf[UTF8String].toString, n)
        .map(UTF8String.fromString): Array[Any])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

final case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback with RequiresStringInput {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    TextOps.simhash64(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Engine-portable 60-bit SimHash: the per-token hash is the TOP 60
  * bits of MD5 — equivalently the integer value of the first 15 hex
  * chars of `md5(token)`, which any ANSI SQL engine can parse into a
  * signed 64-bit value (16 chars would overflow) — then the usual
  * sign-of-±1-sums per bit ([[TextOps.simhashSign]], shared with the
  * production 64-bit hash). Exists so the SimHash near-dup operator can
  * carry a full cross-engine hash oracle (d04); the XXH64
  * [[SimHash64Expr]] stays the fast production default (MD5 costs ~3×
  * XXH64 per token). Same normalize/tokenize as [[TextOps.simhash64]]. */
final case class SimHashPortable60Expr(child: Expression)
    extends UnaryExpression with CodegenFallback with RequiresStringInput {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_portable60"

  override def nullSafeEval(input: Any): Any = {
    val toks = TextOps.normalize(
      input.asInstanceOf[UTF8String].toString).split(" ")
    val md = SimHashPortable60Expr.digest.get()
    TextOps.simhashSign(toks, 60, { tok =>
      // digest() completes AND resets the instance — no reset() needed
      val bytes = md.digest(
        tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 digest bytes big-endian, >>> 4 == first 15 hex chars
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (bytes(i) & 0xFFL); i += 1 }
      h >>> 4
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashPortable60Expr {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** All `numHashes` minhash slots in ONE pass over the shingle set:
  * slot j = min over shingles of xxhash64(shingle, j). Replaces
  * `numHashes` separate aggregate expressions over exploded shingles —
  * same values (XXH64, same seeds), one row per doc, no explosion. */
final case class MinHashSignatureExpr(child: Expression, n: Int,
                                      numHashes: Int)
    extends UnaryExpression with CodegenFallback with RequiresStringInput {
  require(n >= 1, s"shingle width n=$n must be >= 1")
  require(numHashes >= 1, s"numHashes=$numHashes must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextOps.minhashSig(
      input.asInstanceOf[UTF8String].toString, n, numHashes))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** LSH band keys in one pass: minhash signature (as above), then band b
  * key = XXH64-fold of its `numHashes/bands` slots (seeded by b). One
  * tokenization + hash sweep per document, `bands` longs out. */
final case class MinHashBandKeysExpr(child: Expression, n: Int,
                                     numHashes: Int, bands: Int)
    extends UnaryExpression with CodegenFallback with RequiresStringInput {
  require(n >= 1, s"shingle width n=$n must be >= 1")
  // bands = 0 would make the divisibility require itself throw
  // '/ by zero', and a negative bands passes numHashes % bands == 0
  // only to die as NegativeArraySizeException per row (r16 review)
  require(bands >= 1 && numHashes >= bands && numHashes % bands == 0,
    s"bands=$bands must be >= 1 and divide numHashes=$numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"

  override def nullSafeEval(input: Any): Any = {
    val sig = TextOps.minhashSig(
      input.asInstanceOf[UTF8String].toString, n, numHashes)
    val r = numHashes / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var j = b * r
      while (j < (b + 1) * r) { acc = XXH64.hashLong(sig(j), acc); j += 1 }
      keys(b) = acc
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Total non-overlapping occurrence count of `" w "` across all `words`
  * in the space-padded lowercase text — ONE string scan per word with no
  * intermediate string rebuilds, replacing a per-word
  * `length(replace(...))` chain that re-materialized the document once
  * per stopword. Semantics identical to the replace-identity (left-to-
  * right non-overlapping matches on the padded original), so the DuckDB
  * oracle rendition is unchanged. Lowercasing via UTF8String to match
  * Spark's `lower` exactly. */
final case class PaddedOccurrencesExpr(child: Expression, words: Seq[String],
                                        lowercase: Boolean = true)
    extends UnaryExpression with CodegenFallback with RequiresStringInput {
  // an empty word's pattern is two spaces — it would silently count
  // double-space runs in the text (a trailing comma in the SQL
  // surface's word list produces exactly that); the sibling
  // TextFunctions.occurrences requires a non-empty needle for the same
  // hazard (r16 review)
  require(words.forall(_.nonEmpty),
    s"$prettyName: words must be non-empty (got ${words.mkString("[", ",", "]")})")
  override def dataType: DataType = LongType
  override def prettyName: String = "padded_occurrences"
  // when the TEXT is lowercased the patterns must be too — a
  // non-lowercase word would silently count 0 occurrences (r15 review);
  // same UTF8String casing as the text path so the two cannot diverge
  @transient private lazy val pats: Array[String] = words.map { w =>
    val w2 = if (lowercase)
      UTF8String.fromString(w).toLowerCase.toString else w
    s" $w2 "
  }.toArray

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = " " + (if (lowercase) u.toLowerCase else u).toString + " "
    var total = 0L
    var i = 0
    while (i < pats.length) {
      val p = pats(i)
      var idx = s.indexOf(p)
      while (idx >= 0) { total += 1; idx = s.indexOf(p, idx + p.length) }
      i += 1
    }
    total
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document character histogram: one tight JVM pass over the
  * string, returning array<struct<c: string, k: bigint>> with one entry
  * per DISTINCT character (Unicode code point — the same unit as
  * Spark's `length`/`substring`, so Σk = length(text)) in
  * first-occurrence order. Replaces the per-character
  * explode(sequence+substring) in [[TextPipeline.charEntropy]]: the
  * Generate's output shrinks from |chars| rows per document to
  * |distinct chars| (alphabet-bounded), and the downstream (doc, char)
  * aggregation hash-aggregates that tiny relation instead of the whole
  * corpus's characters. Counts are exact longs, so
  * `sum(k)` groupBy (doc, char) equals the old `count(*)` per exploded
  * char for ANY input (duplicate doc ids included) — values identical.
  * (CodegenFallback: the per-document eval dominates — the
  * WordShinglesExpr argument.) */
final case class CharHistogramExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with RequiresStringInput {
  import org.apache.spark.sql.types.{LongType => LT, StringType => ST}
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("c", ST, nullable = false),
      org.apache.spark.sql.types.StructField("k", LT, nullable = false))),
    containsNull = false)
  override def prettyName: String = "char_histogram"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // LinkedHashMap: deterministic first-occurrence order (the array
    // order is semantically irrelevant — consumers re-aggregate — but
    // determinism keeps plans/replays byte-stable)
    val counts = new java.util.LinkedHashMap[String, Array[Long]]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      val c = s.substring(i, i + n)
      val slot = counts.get(c)
      if (slot == null) counts.put(c, Array(1L)) else slot(0) += 1L
      i += n
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(e.getKey), e.getValue()(0))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  def charHistogram(text: Column): Column =
    GraftBridge.column(CharHistogramExpr(GraftBridge.expression(text)))
  def wordShingles(text: Column, n: Int): Column =
    GraftBridge.column(WordShinglesExpr(GraftBridge.expression(text), n))
  def paddedOccurrences(text: Column, words: Seq[String],
                        lowercase: Boolean = true): Column =
    GraftBridge.column(PaddedOccurrencesExpr(GraftBridge.expression(text),
      words, lowercase))
  def simhash64(text: Column): Column =
    GraftBridge.column(SimHash64Expr(GraftBridge.expression(text)))
  def simhashPortable60(text: Column): Column =
    GraftBridge.column(SimHashPortable60Expr(GraftBridge.expression(text)))
  def minhashSignature(text: Column, n: Int, numHashes: Int): Column =
    GraftBridge.column(MinHashSignatureExpr(GraftBridge.expression(text), n,
      numHashes))
  def minhashBandKeys(text: Column, n: Int, numHashes: Int,
                      bands: Int): Column =
    GraftBridge.column(MinHashBandKeysExpr(GraftBridge.expression(text), n,
      numHashes, bands))
}
