package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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
  * (and to the DuckDB oracle SQL): normalize = lowercase + collapse
  * `\s+` + trim; shingles = distinct space-joined word n-grams in
  * first-occurrence order, whole-text fallback below n tokens; SimHash
  * = sign of per-bit ±1 sums over xxhash64(token, seed=42) — the same
  * hash family as Spark's `xxhash64`.
  */
object TextOps {
  def normalize(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ").trim

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

  def simhash64(text: String): Long = {
    val toks = normalize(text).split(" ")
    val counts = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = hashUtf8(UTF8String.fromString(toks(t)), 42L)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) != 0L) counts(k) += 1 else counts(k) -= 1
        k += 1
      }
      t += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) { if (counts(k) > 0) out |= (1L << k); k += 1 }
    out
  }
}

final case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)
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
    extends UnaryExpression with CodegenFallback {
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
  * sign-of-±1-sums per bit. Exists so the SimHash near-dup operator can
  * carry a full cross-engine hash oracle (d04); the XXH64
  * [[SimHash64Expr]] stays the fast production default (MD5 costs ~3×
  * XXH64 per token). Same normalize/tokenize as [[TextOps.simhash64]]. */
final case class SimHashPortable60Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_portable60"

  override def nullSafeEval(input: Any): Any = {
    val toks = TextOps.normalize(
      input.asInstanceOf[UTF8String].toString).split(" ")
    val md = SimHashPortable60Expr.digest.get()
    val counts = new Array[Int](60)
    var t = 0
    while (t < toks.length) {
      md.reset()
      val bytes = md.digest(
        toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 digest bytes big-endian, >>> 4 == first 15 hex chars
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (bytes(i) & 0xFFL); i += 1 }
      h = h >>> 4
      var k = 0
      while (k < 60) {
        if (((h >>> k) & 1L) != 0L) counts(k) += 1 else counts(k) -= 1
        k += 1
      }
      t += 1
    }
    var out = 0L
    var k = 0
    while (k < 60) { if (counts(k) > 0) out |= (1L << k); k += 1 }
    out
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
    extends UnaryExpression with CodegenFallback {
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
    extends UnaryExpression with CodegenFallback {
  require(numHashes % bands == 0, "bands must divide numHashes")
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
    extends UnaryExpression with CodegenFallback {
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

object TextExpressions {
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
