package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines: token
  * counting, quality ratios, language ID, fingerprinting. All are pure
  * codegen'd built-in compositions (no UDFs) so they stay inside
  * whole-stage codegen and run at scan speed on 100 TB — and every one
  * has an exactly-equivalent ANSI/DuckDB rendition for the oracle.
  */
object TextFunctions {

  /** Non-overlapping occurrence count of literal `needle` via the
    * length-difference identity (literal `replace`, no regex — identical
    * semantics in every engine). */
  def occurrences(text: Column, needle: String): Column = {
    // an empty needle would divide by zero — a silent NULL count for
    // every row under non-ANSI division, not an error
    require(needle.nonEmpty, "occurrences: empty needle")
    ((length(text) -
      length(call_function("replace", text, lit(needle), lit("")))) /
      needle.length).cast("long")
  }

  /** Whitespace token count via the space-counting identity — exact for
    * single-space-separated text, engine-agnostic. */
  def tokenCount(text: Column): Column =
    (length(text) - length(translate(text, " ", "")) + 1).cast("long")

  /** Regex token count (BPE-ish word/number/symbol classes). */
  def regexTokenCount(text: Column, pattern: String = "[A-Za-z]+|[0-9]+"): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Fraction of characters matching a regex class (e.g. "[A-Z]").
    * An empty document scores 0.0 — without the guard the division is
    * 0/0, which under Spark 4's default ANSI mode kills the whole scan
    * on the first empty doc (ubiquitous in crawl data; r15 review).
    * Mirroring oracles carry the same CASE. */
  def charClassRatio(text: Column, clazz: String): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, clazz, ""))).cast("double") /
        length(text).cast("double"))

  /** Mean token length = (chars − spaces) / tokens. */
  def meanTokenLength(text: Column): Column =
    (length(translate(text, " ", ""))).cast("double") / tokenCount(text).cast("double")

  /** Quality score: short docs, over-punctuated docs, and docs with very
    * long "words" score low. Deterministic arithmetic only. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val punct = charClassRatio(text, "[.,!?;:]")
    val mtl = meanTokenLength(text)
    val mtlScore = when(mtl > 12.0, lit(0.0)).otherwise(lit(1.0) - mtl / lit(24.0))
    lenScore * (lit(1.0) - least(punct * lit(5.0), lit(1.0))) * mtlScore
  }

  /** English stopwords used by [[stopwordRatio]]. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "from", "this")

  /** Fraction of whitespace tokens that are stopwords — a standard
    * text-quality signal (natural prose ≈ 0.2-0.5; keyword soup ≈ 0).
    * Native one-pass-per-word scan (PaddedOccurrencesExpr): identical
    * counts to the per-word replace-identity chain, without rebuilding
    * the document once per stopword. */
  def stopwordRatio(text: Column): Column =
    graft.expressions.TextExpressions.paddedOccurrences(text, stopwords)
      .cast("double") / tokenCount(text).cast("double")

  /** Marker-word languages for the n-gram-free heuristic language ID. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " la ", " de "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "))

  /** Heuristic language ID: argmax of marker-word hit counts, ties broken
    * by declaration order, "und" (undetermined) when all zero. Native
    * one-scan-per-marker counting (case-sensitive, as before; the expr
    * re-pads, so markers pass trimmed). */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, kws) =>
      lang -> graft.expressions.TextExpressions.paddedOccurrences(
        text, kws.map(_.trim), lowercase = false)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Redact email addresses and bare URLs with placeholder tokens — the
    * PII-scrub pass a training corpus gets before anything else sees it.
    * Pure `regexp_replace` chain: codegen'd, scan-speed, and the regexes
    * are POSIX-portable so the oracle runs them verbatim. */
  def redactPii(text: Column,
                emailToken: String = "<EMAIL>",
                urlToken: String = "<URL>"): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    // [^\\s], not [^ ]: a literal-space-only class runs across
    // newlines/tabs, deleting real content after a URL in multi-line
    // docs ("https://x.com\nImportant:" would all become <URL>)
    val url = "https?://[^\\s]+"
    regexp_replace(regexp_replace(text, email, emailToken), url, urlToken)
  }

  /** 128-bit content fingerprint (md5 hex) — the exact-dedup key. */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Shorter 64-bit hex fingerprint for joins. */
  def fingerprint64(text: Column): Column = substring(fingerprint(text), 1, 16)

  // --- URL structure (web-crawl curation: C4/CCNet-style filtering) ---
  // Deliberately regexp-based rather than Spark's parse_url: the same
  // POSIX-portable patterns run verbatim in the DuckDB oracle, so the
  // extraction is bit-identical cross-engine. All three are codegen'd
  // single-pass scans (regexp_extract), no UDFs.

  /** Host of an absolute URL ("" if the pattern misses). */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)

  /** Path component (leading '/', query/fragment stripped; "" if none). */
  def urlPath(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)", 1)

  /** Last-two-label registered-domain heuristic (public-suffix lists
    * are data, not code — at ingest they join in as a dimension). */
  def registeredDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** URL canonicalization for crawl dedup (the CCNet/RefinedWeb-class
    * URL-level pass that runs BEFORE content dedup): lowercase scheme
    * and host, strip a default :80/:443 port (scheme-aware — http:443
    * is a real port), strip KNOWN TRACKING parameters (utm_*, fbclid,
    * gclid) from the query while keeping content-bearing parameters
    * (?v=, ?id=, ?page= identify distinct resources — dropping the
    * whole query would merge them and the dedup would discard real
    * documents), drop the fragment (client-side only), strip one
    * trailing slash. Pure per-row regexp projection — no shuffle; the
    * dedup downstream is a canonical-keyed groupBy. Path case and
    * parameter order are preserved. */
  def canonicalUrl(url: Column): Column = {
    val scheme0 =
      lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    // a schemeless/malformed URL would otherwise canonicalize to the
    // constant "://" and merge unrelated documents into one dedup
    // group — fail loudly instead (the thresholdSweep/shardCensus
    // contract)
    val scheme = when(url.isNull || scheme0 === "",
      raise_error(concat(lit("canonicalUrl: no <scheme>:// prefix in '"),
        coalesce(url, lit("NULL")), lit("'"))))
      .otherwise(scheme0)
    val host0 =
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    // default ports are scheme-specific: http:443 / https:80 are REAL
    // non-default ports serving potentially different content
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      "/$", "")
    val query = regexp_replace(
      regexp_replace(
        regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^?#]+\\?([^#]*)", 1),
        "(?:^|&)(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*", ""),
      "^&+", "")
    concat(scheme, lit("://"), host, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }
}
