package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * All per-document signatures are built from Spark built-in higher-order
  * functions (`transform`/`aggregate`/`zip_with` over token arrays) plus
  * `xxhash64` — fully codegen'd, no UDFs, no shuffle until the candidate
  * join.
  *
  * 100 TB design: near-dup candidate generation is LSH-banded — documents
  * are exploded to (band, bandKey) rows (b rows per doc, b ≤ 32) and
  * self-joined on the band key, so candidate generation is ONE shuffle
  * whose key cardinality grows with the corpus; the full O(n²) pair space
  * is never materialized. Verification (exact Jaccard / signature
  * agreement) runs only on bucket-colliding pairs. Skewed buckets (boiler-
  * plate shingles) are handled by AQE skew-join; pathological buckets can
  * additionally be capped upstream by filtering band keys whose bucket
  * count exceeds a threshold — at the cost of recall on mega-clusters.
  */
object Dedup {

  /** Whitespace-collapsed, lower-cased text. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  def tokens(text: Column): Column = split(normalize(text), " ")

  /** Distinct word n-gram shingles; docs shorter than n words yield one
    * whole-text shingle so they can still be compared. */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", t)))
  }

  // ---- MinHash ------------------------------------------------------

  /** MinHash signature as an array column: element j = min over shingles
    * of xxhash64(s, j). Expression-only form — useful for one-shot
    * signatures, but it is a nested higher-order function (interpreted,
    * not codegen'd); the throughput path is [[minhashColumns]]. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(shingles, s => xxhash64(s, j))))

  /** Throughput MinHash: explode shingles, then `numHashes` codegen'd
    * `min(xxhash64(s, j))` aggregates → one row per doc with columns
    * mh_0..mh_{n-1}. Every shingle is tokenized and hashed exactly once,
    * entirely inside whole-stage codegen; the map-side partial aggregate
    * collapses each doc before the shuffle, so only (id, n×8 B) rows
    * move. This is the 100 TB path. */
  def minhashColumns(docs: DataFrame, idCol: String, textCol: String,
                     shingleN: Int, numHashes: Int): DataFrame = {
    val exploded = docs.select(col(idCol).as("id"),
      explode(wordShingles(col(textCol), shingleN)).as("s"))
    val aggs = (0 until numHashes).map(j =>
      min(xxhash64(col("s"), lit(j))).as(s"mh_$j"))
    exploded.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** Estimated Jaccard from two signatures: fraction of agreeing slots. */
  def signatureAgreement(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB,
        (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(sigA)

  /** Exact n-gram Jaccard of two shingle-set columns. */
  def jaccard(shA: Column, shB: Column): Column =
    size(array_intersect(shA, shB)).cast("double") /
      size(array_union(shA, shB))

  /** LSH banding: b rows per doc with key = hash of its band's minhash
    * slots. Built on [[minhashColumns]] (each minhash evaluated once,
    * codegen'd); the (id, band, band_key) rows are the ONLY thing
    * shuffled at scale. */
  def lshBands(docs: DataFrame, idCol: String, textCol: String,
               shingleN: Int = 3, numHashes: Int = 128,
               bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val mh = minhashColumns(docs, idCol, textCol, shingleN, numHashes)
    val bandKeys = (0 until bands).map { b =>
      xxhash64(concat_ws(",", ((b * r) until ((b + 1) * r)).map(j =>
        col(s"mh_$j").cast("string")): _*))
    }
    mh.select(col("id"), posexplode(array(bandKeys: _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_key"))
  }

  /** Near-duplicate candidate pairs (idA < idB) via MinHash-LSH, with the
    * signature-agreement Jaccard estimate attached. */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 128,
                        bands: Int = 32): DataFrame = {
    val b = lshBands(docs, idCol, textCol, shingleN, numHashes, bands)
    val pairs = b.as("l")
      .join(b.as("r"), Seq("band", "band_key"))
      .filter(col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val sigs = minhashColumns(docs, idCol, textCol, shingleN, numHashes)
      .select(col("id"),
        array((0 until numHashes).map(j => col(s"mh_$j")): _*).as("sig"))
    pairs
      .join(sigs.withColumnsRenamed(Map("id" -> "id_a", "sig" -> "sig_a")), "id_a")
      .join(sigs.withColumnsRenamed(Map("id" -> "id_b", "sig" -> "sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        signatureAgreement(col("sig_a"), col("sig_b")).as("est_jaccard"))
  }

  /** LSH candidates verified with EXACT n-gram Jaccard ≥ threshold.
    * Bucket-colliding pairs only; shingle sets joined back once per side
    * (never recomputed through the band explosion). */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     threshold: Double, shingleN: Int = 3,
                     numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val b = lshBands(docs, idCol, textCol, shingleN, numHashes, bands)
    val cand = b.as("l").join(b.as("r"), Seq("band", "band_key"))
      .filter(col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val sh = docs.select(col(idCol).as("id"),
      wordShingles(col(textCol), shingleN).as("sh"))
    cand
      .join(sh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), "id_a")
      .join(sh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---- SimHash ------------------------------------------------------

  private val bitValues: Seq[Long] = (0 until 64).map(k => 1L << k)

  /** 64-bit SimHash over token hashes: per bit, sum ±1 across tokens;
    * bit set where the sum is positive. One pass, no shuffle. */
  def simhash64(text: Column): Column = {
    val hs = transform(tokens(text), t => xxhash64(t))
    val counts = aggregate(hs,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, typedlit(bitValues),
        (c, p) => c + when(h.bitwiseAND(p) =!= 0, 1).otherwise(-1)))
    aggregate(
      zip_with(counts, typedlit(bitValues),
        (c, p) => when(c > 0, p).otherwise(lit(0L))),
      lit(0L), (a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates: block on the four 16-bit bands (any
    * pair within Hamming distance 3 shares ≥1 band — pigeonhole), then
    * filter by exact Hamming distance. One shuffle on (band, value). */
  def simhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3): DataFrame = {
    val withH = docs.select(col(idCol).as("id"), simhash64(col(textCol)).as("sh"))
    val banded = withH.select(col("id"), col("sh"), posexplode(array(
      (0 until 4).map(k => shiftright(col("sh"), 16 * k)
        .bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_val"))
    banded.as("l").join(banded.as("r"), Seq("band", "band_val"))
      .filter(col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hamming64(col("l.sh"), col("r.sh")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---- exact dedup --------------------------------------------------

  /** Exact dedup: keep the min-id representative per fingerprint. One
    * hash-shuffle on a 128-bit key; no text comparisons, no sort. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
}
