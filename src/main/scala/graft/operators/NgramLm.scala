package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based bigram language-model scoring with Stupid Backoff
  * (Brants et al. 2007, "Large Language Models in Machine Translation" —
  * the backoff designed FOR distributed count tables), the engine behind
  * CCNet-style perplexity filtering of a crawl against a clean reference
  * corpus (Wenzek et al. 2020). No reference-repo analog — this is the
  * driver's LLM-pipeline brief.
  *
  * Per-token score (log domain; α = backoff discount, default 0.4):
  *
  *   S(t | p) = ln(c₂(p,t) / c₁(p))                 if c₂(p,t) > 0
  *            = ln α + ln((c₁(t)+1) / (N+V+1))      otherwise (backoff)
  *   S(t)     = ln((c₁(t)+1) / (N+V+1))             first token (no prev)
  *
  * where c₂/c₁ are train-corpus bigram/unigram counts, N = train token
  * count, V = train vocab size; the +1/+V+1 is add-one smoothing with
  * one shared slot for every out-of-vocabulary token, so OOV mass never
  * divides by zero and does not depend on the corpus being scored.
  * Stupid Backoff scores are not normalized probabilities (Brants §3) —
  * monotone "target-likeness per token", which is all filtering ranks.
  *
  * Scale shape (the 100 TB contract):
  *  - Training is two map-side-partial count aggregations over the
  *    reference corpus; the model is two bounded tables (vocab / vocab²
  *    rows, prunable with `minCount` — Brants prunes singletons at
  *    2T tokens) plus two scalars. Train once, reuse across scoring
  *    runs — at ingest these are just columns-to-join artifacts.
  *  - Scoring explodes each doc into (prev, tok) pairs SCAN-SIDE (an
  *    array zip with the shifted self — no window, no per-doc shuffle)
  *    and left-joins the two count tables. With a pruned model both
  *    joins broadcast; the only wide exchange is the doc-keyed average,
  *    which partial-aggregates map-side. A Zipfian stopword never owns
  *    a shuffle partition because nothing shuffles on a token key.
  *  - OOV and unseen-bigram tokens take the backoff branch by
  *    construction (LEFT joins + coalesce), so scoring never throws on
  *    unseen text — the property that matters when the scored crawl is
  *    1000× the reference corpus.
  */
object NgramLm {

  /** Trained bigram model: two count tables + the two train scalars.
    * `unigrams` = (tok, c1); `bigrams` = (prev, tok, c2). The count
    * tables are persisted by [[train]]; call [[Model.unpersist]] when
    * the model is retired — Dataset-level caches are held strongly by
    * the session's CacheManager and are NOT garbage-collected with the
    * model object (only RDD-level persists are ContextCleaner-eligible),
    * so a long-lived session training many models would otherwise
    * accumulate MEMORY_AND_DISK entries until `clearCache()`. */
  final case class Model(unigrams: DataFrame, bigrams: DataFrame,
                         nTokens: Long, vocabSize: Long) {
    /** Release the persisted count tables. Scoring frames already
      * materialized keep working (the cache is an optimization, not a
      * dependency); new [[scoreDocs]] actions after this re-run the
      * training aggregations. */
    def unpersist(): Unit = {
      unigrams.unpersist(blocking = false)
      bigrams.unpersist(blocking = false)
    }
  }

  /** Count tables from a reference corpus. `minCount` prunes rare
    * bigrams (keeps the table broadcastable; pruned pairs fall back to
    * the unigram path — exactly Stupid Backoff's contract). */
  def train(corpus: DataFrame, textCol: String, minCount: Long = 1L)
      : Model = {
    // ONE corpus pass, not two: tokenLagPairs emits exactly one
    // (prev, tok) pair per token (pair i = (toks[i-1] | NULL, toks[i])),
    // so the unigram counts are the per-tok SUMS of the pair counts —
    // the earlier rendition ran a second full tokenize+explode+shuffle
    // over the corpus just to count tokens it had already enumerated
    // (r17; at sf0.1 this is the dominant cost of t13/t24/t25's
    // now-per-query training — the lease-change price is paid back
    // here). The empty token is dropped at the pair level: split("",
    // " ") is [""], so an empty/whitespace-only doc yields the lone
    // pair (NULL, "") — tok != "" removes it from BOTH tables and from
    // N/V exactly as the old per-table filters did ("" never occurs
    // mid-array; normalize collapses whitespace runs — r15 review).
    val pairCounts = corpus
      .select(explode(bigramPairs(col(textCol))).as("bg"))
      .select(col("bg._1").as("prev"), col("bg._2").as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("prev", "tok").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // PERSIST the count tables: the model's frames are lazy plans, and
    // without the cache every scoreDocs action re-runs the full
    // reference-corpus training aggregations (the unigram table is
    // even referenced under two join keys per scoring pass) — k
    // scoring runs cost k extra training scans, against the
    // train-once contract (r15 review). Vocabulary-sized; held by the
    // CacheManager until Model.unpersist() (or session clearCache) —
    // Dataset caches are strong references, NOT ContextCleaner-reclaimed
    // (r15 ADVICE). Kept Dataset-level deliberately: an RDD-level
    // rewrap would lose InMemoryRelation's size stats and with them the
    // auto-broadcast of both count tables into the scoring joins.
    val uniP = pairCounts
      .groupBy("tok").agg(sum("cnt").as("c1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val biP = pairCounts
      .filter(col("prev").isNotNull).filter(col("cnt") >= minCount)
      .select(col("prev"), col("tok"), col("cnt").as("c2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the materialization region releases EVERYTHING this call
    // persisted on failure: Dataset caches are CacheManager-strong (not
    // ContextCleaner-reclaimed), so a mid-train task failure in a
    // long-lived session — which the harness survives (Bench records
    // -1 and continues) — would otherwise strand the corpus-pass pair
    // cache plus both half-built model tables for the rest of the run,
    // defeating the lease discipline (r17 review)
    try {
      // two scalars — a driver-sized collect by contract (this action
      // also materializes the unigram cache, through the pair cache)
      val row = uniP
        .agg(coalesce(sum("c1"), lit(0L)).as("n"), count(lit(1)).as("v"))
        .collect().head
      val (n, v) = (row.getLong(0), row.getLong(1))
      // force the bigram cache while the pair cache is still resident,
      // then drop the pairs: they exist only to fan the one corpus pass
      // into the two model tables (an unpersist BEFORE biP materializes
      // would silently re-run the corpus pass on biP's first action)
      biP.count()
      pairCounts.unpersist(blocking = false)
      // inside the try: the empty-corpus reject must also release the
      // three persists (uniP/biP stranded on this path pre-r17 too)
      require(n > 0, "cannot train a language model on an empty corpus")
      Model(uniP, biP, n, v)
    } catch { case e: Throwable =>
      pairCounts.unpersist(blocking = false)
      uniP.unpersist(blocking = false)
      biP.unpersist(blocking = false)
      throw e
    }
  }

  /** Average per-token Stupid-Backoff log score for every document:
    * output = (idCol, n_toks, avg_logp). Higher = more reference-like;
    * CCNet's perplexity filter is `exp(-avg_logp)` thresholding, which
    * ranks identically. Token-less documents emit no row. */
  def scoreDocs(model: Model, docs: DataFrame, idCol: String,
                textCol: String, alpha: Double = 0.4): DataFrame = {
    require(alpha > 0 && alpha <= 1, "backoff discount must be in (0,1]")
    val pairs = docs
      .select(col(idCol), explode(bigramPairs(col(textCol))).as("bg"))
      .select(col(idCol), col("bg._2").as("tok"), col("bg._1").as("prev"))
      // token-less docs really do emit no row (the documented
      // contract): without this an empty doc scored as a 1-token doc
      // whose single token is "" (r15 review)
      .filter(col("tok") =!= "")
    val u = model.unigrams
    val scored = pairs
      .join(model.bigrams, Seq("prev", "tok"), "left")
      .join(u.select(col("tok").as("prev"), col("c1").as("c1p")),
        Seq("prev"), "left")
      .join(u.select(col("tok"), col("c1").as("c1t")), Seq("tok"), "left")
    // the unigram backoff base: add-one over (N + V + 1 OOV slot)
    val base = log((coalesce(col("c1t"), lit(0L)).cast("double") + lit(1.0)) /
      (lit(model.nTokens.toDouble) + lit(model.vocabSize.toDouble) + lit(1.0)))
    val lp = when(col("c2").isNotNull,
        log(col("c2").cast("double") / col("c1p").cast("double")))
      .when(col("prev").isNull, base)
      .otherwise(log(lit(alpha)) + base)
    scored.withColumn("__lp", lp)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_toks"), avg("__lp").as("avg_logp"))
  }

  /** (prev, tok) pairs for one document — [[Dedup.tokenLagPairs]]. */
  private def bigramPairs(text: Column): Column =
    Dedup.tokenLagPairs(text)
}
