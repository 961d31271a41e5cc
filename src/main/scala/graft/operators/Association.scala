package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association rules (market-basket support / confidence /
  * lift): for every pair of items co-occurring in a basket, the joint
  * support, both conditional confidences, and the lift
  * n·P(a,b)/(P(a)·P(b)) — the co-occurrence mining primitive behind
  * "frequently bought together" and feature co-occurrence analysis.
  *
  * Scale design (100 TB of baskets): items are deduplicated per basket
  * first; the ONLY quadratic surface is the per-basket self-join, whose
  * fan-out is basket-size-bounded — cap pathological baskets with
  * `maxBasketSize` (a bot cart with 10⁴ items would contribute 10⁸
  * pairs). Pair/item counts are partial-aggregable; `minPairCount`
  * prunes the long tail before the ratio projection. All counts are
  * exact integers; confidences and lift are single IEEE divides.
  */
object Association {

  def rules(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long = 1L,
      maxBasketSize: Option[Int] = None
  ): DataFrame = {
    // a NULL basket id or item would count toward the denominators
    // (n_baskets, cnt_a/cnt_b, __sz) yet can never satisfy the
    // self-join's equality/ordering — every rule's confidence and lift
    // silently deflate. Raise instead (the samplers' NULL convention).
    val bG = when(col(basketCol).isNull, raise_error(lit(
      s"Association.rules: NULL in basket column '$basketCol'")))
      .otherwise(col(basketCol))
    val iG = when(col(itemCol).isNull, raise_error(lit(
      s"Association.rules: NULL in item column '$itemCol'")))
      .otherwise(col(itemCol))
    val items0 = baskets.select(bG.as("__b"), iG.as("__i"))
      .distinct()
    val items = maxBasketSize match {
      case Some(cap) =>
        // a zero/negative cap filters out EVERY basket (each has
        // __sz >= 1) and returns an empty rules frame with no error —
        // a configuration failure, not a data condition (r15 review)
        require(cap >= 1,
          s"maxBasketSize=$cap would exclude every basket — the cap " +
            "must be >= 1 (or None for uncapped)")
        val sizes = items0.groupBy("__b")
          .agg(count(lit(1)).as("__sz")).filter(col("__sz") <= cap)
        items0.join(sizes.select("__b"), "__b", "left_semi")
      case None => items0
    }
    val nBaskets = items.select("__b").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCounts = items.groupBy("__i").agg(count(lit(1)).as("cnt"))
    val pairs = items.as("a").join(items.as("b"),
        col("a.__b") === col("b.__b") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("item_a"), col("b.__i").as("item_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)
    pairs
      .join(itemCounts.withColumnsRenamed(
        Map("__i" -> "item_a", "cnt" -> "cnt_a")), "item_a")
      .join(itemCounts.withColumnsRenamed(
        Map("__i" -> "item_b", "cnt" -> "cnt_b")), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_pair"),
        col("cnt_a"), col("cnt_b"), col("n_baskets"),
        (col("n_pair").cast("double") / col("cnt_a").cast("double"))
          .as("conf_a_b"),
        (col("n_pair").cast("double") / col("cnt_b").cast("double"))
          .as("conf_b_a"),
        // cast each factor BEFORE multiplying: the long products
        // overflow at the basket counts this operator is designed for
        ((col("n_pair").cast("double") * col("n_baskets").cast("double")) /
          (col("cnt_a").cast("double") * col("cnt_b").cast("double")))
          .as("lift"))
  }
}
