package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules over (basket, item) pairs — the classic
  * co-occurrence mining stage (Agrawal & Srikant, VLDB 1994) that a training-
  * data pipeline reuses for tag/source co-occurrence and feature-pair audits.
  *
  * Shape: the reference's warehouse would express this as a self-join of the
  * basket-item table; here the apriori property prunes FIRST — an item below
  * the support floor cannot appear in any frequent pair — so the self-join's
  * fan-out is bounded by frequent items only, then per-basket pair explosion
  * is quadratic in BASKET SIZE (single digits for order lines), never in
  * item-domain or table size.
  *
  * 100 TB posture: one distinct + one count shuffle build the item census;
  * the frequent-item set is vocabulary-sized and broadcast; the pair join
  * shuffles on the basket key once; pair counts are map-side combined. The
  * basket-count scalar rides a 1-row broadcast cross join (never `collect`).
  */
object Association {

  /** Frequent item pairs with support / confidence / lift.
    *
    * @param minCount absolute support floor for both single items and pairs
    * @return (item_a, item_b, n_a, n_b, n_ab, support, confidence, lift),
    *         item_a < item_b; `confidence` is P(b|a) for the a→b direction.
    */
  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
                minCount: Long): DataFrame = {
    val items = baskets.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val nBaskets = items.select(countDistinct(col("__b")).as("n_baskets"))
    val itemCounts = items.groupBy(col("__i"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount)
    // apriori prune: only frequent items survive into the pair join
    val pruned = items.join(broadcast(itemCounts), "__i")
    val pairs = pruned.select(col("__b"), col("__i").as("item_a"), col("__n").as("n_a"))
      .join(pruned.select(col("__b"), col("__i").as("item_b"), col("__n").as("n_b")),
        "__b")
      .filter(col("item_a") < col("item_b"))
    pairs.groupBy(col("item_a"), col("item_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"), col("n_ab"),
        (col("n_ab").cast("double") / col("n_baskets")).as("support"),
        (col("n_ab").cast("double") / col("n_a")).as("confidence"),
        (col("n_ab").cast("double") * col("n_baskets")
          / (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }
}
