package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise association-rule mining (support / confidence / lift) over
  * item baskets — the market-basket layer of the classic Apriori/
  * FP-growth family (Agrawal & Srikant, VLDB'94), restricted to the
  * 2-itemset level that co-occurrence dashboards and "users who did A
  * also did B" features actually consume. The reference's event surface
  * has no co-occurrence operator at all; this closes it.
  *
  * Pair generation is the [[Graph.bipartiteProject]] shape — quadratic
  * in per-basket size by construction — so `maxBasketSize` is mandatory
  * and oversized baskets are EXCLUDED ENTIRELY (the hub-key treatment:
  * the basket containing everything correlates nothing). Supports and
  * the basket total count only KEPT baskets, so confidence and lift
  * stay internally consistent with the pair counts.
  *
  * Shuffle census: item-set dedup and the basket-degree filter key on
  * the basket, the self-join keys on the basket, pair counts key on the
  * item pair, supports key on the item — every exchange is bounded by
  * basket or item cardinality, and the 1-row basket total rides a
  * broadcast crossJoin, not a driver collect. Lift/confidence are
  * ratios of exact longs evaluated once in IEEE doubles (hash-stable
  * across engines).
  *
  * Output, one row per unordered item pair (ante < cons as strings):
  * (ante, cons, n_both, confidence, lift) where confidence =
  * n_both/n_ante and lift = n_both·n_baskets/(n_ante·n_cons).
  */
object Assoc {

  def associationRules(
      df: DataFrame,
      basket: Column,
      item: Column,
      maxBasketSize: Int): DataFrame = {
    require(maxBasketSize >= 2,
      s"associationRules: maxBasketSize >= 2 required, got $maxBasketSize")
    val b = df.filter(basket.isNotNull && item.isNotNull)
      .select(basket.as("__b"), item.as("__i")).distinct()
    val deg = b.groupBy(col("__b")).agg(count(lit(1)).as("__d"))
    val kept = b.join(deg.filter(col("__d") <= maxBasketSize), Seq("__b"))
      .select(col("__b"), col("__i"))
    val total = kept.agg(countDistinct(col("__b")).as("__nb"))
    val sup = kept.groupBy(col("__i")).agg(count(lit(1)).as("__cnt"))
    val pairs = kept.select(col("__b"), col("__i").as("ante"))
      .join(kept.select(col("__b"), col("__i").as("cons")), Seq("__b"))
      .filter(col("ante") < col("cons"))
      .groupBy(col("ante"), col("cons"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(sup.select(col("__i").as("ante"), col("__cnt").as("__ca")), Seq("ante"))
      .join(sup.select(col("__i").as("cons"), col("__cnt").as("__cc")), Seq("cons"))
      .crossJoin(total)
      .select(col("ante"), col("cons"), col("n_both"),
        (col("n_both").cast("double") / col("__ca").cast("double")).as("confidence"),
        (col("n_both").cast("double") * col("__nb").cast("double") /
          (col("__ca").cast("double") * col("__cc").cast("double"))).as("lift"))
  }
}
