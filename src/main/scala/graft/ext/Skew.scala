package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks.
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles skewed
  * JOINS at runtime; these helpers cover the aggregation-side patterns
  * AQE does not rewrite:
  *
  *   - exact count-distinct over a hot key: a single-stage
  *     `countDistinct` funnels every distinct value of the hot key
  *     through one reducer. The two-phase form first reduces on
  *     (key, value) — cardinality-bounded, spread across the cluster —
  *     then counts per key.
  *   - salted aggregation for algebraic aggs when one key dominates:
  *     partial aggregation already combines map-side, so salting only
  *     matters when the AGG STATE per key is large (collect_list,
  *     approximate sketches with big buffers). The salt spreads a hot
  *     key's state over `salts` reducers; the merge stage re-combines.
  */
object Skew {

  /** Exact per-key count-distinct as two cardinality-bounded stages:
    * groupBy(key, value).count → groupBy(key).count. Identical result
    * to countDistinct(value), skew-safe shuffle profile.
    */
  def countDistinctTwoPhase(df: DataFrame, key: Column, value: Column): DataFrame =
    df.select(key.as("__k"), value.as("__v"))
      .distinct()
      .groupBy(col("__k"))
      // count(col), not count(*): countDistinct ignores NULL values but
      // still emits the key row (n = 0 for an all-null key)
      .agg(count(col("__v")).as("n_distinct"))
      .withColumnRenamed("__k", "key")

  /** Salted shuffle join for a-priori-known key skew: the big side gets
    * a deterministic salt in [0, salts), the small side is replicated
    * once per salt value, and the join runs on (keys..., salt) — a hot
    * key's rows spread over `salts` reducers instead of funneling
    * through one.
    *
    * When to reach for this instead of letting AQE handle it: AQE's
    * skew split rewrites sort-merge/shuffled-hash joins at RUNTIME by
    * splitting oversized map-output chunks — which covers most cases,
    * but (a) it cannot split below its chunk granularity when a single
    * key's rows arrive pre-concentrated, (b) it does nothing for a
    * plan that must avoid AQE (streaming, or a pinned physical plan),
    * and (c) it is reactive — a planned salt bounds the reducer size
    * BEFORE the first run. The cost is explicit: the small side is
    * materialized `salts` times, so this is for small-but-not-
    * broadcastable dimensions (or broadcast-disabled joins), never for
    * large×large.
    *
    * The salt must be DETERMINISTIC per row (same recompute hazard as
    * [[saltedSum]]): pass row-identifying columns in `saltBy` (a unique
    * id is ideal) and the salt is `pmod(hash(saltBy...), salts)`.
    *
    * Only join types that keep the big side's rows unique are allowed
    * (`inner`, `left`, `left_semi`, `left_anti`): a right or full join
    * would see the replicated small side's unmatched copies `salts`
    * times.
    */
  /** Salt advisor — closes the measure→prescribe loop of the skew
    * family: per join/group key, its row count, traffic share (ppm),
    * and the SALT FACTOR that would spread it across tasks —
    * `ceil(count · parts / total)`, i.e. how many tasks' worth of
    * rows the key carries (1 = harmless, ≥2 = would straggle a
    * `parts`-way shuffle; feed it to [[saltedJoin]]/[[saltedSum]] as
    * the per-key salt count). `minShare` ppm prunes the long tail so
    * the advisory table is head-bounded, not key-bounded.
    *
    * All integer arithmetic (ceil division via `(a + b − 1) div b`),
    * one key-keyed aggregate + a 1-row broadcast total. This is the
    * operator a pipeline runs BEFORE the big join, on the cheap side,
    * instead of discovering the hot key from a straggling stage.
    */
  def saltAdvisor(
      df: DataFrame, key: Column, parts: Int, minSharePpm: Long = 1000L): DataFrame = {
    require(parts >= 2 && parts <= 1000000, s"saltAdvisor: parts in [2, 1e6], got $parts")
    require(minSharePpm >= 0 && minSharePpm <= 1000000L,
      s"saltAdvisor: minSharePpm in [0, 1e6], got $minSharePpm")
    val counts = df.filter(key.isNotNull)
      .groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n")).as("__total"))))
      .withColumn("share_ppm", expr("n * 1000000L div __total"))
      .filter(col("share_ppm") >= minSharePpm)
      .withColumn("salt", expr(s"(n * ${parts}L + __total - 1L) div __total"))
      .select(col("key"), col("n"), col("share_ppm"), col("salt"))
  }

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBy: Seq[Column],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"saltedJoin: salts must be positive, got $salts")
    require(saltBy.nonEmpty,
      "saltedJoin: saltBy columns required (row-identifying, for a deterministic salt)")
    val allowed = Set("inner", "left", "left_outer", "left_semi", "left_anti")
    require(allowed(joinType.toLowerCase),
      s"saltedJoin: joinType must be one of $allowed (small side is replicated), got $joinType")
    val salted = big.withColumn("__salt", pmod(hash(saltBy: _*), lit(salts)))
    val replicated = small.withColumn(
      "__salt", explode(array((0 until salts).map(i => lit(i)): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Salted two-stage sum: partials on (key, salt), final on key.
    * For a plain sum this matches Spark's own partial aggregation — the
    * pattern exists for aggs whose state doesn't shrink map-side.
    *
    * The salt is derived DETERMINISTICALLY from (key, value,
    * spark_partition_id, saltBy...): a freely non-deterministic salt
    * (e.g. monotonically_increasing_id) is a shuffle-key hazard — if a
    * map stage is partially recomputed after a fetch failure, rows can
    * land in different (key, salt) groups than the partials already
    * fetched, double-counting or dropping rows. spark_partition_id is
    * stable under recompute of the same partitioning AND spreads a hot
    * key whose value is constant (e.g. counting with value=1, where
    * hash(key, value) alone would collapse every row into one salt
    * bucket) across as many salts as the key spans input partitions.
    * Pass row-identifying columns in `saltBy` to spread even a hot key
    * concentrated in a single input partition.
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int,
      saltBy: Seq[Column] = Nil): DataFrame =
    df.select(key.as("__k"), value.as("__v"),
        pmod(hash((key +: value +: spark_partition_id() +: saltBy): _*), lit(salts)).as("__s"))
      .groupBy(col("__k"), col("__s"))
      .agg(sum(col("__v")).as("__partial"))
      .groupBy(col("__k"))
      .agg(sum(col("__partial")).as("total"))
      .withColumnRenamed("__k", "key")
}
