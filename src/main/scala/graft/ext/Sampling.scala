package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-keyed sampling for reproducible training-data
  * mixes. `df.sample()` draws from a per-partition RNG — the selection
  * changes with partitioning, retries, and engine version, so a
  * pipeline re-run yields a different corpus. Here membership is a pure
  * function of the KEY (md5-derived bucket in [0, Buckets)), so the
  * same row is in or out on every run, every engine, every cluster
  * layout — and an external engine can reproduce the exact sample
  * (q68's DuckDB oracle does). Runs entirely in the scan stage: no
  * shuffle, prunes with pushed filters.
  *
  * Thresholds are exact integers (`floor(fraction * Buckets)`), never a
  * double comparison, so engines can't disagree on the boundary bucket.
  */
object Sampling {

  val Buckets = 10000L

  /** Stable bucket in [0, Buckets) for a key column. */
  def bucket(key: Column): Column = pmod(TextHash.hash64(key.cast("string")), lit(Buckets))

  /** Keep ~fraction of rows, keyed by `key`. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(bucket(key) < lit(math.floor(fraction * Buckets).toLong))

  /** Deterministic DISJOINT split: assigns each row a split label by
    * carving [0, Buckets) into consecutive integer ranges sized by the
    * given fractions (ordered as passed; remainder rows after the last
    * range get the last label, so every row is labeled exactly once).
    * Two independent [[hashSample]] calls cannot guarantee disjointness
    * — a train/val/test partition needs the ranges. Fractions must sum
    * to ~1. Null-keyed rows are DROPPED, consistent with [[hashSample]]
    * (whose null bucket fails every comparison) — the alternative, a
    * silent default label, would funnel every null id into one split.
    */
  def hashSplit(df: DataFrame, key: Column, splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $splits")
    val bounds = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.floor(f * Buckets).toLong
    }.tail
    val b = bucket(key)
    val labeled = splits.map(_._1).zip(bounds).dropRight(1)
      .foldRight(lit(splits.last._1)) { case ((name, hi), acc) =>
        when(b < lit(hi), lit(name)).otherwise(acc)
      }
    df.filter(key.isNotNull).withColumn("split", labeled)
  }

  /** Stratified variant: per-stratum fractions (default for strata not
    * in the map), e.g. upsample rare languages / downsample boilerplate
    * domains while keeping the whole mix reproducible.
    */
  def hashSampleBy(
      df: DataFrame, key: Column, strata: Column,
      fractions: Map[String, Double], default: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(
        lit(math.floor(default * Buckets).toLong)) { case (acc, (s, f)) =>
      when(strata === lit(s), lit(math.floor(f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(bucket(key) < threshold)
  }

  /** Weighted deterministic Bernoulli sampling: keep each row with
    * probability proportional to its weight, `p_i = min(1, targetRate ·
    * w_i / mean(w))` — importance sampling for training mixes (quality
    * scores, dollar values, engagement weights) with E[kept] ≈
    * targetRate · n while membership stays a pure function of the key.
    * High-weight rows (w ≥ mean/targetRate) are always kept.
    *
    * Why not Efraimidis–Spirakis top-n (u^(1/w) priorities): `pow` is
    * not correctly rounded in IEEE 754, so priority ORDER could differ
    * across engines and the sample would not be reproducible. Here the
    * per-row threshold is `floor(p_i · Buckets)` computed from exact
    * inputs with one double multiply/divide chain — every engine
    * computes the identical integer.
    *
    * Plan shape: one tiny 1-row aggregate (exact-decimal mean weight)
    * broadcast back, then a scan-stage hash filter — the corpus is
    * never shuffled. Negative/null weights are treated as 0 (never
    * sampled).
    */
  def weightedHashSample(
      df: DataFrame, key: Column, weight: Column, targetRate: Double): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(targetRate > 0 && targetRate <= 1, s"targetRate in (0,1], got $targetRate")
    val w = greatest(coalesce(weight.cast("double"), lit(0.0)), lit(0.0))
    val meanW = df.agg(
      (sum(w.cast(DecimalType(38, 10))).cast("double") /
        count(lit(1)).cast("double")).as("__meanw"))
    // Guard the degenerate all-zero-weight corpus: mean 0 would make the
    // divide yield null, least(1.0, null) = 1.0, and EVERY row kept (or an
    // ANSI-mode error). The contract is the opposite: weightless ⇒ nothing
    // is sampled.
    df.crossJoin(broadcast(meanW))
      .filter(bucket(key) <
        when(col("__meanw") > 0,
          floor(least(lit(1.0), lit(targetRate) * w / col("__meanw")) * Buckets)
            .cast("long"))
          .otherwise(lit(0L)))
      .drop("__meanw")
  }

  /** Square-root temperature resampling: flatten a skewed stratum mix
    * (source/language/domain imbalance) by keeping each stratum at rate
    * `sqrt(n_min / n_s)` — the smallest stratum survives whole, a
    * stratum 100× its size is downsampled 10×. This is the T=2 point of
    * the `p^(1/T)` temperature family used to balance multilingual /
    * multi-source training mixes; sqrt specifically (rather than a
    * tunable pow) keeps the rate bit-reproducible across engines —
    * IEEE sqrt and long→double casts are correctly rounded everywhere,
    * `pow(x, 1-alpha)` is not.
    *
    * Plan shape at 100 TB: one tiny stratum-count aggregate (rows =
    * distinct strata), its 1-row min joined back by cross, then a
    * broadcast join and a scan-stage hash filter — the corpus itself is
    * never shuffled. Membership is content-keyed like [[hashSample]],
    * so re-runs and other engines reproduce the exact sample.
    */
  def sqrtResample(df: DataFrame, key: Column, strata: Column): DataFrame = {
    val counts = df.groupBy(strata.as("__stratum")).agg(count(lit(1)).as("__n"))
    val withMin = counts.crossJoin(
      broadcast(counts.agg(min(col("__n")).as("__nmin"))))
    val rates = withMin.select(
      col("__stratum"),
      floor(sqrt(col("__nmin").cast("double") / col("__n").cast("double")) * Buckets)
        .cast("long").as("__keep"))
    df.join(broadcast(rates), strata <=> col("__stratum"))
      .filter(bucket(key) < col("__keep"))
      .drop("__stratum", "__keep")
  }

  /** Deterministic EXACT-size stratified sample: exactly `n` rows per
    * stratum (fewer only when the stratum is smaller), chosen by hash
    * order of the key. Rate-based sampling ([[hashSampleBy]]) gives
    * E[kept] but a fixed training-mix budget wants exact counts per
    * source/language — this is "give me 10k docs from every stratum,
    * reproducibly, on any engine".
    *
    * Selection = the `n` smallest `hash64(key) >> 10` values per
    * stratum (50-bit scores stay exact in the heap's double; ties —
    * only possible via a 50-bit collision — break by id ascending,
    * mirrored in the oracle). Runs as the bounded-heap grouped top-k
    * aggregate: map-side heaps ship ≤ n ids per (stratum, task), so
    * the full corpus never shuffles — the same scale posture as the
    * per-source cap (q77).
    */
  def exactStratifiedSample(
      df: DataFrame, key: Column, strata: Column, n: Int): DataFrame = {
    val keyed = df.select(strata.as("stratum"), key.as("__id"))
      .withColumn("__score",
        -shiftrightunsigned(TextHash.hash64(col("__id").cast("string")), 10)
          .cast("double"))
    graft.functions.TopK.perKey(keyed, Seq("stratum"), col("__score"), col("__id"), n)
      .select(col("stratum"), col("rank"), col("id"))
  }

  /** Token-budget mixture sampling — the operator that assembles an
    * LLM training mix: given per-source mixture WEIGHTS and a total
    * TOKEN budget, allocate each source an integer budget
    * `total · wₛ / Σw` (floor division — allocations never overshoot)
    * and take, per source, the greedy prefix of documents in hash
    * order whose running token count stays within it. Rate- and
    * count-based samplers ([[hashSampleBy]], [[exactStratifiedSample]])
    * control ROWS; training mixes are specified in TOKENS ("300B
    * tokens: 50% web, 30% code, 20% books"), and doc length varies by
    * orders of magnitude, so the budget must be enforced on the token
    * sum itself.
    *
    * Determinism: the per-source order is (hash64(id), id) — content-
    * keyed like every sampler here, so the same corpus yields the same
    * mix on any engine/run — and the running sum is an integer window
    * sum, so the cut is exact: kept ⇔ cumulative tokens ≤ budget. The
    * first doc that would cross the line is dropped, not truncated
    * (document-level sampling; chunking is q80's job). Sources absent
    * from `weights` are excluded; weights are plain integers (ratios,
    * ppm, anything — only proportions matter).
    *
    * Scale: token counts are scan-stage; the only shuffle is ONE
    * hash-partitioned window keyed on the source. Per-source ordering
    * is the window's in-partition sort — no global sort, no collect;
    * the weight table is a broadcast of |sources| rows.
    */
  /** Floor-allocated per-source token budgets: total·wₛ div Σw.
    * BigInt intermediate: totalBudget·w overflows Long at the scales
    * both factors are specified in (a 3e11-token budget × ppm-style
    * weights already passes 2^63), which would yield negative budgets
    * that silently drop every document of a source. Shared by the
    * batch cut and the streaming admission twin
    * ([[graft.streaming.EventStreams.budgetAdmission]]).
    */
  def budgetAllocations(
      weights: Seq[(String, Long)], totalBudget: Long): Seq[(String, Long)] = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"budgetAllocations: positive weights required, got $weights")
    require(totalBudget > 0, "budgetAllocations: totalBudget > 0 required")
    val wsum = weights.map(_._2).sum
    weights.map { case (s, w) => (s, (BigInt(totalBudget) * w / wsum).toLong) }
  }

  def budgetMixtureSample(
      df: DataFrame,
      id: Column,
      source: Column,
      nTokens: Column,
      weights: Seq[(String, Long)],
      totalBudget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"budgetMixtureSample: positive weights required, got $weights")
    require(totalBudget > 0, s"budgetMixtureSample: totalBudget > 0 required")
    val budgets = budgetAllocations(weights, totalBudget)
    val spark = df.sparkSession
    import spark.implicits._
    val bdf = broadcast(budgets.toDF("__src", "budget"))
    val w = Window.partitionBy(col("__src"))
      .orderBy(col("__h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(id.isNotNull && source.isNotNull)
      .select(id.as("doc_id"), source.as("__src"),
        coalesce(nTokens.cast("long"), lit(0L)).as("n_tokens"),
        TextHash.hash64(id.cast("string")).as("__h"))
      .join(bdf, Seq("__src"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= col("budget"))
      .select(col("doc_id"), col("__src").as("source"), col("n_tokens"),
        col("cum_tokens"), col("budget"))
  }

  /** Temporal train/test split with an embargo gap — the leakage-safe
    * split for time-series and event data, where a random (hash) split
    * would let the model see the future: train is everything at or
    * before the exact `trainFrac` time quantile, test is everything
    * strictly after `cut + embargoSeconds`, and the embargo span in
    * between is EXCLUDED (split = null) so windowed/lagged features
    * computed near the boundary cannot straddle it.
    *
    * The cut is the exact interpolated percentile of epoch seconds
    * (q83's quantile_cont parity contract), so the same data yields
    * the same split on any engine. Plan: one 1-row percentile
    * aggregate broadcast back, then a scan-stage label — the data
    * itself never shuffles.
    */
  def splitByTime(
      df: DataFrame,
      ts: Column,
      trainFrac: Double,
      embargoSeconds: Long): DataFrame = {
    require(trainFrac > 0 && trainFrac < 1, s"splitByTime: trainFrac in (0,1), got $trainFrac")
    require(embargoSeconds >= 0, s"splitByTime: embargoSeconds >= 0, got $embargoSeconds")
    val t = unix_timestamp(ts).cast("double")
    val cut = df.agg(percentile(t, lit(trainFrac)).as("__cut"))
    df.crossJoin(broadcast(cut))
      .withColumn("split",
        when(t <= col("__cut"), "train")
          .when(t > col("__cut") + embargoSeconds.toDouble, "test")
          .otherwise(lit(null).cast("string")))
      .drop("__cut")
  }
}
