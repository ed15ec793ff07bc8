package graft.ext

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): select raw-corpus documents that LOOK LIKE a small
  * target corpus by estimating importance weights p_target(x) /
  * p_raw(x) under hashed n-gram bag-of-features models, then sampling
  * the raw corpus proportionally to those weights. The standard
  * data-selection step between a retrieval probe (q86's BM25) and a
  * token-budget mixture (q208): the target says WHAT distribution we
  * want, DSIR finds the raw documents that move the mix toward it.
  *
  * Engine-portable arithmetic: the paper's log-likelihood ratios ride
  * on libm (`log`), whose last-bit rounding differs across engines, so
  * every quantity here is an EXACT INTEGER in ppm instead —
  * Laplace-smoothed per-feature probability ratios via decimal
  * multiply + integral division (both engines truncate toward zero),
  * and a per-document score that is the exact integer MEAN of its
  * occurrences' ratios (the arithmetic-mean surrogate for the paper's
  * mean-log; both rank "target-like" over "raw-like" monotonically in
  * each feature's ratio). Admission is [[Sampling.weightedHashSample]]
  * — membership a pure function of doc id, reproducible bit-for-bit by
  * any engine, no RNG.
  *
  * Plan shape at 100 TB: two feature censuses (explode → partial
  * aggregate bounded by `buckets` per task → one tiny shuffle), their
  * ratio table is ≤ `buckets` rows and BROADCAST to the scoring join;
  * scoring explodes each doc's features and immediately re-collapses
  * to one row per doc (all of a doc's occurrences sit in the row's own
  * partition, so the map-side combine makes the shuffle O(docs), not
  * O(tokens)); the final admission is a scan-stage hash filter. The
  * raw corpus is never shuffled wider than one row per document.
  */
object Dsir {

  /** Hashed n-gram occurrence census of a corpus: (feat, cnt) with
    * multiplicity — the sufficient statistic of the bag-of-hashed-
    * n-grams model. At most `buckets` rows.
    */
  def featureCensus(docs: DataFrame, text: Column, n: Int, buckets: Long): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    docs
      .select(explode(
        TextFunctions.wordShingleHashes(text, n, mod = buckets, distinct = false))
        .as("feat"))
      .groupBy("feat").agg(count(lit(1)).as("cnt"))
  }

  private def ldiv(a: Column, b: Column): Column =
    GraftExprBridge.column(IntegralDivide(
      GraftExprBridge.expression(a), GraftExprBridge.expression(b)))

  /** Per-feature importance ratio in ppm over the RAW corpus's feature
    * support, Laplace-smoothed so a feature unseen in the target still
    * gets a finite (small) ratio:
    *
    *   ratio_ppm(f) = ⌊ (tc_f+1)·(rtot+B)·10⁶ / ((rc_f+1)·(ttot+B)) ⌋
    *
    * = 10⁶ · p̂_target(f) / p̂_raw(f) with add-one smoothing over B
    * buckets. Decimal(38) intermediates keep the triple product exact
    * at any corpus size; the division is integral (truncating), the
    * same operation as DuckDB `//` over HUGEINT.
    */
  def importanceRatiosPpm(
      rawCensus: DataFrame, targetCensus: DataFrame, buckets: Long): DataFrame = {
    val d = DecimalType(38, 0)
    val joined = rawCensus.select(col("feat"), col("cnt").as("__rc"))
      .join(targetCensus.select(col("feat"), col("cnt").as("__tc")),
        Seq("feat"), "left")
      .na.fill(0L, Seq("__tc"))
    val totals = rawCensus.agg(sum(col("cnt")).as("__rtot"))
      .crossJoin(targetCensus.agg(sum(col("cnt")).as("__ttot")))
    joined.crossJoin(broadcast(totals))
      .select(col("feat"),
        ldiv(
          (col("__tc") + 1).cast(d) * (col("__rtot") + buckets).cast(d) * lit(1000000L).cast(d),
          (col("__rc") + 1).cast(d) * (col("__ttot") + buckets).cast(d))
          .cast("long").as("ratio_ppm"))
  }

  /** Per-document DSIR score: (id, n_feats, dsir_ppm) where dsir_ppm is
    * the exact integer mean of the document's per-occurrence importance
    * ratios. Documents too short to yield a single n-gram score 0 —
    * never upsampled, matching the no-evidence contract of the other
    * corpus operators.
    */
  def scores(
      raw: DataFrame, id: Column, text: Column,
      target: DataFrame, targetText: Column,
      n: Int = 2, buckets: Long = 4096L): DataFrame = {
    val rawKeyed = raw.select(id.as("__id"), text.as("__text"))
    val ratios = importanceRatiosPpm(
      featureCensus(rawKeyed, col("__text"), n, buckets),
      featureCensus(target, targetText, n, buckets), buckets)
    // explode_outer keeps featureless docs as one null-feature row, so
    // the per-doc aggregate covers EVERY id in one pass — no join back
    // to the corpus for the zero-score rows (one keyed shuffle total,
    // O(docs) wide after the in-partition combine)
    rawKeyed
      .select(col("__id"), explode_outer(
        TextFunctions.wordShingleHashes(col("__text"), n, mod = buckets, distinct = false))
        .as("feat"))
      .join(broadcast(ratios), Seq("feat"), "left")
      .groupBy(col("__id"))
      .agg(count(col("ratio_ppm")).as("n_feats"),
        sum(col("ratio_ppm")).as("__sum"))
      .select(col("__id").as("id"), col("n_feats"),
        when(col("n_feats") > 0,
          ldiv(col("__sum"), col("n_feats")).cast("long"))
          .otherwise(lit(0L)).as("dsir_ppm"))
  }

  /** Importance resampling: admit raw documents with probability
    * proportional to their DSIR score at expected rate `targetRate`,
    * deterministically ([[Sampling.weightedHashSample]] keyed on the
    * doc id). Returns the admitted rows of `raw` plus the score
    * columns.
    */
  def resample(
      raw: DataFrame, id: Column, text: Column,
      target: DataFrame, targetText: Column,
      targetRate: Double, n: Int = 2, buckets: Long = 4096L): DataFrame = {
    val scored = raw.join(
      scores(raw, id, text, target, targetText, n, buckets)
        .withColumnRenamed("id", "__sid"),
      id === col("__sid"))
      .drop("__sid")
    Sampling.weightedHashSample(scored, id, col("dsir_ppm"), targetRate)
  }
}
