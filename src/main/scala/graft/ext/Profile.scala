package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiler: per column — row count, non-null count,
  * exact distinct count, min/max (as canonical strings so mixed-type
  * columns stack into one long-format result). The data-quality
  * snapshot a pipeline takes before/after each load (the reference
  * reconciles bare row counts, sync.py:90; this is the same idea with
  * per-column depth).
  *
  * All columns profile in ONE aggregation over one scan: Spark plans
  * the multiple count(DISTINCT) via a single Expand (rows × columns),
  * so the input is read once regardless of how many columns are
  * profiled. Exact distinct is the oracle-checkable default; at 100 TB
  * swap `approxDistinct = true` to replace the Expand with one
  * HLL-sketch pass (no per-column row multiplication).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], approxDistinct: Boolean = false): DataFrame = {
    def nd(c: String): Column =
      if (approxDistinct) approx_count_distinct(col(c)) else countDistinct(col(c))
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        nd(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = cols.map { c =>
      struct(
        lit(c).as("col_name"), col("__n").as("n_rows"), col(s"__nn_$c").as("n_nonnull"),
        col(s"__nd_$c").as("n_distinct"), col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }

  /** Snapshot drift: the per-column profile of `base` joined against
    * the profile of `cur` — the before/after check a pipeline runs
    * around every load (the reference reconciles one bare row count,
    * sync.py:90; this is that idea per column). Each side is one
    * single-scan aggregate; the join is |cols| rows. Full outer so a
    * column added or dropped between snapshots still surfaces.
    */
  def drift(base: DataFrame, cur: DataFrame, cols: Seq[String]): DataFrame = {
    def side(df: DataFrame, tag: String) = profile(df, cols.filter(df.columns.contains))
      .select(col("col_name"), col("n_rows").as(s"n_rows_$tag"),
        col("n_nonnull").as(s"n_nonnull_$tag"), col("n_distinct").as(s"n_distinct_$tag"),
        col("min_val").as(s"min_$tag"), col("max_val").as(s"max_$tag"))
    side(base, "base").join(side(cur, "cur"), Seq("col_name"), "full_outer")
      .withColumn("rows_delta", coalesce(col("n_rows_cur"), lit(0L)) -
        coalesce(col("n_rows_base"), lit(0L)))
      .withColumn("distinct_delta", coalesce(col("n_distinct_cur"), lit(0L)) -
        coalesce(col("n_distinct_base"), lit(0L)))
      .withColumn("range_changed",
        !(col("min_base") <=> col("min_cur")) || !(col("max_base") <=> col("max_cur")))
  }

  /** All-pairs Pearson correlation of numeric columns in ONE pass over
    * the input: the aggregate collects n plus decimal Σx, Σx², and Σxy
    * for every pair, then the textbook formula
    * (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²)) runs on
    * the 1-row result. Built-in `corr` streams double accumulators
    * whose value depends on reduction order — fine for analytics,
    * useless against a cross-engine oracle. Here the per-row products
    * are IEEE doubles (rounded once, identically everywhere) and the
    * SUMS are exact decimal, so the final doubles are reproducible
    * across engines — order-independent, not infinitely precise. All
    * inputs must be non-null; nulls would need pairwise n's, turning
    * O(c) sums into O(c²) counts.
    *
    * A constant column has zero variance ⇒ denominator 0 ⇒ corr is
    * undefined; those pairs yield null rather than a divide error
    * under ANSI mode.
    *
    * Output is long format: (col_a, col_b, corr) for a < b.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(cols.size >= 2, "corrMatrix: need at least two columns")
    val dec = DecimalType(38, 10)
    def s1(c: String) = sum(col(c).cast("double").cast(dec)).cast("double").as(s"__s_$c")
    def s2(c: String) = sum((col(c).cast("double") * col(c).cast("double")).cast(dec))
      .cast("double").as(s"__ss_$c")
    def sxy(a: String, b: String) =
      sum((col(a).cast("double") * col(b).cast("double")).cast(dec))
        .cast("double").as(s"__sp_${a}__$b")
    val pairs = for { i <- cols.indices; j <- i + 1 until cols.size } yield (cols(i), cols(j))
    val aggs = cols.map(s1) ++ cols.map(s2) ++ pairs.map { case (a, b) => sxy(a, b) }
    // The O(c²) decimal power sums are the cost (exact DECIMAL(38,10)
    // accumulation allocates per add) and a small-file scan gives the
    // aggregate only as many tasks as parquet splits (measured on q87:
    // one 3-task CPU-bound stage on 32 cores). Project the columns to
    // doubles FIRST (narrow rows — the cast the sums apply anyway) and
    // spread them across the cluster; decimal sums are order-independent
    // so the result is bit-identical.
    val spread = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val one = spread.agg(count(lit(1)).cast("double").as("__n"), aggs: _*)
    val stacked = pairs.map { case (a, b) =>
      val n = col("__n")
      val num = n * col(s"__sp_${a}__$b") - col(s"__s_$a") * col(s"__s_$b")
      val den = sqrt(n * col(s"__ss_$a") - col(s"__s_$a") * col(s"__s_$a")) *
        sqrt(n * col(s"__ss_$b") - col(s"__s_$b") * col(s"__s_$b"))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        when(den > 0, num / den).otherwise(lit(null).cast("double")).as("corr"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }

  /** Per-group distribution-shape moments: n, mean, population
    * variance, skewness, and excess kurtosis, all derived from raw
    * power sums (Σx, Σx², Σx³, Σx⁴) collected in ONE pass with exact
    * DECIMAL(38,10) accumulation — the same reproducibility contract as
    * [[corrMatrix]]: per-row powers are IEEE doubles (rounded once,
    * identically on every engine), the sums are order-independent
    * decimals, and the closing formulas are a FIXED sequence of double
    * operations, so an external oracle replaying the identical op
    * order reproduces the result bit-for-bit.
    *
    * Central moments from raw sums (μ = S1/n):
    *   m2 = S2 − μ·S1
    *   m3 = S3 − 3μ·S2 + 2μ²·S1
    *   m4 = S4 − 4μ·S3 + 6μ²·S2 − 3μ³·S1
    * skewness = (m3/n) / ((m2/n)·√(m2/n))   (population g1; v^1.5 is
    * written v·√v — `pow` is not correctly rounded in IEEE 754, sqrt
    * and multiply are), kurtosis = (m4/n)/((m2/n)²) − 3 (excess).
    * Zero-variance groups yield null skewness/kurtosis rather than an
    * ANSI divide error. Null values are excluded from BOTH the count
    * and the sums. Domain bound: |x| must stay below ~10⁷ or x⁴
    * exceeds DECIMAL(38,10) — rescale wider-domain columns first.
    *
    * The shape screen for training-data value columns: heavy tails and
    * asymmetry are exactly what mean/stddev profiling misses.
    *
    * Scale: one partial-aggregable pass, output is one row per group.
    */
  def moments(df: DataFrame, groups: Seq[String], value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 10)
    val x = value.cast("double")
    // count(x), not count(*): the power sums skip nulls, so n must too
    // or every null-bearing group gets silently wrong moments
    val agged = df.groupBy(groups.map(col): _*).agg(
      count(x).cast("double").as("__n"),
      sum(x.cast(dec)).cast("double").as("__s1"),
      sum((x * x).cast(dec)).cast("double").as("__s2"),
      sum((x * x * x).cast(dec)).cast("double").as("__s3"),
      sum((x * x * x * x).cast(dec)).cast("double").as("__s4"))
    val n = col("__n")
    val mu = col("__s1") / n
    val m2 = col("__s2") - mu * col("__s1")
    val m3 = col("__s3") - lit(3.0) * mu * col("__s2") + lit(2.0) * mu * mu * col("__s1")
    val m4 = col("__s4") - lit(4.0) * mu * col("__s3") + lit(6.0) * mu * mu * col("__s2") -
      lit(3.0) * mu * mu * mu * col("__s1")
    val v = m2 / n
    agged.select(
      groups.map(col) ++ Seq(
        n.cast("long").as("n"),
        mu.as("mean"),
        v.as("variance"),
        when(m2 > 0, (m3 / n) / (v * sqrt(v))).otherwise(lit(null).cast("double"))
          .as("skewness"),
        when(m2 > 0, (m4 / n) / (v * v) - lit(3.0)).otherwise(lit(null).cast("double"))
          .as("kurtosis")): _*)
  }

  /** Grouped simple linear regression (OLS of y on x): per group —
    * observation count, slope, intercept, and R². The "does this
    * numeric drive that one, per segment" question (feature screening,
    * trend fits) answered without leaving the engine.
    *
    * One aggregation over one scan, same shape as [[moments]]: the
    * five power/cross sums accumulate as exact DECIMAL(38,10) (double
    * summation is order-dependent across partitionings; the per-row
    * products are plain IEEE doubles, deterministic everywhere), and
    * the closed-form OLS algebra runs on the resulting doubles. Rows
    * where either side is null are excluded (count(x*y) semantics).
    * Degenerate groups are null, not garbage: slope/intercept null
    * when x is constant (n·Sxx = Sx²), R² additionally null when y is
    * constant. Scale posture: one keyed exchange of 6 numbers per
    * group — group count, not row count, bounds the shuffle.
    */
  def groupedOls(
      df: DataFrame,
      groups: Seq[String],
      xCol: Column,
      yCol: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 10)
    val x = when(yCol.isNotNull, xCol.cast("double"))
    val y = when(xCol.isNotNull, yCol.cast("double"))
    val agged = df.groupBy(groups.map(col): _*).agg(
      count(x * y).cast("double").as("__n"),
      sum(x.cast(dec)).cast("double").as("__sx"),
      sum(y.cast(dec)).cast("double").as("__sy"),
      sum((x * x).cast(dec)).cast("double").as("__sxx"),
      sum((x * y).cast(dec)).cast("double").as("__sxy"),
      sum((y * y).cast(dec)).cast("double").as("__syy"))
    val n = col("__n")
    val covn = n * col("__sxy") - col("__sx") * col("__sy")
    val varxn = n * col("__sxx") - col("__sx") * col("__sx")
    val varyn = n * col("__syy") - col("__sy") * col("__sy")
    val slope = covn / varxn
    agged.select(
      groups.map(col) ++ Seq(
        n.cast("long").as("n_obs"),
        when(varxn > 0, slope).as("slope"),
        when(varxn > 0, (col("__sy") - slope * col("__sx")) / n).as("intercept"),
        when(varxn > 0 && varyn > 0, (covn * covn) / (varxn * varyn)).as("r2")): _*)
  }

  /** Welch's two-sample t-test between two slices of one metric column
    * — the unequal-variance A/B test (never the pooled Student form:
    * real slices never share a variance). One row out: per-slice
    * count/mean/sample-variance, the t statistic, and the
    * Welch–Satterthwaite degrees of freedom.
    *
    * [[groupedOls]] discipline throughout: the only order-dependent
    * step (the power sums) accumulates as exact DECIMAL(38,10) and is
    * cast to double once; every downstream formula — mean = Sx/n,
    * s² = (n·Sxx − Sx²)/(n·(n−1)), se² = s²A/nA + s²B/nB,
    * t = (mA − mB)/√se², df = se⁴/((s²A/nA)²/(nA−1) + (s²B/nB)²/(nB−1))
    * — is a fixed shape of IEEE double ops the oracle reproduces
    * verbatim. Degenerate inputs are null, not garbage: variance null
    * below 2 observations, t/df null unless both slices have ≥ 2 and
    * se² > 0 (two constant slices have a mean difference but no
    * sampling error to scale it by). Null metric rows are excluded.
    *
    * Scale: ONE scan, one conditional aggregate — six numbers cross
    * the wire regardless of row count; no join, no window.
    */
  def welchTTest(
      df: DataFrame,
      sliceCol: Column,
      value: Column,
      a: String,
      b: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 10)
    val x = value.cast("double")
    def side(tag: String, suffix: String): Seq[Column] = {
      val v = when(sliceCol === tag, x)
      Seq(
        count(v).cast("double").as(s"__n$suffix"),
        sum(v.cast(dec)).cast("double").as(s"__sx$suffix"),
        sum((v * v).cast(dec)).cast("double").as(s"__sxx$suffix"))
    }
    val sums = side(a, "a") ++ side(b, "b")
    val agged = df.filter(x.isNotNull && sliceCol.isin(a, b))
      .agg(sums.head, sums.tail: _*)
    def stats(s: String): (Column, Column, Column) = {
      val (n, sx, sxx) = (col(s"__n$s"), col(s"__sx$s"), col(s"__sxx$s"))
      val varr = (n * sxx - sx * sx) / (n * (n - lit(1.0)))
      (n, sx / n, when(n >= 2, varr))
    }
    val (na, ma, va) = stats("a")
    val (nb, mb, vb) = stats("b")
    val se2 = va / na + vb / nb
    val dfDen = (va / na) * (va / na) / (na - lit(1.0)) +
      (vb / nb) * (vb / nb) / (nb - lit(1.0))
    agged.select(
      na.cast("long").as("n_a"),
      nb.cast("long").as("n_b"),
      when(na >= 1, ma).as("mean_a"),
      when(nb >= 1, mb).as("mean_b"),
      va.as("var_a"),
      vb.as("var_b"),
      when(na >= 2 && nb >= 2 && se2 > 0, (ma - mb) / sqrt(se2)).as("t_stat"),
      when(na >= 2 && nb >= 2 && se2 > 0 && dfDen > 0, se2 * se2 / dfDen).as("welch_df"))
  }

  /** Chi-square test of independence between two categorical columns,
    * one row out: observation count, contingency dimensions, the χ²
    * statistic, and Cramér's V = √(χ²/(n·min(r-1, c-1))) — the
    * bounded-[0,1] effect size that makes χ² comparable across
    * feature pairs (the categorical twin of [[corrMatrix]], for
    * feature screening over segment/label columns).
    *
    * Computed as χ² = n·Σ o²/(rᵢ·cⱼ) − n — algebraically identical to
    * Σ(o−e)²/e over ALL r×c cells but summing only OBSERVED cells: a
    * zero cell's o²/(rᵢcⱼ) term is zero, where the (o−e)²/e form would
    * need the full cross product of categories materialized (the naive
    * observed-cells-only sum silently DROPS every zero cell's e
    * contribution and understates χ²). Observed counts are exact longs;
    * the per-cell terms evaluate once in IEEE doubles (identical on any
    * engine), and the term SUM — the only order-dependent step —
    * accumulates via DECIMAL(38,10), the repo's reproducible-sum
    * contract. √ is correctly rounded in IEEE 754, so even the effect
    * size is hash-stable. Null rows on either column are excluded.
    *
    * Scale: one (r, c) cell aggregate over one scan — cell count, not
    * row count, bounds every downstream relation; the row/column
    * marginals join back to cells broadcast-sized.
    */
  def chiSquare(df: DataFrame, rCol: Column, cCol: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 10)
    val o = df.filter(rCol.isNotNull && cCol.isNotNull)
      .groupBy(rCol.as("__r"), cCol.as("__c")).agg(count(lit(1)).as("__o"))
    val tot = o.agg(
      sum(col("__o")).cast("double").as("__n"),
      countDistinct(col("__r")).as("__nr"),
      countDistinct(col("__c")).as("__nc"))
    val rt = o.groupBy(col("__r")).agg(sum(col("__o")).cast("double").as("__rsum"))
    val ct = o.groupBy(col("__c")).agg(sum(col("__o")).cast("double").as("__csum"))
    val term = col("__o").cast("double") * col("__o").cast("double") /
      (col("__rsum") * col("__csum"))
    val chi2 = o.join(rt, "__r").join(ct, "__c")
      .agg(sum(term.cast(dec)).cast("double").as("__s"))
      .crossJoin(tot)
      .select((col("__n") * col("__s") - col("__n")).as("__chi2"))
    tot.crossJoin(chi2).select(
      col("__n").cast("long").as("n_obs"),
      col("__nr").as("n_rows"),
      col("__nc").as("n_cols"),
      col("__chi2").as("chi2"),
      when(least(col("__nr"), col("__nc")) > 1L,
        sqrt(col("__chi2") /
          (col("__n") * least(col("__nr") - 1L, col("__nc") - 1L).cast("double"))))
        .as("cramers_v"))
  }

  /** Gini coefficient of a non-negative value distribution per group —
    * the inequality/concentration diagnostic: 0 = perfectly even, →1 =
    * one row holds everything. For a data pipeline this is the skew
    * meter (token-frequency concentration, per-key row concentration,
    * revenue concentration) that tells you whether a key space needs
    * salting BEFORE the skewed shuffle, with a bounded score instead
    * of an eyeballed top-k list.
    *
    * Rank formulation: G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n with x sorted
    * ascending and i the 1-based rank. Ties in x make individual ranks
    * nondeterministic, but the statistic is tie-invariant: permuting
    * equal x values across their rank run changes no term of Σ i·xᵢ
    * (x·Σi is fixed), so the result is deterministic and
    * oracle-exact. Both Σ accumulate in DECIMAL(38,10), the repo's
    * reproducible-sum contract; the final expression is a fixed IEEE
    * tree. Null and negative values are excluded (Gini is defined on
    * non-negative support); a group whose sum is zero yields null.
    *
    * Scale: one keyed sort (the rank window) + one aggregate per
    * group — the same shuffle any grouped percentile pays.
    */
  def giniConcentration(df: DataFrame, grp: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 10)
    val v = value.cast("double")
    val rows = df.filter(v.isNotNull && v >= 0 && grp.isNotNull)
      .select(grp.as("grp"), v.as("__x"))
    val i = row_number().over(Window.partitionBy(col("grp")).orderBy(col("__x"))).cast("double")
    rows
      .select(col("grp"), col("__x"), (i * col("__x")).as("__ix"))
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x").cast(dec)).cast("double").as("__sx"),
        sum(col("__ix").cast(dec)).cast("double").as("__six"))
      .select(col("grp"), col("n"),
        when(col("__sx") > 0,
          lit(2.0) * col("__six") / (col("n").cast("double") * col("__sx")) -
            (col("n").cast("double") + lit(1.0)) / col("n").cast("double"))
          .as("gini"))
  }

  /** Exact weighted median per group: the smallest value whose
    * cumulative weight reaches half the group's total weight — the
    * robust center estimate when rows carry unequal mass (tokens per
    * doc, quantity per line), where the unweighted median silently
    * answers a different question.
    *
    * The naive plan — one cumulative-weight window per group — puts a
    * group's ENTIRE row set through one reducer's sort, so a
    * 3-group/10⁹-row input runs on 3 cores (measured 3.7× at 10×
    * here). Instead: two-phase distributed selection. Phase 1 buckets
    * each value into `nBuckets` equi-width cells of its group's
    * [min, max] (a scan-stage expression behind one small join) and
    * aggregates per-(group, bucket) weight — map-side partial, so the
    * shuffle carries at most nBuckets rows per group. A tiny
    * cumulative window over the BUCKET relation finds the single
    * bucket the half-threshold falls in and the cumulative weight
    * before it. Phase 2 sorts only THAT bucket's rows (≈ n/nBuckets
    * of the group) with the carry folded in. Per-group serial work
    * drops from O(n) to O(nBuckets + n/nBuckets); every other stage
    * is an ordinary parallel aggregate.
    *
    * Exactness: bucket assignment is a fixed IEEE expression (same on
    * every engine, ties share a bucket since they share a value); all
    * weight accumulation — bucket sums, the bucket cumulative, the
    * in-bucket cumulative, the total — runs in DECIMAL(38,10) and the
    * threshold test compares decimals exactly (2·cw >= tw), so the
    * boundary row never flips on float rounding. Whether a tied value
    * run crosses the threshold depends only on the run's total
    * weight, so min() over qualifying rows is deterministic. Rows
    * with null value/weight or weight <= 0 are excluded; a group
    * whose domain is degenerate (min = max) resolves in bucket 0.
    */
  def weightedMedian(
      df: DataFrame,
      grp: Column,
      value: Column,
      weight: Column,
      nBuckets: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    require(nBuckets >= 2 && nBuckets <= 1000000,
      s"weightedMedian: nBuckets in [2, 1000000] required, got $nBuckets")
    val dec = DecimalType(38, 10)
    val v = value.cast("double")
    val w = weight.cast("double")
    val rows = df.filter(v.isNotNull && w.isNotNull && w > 0 && grp.isNotNull)
      .select(grp.as("grp"), v.as("__x"), w.cast(dec).as("__w"))
    val bounds = rows.groupBy(col("grp")).agg(
      min(col("__x")).as("__lo"), max(col("__x")).as("__hi"),
      sum(col("__w")).as("__tw"))
    val width = (col("__hi") - col("__lo")) / lit(nBuckets.toDouble)
    val bucket = when(col("__hi") > col("__lo"),
      least(floor((col("__x") - col("__lo")) / width), lit(nBuckets - 1L)))
      .otherwise(lit(0L)).cast("int")
    val b = rows.join(bounds, Seq("grp"))
      .select(col("grp"), col("__x"), col("__w"), col("__tw"), bucket.as("__b"))
    val bw = b.groupBy(col("grp"), col("__b"))
      .agg(sum(col("__w")).as("__bw"))
    val cumB = sum(col("__bw")).over(Window.partitionBy(col("grp")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val bucketCum = bw.select(col("grp"), col("__b"), col("__bw"), cumB.as("__cum"))
      .join(bounds.select(col("grp"), col("__tw")), Seq("grp"))
    // min_by keys on __b, which is unique per (grp, bucket) row, so the
    // carry pick is deterministic — and bucketCum evaluates once (a
    // join-back would re-run its window branch)
    val target = bucketCum.filter(col("__cum") * 2 >= col("__tw"))
      .groupBy(col("grp")).agg(
        min(col("__b")).as("__b"),
        min_by(col("__cum") - col("__bw"), col("__b")).as("__carry"))
    val cand = b.join(target, Seq("grp", "__b"))
    val cw = sum(col("__w")).over(Window.partitionBy(col("grp")).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cand
      .select(col("grp"), col("__x"), col("__tw"), (col("__carry") + cw).as("__cw"))
      .filter(col("__cw") * 2 >= col("__tw"))
      .groupBy(col("grp"))
      .agg(min(col("__x")).as("wmedian"))
  }

  /** Functional-dependency profile: for each candidate (determinant →
    * dependent) column pair, the number of determinant keys, how many
    * of them map to MORE than one distinct dependent value (the
    * violations), and the kept fraction `strength` = 1 − violations /
    * keys. strength = 1.0 certifies the dependency holds exactly —
    * the schema-inference / data-quality probe that catches a
    * supposedly-functional mapping (order → status, id → email)
    * drifting into a one-to-many before a downstream join fans out.
    *
    * Scale: one (det, countDistinct dep) aggregate per pair — each a
    * single keyed shuffle whose width is the pair's distinct-key
    * count, never the row count. Pairs are independent aggregates over
    * the same scan (Spark schedules them as parallel stages); profile
    * a bounded pair list, not the n² column cross product.
    */
  def fdProfile(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "fdProfile: at least one (det, dep) pair required")
    pairs.map { case (det, dep) =>
      df.filter(col(det).isNotNull && col(dep).isNotNull)
        .groupBy(col(det).as("__det"))
        .agg(countDistinct(col(dep)).as("__nd"))
        .agg(
          count(lit(1)).as("n_keys"),
          coalesce(sum(when(col("__nd") > 1, 1L).otherwise(0L)), lit(0L)).as("n_violations"))
        .select(
          lit(s"$det->$dep").as("fd"),
          col("n_keys"),
          col("n_violations"),
          when(col("n_keys") > 0,
            lit(1.0) - col("n_violations").cast("double") / col("n_keys").cast("double"))
            .as("strength"))
    }.reduce(_ unionByName _)
  }

  /** Cohen's kappa between two categorical label columns — observed
    * agreement corrected for the agreement two independent raters
    * would hit by chance: κ = (p_o − p_e)/(1 − p_e), with p_o the
    * exact-match fraction and p_e = Σ_k (r_k/N)(c_k/N) over the union
    * category space. THE inter-annotator / model-vs-gold agreement
    * number for labeling pipelines (raw accuracy flatters any rater
    * pair on a skewed label distribution; κ doesn't).
    *
    * Exactness: all counts are exact longs; Σ r_k·c_k accumulates in
    * DECIMAL(38,0) (never a float product), and floating point enters
    * only in the final fixed expression tree — hash-stable on any
    * engine. Rows with a null on either side are excluded; κ is null
    * when p_e = 1 (a single category on both sides — agreement is
    * vacuous and the correction degenerate).
    *
    * Scale: two marginal aggregates + one agreement count, each a
    * keyed shuffle bounded by category cardinality; the join of the
    * marginals is category × category, broadcast-sized.
    */
  def agreementKappa(df: DataFrame, r1: Column, r2: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val rows = df.filter(r1.isNotNull && r2.isNotNull)
      .select(r1.as("__a"), r2.as("__b"))
    val base = rows.agg(
      count(lit(1)).as("__nn"),
      sum(when(col("__a") === col("__b"), 1L).otherwise(0L)).as("__agree"))
    val ra = rows.groupBy(col("__a").as("__k")).agg(count(lit(1)).as("__r"))
    val cb = rows.groupBy(col("__b").as("__k")).agg(count(lit(1)).as("__c"))
    val pe = ra.join(cb, Seq("__k"), "full_outer")
      .agg(
        sum(coalesce(col("__r"), lit(0L)).cast(dec) *
            coalesce(col("__c"), lit(0L)).cast(dec)).as("__rc"),
        count(lit(1)).as("__ncat"))
    // n_obs = 0 leaves po/pe null rather than tripping ANSI
    // divide-by-zero on the empty-input row an aggregate always emits
    base.crossJoin(pe).select(
      col("__nn").as("n_obs"),
      col("__ncat").as("n_categories"),
      when(col("__nn") > 0,
        col("__agree").cast("double") / col("__nn").cast("double")).as("po"),
      when(col("__nn") > 0,
        col("__rc").cast("double") /
          (col("__nn").cast("double") * col("__nn").cast("double"))).as("pe"))
      .select(col("n_obs"), col("n_categories"), col("po"), col("pe"),
        when(col("pe") < 1.0, (col("po") - col("pe")) / (lit(1.0) - col("pe")))
          .as("kappa"))
  }

  /** Benford first-significant-digit profile over values >= 1: per
    * digit 1-9 the observed count, observed fraction, the Benford
    * expectation log10(1+1/d), and the signed deviation — the
    * fabricated-data / broken-feed screen for amount-like columns
    * (naturally-occurring multi-magnitude data follows Benford;
    * uniform generators and hand-typed numbers don't).
    *
    * The first digit comes from the INTEGER part via a long→string
    * cast — deliberately: every engine formats integers as plain
    * digits, where double→string formatting (scientific-notation
    * cutoffs) and 10^floor(log10 x) normalization (libm last-ulp at
    * exact powers) are engine-dependent. The expectations are nine
    * shared double literals, not a runtime log. Restricting to
    * x >= 1 is the operator's contract, not a shortcut — Benford
    * screening applies to magnitude-spanning amounts, and the
    * sub-1 rows are reported nowhere else than `n_skipped`-style
    * checks a profiler ([[profile]]) already covers.
    *
    * Scale: one scan-stage digit expression + a 9-row aggregate; the
    * 1-row total rides a broadcast.
    */
  def benfordProfile(df: DataFrame, value: Column): DataFrame = {
    val v = value.cast("double")
    val fsd = substring(floor(v).cast("long").cast("string"), 1, 1).cast("int")
    val d = df.filter(v.isNotNull && v >= 1).select(fsd.as("fsd"))
    val tot = d.agg(count(lit(1)).as("__t"))
    val expected = (1 to 9).map(i => (i, math.log10(1.0 + 1.0 / i)))
      .map { case (i, e) => when(col("fsd") === i, lit(e)) }
      .reduceRight(_ otherwise _)
    d.crossJoin(broadcast(tot))
      .groupBy(col("fsd"))
      .agg(count(lit(1)).as("n"), max(col("__t")).as("__t"))
      .select(col("fsd"), col("n"),
        (col("n").cast("double") / col("__t").cast("double")).as("frac"),
        expected.as("expected"))
      .withColumn("dev", col("frac") - col("expected"))
  }

  /** 2-D Pareto frontier (skyline): the distinct (x, y) points not
    * dominated by any other — no point with x' <= x and y' >= y and
    * at least one strict (x minimized, y maximized; flip signs for
    * other orientations). The multi-objective "best tradeoffs"
    * operator: cost-vs-quality corpus pruning, price-vs-volume
    * supplier screens.
    *
    * Plan: per-x max(y) first (dominated same-x points die in a keyed
    * aggregate), then one ascending pass over the DISTINCT-x relation
    * keeping points whose y exceeds the running max so far — the
    * classic sort-scan skyline, exact for 2-D. The only serial state
    * is the distinct-x relation; with continuous x at corpus scale,
    * quantize x first (the [[equiWidthHistogram]] bin) or accept the
    * distinct-x bound. Ties: equal-x keeps max y; equal (x, y)
    * collapses to one output row. Null x/y rows are excluded.
    */
  def paretoFront(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val x = xCol.cast("double")
    val gx = df.filter(x.isNotNull && yCol.isNotNull)
      .groupBy(x.as("x")).agg(max(yCol).as("__ymax"))
    val prevMax = max(col("__ymax")).over(Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1))
    gx.select(col("x"), col("__ymax"), prevMax.as("__prev"))
      .filter(col("__prev").isNull || col("__ymax") > col("__prev"))
      .select(col("x"), col("__ymax").as("y"))
  }

  /** Equi-WIDTH histogram: `nBins` equal value-range bins over the
    * global [min, max], per bin the row count and exact-decimal sum.
    * The distribution-shape complement of [[quantileBins]] (equi-DEPTH
    * = equal counts, data-dependent edges; equi-width = fixed edges,
    * data-dependent counts — the form monitoring dashboards plot).
    *
    * Bin of x is ⌊(x-lo)/((hi-lo)/nBins)⌋ clamped to nBins-1 (the max
    * value closes the last bin, matching width_bucket convention); a
    * degenerate domain (hi = lo, including a single-row input) puts
    * everything in bin 0. Nulls are excluded. The division runs in IEEE
    * doubles — identical on any engine — so bin assignment, unlike a
    * libm log-scale histogram, is hash-stable.
    *
    * Scale: the [min, max] probe is a 1-row aggregate broadcast back
    * via crossJoin (never a driver collect); binning is a scan-stage
    * expression and the bin aggregate carries nBins rows.
    */
  def equiWidthHistogram(df: DataFrame, value: Column, nBins: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(nBins >= 1 && nBins <= 100000,
      s"equiWidthHistogram: nBins in [1, 100000] required, got $nBins")
    val dec = DecimalType(38, 10)
    val v = value.cast("double")
    val rows = df.filter(v.isNotNull).select(v.as("__v"))
    val bounds = rows.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    val width = (col("__hi") - col("__lo")) / lit(nBins.toDouble)
    val bin = when(col("__hi") > col("__lo"),
      least(floor((col("__v") - col("__lo")) / width), lit(nBins - 1L)))
      .otherwise(lit(0L))
    rows.crossJoin(bounds)
      .select(bin.cast("int").as("bin"), col("__v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__v").cast(dec)).cast("double").as("sum_value"))
  }

  /** EXACT join-output cardinality per key, computed WITHOUT running
    * the join: |A⋈B| on key k is n_A(k)·n_B(k), so two per-key count
    * aggregates and a (distinct-key)-sized inner join give every key's
    * output contribution. The pre-flight check before a suspicious
    * join at 100 TB — a hot key about to produce 10¹² rows shows up
    * here as one number, at the cost of two count aggregates instead
    * of the explosion itself. Feed the hot keys this reveals into
    * [[Skew.saltedJoin]] or an AQE-covered plan.
    *
    * Output: (key, left_rows, right_rows, out_rows), one row per key
    * present on BOTH sides (keys on one side only contribute 0 to an
    * inner join). Aggregate downstream for totals/max.
    */
  def joinCardinality(
      left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // out_rows is DECIMAL(38,0), not long×long: a single key with
    // >3×10⁹ rows per side would silently wrap a long product — and a
    // key that hot is precisely what this operator exists to expose
    val dec = DecimalType(38, 0)
    left.groupBy(leftKey.as("key")).agg(count(lit(1)).as("left_rows"))
      .join(right.groupBy(rightKey.as("key")).agg(count(lit(1)).as("right_rows")), Seq("key"))
      .select(col("key"), col("left_rows"), col("right_rows"),
        (col("left_rows").cast(dec) * col("right_rows").cast(dec)).as("out_rows"))
  }

  /** Median/MAD factor: 1/Φ⁻¹(3/4), makes MAD a consistent estimator
    * of σ for normal data. Written as the conventional 4-decimal
    * literal so every engine uses the identical double.
    */
  val MadSigma = 1.4826

  /** Robust per-group outlier detection: flag rows whose
    * |x − median| / (1.4826·MAD) exceeds `k`. Median/MAD instead of
    * mean/stddev because training-data value columns are exactly the
    * distributions that break moment-based z-scores — a single 10^9
    * outlier inflates σ until nothing else is an outlier. Exact
    * `percentile` (not the sketch) so the oracle reproduces the cut
    * bit-for-bit; at unbounded-domain 100 TB scale, swap
    * `approx_percentile` in and the contract becomes rows-only.
    *
    * Plan: two tiny per-group aggregates (|groups| rows each, both
    * broadcast back) + one scan-stage filter — the input shuffles only
    * for the percentile aggregates, never for the flagging pass.
    * Groups whose MAD is 0 (over half the values identical) flag
    * nothing — a degenerate spread gives no robust scale to judge by.
    */
  def robustOutliers(
      df: DataFrame, groups: Seq[String], value: Column, k: Double): DataFrame = {
    val gcols = groups.map(col)
    val v = value.cast("double")
    val med = df.groupBy(gcols: _*).agg(percentile(v, lit(0.5)).as("__med"))
    val dev = rejoinStats(df, med, groups)
    val mad = dev.groupBy(gcols: _*)
      .agg(percentile(abs(v - col("__med")), lit(0.5)).as("__mad"))
    rejoinStats(dev, mad, groups)
      .filter(col("__mad") > 0 &&
        abs(v - col("__med")) / (col("__mad") * MadSigma) > k)
      .withColumn("robust_z", (v - col("__med")) / (col("__mad") * MadSigma))
      .drop("__med", "__mad")
  }

  /** Per-group z-score normalization (feature scaling for training
    * mixes): z = (x − mean)/std with exact-decimal Σx and Σx² so the
    * doubles are reproducible across engines, sample std
    * (n−1 denominator) matching the q60 stats convention. Zero-variance
    * groups yield null z rather than a divide error. One tiny per-group
    * aggregate broadcast back — the input itself is never shuffled.
    */
  def zscoreNormalize(
      df: DataFrame, groups: Seq[String], value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 10)
    val v = value.cast("double")
    // count(v), not count(*): the sums skip nulls, n must too (the
    // moments contract); null-group rows rejoin null-safely
    val stats = df.groupBy(groups.map(col): _*).agg(
      count(v).cast("double").as("__n"),
      sum(v.cast(dec)).cast("double").as("__s"),
      sum((v * v).cast(dec)).cast("double").as("__ss"))
    rejoinStats(df, stats, groups)
      .withColumn("__mean", col("__s") / col("__n"))
      .withColumn("__var",
        (col("__ss") - col("__s") * col("__s") / col("__n")) / (col("__n") - 1.0))
      .withColumn("z",
        when(col("__var") > 0, (v - col("__mean")) / sqrt(col("__var")))
          .otherwise(lit(null).cast("double")))
      .drop("__n", "__s", "__ss", "__mean", "__var")
  }

  /** Join-key overlap diagnostic: how much of each side's key space —
    * and row volume — actually meets the other side. One row out:
    * distinct keys on each side and in the intersection, plus matched/
    * unmatched ROW counts per side (a key diagnostic alone misleads
    * when one hot key carries half the rows). The companion to
    * [[joinCardinality]]: that one asks "how big is the join", this
    * one asks "how much of my data joins at all" — the two pre-flight
    * questions before any 100 TB join.
    *
    * Cost: one per-key count aggregate per side (cardinality-bounded)
    * + a full outer join of the two key relations. The inputs
    * themselves never shuffle.
    */
  def keyOverlap(
      left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column): DataFrame = {
    val la = left.groupBy(leftKey.as("key")).agg(count(lit(1)).as("__ln"))
    val ra = right.groupBy(rightKey.as("key")).agg(count(lit(1)).as("__rn"))
    la.join(ra, Seq("key"), "full_outer")
      .agg(
        count(col("__ln")).as("n_keys_left"),
        count(col("__rn")).as("n_keys_right"),
        count(when(col("__ln").isNotNull && col("__rn").isNotNull, 1)).as("n_keys_both"),
        coalesce(sum(when(col("__rn").isNotNull, col("__ln"))), lit(0L))
          .as("rows_left_matched"),
        coalesce(sum(when(col("__rn").isNull, col("__ln"))), lit(0L))
          .as("rows_left_unmatched"),
        coalesce(sum(when(col("__ln").isNotNull, col("__rn"))), lit(0L))
          .as("rows_right_matched"),
        coalesce(sum(when(col("__ln").isNull, col("__rn"))), lit(0L))
          .as("rows_right_unmatched"))
  }

  /** Join per-group stats back onto the input NULL-SAFELY. groupBy
    * emits a stats row for the null group, but a plain column-name
    * equi-join can never rejoin it — so a row-preserving operator
    * would silently DROP every null-group input row, and a flagging
    * operator would never judge them. Every stats-rejoin in this
    * module goes through here so the null-group contract can't drift
    * between operators.
    */
  private def rejoinStats(
      df: DataFrame, stats: DataFrame, groups: Seq[String]): DataFrame = {
    val renamed = groups.foldLeft(stats)(
      (acc, g) => acc.withColumnRenamed(g, s"__g_$g"))
    val cond = groups.map(g => col(g) <=> col(s"__g_$g")).reduce(_ && _)
    df.join(broadcast(renamed), cond).drop(groups.map(g => s"__g_$g"): _*)
  }

  /** Percentile winsorization: clamp each value into [p_lo, p_hi] of
    * its GROUP — the standard outlier treatment when rows must survive
    * (clipping, not dropping; [[robustOutliers]] is the flag-and-drop
    * twin). Exact `percentile` with the q83-verified DuckDB
    * quantile_cont interpolation parity; on an unbounded-domain 100 TB
    * column swap `approx_percentile` in and the contract becomes
    * rows-only. Null values stay null (Spark's greatest/least SKIP
    * nulls, so the guard is explicit).
    *
    * Plan: one per-group exact-percentile aggregate (|groups| rows,
    * broadcast back) + a scan-stage clamp — the data itself shuffles
    * only for the aggregate.
    */
  def winsorize(
      df: DataFrame, groups: Seq[String], value: Column,
      lo: Double, hi: Double): DataFrame = {
    require(0.0 <= lo && lo < hi && hi <= 1.0,
      s"winsorize: need 0 <= lo < hi <= 1, got ($lo, $hi)")
    val v = value.cast("double")
    val qs = df.groupBy(groups.map(col): _*).agg(
      percentile(v, lit(lo)).as("__plo"),
      percentile(v, lit(hi)).as("__phi"))
    rejoinStats(df, qs, groups)
      .withColumn("winsorized",
        when(v.isNull, lit(null).cast("double"))
          .otherwise(least(greatest(v, col("__plo")), col("__phi"))))
      .drop("__plo", "__phi")
  }

  /** Exact equal-frequency percentile edges of `v` as a 1-row aggregate
    * (`__edges` array column) — the shared edge rule of [[quantileBins]]
    * and [[binDrift]], defined once so the two can't diverge.
    */
  private def percentileEdges(df: DataFrame, v: Column, nBins: Int): DataFrame =
    df.agg(percentile(v,
      array((1 until nBins).map(i => lit(i.toDouble / nBins)): _*)).as("__edges"))

  /** bin = 1 + #edges strictly below the value — values equal to an
    * edge land in the LOWER bin, a rule both engines evaluate
    * identically on the identical interpolated doubles.
    */
  private def binOf(v: Column, nBins: Int): Column =
    (1 until nBins)
      .map(i => when(v > element_at(col("__edges"), i), 1).otherwise(0))
      .reduce(_ + _) + 1

  /** Equal-frequency binning: exact percentile edges (same
    * interpolation contract q83/q93 verified against DuckDB
    * quantile_cont), then lower-bin-on-edge assignment ([[binOf]]).
    *
    * The edges come from one exact-percentile aggregate (a single
    * 1-row result broadcast into the scan stage), so the data itself
    * never shuffles for the assignment; the per-bin stats are one
    * `nBins`-cardinality hash aggregate. Null values get bin null.
    * The exact edge aggregate holds per-partition value maps — the
    * honest cost of exact edges (it dominates this operator's
    * runtime). Where the distinct-value domain is unbounded and edges
    * may be approximate, substitute `approx_percentile` for
    * `percentile` — the assignment pass is unchanged (q56 is the
    * sketch twin of this operator's edge step).
    *
    * Output: per-row `df` plus a `bin` column in [1, nBins].
    */
  def quantileBins(df: DataFrame, value: Column, nBins: Int): DataFrame = {
    require(nBins >= 2, s"quantileBins: need at least 2 bins, got $nBins")
    val v = value.cast("double")
    df.crossJoin(broadcast(percentileEdges(df, v, nBins)))
      .withColumn("bin",
        when(v.isNotNull, binOf(v, nBins)).otherwise(lit(null).cast("int")))
      .drop("__edges")
  }

  /** Distribution drift between two snapshots of the same column, as
    * per-bin frequency deltas over equal-frequency bins derived from
    * the BASE snapshot — the shape behind PSI monitoring, except the
    * per-bin statistic is the absolute frequency difference, not
    * `(p−q)·ln(p/q)`: `ln` differs across libm builds, so a PSI score
    * could never hash-match an external oracle, while |p−q| ranks
    * drifted columns the same way (sum/2 = total variation distance).
    *
    * Base-derived edges are the point: a drifted current snapshot
    * shows uneven fractions against bins that were 1/n each at base
    * time. Bins with no current rows report 0. An EMPTY side (or one
    * with only nulls) yields null fractions and null l1 — the repo's
    * clamped-denominator convention — rather than 0/0 NaNs that would
    * flow silently into downstream alerts. Cost: one exact-edge
    * aggregate on base ([[percentileEdges]]) + one nBins-cardinality
    * count per side; the snapshots themselves never shuffle.
    *
    * Output: (bin, n_base, n_cur, frac_base, frac_cur, l1) — one row
    * per bin in [1, nBins].
    */
  def binDrift(base: DataFrame, cur: DataFrame, value: Column, nBins: Int): DataFrame = {
    require(nBins >= 2, s"binDrift: need at least 2 bins, got $nBins")
    import org.apache.spark.sql.expressions.Window
    val v = value.cast("double")
    val edges = percentileEdges(base, v, nBins)
    def counts(df: DataFrame, as: String) = df
      .crossJoin(broadcast(edges))
      .filter(v.isNotNull)
      .select(binOf(v, nBins).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as(as))
    val bins = base.sparkSession.range(1, nBins + 1L)
      .select(col("id").cast("int").as("bin"))
    val whole = Window.partitionBy()
    def frac(n: String): Column = {
      val total = sum(col(n)).over(whole)
      when(total > 0, col(n).cast("double") / total.cast("double"))
        .otherwise(lit(null).cast("double"))
    }
    bins
      .join(counts(base, "__nb"), Seq("bin"), "left")
      .join(counts(cur, "__nc"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("__nb"), lit(0L)).as("n_base"),
        coalesce(col("__nc"), lit(0L)).as("n_cur"))
      // the window spans nBins rows — a driver-free way to divide by
      // each side's total without a second pass over the snapshots
      .withColumn("frac_base", frac("n_base"))
      .withColumn("frac_cur", frac("n_cur"))
      .withColumn("l1", abs(col("frac_base") - col("frac_cur")))
  }

  /** Classifier evaluation: per-class confusion counts with INTEGER
    * ppm precision / recall / F1 — the operator that closes a
    * train→classify loop (e.g. q201's Naive Bayes) with an
    * oracle-exact scorecard. One narrow (actual, predicted) relation,
    * three class-bounded count aggregates, a full-outer class stitch:
    *
    *   - `precision_ppm = tp·10⁶ div n_predicted` (null when the class
    *     was never predicted — no evidence, not zero);
    *   - `recall_ppm = tp·10⁶ div n_actual` (null when absent from
    *     truth);
    *   - `f1_ppm = 2·p·r div (p + r)` on the ppm values (null when
    *     either side is null or both are zero) — the harmonic mean
    *     computed entirely in ≤2·10¹² longs, no doubles anywhere.
    *
    * Scale: the input is one row per scored doc; every aggregate is
    * class-bounded after map-side partials. Nothing here can be the
    * bottleneck of any pipeline that produced the predictions.
    */
  def confusionStats(
      df: DataFrame, actual: Column, predicted: Column): DataFrame = {
    val pairs = df.filter(actual.isNotNull && predicted.isNotNull)
      .select(actual.as("a"), predicted.as("p"))
    val na = pairs.groupBy(col("a").as("cls")).agg(count(lit(1)).as("n_actual"))
    val np = pairs.groupBy(col("p").as("cls")).agg(count(lit(1)).as("n_predicted"))
    val tp = pairs.filter(col("a") === col("p"))
      .groupBy(col("a").as("cls")).agg(count(lit(1)).as("tp"))
    na.join(np, Seq("cls"), "full")
      .join(tp, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_predicted"), lit(0L)).as("n_predicted"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision_ppm",
        when(col("n_predicted") > 0, expr("tp * 1000000L div n_predicted")))
      .withColumn("recall_ppm",
        when(col("n_actual") > 0, expr("tp * 1000000L div n_actual")))
      .withColumn("f1_ppm",
        when(col("precision_ppm").isNotNull && col("recall_ppm").isNotNull &&
          col("precision_ppm") + col("recall_ppm") > 0,
          expr("2L * precision_ppm * recall_ppm div (precision_ppm + recall_ppm)")))
  }

  /** k-anonymity / l-diversity audit (Sweeney, IJUFKS'02; Machanavajj-
    * hala et al., ICDE'06) — the privacy gate a dataset passes before
    * release: group rows into EQUIVALENCE CLASSES by their quasi-
    * identifier combination and report, per class, its size (k-
    * anonymity: every class must reach `k` — any smaller class is a
    * re-identification handle) and the number of distinct sensitive
    * values it contains (l-diversity: a class whose sensitive column
    * is constant leaks the attribute even at k, the homogeneity
    * attack). Classes with a NULL in any quasi column are ordinary
    * classes (null is an observable value to an attacker, grouped
    * under SQL's group-by null semantics — identical in both engines);
    * null SENSITIVE values carry no attribute to leak and don't count
    * toward diversity.
    *
    * Output, one row per equivalence class: the quasi columns (under
    * their given aliases), `n`, `n_sensitive`, `k_anonymous`,
    * `l_diverse` — the per-class ledger from which suppression lists
    * (`NOT k_anonymous`) and release metrics (min class size, violator
    * row share) both derive.
    *
    * Scale: ONE hash aggregate keyed on the quasi tuple; the distinct-
    * sensitive count rides the same shuffle as a two-level partial
    * (Spark plans count(distinct) as expand + two aggregates, still
    * class-keyed). Nothing is quadratic, nothing collects.
    */
  /** Order-independent dataset fingerprint — content-level
    * reconciliation between systems: per group, the XOR of md5-derived
    * row hashes plus row count and hash extrema. XOR is commutative/
    * associative with no overflow, so the fingerprint is independent
    * of partitioning, ordering, and engine — two sides of a sync
    * (source DB vs warehouse, yesterday vs today, Spark vs anything
    * that can md5) agree iff the row MULTISETS agree up to pairs of
    * identical rows (an even number of copies of the same row XORs
    * out — the count column catches that case). This is the
    * content-level upgrade of the reference's count-only verify
    * protocol (`sync.py:90-121` counts rows; this fingerprints them).
    *
    * Callers pass the row rendering (`rowRepr`) — a deterministic
    * string built from STABLE renderings only (longs, formatted
    * timestamps, scaled-integer decimals; never raw double→string,
    * whose shortest-round-trip formatting differs across engines).
    *
    * Scale: ONE group-keyed aggregate; XOR/min/max/count all combine
    * map-side. The fingerprint relation is group-bounded and itself
    * mergeable (XOR of XORs), so per-partition fingerprints roll up
    * without a rescan — the incremental-audit property.
    */
  def datasetFingerprint(
      df: DataFrame,
      group: Column,
      rowRepr: Column): DataFrame = {
    df.select(group.as("grp"), graft.ext.TextHash.hash64(rowRepr).as("__h"))
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("xor_fp"),
        min(col("__h")).as("min_hash"),
        max(col("__h")).as("max_hash"))
  }

  /** Grouped TWO-feature least squares — y = b0 + b1·x1 + b2·x2 per
    * group, solved in closed form from the 3×3 normal equations by
    * Cramer's rule. The one-feature [[groupedOls]] can't separate
    * correlated drivers (quantity and discount both move price); two
    * features is where "regression as an aggregate" starts answering
    * attribution questions, and the closed form keeps it ONE pass +
    * ONE hash aggregate — no iterative solver, no feature matrix.
    *
    * Determinism: the nine raw moments go through the exact-decimal
    * sum contract; the four 3×3 determinants are fixed expression
    * trees over those doubles (first-column cofactor expansion,
    * identical text on both engines), and the coefficients are
    * micro-quantized after the single division (the q186 contraction
    * guard). Groups whose normal matrix is singular (det exactly 0 —
    * constant or collinear features) report null coefficients.
    */
  def groupedOls2(
      df: DataFrame,
      groups: Seq[String],
      x1Col: Column,
      x2Col: Column,
      yCol: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 10)
    val q6 = (c: Column) => floor(c * 1000000.0 + 0.5) / 1000000.0
    def ds(c: Column) = sum(c.cast(dec)).cast("double")
    val base = df.filter(x1Col.isNotNull && x2Col.isNotNull && yCol.isNotNull)
      .select((groups.map(col) ++ Seq(x1Col.cast("double").as("__x1"),
        x2Col.cast("double").as("__x2"), yCol.cast("double").as("__y"))): _*)
    val s = (n: String) => col(n)
    base.groupBy(groups.map(col): _*)
      .agg(
        count(lit(1)).cast("double").as("n"),
        ds(col("__x1")).as("s1"), ds(col("__x2")).as("s2"), ds(col("__y")).as("sy"),
        ds(col("__x1") * col("__x1")).as("s11"),
        ds(col("__x1") * col("__x2")).as("s12"),
        ds(col("__x2") * col("__x2")).as("s22"),
        ds(col("__x1") * col("__y")).as("s1y"),
        ds(col("__x2") * col("__y")).as("s2y"))
      .withColumn("__det",
        s("n") * (s("s11") * s("s22") - s("s12") * s("s12")) -
          s("s1") * (s("s1") * s("s22") - s("s12") * s("s2")) +
          s("s2") * (s("s1") * s("s12") - s("s11") * s("s2")))
      .withColumn("__det0",
        s("sy") * (s("s11") * s("s22") - s("s12") * s("s12")) -
          s("s1y") * (s("s1") * s("s22") - s("s12") * s("s2")) +
          s("s2y") * (s("s1") * s("s12") - s("s11") * s("s2")))
      .withColumn("__det1",
        s("n") * (s("s1y") * s("s22") - s("s2y") * s("s12")) -
          s("s1") * (s("sy") * s("s22") - s("s2y") * s("s2")) +
          s("s2") * (s("sy") * s("s12") - s("s1y") * s("s2")))
      .withColumn("__det2",
        s("n") * (s("s11") * s("s2y") - s("s12") * s("s1y")) -
          s("s1") * (s("s1") * s("s2y") - s("s12") * s("sy")) +
          s("s2") * (s("s1") * s("s1y") - s("s11") * s("sy")))
      .select((groups.map(col) ++ Seq(
        col("n").cast("long").as("n"),
        when(col("__det") =!= 0.0, q6(col("__det0") / col("__det"))).as("b0"),
        when(col("__det") =!= 0.0, q6(col("__det1") / col("__det"))).as("b1"),
        when(col("__det") =!= 0.0, q6(col("__det2") / col("__det"))).as("b2"))): _*)
  }

  /** Grouped 2-feature logistic regression via IRLS — the classifier
    * closer of the classical-stats family (q142/q226 are linear-only):
    * per group, `iters` fixed rounds of iteratively-reweighted least
    * squares, each round ONE full-scan weighted-moment aggregate plus
    * the q226 Cramer 3×3 solve. Engine-exact by construction:
    *
    *   - the link is the ALGEBRAIC sigmoid σ(η) = ½(1 + η/(1+|η|)) in
    *     ppm fixed point — same S-shape, no libm exp (whose last-ulp
    *     differences would make the fit engine-dependent);
    *   - row-level η/μ/w/z are integer ppm; the one signed division
    *     (the working response) truncates toward zero in both engines
    *     (`div` here, `//` there), and the sigmoid's numerator is
    *     arranged non-negative so floor-vs-trunc can never diverge;
    *   - weighted moments are DECIMAL(38,0)-exact sums, cast once to
    *     double for the Cramer solve (correctly-rounded IEEE ops),
    *     and the new β rounds back to ppm longs.
    *
    * Features are clamped to ±10⁶ units and β to ±10⁹ ppm (pre-scale
    * wider features) — the clamp bounds every intermediate inside
    * long/decimal range at any corpus size. The normal-equation
    * diagonal is inflated by `ridgePct`% (multiplicative — the
    * scale-free Levenberg–Marquardt conditioning), so near-collinear
    * features and separable groups shrink instead of diverging;
    * exactly collinear groups (det = 0) freeze at β = 0. Output per group: n, n_pos, the three
    * ppm coefficients, and the training accuracy of the final
    * ½-threshold classifier.
    *
    * Scale: `iters`+1 scans, each a map-side-combinable aggregate to
    * |groups| rows; β travels as a broadcast relation, never through
    * the driver.
    */
  def groupedLogit2(
      df: DataFrame,
      groups: Seq[String],
      x1Col: Column,
      x2Col: Column,
      yCol: Column,
      iters: Int = 3,
      ridgePct: Int = 5): DataFrame = {
    require(groups.nonEmpty, "groupedLogit2: at least one group column")
    require(iters >= 1 && iters <= 6, s"groupedLogit2: iters in [1, 6], got $iters")
    require(ridgePct >= 0 && ridgePct <= 100,
      s"groupedLogit2: ridgePct in [0, 100], got $ridgePct")
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    def dsum(c: Column) = sum(c.cast(dec)).cast("double")
    val M = 1000000L
    val clampX = (c: Column) =>
      greatest(least(c.cast("long"), lit(M)), lit(-M))
    // the clamped design matrix feeds every IRLS round, the β₀ distinct
    // AND the final accuracy pass (iters+2 consumers) — unpinned, the
    // upstream derivation (q241 tokenizes the corpus in x2) re-executed
    // per consumer; pin it once (the q37 multi-consumer shape)
    val base = df.filter(x1Col.isNotNull && x2Col.isNotNull && yCol.isNotNull)
      .select((groups.map(col) ++ Seq(
        clampX(x1Col).as("__x1"), clampX(x2Col).as("__x2"),
        when(yCol.cast("boolean"), lit(M)).otherwise(lit(0L)).as("__y"))): _*)
      .localCheckpoint(false)
    // one IRLS round: join β in, integer link math, exact moments,
    // double Cramer, ppm β out
    def step(beta: DataFrame): DataFrame = {
      val joined = base.join(broadcast(beta), groups)
        .withColumn("__eta",
          col("__b0") + col("__b1") * col("__x1") + col("__b2") * col("__x2"))
        // algebraic sigmoid, numerator kept non-negative so floor==trunc
        .withColumn("__mu", expr(
          s"(500000L * (${M}L + abs(__eta) + __eta)) div (${M}L + abs(__eta))"))
        .withColumn("__w",
          greatest(expr(s"__mu * (${M}L - __mu) div ${M}L"), lit(1L)))
        // working response; `div` truncates toward zero — the same
        // semantics as DuckDB's `//` — so the signed division is
        // engine-exact without a floor detour
        .withColumn("__z", col("__eta") + expr(
          s"(__y - __mu) * ${M}L div __w"))
      val s = (n: String) => col(n)
      // w is cast to decimal BEFORE the products: w·x·z in raw longs
      // can overflow at the clamp extremes
      val wd = col("__w").cast(dec)
      joined.groupBy(groups.map(col): _*)
        .agg(
          dsum(wd).as("sw"),
          dsum(wd * col("__x1")).as("s1"),
          dsum(wd * col("__x2")).as("s2"),
          dsum(wd * col("__x1") * col("__x1")).as("s11"),
          dsum(wd * col("__x1") * col("__x2")).as("s12"),
          dsum(wd * col("__x2") * col("__x2")).as("s22"),
          dsum(wd * col("__z")).as("sz"),
          dsum(wd * col("__x1") * col("__z")).as("s1z"),
          dsum(wd * col("__x2") * col("__z")).as("s2z"))
        // multiplicative ridge on the diagonal — double multiply by an
        // exact small constant, identical in any IEEE engine
        .withColumn("sw", col("sw") * lit(1.0 + ridgePct / 100.0))
        .withColumn("s11", col("s11") * lit(1.0 + ridgePct / 100.0))
        .withColumn("s22", col("s22") * lit(1.0 + ridgePct / 100.0))
        .withColumn("__det",
          s("sw") * (s("s11") * s("s22") - s("s12") * s("s12")) -
            s("s1") * (s("s1") * s("s22") - s("s12") * s("s2")) +
            s("s2") * (s("s1") * s("s12") - s("s11") * s("s2")))
        .withColumn("__d0",
          s("sz") * (s("s11") * s("s22") - s("s12") * s("s12")) -
            s("s1z") * (s("s1") * s("s22") - s("s12") * s("s2")) +
            s("s2z") * (s("s1") * s("s12") - s("s11") * s("s2")))
        .withColumn("__d1",
          s("sw") * (s("s1z") * s("s22") - s("s2z") * s("s12")) -
            s("s1") * (s("sz") * s("s22") - s("s2z") * s("s2")) +
            s("s2") * (s("sz") * s("s12") - s("s1z") * s("s2")))
        .withColumn("__d2",
          s("sw") * (s("s11") * s("s2z") - s("s12") * s("s1z")) -
            s("s1") * (s("s1") * s("s2z") - s("s12") * s("sz")) +
            s("s2") * (s("s1") * s("s1z") - s("s11") * s("sz")))
        .select((groups.map(col) ++ Seq("__d0", "__d1", "__d2").zipWithIndex.map {
          case (d, i) =>
            when(col("__det") =!= 0.0,
              greatest(least(
                // z is ppm, x raw units -> the solved beta is ALREADY
                // ppm-per-unit; no further scaling
                floor(col(d) / col("__det") + 0.5).cast("long"),
                lit(1000000000L)), lit(-1000000000L)))
              .otherwise(lit(0L)).as(s"__b$i")
        }): _*)
    }
    val beta0 = base.select(groups.map(col): _*).distinct()
      .select((groups.map(col) ++ Seq(lit(0L).as("__b0"),
        lit(0L).as("__b1"), lit(0L).as("__b2"))): _*)
    val betaN = (1 to iters).foldLeft(beta0)((b, _) => step(b))
    base.join(broadcast(betaN), groups)
      .withColumn("__eta",
        col("__b0") + col("__b1") * col("__x1") + col("__b2") * col("__x2"))
      .withColumn("__ok",
        when((col("__eta") >= 0L) === (col("__y") === M), 1L).otherwise(0L))
      .groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y") === M, 1L).otherwise(0L)).as("n_pos"),
        max(col("__b0")).as("b0_ppm"), max(col("__b1")).as("b1_ppm"),
        max(col("__b2")).as("b2_ppm"),
        expr("sum(__ok) * 1000000L div count(1)").as("acc_ppm"))
  }

  /** Kaplan–Meier survival curve per group (the product-limit
    * estimator, Kaplan & Meier JASA 1958) with right-censoring — the
    * churn/retention/time-to-failure primitive: at each distinct
    * duration t, the at-risk count n(t) (subjects with duration ≥ t),
    * event count d(t), censored count c(t), and the survival estimate
    * S(t) = Π_{t'≤t} (n(t')−d(t'))/n(t') as an integer ppm fold
    * (S·(n−d) div n per step — non-negative floor division, so any
    * engine replays every step exactly; no float products).
    *
    * Scale: one (group, duration) aggregate + ONE group-keyed window
    * for the descending at-risk cumulative — both event-scale with
    * map-side partials. The per-group step table then folds as an
    * ARRAY (collect_list + HOF): survival curves are evaluation
    * artifacts with bounded resolution, enforced in-plan by
    * `maxSteps` (raise_error, not a silent cap) exactly like
    * [[aucExact]]'s distinct-score bound.
    */
  def kaplanMeier(
      df: DataFrame,
      group: Column,
      duration: Column,
      event: Column,
      maxSteps: Int = 10000): DataFrame = {
    require(maxSteps >= 1 && maxSteps <= 100000,
      s"kaplanMeier: maxSteps in [1, 100000], got $maxSteps")
    import org.apache.spark.sql.expressions.Window
    val steps = df.filter(group.isNotNull && duration.isNotNull && event.isNotNull)
      .select(group.as("grp"), duration.cast("long").as("t"),
        event.cast("boolean").as("__e"))
      .filter(col("t") >= 0L)
      .groupBy(col("grp"), col("t"))
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("d"),
        sum(when(!col("__e"), 1L).otherwise(0L)).as("c"))
      .withColumn("n", sum(col("d") + col("c")).over(
        Window.partitionBy(col("grp")).orderBy(col("t").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val guarded = steps.crossJoin(broadcast(
      steps.agg(count(lit(1)).as("__k"))
        .select(when(col("__k") <= maxSteps, lit(1L))
          .otherwise(raise_error(concat(lit(
            s"kaplanMeier: step count exceeds maxSteps=$maxSteps — survival curves " +
              "are evaluation artifacts; bucket the duration first (count="),
            col("__k"), lit(")")))).as("__ok"))))
    guarded
      .groupBy(col("grp"))
      .agg(array_sort(collect_list(struct((col("t") * col("__ok")).as("t"),
        col("n"), col("d"), col("c")))).as("__steps"))
      // one LINEAR pass per group (KmFoldPpm) instead of the former
      // aggregate(slice(__steps, 1, i)) prefix re-fold, which was
      // O(steps²) long ops inside a single task
      .withColumn("__surv",
        graft.functions.StatFunctions.kmFoldPpm(col("__steps")))
      .select(col("grp"), expr(
        """explode(transform(sequence(1, size(__steps)), i -> struct(
          |  element_at(__steps, i).t AS t,
          |  element_at(__steps, i).n AS n_risk,
          |  element_at(__steps, i).d AS d_events,
          |  element_at(__steps, i).c AS c_censored,
          |  element_at(__surv, i) AS surv_ppm)))""".stripMargin)
        .as("__s"))
      .select(col("grp"), col("__s.t").as("t"), col("__s.n_risk").as("n_risk"),
        col("__s.d_events").as("d_events"), col("__s.c_censored").as("c_censored"),
        col("__s.surv_ppm").as("surv_ppm"))
  }

  /** Log-rank test between survival curves (Mantel–Cox) for every
    * unordered group pair — the "are these churn curves actually
    * different" companion to [[kaplanMeier]]: at each pooled event
    * time, group A's observed events are compared against the
    * hypergeometric expectation d·n₁/n, and χ² = (O₁−E₁)²/V with
    * V = Σ d·n₁·n₂·(n−d) / (n²·(n−1)).
    *
    * Engine-exact integer/decimal arithmetic: E₁ accumulates as
    * ⌊d·n₁·10⁶/n⌋ ppm terms, V as ⌊·10¹²⌋ terms, both in
    * DECIMAL(38,0), and χ² emerges as an integral division — no float
    * sums whose order could differ. At-risk counts at the OTHER
    * group's event times fill via a descending LOCF window (at-risk
    * is right-continuous), the q137 idiom.
    *
    * Scale: one (group, duration) aggregate + one group-keyed window
    * (both event-scale, map-side partials), then pair-tagged step
    * relations bounded by `maxSteps` in-plan — survival comparison is
    * an evaluation artifact, like [[aucExact]].
    */
  def logRankTest(
      df: DataFrame,
      group: Column,
      duration: Column,
      event: Column,
      maxSteps: Int = 10000): DataFrame = {
    require(maxSteps >= 1 && maxSteps <= 100000,
      s"logRankTest: maxSteps in [1, 100000], got $maxSteps")
    import org.apache.spark.sql.expressions.Window
    val steps = df.filter(group.isNotNull && duration.isNotNull && event.isNotNull)
      .select(group.cast("string").as("g"), duration.cast("long").as("t"),
        event.cast("boolean").as("__e"))
      .filter(col("t") >= 0L)
      .groupBy(col("g"), col("t"))
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("__tot"))
      .withColumn("n", sum(col("__tot")).over(
        Window.partitionBy(col("g")).orderBy(col("t").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("g"), col("t"), col("d"), col("n"))
    val guarded = steps.crossJoin(broadcast(
      steps.agg(count(lit(1)).as("__k"))
        .select(when(col("__k") <= maxSteps, lit(1L))
          .otherwise(raise_error(concat(lit(
            s"logRankTest: step count exceeds maxSteps=$maxSteps — bucket the " +
              "duration first (count="), col("__k"), lit(")")))).as("__ok"))))
      .select(col("g"), (col("t") * col("__ok")).as("t"), col("d"), col("n"))
    val gs = steps.select(col("g")).distinct()
    val pairs = gs.as("a").join(gs.as("b"), col("a.g") < col("b.g"))
      .select(col("a.g").as("ga"), col("b.g").as("gb"))
    // side-tagged steps per pair, then one aggregate per (pair, t)
    val tagged = guarded.join(pairs, col("g") === col("ga") || col("g") === col("gb"))
      .select(col("ga"), col("gb"), col("t"),
        when(col("g") === col("ga"), col("n")).as("__n1"),
        when(col("g") === col("ga"), col("d")).otherwise(lit(0L)).as("__d1"),
        when(col("g") === col("gb"), col("n")).as("__n2"),
        when(col("g") === col("gb"), col("d")).otherwise(lit(0L)).as("__d2"))
      .groupBy(col("ga"), col("gb"), col("t"))
      .agg(max(col("__n1")).as("__n1"), sum(col("__d1")).as("d1"),
        max(col("__n2")).as("__n2"), sum(col("__d2")).as("d2"))
    // at-risk at the other group's times: LOCF over DESCENDING t
    // (at-risk(t) = at-risk at the smallest own step time >= t; 0 past
    // the group's largest time)
    val wDesc = Window.partitionBy(col("ga"), col("gb")).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = tagged
      .withColumn("n1", coalesce(last(col("__n1"), ignoreNulls = true).over(wDesc), lit(0L)))
      .withColumn("n2", coalesce(last(col("__n2"), ignoreNulls = true).over(wDesc), lit(0L)))
      .withColumn("d", col("d1") + col("d2"))
      .withColumn("n", col("n1") + col("n2"))
      .filter(col("d") > 0L)
    filled
      .withColumn("__e1",
        expr("CAST(d AS DECIMAL(38,0)) * n1 * 1000000 div n"))
      .withColumn("__v",
        when(col("n") > 1L, expr(
          "CAST(d AS DECIMAL(38,0)) * n1 * n2 * (n - d) * 1000000000000 " +
            "div (CAST(n AS DECIMAL(38,0)) * n * (n - 1))")).otherwise(lit(0L)))
      .groupBy(col("ga"), col("gb"))
      .agg(sum(col("d1")).as("o1"), sum(col("d2")).as("o2"),
        sum(col("__e1").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("__E1"),
        sum(col("__v").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("__V"))
      .select(col("ga").as("group_a"), col("gb").as("group_b"),
        col("o1"), col("o2"),
        expr("CAST(__E1 AS BIGINT)").as("e1_ppm"),
        when(col("__V") > 0, expr(
          "(CAST(o1 AS DECIMAL(38,0)) * 1000000 - __E1) * " +
            "(CAST(o1 AS DECIMAL(38,0)) * 1000000 - __E1) * 1000 div __V"))
          .as("chi2_milli"))
  }

  /** Probabilistic-score calibration summary per group: Brier score
    * and Expected Calibration Error, both exact integers — the
    * "should I trust this model's probabilities" verdict for any
    * scorer that emits ppm probabilities ([[groupedLogit2]]'s sigmoid,
    * a calibrated NB, anything).
    *
    *   - brier_ppb = Σ(μ_ppm − y_ppm)² div (n·1000) — the mean squared
    *     probability error on the 0..1 scale, in parts-per-billion;
    *   - ece_ppm: decile bins by μ (bin = min(9, μ div 10⁵)); per bin
    *     |Σμ − 10⁶·Σy| (predicted-vs-observed mass gap in ppm·rows);
    *     ECE = Σ gaps div n.
    *
    * All sums run in DECIMAL(38,0); no float enters the metric, so an
    * external engine replays every bin and both scores bit-for-bit.
    * Scale: one group-keyed aggregate for Brier + one (group, bin)
    * aggregate collapsing to a second group-keyed pass — both
    * map-side-combinable at any row count.
    */
  def probCalibration(
      df: DataFrame,
      group: Column,
      muPpm: Column,
      label: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val base = df.filter(group.isNotNull && muPpm.isNotNull && label.isNotNull)
      .select(group.as("grp"), muPpm.cast("long").as("__mu"),
        when(label.cast("boolean"), lit(1000000L)).otherwise(lit(0L)).as("__y"))
      .withColumn("__mu", greatest(least(col("__mu"), lit(1000000L)), lit(0L)))
      .withColumn("__bin", least(lit(9L), expr("__mu div 100000")))
    val bins = base.groupBy(col("grp"), col("__bin"))
      .agg(count(lit(1)).as("__nb"),
        sum(col("__mu").cast(dec)).as("__smu"),
        sum(when(col("__y") === 1000000L, 1L).otherwise(0L)).as("__sy"),
        sum(((col("__mu") - col("__y")).cast(dec) *
          (col("__mu") - col("__y"))).cast(dec)).as("__sq"))
    bins.groupBy(col("grp"))
      .agg(sum(col("__nb")).as("n"),
        sum(col("__sy")).as("n_pos"),
        sum(col("__sq").cast(dec)).as("__sqsum"),
        sum(abs(col("__smu") - col("__sy").cast(dec) * 1000000).cast(dec)).as("__gap"))
      .select(col("grp"), col("n"), col("n_pos"),
        expr("__sqsum div (CAST(n AS DECIMAL(38,0)) * 1000)").as("brier_ppb"),
        expr("__gap div CAST(n AS DECIMAL(38,0))").as("ece_ppm"))
  }

  /** Two-proportion z-test per group pair — the experimentation
    * primitive ("did variant B convert better, and is it real"):
    * for every unordered pair of variants, conversion counts, the
    * ppm rate difference, and the pooled z² statistic
    *
    *   z² = (c₁n₂ − c₂n₁)²·N / (n₁·n₂·c·(N−c))   (c = c₁+c₂, N = n₁+n₂)
    *
    * — the common-denominator form, so the whole statistic is ONE
    * exact integral division over DECIMAL(38,0) products (no float
    * rates, no libm; z²≥3.84 ⇔ p<0.05 two-sided). Degenerate pools
    * (all or none converted) report null.
    *
    * Scale: one variant-keyed aggregate (map-side combinable at any
    * event volume) + a |variants|² pair join over that tiny relation.
    */
  def proportionTest(
      df: DataFrame,
      variant: Column,
      converted: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val agg = df.filter(variant.isNotNull && converted.isNotNull)
      .groupBy(variant.cast("string").as("v"))
      .agg(count(lit(1)).as("n"),
        sum(when(converted.cast("boolean"), 1L).otherwise(0L)).as("c"))
    agg.as("a").join(agg.as("b"), col("a.v") < col("b.v"))
      .select(col("a.v").as("variant_a"), col("b.v").as("variant_b"),
        col("a.n").as("n_a"), col("a.c").as("conv_a"),
        col("b.n").as("n_b"), col("b.c").as("conv_b"))
      .withColumn("rate_a_ppm", expr("conv_a * 1000000L div n_a"))
      .withColumn("rate_b_ppm", expr("conv_b * 1000000L div n_b"))
      .withColumn("__c", col("conv_a") + col("conv_b"))
      .withColumn("__N", col("n_a") + col("n_b"))
      // the 4th-power denominator outgrows DECIMAL(38) at web scale, so
      // the RATIO runs in doubles over exact decimal factors (the q226
      // Cramer pattern: casts and ×/÷ are correctly-rounded IEEE on
      // identical expression trees — engine-exact without the overflow)
      .withColumn("__dd", expr(
        "CAST(CAST(conv_a AS DECIMAL(38,0)) * n_b - CAST(conv_b AS DECIMAL(38,0)) * n_a AS DOUBLE)"))
      .withColumn("__den", expr(
        "CAST(CAST(n_a AS DECIMAL(38,0)) * n_b * __c * (__N - __c) AS DOUBLE)"))
      .withColumn("z2_milli",
        when(col("__c") > 0L && col("__c") < col("__N"),
          floor(col("__dd") * col("__dd") * col("__N").cast("double") /
            col("__den") * 1000.0 + 0.5).cast("long")))
      .select(col("variant_a"), col("variant_b"), col("n_a"), col("conv_a"),
        col("n_b"), col("conv_b"), col("rate_a_ppm"), col("rate_b_ppm"),
        col("z2_milli"),
        (col("z2_milli").isNotNull && col("z2_milli") >= 3841L).as("significant_95"))
  }

  /** Per-column cardinality / concentration profile — the skew
    * diagnosis that decides physical strategy per column: `n_distinct`
    * (dictionary-encodability, join-key selectivity), `top_share_ppm`
    * (the single hottest value — the salting trigger), and `hhi_ppm`
    * (Herfindahl Σ share², the concentration index: 10⁶/n_distinct
    * for uniform columns, →10⁶ as one value dominates). A column with
    * high HHI as a join/group key is a skew incident; as a filter
    * column it's a partition-pruning candidate.
    *
    * All integer: counts are longs, the two ppm ratios go through
    * DECIMAL(38,0) `div` so Σcnt²·10⁶ can't overflow at any corpus
    * size. Values compare as strings (one canonical rendering per
    * engine for ints/strings; callers pre-render floats per the q214
    * stable-rendering rule).
    *
    * Scale: one (column, value) aggregate (map-side combine) + one
    * column-keyed rollup — the classic two-level distinct shape; the
    * unpivot multiplies the scan by |cols|, not the shuffle (value
    * counts bound the exchange).
    */
  def concentrationProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "concentrationProfile: at least one column")
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val stacked = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"), col(c).cast("string").as("v"))): _*)).as("s"))
      .select(col("s.column_name").as("column_name"), col("s.v").as("v"))
      .filter(col("v").isNotNull)
    stacked.groupBy(col("column_name"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("column_name"))
      .agg(
        sum(col("cnt")).as("n"),
        count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_count"),
        sum(col("cnt").cast(dec) * col("cnt").cast(dec)).as("__ss"))
      .select(col("column_name"), col("n"), col("n_distinct"), col("top_count"),
        expr("CAST(top_count AS DECIMAL(38,0)) * 1000000 div n").as("top_share_ppm"),
        expr("__ss * 1000000 div (CAST(n AS DECIMAL(38,0)) * n)").as("hhi_ppm"))
  }

  /** Merkle-style bucket diff between two snapshots — the rsync idea
    * at table scale: bucket rows by KEY hash (a changed row stays in
    * its bucket), fingerprint each bucket on each side with the
    * [[datasetFingerprint]] XOR, and report per bucket whether the
    * two sides agree. Comparing 100 TB against 100 TB then costs two
    * scans and a |buckets|-row join — and re-syncing touches only the
    * buckets that differ (each side's per-bucket counts and
    * fingerprints localize the damage to n/B rows per differing
    * bucket, recursively subdividable).
    *
    * `differs` is true on any count or fingerprint mismatch; the XOR
    * caveat (an even number of copies of one row cancels) is caught
    * by the count column exactly as in [[datasetFingerprint]].
    *
    * Scale: one bucket-keyed aggregate per side (map-side XOR/count
    * combine), one B-row full-outer join. Keys absent on one side
    * surface as 0-count buckets, not dropped rows.
    */
  def bucketDiff(
      a: DataFrame,
      b: DataFrame,
      key: Column,
      rowRepr: Column,
      buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"bucketDiff: buckets in [2, 2^20] required, got $buckets")
    def side(df: DataFrame, suffix: String): DataFrame =
      df.select(
          pmod(graft.ext.TextHash.hash64(key.cast("string")), lit(buckets.toLong))
            .as("bucket"),
          graft.ext.TextHash.hash64(rowRepr).as("__h"))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as(s"n_$suffix"),
          expr("bit_xor(__h)").as(s"fp_$suffix"))
    side(a, "a").join(side(b, "b"), Seq("bucket"), "full")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("fp_a"), lit(0L)).as("fp_a"),
        coalesce(col("fp_b"), lit(0L)).as("fp_b"))
      .withColumn("differs",
        col("n_a") =!= col("n_b") || col("fp_a") =!= col("fp_b"))
  }

  /** Exact tie-aware ROC AUC via the Mann–Whitney rank identity:
    * AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻). Computed WITHOUT
    * the quadratic positive×negative join: group rows by distinct
    * score, one ascending window for cumulative negatives, then
    * Σ n⁺(s)·(2·neg_below(s) + neg_equal(s)) — twice the U statistic,
    * kept ×2 so ties stay integral. `auc_ppm = auc_x2·10⁶ div
    * (2·n⁺·n⁻)`; one output row (n_pos, n_neg, auc_x2, auc_ppm —
    * null when a class is empty). Everything is a long, so the number
    * is engine-exact including tie handling (where a row_number-based
    * "AUC" would silently depend on the tiebreak).
    *
    * Contract: an EVALUATION operator — the window orders the
    * distinct-score relation, bounded by score cardinality ≤ eval
    * size (the [[calibrationCurve]] contract), enforced in-plan by
    * `maxDistinctScores`; the ×10⁶ ppm division runs in DECIMAL(38,0)
    * so it stays exact at any eval size the guard admits.
    */
  def aucExact(
      df: DataFrame,
      score: Column,
      label: Column,
      maxDistinctScores: Long = 4000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // localCheckpoint (lazy): g feeds BOTH the main window path and the
    // guard's count aggregate below — without it the whole upstream
    // scoring chain (e.g. q218's NB train+score) is computed twice, and
    // under memory pressure the second pass recomputes instead of
    // reusing shuffle output (the bimodal bench readings of rounds 8-9).
    // The relation is ≤ maxDistinctScores rows, so the blocks are tiny.
    val g = df.filter(score.isNotNull && label.isNotNull)
      .select(score.cast("long").as("__s"), label.cast("boolean").as("__y"))
      .groupBy(col("__s"))
      .agg(
        sum(when(col("__y"), 1L).otherwise(0L)).as("__np"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("__nn"))
      .localCheckpoint(false)
    val guarded = g.crossJoin(broadcast(
      g.agg(count(lit(1)).as("__k"))
        .select(when(col("__k") <= maxDistinctScores, lit(1L))
          .otherwise(raise_error(concat(lit(
            s"aucExact: distinct scores exceed maxDistinctScores=$maxDistinctScores " +
              "— this is an evaluation operator, not a corpus one (count="),
            col("__k"), lit(")")))).as("__ok"))))
    val w = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    guarded
      .withColumn("__cumn", sum(col("__nn")).over(w) * col("__ok"))
      .agg(
        sum(col("__np")).as("n_pos"),
        sum(col("__nn")).as("n_neg"),
        sum(col("__np") * (lit(2L) * (col("__cumn") - col("__nn")) + col("__nn")))
          .as("auc_x2"))
      .select(col("n_pos"), col("n_neg"), col("auc_x2"),
        // ppm division in DECIMAL(38,0): auc_x2·10⁶ overflows Long once
        // n_pos·n_neg passes ~4.6e12 (a 10M-row eval set with few
        // distinct scores passes maxDistinctScores yet would yield a
        // garbage ppm in long math) — mirror blockingQuality's exact
        // decimal route; IntegralDivide lands back on Long.
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("CAST(auc_x2 AS DECIMAL(38,0)) * 1000000 div " +
            "(CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg)")).as("auc_ppm"))
  }

  /** Calibration curve (reliability diagram) for an integer-scored
    * classifier: rank the evaluation rows by score, cut them into
    * `buckets` equal-depth bins, and report per bin the support,
    * empirical accuracy (ppm), and mean score — the table that says
    * whether "the model scored this high" actually means "the model
    * is right this often" (Naive Bayes q201 is famously confident;
    * this quantifies by how much). All integer: bin =
    * `(rn−1)·B div n`, accuracy and mean score are floor divisions.
    *
    * Contract: the input is an EVALUATION set (thousands of rows, not
    * a corpus) — ranking uses one global window, the same bounded-
    * list contract as [[Retrieval.rrfFuse]], enforced by
    * `maxEvalSize` in-plan (raise_error, not a silent cap).
    */
  def calibrationCurve(
      df: DataFrame,
      score: Column,
      correct: Column,
      tiebreak: Column,
      buckets: Int = 10,
      maxEvalSize: Long = 10000000L): DataFrame = {
    require(buckets >= 2 && buckets <= 1000,
      s"calibrationCurve: buckets in [2, 1000] required, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val guarded = df.crossJoin(
      broadcast(df.agg(count(lit(1)).as("__sz"))
        .select(col("__sz"),
          when(col("__sz") <= maxEvalSize, lit(1L))
            .otherwise(raise_error(concat(lit(
              s"calibrationCurve: eval set exceeds maxEvalSize=$maxEvalSize (size="),
              col("__sz"), lit(")")))).as("__ok"))))
    guarded
      .select(score.cast("long").as("__score"),
        correct.cast("boolean").as("__correct"), tiebreak.as("__tb"),
        col("__sz"), col("__ok"))
      .withColumn("__rn",
        row_number().over(Window.orderBy(col("__score"), col("__tb"))) * col("__ok"))
      .withColumn("bucket", expr(s"(__rn - 1) * $buckets div __sz"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__correct"), 1L).otherwise(0L)).as("n_correct"),
        min(col("__score")).as("min_score"),
        max(col("__score")).as("max_score"),
        sum(col("__score")).as("__ssum"))
      .withColumn("accuracy_ppm", expr("n_correct * 1000000L div n"))
      .withColumn("mean_score", expr("__ssum div n"))
      .drop("__ssum")
  }

  /** Quantile normalization across groups (the microarray-era Bolstad
    * '03 method, distribution-matching generally): replace each value
    * by the GLOBAL quantile at its within-group percentile, so every
    * group ends up with the same marginal distribution — the cross-
    * source length/score equalizer a mixed-corpus pipeline applies
    * before thresholds tuned on one source are applied to all.
    *
    * Mechanics, all deterministic: within each group, `p_ppm` is the
    * integer percent-rank `(rn−1)·10⁶ div (n−1)` over (value, id)
    * order (singleton groups sit at the median, 500000); the global
    * reference is a `resolution`-point exact interpolated quantile
    * table (`percentile` — the q83 quantile_cont parity contract, at
    * dyadic points so the probe literals are float-exact); the
    * normalized value is one array lookup at `p_ppm·R div 10⁶`. No
    * value arithmetic ever happens — output values ARE reference
    * quantiles, so cross-engine parity reduces to the (proven)
    * percentile contract plus integer indexing.
    *
    * Scale: ONE group-keyed shuffle carries both windows (rank and
    * group size share the partitioning); the reference table is a
    * 1-row aggregate broadcast back. Exact `percentile` buffers
    * per-value counts — the bounded-domain caveat of q83; swap in
    * `approx_percentile` for unbounded-domain columns at 100 TB.
    */
  def quantileNormalize(
      df: DataFrame,
      id: Column,
      group: Column,
      value: Column,
      resolution: Int = 256): DataFrame = {
    require(resolution >= 2 && (resolution & (resolution - 1)) == 0,
      s"quantileNormalize: resolution must be a power of two >= 2, got $resolution")
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(id.isNotNull && group.isNotNull && value.isNotNull)
      .select(id.as("id"), group.as("grp"), value.cast("double").as("value"))
    val w = Window.partitionBy(col("grp"))
    val ranked = base
      .withColumn("__rn", row_number().over(w.orderBy(col("value"), col("id"))))
      .withColumn("__ns", count(lit(1)).over(w))
      .withColumn("p_ppm",
        when(col("__ns") === 1, lit(500000L))
          .otherwise(expr("(__rn - 1) * 1000000L div (__ns - 1)")))
    val probes = array((0 to resolution).map(i => lit(i.toDouble / resolution)): _*)
    val edges = base.agg(percentile(col("value"), probes).as("__edges"))
    ranked.crossJoin(broadcast(edges))
      .select(col("id"), col("grp"), col("value"), col("p_ppm"),
        element_at(col("__edges"),
          (expr(s"p_ppm * $resolution div 1000000") + 1).cast("int"))
          .as("norm_value"))
  }

  def kAnonymityAudit(
      df: DataFrame,
      quasi: Seq[Column],
      sensitive: Column,
      k: Int,
      l: Int): DataFrame = {
    require(quasi.nonEmpty, "kAnonymityAudit: at least one quasi-identifier column")
    require(k >= 2, s"kAnonymityAudit: k >= 2 required, got $k")
    require(l >= 2 && l <= k, s"kAnonymityAudit: 2 <= l <= k required, got ($l, $k)")
    df.groupBy(quasi: _*)
      .agg(
        count(lit(1)).as("n"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("k_anonymous", col("n") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)
  }

  /** Doubled tie-averaged ranks of `v` within each group — the shared
    * rank relation under [[spearmanCorr]] and [[mannWhitney]]. The
    * average rank of a tie block [min..max] is (min+max)/2, which is
    * half-integral; doubling keeps it exactly integral:
    * 2·avg = 2·cum − cnt + 1 where cum is the running count through
    * the block and cnt the block size.
    *
    * Scale: ranks are computed on the (grp, value) DISTINCT relation —
    * the window sorts value-cardinality rows, not data rows — then
    * joined back, so a 100 TB column with a bounded value domain ranks
    * over the domain, and the join is a keyed equi-join Catalyst can
    * plan as broadcast when the domain is small.
    */
  private def doubledRanks(
      df: DataFrame, grp: Column, v: Column, as: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(grp.as("__g"), v.as("__v"))
      .groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .select(col("__g"), col("__v"),
        (col("__cum") * 2L - col("__cnt") + 1L).as(as),
        col("__cnt").as(s"${as}_cnt"))
  }

  /** Spearman rank correlation between two columns per group (Spearman
    * 1904): Pearson's r over tie-averaged ranks — the monotone-
    * association readout that is invariant to any order-preserving
    * transform of either metric, the robust complement to the q87
    * moment correlation.
    *
    * Exactness: ranks are doubled to stay integral under ties
    * ([[doubledRanks]]); all five power sums accumulate in
    * DECIMAL(38,0); the single closing ratio runs in doubles over
    * exact integer factors — casts, ×, ÷ and sqrt are correctly
    * rounded IEEE on identical expression trees in both engines
    * (the q226 Cramér pattern).
    *
    * Scale: two distinct-value windows + two keyed joins + ONE
    * map-side-combinable aggregate; nothing is driver-side.
    */
  def spearmanCorr(
      df: DataFrame,
      grp: Column,
      x: Column,
      y: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val rows = df.filter(grp.isNotNull && x.isNotNull && y.isNotNull)
      .select(grp.as("__g"), x.as("__x"), y.as("__y"))
    val rx = doubledRanks(rows, col("__g"), col("__x"), "rx2")
      .select(col("__g"), col("__v").as("__x"), col("rx2"))
    val ry = doubledRanks(rows, col("__g"), col("__y"), "ry2")
      .select(col("__g"), col("__v").as("__y"), col("ry2"))
    rows.join(rx, Seq("__g", "__x")).join(ry, Seq("__g", "__y"))
      .groupBy(col("__g").as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("rx2").cast(dec)).as("__sx"),
        sum(col("ry2").cast(dec)).as("__sy"),
        // cast to decimal BEFORE the product: doubled ranks reach 2n,
        // so a long×long square overflows past n ≈ 1.5·10⁹ rows/group
        sum(col("rx2").cast(dec) * col("rx2").cast(dec)).as("__sxx"),
        sum(col("ry2").cast(dec) * col("ry2").cast(dec)).as("__syy"),
        sum(col("rx2").cast(dec) * col("ry2").cast(dec)).as("__sxy"))
      .withColumn("__num",
        (col("n").cast(dec) * col("__sxy") - col("__sx") * col("__sy")).cast("double"))
      .withColumn("__d1",
        (col("n").cast(dec) * col("__sxx") - col("__sx") * col("__sx")).cast("double"))
      .withColumn("__d2",
        (col("n").cast(dec) * col("__syy") - col("__sy") * col("__sy")).cast("double"))
      .select(col("grp"), col("n"),
        when(col("__d1") > 0.0 && col("__d2") > 0.0,
          floor(col("__num") / sqrt(col("__d1") * col("__d2")) * 1000000.0 + 0.5)
            .cast("long")).as("rho_ppm"))
  }

  /** Mann–Whitney U rank-sum test (Mann & Whitney 1947) per group:
    * does the `isA` sample stochastically dominate its complement on
    * `v`? The distribution-free two-sample test — no normality
    * assumption, the standard A/B readout for heavy-tailed metrics
    * (latencies, token counts) where Welch's t (q124 lineage) is
    * fragile.
    *
    * Integer-exact: doubled tie-averaged ranks give 2·R_A and
    * 2·U = 2·R_A − n_A(n_A+1) exactly; the tie-corrected z² folds to
    *   z² = (2U − n_A·n_B)² · 3·N·(N−1)
    *        / (n_A·n_B · ((N+1)·N·(N−1) − Σ(t³−t)))
    * — every factor exact in DECIMAL(38,0), one closing double ratio
    * (q242 discipline), reported as z²·10³ with the 3.841 (p<.05)
    * verdict.
    *
    * Scale: one distinct-value window + one aggregate; the tie term
    * Σ(t³−t) falls out of the same (grp, value) relation for free.
    */
  def mannWhitney(
      df: DataFrame,
      grp: Column,
      isA: Column,
      v: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = df.filter(grp.isNotNull && isA.isNotNull && v.isNotNull)
      .select(grp.as("__g"), isA.cast("boolean").as("__a"), v.as("__v"))
      .groupBy(col("__g"), col("__v"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("__ca"),
        count(lit(1)).as("__cnt"))
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__avg2", col("__cum") * 2L - col("__cnt") + 1L)
    val agg = ranked.groupBy(col("__g").as("grp"))
      .agg(sum(col("__ca")).as("n_a"),
        sum(col("__cnt") - col("__ca")).as("n_b"),
        sum((col("__ca") * col("__avg2")).cast(dec)).as("__r2a"),
        sum(col("__cnt").cast(dec) * col("__cnt") * col("__cnt") - col("__cnt"))
          .as("__ties"))
      .withColumn("__N", col("n_a") + col("n_b"))
    agg
      .withColumn("u2",
        (col("__r2a") - (col("n_a").cast(dec) * (col("n_a") + 1L))).cast("long"))
      .withColumn("__dev",
        (col("u2").cast(dec) - col("n_a").cast(dec) * col("n_b")).cast("double"))
      .withColumn("__den",
        (col("n_a").cast(dec) * col("n_b") *
          (col("__N").cast(dec) * (col("__N") + 1L) * (col("__N") - 1L) - col("__ties")))
          .cast("double"))
      .withColumn("z2_milli",
        when(col("n_a") > 0L && col("n_b") > 0L && col("__den") > 0.0,
          floor(col("__dev") * col("__dev") *
            (col("__N").cast(dec) * (col("__N") - 1L) * 3L).cast("double") /
            col("__den") * 1000.0 + 0.5).cast("long")))
      .select(col("grp"), col("n_a"), col("n_b"), col("u2"), col("z2_milli"),
        (col("z2_milli").isNotNull && col("z2_milli") >= 3841L).as("significant_95"))
  }

  /** Two-sample Kolmogorov–Smirnov test per group (Smirnov 1939): the
    * maximum gap between the two samples' empirical CDFs — the
    * distribution-SHAPE complement to [[mannWhitney]]'s location test
    * (a variance change that leaves the medians alone slips past U but
    * not D). Same input shape: per group, the `isA` sample against its
    * complement on `v`.
    *
    * Integer-exact: at each distinct value, the CDF gap cross-
    * multiplies to |c₁·n₂ − c₂·n₁| (an integer — no fractions ever
    * materialize); D_ppm = maxGap·10⁶ div (n₁·n₂), and the α=0.05
    * verdict compares maxGap²·10⁶ against c²·n₁·n₂·(n₁+n₂) with
    * c²(.05) = 1.844466 (Smirnov's asymptotic √(−ln(α/2)/2), shared
    * ppm literal) entirely in DECIMAL(38,0).
    *
    * Scale: one distinct-value running-sum window + one aggregate —
    * identical cost shape to [[mannWhitney]]; at 100 TB the window
    * sorts the value DOMAIN, not the rows.
    */
  def ksTest(
      df: DataFrame,
      grp: Column,
      isA: Column,
      v: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy(col("__g"))
    val cum = df.filter(grp.isNotNull && isA.isNotNull && v.isNotNull)
      .select(grp.as("__g"), isA.cast("boolean").as("__a"), v.as("__v"))
      .groupBy(col("__g"), col("__v"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__a"), 0L).otherwise(1L)).as("__cb"))
      .withColumn("__c1", sum(col("__ca")).over(w))
      .withColumn("__c2", sum(col("__cb")).over(w))
      .withColumn("__n1", sum(col("__ca")).over(wg))
      .withColumn("__n2", sum(col("__cb")).over(wg))
      .withColumn("__gap",
        abs(col("__c1").cast(dec) * col("__n2") - col("__c2").cast(dec) * col("__n1")))
    cum.groupBy(col("__g").as("grp"))
      .agg(max(col("__n1")).as("n_a"), max(col("__n2")).as("n_b"),
        max(col("__gap")).as("__gap"))
      .withColumn("d_ppm",
        when(col("n_a") > 0L && col("n_b") > 0L,
          expr("CAST(__gap * 1000000 div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")))
      // α=.05 verdict in doubles over exact integer factors (identical
      // expression trees both engines — the q247 discipline):
      // gap²·10⁶ ≥ c²ppm · n₁·n₂·(n₁+n₂)
      .withColumn("significant_95",
        col("n_a") > 0L && col("n_b") > 0L &&
          col("__gap").cast("double") * col("__gap").cast("double") * 1000000.0 >=
          lit(1844466.0) *
            (col("n_a").cast(dec) * col("n_b") * (col("n_a") + col("n_b"))).cast("double"))
      .select(col("grp"), col("n_a"), col("n_b"), col("d_ppm"), col("significant_95"))
  }

  /** One-way ANOVA F per group (Fisher 1925): does the metric's mean
    * differ across cells? For each analysis group, cells contribute
    * exact (n_j, Σv, Σv²) triples; the between/within sum-of-squares
    * split runs in micro fixed-point — each cell's s_j²·10⁶ div n_j
    * floors FIRST (the q250 term-wise discipline, so no
    * order-dependent float summation ever happens), then
    * F = SSB·(N−k) / (SSW·(k−1)) closes as one double ratio over
    * exact decimal factors, reported as f_milli with both dofs (the
    * caller brings the F-table; no libm CDF here).
    *
    * Scale: one (grp, cell) aggregate + one grp aggregate — map-side
    * combinable end to end, no window, no join.
    */
  def oneWayAnova(
      df: DataFrame,
      grp: Column,
      cell: Column,
      v: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val cells = df.filter(grp.isNotNull && cell.isNotNull && v.isNotNull)
      .select(grp.as("__g"), cell.as("__c"), v.cast("long").as("__v"))
      .groupBy(col("__g"), col("__c"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__v").cast(dec)).as("__s"),
        sum((col("__v") * col("__v")).cast(dec)).as("__q"))
      // milli (not micro) fixed point: s²·10³ stays under the
      // DECIMAL(38,0) rail for |Σv| ≤ ~3.16·10¹⁷ per cell
      // (s²·10³ ≤ 10³⁸ ⇔ |s| ≤ √10³⁵). Past the rail Spark's
      // non-ANSI overflow would null the term while DuckDB HUGEINT
      // diverges differently — so fail LOUDLY instead of silently
      // corrupting the F statistic.
      .withColumn("__t",
        when(abs(col("__s")) > lit(316000000000000000L).cast(dec),
          expr("raise_error('one_way_anova: cell sum exceeds the " +
            "DECIMAL(38,0) fixed-point rail (|sum(v)| > 3.16e17); " +
            "rescale the metric')").cast(dec))
          .otherwise(expr("__s * __s * 1000 div CAST(__n AS DECIMAL(38,0))")))
    cells.groupBy(col("__g").as("grp"))
      .agg(count(lit(1)).as("k"),
        sum(col("__n")).as("n"),
        sum(col("__s")).as("__S"),
        sum(col("__q")).as("__Q"),
        sum(col("__t")).as("__B"))
      // same rail as the per-cell term: the GROUP total Σv can breach
      // it even when every cell is under — guard both levels.
      .withColumn("__ssb",
        when(abs(col("__S")) > lit(316000000000000000L).cast(dec),
          expr("raise_error('one_way_anova: group sum exceeds the " +
            "DECIMAL(38,0) fixed-point rail (|sum(v)| > 3.16e17); " +
            "rescale the metric')").cast(dec))
          .otherwise(
            col("__B") - expr("__S * __S * 1000 div CAST(n AS DECIMAL(38,0))")))
      .withColumn("__ssw", col("__Q") * lit(1000L) - col("__B"))
      .withColumn("f_milli",
        when(col("k") > 1L && col("n") > col("k") && col("__ssw") > 0,
          floor(col("__ssb").cast("double") *
            (col("n") - col("k")).cast("double") /
            (col("__ssw").cast("double") * (col("k") - 1L).cast("double")) *
            1000.0 + 0.5).cast("long")))
      .select(col("grp"), col("k"), col("n"), col("f_milli"))
  }

  /** Brown–Forsythe test per group (Brown & Forsythe JASA'74 — the
    * robust Levene variant): equality of SPREAD across cells, run as
    * [[oneWayAnova]] on |v − median_cell| with the exact lower median
    * (the ⌈n/2⌉-th order statistic, deterministic under ties). A
    * variance change that leaves means alone slips past ANOVA but not
    * this — the dispersion row of the test family.
    *
    * Scale: one cell-keyed window to pick medians (the q83 exact-
    * percentile posture) + one keyed join + the ANOVA aggregates.
    */
  def brownForsythe(
      df: DataFrame,
      grp: Column,
      cell: Column,
      v: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.filter(grp.isNotNull && cell.isNotNull && v.isNotNull)
      .select(grp.as("__g0"), cell.as("__c0"), v.cast("long").as("__v0"))
    val w = Window.partitionBy(col("__g0"), col("__c0")).orderBy(col("__v0"))
    val wc = Window.partitionBy(col("__g0"), col("__c0"))
    val med = rows
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(wc))
      .filter(col("__rn").cast("long") === expr("(__cnt + 1) div 2"))
      .select(col("__g0"), col("__c0"), col("__v0").as("__med"))
    val z = rows.join(med, Seq("__g0", "__c0"))
      .select(col("__g0"), col("__c0"),
        abs(col("__v0") - col("__med")).as("__z"))
    oneWayAnova(z, col("__g0"), col("__c0"), col("__z"))
  }

  /** Poisson(1) CDF in ppm — the deterministic weight ladder for
    * [[bootstrapCi]]. Public constants of e⁻¹·Σ1/k!; shared verbatim
    * with the oracle so both engines draw identical weights.
    */
  val PoissonCdfPpm: Seq[Long] =
    Seq(367879L, 735759L, 919699L, 981012L, 996340L, 999406L, 999917L)

  /** Deterministic Poisson bootstrap confidence interval for a group
    * mean (Efron 1979; Poisson approximation to the multinomial
    * resample — the form that distributes, used by web-scale A/B
    * systems because each row draws its replica weights independently
    * of every other row). Replica b gives row i weight
    * w ~ Poisson(1) via the md5-derived uniform
    * hash(id:b) mod 10⁶ pushed through the fixed CDF ladder
    * [[PoissonCdfPpm]] — fully deterministic, engine-portable, no RNG
    * state.
    *
    * Output per group: the point mean (micro), the B replica means'
    * empirical CI at ranks lo = ⌈0.025·B⌉+1 and hi = B−⌈0.025·B⌉
    * (B=40 → 2nd and 39th order statistic), and B itself. Integer
    * end-to-end: micro-means via DECIMAL div.
    *
    * Scale: the explode multiplies the SCAN by B but the shuffle
    * carries only (grp, b) partial sums — map-side combine collapses
    * the blowup; the CI pick is a tiny B-row-per-group window.
    */
  def bootstrapCi(
      df: DataFrame,
      grp: Column,
      id: Column,
      v: Column,
      b: Int = 40): DataFrame = {
    require(b >= 8 && b <= 256, s"bootstrapCi: B in [8, 256], got $b")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val cdf = PoissonCdfPpm
    val rows = df.filter(grp.isNotNull && id.isNotNull && v.isNotNull)
      .select(grp.as("__g"), id.cast("string").as("__id"),
        v.cast("long").as("__v"))
    val point = rows.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(__v AS DECIMAL(38,0))) * 1000000 div count(1) AS BIGINT)")
          .as("mean_micro"))
    val weighted = rows
      .withColumn("__b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("__u",
        pmod(TextHash.hash64(concat(col("__id"), lit(":"), col("__b"))), lit(1000000L)))
      .withColumn("__w",
        cdf.zipWithIndex.foldRight(lit(cdf.length.toLong): Column) {
          case ((t, i), rest) => when(col("__u") < t, i.toLong).otherwise(rest)
        })
    val means = weighted.groupBy(col("__g"), col("__b"))
      .agg(sum(col("__w")).as("__sw"),
        sum((col("__w") * col("__v")).cast(dec)).as("__sv"))
      .filter(col("__sw") > 0L)
      .withColumn("__m",
        expr("CAST(__sv * 1000000 div CAST(__sw AS DECIMAL(38,0)) AS BIGINT)"))
    val lo = math.ceil(0.025 * b).toInt + 1
    val hi = b - math.ceil(0.025 * b).toInt
    val wRank = Window.partitionBy(col("__g")).orderBy(col("__m"), col("__b"))
    val ci = means
      .withColumn("__rn", row_number().over(wRank))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_replicas"),
        max(when(col("__rn") === lo, col("__m"))).as("ci_lo_micro"),
        max(when(col("__rn") === hi, col("__m"))).as("ci_hi_micro"))
    point.join(ci, Seq("__g"))
      .select(col("__g").as("grp"), col("n"), col("mean_micro"),
        col("n_replicas"), col("ci_lo_micro"), col("ci_hi_micro"))
  }
}
