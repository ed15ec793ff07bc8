package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series regularization: per-key resampling onto a fixed step
  * grid with forward fill — the standard "make an event stream
  * plottable/joinable" operator (metrics rollups, feature snapshots at
  * training time, gap detection). The reference's watermark protocol
  * reasons about event time but never regularizes it; this closes that
  * gap for the analytics surface.
  *
  * Plan shape (scale posture): one hash aggregation per (key, bucket)
  * collapses raw events to at most one row per grid cell (map-side
  * partial, `max_by` picks the latest observation deterministically);
  * one tiny per-key min/max aggregate sizes the grid; the grid itself
  * is a Generate (`sequence` + `explode`) — never a driver loop; the
  * fill is a single running `last(ignoreNulls)` window per key. Every
  * shuffle is on the key column, and state per key is the grid length,
  * not the event count. At 100 TB the dense-grid contract is the thing
  * to watch: a key spanning years at 1s steps explodes the grid — the
  * `maxCellsPerKey` guard fails fast instead of OOMing an executor.
  */
object TimeSeries {

  /** Resample `df` onto a `stepSeconds` grid per `key`, carrying the
    * latest observation of each attr forward across empty cells.
    *
    * Output: (key, bucket_ts, is_observed, attrs...) — one row per key
    * per grid cell between that key's first and last event (inclusive),
    * `is_observed` false on gap cells whose attrs were carried forward.
    *
    * Determinism: the per-cell survivor is max by (ts, tiebreak) —
    * pass a unique tiebreak (e.g. an event id) so engines can't
    * disagree on equal-ts events.
    */
  def resampleFill(
      df: DataFrame,
      key: Column,
      ts: Column,
      tiebreak: Column,
      attrs: Seq[(String, Column)],
      stepSeconds: Long,
      maxCellsPerKey: Long = 1000000L): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    // floor of an exact double division (unix seconds < 2^53): identical
    // to integer floor-division in any engine for the positive domain
    def bucketOf(t: Column): Column = floor(unix_timestamp(t) / stepSeconds).cast("long")
    val obs = df.select(
      (key.as("__k") +: bucketOf(ts).as("__b") +:
        ts.as("__ts") +: tiebreak.as("__tb") +:
        attrs.map { case (n, c) => c.as(n) }): _*)
    // one row per touched cell: the latest observation wins
    val cellLast = obs
      .groupBy(col("__k"), col("__b"))
      .agg(max_by(
        struct(attrs.map { case (n, _) => col(n) }: _*),
        struct(col("__ts"), col("__tb"))).as("__o"))
    // grid bounds are a tiny per-key aggregate; the guard keeps a
    // years-long key at a 1s step from materializing a runaway Generate
    val grid = df.groupBy(key.as("__k"))
      .agg(min(bucketOf(ts)).as("__lo"), max(bucketOf(ts)).as("__hi"))
      .select(col("__k"),
        explode(sequence(
          col("__lo"),
          when(col("__hi") - col("__lo") < maxCellsPerKey, col("__hi"))
            .otherwise(raise_error(concat(
              lit(s"resampleFill: key "), col("__k").cast("string"),
              lit(s" spans more than $maxCellsPerKey cells at step ${stepSeconds}s")))))
        ).as("__b"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = grid
      .join(cellLast, Seq("__k", "__b"), "left")
      .select(
        (col("__k") +: col("__b") +: col("__o").isNotNull.as("is_observed") +:
          attrs.map { case (n, _) =>
            last(col("__o").getField(n), ignoreNulls = true).over(w).as(n)
          }): _*)
    filled.select(
      (col("__k").as("key") +:
        timestamp_seconds(col("__b") * stepSeconds).as("bucket_ts") +:
        col("is_observed") +:
        attrs.map { case (n, _) => col(n) }): _*)
  }

  /** Per-key gap statistics on the `stepSeconds` grid WITHOUT
    * materializing the grid: observed cells only, a lag window per key,
    * gap = distance between consecutive observed cells minus one.
    *
    * Output: (key, n_observed, missing_cells, max_gap_cells) — a key
    * with no gaps reports 0/0. Cost is one keyed shuffle over the
    * DISTINCT (key, cell) set (at most span/step rows per key), so it
    * is safe to run as a health check where the full
    * [[resampleFill]] grid would be too large to materialize.
    */
  def gapStats(
      df: DataFrame,
      key: Column,
      ts: Column,
      stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val cells = df
      .select(key.as("__k"), floor(unix_timestamp(ts) / stepSeconds).cast("long").as("__b"))
      .distinct()
    val w = Window.partitionBy(col("__k")).orderBy(col("__b"))
    cells
      .select(col("__k"), (col("__b") - lag(col("__b"), 1).over(w) - 1L).as("__gap"))
      .groupBy(col("__k").as("key"))
      .agg(
        count(lit(1)).as("n_observed"),
        coalesce(sum(col("__gap")), lit(0L)).as("missing_cells"),
        coalesce(max(col("__gap")), lit(0L)).as("max_gap_cells"))
  }

  /** Per-key lag/rolling feature generation — the standard supervised
    * time-series feature block (lag_k columns plus rolling
    * count/mean/min/max over the trailing `rollWindow` rows), all from
    * ONE Exchange: every window shares the same (key) partitioning and
    * (ts, tieBreak) ordering, so Catalyst plans a single Sort and the
    * rolling aggregates share one Window node. The rolling mean is
    * exact-decimal sum over the frame divided by the frame count once
    * — the module's cross-engine reproducibility contract (a double
    * running sum is frame-order-dependent).
    *
    * `tieBreak` totally orders same-timestamp rows per key; without a
    * unique tiebreak the lag columns would be nondeterministic under
    * retry. Null values pass through: lags carry them, the rolling
    * count/sum skip them (SQL aggregate semantics on both engines).
    */
  def lagFeatures(
      df: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      tieBreak: Column,
      lags: Seq[Int],
      rollWindow: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(lags.nonEmpty && lags.forall(l => l >= 1 && l <= 10000),
      s"lagFeatures: lags must be in [1, 10000], got $lags")
    require(rollWindow >= 2 && rollWindow <= 100000,
      s"lagFeatures: rollWindow in [2, 100000], got $rollWindow")
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("tiebreak"))
    val roll = w.rowsBetween(-(rollWindow - 1), 0)
    val base = df.select(key.as("key"), ts.as("ts"), tieBreak.as("tiebreak"),
      value.cast("double").as("value"))
    val withLags = lags.foldLeft(base)(
      (acc, l) => acc.withColumn(s"lag_$l", lag(col("value"), l).over(w)))
    withLags
      .withColumn("roll_n", count(col("value")).over(roll))
      .withColumn("roll_mean",
        sum(col("value").cast(DecimalType(38, 10))).over(roll).cast("double") /
          col("roll_n").cast("double"))
      .withColumn("roll_min", min(col("value")).over(roll))
      .withColumn("roll_max", max(col("value")).over(roll))
  }

  /** Trailing-window distinct entities per day — "7-day active users":
    * for every day in the data's span, the count of distinct `entity`
    * values with at least one event in the `windowDays` days ending
    * that day (inclusive). The standard engagement/coverage metric a
    * naive implementation computes with a per-day self-join or a
    * window over raw events — both of which melt at scale.
    *
    * Plan: collapse raw events to distinct (day, entity) FIRST (the
    * aggregate a 100 TB stream shrinks by orders of magnitude), then
    * Generate each surviving pair onto the `windowDays` days it covers
    * (bounded fanout = window length, a scan-stage sequence+explode,
    * never a range self-join), clip to the observed span, and count
    * distinct per day. Shuffles: the (day, entity) dedup and the final
    * per-day count — both keyed; the 1-row span bound rides a
    * broadcast crossJoin.
    */
  def slidingDistinct(
      df: DataFrame,
      ts: Column,
      entity: Column,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1 && windowDays <= 3660,
      s"slidingDistinct: windowDays in [1, 3660], got $windowDays")
    val du = df.filter(ts.isNotNull && entity.isNotNull)
      .select(to_date(ts).as("__d"), entity.as("__e"))
      .distinct()
    val span = du.agg(min(col("__d")).as("__lo"), max(col("__d")).as("__hi"))
    du.select(
        explode(sequence(col("__d"), date_add(col("__d"), windowDays - 1))).as("day"),
        col("__e"))
      .crossJoin(broadcast(span))
      .filter(col("day") >= col("__lo") && col("day") <= col("__hi"))
      .groupBy(col("day"))
      .agg(countDistinct(col("__e")).as("active_entities"))
  }

  /** Time-decayed sum per group — every observation weighted by
    * 2^(−age/halfLife) with age in whole days behind the data's max
    * date (integer division: the weight halves stepwise every
    * `halfLifeDays`). The recency-weighted aggregate feature stores
    * serve ("decayed 30-day spend"), computable as one scan +
    * aggregate because the decay is anchored at a fixed as-of date,
    * not per-row recursion.
    *
    * Exactness contract: ages are exact integers, so every weight is
    * an exact power of two (2^(−k) is dyadic; any engine's pow(2, −k)
    * is exact — no libm last-ulp hazard, which is why the base is 2
    * and the exponent integer rather than a smooth e^(−λt)); each
    * value·weight product is one IEEE multiply. The decayed sum is
    * then MICRO-QUANTIZED: each term rounds to an integer count of
    * 1e-6 units and the sum runs in exact DECIMAL(38,0) integers,
    * divided back once at the end. The quantization is the
    * reproducibility contract, not a shortcut — a decayed product has
    * an arbitrary binary tail, and casting such doubles straight to a
    * fixed-scale decimal rounds differently across engines at the
    * scale digit (a tie can't exist — x·10^6 half-integral requires a
    * 5^6 denominator, impossible for a dyadic — so round-to-nearest
    * agrees everywhere). Rows older than `maxAgeDays` are excluded
    * outright; null ts/value/group rows are excluded.
    *
    * Scale: the as-of date is a 1-row broadcast; everything else is a
    * scan-stage expression + one keyed aggregate with map-side
    * partials.
    */
  def decayedSum(
      df: DataFrame,
      grp: Column,
      ts: Column,
      value: Column,
      halfLifeDays: Int,
      maxAgeDays: Int = 3650): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(halfLifeDays >= 1, s"decayedSum: halfLifeDays >= 1 required, got $halfLifeDays")
    require(maxAgeDays >= 1, s"decayedSum: maxAgeDays >= 1 required, got $maxAgeDays")
    val dec = DecimalType(38, 10)
    val v = value.cast("double")
    val rows = df.filter(ts.isNotNull && v.isNotNull && grp.isNotNull)
      .select(grp.as("grp"), to_date(ts).as("__d"), v.as("__v"))
    val asOf = rows.agg(max(col("__d")).as("__md"))
    val age = datediff(col("__md"), col("__d"))
    rows.crossJoin(broadcast(asOf))
      .filter(age <= maxAgeDays)
      .select(col("grp"),
        // floor(age/hl) is exact: integer-valued quotients of exact
        // small ints divide exactly in IEEE, and fractional ones sit
        // a full fraction away from the floor boundary
        round(col("__v") *
            pow(lit(2.0), -floor(age / lit(halfLifeDays.toDouble)).cast("double")) *
            lit(1000000.0))
          .cast(DecimalType(38, 0)).as("__dvMicro"),
        col("__v"))
      .groupBy(col("grp"))
      .agg(
        (sum(col("__dvMicro")).cast("double") / lit(1000000.0)).as("decayed_sum"),
        sum(col("__v").cast(dec)).cast("double").as("plain_sum"),
        count(lit(1)).as("n"))
  }

  /** Per-key grid resampling with LINEAR interpolation — the numeric
    * complement of [[resampleFill]]'s carry-forward: empty grid cells
    * between two observed cells get the straight-line value
    * v_prev + (b − b_prev)·(v_next − v_prev)/(b_next − b_prev); cells
    * before the first or after the last observation stay null (LOCF
    * extrapolates a state; a measurement should not be extrapolated).
    *
    * The per-cell anchor observation is max by (ts, tiebreak) among
    * the cell's NON-NULL values — null measurements don't anchor, they
    * get interpolated across like missing cells. `is_observed` marks
    * cells that had a non-null observation.
    *
    * Determinism: the interpolation expression is a fixed shape of
    * IEEE double ops — ((b−bp)·(vn−vp))/(bn−bp) then +vp — reproduced
    * verbatim by the oracle, so no accumulation-order hazard exists
    * (nothing is summed in floating point).
    *
    * Scale: identical plan to [[resampleFill]] — per-key grid bounds
    * (guarded by `maxCellsPerKey`), one grid join, and FOUR window
    * expressions that all share one (key) Exchange and one (bucket)
    * Sort: two backward (last non-null value/bucket) and two forward
    * (first non-null value/bucket) frames.
    */
  def interpolateFill(
      df: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      tiebreak: Column,
      stepSeconds: Long,
      maxCellsPerKey: Long = 1000000L): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    def bucketOf(t: Column): Column = floor(unix_timestamp(t) / stepSeconds).cast("long")
    val v = value.cast("double")
    val obs = df.filter(ts.isNotNull && v.isNotNull).select(
      key.as("__k"), bucketOf(ts).as("__b"), ts.as("__ts"), tiebreak.as("__tb"), v.as("__v"))
    val cellLast = obs
      .groupBy(col("__k"), col("__b"))
      .agg(max_by(col("__v"), struct(col("__ts"), col("__tb"))).as("__v"))
    val grid = obs.groupBy(col("__k"))
      .agg(min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
      .select(col("__k"),
        explode(sequence(
          col("__lo"),
          when(col("__hi") - col("__lo") < maxCellsPerKey, col("__hi"))
            .otherwise(raise_error(concat(
              lit(s"interpolateFill: key "), col("__k").cast("string"),
              lit(s" spans more than $maxCellsPerKey cells at step ${stepSeconds}s")))))
        ).as("__b"))
    val wPrev = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(1, Window.unboundedFollowing)
    val joined = grid.join(cellLast, Seq("__k", "__b"), "left")
    val bp = last(when(col("__v").isNotNull, col("__b")), ignoreNulls = true).over(wPrev)
    val vp = last(when(col("__v").isNotNull, col("__v")), ignoreNulls = true).over(wPrev)
    val bn = first(when(col("__v").isNotNull, col("__b")), ignoreNulls = true).over(wNext)
    val vn = first(when(col("__v").isNotNull, col("__v")), ignoreNulls = true).over(wNext)
    joined
      .select(col("__k"), col("__b"), col("__v"),
        bp.as("__bp"), vp.as("__vp"), bn.as("__bn"), vn.as("__vn"))
      .select(
        col("__k").as("key"),
        timestamp_seconds(col("__b") * stepSeconds).as("bucket_ts"),
        col("__v").isNotNull.as("is_observed"),
        when(col("__v").isNotNull, col("__v"))
          .otherwise(when(col("__vp").isNotNull && col("__vn").isNotNull,
            col("__vp") +
              ((col("__b") - col("__bp")).cast("double") * (col("__vn") - col("__vp"))) /
                (col("__bn") - col("__bp")).cast("double")))
          .as("value_interp"))
  }

  /** Single change-point detection per key: the split of the ordered
    * series that maximizes |mean(left) − mean(right)| with both
    * segments at least `minSegment` rows — the binary-segmentation
    * step stat (CUSUM family) that flags level shifts in a metric
    * stream (deploy regressions, feed cutovers, sensor drift).
    *
    * Output per key: split position (1-based, the LAST row of the left
    * segment), its timestamp, both segment means, and the statistic.
    * Keys with fewer than 2·minSegment rows have no eligible split and
    * are absent (no-evidence contract). Tie-break: the EARLIEST
    * position among equal statistics, via one max_by over
    * (stat, −position) — deterministic because positions are unique.
    *
    * Determinism: prefix sums accumulate in exact DECIMAL(38,10)
    * (exact and associative, so frame evaluation order is irrelevant)
    * and every per-row formula — c/i, (S−c)/(n−i), abs of the
    * difference — is a fixed shape of IEEE doubles the oracle
    * reproduces verbatim.
    *
    * Scale: ONE keyed Exchange and one sort serve all four windows
    * (row_number, prefix sum, partition count/total); the candidate
    * relation then collapses key-wise in a single max_by aggregate.
    * Per-key serial state is O(1) per row — no per-key materialized
    * segment pairs, no self-join over split candidates.
    */
  def changePoint(
      df: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      tiebreak: Column,
      minSegment: Int = 5): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(minSegment >= 1, s"changePoint: minSegment >= 1 required, got $minSegment")
    val dec = DecimalType(38, 10)
    val v = value.cast("double")
    val rows = df.filter(ts.isNotNull && v.isNotNull)
      .select(key.as("__k"), ts.as("__ts"), tiebreak.as("__tb"), v.as("__v"))
    val wOrd = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__tb"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("__k"))
    val scored = rows
      .withColumn("__i", row_number().over(wOrd).cast("long"))
      .withColumn("__c", sum(col("__v").cast(dec)).over(wCum).cast("double"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__s", sum(col("__v").cast(dec)).over(wAll).cast("double"))
    val i = col("__i").cast("double")
    val n = col("__n").cast("double")
    val meanL = col("__c") / i
    val meanR = (col("__s") - col("__c")) / (n - i)
    scored
      .filter(col("__i") >= minSegment && col("__i") <= col("__n") - minSegment)
      .select(col("__k"), col("__i"), col("__ts"),
        meanL.as("__ml"), meanR.as("__mr"), abs(meanL - meanR).as("__stat"))
      .groupBy(col("__k").as("key"))
      .agg(max_by(
        struct(col("__i").as("split_idx"), col("__ts").as("split_ts"),
          col("__ml").as("mean_left"), col("__mr").as("mean_right"),
          col("__stat").as("stat")),
        struct(col("__stat"), (-col("__i")).as("__negi"))).as("__best"))
      .select(col("key"), col("__best.split_idx"), col("__best.split_ts"),
        col("__best.mean_left"), col("__best.mean_right"), col("__best.stat"))
  }

  /** New-entity curve: per grid day, how many entities appear for the
    * FIRST time, and the running total — the corpus/user growth view
    * every ingest dashboard opens with, and the denominator for
    * retention ratios.
    *
    * Dedup-first discipline (cf. [[slidingDistinct]]): the corpus
    * collapses to one (entity → first day) row via min-aggregate
    * BEFORE anything touches a window, so the windowed relation is
    * bounded by distinct days, not events. The running sum is an
    * unpartitioned window over that day-sized relation — thousands of
    * rows at any corpus scale (documented single-partition step; the
    * event-scale work is all in the keyed first-seen aggregate).
    */
  def firstSeenCumulative(
      df: DataFrame,
      entity: Column,
      ts: Column): DataFrame = {
    val firstDay = df.filter(ts.isNotNull && entity.isNotNull)
      .select(entity.as("__e"), to_date(ts).as("__d"))
      .groupBy(col("__e")).agg(min(col("__d")).as("__d0"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    firstDay.groupBy(col("__d0").as("day"))
      .agg(count(lit(1)).as("n_new"))
      .withColumn("n_cumulative", sum(col("n_new")).over(w))
  }

  /** OHLC (open/high/low/close) bars: per key per `stepSeconds` bucket,
    * the first and last observation plus extremes and exact volume —
    * the canonical downsampling for any metered value stream (ticks,
    * sensor readings, spend counters).
    *
    * ONE hash aggregate, no window: open/close ride a lexicographic
    * struct-min/max over (ts, tiebreak, value) — with a unique
    * tiebreak the survivor is deterministic even on equal timestamps,
    * and the aggregate partials combine map-side (a window formulation
    * would shuffle every raw row into a per-key sort instead).
    * Volume is the exact-decimal sum cast to double once.
    */
  def ohlcBars(
      df: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      tiebreak: Column,
      stepSeconds: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(stepSeconds > 0, s"ohlcBars: stepSeconds > 0 required, got $stepSeconds")
    val dec = DecimalType(38, 10)
    df.filter(ts.isNotNull && value.isNotNull)
      .select(key.as("__k"),
        floor(unix_timestamp(ts) / stepSeconds).cast("long").as("__b"),
        ts.as("__ts"), tiebreak.as("__tb"), value.cast("double").as("__v"))
      .groupBy(col("__k"), col("__b"))
      .agg(
        min(struct(col("__ts"), col("__tb"), col("__v"))).as("__first"),
        max(struct(col("__ts"), col("__tb"), col("__v"))).as("__last"),
        min(col("__v")).as("low"),
        max(col("__v")).as("high"),
        sum(col("__v").cast(dec)).cast("double").as("volume"),
        count(lit(1)).as("n"))
      .select(col("__k").as("key"), col("__b").as("bucket"),
        col("__first.__v").as("open"), col("high"), col("low"),
        col("__last.__v").as("close"), col("volume"), col("n"))
  }

  /** Rolling least-squares slope of `value` against event-time seconds,
    * over the trailing `windowRows` observations per key — the trend
    * feature a drift monitor or a feature-store backfill computes per
    * reading. Closed-form OLS over window sums; every sum is
    * exact-decimal cast to double once, and the final slope is ONE
    * fixed-shape double expression (n·Σxy − Σx·Σy)/(n·Σx² − Σx·Σx), so
    * two engines computing it from the same sums agree bit-for-bit.
    * Null when the window holds < 2 rows or zero x-variance (equal
    * timestamps throughout).
    *
    * `epochOffsetSeconds` translates event time toward zero before the
    * regression (slope is translation-invariant). This is both a
    * numerics and a portability lever: with x−offset and value
    * integer-valued, every summed term (x, y, x², xy) is an
    * integer-valued double below 2⁵³, whose decimal cast is EXACT in
    * any engine — raw epoch seconds squared (~10¹⁸) survive Spark's
    * exact BigDecimal path but lose low digits in engines that scale
    * through a double multiply. Pass the dataset era (e.g. Jan 1 of
    * the first year) and a pre-scaled integer value column for
    * cross-engine bit-reproducibility; with the default 0 the result
    * is still exact within Spark.
    *
    * One Exchange + one Sort per key feeds all five window sums (same
    * frame, same ordering — Spark computes them in a single
    * WindowExec). Ordering ties are broken by `tiebreak` so the frame
    * contents are deterministic.
    */
  def rollingSlope(
      df: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      tiebreak: Column,
      windowRows: Int,
      epochOffsetSeconds: Long = 0L): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(windowRows >= 2 && windowRows <= 100000,
      s"rollingSlope: windowRows in [2, 100000] required, got $windowRows")
    val dec = DecimalType(38, 10)
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__tb"))
      .rowsBetween(-(windowRows - 1), Window.currentRow)
    def dsumW(c: Column): Column = sum(c.cast(dec)).over(w).cast("double")
    val base = df.filter(ts.isNotNull && value.isNotNull)
      .select(key.as("__k"), ts.as("__ts"), tiebreak.as("__tb"),
        (unix_timestamp(ts) - lit(epochOffsetSeconds)).cast("double").as("__x"),
        value.cast("double").as("__y"))
    val den = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    base
      .withColumn("__n", count(lit(1)).over(w).cast("double"))
      .withColumn("__sx", dsumW(col("__x")))
      .withColumn("__sy", dsumW(col("__y")))
      .withColumn("__sxx", dsumW(col("__x") * col("__x")))
      .withColumn("__sxy", dsumW(col("__x") * col("__y")))
      .select(col("__k").as("key"), col("__ts").as("ts"), col("__tb").as("tiebreak"),
        col("__y").as("value"),
        when(col("__n") >= 2 && den =!= 0.0,
          (col("__n") * col("__sxy") - col("__sx") * col("__sy")) / den)
          .as("slope"))
  }

  /** Time-weighted average of a sampled value per key — trapezoidal
    * integration between consecutive observations divided by the
    * observed span, the correct mean for irregularly-sampled gauges
    * (a plain avg() over-weights bursts of samples).
    *
    * One LEAD window per key (ordered by ts with a unique tiebreak)
    * forms the segments; segment areas accumulate through the exact
    * decimal path and the result is ONE double division:
    * Σ((vᵢ+vᵢ₊₁)·Δtᵢ) / (2·(t_n − t_0)). Keys with a single
    * observation (zero span) yield null — no integration evidence.
    *
    * Cross-engine bit-reproducibility contract (cf. [[rollingSlope]]):
    * pass an integer-valued `value` (pre-scaled, e.g. centi-units) so
    * each trapezoid term (v+v′)·Δt is an integer-valued double whose
    * decimal cast is exact everywhere; rescale the result downstream.
    */
  def timeWeightedAvg(
      df: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      tiebreak: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 10)
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__tb"))
    val base = df.filter(ts.isNotNull && value.isNotNull)
      .select(key.as("__k"), ts.as("__ts"), tiebreak.as("__tb"),
        unix_timestamp(ts).cast("double").as("__t"),
        value.cast("double").as("__v"))
      .withColumn("__tn", lead(col("__t"), 1).over(w))
      .withColumn("__vn", lead(col("__v"), 1).over(w))
    base.groupBy(col("__k"))
      .agg(
        sum(when(col("__tn").isNotNull,
          ((col("__v") + col("__vn")) * (col("__tn") - col("__t"))).cast(dec)))
          .cast("double").as("__area2"),
        min(col("__t")).as("__t0"), max(col("__t")).as("__t1"),
        count(lit(1)).as("n_samples"))
      .select(col("__k").as("key"),
        when(col("__t1") > col("__t0"),
          col("__area2") / (lit(2.0) * (col("__t1") - col("__t0"))))
          .as("twa"),
        col("n_samples"))
  }

  /** Seasonal-naive anomaly scoring: each event is compared against
    * the mean and spread of its OWN phase-of-week slot (hour index mod
    * 168) for its key — the "same hour last weeks" baseline that
    * catches a metric spiking at 3am Tuesday without flagging every
    * Friday peak. Residual = value − slot baseline; anomalous when
    * |residual| > 3·slot-sd.
    *
    * The phase bucket is a pure integer expression off epoch seconds
    * (div 3600 mod 168) — deliberately not calendar-local (no tz/DST
    * logic in the hot path); slot statistics come from exact decimal
    * sums, and baseline/sd are micro-quantized before the residual
    * and the 3σ compare so engine-specific FMA contraction of
    * n·Σv² − (Σv)² can't flip a flag.
    *
    * Plan: one (key, phase) aggregate (at most 168·|keys| rows,
    * broadcast back via the stats join), residuals in the scan stage.
    * Degenerate slots (n < 2 or zero variance) flag nothing.
    */
  def seasonalNaiveResidual(
      df: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      tiebreak: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 10)
    def q6(c: Column): Column = floor(c * 1000000.0 + 0.5) / 1000000.0
    val base = df.filter(ts.isNotNull && value.isNotNull && key.isNotNull)
      .select(key.as("key"), ts.as("__ts"), tiebreak.as("__tb"),
        value.cast("double").as("__v"),
        (floor(unix_timestamp(ts) / 3600).cast("long") % 168L).as("phase"))
    val stats = base.groupBy(col("key"), col("phase"))
      .agg(
        count(lit(1)).cast("double").as("__n"),
        sum(col("__v").cast(dec)).cast("double").as("__s1"),
        sum((col("__v") * col("__v")).cast(dec)).cast("double").as("__s2"))
      .select(col("key"), col("phase"), col("__n"),
        q6(col("__s1") / col("__n")).as("baseline"),
        when(col("__n") >= 2,
          q6(sqrt(greatest((col("__n") * col("__s2") - col("__s1") * col("__s1")) /
            (col("__n") * col("__n")), lit(0.0)))))
          .as("__sd"))
    base.join(stats, Seq("key", "phase"))
      .select(col("key"), col("phase"), col("__ts").as("ts"), col("__tb").as("tiebreak"),
        col("__v").as("value"), col("baseline"),
        (col("__v") - col("baseline")).as("residual"),
        coalesce(abs(col("__v") - col("baseline")) > lit(3.0) * col("__sd"),
          lit(false)).as("is_anomaly"))
  }

  /** Inter-arrival profile per key: gap count, mean gap, coefficient
    * of variation and Goh–Barabási burstiness B = (σ−μ)/(σ+μ) over
    * the seconds between consecutive events — the standard telemetry
    * screen separating periodic (B→−1), Poisson (B≈0) and bursty
    * (B→1) sources (cf. [[gapStats]], which thresholds large gaps;
    * this characterizes the whole distribution).
    *
    * Gaps are exact integer second diffs (one LAG window per key), so
    * Σd and Σd² accumulate exactly through the decimal path; σ is
    * micro-quantized before the ratio forms (the FMA-contraction
    * guard). Keys with < 2 events have no gaps and are absent; zero
    * mean (all simultaneous) yields null cv/burstiness.
    */
  def interArrivalProfile(
      df: DataFrame,
      key: Column,
      ts: Column,
      tiebreak: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 10)
    val w = Window.partitionBy(col("key")).orderBy(col("__ts"), col("__tb"))
    val base = df.filter(ts.isNotNull && key.isNotNull)
      .select(key.as("key"), ts.as("__ts"), tiebreak.as("__tb"),
        unix_timestamp(ts).as("__t"))
      .withColumn("__d", (col("__t") - lag(col("__t"), 1).over(w)).cast("double"))
      .filter(col("__d").isNotNull)
    base.groupBy(col("key"))
      .agg(
        count(lit(1)).cast("double").as("__n"),
        sum(col("__d").cast(dec)).cast("double").as("__s1"),
        sum((col("__d") * col("__d")).cast(dec)).cast("double").as("__s2"))
      .select(col("key"), col("__n").cast("long").as("n_gaps"),
        (col("__s1") / col("__n")).as("mean_gap"),
        (floor(sqrt(greatest((col("__n") * col("__s2") - col("__s1") * col("__s1")) /
          (col("__n") * col("__n")), lit(0.0))) * 1000000.0 + 0.5) / 1000000.0).as("sd_gap"))
      .select(col("key"), col("n_gaps"), col("mean_gap"), col("sd_gap"),
        when(col("mean_gap") > 0, col("sd_gap") / col("mean_gap")).as("cv"),
        when(col("sd_gap") + col("mean_gap") > 0,
          (col("sd_gap") - col("mean_gap")) / (col("sd_gap") + col("mean_gap")))
          .as("burstiness"))
  }

  /** Rolling-median / MAD anomaly screen — the robust sibling of the
    * mean±3σ slot screen (q194): per key, each point is compared to
    * the MEDIAN of its trailing `window` points and flagged when it
    * deviates by more than `k`× the window's median absolute
    * deviation. Median/MAD don't move when the anomaly itself enters
    * the window — the masking problem that makes mean/σ screens miss
    * bursts of outliers — which is why process-control pipelines run
    * the Hampel-style filter this implements.
    *
    * Both medians are LOWER medians (element (n+1)÷2 of the sorted
    * window — no midpoint averaging), so the outputs are VALUES FROM
    * THE DATA, never derived floats; the only arithmetic is the
    * |x−med| deviations and the k·mad compare, single IEEE ops any
    * engine rounds identically. Warm-up rows (fewer than `minPoints`
    * in the window) never flag.
    *
    * Scale: one key-partitioned window; per-row state is the K-bounded
    * frame buffer (collect_list + two in-row array sorts, O(K log K)
    * per point with K a small constant) — no second shuffle, nothing
    * corpus-bounded in memory.
    */
  /** Lead–lag cross-correlation screen: Pearson r between series `a`
    * at time t and series `b` at time t+lag, for every integer lag in
    * [0, maxLag] — the "does A lead B, and by how much" table (ad
    * spend → purchases, errors → churn, clicks → signups). The peak
    * lag is the lead time; r at lag 0 is plain contemporaneous
    * correlation.
    *
    * Determinism: the five sums per lag go through the exact-decimal
    * contract; r's numerator/denominator are fixed expression trees
    * and the final ratio is micro-quantized (q186 guard). Lags with
    * fewer than 2 overlapping points or a degenerate variance report
    * null. Both inputs are (t, v) relations with integer time indexes
    * — compose the hourly-mean resample first, as q227 does.
    *
    * Scale: the `a` side replicates ×(maxLag+1) (a broadcast-sized
    * constant), then ONE equi-join on the shifted time key and one
    * lag-keyed aggregate — never a range join, never a window over
    * the full series.
    */
  def crossCorrelation(
      a: DataFrame, ta: Column, va: Column,
      b: DataFrame, tb: Column, vb: Column,
      maxLag: Int): DataFrame = {
    require(maxLag >= 0 && maxLag <= 10000,
      s"crossCorrelation: maxLag in [0, 10000] required, got $maxLag")
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 10)
    val q6 = (c: Column) => floor(c * 1000000.0 + 0.5) / 1000000.0
    def ds(c: Column) = sum(c.cast(dec)).cast("double")
    val left = a.filter(ta.isNotNull && va.isNotNull)
      .select(ta.cast("long").as("__t"), va.cast("double").as("__va"))
      .select(col("__t"), col("__va"), explode(sequence(lit(0), lit(maxLag))).as("lag"))
      .select((col("__t") + col("lag")).as("__tb"), col("lag").cast("long").as("lag"),
        col("__va"))
    val right = b.filter(tb.isNotNull && vb.isNotNull)
      .select(tb.cast("long").as("__tb"), vb.cast("double").as("__vb"))
    left.join(right, Seq("__tb"))
      .groupBy(col("lag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        ds(col("__va")).as("sa"), ds(col("__vb")).as("sb"),
        ds(col("__va") * col("__va")).as("saa"),
        ds(col("__vb") * col("__vb")).as("sbb"),
        ds(col("__va") * col("__vb")).as("sab"))
      .withColumn("__d1", col("n") * col("saa") - col("sa") * col("sa"))
      .withColumn("__d2", col("n") * col("sbb") - col("sb") * col("sb"))
      .select(col("lag"), col("n").cast("long").as("n"),
        when(col("n") >= 2.0 && col("__d1") > 0.0 && col("__d2") > 0.0,
          q6((col("n") * col("sab") - col("sa") * col("sb")) /
            sqrt(col("__d1") * col("__d2")))).as("r"))
  }

  /** Classical additive seasonal-trend decomposition (the moving-
    * average decomposition underlying STL, Kendall/Cleveland lineage):
    * value = trend + seasonal + residual, computed per key over an
    * ORDINAL series —
    *
    *   - trend: the standard 2×P centered moving average for even
    *     period P (full-window sum with half-weighted endpoints),
    *     null at the P/2 edges;
    *   - seasonal: per ordinal phase (rowidx mod P), the mean of the
    *     detrended values, CENTERED by subtracting the cross-phase
    *     mean so the component sums to ~0 over a cycle;
    *   - residual: value − trend − seasonal.
    *
    * Every mean runs through the exact-decimal sum contract and every
    * derived double is micro-quantized (the q186 FMA-contraction
    * guard), so the decomposition replays bit-identically elsewhere.
    * The series is ordinal by contract — the caller supplies regular
    * samples (compose [[resampleFill]] first for gappy data); phase is
    * row-index-derived, so gaps shift phase ALIGNMENT, never
    * determinism. Duplicate (key, t) rows would make the t-order
    * nondeterministic, so uniqueness is enforced in-plan (raise_error
    * on a same-window lag probe), not merely documented.
    *
    * Scale: one key-partitioned window pass (row index, MA sums,
    * lag/lead endpoints — one Exchange+Sort), one (key, phase)
    * aggregate, one key-level P-row mean joined back broadcast-sized.
    */
  def decompose(
      df: DataFrame,
      key: Column,
      t: Column,
      value: Column,
      period: Int): DataFrame = {
    require(period >= 4 && period % 2 == 0 && period <= 8192,
      s"decompose: even period in [4, 8192] required, got $period")
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 10)
    val q6 = (c: Column) => floor(c * 1000000.0 + 0.5) / 1000000.0
    val k = period / 2
    val ord = Window.partitionBy(col("key")).orderBy(col("t"))
    val ma = ord.rowsBetween(-k, k)
    val based = df.filter(key.isNotNull && t.isNotNull && value.isNotNull)
      .select(key.as("key"), t.as("t"), value.cast("double").as("value"))
      // Unique-(key, t) precondition enforced in-plan: with duplicate
      // timestamps the t-ordered row_number/phase/lag/lead — hence
      // trend, seasonal, residual — would be nondeterministic. The
      // lag probe rides the SAME window spec (no extra Exchange).
      .withColumn("rn",
        when(lag(col("t"), 1).over(ord) === col("t"),
          raise_error(concat(lit("decompose: duplicate (key, t) at key="),
            col("key").cast("string"), lit(", t="), col("t").cast("string"),
            lit(" — the series must be unique per (key, t); resampleFill first"))))
          .otherwise(row_number().over(ord)))
      .withColumn("phase", expr(s"(rn - 1) % $period"))
      .withColumn("__full", sum(col("value").cast(dec)).over(ma).cast("double"))
      .withColumn("__cnt", count(lit(1)).over(ma))
      .withColumn("__el", lag(col("value"), k).over(ord))
      .withColumn("__er", lead(col("value"), k).over(ord))
      .withColumn("trend",
        when(col("__cnt") === period + 1,
          q6((col("__full") - lit(0.5) * col("__el") - lit(0.5) * col("__er"))
            / period)))
      .withColumn("__det", col("value") - col("trend"))
    val phaseMeans = based.filter(col("__det").isNotNull)
      .groupBy(col("key"), col("phase"))
      .agg((sum(col("__det").cast(dec)).cast("double") /
        count(lit(1)).cast("double")).as("__sp"))
    val centers = phaseMeans.groupBy(col("key"))
      .agg((sum(col("__sp").cast(dec)).cast("double") /
        count(lit(1)).cast("double")).as("__c"))
    based
      .join(phaseMeans, Seq("key", "phase"), "left")
      .join(broadcast(centers), Seq("key"), "left")
      .withColumn("seasonal", q6(col("__sp") - col("__c")))
      .withColumn("residual",
        when(col("trend").isNotNull && col("seasonal").isNotNull,
          q6(col("value") - col("trend") - col("seasonal"))))
      .select(col("key"), col("t"), col("rn"), col("phase"), col("value"),
        col("trend"), col("seasonal"), col("residual"))
  }

  /** SAX-style symbolization (Lin/Keogh DMKD'07, with data-driven
    * breakpoints): per key, the value series in time order is cut
    * into fixed-length segments, each segment reduced to its PAA mean
    * (Piecewise Aggregate Approximation — the exact-decimal mean, the
    * repo's reproducible-sum contract), and each mean discretized
    * into one of four symbols a–d by the GLOBAL PAA quartiles. The
    * classic SAX uses Gaussian breakpoints on a z-normalized series;
    * the quartile variant keeps every number an exact percentile of
    * real data (the q83 parity contract) — equal-probability symbols
    * without assuming normality, and nothing an external engine can't
    * replay. Downstream, symbol words feed motif counting, anomaly
    * grammars, and cheap series similarity (symbols match ⇒ PAA
    * distance bounded — the SAX lower-bounding idea).
    *
    * Scale: one key-ordered window (row index), one (key, segment)
    * aggregate on the same partitioning, one 1-row broadcast of the
    * three breakpoints. Exact `percentile` carries q83's bounded-
    * domain caveat; swap approx_percentile past that.
    */
  def saxSymbols(
      df: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      tiebreak: Column,
      segLen: Int): DataFrame = {
    require(segLen >= 2 && segLen <= 65536,
      s"saxSymbols: segLen in [2, 65536] required, got $segLen")
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(col("key")).orderBy(col("__ts"), col("__tb"))
    val paa = df.filter(key.isNotNull && ts.isNotNull && value.isNotNull)
      .select(key.as("key"), ts.as("__ts"), tiebreak.as("__tb"),
        value.cast("double").as("__v"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("segment", expr(s"(__rn - 1) div $segLen"))
      .groupBy(col("key"), col("segment"))
      .agg(
        count(lit(1)).as("n_points"),
        (sum(col("__v").cast(DecimalType(38, 10))).cast("double") /
          count(lit(1)).cast("double")).as("paa"))
    val bps = paa.agg(
      percentile(col("paa"), lit(0.25)).as("__b1"),
      percentile(col("paa"), lit(0.5)).as("__b2"),
      percentile(col("paa"), lit(0.75)).as("__b3"))
    paa.crossJoin(broadcast(bps))
      .select(col("key"), col("segment"), col("n_points"), col("paa"),
        when(col("paa") <= col("__b1"), "a")
          .when(col("paa") <= col("__b2"), "b")
          .when(col("paa") <= col("__b3"), "c")
          .otherwise("d").as("symbol"))
  }

  def rollingMedianMad(
      df: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      tiebreak: Column,
      window: Int,
      k: Double = 3.0,
      minPoints: Int = 5): DataFrame = {
    require(window >= 2 && window <= 4096,
      s"rollingMedianMad: window in [2, 4096] required, got $window")
    require(minPoints >= 1 && minPoints <= window,
      s"rollingMedianMad: 1 <= minPoints <= window required, got $minPoints")
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("__tb"))
      .rowsBetween(-(window - 1), Window.currentRow)
    val medIdx = (arr: Column) => ((size(arr) + 1) / 2).cast("int")
    df.filter(key.isNotNull && ts.isNotNull && value.isNotNull)
      .select(key.as("key"), ts.as("ts"), tiebreak.as("__tb"),
        value.cast("double").as("value"))
      .withColumn("__arr", array_sort(collect_list(col("value")).over(w)))
      .withColumn("n_win", size(col("__arr")).cast("long"))
      .withColumn("med", element_at(col("__arr"), medIdx(col("__arr"))))
      .withColumn("mad",
        element_at(
          array_sort(transform(col("__arr"), x => abs(x - col("med")))),
          medIdx(col("__arr"))))
      .withColumn("is_anomaly",
        col("n_win") >= minPoints && abs(col("value") - col("med")) > lit(k) * col("mad"))
      .select(col("key"), col("ts"), col("__tb").as("tiebreak"), col("value"),
        col("n_win"), col("med"), col("mad"), col("is_anomaly"))
  }
}
