package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ordered-sequence analytics over an event log: funnel completion and
  * cohort retention. The reference's event surface stops at windowed
  * counts (`ingest.py` has no sequence operators at all); these close
  * the "did A then B then C" and "how many came back week N" questions
  * every event warehouse gets asked.
  *
  * Scale posture: both operators shuffle ONLY on the user key, once —
  * funnel steps are sequential `min`-over-partition windows that all
  * share the same partitioning (one Exchange, reused by every Window
  * node), and retention is a per-user window followed by a
  * (cohort, offset) count. No self-joins, no per-step passes over the
  * log, state per user is O(steps). A 100 TB event log funnels in one
  * shuffle wave.
  */
object Funnel {

  /** Earliest ordered completion time of each funnel step per user.
    *
    * Step `i` counts only at-or-after step `i-1`'s completion time
    * (the defining funnel constraint — a purchase before the first
    * view is not a funnel conversion), and, when `maxSpanSeconds` is
    * set, within that span of step 1. Ties on the timestamp resolve
    * toward completion (`>=`), matching the common analytics
    * convention that a same-instant next step converts — EXCEPT when a
    * step repeats the event type of ANY earlier step (view → view, or
    * view → click → view): the repeat must land strictly after the
    * earlier same-type step's completion time, so one single event can
    * never complete two steps. (A second same-type event at the
    * identical timestamp is indistinguishable from the first at this
    * granularity and does not convert; disambiguate upstream if that
    * matters.)
    *
    * Output: (user, t1..tk timestamps, steps_completed) — one row per
    * user that completed at least step 1.
    */
  def funnelSteps(
      events: DataFrame,
      user: Column,
      ts: Column,
      etype: Column,
      steps: Seq[String],
      maxSpanSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnelSteps: empty step list")
    val w = Window.partitionBy(col("__u"))
    val base = events.select(user.as("__u"), ts.as("__ts"), etype.as("__e"))
    val withSteps = steps.zipWithIndex.foldLeft(base) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col("__e") === step
        else {
          val after = col("__ts") >= col(s"t${i}")
          // one event, one step: a repeated type must be strictly
          // after EVERY earlier same-type step's completion time —
          // checking only the immediate predecessor would let
          // view → click → view reuse step 1's view at equal ts
          val pastRepeats = (0 until i)
            .filter(j => steps(j) == step)
            .map(j => col("__ts") > col(s"t${j + 1}"))
          val afterPrev = (Seq(col("__e") === step, after) ++ pastRepeats).reduce(_ && _)
          maxSpanSeconds match {
            case Some(span) =>
              afterPrev && col("__ts") <= col("t1") + expr(s"INTERVAL $span SECONDS")
            case None => afterPrev
          }
        }
      df.withColumn(s"t${i + 1}", min(when(cond, col("__ts"))).over(w))
    }
    // step columns are window constants per user — max() just collapses
    // the per-event rows to one row per user
    val aggCols = steps.indices.map(i => max(col(s"t${i + 1}")).as(s"t${i + 1}"))
    val completed = steps.indices
      .map(i => when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    withSteps
      .groupBy(col("__u").as("user_id"))
      .agg(aggCols.head, aggCols.tail: _*)
      .filter(col("t1").isNotNull)
      .withColumn("steps_completed", completed)
  }

  /** Weekly-style cohort retention: users bucketed by their first-ever
    * activity period, counted once per (cohort, offset) they were
    * active in.
    *
    * Output: (cohort_date, period, n_users) — `cohort_date` is the
    * first day of the user's first activity period, `period` counts
    * `unitDays`-day periods since it. (Not named `offset`: that is a
    * reserved word in several engines, DuckDB included.)
    */
  def retentionCohorts(
      events: DataFrame,
      user: Column,
      ts: Column,
      unitDays: Int): DataFrame = {
    require(unitDays > 0, s"retentionCohorts: unitDays must be positive, got $unitDays")
    val w = Window.partitionBy(col("__u"))
    events
      .select(user.as("__u"), to_date(ts).as("__d"))
      .withColumn("cohort_date", min(col("__d")).over(w))
      .select(
        col("__u"),
        col("cohort_date"),
        floor(datediff(col("__d"), col("cohort_date")) / unitDays).cast("int").as("period"))
      .distinct()
      .groupBy(col("cohort_date"), col("period"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order state-transition matrix over a keyed event sequence:
    * for every consecutive (prev → next) event-type pair within a key
    * (ordered by timestamp, ties broken by `tieBreak` — pass a unique
    * id or the result depends on physical row order), the pair count
    * and the conditional probability P(next | prev) in exact
    * parts-per-billion (`n·10⁹ div n_from` integer floor-division, the
    * same engine-portable convention as
    * [[LangModel.bigramCondProbScore]] — a double ratio could land on
    * a representability boundary and hash-differently across engines).
    *
    * The Markov-chain summary of an event log: session-flow analysis,
    * next-action prediction features, anomalous-transition detection.
    *
    * Scale posture: ONE exchange on the key for the lag window, then
    * two aggregations whose cardinality is bounded by |states|² —
    * never by the log. The totals side is one row per state, joined
    * back by broadcast.
    */
  def transitionMatrix(
      events: DataFrame,
      key: Column,
      ts: Column,
      state: Column,
      tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__tb"))
    val pairs = events
      .select(key.as("__k"), ts.as("__ts"), tieBreak.as("__tb"), state.as("to_state"))
      .withColumn("from_state", lag(col("to_state"), 1).over(w))
      .filter(col("from_state").isNotNull && col("to_state").isNotNull)
    val counts = pairs.groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_state")).agg(sum(col("n")).as("__tot"))
    counts
      .join(broadcast(totals), Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n"),
        expr("n * 1000000000L div __tot").as("prob_ppb"))
  }

  /** Frequent event paths: sliding length-`n` windows of each key's
    * event-type sequence (ordered by ts, ties by `tieBreak`), counted
    * corpus-wide — "view > click > purchase happened 1 932 times". The
    * sequence-mining complement of [[transitionMatrix]] (n = 2
    * recovers its pair counts — including on null-bearing logs). A
    * null state stays IN the sequence and breaks every window that
    * touches it (the [[transitionMatrix]] rule): dropping null rows
    * first would invent phantom adjacencies between the events on
    * either side of an unknown step.
    *
    * Scale posture: ONE key Exchange shared by all n−1 lead windows
    * (same partitioning, same ordering ⇒ one Sort), then a hash
    * aggregate whose cardinality is bounded by |states|ⁿ, never by the
    * log.
    */
  def pathNgrams(
      events: DataFrame,
      key: Column,
      ts: Column,
      state: Column,
      tieBreak: Column,
      n: Int): DataFrame = {
    require(n >= 2 && n <= 5, s"pathNgrams: n in [2,5], got $n")
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__tb"))
    val base = events
      .select(key.as("__k"), ts.as("__ts"), tieBreak.as("__tb"), state.as("__s0"))
    val withLeads = (1 until n).foldLeft(base)(
      (acc, i) => acc.withColumn(s"__s$i", lead(col("__s0"), i).over(w)))
    withLeads
      .filter((0 until n).map(i => col(s"__s$i").isNotNull).reduce(_ && _))
      .select(concat_ws(" > ", (0 until n).map(i => col(s"__s$i")): _*).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
  }

  /** Last-touch attribution: each conversion event is credited to the
    * most recent PRECEDING non-conversion event of the same key within
    * a lookback window, or to `"direct"` when no touch exists inside
    * it. Output per touch channel: conversion count and exact-decimal
    * value sum — the marketing-attribution primitive (and, in a
    * training-data pipeline, "which upstream signal preceded this
    * label" provenance).
    *
    * Strictly-preceding is a ROWS frame to 1 PRECEDING over
    * (ts, tieBreak) — a same-instant touch converts (it precedes in
    * the total order), and the unique tieBreak makes "most recent"
    * deterministic under timestamp ties, which a RANGE frame could
    * not be (all peers share one frame). The lookback is applied to
    * the carried touch timestamp AFTER the window, so one window pass
    * serves any horizon.
    *
    * Scale posture: one Exchange on the key shared by both IGNORE
    * NULLS `last` windows (same partitioning and sort), then a
    * channel-cardinality aggregate. The log shuffles once, per-key
    * window state is O(1) — the frame only ever materializes the
    * running last non-null.
    */
  def lastTouchAttribution(
      events: DataFrame,
      key: Column,
      ts: Column,
      eventType: Column,
      value: Column,
      conversion: String,
      tieBreak: Column,
      lookbackDays: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(lookbackDays >= 1, s"lastTouchAttribution: lookbackDays >= 1, got $lookbackDays")
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("__t") =!= lit(conversion), col("__t"))
    val touchTs = when(col("__t") =!= lit(conversion), col("__ts"))
    events
      .filter(key.isNotNull && ts.isNotNull && eventType.isNotNull)
      .select(key.as("__k"), ts.as("__ts"), eventType.as("__t"),
        value.as("__v"), tieBreak.as("__tb"))
      .withColumn("__touch", last(touch, ignoreNulls = true).over(w))
      .withColumn("__touch_ts", last(touchTs, ignoreNulls = true).over(w))
      .filter(col("__t") === lit(conversion))
      .select(
        coalesce(
          when(col("__touch_ts") >= col("__ts") - expr(s"INTERVAL $lookbackDays DAYS"),
            col("__touch")),
          lit("direct")).as("touch"),
        col("__v"))
      .groupBy(col("touch"))
      .agg(count(lit(1)).as("conversions"),
        sum(col("__v").cast(DecimalType(38, 10))).cast("double").as("value_sum"))
  }

  /** Multi-touch TIME-DECAY attribution: every conversion splits one
    * unit of credit across ALL its preceding touches inside the
    * lookback, each touch weighted by a geometric half-life decay of
    * its age — the standard position-free alternative to
    * [[lastTouchAttribution]].
    *
    * Engine-portable arithmetic, the q107/q189 discipline: the decay
    * weight is an integer right-shift, 10⁹ >> (age div halfLife) (a
    * power-of-two halving per elapsed half-life — no pow(), no libm),
    * and each pair's normalized credit is integer parts-per-billion
    * (w·10⁹ div Σw over the conversion). Credit sums are then exact
    * integer sums; the /10⁹ at the end is the only float op.
    *
    * Pair generation is a BUCKETED range self-join, never a windowed
    * collect and never a BNLJ: touches replicate into lookbackSteps+1
    * half-life buckets (the fixed small factor), conversions land in
    * their own bucket, and the join is equi on (key, bucket) with the
    * exact 0 ≤ Δ ≤ lookback filter behind it — the
    * [[graft.ext.Ranges]] decomposition applied to event time. Per
    * 100 TB posture: the replication factor is a constant the caller
    * chose, every shuffle is keyed, and the per-conversion Σw window
    * partitions on the conversion id (event-scale rows, O(touches-in-
    * lookback) state).
    *
    * Conversions with no touch in the lookback (Σw = 0 or no pair)
    * are absent — route them to "direct" with the last-touch op if
    * completeness matters.
    */
  def decayAttribution(
      events: DataFrame,
      key: Column,
      ts: Column,
      eventType: Column,
      tiebreak: Column,
      conversion: String,
      halfLifeSeconds: Long,
      lookbackSteps: Int): DataFrame = {
    require(halfLifeSeconds >= 1, s"decayAttribution: halfLifeSeconds >= 1, got $halfLifeSeconds")
    require(lookbackSteps >= 1 && lookbackSteps <= 29,
      s"decayAttribution: lookbackSteps in [1, 29] (10^9 >> 30 = 0), got $lookbackSteps")
    val base = events
      .filter(key.isNotNull && ts.isNotNull && eventType.isNotNull)
      .select(key.as("__k"), unix_timestamp(ts).as("__t"),
        eventType.as("__e"), tiebreak.as("__tb"))
    val conv = base.filter(col("__e") === lit(conversion))
      .select(col("__k"), col("__t").as("__tc"), col("__tb").as("__cid"),
        (col("__t") - (col("__t") % halfLifeSeconds)).as("__b"))
    val touches = base.filter(col("__e") =!= lit(conversion))
      .select(col("__k"), col("__t").as("__tt"), col("__e").as("channel"))
      .withColumn("__step", explode(sequence(lit(0), lit(lookbackSteps))))
      .select(col("__k"), col("__tt"), col("channel"),
        (col("__tt") - (col("__tt") % halfLifeSeconds) +
          col("__step") * halfLifeSeconds).as("__b"))
    val lookback = halfLifeSeconds * lookbackSteps
    val pairs = touches.join(conv, Seq("__k", "__b"))
      .filter(col("__tc") >= col("__tt") && col("__tc") - col("__tt") <= lookback)
      .select(col("__k"), col("__cid"), col("channel"),
        expr(s"shiftright(1000000000L, cast((__tc - __tt) div $halfLifeSeconds as int))")
          .as("__w"))
    val perConv = Window.partitionBy(col("__k"), col("__cid"))
    pairs
      .withColumn("__sw", sum(col("__w")).over(perConv))
      .filter(col("__sw") > 0)
      .select(col("__k"), col("__cid"), col("channel"),
        expr("__w * 1000000000L div __sw").as("__ppb"))
      .groupBy(col("channel"))
      .agg(
        count(lit(1)).as("n_pairs"),
        countDistinct(col("__k"), col("__cid")).as("n_conversions"),
        (sum(col("__ppb")).cast("double") / lit(1000000000.0)).as("credit"))
  }
}
