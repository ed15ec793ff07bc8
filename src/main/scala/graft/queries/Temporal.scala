package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Funnel, Profile, TimeSeries}
import Q._

/** Round-5 temporal-analytics surface: grid resampling with forward
  * fill, gap detection, funnel completion, cohort retention — the
  * event-log questions the reference's watermark protocol never asks.
  */
object Temporal {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Shared oracle prelude: events with microsecond timestamps (the
    * parquet footer precision) and the hourly bucket id — exact
    * integer floor-division of epoch seconds, as the Scala side's
    * `floor(unix_timestamp / step)`.
    */
  private val HourBucket = "(epoch_ns(ts) // 1000000000) // 3600"

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // Per-key resampling onto an hourly grid with forward fill: one
    // row per user per hour between their first and last event,
    // latest observation carried across empty cells. The oracle
    // rebuilds the grid with generate-series and IGNORE NULLS windows.
    Q(
      "q101_resample_fill",
      (s, dir) => {
        import s.implicits._
        TimeSeries.resampleFill(
            t(s, dir, "events"),
            $"user_id", $"ts", $"event_id",
            Seq("value" -> $"value", "etype" -> $"event_type"),
            stepSeconds = 3600L)
          .select($"key".as("user_id"), tstr($"bucket_ts").as("bucket_ts"),
            $"is_observed", $"value", $"etype")
          .orderBy($"user_id", $"bucket_ts")
      },
      Some(s"""
        WITH obs AS (
          SELECT user_id AS k, $HourBucket AS b,
                 make_timestamp(epoch_ns(ts) // 1000) AS ts, event_id, value,
                 event_type AS etype
          FROM events),
        cell AS (
          SELECT k, b, value, etype FROM (
            SELECT k, b, value, etype,
                   ROW_NUMBER() OVER (PARTITION BY k, b
                     ORDER BY ts DESC, event_id DESC) AS rn
            FROM obs)
          WHERE rn = 1),
        bounds AS (SELECT k, MIN(b) AS lo, MAX(b) AS hi FROM obs GROUP BY k),
        grid AS (SELECT k, unnest(range(lo, hi + 1)) AS b FROM bounds),
        j AS (
          SELECT g.k, g.b, c.b IS NOT NULL AS is_observed,
                 LAST_VALUE(c.value IGNORE NULLS) OVER (PARTITION BY g.k ORDER BY g.b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
                 LAST_VALUE(c.etype IGNORE NULLS) OVER (PARTITION BY g.k ORDER BY g.b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS etype
          FROM grid g LEFT JOIN cell c ON g.k = c.k AND g.b = c.b)
        SELECT k AS user_id,
               strftime(make_timestamp(b * 3600 * 1000000), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
               is_observed, value, etype
        FROM j ORDER BY user_id, bucket_ts
      """)),
    // ----------------------------------------------------------------
    // Grid-free gap statistics: per-user observed-cell count, total
    // missing cells, longest gap — the stream-health check that must
    // NOT materialize the q101 grid at 100 TB.
    Q(
      "q108_gap_stats",
      (s, dir) => {
        import s.implicits._
        TimeSeries.gapStats(t(s, dir, "events"), $"user_id", $"ts", 3600L)
          .orderBy($"key")
      },
      Some(s"""
        WITH cells AS (
          SELECT DISTINCT user_id AS k, $HourBucket AS b FROM events),
        g AS (
          SELECT k, b - LAG(b) OVER (PARTITION BY k ORDER BY b) - 1 AS gap
          FROM cells)
        SELECT k AS key, COUNT(*) AS n_observed,
               CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS missing_cells,
               CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_cells
        FROM g GROUP BY k ORDER BY key
      """)),
    // ----------------------------------------------------------------
    // Ordered funnel view → click → purchase within 72h of the first
    // view: step i counts only at-or-after step i-1. Sequential
    // min-over-partition windows share one user_id Exchange.
    Q(
      "q102_funnel_steps",
      (s, dir) => {
        import s.implicits._
        Funnel.funnelSteps(
            t(s, dir, "events"),
            $"user_id", $"ts", $"event_type",
            steps = Seq("view", "click", "purchase"),
            maxSpanSeconds = Some(259200L))
          .select($"user_id", tstr($"t1").as("t1"), tstr($"t2").as("t2"),
            tstr($"t3").as("t3"), $"steps_completed")
          .orderBy($"user_id")
      },
      Some("""
        WITH e AS (
          SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type
          FROM events),
        s1 AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
          FROM e GROUP BY user_id),
        s2 AS (
          SELECT e.user_id,
                 MIN(CASE WHEN event_type = 'click' AND e.ts >= s1.t1
                          AND e.ts <= s1.t1 + INTERVAL 259200 SECOND
                     THEN e.ts END) AS t2
          FROM e JOIN s1 USING (user_id) GROUP BY e.user_id),
        s3 AS (
          SELECT e.user_id,
                 MIN(CASE WHEN event_type = 'purchase' AND e.ts >= s2.t2
                          AND e.ts <= s1.t1 + INTERVAL 259200 SECOND
                     THEN e.ts END) AS t3
          FROM e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
          GROUP BY e.user_id)
        SELECT s1.user_id,
               strftime(t1, '%Y-%m-%d %H:%M:%S') AS t1,
               strftime(t2, '%Y-%m-%d %H:%M:%S') AS t2,
               strftime(t3, '%Y-%m-%d %H:%M:%S') AS t3,
               CAST((CASE WHEN t1 IS NULL THEN 0 ELSE 1 END)
                  + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
                  + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS INTEGER)
                 AS steps_completed
        FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
        WHERE t1 IS NOT NULL
        ORDER BY user_id
      """)),
    // ----------------------------------------------------------------
    // Event-rate anomaly detection: hourly counts per type, z-scored
    // against that type's own hourly distribution (decimal-exact
    // moments — q94's contract), anomalous hours = |z| > 2. The
    // spike/outage detector over any event stream.
    Q(
      "q114_rate_anomaly",
      (s, dir) => {
        import s.implicits._
        val hourly = t(s, dir, "events")
          .groupBy(window($"ts", "1 hour"), $"event_type")
          .agg(count(lit(1)).as("n"))
          .select($"window.start".as("h"), $"event_type", $"n")
        Profile.zscoreNormalize(hourly, Seq("event_type"), $"n")
          .filter(abs($"z") > 2.0)
          .select($"event_type", tstr($"h").as("hour_ts"), $"n", $"z")
          .orderBy($"event_type", $"hour_ts")
      },
      Some(s"""
        WITH h AS (
          SELECT event_type,
                 make_timestamp((epoch_ns(ts) // 1000 // 3600000000) * 3600000000) AS hr,
                 COUNT(*) AS n
          FROM events GROUP BY 1, 2),
        st AS (
          SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS cnt,
                 ${OracleSql.dsum("n")} AS s,
                 ${OracleSql.dsum("n * n")} AS ss
          FROM h GROUP BY 1),
        z AS (
          SELECT h.event_type, h.hr, h.n,
                 CASE WHEN (ss - s * s / cnt) / (cnt - 1.0) > 0
                      THEN (h.n - s / cnt) / sqrt((ss - s * s / cnt) / (cnt - 1.0))
                      ELSE NULL END AS z
          FROM h JOIN st USING (event_type))
        SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour_ts, n, z
        FROM z WHERE abs(z) > 2.0
        ORDER BY event_type, hour_ts
      """)),
    // ----------------------------------------------------------------
    // Weekly cohort retention: users bucketed by first-activity date,
    // counted once per (cohort, week-offset) they were active in.
    Q(
      "q103_retention_cohorts",
      (s, dir) => {
        import s.implicits._
        Funnel.retentionCohorts(t(s, dir, "events"), $"user_id", $"ts", unitDays = 7)
          .select($"cohort_date".cast("string").as("cohort_date"),
            $"period", $"n_users")
          .orderBy($"cohort_date", $"period")
      },
      Some("""
        WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        c AS (SELECT user_id, MIN(d) AS cohort FROM e GROUP BY user_id),
        a AS (
          SELECT DISTINCT e.user_id, c.cohort,
                 CAST(floor(date_diff('day', c.cohort, e.d) / 7.0) AS INTEGER) AS period
          FROM e JOIN c USING (user_id))
        SELECT CAST(cohort AS VARCHAR) AS cohort_date, period,
               COUNT(*) AS n_users
        FROM a GROUP BY cohort, period
        ORDER BY cohort_date, period
      """))
  )
}
