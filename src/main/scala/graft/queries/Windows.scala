package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Q._

/** Time-window aggregations over `events` — the batch-checkable twins of
  * graft.streaming.EventStreams (same `window()` semantics the streaming
  * path uses with a watermark; StreamingSpec covers the streaming-only
  * behaviors: late-drop, state eviction, sessionization).
  */
object Windows {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // DuckDB: events.ts is TIMESTAMP_NS; truncate to µs to match the
  // engine's read path, then epoch-align buckets explicitly.
  private val usTs = "make_timestamp(epoch_ns(ts) // 1000)"

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q43_tumbling_window",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(window($"ts", "1 hour"), $"event_type")
          .agg(count(lit(1)).as("n"), dsum($"value").as("total"))
          .select(
            tstr($"window.start").as("win_start"),
            $"event_type", $"n", $"total")
          .orderBy($"win_start", $"event_type")
      },
      Some(s"""
        SELECT strftime(date_trunc('hour', $usTs), '%Y-%m-%d %H:%M:%S') AS win_start,
               event_type, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS total
        FROM events
        GROUP BY 1, 2
        ORDER BY win_start, event_type
      """)),
    // ----------------------------------------------------------------
    Q(
      "q44_sliding_window",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
          .agg(count(lit(1)).as("n"))
          .select(tstr($"window.start").as("win_start"), $"event_type", $"n")
          .orderBy($"win_start", $"event_type")
      },
      Some(s"""
        WITH e AS (SELECT event_type,
                          make_timestamp((epoch_ns(ts) // 1000 // 1800000000) * 1800000000) AS b
                   FROM events),
        blown AS (SELECT event_type,
                         unnest([b, b - INTERVAL 30 MINUTE]) AS win_start
                  FROM e)
        SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
               COUNT(*) AS n
        FROM blown
        GROUP BY 1, 2
        ORDER BY win_start, event_type
      """)),
    // ----------------------------------------------------------------
    // Rank-family completion: percent_rank / cume_dist / nth_value.
    // Sort key carries the o_orderkey tiebreak so every rank function
    // is a total function of the data (no tie nondeterminism), and the
    // partition-wide nth_value frame is explicit — Spark's default
    // frame with an ORDER BY is unbounded-preceding..current-row,
    // which would null the leading rows.
    Q(
      "q109_window_rank_family",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice", $"o_orderkey")
        val whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "orders")
          .select(
            $"o_custkey", $"o_orderkey",
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"),
            nth_value($"o_orderkey", 2).over(whole).as("second_key"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd,
               nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS second_key
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_custkey, o_orderkey
      """))
  )
}
