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
      """))
  )
}
