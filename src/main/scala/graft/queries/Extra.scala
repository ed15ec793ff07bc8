package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Q._

/** Coverage for declared operators not exercised by q01–q45: non-equi
  * (theta/range) join, typed JSON parse + re-serialize, map columns,
  * RANGE window frames + ntile, keyed dropDuplicates.
  */
object Extra {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // Theta join: part × tiny band table on a range predicate. The band
    // side is broadcast (BroadcastNestedLoopJoin) — the right physical
    // plan for a non-equi join with a small side at any scale.
    Q(
      "q46_range_join",
      (s, dir) => {
        import s.implicits._
        val bands = Seq(
          ("low", 0.0, 933.0),
          ("mid", 933.0, 966.0),
          ("high", 966.0, 1e9)).toDF("band", "lo", "hi")
        t(s, dir, "part")
          .join(broadcast(bands), $"p_retailprice" >= $"lo" && $"p_retailprice" < $"hi")
          .groupBy($"band")
          .agg(count(lit(1)).as("n"), dsum($"p_retailprice").as("sum_price"))
          .orderBy($"band")
      },
      Some("""
        SELECT band, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_price
        FROM part
        JOIN (VALUES ('low', 0.0, 933.0), ('mid', 933.0, 966.0),
                     ('high', 966.0, 1e9)) b(band, lo, hi)
          ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY band
        ORDER BY band
      """)),
    // ----------------------------------------------------------------
    // Typed JSON: from_json with a declared schema, field access, and a
    // deterministic to_json re-serialization.
    Q(
      "q47_json_roundtrip",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select($"event_id",
            from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("j"))
          .select(
            $"event_id", $"j.k".as("k"),
            to_json(struct($"j.k".as("k"))).as("rt"))
          .orderBy($"event_id")
      },
      Some("""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INTEGER) AS k,
               '{"k":' || CAST(CAST(json_extract(props, '$.k') AS INTEGER) AS VARCHAR) || '}' AS rt
        FROM events
        ORDER BY event_id
      """)),
    // ----------------------------------------------------------------
    // Map columns: construct, explode to entries.
    Q(
      "q48_map_entries",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select(
            $"event_id",
            explode(map(
              lit("type"), $"event_type",
              lit("uid"), $"user_id".cast("string"))).as(Seq("mk", "mv")))
          .orderBy($"event_id", $"mk")
      },
      Some("""
        SELECT event_id, mk, mv FROM (
          SELECT event_id, 'type' AS mk, event_type AS mv FROM events
          UNION ALL
          SELECT event_id, 'uid' AS mk, CAST(user_id AS VARCHAR) AS mv FROM events)
        ORDER BY event_id, mk
      """)),
    // ----------------------------------------------------------------
    // RANGE window frame (7 trailing days per customer) + ntile quartile.
    Q(
      "q49_window_range_frame",
      (s, dir) => {
        import s.implicits._
        val wRange = Window.partitionBy($"o_custkey")
          .orderBy(unix_timestamp($"o_orderdate"))
          .rangeBetween(-604800L, Window.currentRow)
        val wNtile = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate", $"o_orderkey")
        t(s, dir, "orders")
          .select(
            $"o_orderkey", $"o_custkey",
            sum($"o_totalprice".cast(Dec)).over(wRange).cast("double").as("sum_7d"),
            ntile(4).over(wNtile).as("quartile"))
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_custkey,
               CAST(CAST(sum_7d_dec AS VARCHAR) AS DOUBLE) AS sum_7d, quartile
        FROM (
          SELECT o_orderkey, o_custkey,
                 SUM(CAST(o_totalprice AS DECIMAL(38,10))) OVER (
                   PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                   RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS sum_7d_dec,
                 NTILE(4) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS quartile
          FROM orders)
        ORDER BY o_orderkey
      """)),
    // ----------------------------------------------------------------
    // Keyed dropDuplicates: survivor rows are nondeterministic by
    // contract, so the checked result is the (deterministic) survivor
    // count per event_type.
    Q(
      "q50_dropdup_keys",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .dropDuplicates("user_id", "event_type")
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type, COUNT(*) AS n
        FROM (SELECT DISTINCT user_id, event_type FROM events)
        GROUP BY event_type
        ORDER BY event_type
      """))
  )
}
