package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Geo, Joins, TimeSeries}
import Q._

/** Round-7 batch 2: the spatial + temporal-feature surface — grid-
  * bucketed geo joins, OHLC downsampling, rolling OLS slopes,
  * time-weighted averages, longest-prefix-match routing joins.
  *
  * Coordinates are derived deterministically from integer keys (pure
  * integer modulus, then one float division) so the DuckDB oracle can
  * replicate them bit-for-bit; the operators themselves take any
  * lat/lon double columns.
  */
object Spatial {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Derived point coordinates (customers): lat in [-60, 60), lon in
    * [-180, 180) — the ±60° band keeps one fixed grid honest (see
    * [[graft.ext.Geo]]'s latitude contract).
    */
  private val PLat = "CAST((c_custkey * 37) % 1200 AS DOUBLE)/10.0 - 60.0"
  private val PLon = "CAST((c_custkey * 91) % 3600 AS DOUBLE)/10.0 - 180.0"
  private val QLat = "CAST((s_suppkey * 53) % 1200 AS DOUBLE)/10.0 - 60.0"
  private val QLon = "CAST((s_suppkey * 131) % 3600 AS DOUBLE)/10.0 - 180.0"

  /** The haversine replica — identical operation shape to
    * [[Geo.haversineKm]], micro-quantized.
    */
  private def havSql(plat: String, plon: String, qlat: String, qlon: String) =
    s"""floor(${Geo.EarthDiameterKm} * asin(sqrt(
       |  pow(sin(radians($qlat - $plat) / 2), 2) +
       |  cos(radians($plat)) * cos(radians($qlat)) *
       |  pow(sin(radians($qlon - $plon) / 2), 2))) * 1000000.0 + 0.5) / 1000000.0""".stripMargin

  private def ptsPoisSql(cellDeg: Double) = {
    // cell x-ids wrap modulo the grid width (identical double-mod shape
    // to Geo.wrapCx) so the antimeridian is an ordinary cell boundary
    val w = graft.ext.Geo.gridWidth(cellDeg)
    s"""pts AS (
       |  SELECT c_custkey AS point_id, $PLat AS plat, $PLon AS plon FROM customer),
       |pois AS (
       |  SELECT s_suppkey AS poi_id, $QLat AS qlat, $QLon AS qlon FROM supplier),
       |p AS (SELECT *, ((CAST(floor(plon / $cellDeg) AS BIGINT) % $w) + $w) % $w AS cx,
       |               CAST(floor(plat / $cellDeg) AS BIGINT) AS cy FROM pts),
       |q AS (SELECT poi_id, qlat, qlon,
       |             (((CAST(floor(qlon / $cellDeg) AS BIGINT) + dx.o) % $w) + $w) % $w AS cx,
       |             CAST(floor(qlat / $cellDeg) AS BIGINT) + dy.o AS cy
       |      FROM pois, range(-1, 2) dx(o), range(-1, 2) dy(o)),
       |cand AS (SELECT point_id, poi_id,
       |    ${havSql("plat", "plon", "qlat", "qlon")} AS dist_km
       |  FROM p JOIN q USING (cx, cy))""".stripMargin
  }

  private val EpochSec = "(epoch_ns(ts) // 1000000000)"

  /** 2024-01-01T00:00:00Z — the dataset-era x-translation for exact
    * integer regression terms (see [[TimeSeries.rollingSlope]]).
    */
  private val Era2024 = 1704067200L

  /** Window-frame dsum for the rolling-slope oracle. */
  private def dsumW(expr: String): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(38,10))) OVER w AS VARCHAR) AS DOUBLE)"

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // Grid-bucketed geo radius join: all customer–supplier pairs
    // within 100 km, one equi-join on 2° grid cells, POIs ×9, points
    // moved once. The oracle replays the same grid composition (the
    // brute-force twin would also work, but replaying the cells also
    // checks the neighborhood algebra).
    Q(
      "q183_geo_radius_join",
      (s, dir) => {
        import s.implicits._
        val pts = t(s, dir, "customer").select($"c_custkey",
          (($"c_custkey" * 37) % 1200).cast("double") / 10.0 - 60.0).toDF("id", "plat")
          .withColumn("plon",
            (($"id" * 91) % 3600).cast("double") / 10.0 - 180.0)
        val pois = t(s, dir, "supplier").select($"s_suppkey",
          (($"s_suppkey" * 53) % 1200).cast("double") / 10.0 - 60.0).toDF("id", "qlat")
          .withColumn("qlon",
            (($"id" * 131) % 3600).cast("double") / 10.0 - 180.0)
        Geo.gridRadiusJoin(
            pts, $"id", $"plat", $"plon",
            pois, $"id", $"qlat", $"qlon",
            radiusKm = 100.0, cellDeg = 2.0, maxAbsLatDeg = 60.0)
          .orderBy($"point_id", $"poi_id")
      },
      Some(s"""
        WITH ${ptsPoisSql(2.0)}
        SELECT point_id, poi_id, dist_km FROM cand
        WHERE dist_km <= 100.0 ORDER BY point_id, poi_id
      """)),
    // ----------------------------------------------------------------
    // Nearest POI per point over a 6° grid's 3×3 neighborhood, with
    // the guarantee bit (true iff nothing outside the searched ring
    // can be closer). Points with an empty neighborhood are absent —
    // the documented two-pass escape re-runs those coarser.
    Q(
      "q184_nearest_poi",
      (s, dir) => {
        import s.implicits._
        val pts = t(s, dir, "customer").select($"c_custkey",
          (($"c_custkey" * 37) % 1200).cast("double") / 10.0 - 60.0).toDF("id", "plat")
          .withColumn("plon",
            (($"id" * 91) % 3600).cast("double") / 10.0 - 180.0)
        val pois = t(s, dir, "supplier").select($"s_suppkey",
          (($"s_suppkey" * 53) % 1200).cast("double") / 10.0 - 60.0).toDF("id", "qlat")
          .withColumn("qlon",
            (($"id" * 131) % 3600).cast("double") / 10.0 - 180.0)
        Geo.nearestPoi(
            pts, $"id", $"plat", $"plon",
            pois, $"id", $"qlat", $"qlon",
            cellDeg = 6.0, maxAbsLatDeg = 60.0)
          .orderBy($"point_id")
      },
      Some(s"""
        WITH ${ptsPoisSql(6.0)}
        SELECT point_id, poi_id, dist_km,
               dist_km <= ${Geo.guaranteeKm(6.0, 60.0)} AS guaranteed
        FROM cand
        QUALIFY row_number() OVER (PARTITION BY point_id ORDER BY dist_km, poi_id) = 1
        ORDER BY point_id
      """)),
    // ----------------------------------------------------------------
    // OHLC bars: per event_type per day, open/high/low/close/volume in
    // ONE hash aggregate (struct-min/max carries open/close; no
    // window, no per-key sort shuffle).
    Q(
      "q185_ohlc_bars",
      (s, dir) => {
        import s.implicits._
        TimeSeries.ohlcBars(t(s, dir, "events"),
            $"event_type", $"ts", $"value", $"event_id", stepSeconds = 86400L)
          .orderBy($"key", $"bucket")
      },
      Some(s"""
        WITH e AS (
          SELECT event_type AS key, $EpochSec // 86400 AS bucket, ts, event_id, value
          FROM events WHERE ts IS NOT NULL AND value IS NOT NULL)
        SELECT key, bucket,
               first(value ORDER BY ts, event_id) AS open,
               max(value) AS high, min(value) AS low,
               last(value ORDER BY ts, event_id) AS close,
               ${OracleSql.dsum("value")} AS volume,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM e GROUP BY key, bucket ORDER BY key, bucket
      """)),
    // ----------------------------------------------------------------
    // Rolling OLS slope of value vs event-time over the trailing 8
    // observations per user: five window sums on ONE Exchange+Sort,
    // exact-decimal accumulation, one fixed-shape closed form. Event
    // time is translated to the dataset era and the value carried in
    // centi-units so every summed term is an integer-valued double —
    // the exact-decimal-cast contract both engines honor (see
    // rollingSlope's scaladoc); the slope is rescaled by /100 at the
    // end on both sides.
    Q(
      "q186_rolling_slope",
      (s, dir) => {
        import s.implicits._
        val r = TimeSeries.rollingSlope(
          t(s, dir, "events").withColumn("value",
            floor($"value" * 100.0 + 0.5)),
          $"user_id", $"ts", $"value", $"event_id", windowRows = 8,
          epochOffsetSeconds = Era2024)
        r.select($"key", tstr($"ts").as("ts"), $"tiebreak",
            ($"value" / 100.0).as("value"),
            // pico-quantized: the closed form is fixed-shape, but a
            // vectorizing engine may contract mul-sub into FMA and
            // drift the last ulp — quantization absorbs it (q177 rule)
            (floor($"slope" / 100.0 * 1000000000000.0 + 0.5) / 1000000000000.0)
              .as("slope"))
          .orderBy($"key", $"ts", $"tiebreak")
      },
      Some(s"""
        WITH e AS (
          SELECT user_id AS key, ts, event_id,
                 CAST($EpochSec - $Era2024 AS DOUBLE) AS x,
                 floor(value * 100.0 + 0.5) AS y
          FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        s AS (
          SELECT key, ts, event_id, y,
                 CAST(COUNT(*) OVER w AS DOUBLE) AS n,
                 ${dsumW("x")} AS sx, ${dsumW("y")} AS sy,
                 ${dsumW("x * x")} AS sxx, ${dsumW("x * y")} AS sxy
          FROM e
          WINDOW w AS (PARTITION BY key ORDER BY ts, event_id
                       ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
        SELECT key, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_id AS tiebreak,
               y / 100.0 AS value,
               floor(CASE WHEN n >= 2 AND (n * sxx - sx * sx) <> 0.0
                 THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END / 100.0
                 * 1000000000000.0 + 0.5) / 1000000000000.0 AS slope
        FROM s ORDER BY key, ts, tiebreak
      """)),
    // ----------------------------------------------------------------
    // Time-weighted average per user: trapezoidal integration between
    // consecutive samples (one LEAD window), exact-decimal area sum,
    // one double division. Single-sample keys yield null. Value rides
    // in centi-units (integer trapezoid terms — the exact-cast
    // contract), rescaled by /100 at the end on both sides.
    Q(
      "q187_time_weighted_avg",
      (s, dir) => {
        import s.implicits._
        val r = TimeSeries.timeWeightedAvg(
          t(s, dir, "events").withColumn("value",
            floor($"value" * 100.0 + 0.5)),
          $"user_id", $"ts", $"value", $"event_id")
        r.select($"key", ($"twa" / 100.0).as("twa"), $"n_samples")
          .orderBy($"key")
      },
      Some(s"""
        WITH e AS (
          SELECT user_id AS k, ts, event_id,
                 CAST($EpochSec AS DOUBLE) AS t,
                 floor(value * 100.0 + 0.5) AS v
          FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        l AS (
          SELECT k, t, v, LEAD(t) OVER w AS tn, LEAD(v) OVER w AS vn
          FROM e WINDOW w AS (PARTITION BY k ORDER BY ts, event_id)),
        a AS (
          SELECT k,
                 CAST(CAST(SUM(CASE WHEN tn IS NOT NULL
                   THEN CAST((v + vn) * (tn - t) AS DECIMAL(38,10)) END)
                   AS VARCHAR) AS DOUBLE) AS area2,
                 min(t) AS t0, max(t) AS t1,
                 CAST(COUNT(*) AS BIGINT) AS n_samples
          FROM l GROUP BY k)
        SELECT k AS key,
               CASE WHEN t1 > t0 THEN area2 / (2.0 * (t1 - t0)) END / 100.0 AS twa,
               n_samples
        FROM a ORDER BY key
      """)),
    // ----------------------------------------------------------------
    // Longest-prefix-match join: orders hashed into a 24-bit key
    // space, routed against a supplier-derived prefix table with
    // lengths /16,/20,/24 — one broadcast equi-join per length, argmax
    // length per probe, the big side never shuffled before its
    // partial-aggregating argmax.
    Q(
      "q188_prefix_match",
      (s, dir) => {
        import s.implicits._
        val routes = t(s, dir, "supplier")
          .select((lit(16) + lit(4) * ($"s_suppkey" % 3)).cast("int").as("len"),
            (($"s_suppkey" * 2654435761L) % 16777216L).as("__ip"),
            $"s_nationkey".as("tgt"))
          .withColumn("pfx", expr("shiftright(__ip, 24 - len)"))
        val probes = t(s, dir, "orders")
          .select($"o_orderkey", (($"o_orderkey" * 2654435761L) % 16777216L).as("ip"))
        Joins.longestPrefixMatch(
            probes, $"o_orderkey", $"ip",
            routes, $"pfx", $"len", $"tgt",
            keyBits = 24, lengths = Seq(16, 20, 24))
          .orderBy($"probe_id")
      },
      Some("""
        WITH routes0 AS (
          SELECT CAST(16 + 4 * (s_suppkey % 3) AS INTEGER) AS len,
                 ((s_suppkey * 2654435761) % 16777216)
                   >> (24 - CAST(16 + 4 * (s_suppkey % 3) AS INTEGER)) AS pfx,
                 s_nationkey AS tgt
          FROM supplier),
        routes AS (
          SELECT len, pfx, min(tgt) AS tgt FROM routes0 GROUP BY len, pfx),
        probes AS (
          SELECT o_orderkey, (o_orderkey * 2654435761) % 16777216 AS ip FROM orders),
        cand AS (
          SELECT p.o_orderkey AS probe_id, p.ip, r.len, r.pfx, r.tgt
          FROM probes p JOIN routes r ON (p.ip >> (24 - r.len)) = r.pfx)
        SELECT probe_id, ip AS probe_key, len AS match_len,
               pfx AS match_prefix, tgt AS target
        FROM cand
        QUALIFY row_number() OVER (PARTITION BY probe_id
                                   ORDER BY len DESC, pfx DESC, tgt DESC) = 1
        ORDER BY probe_id
      """))
  )
}
