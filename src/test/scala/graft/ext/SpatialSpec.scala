package graft.ext

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics coverage for the round-7 spatial/temporal operators:
  * grid geo joins, longest-prefix-match, OHLC bars, rolling OLS
  * slope, time-weighted averages.
  */
class SpatialSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.GraftSession.local("spatial-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("gridRadiusJoin: cells wrap at the antimeridian; non-divisor cellDeg rejected") {
    import spark.implicits._
    // in-radius pair straddling ±180: 179.7 vs -179.9 is 0.4° ≈ 44.5 km
    // apart at the equator — modular cell ids must find it (a non-
    // wrapping grid would place them ~359 cells apart and miss it)
    val pts = Seq((1L, 0.0, 179.7), (2L, 0.0, 170.0)).toDF("id", "lat", "lon")
    val pois = Seq((10L, 0.0, -179.9)).toDF("id", "lat", "lon")
    val got = Geo.gridRadiusJoin(pts, $"id", $"lat", $"lon", pois, $"id", $"lat", $"lon",
        radiusKm = 50.0, cellDeg = 1.0, maxAbsLatDeg = 10.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 10L)))
    // ±180 land in the same wrapped cell (one meridian, two spellings)
    val same = Geo.gridRadiusJoin(
      Seq((1L, 0.0, 180.0)).toDF("id", "lat", "lon"), $"id", $"lat", $"lon",
      Seq((10L, 0.0, -180.0)).toDF("id", "lat", "lon"), $"id", $"lat", $"lon",
      radiusKm = 50.0, cellDeg = 1.0, maxAbsLatDeg = 10.0).collect()
    assert(same.length == 1 && same.head.getDouble(2) == 0.0)
    // a cell size that leaves a sliver seam cell breaks the ring
    // guarantee at the wrap — rejected at plan time
    val ex = intercept[IllegalArgumentException] {
      Geo.gridRadiusJoin(pts, $"id", $"lat", $"lon", pois, $"id", $"lat", $"lon",
        radiusKm = 50.0, cellDeg = 7.0, maxAbsLatDeg = 10.0)
    }
    assert(ex.getMessage.contains("divide 360"))
  }

  test("gridRadiusJoin: in-radius pair found across a cell boundary; far pair excluded") {
    import spark.implicits._
    // equator: 1° lon ≈ 111.32 km. Point at lon 0.99 sits in cell 0,
    // poi at 1.01 in cell 1 — only the ring replication can pair them.
    val pts = Seq((1L, 0.0, 0.99), (2L, 0.0, 30.0)).toDF("id", "lat", "lon")
    val pois = Seq((10L, 0.0, 1.01), (20L, 0.0, 35.0)).toDF("id", "lat", "lon")
    val got = Geo.gridRadiusJoin(
        pts, $"id", $"lat", $"lon", pois, $"id", $"lat", $"lon",
        radiusKm = 50.0, cellDeg = 1.0, maxAbsLatDeg = 10.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 1)
    val (p, q, d) = got.head
    assert(p == 1L && q == 10L)
    // 0.02° of equatorial longitude ≈ 2.226 km
    assert(math.abs(d - 2.226) < 0.01, s"dist $d")
    // quantized to 1e-6 km exactly
    assert(d == math.floor(d * 1e6 + 0.5) / 1e6)
  }

  test("gridRadiusJoin: cell-vs-radius precondition trips; no cartesian in the plan") {
    import spark.implicits._
    val pts = Seq((1L, 0.0, 0.0)).toDF("id", "lat", "lon")
    intercept[IllegalArgumentException] {
      // 1° cell covers ~110.567·cos(60°) ≈ 55 km at lat 60 — below 100 km
      Geo.gridRadiusJoin(pts, $"id", $"lat", $"lon", pts, $"id", $"lat", $"lon",
        radiusKm = 100.0, cellDeg = 1.0, maxAbsLatDeg = 60.0)
    }
    val plan = Geo.gridRadiusJoin(pts, $"id", $"lat", $"lon", pts, $"id", $"lat", $"lon",
        radiusKm = 50.0, cellDeg = 1.0, maxAbsLatDeg = 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }

  test("nearestPoi: picks the closest, honest guarantee bit, empty neighborhood absent") {
    import spark.implicits._
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.0, 50.0)).toDF("id", "lat", "lon")
    // two POIs near point 1 (0.1° ≈ 11 km and 0.2° ≈ 22 km), a far one
    // in point 1's ring at 2.9° ≈ 323 km (beyond the 1° guarantee),
    // nothing anywhere near point 2
    val pois = Seq((10L, 0.0, 0.1), (11L, 0.0, 0.2), (12L, 0.0, 2.9))
      .toDF("id", "lat", "lon")
    val got = Geo.nearestPoi(pts, $"id", $"lat", $"lon", pois, $"id", $"lat", $"lon",
        cellDeg = 1.0, maxAbsLatDeg = 10.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(got.keySet == Set(1L))
    assert(got(1L)._1 == 10L && got(1L)._3, s"nearest ${got(1L)}")
    // a lone far POI: found (it is in the ring) but NOT guaranteed —
    // a 323 km neighbor can't rule out a closer POI outside the ring
    val far = Geo.nearestPoi(
        Seq((1L, 0.0, 0.0)).toDF("id", "lat", "lon"), $"id", $"lat", $"lon",
        Seq((12L, 0.0, 0.9)).toDF("id", "lat", "lon"), $"id", $"lat", $"lon",
        cellDeg = 1.0, maxAbsLatDeg = 60.0)
      .collect()
    assert(far.length == 1 && !far.head.getBoolean(3),
      s"0.9° at guarantee ${Geo.guaranteeKm(1.0, 60.0)} km must be unguaranteed")
  }

  test("longestPrefixMatch: most specific wins, dup routes collapse, misses absent") {
    import spark.implicits._
    // 8-bit key space; routes: 0b1010xxxx -> 100 (len 4), 0b101010xx -> 200
    // (len 6, more specific), duplicate (4, 0b1111) routes -> min target
    val routes = Seq(
      (4, 10L, 100L),  // 1010....
      (6, 42L, 200L),  // 101010..
      (4, 15L, 300L), (4, 15L, 250L) // dup (len,pfx) -> target 250
    ).toDF("len", "pfx", "tgt")
    val probes = Seq(
      (1L, 171L), // 10101011 -> /6 42 wins over /4 10
      (2L, 166L), // 10100110 -> only /4 10
      (3L, 255L), // 11111111 -> /4 15, dup collapsed to 250
      (4L, 1L)    // 00000001 -> no route
    ).toDF("id", "key")
    val got = Joins.longestPrefixMatch(probes, $"id", $"key",
        routes, $"pfx", $"len", $"tgt", keyBits = 8, lengths = Seq(4, 6))
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getLong(4)))).toMap
    assert(got == Map(1L -> ((6, 200L)), 2L -> ((4, 100L)), 3L -> ((4, 250L))))
    intercept[IllegalArgumentException] {
      Joins.longestPrefixMatch(probes, $"id", $"key",
        routes, $"pfx", $"len", $"tgt", keyBits = 8, lengths = Seq(4, 12))
    }
  }

  test("longestPrefixMatch: per-length broadcast equi-joins, no cartesian/BNLJ") {
    import spark.implicits._
    val routes = Seq((4, 10L, 100L), (6, 42L, 200L)).toDF("len", "pfx", "tgt")
    val probes = Seq((1L, 171L)).toDF("id", "key")
    val plan = Joins.longestPrefixMatch(probes, $"id", $"key",
        routes, $"pfx", $"len", $"tgt", keyBits = 8, lengths = Seq(4, 6))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"nested loop in:\n$plan")
  }

  test("ohlcBars: open/close by (ts, tiebreak) incl. equal-ts ties; exact volume") {
    import spark.implicits._
    val ev = Seq(
      // bucket 0 (day one): tie on ts — tiebreak 1 < 2 makes 10.0 the open
      (1L, "a", ts("2024-01-01 00:00:05"), 10.0),
      (2L, "a", ts("2024-01-01 00:00:05"), 11.0),
      (3L, "a", ts("2024-01-01 17:00:00"), 2.5),
      // bucket 1
      (4L, "a", ts("2024-01-02 01:00:00"), 7.0),
      (5L, "b", ts("2024-01-01 03:00:00"), 1.0)
    ).toDF("event_id", "k", "ts", "v")
    val got = TimeSeries.ohlcBars(ev, $"k", $"ts", $"v", $"event_id", 86400L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getLong(7)))).toMap
    val day0 = 19723L // floor(1704067205 / 86400)
    assert(got(("a", day0)) == ((10.0, 11.0, 2.5, 2.5, 23.5, 3L)))
    assert(got(("a", day0 + 1)) == ((7.0, 7.0, 7.0, 7.0, 7.0, 1L)))
    assert(got(("b", day0)) == ((1.0, 1.0, 1.0, 1.0, 1.0, 1L)))
    // one hash aggregate, no window exchange
    val plan = TimeSeries.ohlcBars(ev, $"k", $"ts", $"v", $"event_id", 86400L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in:\n$plan")
  }

  test("rollingSlope: exact hand slope, degenerate windows null") {
    import spark.implicits._
    // y = 3x + 5 sampled at x = 0, 60, 120 s: slope exactly 3 per second
    // after the first row (n>=2)
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 5.0),
      (2L, 1L, ts("2024-01-01 00:01:00"), 185.0),
      (3L, 1L, ts("2024-01-01 00:02:00"), 365.0),
      (4L, 2L, ts("2024-01-01 00:00:00"), 9.0) // single row -> null
    ).toDF("event_id", "k", "ts", "v")
    val got = TimeSeries.rollingSlope(ev, $"k", $"ts", $"v", $"event_id",
        windowRows = 8, epochOffsetSeconds = 1704067200L)
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        Option(r.get(4)).map(_.asInstanceOf[Double])).toMap
    assert(got((1L, 1L)).isEmpty, "first row has n=1")
    assert(got((1L, 2L)).contains(3.0))
    assert(got((1L, 3L)).contains(3.0))
    assert(got((2L, 4L)).isEmpty)
    // equal timestamps throughout -> zero x-variance -> null
    val flat = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, 1L, ts("2024-01-01 00:00:00"), 9.0)
    ).toDF("event_id", "k", "ts", "v")
    val f = TimeSeries.rollingSlope(flat, $"k", $"ts", $"v", $"event_id", 8)
      .collect().map(r => Option(r.get(4)))
    assert(f.forall(_.isEmpty))
  }

  test("timeWeightedAvg: hand trapezoid; single sample null") {
    import spark.implicits._
    // v=0 for 100 s then v=10 for 100 s (observed at t=0,100,200):
    // trapezoids: (0+10)/2·100 + (10+10)/2·100 = 1500; span 200 -> 7.5
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 0.0),
      (2L, 1L, ts("2024-01-01 00:01:40"), 10.0),
      (3L, 1L, ts("2024-01-01 00:03:20"), 10.0),
      (4L, 2L, ts("2024-01-01 00:00:00"), 42.0)
    ).toDF("event_id", "k", "ts", "v")
    val got = TimeSeries.timeWeightedAvg(ev, $"k", $"ts", $"v", $"event_id")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2)))).toMap
    assert(got(1L) == ((Some(7.5), 3L)))
    assert(got(2L) == ((None, 1L)))
  }
}
