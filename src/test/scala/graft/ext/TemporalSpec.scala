package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.sql.Timestamp

/** Contract coverage for the round-5 temporal operators: grid
  * resampling with forward fill, gap statistics, funnel completion,
  * cohort retention. The DuckDB oracles (q101-q103, q108) cover engine
  * parity; this spec covers the algorithms' contracts on controlled
  * inputs.
  */
class TemporalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.GraftSession.local("temporal-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def events(rows: (Long, String, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.zipWithIndex
      .map { case ((u, t, e, v), i) => (i.toLong, u, ts(t), e, v) }
      .toDF("event_id", "user_id", "ts", "etype", "value")
  }

  test("resampleFill: grid spans first..last cell, gaps carry the last observation") {
    import spark.implicits._
    val df = events(
      (1L, "2024-01-01 00:10:00", "view", 1.0),
      (1L, "2024-01-01 00:50:00", "view", 2.0), // same hour cell — later wins
      (1L, "2024-01-01 03:05:00", "click", 9.0)) // cells 1 and 2 are gaps
    val out = TimeSeries.resampleFill(
        df, $"user_id", $"ts", $"event_id",
        Seq("v" -> $"value", "e" -> $"etype"), stepSeconds = 3600L)
      .orderBy($"bucket_ts")
      .select($"is_observed", $"v", $"e")
      .collect().map(r => (r.getBoolean(0), r.getDouble(1), r.getString(2)))
    assert(out.length == 4) // hours 00,01,02,03 — inclusive bounds
    assert(out(0) == ((true, 2.0, "view"))) // in-cell survivor = latest ts
    assert(out(1) == ((false, 2.0, "view"))) // gap: carried forward
    assert(out(2) == ((false, 2.0, "view")))
    assert(out(3) == ((true, 9.0, "click")))
  }

  test("resampleFill: per-cell survivor ties on ts resolve by the tiebreak column") {
    import spark.implicits._
    val df = Seq(
      (5L, 1L, ts("2024-01-01 00:00:00"), "a", 1.0),
      (9L, 1L, ts("2024-01-01 00:00:00"), "b", 2.0))
      .toDF("event_id", "user_id", "ts", "etype", "value")
    val out = TimeSeries.resampleFill(
        df, $"user_id", $"ts", $"event_id",
        Seq("e" -> $"etype"), 3600L)
      .select($"e").as[String].collect()
    assert(out.toSeq == Seq("b")) // max (ts, event_id) → event 9
  }

  test("resampleFill: runaway grid fails fast instead of materializing") {
    import spark.implicits._
    val df = events(
      (1L, "2024-01-01 00:00:00", "view", 1.0),
      (1L, "2026-01-01 00:00:00", "view", 2.0))
    val ex = intercept[Exception] {
      TimeSeries.resampleFill(df, $"user_id", $"ts", $"event_id",
        Seq("v" -> $"value"), stepSeconds = 60L, maxCellsPerKey = 1000L).count()
    }
    assert(ex.getMessage != null)
  }

  test("gapStats: observed counts, total missing, longest gap; dense key reports zeros") {
    import spark.implicits._
    val df = events(
      (1L, "2024-01-01 00:00:00", "view", 1.0),
      (1L, "2024-01-01 03:00:00", "view", 1.0), // gap of 2 cells
      (1L, "2024-01-01 04:00:00", "view", 1.0),
      (2L, "2024-01-01 00:00:00", "view", 1.0),
      (2L, "2024-01-01 01:30:00", "view", 1.0)) // adjacent cells — no gap
    val out = TimeSeries.gapStats(df, $"user_id", $"ts", 3600L)
      .orderBy($"key")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, 3L, 2L, 2L)))
    assert(out(1) == ((2L, 2L, 0L, 0L)))
  }

  test("gapStats agrees with resampleFill's grid on a spread fixture (cross-operator consistency)") {
    import spark.implicits._
    // deterministic pseudo-random spread: 5 users, hours scattered by a
    // multiplicative hash so gap shapes differ per user
    val rows = for (u <- 1L to 5L; i <- 0L until 40L) yield {
      val hour = (u * 7919L + i * 104729L) % 300L
      (u * 1000L + i, u, new Timestamp(1704067200000L + hour * 3600000L), "e", 1.0)
    }
    val df = rows.toDF("event_id", "user_id", "ts", "etype", "value")
    val grid = TimeSeries.resampleFill(
      df, $"user_id", $"ts", $"event_id", Seq("v" -> $"value"), 3600L)
    val fromGrid = grid.groupBy($"key")
      .agg(sum(when($"is_observed", 1L).otherwise(0L)).as("n_observed"),
        sum(when(!$"is_observed", 1L).otherwise(0L)).as("missing_cells"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val stats = TimeSeries.gapStats(df, $"user_id", $"ts", 3600L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stats.length == 5)
    stats.foreach { case (k, nObs, missing, maxGap) =>
      val (gObs, gMiss) = fromGrid(k)
      assert(nObs == gObs, s"key $k observed")
      assert(missing == gMiss, s"key $k missing")
      assert(maxGap <= missing && (missing == 0L || maxGap >= 1L), s"key $k max gap bounds")
    }
  }

  test("funnelSteps: order constraint — a step before its predecessor does not convert") {
    import spark.implicits._
    val df = events(
      // user 1: click BEFORE view, then click after → t2 = the later click
      (1L, "2024-01-01 00:00:00", "click", 0.0),
      (1L, "2024-01-01 01:00:00", "view", 0.0),
      (1L, "2024-01-01 02:00:00", "click", 0.0),
      // user 2: full funnel in order, same-instant purchase converts (>=)
      (2L, "2024-01-01 00:00:00", "view", 0.0),
      (2L, "2024-01-01 00:30:00", "click", 0.0),
      (2L, "2024-01-01 00:30:00", "purchase", 0.0),
      // user 3: never views → absent
      (3L, "2024-01-01 00:00:00", "purchase", 0.0))
    val out = Funnel.funnelSteps(df, $"user_id", $"ts", $"etype",
        Seq("view", "click", "purchase"))
      .orderBy($"user_id")
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val u1 = out(0)
    assert(u1.getTimestamp(1) == ts("2024-01-01 01:00:00"))
    assert(u1.getTimestamp(2) == ts("2024-01-01 02:00:00"))
    assert(u1.isNullAt(3) && u1.getInt(4) == 2)
    val u2 = out(1)
    assert(u2.getInt(4) == 3)
    assert(u2.getTimestamp(3) == ts("2024-01-01 00:30:00"))
  }

  test("funnelSteps: maxSpan excludes conversions beyond the window from step 1") {
    import spark.implicits._
    val df = events(
      (1L, "2024-01-01 00:00:00", "view", 0.0),
      (1L, "2024-01-01 02:30:00", "click", 0.0)) // 2.5h after view
    def run(span: Long) =
      Funnel.funnelSteps(df, $"user_id", $"ts", $"etype",
        Seq("view", "click"), maxSpanSeconds = Some(span))
        .collect()(0).getInt(3)
    assert(run(3600L) == 1) // 1h window: click out of span
    assert(run(10800L) == 2) // 3h window: click converts
  }

  test("funnelSteps: all step windows share one user_id exchange (no per-step shuffles)") {
    import spark.implicits._
    val df = events((1L, "2024-01-01 00:00:00", "view", 0.0))
    val plan = Funnel.funnelSteps(df, $"user_id", $"ts", $"etype",
        Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected a single keyed exchange, got $exchanges:\n$plan")
  }

  test("funnelSteps: a repeated step type needs a strictly later event — one event, one step") {
    import spark.implicits._
    val one = events((1L, "2024-01-01 00:00:00", "view", 0.0))
    val r1 = Funnel.funnelSteps(one, $"user_id", $"ts", $"etype", Seq("view", "view"))
      .collect()(0)
    assert(r1.getInt(3) == 1, "a single view must not complete view->view")
    val two = events(
      (1L, "2024-01-01 00:00:00", "view", 0.0),
      (1L, "2024-01-01 00:05:00", "view", 0.0))
    val r2 = Funnel.funnelSteps(two, $"user_id", $"ts", $"etype", Seq("view", "view"))
      .collect()(0)
    assert(r2.getInt(3) == 2)
    assert(r2.getTimestamp(2) == ts("2024-01-01 00:05:00"))
    // NON-adjacent repeat: view -> click -> view with one view and one
    // same-instant click must not reuse step 1's view for step 3
    val vcv = events(
      (1L, "2024-01-01 00:00:00", "view", 0.0),
      (1L, "2024-01-01 00:00:00", "click", 0.0))
    val r3 = Funnel.funnelSteps(vcv, $"user_id", $"ts", $"etype",
      Seq("view", "click", "view")).collect()(0)
    assert(r3.getInt(4) == 2, "a single view must not complete steps 1 AND 3")
    // a genuinely later second view does complete the repeat
    val vcv2 = events(
      (1L, "2024-01-01 00:00:00", "view", 0.0),
      (1L, "2024-01-01 00:00:00", "click", 0.0),
      (1L, "2024-01-01 00:10:00", "view", 0.0))
    val r4 = Funnel.funnelSteps(vcv2, $"user_id", $"ts", $"etype",
      Seq("view", "click", "view")).collect()(0)
    assert(r4.getInt(4) == 3)
  }

  test("funnelSteps: invariants hold on seeded random event soups") {
    import spark.implicits._
    val types = Array("view", "click", "purchase", "error")
    for (seed <- 1L to 3L) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 400).map { i =>
        (i.toLong, 1L + rnd.nextInt(20),
          new Timestamp(1704067200000L + rnd.nextInt(200) * 600000L),
          types(rnd.nextInt(types.length)), 0.0)
      }
      val df = rows.toDF("event_id", "user_id", "ts", "etype", "value")
      val out = Funnel.funnelSteps(df, $"user_id", $"ts", $"etype",
        Seq("view", "click", "purchase")).collect()
      out.foreach { r =>
        val ts123 = (1 to 3).map(i => Option(r.getTimestamp(i)))
        // completion times are ordered and contiguous: no step without
        // its predecessor, t_{i} >= t_{i-1}
        assert(ts123.head.isDefined, s"seed $seed: row without t1")
        ts123.sliding(2).foreach {
          case Seq(a, b) =>
            assert(b.isEmpty || a.isDefined, s"seed $seed: gap in step chain")
            for (x <- a; y <- b) assert(!y.before(x), s"seed $seed: unordered steps")
          case _ =>
        }
        assert(r.getInt(4) == ts123.count(_.isDefined))
      }
    }
  }

  test("retentionCohorts: first-activity cohort, one count per active period") {
    import spark.implicits._
    val df = events(
      (1L, "2024-01-01 10:00:00", "view", 0.0), // cohort 2024-01-01
      (1L, "2024-01-02 10:00:00", "view", 0.0), // same week — dedup
      (1L, "2024-01-16 10:00:00", "view", 0.0), // week 2
      (2L, "2024-01-08 10:00:00", "view", 0.0)) // cohort 2024-01-08
    val out = Funnel.retentionCohorts(df, $"user_id", $"ts", unitDays = 7)
      .orderBy($"cohort_date", $"period")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0, 1L), ("2024-01-01", 2, 1L), ("2024-01-08", 0, 1L)))
  }
}
