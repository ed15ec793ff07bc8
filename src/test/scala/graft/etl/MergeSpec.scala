package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics of the warehouse merge operators (the DuckDB oracle covers
  * engine parity at sf0.01; this spec pins the contracts on controlled
  * inputs).
  */
class MergeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark = graft.GraftSession.local("merge-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  test("upsert: updates replace, inserts add, base-only rows pass through") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "s", "v")
    val updates = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("k", "s", "v")
    val merged = Merge.upsert(base, updates, Seq("k"))
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(merged.toSeq == Seq(
      (1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert: mismatched schemas rejected") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("k", "s")
    val other = Seq((1L, 2.0)).toDF("k", "v")
    assertThrows[IllegalArgumentException](Merge.upsert(base, other, Seq("k")))
  }

  test("scd2: no-op rows collapse, intervals chain, one current row per key") {
    import spark.implicits._
    val log = Seq(
      // key 1: a a b a — middle duplicate collapses, a reappears as v3
      (1L, "2024-01-01 00:00:00", "a", 1L),
      (1L, "2024-01-02 00:00:00", "a", 2L),
      (1L, "2024-01-03 00:00:00", "b", 3L),
      (1L, "2024-01-04 00:00:00", "a", 4L),
      // key 2: single row stays current
      (2L, "2024-01-01 00:00:00", "x", 5L)
    ).toDF("k", "ts", "attr", "id").withColumn("ts", to_timestamp($"ts"))
    val hist = Merge.scd2FromChangeLog(log, $"k", $"ts", $"attr", $"id")
      .orderBy($"key", $"version")
      .select($"key", $"attr", date_format($"valid_from", "MM-dd").as("f"),
        date_format($"valid_to", "MM-dd").as("t"), $"version", $"is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), r.getInt(4), r.getBoolean(5)))
    assert(hist.toSeq == Seq(
      (1L, "a", "01-01", Some("01-03"), 1, false),
      (1L, "b", "01-03", Some("01-04"), 2, false),
      (1L, "a", "01-04", None, 3, true),
      (2L, "x", "01-01", None, 1, true)))
  }

  test("snapshotDiff: inserts/deletes/updates classified; null flips count as changes") {
    import spark.implicits._
    val base = Seq(
      (1L, Some("a"), Some(1.0)), // unchanged
      (2L, Some("b"), Some(2.0)), // value update
      (3L, Some("c"), Some(3.0)), // deleted
      (4L, None, Some(4.0))) // null -> value update
      .toDF("k", "s", "v")
    val cur = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, Some("b"), Some(2.5)),
      (4L, Some("d"), None), // both columns change (incl. value -> null)
      (5L, Some("e"), Some(5.0))) // inserted
      .toDF("k", "s", "v")
    val out = graft.etl.Merge.snapshotDiff(base, cur, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(out == Set(
      (2L, "update", 1), (3L, "delete", 0), (4L, "update", 2), (5L, "insert", 0)))
  }

  test("scd2: same-timestamp events totally ordered by the tiebreak") {
    import spark.implicits._
    val log = Seq(
      (1L, "2024-01-01 00:00:00", "a", 1L),
      (1L, "2024-01-01 00:00:00", "b", 2L) // same ts, later id wins as current
    ).toDF("k", "ts", "attr", "id").withColumn("ts", to_timestamp($"ts"))
    val hist = Merge.scd2FromChangeLog(log, $"k", $"ts", $"attr", $"id")
      .orderBy($"version")
      .collect().map(r => (r.getAs[String]("attr"), r.getAs[Boolean]("is_current")))
    assert(hist.toSeq == Seq(("a", false), ("b", true)))
  }

  test("goldenRecord: per-field latest non-null wins; all-null stays null; order ties by tiebreak") {
    import spark.implicits._
    val recs = Seq(
      (1L, 1L, 1L, Some(10.0), None),
      (1L, 2L, 1L, None, Some(20.0)),
      (1L, 3L, 1L, Some(30.0), None),
      // key 2: equal order 1, tiebreak decides f1; f2 never set
      (2L, 1L, 1L, Some(5.0), None),
      (2L, 1L, 2L, Some(7.0), None)
    ).toDF("k", "o", "tb", "f1", "f2")
    val got = Merge.goldenRecord(recs, $"k", $"o", $"tb", Seq("f1", "f2"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), r.getLong(3)))).toMap
    assert(got(1L) == ((Some(30.0), Some(20.0), 3L)))
    assert(got(2L) == ((Some(7.0), None, 2L)))
    // single hash aggregate: no window, no join in the plan
    val plan = Merge.goldenRecord(recs, $"k", $"o", $"tb", Seq("f1", "f2"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"), s"plan:\n$plan")
  }
}
