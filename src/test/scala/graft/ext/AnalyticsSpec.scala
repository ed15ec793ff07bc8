package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.etl.Merge

/** Semantics coverage for the round-6 analytics operators: salted join
  * (result-invisible skew mitigation), transition matrix, moments.
  */
class AnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.GraftSession.local("analytics-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def big: DataFrame = {
    import spark.implicits._
    // 100 rows over 3 hot keys + one key absent from the dim
    (1L to 100L).map(i => (i, s"k${(i % 3) + 1}", i * 1.0)).toDF("id", "k", "v")
      .union(Seq((101L, "orphan", 1.0)).toDF("id", "k", "v"))
  }

  private def dim: DataFrame = {
    import spark.implicits._
    Seq(("k1", 10.0), ("k2", 20.0), ("k3", 30.0)).toDF("k", "w")
  }

  test("saltedJoin: inner join parity with the plain join") {
    import spark.implicits._
    val plain = big.join(dim, Seq("k"))
      .select($"id", $"k", $"v", $"w").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, dim, Seq("k"), Seq($"id"), salts = 4)
      .select($"id", $"k", $"v", $"w").collect().map(_.toSeq).toSet
    assert(salted == plain && plain.size == 100)
  }

  test("saltedJoin: left join keeps unmatched big rows exactly once") {
    import spark.implicits._
    val out = Skew.saltedJoin(big, dim, Seq("k"), Seq($"id"), salts = 4, "left")
    assert(out.count() == 101)
    assert(out.filter($"k" === "orphan" && $"w".isNull).count() == 1)
  }

  test("saltedJoin: left_semi / left_anti parity; replicated types rejected") {
    import spark.implicits._
    assert(Skew.saltedJoin(big, dim, Seq("k"), Seq($"id"), 4, "left_semi").count() == 100)
    assert(Skew.saltedJoin(big, dim, Seq("k"), Seq($"id"), 4, "left_anti").count() == 1)
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, dim, Seq("k"), Seq($"id"), 4, "full")
    }
  }

  test("saltedJoin: under a shuffle_hash hint the physical join keys carry the salt") {
    import spark.implicits._
    val plan = Skew.saltedJoin(big, dim.hint("shuffle_hash"), Seq("k"), Seq($"id"), 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"expected SHJ in:\n$plan")
    assert(plan.contains("__salt"), s"expected salted keys in:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"unexpected broadcast in:\n$plan")
  }

  test("transitionMatrix: hand-computed pairs, counts, and exact ppb") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"),
      (2L, 1L, "B"), (2L, 2L, "B")).toDF("user_id", "seq", "etype")
      .withColumn("ts", timestamp_seconds(lit(1767225600L) + col("seq")))
    val got = Funnel.transitionMatrix(ev, col("user_id"), col("ts"), col("etype"), col("seq"))
      .orderBy("from_state", "to_state")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("A", "B", 1L, 1000000000L),
      ("B", "A", 1L, 500000000L),
      ("B", "B", 1L, 500000000L)))
  }

  test("transitionMatrix: same-timestamp ties resolve by the tie-break column") {
    import spark.implicits._
    val ts0 = to_timestamp(lit("2026-01-01 00:00:00"))
    val ev = Seq((1L, 1L, "X"), (1L, 2L, "Y")).toDF("user_id", "seq", "etype")
      .withColumn("ts", ts0)
    val got = Funnel.transitionMatrix(ev, col("user_id"), col("ts"), col("etype"), col("seq"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("X", "Y")))
  }

  test("charStats: hand-computed classes; non-ASCII and supplementary code points") {
    import spark.implicits._
    // A a ␠ b b 9 ␠ A é 😀 ␉ — 11 code points, 9 ASCII (é and the
    // supplementary emoji excluded from every ASCII-scoped stat)
    val df = Seq((1L, "Aa bb9 Aé😀\t"), (2L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.charStats(df, $"doc_id", $"text").orderBy("doc_id").collect()
    assert(rows(0).toSeq == Seq(1L, 11L, 9L, 3L, 1L, 5L, 2L, 6L, 2L))
    assert(rows(1).toSeq == Seq(2L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    // codegen path agrees with the direct helper
    val direct = graft.functions.CharClassStats.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("Aa bb9 Aé😀\t"))
    assert((0 until 8).map(direct.getLong) == Seq(11L, 9L, 3L, 1L, 5L, 2L, 6L, 2L))
  }

  test("charStats: scan-stage plan — no Generate, no per-character explode") {
    import spark.implicits._
    val df = Seq((1L, "hello world")).toDF("doc_id", "text")
    val plan = TextAnalysis.charStats(df, $"doc_id", $"text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"unexpected Generate in:\n$plan")
    assert(!plan.contains("Exchange"), s"unexpected Exchange in:\n$plan")
  }

  test("pageRank: hand-computed one-iteration ranks on a path graph") {
    import spark.implicits._
    // undirected a—b—c, both orientations; deg a=1 b=2 c=1, N=3,
    // init 333333, base 50000
    val e = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")).toDF("src", "dst")
    val r = Graph.pageRank(e, "src", "dst", iters = 1)
      .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    // inflow a = 333333 div 2 = 166666 → 50000 + 850000·166666 div 10⁶ = 191666
    // inflow b = 333333 + 333333 → 50000 + 566666 = 616666
    assert(r == Map("a" -> 191666L, "b" -> 616666L, "c" -> 191666L))
  }

  test("pageRank: iters=25 keeps a bounded plan via cadence checkpoints, ranks exact") {
    import spark.implicits._
    // symmetric 12-ring at rankUnit=12e6: u = 1e6 per node and the
    // damped update has the exact integer fixpoint 150000 + 850000 = u,
    // so EVERY iteration (checkpointed or not) must return exactly u
    val n = 12
    val ring = Seq.tabulate(n)(i => (s"n$i", s"n${(i + 1) % n}"))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val r = Graph.pageRank(ring, "src", "dst", iters = 25, rankUnit = 12000000L)
    // cadence: last checkpoint at i=20 → the returned lineage holds at
    // most 5 rounds × 3 joins (2 inflow + 1 update); an uncheckpointed
    // run would hold 75
    val joins = "Join".r.findAllIn(r.queryExecution.optimizedPlan.toString).length
    assert(joins <= 15, s"rank lineage not truncated: $joins joins in plan")
    val ranks = r.collect().map(x => (x.getString(0), x.getLong(1))).toMap
    assert(ranks.size == n && ranks.values.forall(_ == 1000000L), ranks.toString)
  }

  test("pageRank: only nodes with out-edges are ranked (dangling leak documented)") {
    import spark.implicits._
    val e = Seq(("a", "b")).toDF("src", "dst")
    val r = Graph.pageRank(e, "src", "dst", iters = 2)
      .collect().map(x => x.getString(0)).toSeq
    assert(r == Seq("a"))
  }

  test("joinCardinality: per-key n·m without running the join") {
    import spark.implicits._
    val l = Seq("x", "x", "y").toDF("k")
    val r = Seq("x", "y", "y", "z").toDF("k")
    val got = Profile.joinCardinality(l, col("k"), r, col("k"))
      .collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getDecimal(3).longValueExact()))
      .toSeq
    assert(got.toSet == Set(("x", 2L, 1L, 2L), ("y", 1L, 2L, 2L)))
    assert(got.map(_._4).sum == l.join(r, Seq("k")).count())
  }

  test("applyChangeLog: updates replace, deletes remove, absent-key delete is a no-op") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    val changes = Seq(
      (2L, "B", "U"),   // update
      (3L, "c", "D"),   // delete
      (5L, "e", "U"),   // insert
      (6L, "x", "D")    // delete of an absent key: no-op
    ).toDF("id", "v", "op")
    val got = Merge.applyChangeLog(base, changes, Seq("id"), "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "B"), (4L, "d"), (5L, "e")))
  }

  test("winsorize: clamps into group percentiles, preserves rows, nulls stay null") {
    import spark.implicits._
    // group g: 0..100 → p10 = 10.0, p90 = 90.0 (exact interpolation on
    // the integer grid)
    val df = (0 to 100).map(i => ("g", Some(i.toDouble))).toDF("grp", "x")
      .union(Seq(("g", None: Option[Double])).toDF("grp", "x"))
    val out = Profile.winsorize(df, Seq("grp"), col("x"), 0.10, 0.90)
    assert(out.count() == 102)
    val w = out.filter(col("x").isNotNull)
      .select(col("x"), col("winsorized"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    assert(w(0.0) == 10.0 && w(5.0) == 10.0)      // low tail clamped up
    assert(w(50.0) == 50.0)                        // interior untouched
    assert(w(95.0) == 90.0 && w(100.0) == 90.0)    // high tail clamped down
    assert(out.filter(col("x").isNull && col("winsorized").isNotNull).count() == 0)
  }

  test("pathNgrams: trigram counts; n=2 recovers transitionMatrix pair counts") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "C"), (1L, 4L, "B"),
      (2L, 1L, "A"), (2L, 2L, "B"), (2L, 3L, "C")).toDF("user_id", "seq", "etype")
      .withColumn("ts", timestamp_seconds(lit(1767225600L) + col("seq")))
    val tri = Funnel.pathNgrams(ev, col("user_id"), col("ts"), col("etype"), col("seq"), 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(tri == Map("A > B > C" -> 2L, "B > C > B" -> 1L))
    val bi = Funnel.pathNgrams(ev, col("user_id"), col("ts"), col("etype"), col("seq"), 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val tm = Funnel.transitionMatrix(ev, col("user_id"), col("ts"), col("etype"), col("seq"))
      .collect().map(r => (s"${r.getString(0)} > ${r.getString(1)}", r.getLong(2))).toMap
    assert(bi == tm)
  }

  test("lagFeatures: hand-computed lags and rolling stats; one Exchange in the plan") {
    import spark.implicits._
    val ev = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0), (2L, 1L, 5.0))
      .toDF("user_id", "seq", "v")
      .withColumn("ts", timestamp_seconds(lit(1767225600L) + col("seq")))
    val out = TimeSeries.lagFeatures(ev, col("user_id"), col("ts"), col("v"),
      col("seq"), lags = Seq(1), rollWindow = 2)
    val rows = out.orderBy("key", "tiebreak")
      .select("key", "lag_1", "roll_n", "roll_mean", "roll_min", "roll_max")
      .collect()
    assert(rows(0).isNullAt(1) && rows(0).getLong(2) == 1L && rows(0).getDouble(3) == 10.0)
    assert(rows(1).getDouble(1) == 10.0 && rows(1).getDouble(3) == 15.0
      && rows(1).getDouble(4) == 10.0 && rows(1).getDouble(5) == 20.0)
    assert(rows(2).getDouble(1) == 20.0 && rows(2).getDouble(3) == 25.0)
    assert(rows(3).isNullAt(1) && rows(3).getDouble(3) == 5.0)
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(out.queryExecution.executedPlan.toString).length
    assert(exchanges == 1, s"expected one Exchange, got $exchanges")
  }

  test("bipartiteProject: shared-neighbor weights; hub keys excluded entirely") {
    import spark.implicits._
    // c1 → {s1, s2}, c2 → {s1, s2}, hub → {s1, s2, s3} with maxDegree 2
    val e = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1"), ("c2", "s2"),
      ("hub", "s1"), ("hub", "s2"), ("hub", "s3")).toDF("l", "r")
    val got = Graph.bipartiteProject(e, "l", "r", maxDegree = 2)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet
    assert(got == Set(("s1", "s2", 2L))) // hub's s1-s3/s2-s3 pairs absent
  }

  test("keyOverlap: key and row volumes on both sides of a partial overlap") {
    import spark.implicits._
    val l = Seq(1L, 1L, 2L, 3L).toDF("k")      // keys 1,2,3; rows 2,1,1
    val r = Seq(2L, 2L, 2L, 4L).toDF("k")      // keys 2,4;   rows 3,1
    val row = Profile.keyOverlap(l, col("k"), r, col("k")).head()
    assert(row.toSeq == Seq(3L, 2L, 1L, 1L, 3L, 3L, 1L))
  }

  test("splitByTime: train/embargo/test partition at the exact time quantile") {
    import spark.implicits._
    // 10 events at t=1..10 → p50 of epoch seconds = 5.5; embargo 2s
    // → train {1..5}, excluded (5.5, 7.5], test {8, 9, 10}
    val ev = (1L to 10L).map(i => (i, i)).toDF("id", "sec")
      .withColumn("ts", timestamp_seconds(lit(1767225600L) + col("sec")))
    val got = Sampling.splitByTime(ev, col("ts"), 0.5, 2L)
      .select(col("id"), col("split"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert((1L to 5L).forall(got(_) == Some("train")))
    assert(got(6L).isEmpty && got(7L).isEmpty)
    assert((8L to 10L).forall(got(_) == Some("test")))
  }

  test("intervalMerge: touching intervals merge, disjoint stay, per-key islands") {
    import spark.implicits._
    val iv = Seq(
      ("k1", 1, 5, 1), ("k1", 5, 8, 2),   // touch → one island [1,8]
      ("k1", 10, 12, 3),                   // disjoint island
      ("k1", 2, 3, 4),                     // nested inside [1,8]
      ("k2", 1, 2, 5)).toDF("k", "s", "e", "tb")
    val got = Ranges.intervalMerge(iv, col("k"), col("s"), col("e"), col("tb"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(got == Set(("k1", 1, 8, 3L), ("k1", 10, 12, 1L), ("k2", 1, 2, 1L)))
  }

  test("lshRecallProbe: found never exceeds truth; recall is the exact ppb ratio") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"
    val near = "the quick brown fox jumps over the lazy dog and runs far away into the green forest today"
    val other = "completely different words about database systems and query optimization at massive scale"
    val docs = Seq((1L, base), (2L, base), (3L, near), (4L, other)).toDF("doc_id", "text")
    val row = Dedup.lshRecallProbe(docs, "doc_id", "text", sampleRate = 1.0).head()
    val (nTrue, nFound) = (row.getLong(0), row.getLong(1))
    assert(nTrue >= 1L && nFound <= nTrue)
    assert(row.getLong(2) == nFound * 1000000000L / nTrue)
  }

  test("bandJoin: boundary-inclusive matches across bucket edges, no nested loop") {
    import spark.implicits._
    val l = Seq((1L, 0.999), (2L, 5.0), (3L, 10.0)).toDF("id", "v")
    val r = Seq((10L, 1.005), (20L, 5.02), (30L, 10.0)).toDF("id", "v")
    val out = Joins.bandJoin(l, col("id"), col("v"), r, col("id"), col("v"), eps = 0.01)
    val got = out.collect().map(x => (x.getLong(0), x.getLong(2))).toSet
    // 0.999 vs 1.005: in band AND in different buckets (99 vs 100) —
    // only the bucket±1 probe finds it; 5.0 vs 5.02 out of band;
    // 10.0 vs 10.0 distance 0
    assert(got == Set((1L, 10L), (3L, 30L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("bandJoin: |val|/eps beyond the long bucket domain fails loud, not silent") {
    import spark.implicits._
    val l = Seq((1L, 1.0e18)).toDF("id", "v")
    val r = Seq((10L, 1.0e18)).toDF("id", "v")
    val e = intercept[Exception] {
      Joins.bandJoin(l, col("id"), col("v"), r, col("id"), col("v"), eps = 1e-9).collect()
    }
    assert(e.getMessage.contains("bandJoin") ||
      Option(e.getCause).exists(_.getMessage.contains("bandJoin")), e.toString)
    // same magnitudes with a sane eps still work
    assert(Joins.bandJoin(l, col("id"), col("v"), r, col("id"), col("v"), eps = 1.0)
      .count() == 1)
  }

  test("applyChangeLog: a retyped column fails the schema require, not unionByName") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("id", "v")
    val retyped = Seq((2L, 7, "U")).toDF("id", "v", "op") // v: int, base has string
    val e = intercept[IllegalArgumentException] {
      Merge.applyChangeLog(base, retyped, Seq("id"), "op")
    }
    assert(e.getMessage.contains("schemas differ") && e.getMessage.contains("v:"), e.getMessage)
  }

  test("intervalMerge: an inverted interval raises; null-bound rows are dropped") {
    import spark.implicits._
    val bad = Seq(("k", 5, 1, 1)).toDF("k", "s", "e", "tb")
    val e = intercept[Exception] {
      Ranges.intervalMerge(bad, col("k"), col("s"), col("e"), col("tb")).collect()
    }
    assert(e.getMessage.contains("inverted interval") ||
      Option(e.getCause).exists(_.getMessage.contains("inverted interval")), e.toString)
    val withNulls = Seq(
      ("k", Some(1), Some(3), 1), ("k", None, Some(9), 2), ("k", Some(4), None, 3))
      .toDF("k", "s", "e", "tb")
    val got = Ranges.intervalMerge(withNulls, col("k"), col("s"), col("e"), col("tb"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(got.toSeq == Seq(("k", 1, 3, 1L)))
  }

  test("ngramNovelty: seen text scores 0, unseen text 1, short docs null with no grams") {
    import spark.implicits._
    val corpus = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val probes = Seq(
      (1L, "alpha beta gamma delta"),          // all trigrams seen
      (2L, "one two three four five"),          // all novel
      (3L, "hi there")).toDF("doc_id", "text")  // too short for a trigram
    val got = TextAnalysis.ngramNovelty(probes, col("doc_id"), col("text"),
        corpus, col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got(0) == ((1L, 2L, 0L, Some(0.0))))
    assert(got(1) == ((2L, 3L, 3L, Some(1.0))))
    // no grams = no evidence → null, not "entirely seen"
    assert(got(2) == ((3L, 0L, 0L, None)))
  }

  test("winsorize: rows in a NULL group survive and clamp against their own percentiles") {
    import spark.implicits._
    val df = Seq((Some("g"), 1.0), (Some("g"), 2.0),
      (None: Option[String], 10.0), (None, 20.0), (None, 30.0)).toDF("grp", "x")
    val out = Profile.winsorize(df, Seq("grp"), col("x"), 0.25, 0.75)
    assert(out.count() == 5)
    val nullGrp = out.filter(col("grp").isNull)
      .select("x", "winsorized")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    // null group alone: p25 = 15, p75 = 25
    assert(nullGrp(10.0) == 15.0 && nullGrp(20.0) == 20.0 && nullGrp(30.0) == 25.0)
  }

  test("zscoreNormalize: null-group rows survive; null values excluded from n") {
    import spark.implicits._
    val df = Seq((Some("g"), Some(1.0)), (Some("g"), Some(3.0)),
      (None: Option[String], Some(10.0)), (None, Some(20.0)),
      (Some("g"), None: Option[Double])).toDF("grp", "x")
    val out = Profile.zscoreNormalize(df, Seq("grp"), col("x"))
    assert(out.count() == 5)                       // row-preserving incl. null group
    val nullG = out.filter(col("grp").isNull).select("x", "z")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    // null group: mean 15, sample std sqrt(50) → z = ±5/sqrt(50)
    assert(math.abs(nullG(10.0) + 5.0 / math.sqrt(50.0)) < 1e-12)
    // group g: the null value must not inflate n — mean 2, std sqrt(2)
    val g = out.filter(col("grp") === "g" && col("x") === 1.0).head()
    assert(math.abs(g.getAs[Double]("z") + 1.0 / math.sqrt(2.0)) < 1e-12)
  }

  test("robustOutliers: a null-group outlier is judged, not silently skipped") {
    import spark.implicits._
    val df = ((1 to 20).map(i => (None: Option[String], i.toDouble / 10.0)) :+
      ((None: Option[String], 1000.0))).toDF("grp", "x")
    val hits = Profile.robustOutliers(df, Seq("grp"), col("x"), k = 3.0)
      .collect()
    assert(hits.length == 1 && hits(0).getDouble(1) == 1000.0, hits.mkString(","))
  }

  test("moments: null values are excluded from n, not just from the sums") {
    import spark.implicits._
    val df = Seq(("g", Some(2.0)), ("g", None: Option[Double])).toDF("grp", "x")
    val row = Profile.moments(df, Seq("grp"), col("x")).head()
    assert(row.getLong(1) == 1L)          // n counts the non-null value only
    assert(row.getDouble(2) == 2.0)       // mean of the present value
    assert(row.getDouble(3) == 0.0)       // variance 0, not phantom spread
  }

  test("applyChangeLog: a NULL/invalid op fails fast instead of silently deleting") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("id", "v")
    val bad = Seq((1L, "x", null: String)).toDF("id", "v", "op")
    val ex = intercept[Exception] {
      Merge.applyChangeLog(base, bad, Seq("id"), "op").collect()
    }
    assert(ex.getMessage.contains("op must be 'U' or 'D'"), ex.getMessage)
  }

  test("pathNgrams: a null state breaks the path — no phantom adjacency") {
    import spark.implicits._
    val ev = Seq((1L, 1L, Some("A")), (1L, 2L, None: Option[String]), (1L, 3L, Some("B")))
      .toDF("user_id", "seq", "etype")
      .withColumn("ts", timestamp_seconds(lit(1767225600L) + col("seq")))
    val got = Funnel.pathNgrams(ev, col("user_id"), col("ts"), col("etype"), col("seq"), 2)
      .collect()
    assert(got.isEmpty, s"phantom path emitted: ${got.mkString(",")}")
  }

  test("pageRank: rankUnit too small for the node count fails fast, not zeros") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    // legal call works at a larger unit and scales ranks accordingly
    val r = Graph.pageRank(e, "src", "dst", iters = 1, rankUnit = 1000000000L)
      .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    assert(r.values.forall(_ > 100000000L), r.toString) // ~unit/2 each
    // non-multiple-of-1e6 unit rejected outright
    intercept[IllegalArgumentException] {
      Graph.pageRank(e, "src", "dst", iters = 1, rankUnit = 999999L)
    }
    // resolution guard: 20k nodes at the default ppm unit leaves only
    // 50 rank units per node (< 100) — must fail, not decay to zeros
    val n = 20000
    val ring = Seq.tabulate(n)(i => (s"n$i", s"n${(i + 1) % n}"))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRank(ring, "src", "dst", iters = 1)
    }
    assert(ex.getMessage.contains("raise rankUnit"), ex.getMessage)
  }

  test("moments: hand-computed mean/variance/skewness/kurtosis; zero-variance null") {
    import spark.implicits._
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0),
      ("c", 5.0), ("c", 5.0)).toDF("grp", "x")
    val rows = Profile.moments(df, Seq("grp"), col("x"))
      .orderBy("grp").collect()
    val c = rows(0); val g = rows(1)
    assert(g.getLong(1) == 3L && g.getDouble(2) == 2.0)
    assert(math.abs(g.getDouble(3) - 2.0 / 3.0) < 1e-15)      // population variance
    assert(g.getDouble(4) == 0.0)                             // symmetric → skew 0 exactly
    assert(math.abs(g.getDouble(5) - (-1.5)) < 1e-12)         // uniform-3 excess kurtosis
    assert(c.getDouble(2) == 5.0 && c.getDouble(3) == 0.0)
    assert(c.isNullAt(4) && c.isNullAt(5))                    // zero variance → null shape
  }
}
