package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics coverage for the round-7 signal operators: sorted-
  * neighborhood dedup, local clustering coefficient, linear
  * interpolation, Welch's t-test, first-seen curves, Jaro–Winkler,
  * sentence stats.
  */
class SignalsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.GraftSession.local("signals-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  test("sortedNeighborPairs: adjacent near-dups found; cross-block pair never compared") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta epsilon"), // same block, adjacent, J=4/5
      (3L, "alpha beta gamma"),               // same block, J(1,3)=3/4 within window 3
      (4L, "zeta eta theta")                  // different block prefix — never compared
    ).toDF("id", "text")
    val got = Dedup.sortedNeighborPairs(docs, "id", "text",
        windowSize = 3, blockPrefix = 4, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // sort order by canonical key: doc3 < doc1 < doc2 ("alpha beta gamma" <
    // "... delta" < "... delta epsilon"); window 3 pairs each with next 2
    assert(got.keySet == Set((1L, 3L), (1L, 2L), (2L, 3L)))
    assert(got((1L, 2L)) == 4.0 / 5.0)
    assert(got((1L, 3L)) == 3.0 / 4.0)
    assert(got((2L, 3L)) == 3.0 / 5.0)
  }

  test("sortedNeighborPairs: zero joins in the physical plan; window guard") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c d")).toDF("id", "text")
    val plan = Dedup.sortedNeighborPairs(docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"join in:\n$plan")
    intercept[IllegalArgumentException] {
      Dedup.sortedNeighborPairs(docs, "id", "text", windowSize = 1)
    }
  }

  test("clusteringCoefficient: K4 all 1.0; star hub 0.0 with null leaves; path middle 0.0") {
    import spark.implicits._
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong))
      .toDF("x", "y")
    val ccK4 = Graph.clusteringCoefficient(k4, "x", "y").collect()
    assert(ccK4.length == 4)
    ccK4.foreach { r =>
      assert(r.getLong(1) == 3 && r.getLong(2) == 3 && r.getDouble(3) == 1.0)
    }
    val star = (1L to 5L).map(i => (0L, i)).toDF("x", "y")
    val ccStar = Graph.clusteringCoefficient(star, "x", "y")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(ccStar(0L).getLong(1) == 5 && ccStar(0L).getDouble(3) == 0.0)
    (1L to 5L).foreach { i =>
      assert(ccStar(i).getLong(1) == 1 && ccStar(i).isNullAt(3))
    }
    val path = Seq((1L, 2L), (2L, 3L)).toDF("x", "y")
    val mid = Graph.clusteringCoefficient(path, "x", "y")
      .filter(col("id") === 2L).collect().head
    assert(mid.getLong(1) == 2 && mid.getLong(2) == 0 && mid.getDouble(3) == 0.0)
  }

  test("interpolateFill: straight line across the gap; edges stay null; nulls don't anchor") {
    import spark.implicits._
    // key "k": observed at buckets 0 (v=1.0) and 3 (v=4.0); bucket 1 has
    // a NULL-value event (must not anchor); buckets before/after nothing
    val rows = Seq(
      ("k", 0L, Some(1.0), 1L),
      ("k", 70L, None, 2L), // bucket 1 at step 60 — null value, no anchor
      ("k", 190L, Some(4.0), 3L)) // bucket 3
    val df = rows.toDF("k", "sec", "v", "id")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"),
        col("v"), col("id"))
    val got = TimeSeries.interpolateFill(df, col("k"), col("ts"), col("v"),
        col("id"), stepSeconds = 60L)
      .orderBy(col("bucket_ts"))
      .collect()
    assert(got.length == 4) // buckets 0..3
    assert(got(0).getBoolean(2) && got(0).getDouble(3) == 1.0)
    assert(!got(1).getBoolean(2) && got(1).getDouble(3) == 2.0)
    assert(!got(2).getBoolean(2) && got(2).getDouble(3) == 3.0)
    assert(got(3).getBoolean(2) && got(3).getDouble(3) == 4.0)
  }

  test("interpolateFill: latest observation wins a cell; lone observation interpolates nothing") {
    import spark.implicits._
    val df = Seq(
      ("a", 10L, 5.0, 1L), ("a", 50L, 7.0, 2L), // same bucket 0: id2 later
      ("b", 0L, 9.0, 9L))
      .toDF("k", "sec", "v", "id")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"), col("id"))
    val got = TimeSeries.interpolateFill(df, col("k"), col("ts"), col("v"),
        col("id"), 60L)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(got("a") == 7.0 && got("b") == 9.0)
  }

  test("welchTTest: hand-checked t and df; singleton slice nulls variance") {
    import spark.implicits._
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0)).toDF("s", "v")
    val r = Profile.welchTTest(df, col("s"), col("v"), "a", "b").collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 4.0)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(5) - 4.0) < 1e-12)
    assert(math.abs(r.getDouble(6) - (-2.0 / math.sqrt(5.0 / 3.0))) < 1e-12)
    assert(math.abs(r.getDouble(7) - 50.0 / 17.0) < 1e-12)
    val single = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("s", "v")
    val r2 = Profile.welchTTest(single, col("s"), col("v"), "a", "b").collect().head
    assert(r2.getLong(0) == 1 && r2.isNullAt(4) && r2.isNullAt(6) && r2.isNullAt(7))
  }

  test("firstSeenCumulative: first day only; running total accumulates") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-03 10:00:00"), // user 1 first on d1
      (2L, "2024-01-01 23:00:00"),
      (3L, "2024-01-03 05:00:00"))
      .toDF("u", "tss").select(col("u"), to_timestamp(col("tss")).as("ts"))
    val got = TimeSeries.firstSeenCumulative(df, col("u"), col("ts"))
      .orderBy(col("day")).collect()
    assert(got.length == 2)
    assert(got(0).getLong(1) == 2 && got(0).getLong(2) == 2)
    assert(got(1).getLong(1) == 1 && got(1).getLong(2) == 3)
  }

  test("jaroWinkler: textbook values, boost gating, empty-string contract") {
    import spark.implicits._
    def jw(a: String, b: String): Double =
      Seq((a, b)).toDF("a", "b")
        .select(graft.functions.LinkageFunctions.jaroWinkler(col("a"), col("b")))
        .collect().head.getDouble(0)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(jw("same", "same") == 1.0)
    assert(jw("", "") == 1.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("abc", "xyz") == 0.0) // no matches
    // below the 0.7 boost threshold the shared prefix must NOT be rewarded
    val plain = jw("abcdefgh", "abzzzzzz")
    assert(plain <= 0.7 + 1e-12)
    // code-point semantics: multi-byte characters are single units, so
    // a one-codepoint substitution in a 6-char name scores exactly as
    // its ASCII twin does (byte-wise matching would see 2-3 byte
    // subunits and inflate/deflate the score)
    assert(math.abs(jw("MÜLLER", "MULLER") - jw("MXLLER", "MULLER")) < 1e-12)
    assert(jw("日本語", "日本語") == 1.0)
    // continuation bytes of different characters must not match:
    // é (C3 A9) vs ù (C3 B9) share a lead byte; as code points they
    // are simply two different single units → no match at all
    assert(jw("é", "ù") == 0.0)
  }

  test("changePoint: finds the level shift; short keys absent; earliest-position tie-break") {
    import spark.implicits._
    // key "s": 4 rows at 1.0 then 4 rows at 5.0 — best split at i=4
    val shift = (1 to 4).map(i => ("s", i.toLong, 1.0)) ++
      (5 to 8).map(i => ("s", i.toLong, 5.0))
    // key "t": constant series — all stats 0.0, tie broken at i=minSegment
    val const = (1 to 8).map(i => ("t", i.toLong, 2.0))
    // key "u": too short for two segments of 2
    val short = Seq(("u", 1L, 1.0), ("u", 2L, 9.0), ("u", 3L, 1.0))
    val df = (shift ++ const ++ short).toDF("k", "sec", "v")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"),
        col("sec").as("id"))
    val got = TimeSeries.changePoint(df, col("k"), col("ts"), col("v"),
        col("id"), minSegment = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("s", "t"))
    val s = got("s")
    assert(s.getLong(1) == 4 && s.getDouble(3) == 1.0 && s.getDouble(4) == 5.0)
    assert(s.getDouble(5) == 4.0)
    assert(got("t").getLong(1) == 2 && got("t").getDouble(5) == 0.0)
  }

  test("vocabGrowth: new types land in their first bucket; saturation bucket reports 0") {
    import spark.implicits._
    val df = Seq(
      (0L, "a b a"),       // bucket 0: 3 tokens, types {a, b}
      (1L, "b c"),         // bucket 1: 2 tokens, new {c}
      (2L, "a b c a"))     // bucket 2: 4 tokens, new {} → 0
      .toDF("bk", "text")
    val got = TextAnalysis.vocabGrowth(df, col("bk"), col("text"))
      .orderBy(col("bucket")).collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(3L, 2L, 4L))
    assert(got.map(_.getLong(2)).toSeq == Seq(2L, 1L, 0L))
    assert(got.map(_.getLong(3)).toSeq == Seq(2L, 3L, 3L))
  }

  test("dupRateBySource: corpus-wide hash counts; cross-source dup counts in both sources") {
    import spark.implicits._
    val df = Seq(
      ("web", "Same   Doc"), ("books", "same doc"), // canonical dups across sources
      ("web", "unique one"), ("books", "unique two"), ("books", "unique three"))
      .toDF("source", "text")
    val got = Dedup.dupRateBySource(df, col("source"), col("text"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("web") == ((2L, 1L, 0.5)))
    assert(got("books") == ((3L, 1L, 1.0 / 3.0)))
  }

  test("sourceOverlap: shared distinct shingles with containment vs the smaller side") {
    import spark.implicits._
    val df = Seq(
      // source a: shingles {xyz, yzw, pqr} (3 distinct)
      ("a", "x y z w"), ("a", "p q r"), ("a", "p Q r"), // canonical dup shingle
      // source b: shingles {xyz, yzw} — both shared with a → containment 1.0
      ("b", "x y z"), ("b", "y z w"),
      // source c: no shared shingle → absent
      ("c", "m n o"))
      .toDF("source", "text")
    val got = Dedup.sourceOverlap(df, col("source"), col("text")).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 2 && r.getDouble(3) == 1.0)
  }

  test("sentenceStats: terminator runs count once; no-terminator doc gets null mean") {
    import spark.implicits._
    val df = Seq(
      (1L, "One two. Three four! Five..."),
      (2L, "no terminator here"),
      (3L, "Ends clean.   ")).toDF("doc_id", "text")
    val got = TextAnalysis.sentenceStats(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = got(1L)
    assert(d1.getLong(1) == 3 && d1.getLong(2) == 5)
    assert(d1.getDouble(3) == 5.0 / 3.0 && d1.getBoolean(4))
    val d2 = got(2L)
    assert(d2.getLong(1) == 0 && d2.isNullAt(3) && !d2.getBoolean(4))
    assert(got(3L).getBoolean(4)) // trailing whitespace stripped before the check
  }

  test("trigramBackoffScore: hand hits and both backoff levels, integer-exact") {
    import spark.implicits._
    val train = Seq((0L, "a b c d")).toDF("id", "text")
    val score = Seq(
      (1L, "a b c x"),  // (a,b,c) tri hit p=1; (b,c,x) unseen everywhere -> 0
      (3L, "x b c"),    // (x,b,c): tri miss, bigram (b,c) hit -> 0.4*1
      (5L, "c d a a")   // (c,d,a): uni backoff on a: 0.16*c(a)/N = 0.16/4
    ).toDF("id", "text")
    val got = LangModel.trigramBackoffScore(train, score, col("id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got(1L) == ((2L, 1L, 0L, 1L, 5.0e8)))
    assert(got(3L) == ((1L, 0L, 1L, 0L, 4.0e8)))
    // (c,d,a): (1*1e9 div 4)*2 div 5*2 div 5 = 4.0e7; (d,a,a) unigram a
    // seen too -> same 4.0e7 per trigram
    assert(got(5L) == ((2L, 0L, 0L, 2L, 4.0e7)))
  }

  test("sparseCosinePairs: identical docs 1.0, one shared shingle 0.5, df cap prunes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "w1 w2 w3 w4"), (2L, "w1 w2 w3 w4"), (3L, "w2 w3 w4 w5"),
      // the "s1 s2 s3" shingle sits in 4 docs -> df 4 > maxDf 3 -> pruned,
      // so these share NOTHING in the kept space
      (4L, "s1 s2 s3"), (5L, "s1 s2 s3"), (6L, "s1 s2 s3"), (7L, "s1 s2 s3")
    ).toDF("id", "text")
    val got = Retrieval.sparseCosinePairs(docs, col("id"), col("text"),
        maxDf = 3, minCos = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got((1L, 2L)) == 1.0, "quantization must absorb the sqrt ulp")
    assert(got((1L, 3L)) == 0.5 && got((2L, 3L)) == 0.5)
    val plan = Retrieval.sparseCosinePairs(docs, col("id"), col("text"), 3, 0.1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }

  test("zipfProfile and byteTokenStats: hand aggregates") {
    import spark.implicits._
    val docs = Seq(("s", "a a a b"), ("s", "b c")).toDF("src", "text")
    val z = TextAnalysis.zipfProfile(docs, col("src"), col("text")).collect()
    assert(z.length == 1)
    val r = z.head
    assert(r.getLong(1) == 6 && r.getLong(2) == 3)
    assert(r.getDouble(3) == 3.0 / 6.0)   // top1 = 'a'
    assert(r.getDouble(4) == 1.0)          // <=10 types -> full mass
    assert(r.getDouble(5) == 1.0 / 3.0)    // hapax: only 'c'
    val b = TextAnalysis.byteTokenStats(
        Seq(("s", "aa bb"), ("s", "aa")).toDF("src", "text"),
        col("src"), col("text")).collect()
    assert(b.length == 1)
    val rb = b.head
    assert(rb.getLong(1) == 2 && rb.getLong(2) == 7 && rb.getLong(3) == 3)
    assert(rb.getDouble(4) == 7.0 / 3.0)
    assert(rb.getDouble(5) == 4.0 / 6.0) // type bytes aa+bb over token bytes
  }

  test("seasonalNaiveResidual: 3-sigma flag fires on the slot outlier only") {
    import spark.implicits._
    import java.sql.Timestamp
    // 11 weekly samples in ONE phase slot: 10 at 10.0 and one at 1000.0.
    // z(outlier) = sqrt(10) > 3 -> flagged; normals z ~ 0.3 -> not.
    val t0 = Timestamp.valueOf("2024-01-01 00:30:00").getTime
    val ev = (0 until 11).map { i =>
      (i.toLong, "m", new Timestamp(t0 + i * 7L * 86400_000L),
        if (i == 10) 1000.0 else 10.0)
    }.toDF("event_id", "k", "ts", "v")
    val got = TimeSeries.seasonalNaiveResidual(ev, $"k", $"ts", $"v", $"event_id")
      .collect().map(r => r.getLong(3) -> ((r.getDouble(5), r.getBoolean(7)))).toMap
    assert(got.size == 11)
    assert(got(10L)._2, "outlier must flag")
    assert(got(10L)._1 == 100.0, "baseline mean is exact")
    (0L to 9L).foreach(i => assert(!got(i)._2, s"normal row $i must not flag"))
  }

  test("decayAttribution: halving weights, ppb normalization, lookback cut") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(daysAgo: Int) =
      new Timestamp(Timestamp.valueOf("2024-03-01 00:00:00").getTime - daysAgo * 86400_000L)
    val ev = Seq(
      (1L, 1L, ts(2), "click"),    // 2 half-lives before conv -> w = 1e9>>2
      (2L, 1L, ts(1), "view"),     // 1 half-life  -> w = 1e9>>1
      (3L, 1L, ts(8), "signup"),   // outside 7-step lookback -> dropped
      (4L, 1L, ts(-1), "view"),    // AFTER the conversion -> dropped
      (5L, 1L, ts(0), "purchase")
    ).toDF("event_id", "u", "ts", "t")
    val got = graft.ext.Funnel.decayAttribution(ev, $"u", $"ts", $"t", $"event_id",
        conversion = "purchase", halfLifeSeconds = 86400L, lookbackSteps = 7)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set("click", "view"))
    // w_click = 250M, w_view = 500M, sum = 750M
    assert(got("click") == ((1L, 1L, 250000000L * 1000000000L / 750000000L / 1e9)))
    assert(got("view") == ((1L, 1L, 500000000L * 1000000000L / 750000000L / 1e9)))
  }

  test("interArrivalProfile: periodic key hits B = -1; singleton absent") {
    import spark.implicits._
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def at(s: Long) = new Timestamp(t0 + s * 1000L)
    val ev = (Seq(0L, 10L, 20L, 30L).map(s => (s, 1L, at(s))) ++
      Seq((100L, 2L, at(0))) ++                 // singleton -> no gaps
      Seq((200L, 3L, at(0)), (201L, 3L, at(1)), (202L, 3L, at(100))))
      .toDF("event_id", "k", "ts")
    val got = TimeSeries.interArrivalProfile(ev, $"k", $"ts", $"event_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    assert(got.keySet == Set(1L, 3L))
    val (n1, m1, s1, b1) = got(1L)
    assert(n1 == 3 && m1 == 10.0 && s1 == 0.0 && b1.contains(-1.0))
    // key 3: gaps 1, 99 -> mean 50, sd 49 -> B = (49-50)/99
    val (n3, m3, s3, b3) = got(3L)
    assert(n3 == 2 && m3 == 50.0 && s3 == 49.0)
    assert(b3.contains((49.0 - 50.0) / 99.0))
  }
}
