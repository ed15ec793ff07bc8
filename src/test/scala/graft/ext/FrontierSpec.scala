package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics coverage for the round-8 expansion operators: weighted
  * shortest paths, the KMV cardinality sketch, token-budget mixture
  * sampling, and the k-anonymity audit.
  */
class FrontierSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.GraftSession.local("frontier-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  test("weightedShortestPaths: hand graph — hop bounding, parallel-edge min, undirected") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L, 1L), (2L, 1L, 7L), // parallel (and reversed) edges -> min 1
      (2L, 3L, 1L), (1L, 3L, 5L),
      (3L, 4L, 2L), (9L, 10L, 1L) // 9-10 unreachable from the seed
    ).toDF("u", "v", "w")
    val seeds = Seq(1L).toDF("id")
    def run(h: Int): Map[Long, Long] =
      Graph.weightedShortestPaths(edges, "u", "v", "w", seeds, "id", h)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1 hop: direct edges only — 3 still costs 5
    assert(run(1) == Map(1L -> 0L, 2L -> 1L, 3L -> 5L))
    // 3 hops: 1-2-3 relaxes 3 to 2, then 4 via 3
    assert(run(3) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 4L))
    // fixpoint early exit: more hops change nothing
    assert(run(10) == run(3))
  }

  test("weightedShortestPaths: multiple seeds take the min over sources") {
    import spark.implicits._
    val path = Seq((1L, 2L, 10L), (2L, 3L, 10L), (3L, 4L, 10L)).toDF("u", "v", "w")
    val seeds = Seq(1L, 4L).toDF("id")
    val d = Graph.weightedShortestPaths(path, "u", "v", "w", seeds, "id", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 10L, 3L -> 10L, 4L -> 0L))
  }

  test("kmvDistinct: sub-k group reports exactly; large group matches a driver-side replay") {
    import spark.implicits._
    val rows = (1 to 10).map(i => ("s", s"v$i")) ++
      (1 to 1000).flatMap(i => Seq(("b", s"w$i"), ("b", s"w$i"))) // dup values collapse
    val r = Retrieval.kmvDistinct(rows.toDF("g", "v"), col("g"), col("v"), k = 32)
      .collect().map(x => x.getString(0) -> x).toMap
    val s = r("s")
    assert(s.getLong(1) == 10 && s.isNullAt(2) && s.getLong(3) == 10 && s.getBoolean(4))
    val space = 1L << 40
    val hashes = (1 to 1000).map(i => TextHash.hash64Local(s"w$i") % space)
      .distinct.sorted
    val kth = hashes(31)
    val est = 31L * space / kth
    val b = r("b")
    assert(b.getLong(1) == hashes.size && b.getLong(2) == kth && b.getLong(3) == est)
    val boundPpm = (3.0e6 / math.sqrt(30.0)).toLong
    assert(b.getBoolean(4) ==
      (math.abs(est - hashes.size) * 1000000L <= boundPpm * hashes.size))
  }

  test("budgetMixtureSample: greedy hash-order prefix per source; floor allocation; unlisted source excluded") {
    import spark.implicits._
    val srcOf = (i: Int) => Seq("a", "b", "z")(i % 3)
    val df = (1 to 50).map(i => (i.toLong, srcOf(i), (i % 7 + 1).toLong))
      .toDF("id", "src", "nt")
    val kept = Sampling.budgetMixtureSample(df, col("id"), col("src"), col("nt"),
        Seq(("a", 1L), ("b", 2L)), totalBudget = 30L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // budgets: a -> 30*1/3 = 10, b -> 30*2/3 = 20
    def replay(src: String, budget: Long): Set[Long] = {
      val ordered = (1 to 50).filter(i => srcOf(i) == src)
        .map(i => (i.toLong, (i % 7 + 1).toLong, TextHash.hash64Local(i.toString)))
        .sortBy(t => (t._3, t._1))
      val cums = ordered.scanLeft(0L)(_ + _._2).tail
      ordered.zip(cums).takeWhile(_._2 <= budget).map(_._1._1).toSet
    }
    val expect = replay("a", 10L).map(_ -> "a").toMap ++ replay("b", 20L).map(_ -> "b").toMap
    assert(kept == expect)
    assert(!kept.values.exists(_ == "z"))
  }

  test("budgetMixtureSample: exactly one shuffle (the per-source window); weight table broadcast") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"s${i % 4}", 3L)).toDF("id", "src", "nt")
    val plan = Sampling.budgetMixtureSample(df, col("id"), col("src"), col("nt"),
        (0 until 4).map(i => (s"s$i", 1L)), totalBudget = 100L)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("""\(\d+\) Exchange""".r.findAllIn(plan).size <= 1, plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("kAnonymityAudit: per-class sizes, diversity, and flags; null sensitive carries nothing") {
    import spark.implicits._
    val rows = Seq(
      ("n1", 1L, "A"), ("n1", 1L, "B"), ("n1", 1L, "C"),
      ("n1", 1L, "A"), ("n1", 1L, "B"),
      ("n1", 2L, "A"), ("n1", 2L, "A"),
      ("n2", 1L, null.asInstanceOf[String]))
      .toDF("q1", "q2", "s")
    val out = Profile.kAnonymityAudit(rows, Seq(col("q1"), col("q2")), col("s"),
        k = 5, l = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(out(("n1", 1L)) == ((5L, 3L, true, true)))
    assert(out(("n1", 2L)) == ((2L, 1L, false, false)))
    assert(out(("n2", 1L)) == ((1L, 0L, false, false)))
    intercept[IllegalArgumentException] {
      Profile.kAnonymityAudit(rows, Seq(col("q1")), col("s"), k = 1, l = 2)
    }
    intercept[IllegalArgumentException] {
      Profile.kAnonymityAudit(rows, Seq(col("q1")), col("s"), k = 3, l = 4)
    }
  }

  test("quantileNormalize: hand distributions map to global quantiles; singleton at median") {
    import spark.implicits._
    val rows = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("a", 4L, 4.0), ("a", 5L, 5.0), ("b", 6L, 100.0))
      .toDF("g", "id", "v")
    val out = Profile.quantileNormalize(rows, col("id"), col("g"), col("v"),
        resolution = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
    // global sorted = [1,2,3,4,5,100]; quantile_cont at (0,.25,.5,.75,1)
    // = [1, 2.25, 3.5, 4.75, 100]
    assert(out(1L) == ((0L, 1.0)))
    assert(out(2L) == ((250000L, 2.25)))
    assert(out(3L) == ((500000L, 3.5)))
    assert(out(4L) == ((750000L, 4.75)))
    assert(out(5L) == ((1000000L, 100.0)))
    assert(out(6L) == ((500000L, 3.5))) // singleton group -> global median
    intercept[IllegalArgumentException] {
      Profile.quantileNormalize(rows, col("id"), col("g"), col("v"), resolution = 100)
    }
  }

  test("rollingMedianMad: spike flags against an unmoved median; warm-up never flags") {
    import spark.implicits._
    val vals = Seq(10.0, 10.0, 10.0, 10.0, 10.0, 100.0, 10.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (1L, new java.sql.Timestamp(1700000000000L + i * 1000L), i.toLong, v)
    }.toDF("k", "ts", "eid", "v")
    val out = TimeSeries.rollingMedianMad(rows, col("k"), col("ts"), col("v"),
        col("eid"), window = 5)
      .collect().map(r => r.getLong(2) ->
        ((r.getLong(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7)))).toMap
    // the spike: window [10,10,10,10,100] -> med 10, devs [0,0,0,0,90] -> mad 0
    assert(out(5L) == ((5L, 10.0, 0.0, true)))
    // after it: window [10,10,10,100,10] sorted same -> med 10, mad 0; value 10 normal
    assert(out(6L) == ((5L, 10.0, 0.0, false)))
    // warm-up: fewer than minPoints in window -> never flags
    assert((0L to 3L).forall(i => !out(i)._4 && out(i)._1 == i + 1))
  }

  test("readability: hand counts and banding; zero-word doc is null; scan-stage plan") {
    import spark.implicits._
    val docs = Seq((1L, "The cat sat. It ran!"), (2L, ""))
      .toDF("id", "txt")
    val df = TextAnalysis.readability(docs, col("id"), col("txt"))
    val out = df.collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 5 && r1.getLong(2) == 2 && r1.getLong(3) == 5)
    // 206835 - 1015*5 div 2 - 84600*5 div 5 = 206835 - 2537 - 84600
    assert(r1.getLong(4) == 119698L && r1.getString(5) == "very_easy")
    assert(out(2L).getLong(1) == 0 && out(2L).isNullAt(4) && out(2L).isNullAt(5))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("""\(\d+\) Exchange""".r.findAllIn(plan).isEmpty, plan)
  }

  test("urlDomainProfile: domain counts, distinct docs, path depths; no-URL docs contribute nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "see https://a.example/x/y and https://a.example/z plus http://b.example"),
      (2L, "again https://a.example/only"),
      (3L, "no links at all"))
      .toDF("id", "txt")
    val out = TextAnalysis.urlDomainProfile(docs, col("id"), col("txt"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a.example") == ((3L, 2L, 4L))) // depths 2 + 1 + 1
    assert(out("b.example") == ((1L, 1L, 0L))) // no path
    assert(out.size == 2)
  }

  test("personalizedPageRank: hand path graph, exact integers; off-graph seed ignored") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("s", "d")
    val seeds = Seq(1L, 99L).toDF("id") // 99 not in the graph
    val r = Graph.personalizedPageRank(edges, "s", "d", seeds, "id", iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // nSeeds=1; r0 = (1e6, 0, 0); baseS = 150000
    // r1 = (150000, 850000, 0)
    // r2: inflow(1) = 850000/2 -> 150000 + 850000*425000/1e6 = 511250
    //     inflow(2) = 150000/1 -> 0 + 127500; inflow(3) = 425000 -> 361250
    assert(r == Map(1L -> 511250L, 2L -> 127500L, 3L -> 361250L))
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, "s", "d", Seq(99L).toDF("id"), "id", 2)
    }
  }

  test("datasetFingerprint: XOR matches a driver-side replay; identical-pair caveat shows in count") {
    import spark.implicits._
    val rows = Seq(("g1", "r1"), ("g1", "r2"), ("g1", "r3"),
      ("g2", "same"), ("g2", "same")).toDF("g", "repr")
    val out = Profile.datasetFingerprint(rows, col("g"), col("repr"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val h = Seq("r1", "r2", "r3").map(TextHash.hash64Local(_))
    assert(out("g1") == ((3L, h.reduce(_ ^ _), h.min, h.max)))
    // two identical rows XOR to 0 — the count column is the tell
    val hs = TextHash.hash64Local("same")
    assert(out("g2") == ((2L, 0L, hs, hs)))
  }

  test("calibrationCurve: equal-depth bins with integer accuracy/means; size guard raises") {
    import spark.implicits._
    val rows = (1 to 10).map(i => (i.toLong, i.toLong, i >= 6)).toDF("id", "sc", "ok")
    val out = Profile.calibrationCurve(rows, col("sc"), col("ok"), col("id"),
        buckets = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(out(0L) == ((5L, 0L, 1L, 5L, 0L, 3L)))
    assert(out(1L) == ((5L, 5L, 6L, 10L, 1000000L, 8L)))
    val ex = intercept[Exception] {
      Profile.calibrationCurve(rows, col("sc"), col("ok"), col("id"),
        buckets = 2, maxEvalSize = 5L).collect()
    }
    assert(ex.getMessage.contains("maxEvalSize"), ex.getMessage)
  }

  test("saxSymbols: PAA means and quartile symbols on a hand series") {
    import spark.implicits._
    def series(k: Long, vals: Seq[Double]) = vals.zipWithIndex.map { case (v, i) =>
      (k, new java.sql.Timestamp(1700000000000L + i * 1000L), i.toLong, v)
    }
    val rows = (series(1L, Seq(1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0,
      9.0, 9.0, 9.0, 9.0)) ++ series(2L, Seq(5.0, 5.0, 5.0, 5.0)))
      .toDF("k", "ts", "eid", "v")
    val out = TimeSeries.saxSymbols(rows, col("k"), col("ts"), col("v"),
        col("eid"), segLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getString(4)))).toMap
    // PAA set {1,2,9,5}; quartiles of [1,2,5,9] = (1.75, 3.5, 6.0)
    assert(out((1L, 0L)) == ((4L, 1.0, "a")))
    assert(out((1L, 1L)) == ((4L, 2.0, "b")))
    assert(out((1L, 2L)) == ((4L, 9.0, "d")))
    assert(out((2L, 0L)) == ((4L, 5.0, "c")))
  }

  test("decompose: square wave splits into flat trend + alternating seasonal + zero residual") {
    import spark.implicits._
    // period-2 square wave decomposed at period 4: trend is the flat
    // midline 5, seasonal alternates ±5, residual vanishes
    val rows = (1 to 12).map(i => (1L, i.toLong, if (i % 2 == 1) 0.0 else 10.0))
      .toDF("k", "t", "v")
    val out = TimeSeries.decompose(rows, col("k"), col("t"), col("v"), period = 4)
      .collect().map(r => r.getLong(1) -> r).toMap
    // edges (rn 1,2 and 11,12) have no full MA window
    assert(Seq(1L, 2L, 11L, 12L).forall(t => out(t).isNullAt(5)))
    (3L to 10L).foreach { t =>
      val r = out(t)
      assert(r.getDouble(5) == 5.0, s"trend at $t")
      assert(r.getDouble(6) == (if (t % 2 == 1) -5.0 else 5.0), s"seasonal at $t")
      assert(r.getDouble(7) == 0.0, s"residual at $t")
    }
    intercept[IllegalArgumentException] {
      TimeSeries.decompose(rows, col("k"), col("t"), col("v"), period = 5)
    }
  }

  test("aucExact: hand ties, perfect separation, degenerate class, size guard") {
    import spark.implicits._
    // pos {3,2}, neg {1,2}: 3 clean wins + one tie -> AUC 3.5/4
    val mixed = Seq((3L, true), (2L, true), (1L, false), (2L, false)).toDF("sc", "y")
    val r = Profile.aucExact(mixed, col("sc"), col("y")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(r.getLong(2) == 7 && r.getLong(3) == 875000L)
    val perfect = Seq((10L, true), (9L, true), (1L, false)).toDF("sc", "y")
    assert(Profile.aucExact(perfect, col("sc"), col("y"))
      .collect().head.getLong(3) == 1000000L)
    val onlyPos = Seq((1L, true), (2L, true)).toDF("sc", "y")
    assert(Profile.aucExact(onlyPos, col("sc"), col("y")).collect().head.isNullAt(3))
    val big = (1 to 100).map(i => (i.toLong, i % 2 == 0)).toDF("sc", "y")
    val ex = intercept[Exception] {
      Profile.aucExact(big, col("sc"), col("y"), maxDistinctScores = 10L).collect()
    }
    assert(ex.getMessage.contains("maxDistinctScores"), ex.getMessage)
  }

  test("rendezvousShard: matches a driver-side argmax replay; k->k+1 moves only TO the new shard") {
    import spark.implicits._
    val s4 = (0 until 4).map(i => s"n$i")
    val s5 = (0 until 5).map(i => s"n$i")
    val df = (1L to 500L).toDF("id")
      .select(col("id"),
        Layout.rendezvousShard(col("id"), s4).as("b4"),
        Layout.rendezvousShard(col("id"), s5).as("b5"))
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def replay(id: Long, shards: Seq[String]): String =
      shards.map(s => (TextHash.hash64Local(s"$s:$id"), s)).max._2
    rows.take(20).foreach { case (id, b4, b5) =>
      assert(b4 == replay(id, s4) && b5 == replay(id, s5), s"id=$id")
    }
    // HRW stability: every move lands on the new shard
    assert(rows.forall { case (_, b4, b5) => b4 == b5 || b5 == "n4" })
    val moved = rows.count { case (_, b4, b5) => b4 != b5 }
    assert(moved > 0 && moved < 250, s"moved=$moved") // ~1/5 expected
    intercept[IllegalArgumentException] {
      Layout.rendezvousShard(col("id"), Seq("a", "a"))
    }
  }

  test("blockingQuality: hand truth/candidate sets; shape guard") {
    import spark.implicits._
    val truth = Seq((1L, 2L), (3L, 4L)).toDF("x", "y")
    val cand = Seq((1L, 2L), (5L, 6L), (5L, 6L)).toDF("p", "q") // dup collapses
    val records = (1L to 4L).toDF("id")
    val r = Linkage.blockingQuality(truth, cand, records).collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 2 && r.getLong(2) == 2 && r.getLong(3) == 1)
    assert(r.getLong(4) == 500000L) // 1 of 2 truth pairs survived blocking
    assert(r.getLong(5) == 1000000L - 2L * 2000000L / (4L * 3L)) // 666667
    intercept[IllegalArgumentException] {
      Linkage.blockingQuality(truth.withColumn("z", lit(1)), cand, records)
    }
  }

  test("concentrationProfile: hand shares and Herfindahl; nulls dropped; uniform = 1e6/k") {
    import spark.implicits._
    val df = Seq(("a", "w"), ("a", "x"), ("a", "y"),
      ("b", "z"), (null.asInstanceOf[String], "w"))
      .toDF("skewed", "uniform")
    val out = Profile.concentrationProfile(df, Seq("skewed", "uniform"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // skewed: a,a,a,b (null dropped) -> hhi = (9+1)*1e6 div 16
    assert(out("skewed") == ((4L, 2L, 3L, 750000L, 625000L)))
    // uniform: w,x,y,z,w -> top 2/5, hhi = (4+1+1+1)*1e6 div 25
    assert(out("uniform") == ((5L, 4L, 2L, 400000L, 280000L)))
  }

  test("bucketDiff: identical snapshots agree; edits/deletes localize; even-copy caveat caught by count") {
    import spark.implicits._
    val a = (1L to 100L).map(i => (i, s"row$i")).toDF("k", "payload")
    def diff(b: org.apache.spark.sql.DataFrame) =
      Profile.bucketDiff(a, b, col("k"), col("payload"), buckets = 8)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(5)))).toMap
    // identical -> no bucket differs
    assert(diff(a).values.forall(!_._3))
    // one edited row -> exactly its key's bucket differs (same counts)
    val edited = a.withColumn("payload",
      when(col("k") === 42L, lit("tampered")).otherwise(col("payload")))
    val d1 = diff(edited)
    val b42 = TextHash.hash64Local("42") % 8
    assert(d1.count(_._2._3) == 1 && d1(b42)._3)
    assert(d1(b42)._1 == d1(b42)._2) // fingerprint, not count, caught it
    // one deleted row -> its bucket differs with a count mismatch
    val d2 = diff(a.filter(col("k") =!= 7L))
    val b7 = TextHash.hash64Local("7") % 8
    assert(d2.count(_._2._3) == 1 && d2(b7)._1 == d2(b7)._2 + 1)
    // two extra copies of an existing row XOR out -> count flags it anyway
    val dup = a.unionAll(a.filter(col("k") === 9L)).unionAll(a.filter(col("k") === 9L))
    val b9 = TextHash.hash64Local("9") % 8
    val d3 = diff(dup)
    assert(d3(b9)._3 && d3(b9)._2 == d3(b9)._1 + 2)
  }

  test("kmvSketch merge: union of half-sketches equals the whole sketch; one-sided groups pass through") {
    import spark.implicits._
    val space = 1L << 40
    val rows = (1 to 500).map(i => ("g", s"v$i", i % 2)) ++
      (1 to 5).map(i => ("solo", s"s$i", 0))
    val df = rows.toDF("grp0", "v", "half")
    def sk(f: org.apache.spark.sql.DataFrame) =
      Retrieval.kmvSketch(f, col("grp0"), col("v"), k = 16)
    val whole = sk(df).collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val merged = Retrieval.kmvMergeEstimate(
        sk(df.filter(col("half") === 0)), sk(df.filter(col("half") === 1)), k = 16)
      .collect().map(r => (r.getString(0), r.getSeq[Long](1), r.getLong(2)))
    merged.foreach { case (g, hs, est) =>
      assert(hs == whole(g), s"merge identity broke for $g")
      if (g == "solo") assert(est == 5L) // sub-k -> exact
      else {
        val exp = (1 to 500).map(i => TextHash.hash64Local(s"v$i") % space)
          .distinct.sorted
        assert(est == 15L * space / exp(15))
      }
    }
  }

  test("saltAdvisor: ceil salt factors for heavy keys; tail pruned by share floor") {
    import spark.implicits._
    val df = (Seq.fill(70)("A") ++ Seq.fill(25)("B") ++ Seq.fill(5)("C")).toDF("k")
    val out = Skew.saltAdvisor(df, col("k"), parts = 10, minSharePpm = 60000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("A") == ((70L, 700000L, 7L)))
    assert(out("B") == ((25L, 250000L, 3L))) // ceil(2.5)
    assert(!out.contains("C")) // 5% < the 6% share floor
    intercept[IllegalArgumentException] {
      Skew.saltAdvisor(df, col("k"), parts = 1)
    }
  }

  test("groupedOls2: exact plane recovered; collinear group reports nulls") {
    import spark.implicits._
    // y = 2 + 3*x1 + 5*x2 exactly -> coefficients recover exactly
    val plane = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (2.0, 1.0))
      .map { case (x1, x2) => ("ok", x1, x2, 2.0 + 3.0 * x1 + 5.0 * x2) }
    // x2 = x1 -> singular normal matrix
    val coll = Seq(0.0, 1.0, 2.0).map(x => ("bad", x, x, x))
    val out = Profile.groupedOls2((plane ++ coll).toDF("g", "x1", "x2", "y"),
        Seq("g"), col("x1"), col("x2"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val ok = out("ok")
    assert(ok.getLong(1) == 5 && ok.getDouble(2) == 2.0 &&
      ok.getDouble(3) == 3.0 && ok.getDouble(4) == 5.0)
    val bad = out("bad")
    assert(bad.isNullAt(2) && bad.isNullAt(3) && bad.isNullAt(4))
  }

  test("crossCorrelation: exact affine lead at its lag; constant series degenerates to null") {
    import spark.implicits._
    val pattern = Seq(1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0, 7.0, 6.0, 0.0)
    val a = pattern.zipWithIndex.map { case (v, t) => (t.toLong, v) }.toDF("t", "v")
    // b at t+2 is an exact affine image of a at t -> r(lag 2) = 1.0
    val b = pattern.zipWithIndex.map { case (v, t) => (t.toLong + 2, 2.0 * v + 3.0) }
      .toDF("t", "v")
    val r = TimeSeries.crossCorrelation(a, col("t"), col("v"), b, col("t"), col("v"),
        maxLag = 3)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), if (x.isNullAt(2)) None
        else Some(x.getDouble(2))))).toMap
    assert(r(2L) == ((10L, Some(1.0))))
    assert(r(0L)._1 == 8 && r(0L)._2.exists(_ < 1.0)) // partial overlap, imperfect
    val const = (0L to 9L).map(t => (t, 4.0)).toDF("t", "v")
    val rc = TimeSeries.crossCorrelation(a, col("t"), col("v"), const, col("t"),
      col("v"), maxLag = 1).collect()
    assert(rc.forall(_.isNullAt(2))) // zero variance on one side
  }

  test("gridDbscan: adjacent dense cells merge (incl. across the x wrap); sparse cells are noise") {
    import spark.implicits._
    def burst(lat: Double, lon: Double, n: Int) = Seq.fill(n)((lat, lon))
    val pts = (burst(5.0, -5.0, 3) ++ burst(5.0, 2.0, 3) ++ // wrap pair x=35 & x=0
      burst(45.0, 105.0, 3) ++ // isolated dense cell
      burst(25.0, 55.0, 2)) // below minPts -> absent
      .toDF("plat", "plon")
    val out = Geo.gridDbscan(pts, col("plat"), col("plon"), cellDeg = 10.0, minPts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out.size == 3)
    val cidA = (0L + 100000L) * 36 + 0 // cell (x=0, y=0) encoded
    assert(out((35L, 0L)) == ((3L, cidA))) // merged across the wrap, min id wins
    assert(out((0L, 0L)) == ((3L, cidA)))
    val cidB = (4L + 100000L) * 36 + 10
    assert(out((10L, 4L)) == ((3L, cidB))) // singleton keeps its own id
    assert(!out.contains((5L, 2L))) // the 2-point cell is noise
  }

  test("quantileSketch: exact below budget (t=0), merge identity, estimates hit exact ranks") {
    import spark.implicits._
    // 200 rows, one group → n ≤ k=256 keeps everything: t=0, est exact
    val rows = (1 to 200).map(i => ("g", i.toLong, s"id$i"))
    val df = rows.toDF("grp", "v", "id")
    val sk = Retrieval.quantileSketch(df, $"grp", $"v", $"id", k = 256).collect().head
    assert(sk.getLong(1) == 200L && sk.getInt(2) == 0)
    assert(sk.getSeq[org.apache.spark.sql.Row](3).size == 200)
    val est = Retrieval.quantileSketchQuantiles(
      Retrieval.quantileSketch(df, $"grp", $"v", $"id", 256),
      Seq(500000L, 900000L)).collect()
      .map(r => r.getLong(1) -> r.getLong(6)).toMap
    assert(est(500000L) == 100L) // exact median of 1..200 at ceil-rank 100
    assert(est(900000L) == 180L)
    // forced compaction (k=16): merge of thirds == whole, cell-for-cell
    val big = (1 to 900).map(i => ("g", (i * 37 % 500).toLong, s"k$i")).toDF("grp", "v", "id")
    val whole = Retrieval.quantileSketch(big, $"grp", $"v", $"id", 16)
    val m = Retrieval.quantileSketchMerge(
      Retrieval.quantileSketchMerge(
        Retrieval.quantileSketch(big.filter($"id".substr(2, 10).cast("long") % 3 === 0),
          $"grp", $"v", $"id", 16),
        Retrieval.quantileSketch(big.filter($"id".substr(2, 10).cast("long") % 3 === 1),
          $"grp", $"v", $"id", 16), 16),
      Retrieval.quantileSketch(big.filter($"id".substr(2, 10).cast("long") % 3 === 2),
        $"grp", $"v", $"id", 16), 16)
    val (w, g) = (whole.collect().head, m.collect().head)
    assert(w.getLong(1) == g.getLong(1), "n merges by sum")
    assert(w.getInt(2) > 0, "k=16 over 900 rows must compact")
    assert(w.getInt(2) == g.getInt(2), "threshold identity")
    assert(w.getSeq[org.apache.spark.sql.Row](3) == g.getSeq[org.apache.spark.sql.Row](3),
      "item buffers identical cell-for-cell")
    // one-sided group passes through merge
    val solo = Retrieval.quantileSketchMerge(
      Retrieval.quantileSketch(df, $"grp", $"v", $"id", 256),
      Retrieval.quantileSketch(df.filter(lit(false)), $"grp", $"v", $"id", 256), 256)
      .collect().head
    assert(solo.getLong(1) == 200L && solo.getSeq[Any](3).size == 200)
  }

  test("naiveBayesScores: classify argmax equals max over the exposed score table") {
    import spark.implicits._
    val train = Seq(("en", "the cat"), ("de", "die katze"), ("en", "the dog"))
      .toDF("lang", "text").withColumn("doc_id", monotonically_increasing_id())
    val score = Seq((100L, "the the"), (101L, "die die")).toDF("doc_id", "text")
      .withColumn("lang", lit(null).cast("string"))
    val scores = LangModel.naiveBayesScores(train, score,
      col("lang"), col("doc_id"), col("text")).collect()
    val best = scores.groupBy(_.getLong(0)).map { case (d, rs) =>
      d -> rs.sortBy(r => (-r.getLong(3), r.getString(1))).head.getString(1)
    }
    val pred = LangModel.naiveBayesClassify(train, score,
        col("lang"), col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(100L) == "en" && pred(101L) == "de")
    assert(scores.length == 4) // 2 docs x 2 classes
    assert(best(100L) == pred(100L))
  }
}
