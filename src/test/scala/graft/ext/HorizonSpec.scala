package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics coverage for the round-9 expansion operators. */
class HorizonSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.GraftSession.local("horizon-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  test("lshBandPlan: exact ppm S-curve, chosen = widest gap, twin agrees with plan") {
    val plan = Dedup.lshBandPlan(spark, sigLen = 16, targetPpm = 500000L, fpPpm = 250000L)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(plan.length == 5) // divisors of 16
    // hand fold for 8 bands x 2 rows: s^2 = 250000 ppm;
    // 1 - 0.75^8 in floor-ppm = 899888
    val row8 = plan.find(_._1 == 8).get
    assert(row8._3 == 899888L && row8._6, "8x2 is the chosen point")
    assert(plan.count(_._6) == 1)
    // gap monotonicity sanity: the degenerate extremes never win
    assert(!plan.find(_._1 == 1).get._6 && !plan.find(_._1 == 16).get._6)
    // driver-side twin picks the same operating point
    assert(Dedup.lshPlan(16, 500000L, 250000L) == ((8, 2)))
    // a stricter threshold moves the knee toward fewer bands
    val (bHi, rHi) = Dedup.lshPlan(16, 900000L, 450000L)
    assert(rHi >= 2 && bHi <= 8)
    intercept[IllegalArgumentException] { Dedup.lshPlan(16, 0L, 0L) }
  }

  test("UnigramSegment: additive Viterbi with canonical longest-last-piece tie-break") {
    import spark.implicits._
    import graft.functions.TokenizerFunctions.unigramSegment
    val lam = 10000000000L
    // "abc"=9e8; "ab"=5e8, "cd"=4e8: ["ab","cd"] ties ["abc","d"] at
    // Σ=9e8 over 2 pieces — backtrace picks the smaller predecessor
    // (longer LAST piece), so "cd" wins the last slot
    val model = Seq(("abc", 900000000L), ("ab", 500000000L), ("cd", 400000000L))
    val out = Seq("abcd", "abc", "zq", "x").toDF("w")
      .select($"w", unigramSegment($"w", model, lam, 4).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(out("abcd") == List("ab", "cd"))
    assert(out("abc") == List("abc")) // 1 piece beats any 2-piece split
    assert(out("zq") == List("z", "q")) // OOV chars segment at score 0
    assert(out("x") == List("x"))
    // fewer pieces always dominate: a low-score vocab piece beats two
    // high-score halves
    val m2 = Seq(("abcd", 1L), ("ab", 999999999L), ("cd", 999999999L))
    val one = Seq("abcd").toDF("w")
      .select(unigramSegment($"w", m2, lam, 4)).collect().head.getSeq[String](0)
    assert(one == Seq("abcd"))
  }

  test("unigramLmTrain: maxTrainDocs fail-fast guard trips before training") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "c d"), (3L, "e f")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.ext.TextAnalysis.unigramLmTrain(
        docs, $"text", vocabSize = 3, rounds = 1, maxTrainDocs = 2)
    }
    assert(e.getMessage.contains("maxTrainDocs"))
  }

  test("unigramLmTrain/Encode: chars always kept, vocab cap, deterministic, encode joins back") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark sql sql sql plan"),
      (2L, "spark plan plan sql scanner"),
      (3L, "scanner scans spark")).toDF("doc_id", "text")
    val model = graft.ext.TextAnalysis.unigramLmTrain(
      docs, $"text", vocabSize = 3, rounds = 2)
    val rows = model.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val (chars, multi) = rows.partition(_._4)
    assert(multi.length <= 3, s"vocab cap: $multi")
    assert(chars.map(_._1).forall(_.length == 1))
    // deterministic: a second run produces the identical model
    val again = graft.ext.TextAnalysis.unigramLmTrain(
      docs, $"text", vocabSize = 3, rounds = 2).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // scores are a ppb distribution over the kept vocabulary
    assert(rows.map(_._3).sum <= 1000000000L)
    assert(rows.forall(_._3 >= 0L))
    // encode: piece counts add up per doc; ratio floor-exact
    val enc = graft.ext.TextAnalysis.unigramLmEncode(
        docs, $"doc_id", $"text", rows.map(r => (r._1, r._3)).toSeq)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(enc(1L)._1 == 6L) // 6 raw tokens
    assert(enc.values.forall { case (raw, pieces, ratio, _) =>
      pieces >= raw && ratio == pieces * 1000000L / raw
    })
    assert(enc(1L)._4.nonEmpty) // first word's pieces sample
    // plan guard: the word-segmentation join is broadcast, no cartesian
    val plan = graft.ext.TextAnalysis.unigramLmEncode(
      docs, $"doc_id", $"text", rows.map(r => (r._1, r._3)).toSeq)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("CartesianProduct"))
  }

  test("groupedLogit2: separable data classifies, collinear group stays finite, deterministic") {
    import spark.implicits._
    // group "sep": y = x1 > 10, x2 pure noise-ish; group "col": x2 = 2*x1
    val rows =
      (1 to 40).map(i => ("sep", i.toLong % 20 + 1, (i * 7 % 13).toLong,
        (i % 20 + 1) > 10)) ++
      (1 to 40).map(i => ("col", i.toLong % 20 + 1, 2L * (i % 20 + 1),
        (i % 20 + 1) > 10))
    val df = rows.toDF("g", "x1", "x2", "y")
    val out = Profile.groupedLogit2(df, Seq("g"), col("x1"), col("x2"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    val sep = out("sep")
    assert(sep._1 == 40L && sep._2 == 20L)
    // ridge shrinkage keeps the boundary soft: near-perfect, not exact
    assert(sep._6 >= 950000L, s"separable group must classify near-perfectly, got $sep")
    assert(sep._4 > 0L, "x1 carries the signal -> positive coefficient")
    // perfectly collinear features: ridge keeps the solve finite and
    // the classifier still works (combined direction carries signal)
    val cln = out("col")
    assert(math.abs(cln._4) < 1000000000L && math.abs(cln._5) < 1000000000L,
      s"ridge must keep collinear betas off the clamp: $cln")
    assert(cln._6 >= 950000L)
    // deterministic across runs
    val again = Profile.groupedLogit2(df, Seq("g"), col("x1"), col("x2"), col("y"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(again("sep") == sep._3 && again("col") == cln._3)
    intercept[IllegalArgumentException] {
      Profile.groupedLogit2(df, Seq(), col("x1"), col("x2"), col("y"))
    }
    intercept[IllegalArgumentException] {
      Profile.groupedLogit2(df, Seq("g"), col("x1"), col("x2"), col("y"), iters = 0)
    }
  }

  test("kaplanMeier: textbook product-limit hand case, censoring, step guard") {
    import spark.implicits._
    // durations: 1 event, 2 censored, 3 event, 4 event, 5 censored
    val df = Seq(("g", 1L, true), ("g", 2L, false), ("g", 3L, true),
      ("g", 4L, true), ("g", 5L, false)).toDF("g", "dur", "ev")
    val out = Profile.kaplanMeier(df, col("g"), col("dur"), col("ev"))
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) == ((5L, 1L, 0L, 800000L)))
    assert(out(2L) == ((4L, 0L, 1L, 800000L))) // censoring leaves S unchanged
    assert(out(3L) == ((3L, 1L, 0L, 533333L))) // 800000*2 div 3
    assert(out(4L) == ((2L, 1L, 0L, 266666L))) // 533333*1 div 2
    assert(out(5L) == ((1L, 0L, 1L, 266666L)))
    // ties at one duration: both counted at that step
    val tied = Seq(("g", 2L, true), ("g", 2L, true), ("g", 3L, false))
      .toDF("g", "dur", "ev")
    val t2 = Profile.kaplanMeier(tied, col("g"), col("dur"), col("ev"))
      .collect().map(r => r.getLong(1) -> r.getLong(5)).toMap
    assert(t2(2L) == 333333L) // (3-2)/3
    // in-plan step guard raises, not truncates
    val wide = (1 to 50).map(i => ("g", i.toLong, true)).toDF("g", "dur", "ev")
    val ex = intercept[Exception] {
      Profile.kaplanMeier(wide, col("g"), col("dur"), col("ev"), maxSteps = 10).collect()
    }
    assert(ex.getMessage.contains("maxSteps") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxSteps")))
  }

  test("splitLeakage: agrees with composing the public split + pair operators") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again extra words here"
    val docs = (1 to 30).map { i =>
      if (i % 3 == 0) (i.toLong, base + s" tail$i")      // near-dup family
      else (i.toLong, s"unique document number $i about topic ${i * 7} with its own words")
    }.toDF("doc_id", "text")
    val splits = Seq("train" -> 0.5, "test" -> 0.5)
    val out = Dedup.splitLeakage(docs, "doc_id", "text", splits)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap
    // independent composition of the two public operators
    val lbl = Sampling.hashSplit(docs.select(col("doc_id")), col("doc_id"), splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val expect = pairs.groupBy { case (a, b) =>
      val (la, lb) = (lbl(a), lbl(b))
      (if (la <= lb) la else lb, if (la <= lb) lb else la)
    }.map { case (k, v) => k -> v.size.toLong }
    assert(out.map { case (k, v) => k -> v._1 } == expect)
    // cross flag and ppm shares: floor shares sum to <= 1e6
    assert(out.forall { case ((a, b), (_, cross, _)) => cross == (a != b) })
    assert(out.values.map(_._3).sum <= 1000000L)
    assert(out.values.map(_._1).sum == pairs.length.toLong)
  }

  test("logRankTest: hand hypergeometric terms; identical curves score ~0") {
    import spark.implicits._
    // A churns at 1,2; B churns at 3,4 — fully separated curves.
    // t=1: n=(2,2) d1=1 -> e1=500000, v=1*2*2*3e12/(16*3)
    // t=2: n=(1,2) d1=1 -> e1=333333, v=1*1*2*2e12/(9*2)
    // t=3,4: n1=0 -> e1 += 0, v += 0
    val df = Seq(("A", 1L, true), ("A", 2L, true), ("B", 3L, true), ("B", 4L, true))
      .toDF("g", "dur", "ev")
    val r = Profile.logRankTest(df, col("g"), col("dur"), col("ev")).collect().head
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L)
    assert(r.getLong(4) == 833333L)
    val v = 250000000000L + 222222222222L
    val chi = (BigInt(2000000L - 833333L).pow(2) * 1000 / BigInt(v)).toLong
    assert(r.getLong(5) == chi, s"expected chi2_milli=$chi got $r")
    // identical curves (same durations, one censored each): chi2 = 0
    val same = Seq(("A", 1L, true), ("A", 2L, false), ("B", 1L, true), ("B", 2L, false))
      .toDF("g", "dur", "ev")
    val r2 = Profile.logRankTest(same, col("g"), col("dur"), col("ev")).collect().head
    assert(r2.getLong(2) == 1L && r2.getLong(3) == 1L)
    assert(r2.getLong(4) == 1000000L) // e1 = d*n1*1e6 div n = 2*2e6/4
    assert(r2.getLong(5) == 0L)
    // three groups -> three pair rows
    val three = df.union(Seq(("C", 5L, false)).toDF("g", "dur", "ev"))
    assert(Profile.logRankTest(three, col("g"), col("dur"), col("ev")).count() == 3L)
  }

  test("ndcgAtK: perfect run = 1e6 ppm, reversed run scores the hand DCG ratio") {
    import spark.implicits._
    // rels 3,2,1 ranked perfectly by score -> ndcg = 1e6 exactly
    val perfect = Seq(("q", 1L, 30L, 3L), ("q", 2L, 20L, 2L), ("q", 3L, 10L, 1L))
      .toDF("q", "i", "s", "r")
    val p = Retrieval.ndcgAtK(perfect, col("q"), col("i"), col("s"), col("r"), k = 10)
      .collect().head
    assert(p.getLong(1) == 3L && p.getLong(2) == p.getLong(3) && p.getLong(4) == 1000000L)
    // reversed ordering: dcg = 1*d1 + 3*d2 + 7*d3, idcg = 7*d1 + 3*d2 + 1*d3
    val discs = (1 to 3).map(r =>
      math.floor(1e6 / (math.log(r + 1) / math.log(2)) + 0.5).toLong)
    val rev = Seq(("q", 1L, 30L, 1L), ("q", 2L, 20L, 2L), ("q", 3L, 10L, 3L))
      .toDF("q", "i", "s", "r")
    val v = Retrieval.ndcgAtK(rev, col("q"), col("i"), col("s"), col("r"), k = 10)
      .collect().head
    val dcg = 1L * discs(0) + 3L * discs(1) + 7L * discs(2)
    val idcg = 7L * discs(0) + 3L * discs(1) + 1L * discs(2)
    assert(v.getLong(2) == dcg && v.getLong(3) == idcg)
    assert(v.getLong(4) == dcg * 1000000L / idcg)
    // all-zero relevance: idcg = 0 -> ndcg null, counts intact
    val zero = Seq(("q", 1L, 5L, 0L)).toDF("q", "i", "s", "r")
    val z = Retrieval.ndcgAtK(zero, col("q"), col("i"), col("s"), col("r"), k = 5)
      .collect().head
    assert(z.getLong(1) == 1L && z.isNullAt(4))
    // beyond-k results contribute nothing
    val wide = (1 to 30).map(i => ("q", i.toLong, (100 - i).toLong, 1L))
      .toDF("q", "i", "s", "r")
    val w = Retrieval.ndcgAtK(wide, col("q"), col("i"), col("s"), col("r"), k = 10)
      .collect().head
    assert(w.getLong(1) == 30L && w.getLong(4) == 1000000L) // top-10 = ideal top-10
  }

  test("probCalibration: perfect probabilities score 0; hand Brier/ECE; clamping") {
    import spark.implicits._
    // perfectly calibrated and perfectly confident: mu = y exactly
    val perfect = Seq(("g", 1000000L, true), ("g", 0L, false)).toDF("g", "mu", "y")
    val p = Profile.probCalibration(perfect, col("g"), col("mu"), col("y"))
      .collect().head
    assert(p.getLong(1) == 2L && p.getLong(2) == 1L)
    assert(p.getLong(3) == 0L && p.getLong(4) == 0L)
    // hand case: mu=600000 y=1, mu=600000 y=0 -> same bin (6)
    // brier = ((4e5)^2 + (6e5)^2) / (2*1000) ppb; ece = |1.2e6 - 1e6| / 2
    val hand = Seq(("g", 600000L, true), ("g", 600000L, false)).toDF("g", "mu", "y")
    val h = Profile.probCalibration(hand, col("g"), col("mu"), col("y"))
      .collect().head
    val brier = (400000L * 400000L + 600000L * 600000L) / (2L * 1000L)
    assert(h.getLong(3) == brier)
    assert(h.getLong(4) == (1200000L - 1000000L) / 2L)
    // out-of-range mu clamps instead of corrupting bins
    val oob = Seq(("g", 1500000L, true), ("g", -7L, false)).toDF("g", "mu", "y")
    val o = Profile.probCalibration(oob, col("g"), col("mu"), col("y")).collect().head
    assert(o.getLong(3) == 0L) // clamped to exactly y
  }

  test("proportionTest: textbook z2, degenerate pools null, symmetric pair rows") {
    import spark.implicits._
    // A: 30/100, B: 50/100 -> z2 = (30*100-50*100)^2*200/(100*100*80*120)
    val rows = (1 to 100).map(i => ("A", i <= 30)) ++ (1 to 100).map(i => ("B", i <= 50))
    val df = rows.toDF("v", "c")
    val r = Profile.proportionTest(df, col("v"), col("c")).collect().head
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getLong(2) == 100L && r.getLong(3) == 30L && r.getLong(5) == 50L)
    assert(r.getLong(6) == 300000L && r.getLong(7) == 500000L)
    val dd = (30.0 * 100 - 50.0 * 100)
    val z2 = math.floor(dd * dd * 200.0 / (100.0 * 100 * 80 * 120) * 1000.0 + 0.5).toLong
    assert(r.getLong(8) == z2 && r.getBoolean(9) == (z2 >= 3841L))
    assert(z2 == 8333L) // 8.33 > 3.841 -> significant
    // all-converted pool: z2 undefined, not zero
    val dg = (Seq(("A", true), ("B", true))).toDF("v", "c")
    val d = Profile.proportionTest(dg, col("v"), col("c")).collect().head
    assert(d.isNullAt(8) && !d.getBoolean(9))
    // three variants -> three pair rows
    val three = rows ++ (1 to 50).map(i => ("C", i <= 10))
    assert(Profile.proportionTest(three.toDF("v", "c"), col("v"), col("c")).count() == 3L)
  }

  test("minhashLshPairsAuto: auto plan reproduces the tuned-default pair set") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      (3L, "completely different content about spark query planning")
    ).toDF("doc_id", "text")
    val auto = Dedup.minhashLshPairsAuto(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val manual = Dedup.minhashLshPairs(docs, "doc_id", "text",
        bands = 8, rowsPerBand = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == manual)
    assert(auto.contains((1L, 2L)) && !auto.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
