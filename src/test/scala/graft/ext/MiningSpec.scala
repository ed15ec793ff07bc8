package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics coverage for the round-5 mining operators: BM25 retrieval,
  * one-pass correlation, weighted sampling, corpus boilerplate. The
  * DuckDB oracles (q86–q89) cover engine parity; this spec covers the
  * algorithms' contracts on controlled inputs.
  */
class MiningSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.GraftSession.local("mining-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("bm25TopK: term-bearing docs rank above term-free; rarer term outranks common") {
    import spark.implicits._
    val d = docs(
      1L -> "spark shuffle join strategy and broadcast join planning",
      2L -> "spark executor memory tuning notes",
      3L -> "gardening tips for a rainy spring weekend",
      4L -> "join order matters for join heavy analytical workloads join")
    val out = Retrieval.bm25TopK(d, $"doc_id", $"text", Seq("join", "spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc 3 has neither term → absent
    assert(!out.exists(_._1 == 3L))
    val score = out.map(t => t._1 -> t._3).toMap
    // "join" appears in 2 of 4 docs, "spark" in 2 of 4 — doc 4 saturates
    // tf on join (3 hits) and is shortest per-hit → highest score
    assert(score(4L) > score(2L))
    // doc 1 matches both terms → n_terms 2
    assert(out.find(_._1 == 1L).get._2 == 2L)
    // every reported score is positive (rational idf > 0 when df < N)
    assert(out.forall(_._3 > 0.0))
  }

  test("bm25TopK: null-text docs are out of the index (no N/avgdl bias)") {
    import spark.implicits._
    val clean = docs(1L -> "alpha join beta", 2L -> "gamma delta")
    val noisy = clean.union(Seq((3L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val a = Retrieval.bm25TopK(clean, $"doc_id", $"text", Seq("join"), k = 5).collect()
    val b = Retrieval.bm25TopK(noisy, $"doc_id", $"text", Seq("join"), k = 5).collect()
    assert(a.map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      b.map(r => (r.getLong(0), r.getDouble(2))).toSeq)
  }

  test("corrMatrix: perfect / inverse / zero-variance columns") {
    import spark.implicits._
    val d = (1 to 50).map(i => (i.toDouble, 2.0 * i + 1.0, -3.0 * i, 7.0))
      .toDF("x", "y2", "yneg", "const")
    val out = Profile.corrMatrix(d, Seq("x", "y2", "yneg", "const"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(math.abs(out(("x", "y2")).get - 1.0) < 1e-12)
    assert(math.abs(out(("x", "yneg")).get + 1.0) < 1e-12)
    // constant column: zero variance → corr undefined → null, not error
    assert(out(("x", "const")).isEmpty)
    assert(out.size == 6)
  }

  test("weightedHashSample: deterministic, weight-monotone, zero-weight corpus empty") {
    import spark.implicits._
    val d = (1L to 2000L).map(i => (i, if (i <= 1000) 1.0 else 10.0)).toDF("id", "w")
    val kept = Sampling.weightedHashSample(d, $"id", $"w", 0.1)
      .select("id").as[Long].collect().toSet
    // partitioning must not change membership
    val again = Sampling.weightedHashSample(d.repartition(17), $"id", $"w", 0.1)
      .select("id").as[Long].collect().toSet
    assert(kept == again)
    // heavy rows (w = 10 ≥ mean/rate = 5.5/0.1 → p = 1? no: 0.1*10/5.5 = 0.18)
    // keep rate of heavy stratum ≫ light stratum
    val heavy = kept.count(_ > 1000).toDouble / 1000
    val light = kept.count(_ <= 1000).toDouble / 1000
    assert(heavy > 5 * light, s"heavy=$heavy light=$light")
    // a weight ≥ mean/targetRate is ALWAYS kept
    val d2 = (1L to 100L).map(i => (i, if (i == 42L) 1000.0 else 1.0)).toDF("id", "w")
    assert(Sampling.weightedHashSample(d2, $"id", $"w", 0.5)
      .select("id").as[Long].collect().contains(42L))
    // degenerate: all-zero weights → nothing sampled (not everything)
    val dz = (1L to 100L).map(i => (i, 0.0)).toDF("id", "w")
    assert(Sampling.weightedHashSample(dz, $"id", $"w", 0.5).isEmpty)
    // null weights are zero weights
    val dn = (1L to 100L).map(i => (i, null.asInstanceOf[java.lang.Double])).toDF("id", "w")
    assert(Sampling.weightedHashSample(dn, $"id", $"w", 0.5).isEmpty)
  }

  test("bloomPrunedSemiJoin: identical to plain semi-join; bloom filter sits below the join") {
    import spark.implicits._
    val fact = (1L to 5000L).map(i => (i % 1000, i)).toDF("k", "payload")
    val dim = (0L to 999L).filter(_ % 7 == 0).map(k => (k, s"d$k")).toDF("dk", "attr")
    val out = Joins.bloomPrunedSemiJoin(fact, $"k", dim, $"dk", expectedItems = 1000)
    val expected = fact.join(dim, $"k" === $"dk", "left_semi")
    assert(out.select("k", "payload").except(expected.select("k", "payload")).isEmpty)
    assert(expected.select("k", "payload").except(out.select("k", "payload")).isEmpty)
    // the bloom probe must run BEFORE the join (scan-stage pruning).
    // LocalRelation inputs constant-fold the filter at plan time, so
    // assert on a file-backed fact — the production shape.
    val dir = java.nio.file.Files.createTempDirectory("bloomspec").toString
    fact.write.mode("overwrite").parquet(s"$dir/fact")
    val filePlan = Joins.bloomPrunedSemiJoin(
        spark.read.parquet(s"$dir/fact"), $"k", dim, $"dk", 1000)
      .queryExecution.executedPlan.toString
    val filterAt = filePlan.indexOf("bloom_might_contain")
    val joinAt = filePlan.indexOf("Join")
    assert(filterAt >= 0, filePlan.take(2000))
    assert(joinAt >= 0 && joinAt < filterAt, s"bloom probe above the join:\n$filePlan")
    // string keys probe the string path
    val sFact = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val sDim = Seq("a", "c").toDF("dk")
    assert(Joins.bloomPrunedSemiJoin(sFact, $"k", sDim, $"dk", 10)
      .select("k").as[String].collect().sorted.toSeq == Seq("a", "c"))
    // null fact keys never match (parity with semi-join null semantics)
    val nFact = Seq(Some(1L), None).map(Tuple1(_)).toDF("k")
    assert(Joins.bloomPrunedSemiJoin(nFact, $"k", Seq(1L).toDF("dk"), $"dk", 10)
      .count() == 1)
  }

  test("passageDupSpans: shared passage found, overlapping windows merge, unique doc absent") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"w$i").mkString(" ") // 12 shared tokens
    val d = docs(
      1L -> s"alpha beta $shared gamma delta epsilon",
      2L -> s"zeta eta theta iota $shared kappa",
      3L -> "entirely unique tokens that never repeat anywhere else at all today friend")
    val out = Dedup.passageDupSpans(d, "doc_id", "text", window = 10, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 3 shares nothing
    assert(!out.exists(_._1 == 3L))
    // each of docs 1 and 2 has exactly ONE maximal span (overlapping
    // windows merged), and it covers the shared 12 tokens
    val spans1 = out.filter(_._1 == 1L)
    val spans2 = out.filter(_._1 == 2L)
    assert(spans1.length == 1 && spans2.length == 1, out.mkString(","))
    // doc1: shared tokens at offsets 2..13; dup windows are starts 2,4
    // (stride 2, window 10 fully inside the shared run) → span [2, 14)
    assert(spans1.head._2 == 2L && spans1.head._3 == 14L)
    // doc2: shared at 4..15 → starts 4,6 → span [4, 16)
    assert(spans2.head._2 == 4L && spans2.head._3 == 16L)
  }

  test("crossDocDupSpans: aligned pair spans, diagonal merge, df cap, no cartesian") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"w$i").mkString(" ") // 12 shared tokens
    val viral = (1 to 9).map(i => s"v$i").mkString(" ") // in MORE docs than maxDf
    val d = docs(
      1L -> s"alpha beta $shared gamma delta",
      2L -> s"zeta eta theta iota $shared kappa",
      3L -> s"unique3 stuff3 only3 here3 nothing3 repeats3 $viral",
      4L -> s"unique4 stuff4 only4 here4 nothing4 repeats4 $viral",
      5L -> s"unique5 stuff5 only5 here5 nothing5 repeats5 $viral",
      6L -> s"unique6 stuff6 only6 here6 nothing6 repeats6 $viral")
    val spans = Dedup.crossDocDupSpans(d, "doc_id", "text", window = 8, maxDf = 3)
    val plan = spans.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val out = spans.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // the 12-token shared run: doc1 offsets 2..13, doc2 offsets 4..15;
    // stride-1 window-8 starts 2,3,4,5,6 (doc1) all on diagonal +2 →
    // ONE island [2,14) aligned to [4,16), 5 windows
    assert(out.filter(p => p._1 == 1L && p._2 == 2L).toSeq ==
      Seq((1L, 2L, 2L, 14L, 4L, 16L, 5L)))
    // the viral 9-token block sits in 4 docs > maxDf 3 → excluded
    assert(!out.exists(p => p._1 >= 3L || p._2 >= 3L), out.mkString(","))
    // raising the cap brings the pairwise spans back, all 6 pairs
    val uncapped = Dedup.crossDocDupSpans(d, "doc_id", "text", window = 8, maxDf = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(uncapped.count(p => p._1 >= 3L && p._2 >= 3L) == 6)
  }

  test("crossDocDupSpans: maxPerDoc caps within-doc window multiplicity (k^2 guard)") {
    import spark.implicits._
    val passage = (1 to 8).map(i => s"p$i").mkString(" ") // exactly one window
    // the passage repeats 3x inside EACH doc: uncapped that is 3x3 = 9
    // matched windows for the pair; maxPerDoc = 1 keeps only the first
    // start-ordered occurrence per doc → exactly 1 matched window
    val d = docs(
      1L -> s"a1 b1 $passage c1 $passage d1 $passage",
      2L -> s"x2 $passage y2 $passage z2 $passage w2")
    val capped = Dedup.crossDocDupSpans(d, "doc_id", "text", window = 8,
        maxDf = 8, maxPerDoc = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(6)))
    assert(capped.toSeq == Seq((1L, 2L, 1L)), capped.mkString(","))
    val uncapped = Dedup.crossDocDupSpans(d, "doc_id", "text", window = 8,
        maxDf = 8, maxPerDoc = 8)
      .collect().map(r => r.getLong(6)).sum
    assert(uncapped == 9L, s"expected 9 matched windows uncapped, got $uncapped")
  }

  test("capPerCluster: cluster capped, singletons survive, deterministic") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    val d = docs(
      1L -> a, 2L -> a, 3L -> a, // exact cluster of 3
      9L -> "completely different text about query optimization at tremendous scale today")
    val out = Dedup.capPerCluster(d, "doc_id", "text", cap = 2, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byCluster = out.groupBy(_._1)
    // cluster 1 keeps exactly docs 1,2 (lowest ids), rank 1,2
    assert(byCluster(1L).map(_._3).sorted.toSeq == Seq(1L, 2L))
    // singleton doc 9 survives as its own cluster
    assert(byCluster(9L).map(_._3).toSeq == Seq(9L))
    assert(out.length == 3)
  }

  test("robustOutliers: flags the planted outlier only; MAD-0 group flags nothing") {
    import spark.implicits._
    val d = ((1 to 99).map(i => ("a", i.toLong, 100.0 + (i % 11))) :+ (("a", 999L, 100000.0)))
      .++((1 to 50).map(i => ("b", 1000L + i, 7.0))) // constant group: MAD 0
      .toDF("g", "id", "v")
    val out = Profile.robustOutliers(d, Seq("g"), $"v", k = 3.0)
      .select("id", "robust_z").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.map(_._1).toSeq == Seq(999L), out.mkString(","))
    assert(out.head._2 > 1000.0)
  }

  test("zscoreNormalize: hand-computed z; zero-variance group is null") {
    import spark.implicits._
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("c", 5.0), ("c", 5.0))
      .toDF("g", "v")
    val out = Profile.zscoreNormalize(d, Seq("g"), $"v")
      .select("g", "v", "z").collect()
      .map(r => (r.getString(0), r.getDouble(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    // group a: mean 2, sample std 1 → z = v - 2
    assert(out.filter(_._1 == "a").map(t => t._2 -> t._3.get).toMap ==
      Map(1.0 -> -1.0, 2.0 -> 0.0, 3.0 -> 1.0))
    // constant group: zero variance → null, not error
    assert(out.filter(_._1 == "c").forall(_._3.isEmpty))
  }

  test("boilerplateFractions: shared 3-gram counted, unique prose zero, short doc zero") {
    import spark.implicits._
    val chrome = "copyright acme corp all rights reserved"
    val d = docs(
      1L -> s"original thoughtful prose unlike anything else written $chrome",
      2L -> s"second page entirely different body text here $chrome",
      3L -> "completely unique sentence with no shared grams anywhere today",
      4L -> "too short") // < 3 tokens... actually 2 tokens → zero grams
    val out = TextAnalysis.boilerplateFractions(d, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // docs 1 and 2 share the chrome 3-grams; doc 1 has 13 tokens → 11
    // grams of which the 4 fully-inside-chrome ones are shared
    assert(out(1L)._2 == 4L, s"got ${out(1L)}")
    assert(out(1L)._3 == 4.0 / out(1L)._1)
    assert(out(2L)._2 == 4L)
    // unique doc: zero shared
    assert(out(3L)._2 == 0L && out(3L)._3 == 0.0)
    // short doc: zero grams, fraction 0.0 (not null, not missing)
    assert(out(4L) == ((0L, 0L, 0.0)))
  }
}
