package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics coverage for the round-11 corpus-curation operators. */
class CorpusSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.GraftSession.local("corpus-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  test("frequentChunkFilter drops exactly the chunks shared by >= maxDf docs, keeps order") {
    import spark.implicits._
    // chunkTokens = 2; "nav bar" is the planted boilerplate in all 3
    // docs; each doc also has unique content chunks
    val docs = Seq(
      (1L, "nav bar alpha beta gamma delta"),
      (2L, "nav bar epsilon zeta"),
      (3L, "eta theta nav bar")).toDF("doc_id", "text")
    val out = Dedup.frequentChunkFilter(docs, "doc_id", "text",
        chunkTokens = 2, maxDf = 3)
      .orderBy($"doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // doc 1: chunks [nav bar][alpha beta][gamma delta] -> drop first
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 1L)
    assert(out(0).getString(3) == "alpha beta gamma delta")
    // doc 2: [nav bar][epsilon zeta] -> keep the unique tail
    assert(out(1).getLong(2) == 1L && out(1).getString(3) == "epsilon zeta")
    // doc 3: boilerplate at the END — [eta theta][nav bar]
    assert(out(2).getLong(2) == 1L && out(2).getString(3) == "eta theta")
  }

  test("frequentChunkFilter: a doc that is ALL boilerplate recomposes to ''") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam"), (2L, "spam spam"), (3L, "spam spam real text here x")
    ).toDF("doc_id", "text")
    val out = Dedup.frequentChunkFilter(docs, "doc_id", "text",
        chunkTokens = 2, maxDf = 3)
      .orderBy($"doc_id").collect()
    assert(out(0).getString(3) == "" && out(0).getLong(2) == 1L)
    assert(out(2).getString(3) == "real text here x")
  }

  test("frequentChunkFilter: df below maxDf keeps everything; short tail chunk counted") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    // df = 2 < maxDf = 3 -> nothing dropped; 3 tokens @ chunk 2 -> 2 chunks
    val out = Dedup.frequentChunkFilter(docs, "doc_id", "text",
        chunkTokens = 2, maxDf = 3)
      .orderBy($"doc_id").collect()
    assert(out.forall(r => r.getLong(1) == 2L && r.getLong(2) == 0L &&
      r.getString(3) == "a b c"))
  }

  test("unigramQualityBuckets: smoothed ppb math and per-lang terciles are exact") {
    import spark.implicits._
    // train (en): tokens [good, good, data] -> N=3, V=2
    // p(good) = (2+1)*1e9 div 5 = 600000000; p(data) = (1+1)*1e9 div 5
    //         = 400000000; unseen = (0+1)*1e9 div 5 = 200000000
    val train = Seq((100L, "good good data", "en")).toDF("doc_id", "text", "lang")
    val score = Seq(
      (1L, "good good", "en"),        // mean = 600000000
      (2L, "good data", "en"),        // mean = 500000000
      (3L, "junk junk", "en"),        // mean = 200000000
      (4L, "hola", "es")              // lang with no training rows -> absent
    ).toDF("doc_id", "text", "lang")
    val out = LangModel.unigramQualityBuckets(
        train, score, $"doc_id", $"text", $"lang", nBuckets = 3)
      .orderBy($"doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    assert(byId(1L) == ((2L, 6.0e8, 1)))
    assert(byId(2L) == ((2L, 5.0e8, 2)))
    assert(byId(3L) == ((2L, 2.0e8, 3)))
  }

  test("unigramQualityBuckets: ties in mean break by doc_id, buckets partition per lang") {
    import spark.implicits._
    val train = Seq((100L, "w w w", "en"), (200L, "x x", "de"))
      .toDF("doc_id", "text", "lang")
    // all en docs score identically -> ntile order falls back to doc_id
    val score = Seq(
      (1L, "w", "en"), (2L, "w", "en"), (3L, "w", "en"),
      (10L, "x", "de")).toDF("doc_id", "text", "lang")
    val out = LangModel.unigramQualityBuckets(
        train, score, $"doc_id", $"text", $"lang", nBuckets = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out == Map(1L -> 1, 2L -> 2, 3L -> 3, 10L -> 1))
  }

  test("fellegiSunterScores: data-estimated u, exact ratio products, class thresholds") {
    import spark.implicits._
    // u_f1 = u_f2 = 500000 ppm; m = 950000 ->
    // agree ratio = 950000000000 div 500000 = 1900000
    // disagree    =  50000000000 div 500000 =  100000
    val pairs = Seq(
      (1L, 2L, true, true),   // 1.9e6 * 1.9e6 = 3.61e12
      (1L, 3L, true, false),  // 1.9e6 * 1e5   = 1.9e11
      (2L, 3L, false, true),  // 1.9e11
      (3L, 4L, false, false)  // 1e5 * 1e5     = 1e10
    ).toDF("id_l", "id_r", "f1", "f2")
    val out = Linkage.fellegiSunterScores(pairs, Seq("f1", "f2"),
        mPpm = 950000L, matchMin = 3e12, nonmatchMax = 2e10)
      .orderBy($"id_l", $"id_r").collect()
    assert(out.map(_.getDouble(4)).toSeq ==
      Seq(3.61e12, 1.9e11, 1.9e11, 1.0e10))
    assert(out.map(_.getString(5)).toSeq ==
      Seq("match", "possible", "possible", "nonmatch"))
  }

  test("blockedPairs: composite key generates exactly the in-block pairs") {
    import spark.implicits._
    val recs = Seq(
      (1L, "us", "aa"), (2L, "us", "aa"), (3L, "us", "bb"),
      (4L, "fr", "aa"), (5L, "fr", "aa"), (6L, "fr", "aa"))
      .toDF("id", "nation", "sfx")
    val out = Linkage.blockedPairs(recs, $"id", Seq($"nation", $"sfx"))
      .orderBy($"id_l", $"id_r")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 2L), (4L, 5L), (4L, 6L), (5L, 6L)))
  }

  test("blockedPairs: preflight trips loudly on a hub block") {
    import spark.implicits._
    // one hub key carrying 6 of 7 rows; cap 4 -> require fires BEFORE
    // any pair is generated
    val recs = (1L to 6L).map(i => (i, "hub")) :+ (7L, "solo")
    val df = recs.toDF("id", "k")
    val e = intercept[IllegalArgumentException] {
      Linkage.blockedPairs(df, $"id", Seq($"k"), maxBlockRows = 4L)
    }
    assert(e.getMessage.contains("largest block holds 6"))
    assert(e.getMessage.contains("quadratically"))
  }

  test("blockedPairs: empty input passes preflight, yields no pairs") {
    import spark.implicits._
    val df = Seq.empty[(Long, String)].toDF("id", "k")
    assert(Linkage.blockedPairs(df, $"id", Seq($"k"), maxBlockRows = 2L)
      .count() == 0L)
  }

  test("fellegiSunterScores: all-agree field clamps u to 999999 (no div-by-zero)") {
    import spark.implicits._
    val pairs = Seq((1L, 2L, true), (1L, 3L, true)).toDF("id_l", "id_r", "f1")
    val out = Linkage.fellegiSunterScores(pairs, Seq("f1"),
        matchMin = 1e12, nonmatchMax = 0.0).collect()
    // 950000000000 div 999999 = 950000 exactly (floor)
    assert(out.forall(_.getDouble(3) == 950000.0))
    assert(out.forall(_.getString(4) == "possible"))
  }

  test("modularity: triangle + pendant edge hand case, exact ppm, truncation toward zero") {
    import spark.implicits._
    // triangle {1,2,3} + edge {4,5}; m = 4
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("node", "community")
    val out = Graph.modularity(edges, "a", "b", labels, "node", "community")
      .orderBy($"community").collect()
    // c1: (4*4*3 - 36)*1e6 div 64 = 187500; c4: (16 - 4)*1e6 div 64 = 187500
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 3L, 6L, 187500L), (4L, 1L, 2L, 187500L)))
    // total = 0.375, the textbook value for this graph

    // negative contributions truncate toward zero on BOTH engines
    val e2 = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val l2 = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 20L)).toDF("node", "community")
    val neg = Graph.modularity(e2, "a", "b", l2, "node", "community")
      .orderBy($"community").collect()
    // c10: (0 - 1)*1e6 div 16 = -62500; c20: (8 - 9)*1e6 div 16 = -62500
    assert(neg.map(_.getLong(3)).toSeq == Seq(-62500L, -62500L))
    assert(neg.map(_.getLong(1)).toSeq == Seq(0L, 1L)) // zero-internal community kept
  }

  test("dedupSpansWithinDoc: coverage semantics, overlap chains, short docs untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c"),        // dup window at 3 -> remove 3,4,5
      (2L, "x y x y x y"),        // n=3: grams xyx(0) yxy(1) xyx(2dup) yxy(3dup)
      (3L, "p q"),                // shorter than n -> untouched
      (4L, "u v w x y z")).toDF("doc_id", "text") // no repeats -> untouched
    val out = Dedup.dedupSpansWithinDoc(docs, "doc_id", "text", n = 3)
      .orderBy($"doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((6L, 3L, "a b c")))
    // dup windows 2 and 3 cover positions 2..5 -> kept "x y"
    assert(out(2L) == ((6L, 4L, "x y")))
    assert(out(3L) == ((2L, 0L, "p q")))
    assert(out(4L) == ((6L, 0L, "u v w x y z")))
    intercept[IllegalArgumentException] {
      Dedup.dedupSpansWithinDoc(docs, "doc_id", "text", n = 1)
    }
  }

  test("scriptCensus: codepoint-range counts and dominant-script argmax with precedence") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world"),        // latin 10, other 1 (space)
      (2L, "数据处理系统 ok"),     // han 6, latin 2, other 1
      (3L, "Привет мир!"),        // cyrillic 9, other 2
      (4L, "12345 678")           // all other
    ).toDF("doc_id", "text")
    val out = docs.select($"doc_id", TextAnalysis.scriptCensus($"text").as("c"))
      .select($"doc_id", $"c.n_chars", $"c.n_latin", $"c.n_han",
        $"c.n_cyrillic", $"c.dominant")
      .orderBy($"doc_id").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(out(1L) == ((11L, 10L, 0L, 0L, "latin")))
    assert(out(2L) == ((9L, 2L, 6L, 0L, "han")))
    assert(out(3L) == ((11L, 0L, 0L, 9L, "cyrillic")))
    assert(out(4L) == ((9L, 0L, 0L, 0L, "other")))
  }

  test("weightedCanonicalSample: canonical per cluster, sqrt-floor weights, hash-bit sampling") {
    import spark.implicits._
    // one 4-copy cluster, one singleton; basePpm=1e6 clamps -> all sampled
    val docs = (Seq.tabulate(4)(i => (10L + i, "same text here")) :+
      (1L, "a different doc")).toDF("doc_id", "text")
    val out = Dedup.weightedCanonicalSample(docs, "doc_id", "text", basePpm = 1000000L)
      .orderBy($"doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 1000000L), (10L, 4L, 1000000L)))
    assert(out.forall(_.getBoolean(3)))
    // sqrt floor: m=4 doubles the base; the sampled bit replays the hash
    val w = Dedup.weightedCanonicalSample(docs, "doc_id", "text", basePpm = 200000L)
      .orderBy($"doc_id").collect()
    assert(w.map(_.getLong(2)).toSeq == Seq(200000L, 400000L))
    val keyOf = (t: String) => graft.ext.TextHash.hash64Local(
      java.text.Normalizer.normalize(
        t.toLowerCase.replaceAll("\\s+", " ").trim,
        java.text.Normalizer.Form.NFC))
    w.foreach { r =>
      val txt = if (r.getLong(0) == 1L) "a different doc" else "same text here"
      val expect = graft.ext.TextHash.hash64Local(s"ws:${keyOf(txt)}") % 1000000L <
        r.getLong(2)
      assert(r.getBoolean(3) == expect, s"row $r")
    }
    intercept[IllegalArgumentException] {
      Dedup.weightedCanonicalSample(docs, "doc_id", "text", basePpm = 0L)
    }
  }

  test("guard rails: invalid chunkTokens / maxDf / nBuckets fail fast") {
    import spark.implicits._
    val d = Seq((1L, "a", "en")).toDF("doc_id", "text", "lang")
    intercept[IllegalArgumentException] {
      Dedup.frequentChunkFilter(d, "doc_id", "text", chunkTokens = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.frequentChunkFilter(d, "doc_id", "text", maxDf = 1)
    }
    intercept[IllegalArgumentException] {
      LangModel.unigramQualityBuckets(d, d, $"doc_id", $"text", $"lang", nBuckets = 1)
    }
  }

  test("Dsir: target-like docs outrank raw-like docs, ratios replay by hand") {
    import spark.implicits._
    // target speaks "alpha beta"; raw has one target-like doc and one
    // alien doc plus one too short to bigram
    val target = Seq((101L, "alpha beta alpha beta"), (102L, "alpha beta"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha beta"), // pure target bigrams
      (2L, "zig zag zig zag"),       // unseen in target
      (3L, "solo")                   // < 2 tokens -> no features
    ).toDF("doc_id", "text")
    val B = 4096L
    val out = Dsir.scores(raw, $"doc_id", $"text", target, $"text",
        n = 2, buckets = B)
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // hand replica: per-feature ratio_ppm = (tc+1)(rtot+B)1e6 div
    // ((rc+1)(ttot+B)); per-doc = mean over occurrences
    def h(g: String) = graft.functions.WordShingleHashes.hashOf(g) % B
    val tOcc = Seq("alpha beta", "beta alpha", "alpha beta", "alpha beta").map(h)
    val rOcc = Seq("alpha beta", "beta alpha", "alpha beta",
      "zig zag", "zag zig", "zig zag").map(h)
    val tc = tOcc.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rcm = rOcc.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (rtot, ttot) = (rOcc.size.toLong, tOcc.size.toLong)
    def ratio(f: Long): Long =
      (BigInt(tc.getOrElse(f, 0L) + 1) * BigInt(rtot + B) * BigInt(1000000) /
        (BigInt(rcm(f) + 1) * BigInt(ttot + B))).toLong
    def docScore(occ: Seq[Long]): Long = occ.map(ratio).sum / occ.size
    val exp1 = docScore(Seq("alpha beta", "beta alpha", "alpha beta").map(h))
    val exp2 = docScore(Seq("zig zag", "zag zig", "zig zag").map(h))
    assert(out.toSeq == Seq((1L, 3L, exp1), (2L, 3L, exp2), (3L, 0L, 0L)))
    assert(exp1 > exp2, "target-like must outrank alien")
    // resample keeps score columns and admits deterministically (rerun
    // identical)
    val s1 = Dsir.resample(raw, $"doc_id", $"text", target, $"text",
      targetRate = 0.5, n = 2, buckets = B).orderBy($"doc_id").collect().toSeq
    val s2 = Dsir.resample(raw, $"doc_id", $"text", target, $"text",
      targetRate = 0.5, n = 2, buckets = B).orderBy($"doc_id").collect().toSeq
    assert(s1 == s2)
  }
}
