package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Contract coverage for the round-5 lexical operators: q-gram fuzzy
  * linkage, blocklist gating, vocabulary building, quantile binning,
  * bigram-LM scoring. The DuckDB oracles (q100, q104-q107) cover
  * engine parity; this spec covers the algorithms' contracts.
  */
class LexiconSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.GraftSession.local("lexicon-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def named(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "name")
  }

  test("fuzzyPairs: recall equals brute force when the gram bound is positive") {
    import spark.implicits._
    val people = named(
      1L -> "jonathan smith",
      2L -> "jonathon smith", // dist 1 from #1
      3L -> "jonathan smyth", // dist 1 from #1, dist 2 from #2
      4L -> "elizabeth jones",
      5L -> "elisabeth jones", // dist 1 from #4
      6L -> "marcus aurelius")
    val blocked = Linkage.fuzzyPairs(
        people, $"id", $"name", people, $"id", $"name", maxDist = 1, q = 3)
      .filter($"id_l" < $"id_r")
      .select($"id_l", $"id_r", $"dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the same relation: the full O(n^2) ground truth
    val brute = people.as("a").crossJoin(people.as("b"))
      .filter($"a.id" < $"b.id")
      .select($"a.id", $"b.id",
        levenshtein($"a.name", $"b.name").as("d"))
      .filter($"d" <= 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(blocked == brute)
    assert(blocked == Set((1L, 2L, 1), (1L, 3L, 1), (4L, 5L, 1)))
  }

  test("fuzzyPairs: dist 0 pairs (exact duplicates across relations) are reported") {
    import spark.implicits._
    val l = named(1L -> "acme corp")
    val r = named(10L -> "acme corp", 11L -> "acme cory")
    val out = Linkage.fuzzyPairs(l, $"id", $"name", r, $"id", $"name", 1, 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    assert(out == Set((1L, 10L, 0), (1L, 11L, 1)))
  }

  test("fuzzyPairs: plan is a gram equi-join, never a cartesian product") {
    import spark.implicits._
    val l = named(1L -> "jonathan smith", 2L -> "elizabeth jones")
    val plan = Linkage.fuzzyPairs(l, $"id", $"name", l, $"id", $"name", 1, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("blocklistHits: token-exact — substrings of clean tokens never match") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a classic tale of classes"), // "ass" is a substring, not a token
      (2L, "this ass is an ass indeed"),
      (3L, "perfectly clean prose")).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistHits(docs, $"doc_id", $"text", Seq("ass"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 2L, 1L)))
  }

  test("blocklistHits: case and edge punctuation cannot smuggle a term past the gate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the service was very Slow."), // capitalized + trailing period
      (2L, "(slow) but steady"), // wrapped in parens
      (3L, "slowness is different")) // interior chars stay exact — no hit
      .toDF("doc_id", "text")
    val out = TextAnalysis.blocklistHits(docs, $"doc_id", $"text", Seq("SLOW"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (2L, 1L)))
  }

  test("blocklistHits: terms get the same normalization as tokens (punct/NFD terms still match)") {
    import spark.implicits._
    val docs = Seq((1L, "the café was slow today")).toDF("doc_id", "text")
    // term with edge punctuation — must still match the clean token
    val p = TextAnalysis.blocklistHits(docs, $"doc_id", $"text", Seq("slow."))
      .collect()
    assert(p.length == 1 && p(0).getLong(1) == 1L)
    // term typed in NFD (e + combining acute) — doc text is NFC
    val nfd = "café"
    val n = TextAnalysis.blocklistHits(docs, $"doc_id", $"text", Seq(nfd))
      .collect()
    assert(n.length == 1 && n(0).getLong(1) == 1L)
    // a blocklist that normalizes to nothing is a config error, not a no-op
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistHits(docs, $"doc_id", $"text", Seq("...", "!!"))
    }
  }

  test("buildVocab: rank by (count desc, token), 0-based contiguous ids, df from distinct docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "beta alpha beta"),
      (2L, "alpha gamma beta")).toDF("doc_id", "text")
    val out = TextAnalysis.buildVocab(docs, $"doc_id", $"text", vocabSize = 2)
      .orderBy($"vocab_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // beta: 3 occurrences in 2 docs; alpha: 2 in 2 — gamma cut by size
    assert(out.toSeq == Seq((0L, "beta", 3L, 2L), (1L, "alpha", 2L, 2L)))
  }

  test("buildVocab: equal counts break ties alphabetically") {
    import spark.implicits._
    val docs = Seq((1L, "zed ant zed ant")).toDF("doc_id", "text")
    val out = TextAnalysis.buildVocab(docs, $"doc_id", $"text", 2)
      .orderBy($"vocab_id").select($"token").as[String].collect()
    assert(out.toSeq == Seq("ant", "zed"))
  }

  test("quantileBins: equal-frequency bins; edge values land in the lower bin; null → null") {
    import spark.implicits._
    val df = (1 to 8).map(_.toDouble).map(Tuple1(_)).toDF("v")
      .union(Seq(Tuple1(null.asInstanceOf[java.lang.Double])).toDF("v"))
    val out = Profile.quantileBins(df, $"v", nBins = 4)
      .groupBy($"bin").agg(count(lit(1)).as("n"))
      .orderBy($"bin".asc_nulls_first)
      .collect().map(r => (if (r.isNullAt(0)) -1 else r.getInt(0), r.getLong(1)))
    assert(out.toSeq == Seq((-1, 1L), (1, 2L), (2, 2L), (3, 2L), (4, 2L)))
    // the p50 edge of 1..8 is 4.5; the value 4 sits below, 5 above
    val bins = Profile.quantileBins(df.filter($"v".isNotNull), $"v", 4)
      .collect().map(r => r.getDouble(0) -> r.getInt(1)).toMap
    assert(bins(4.0) == 2 && bins(5.0) == 3)
  }

  test("binDrift: identical snapshots show zero drift; a shift concentrates mass in the top bin") {
    import spark.implicits._
    val base = (1 to 8).map(_.toDouble).map(Tuple1(_)).toDF("v")
    val same = Profile.binDrift(base, base, $"v", 4)
      .orderBy($"bin")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(same.map(_._1).toSeq == Seq(1, 2, 3, 4))
    assert(same.forall(x => x._2 == 2L && x._3 == 2L && x._4 == 0.0))
    // base edges of 1..8 are (2.75, 4.5, 6.25); a 100..103 snapshot
    // lands entirely above them → bin 4 holds all current mass
    val cur = (100 to 103).map(_.toDouble).map(Tuple1(_)).toDF("v")
    val drift = Profile.binDrift(base, cur, $"v", 4)
      .orderBy($"bin")
      .collect().map(r => (r.getInt(0), r.getDouble(4), r.getDouble(5)))
    assert(drift.toSeq == Seq(
      (1, 0.0, 0.25), (2, 0.0, 0.25), (3, 0.0, 0.25), (4, 1.0, 0.75)))
  }

  test("bigramCondProbScore: hand-computed MLE conditionals, exact ppb arithmetic") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"), // bigrams: (a,b) (b,a) (a,b)
      (2L, "a b c"), //          (a,b) (b,c)
      (3L, "solo")) // one token → no bigrams → absent
      .toDF("doc_id", "text")
    // corpus: c(a,·)=3 all (a,b); c(b,·)=2 → (b,a) 1/2, (b,c) 1/2
    val out = LangModel.bigramCondProbScore(docs, $"doc_id", $"text")
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out(0)._2 == 3L)
    // doc1: (1e9 + 5e8 + 1e9) / 3
    assert(out(0)._3 == (1000000000L + 500000000L + 1000000000L).toDouble / 3.0)
    // doc2: (1e9 + 5e8) / 2
    assert(out(1)._3 == 750000000.0)
  }

  test("naiveBayesClassify: hand-computed ppb scores, prior pseudo-token, tie to smallest label") {
    import spark.implicits._
    // train: 8 tokens per class, V = 11, priors 2/4 → 500000000 ppb,
    // Laplace denominator N_y + V = 19 for both classes
    val train = Seq(
      ("spam", "buy cheap pills now"),
      ("spam", "cheap pills cheap deals"),
      ("ham", "meeting notes for tomorrow"),
      ("ham", "notes from the meeting")).toDF("label", "text")
    val score = Seq(
      (10L, "cheap pills here"),
      (11L, "meeting notes"),
      (12L, "")).toDF("doc_id", "text")
    val got = LangModel.naiveBayesClassify(
        train, score, col("label"), col("doc_id"), col("text"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // doc 10 spam: ((3+1)e9÷19 + (2+1)e9÷19 + (0+1)e9÷19 + prior) ÷ 4
    //            = (210526315 + 157894736 + 52631578 + 500000000) ÷ 4 = 230263157
    // doc 11 ham: (2×157894736 + 500000000) ÷ 3 = 271929824 beats spam's 201754385
    // doc 12: zero tokens → both classes score the bare prior; the
    //         lexicographic tie-break must pick "ham"
    assert(got.toSeq == Seq(
      (10L, "spam", 230263157L, 3L),
      (11L, "ham", 271929824L, 2L),
      (12L, "ham", 500000000L, 0L)))
  }

  test("bigramCondProbScore: repetitive text scores higher than varied text") {
    import spark.implicits._
    // heads must compete for the signal to exist: "the" continues three
    // ways (p = 1/3 each), "spam" only ever continues to itself (p = 1)
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "the cat runs"),
      (3L, "the dog sleeps"),
      (4L, "the fox jumps")).toDF("doc_id", "text")
    val out = LangModel.bigramCondProbScore(docs, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(2L) && out(1L) > out(3L) && out(1L) > out(4L))
  }
}
