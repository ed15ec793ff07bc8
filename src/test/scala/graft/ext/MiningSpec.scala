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
