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
}
