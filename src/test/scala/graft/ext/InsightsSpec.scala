package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics coverage for the round-6 insight operators: triangle
  * census, association rules, grouped OLS, token diversity.
  */
class InsightsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.GraftSession.local("insights-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  test("triangleCount: K4 census; dup/reversed/self-loop edges collapse") {
    import spark.implicits._
    val k4 = for { a <- 1 to 4; b <- 1 to 4 if a != b } yield (a.toLong, b.toLong)
    // both directions present + self-loops: dedup/canonicalization under test
    val edges = (k4 ++ Seq((1L, 1L), (2L, 2L))).toDF("x", "y")
    val r = Graph.triangleCount(edges, "x", "y").collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 6) // nodes, edges
    assert(r.getLong(2) == 12 && r.getLong(3) == 4) // wedges C(3,2)*4, triangles
    assert(r.getDouble(4) == 1.0) // 3*4/12
  }

  test("triangleCount: star graph — hub is never a wedge source; 4-cycle closes nothing") {
    import spark.implicits._
    val star = (1L to 50L).map(i => (0L, i)).toDF("x", "y")
    val s = Graph.triangleCount(star, "x", "y").collect().head
    assert(s.getLong(3) == 0 && s.getLong(2) == 50L * 49 / 2)
    assert(s.getDouble(4) == 0.0)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("x", "y")
    val c = Graph.triangleCount(cyc, "x", "y").collect().head
    assert(c.getLong(1) == 4 && c.getLong(2) == 4 && c.getLong(3) == 0)
  }

  test("triangleCount: no cartesian product in the physical plan") {
    import spark.implicits._
    val e = (1L to 100L).map(i => (i, i % 10)).toDF("x", "y")
    val plan = Graph.triangleCount(e, "x", "y").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }

  test("associationRules: hand-checked support/confidence/lift; hub basket excluded") {
    import spark.implicits._
    // baskets: b1={a,b}, b2={a,b}, b3={a,c}, hub={a,b,c,d} (excluded at max 3)
    val items = Seq(
      ("b1", "a"), ("b1", "b"), ("b1", "b"), // dup item dedups
      ("b2", "a"), ("b2", "b"),
      ("b3", "a"), ("b3", "c"),
      ("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "d"))
      .toDF("bk", "it")
    val r = Assoc.associationRules(items, col("bk"), col("it"), maxBasketSize = 3)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    // kept: b1, b2, b3 → n=3; sup(a)=3, sup(b)=2, sup(c)=1
    assert(r.keySet == Set(("a", "b"), ("a", "c")))
    assert(r(("a", "b")) == ((2L, 2.0 / 3.0, 2.0 * 3.0 / (3.0 * 2.0))))
    assert(r(("a", "c")) == ((1L, 1.0 / 3.0, 1.0 * 3.0 / (3.0 * 1.0))))
  }

  test("associationRules: null basket/item rows dropped; undersized guard rejected") {
    import spark.implicits._
    val items = Seq((null, "a"), ("b1", null), ("b1", "a"), ("b1", "b"))
      .toDF("bk", "it")
    val out = Assoc.associationRules(items, col("bk"), col("it"), 8).collect()
    assert(out.length == 1 && out.head.getLong(2) == 1)
    intercept[IllegalArgumentException] {
      Assoc.associationRules(items, col("bk"), col("it"), 1)
    }
  }

  test("groupedOls: exact fit recovered; constant-x and constant-y guards; nulls excluded") {
    import spark.implicits._
    val df = Seq(
      ("fit", Some(1.0), Some(3.0)), ("fit", Some(2.0), Some(5.0)),
      ("fit", Some(3.0), Some(7.0)), // y = 2x + 1
      ("fit", None, Some(8.0)), ("fit", Some(9.0), None), // excluded
      ("constx", Some(4.0), Some(1.0)), ("constx", Some(4.0), Some(2.0)),
      ("consty", Some(1.0), Some(9.0)), ("consty", Some(2.0), Some(9.0)))
      .toDF("g", "x", "y")
    val m = Profile.groupedOls(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val fit = m("fit")
    assert(fit.getLong(1) == 3) // null-bearing rows excluded from n_obs
    assert(math.abs(fit.getDouble(2) - 2.0) < 1e-12)
    assert(math.abs(fit.getDouble(3) - 1.0) < 1e-12)
    assert(math.abs(fit.getDouble(4) - 1.0) < 1e-12)
    assert(m("constx").isNullAt(2) && m("constx").isNullAt(3) && m("constx").isNullAt(4))
    val cy = m("consty")
    assert(cy.getDouble(2) == 0.0 && cy.isNullAt(4)) // slope 0, R² undefined
  }

  test("tokenDiversity: hand counts; no-token docs absent by the no-evidence contract") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, ""), (3L, null), (4L, "x")).toDF("id", "txt")
    val m = TokenDiversityFixture.run(docs)
    assert(m.keySet == Set(1L, 4L))
    val (n, ty, conc, top, ttr) = m(1L)
    assert(n == 3 && ty == 2)
    assert(conc == 5.0 / 9.0 && top == 2.0 / 3.0 && ttr == 2.0 / 3.0)
    assert(m(4L) == ((1L, 1L, 1.0, 1.0, 1.0)))
  }
}

/** Collects tokenDiversity output into a comparable map. */
private object TokenDiversityFixture {
  def run(docs: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Double, Double, Double)] =
    TextAnalysis.tokenDiversity(docs, col("id"), col("txt"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
}
