package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Catalog invariants: the full surface analyzes against the fixtures
  * (schema drift fails here, before any execution), names are unique
  * and stable, and the oracle/rows-only split is the declared one.
  */
class CatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.GraftSession.local("catalog-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("every catalog query analyzes against the test fixtures") {
    val failures = Catalog.all.flatMap { q =>
      try { q.build(spark, dir).schema; None }
      catch { case e: Exception =>
        Some(s"${q.name}: ${Option(e.getMessage).getOrElse(e.toString).take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("catalog has 303 uniquely named queries, every one oracle-checked") {
    assert(Catalog.all.size == 303)
    assert(Catalog.all.map(_.name).distinct.size == 303)
    // since round 6 the approx sketches are self-verifying envelope
    // checks (exact twin + bounded-error verdict in the row), so no
    // catalog entry is allowed to lack an oracle
    val noOracle = Catalog.all.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.isEmpty, noOracle)
  }

  test("every query result can drive the driver contract (non-empty column set, stable names)") {
    Catalog.all.foreach { q =>
      val schema = q.build(spark, dir).schema
      assert(schema.nonEmpty, q.name)
      assert(schema.fieldNames.distinct.length == schema.fieldNames.length,
        s"${q.name} has duplicate output columns: ${schema.fieldNames.mkString(",")}")
    }
  }
}
