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
