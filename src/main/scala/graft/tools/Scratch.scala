package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.ext.{Dedup, TextHash}

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tuned(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    import spark.implicits._
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }

    val docs = Tables.load(spark, dir, "documents")
    docs.count()

    val base = docs.select(col("doc_id"), TextHash.wordShingles(col("text"), 3).as("shingles"))
    time("shingle+hash")(base.withColumn("h", TextHash.hashedShingles(col("shingles"))).count())
    val banded = base
      .withColumn("hashed", TextHash.hashedShingles(col("shingles")))
      .withColumn("sig", TextHash.minhashSignature(col("hashed"), 16))
      .select(col("doc_id"), explode(TextHash.bandKeys(col("sig"), 8, 2)).as("band"))
    time("banding")(banded.count())
    val cand = banded.select(col("doc_id").as("id_a"), col("band"))
      .join(banded.select(col("doc_id").as("id_b"), col("band")), Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    time("candidates")(cand.count())
    banded.explain("formatted")
    time("full q35")(Dedup.minhashLshPairs(docs, "doc_id", "text",
      3, 8, 2, 0.5).count())

    // q03 shape: cold vs warm
    val orders = Tables.load(spark, dir, "orders")
      .filter($"o_orderdate" < to_timestamp(lit("2000-01-01 00:00:00")))
    val li = Tables.load(spark, dir, "lineitem")
    def q3 = broadcast(Tables.load(spark, dir, "customer"))
      .join(orders, $"c_custkey" === $"o_custkey")
      .join(li, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey", $"o_orderdate", $"c_mktsegment")
      .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(org.apache.spark.sql.types.DecimalType(38, 10))).cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
    time("q3 cold")(q3.count())
    time("q3 warm")(q3.count())
    spark.stop()
  }
}
