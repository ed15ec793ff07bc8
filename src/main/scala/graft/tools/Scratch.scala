package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.ext.Similarity

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tuned(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    emb.count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }

    val base = emb.select(col("vec_id").as("vid"),
      transform(col("embedding"), x => x.cast("double")).as("vec"))
    val bucketed = base.select(col("vid"),
      explode(graft.functions.VectorFunctions.signLshBuckets(col("vec"), 4, 6)).as("bucket"))
    time("bucketize")(bucketed.count())
    val cand = bucketed.select(col("vid").as("id_a"), col("bucket"))
      .join(bucketed.select(col("vid").as("id_b"), col("bucket")), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    time("candidates")(cand.count())
    time("full q38")(Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.4, tables = 4, planes = 6).count())
    time("full q38 again")(Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.4, tables = 4, planes = 6).count())
    spark.stop()
  }
}
