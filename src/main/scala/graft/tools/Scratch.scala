package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tuned(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.queries.Catalog.all.find(_.name == "q190_sparse_cosine_pairs").get
    val df = q.build(spark, "/root/testdata/sf0.1")
    println("[scratch-plan]\n" + df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
