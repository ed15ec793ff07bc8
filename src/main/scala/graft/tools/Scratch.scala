package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, Tables}

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tuned(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val docs = Tables.load(spark, dir, "documents")
    val q = graft.ext.Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 8, 2, 0.5)
    q.count() // execute so AQE final plan materializes
    val plan = q.queryExecution.executedPlan.toString
    println("[scratch] Reused in q35: " + "Reused\\w+".r.findAllIn(plan).toList.distinct)
    val scans = "Scan parquet".r.findAllIn(plan).size
    println("[scratch] parquet scans in q35 plan: " + scans)
    plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("QueryStage") || l.contains("Scan parquet") || l.contains("Generate") || l.contains("Join")).foreach(l => println("[scratch] " + l.take(150)))
  }
}
