package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: settle empirically whether a pinned static relation carries
  * its HashPartitioning into downstream joins on this Spark build —
  * (A) eager localCheckpoint under AQE, (B) eager localCheckpoint with
  * AQE disabled for the pin, (C) persist + count. For each variant,
  * prints the pinned plan's outputPartitioning and the FINAL (adaptive)
  * plan of a representative per-round join, so the Exchange above the
  * pinned scan is either provably gone or provably still there.
  * Usage: runMain graft.PinProbe
  */
object PinProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tuned(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = spark.range(30000000L)
      .select((col("id") % 100000L).as("s"), (col("id") % 77777L).as("d"))

    def report(tag: String, pinned: DataFrame): Unit = {
      println(s"\n==== $tag")
      println("  pinned.executedPlan.outputPartitioning = " +
        pinned.queryExecution.executedPlan.outputPartitioning)
      println("  pinned.executedPlan.outputOrdering = " +
        pinned.queryExecution.executedPlan.outputOrdering)
      // state side sized past the broadcast threshold so the per-round
      // join must co-partition — the graph-family shape (node state vs
      // pinned edges, SMJ/SHJ on s)
      val state = spark.range(8000000L)
        .select(pmod(xxhash64(col("id")), lit(100000L)).as("s"),
          pmod(xxhash64(col("id"), lit(7)), lit(1000L)).as("x"))
      val j = pinned.join(state, "s").groupBy(col("d")).agg(sum(col("x")))
      j.write.format("noop").mode("overwrite").save()
      val finalPlan = j.queryExecution.executedPlan.toString
      val nEx = "Exchange".r.findAllIn(finalPlan).length
      println(s"  final join plan Exchange count = $nEx")
      finalPlan.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Scan") ||
          l.contains("Sort") || l.contains("Join") || l.contains("AQEShuffleRead"))
        .foreach(l => println("   | " + l.trim.take(150)))
    }

    // A: the r17 pinByKey shape — eager localCheckpoint under AQE
    report("A eager localCheckpoint, AQE on",
      edges.repartition(col("s")).localCheckpoint())

    // B: AQE disabled while planning+executing the pin only
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val b = edges.repartition(col("s")).localCheckpoint()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    report("B eager localCheckpoint, AQE off during pin", b)

    // B2: B + sortWithinPartitions — ordering capture check
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val b2 = edges.repartition(col("s")).sortWithinPartitions(col("s")).localCheckpoint()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    report("B2 eager sorted localCheckpoint, AQE off during pin", b2)

    // C: persist + count (InMemoryTableScan partitioning propagation)
    val c = edges.repartition(col("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    c.count()
    report("C persist + count", c)
    c.unpersist(false)

    spark.stop()
  }
}
