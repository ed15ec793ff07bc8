package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession

/** Dev-only profiling entry point: edit, `sbt "runMain graft.tools.Scratch"`,
  * read the [scratch] lines. Not part of the library surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tuned(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }

    // default: time one catalog query cold/warm (name via args(0))
    val name = if (args.nonEmpty) args(0) else "q01_pricing_summary"
    val q = graft.queries.Catalog.all.find(_.name == name).get
    time(s"$name cold")(q.build(spark, dir).count())
    time(s"$name warm")(q.build(spark, dir).count())
    spark.stop()
  }
}
