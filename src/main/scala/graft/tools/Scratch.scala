package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tuned(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()

    import graft.functions.MediaFunctions.{pngEncode, imageIoDecode}
    val docs = graft.Tables.load(spark, dir, "documents").select($"doc_id")
    def px = transform(sequence(lit(0), lit(255)), { i =>
      val h = graft.ext.TextHash.hash64(
        concat($"doc_id".cast("string"), lit(":"), i.cast("string")))
      def ch(sh: Int) =
        shiftrightunsigned(h, sh).bitwiseAND(lit(255L)).cast("int")
      (shiftleft(ch(0), 16) + shiftleft(ch(8), 8) + ch(16)).cast("int")
    })
    time("pixels only")(docs.select(px.as("p")).agg(sum(size($"p"))).collect())
    val enc = docs.select($"doc_id", pngEncode(px, lit(16), lit(16)).as("payload"))
    time("encode only")(enc.agg(sum(length($"payload"))).collect())
    time("encode only x2")(enc.agg(sum(length($"payload"))).collect())
    val dec = enc.select(imageIoDecode($"payload").as("i"))
    time("encode+decode")(dec.agg(sum($"i.width")).collect())
    time("encode+decode x2")(dec.agg(sum($"i.width")).collect())
    val q = graft.queries.Catalog.all.find(_.name == "q263_png_phash_neardup").get
    time("q263 full pass 1")(q.build(spark, dir).count())
    time("q263 full pass 2")(q.build(spark, dir).count())
    spark.stop()
  }
}
