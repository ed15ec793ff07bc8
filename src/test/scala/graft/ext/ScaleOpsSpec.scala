package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics coverage for the layout / exact-sampling / canonicalization
  * operators (q95–q98 cover engine parity).
  */
class ScaleOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.GraftSession.local("scale-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  test("mortonKey: hand-computed interleave and range") {
    import spark.implicits._
    // b0 = 5 (101), b1 = 3 (011) with 3 bits:
    // out bit 2i = bit i of b0, out bit 2i+1 = bit i of b1
    // i=0: b0:1→bit0, b1:1→bit1; i=1: b0:0→bit2, b1:1→bit3; i=2: b0:1→bit4, b1:0→bit5
    // = 0b011011 = 27
    val out = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.mortonKey(Seq(col("a"), col("b")), 3).as("z"))
      .as[Long].head()
    assert(out == 27L)
    // z-curve locality: keys of all 16x16 buckets are a permutation of 0..255
    val all = (0 until 16).flatMap(i => (0 until 16).map(j => (i.toLong, j.toLong)))
      .toDF("a", "b").select(Layout.mortonKey(Seq(col("a"), col("b")), 4).as("z"))
      .as[Long].collect().sorted
    assert(all.toSeq == (0L until 256L))
  }

  test("zorderLayout: per-file min/max boxes tile BOTH dimensions (file-skipping)") {
    import spark.implicits._
    // uniform 2-d grid; a linear (single-column) sort would give every
    // file the full range of the OTHER column
    val rows = for { x <- 1 to 100; y <- 1 to 100 } yield (x.toLong, y.toLong)
    val df = rows.toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.zorderLayout(df, Seq("x", "y"), numFiles = 16).write
      .mode("overwrite").parquet(s"$dir/z")
    val boxes = spark.read.parquet(s"$dir/z")
      .groupBy(input_file_name().as("f"))
      .agg(((max($"x") - min($"x")) * (max($"y") - min($"y"))).as("area"))
      .select("area").as[Long].collect()
    assert(boxes.length == 16)
    // global box area is ~99*99 = 9801; 16 near-square tiles should
    // average well under a quarter of it (a 1-d sort gives ~99*6 strips
    // on one dim but full 99 range on the other when filtered on y)
    val mean = boxes.sum.toDouble / boxes.length
    assert(mean < 9801.0 / 4, s"mean z-file box area $mean")
    // and no rows lost
    assert(spark.read.parquet(s"$dir/z").count() == 10000)
  }

  test("exactStratifiedSample: exact n per stratum, small strata whole, deterministic") {
    import spark.implicits._
    val d = ((1L to 900L).map(i => (i, "big")) ++ (1001L to 1005L).map(i => (i, "tiny")))
      .toDF("id", "s")
    val out = Sampling.exactStratifiedSample(d, col("id"), col("s"), 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(out.count(_._1 == "big") == 10)
    // a stratum smaller than n survives whole
    assert(out.filter(_._1 == "tiny").map(_._3).sorted.toSeq == (1001L to 1005L))
    // membership is content-keyed: partitioning can't change it
    val again = Sampling.exactStratifiedSample(d.repartition(13), col("id"), col("s"), 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(out.sortBy(t => (t._1, t._2)).toSeq == again.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("canonicalize: NFC, case, and whitespace variants collapse; ASCII unchanged") {
    import spark.implicits._
    val composed = "café crème"              // precomposed é è
    val decomposed = "café  crème"         // e + combining accents, double space
    val messy = "  CAFÉ\tcrème \n"
    val out = Seq(composed, decomposed, messy).toDF("t")
      .select(TextAnalysis.canonicalize(col("t")).as("c")).as[String].collect()
    assert(out.distinct.length == 1, out.mkString("|"))
    assert(out.head == composed)
    // plain ascii passes through untouched
    val ascii = Seq("hello world").toDF("t")
      .select(TextAnalysis.canonicalize(col("t")).as("c")).as[String].head()
    assert(ascii == "hello world")
  }

  test("hll sketch algebra: union of partial sketches tracks exact distinct within ~5%") {
    import spark.implicits._
    val d = (1L to 20000L).map(i => (i % 7, i % 4001)).toDF("part", "v")
    val est = d.groupBy($"part").agg(hll_sketch_agg($"v").as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("e"))
      .as[Long].head()
    assert(math.abs(est - 4001.0) / 4001.0 < 0.05, s"estimate $est vs 4001")
  }
}
