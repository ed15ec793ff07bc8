package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Multimodal plumbing semantics: metadata math, frame planning, and the
  * batched feature-extraction pipeline (deterministic stub codec).
  */
class MediaSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.GraftSession.local("media-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  test("fitWithin preserves aspect ratio, never upscales, floors at 1px") {
    val meta = Media.MediaMeta("image", 4000, 3000, 0, 0L, "jpeg")
    assert(Media.fitWithin(meta, 1000, 1000) == (1000, 750))
    assert(Media.fitWithin(meta, 8000, 8000) == (4000, 3000)) // no upscale
    assert(Media.fitWithin(Media.MediaMeta("image", 10000, 1, 0, 0L, "x"), 100, 100) == (100, 1))
    assert(Media.fitWithin(Media.MediaMeta("image", 0, 0, 0, 0L, "x"), 100, 100) == (0, 0))
  }

  test("frameOffsets: every `everyMs` in [0, duration), empty for non-positive durations") {
    import spark.implicits._
    val out = Seq(1000L, 250L, 249L, 0L, -5L).toDF("d")
      .select(Media.frameOffsets($"d", 250L).as("o"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(out(0) == Seq(0L, 250L, 500L, 750L)) // 1000ms → 4 frames
    assert(out(1) == Seq(0L)) // exactly one period → frame 0 only
    assert(out(2) == Seq(0L))
    assert(out(3) == Seq.empty)
    assert(out(4) == Seq.empty)
  }

  test("extractFeatures is deterministic, dimension-correct, and batch-shaped") {
    import spark.implicits._
    val df = Seq((1L, "payload-one"), (2L, "payload-two"), (3L, "payload-one"))
      .toDF("id", "data")
      .select($"id", $"data".cast("binary").as("data"))
    val media = Media.asMedia(df, "id", "data", kind = "audio")
    val feats = Media.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(feats.forall(_.dim == 16))
    assert(feats.forall(_.features.length == 16))
    assert(feats.forall(_.kind == "audio"))
    // identical payloads → identical features; distinct → distinct
    assert(feats(0).features.toSeq == feats(2).features.toSeq)
    assert(feats(0).features.toSeq != feats(1).features.toSeq)
    // stub codec range contract
    assert(feats.flatMap(_.features).forall(f => f >= 0.0f && f < 1.0f))
  }

  test("lumaGrid: 64 cells, box-filter means, empty cells 0, locality") {
    import spark.implicits._
    import graft.functions.MediaFunctions._
    // 128 bytes of value 100 → every cell holds exactly two bytes → 100
    val flat = Array.fill(128)(100.toByte)
    // short payload (32 bytes): positions map to every other cell; the
    // 32 untouched cells read 0
    val short = Array.fill(32)(100.toByte)
    val rows = Seq((1L, flat), (2L, short), (3L, Array.empty[Byte]))
      .toDF("id", "b")
      .select($"id", lumaGrid($"b").as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(rows(1L) == Seq.fill(64)(100))
    assert(rows(2L).count(_ == 100) == 32 && rows(2L).count(_ == 0) == 32)
    assert(rows(3L) == Seq.fill(64)(0))
    // locality: editing the first 8 of 512 bytes moves ONLY cell 0
    val base = Array.tabulate(512)(i => (i % 251).toByte)
    val edited = base.clone(); (0 until 8).foreach(i => edited(i) = 255.toByte)
    val Seq(g1, g2) = Seq((1L, base), (2L, edited)).toDF("id", "b")
      .orderBy($"id").select(lumaGrid($"b")).collect()
      .map(_.getSeq[Int](0)).toSeq
    assert(g1.zip(g2).zipWithIndex.count { case ((a, b), _) => a != b } == 1)
    assert(g1.drop(1) == g2.drop(1))
  }

  test("aHash/dHash: integer-exact bits, null off-contract grids") {
    import spark.implicits._
    import graft.functions.MediaFunctions._
    // grid: cell i = i → mean floor(2016/64)=31; aHash bits 32..63 set
    val ramp = Array.tabulate(256)(i => (i / 4).toByte) // cell c = c
    val out = Seq((1L, ramp)).toDF("id", "b")
      .select(aHash64(lumaGrid($"b")).as("a"), dHash64(lumaGrid($"b")).as("d"))
      .collect().head
    val expectA = (32 until 64).map(1L << _).reduce(_ | _)
    assert(out.getLong(0) == expectA)
    // ramp rows: within each row cells strictly increase; the wraparound
    // bit (col 7 → col 0) is the only unset bit per row
    val expectD = (0 until 64).filter(i => i % 8 != 7).map(1L << _).foldLeft(0L)(_ | _)
    assert(out.getLong(1) == expectD)
    // non-64-cell grid → null hash
    val bad = Seq((1L, Seq(1, 2, 3))).toDF("id", "g")
      .select(aHash64($"g").as("a"), dHash64($"g").as("d")).collect().head
    assert(bad.isNullAt(0) && bad.isNullAt(1))
  }

  test("phashPairs: planted local edits found, different content excluded, no cartesian") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      val body = Array.tabulate(400)(j => (((i * 131 + j * 17) % 83) + 40).toByte)
      (i.toLong * 2, body)
    }
    val variants = docs.map { case (id, b) =>
      val v = b.clone(); (0 until 6).foreach(i => v(i) = (v(i) + 60).toByte); (id + 1, v)
    }
    val df = (docs ++ variants).toDF("media_id", "payload")
    val pairs = Media.phashPairs(df, "media_id", "payload", maxHamming = 4)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every planted (2i, 2i+1) pair present with small hamming
    val planted = got.filter { case (a, b, _) => b == a + 1 && a % 2 == 0 }
    assert(planted.length == 40)
    assert(planted.forall(_._3 <= 4))
    // identical payloads → hamming 0
    val twin = Seq((1L, "same-bytes"), (2L, "same-bytes"), (3L, "other-content"))
      .toDF("id", "p").select($"id", $"p".cast("binary").as("p"))
    val tp = Media.phashPairs(twin, "id", "p", maxHamming = 0).collect()
    assert(tp.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 2L, 0L)))
  }
}
