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
}
