package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Drives the streaming operators through MemoryStream: windowed aggs
  * with watermark-driven late-data drop, and stateful sessionization.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.GraftSession.local("streaming-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def ev(id: Long, t: String, user: Long, typ: String, v: Double): EventStreams.Event =
    EventStreams.Event(id, ts(t), user, typ, v)

  test("tumbling window with watermark drops late data past the delay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val agg = EventStreams.tumblingCounts(input.toDF(), "10 minutes", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two events in the 00:00 window, one in 00:10
      input.addData(
        ev(1, "2024-01-01 00:01:00", 1, "click", 1.0),
        ev(2, "2024-01-01 00:04:00", 1, "click", 2.0),
        ev(3, "2024-01-01 00:11:00", 2, "view", 3.0))
      q.processAllAvailable()
      // batch 2: advance event time far enough that the watermark
      // (max ts - 5 min) passes 00:10 → windows 00:00 and 00:10 close
      input.addData(ev(4, "2024-01-01 00:30:00", 1, "click", 4.0))
      q.processAllAvailable()
      // batch 3: a LATE event for the already-closed 00:00 window → dropped
      input.addData(ev(5, "2024-01-01 00:02:00", 9, "click", 99.0))
      q.processAllAvailable()
      input.addData(ev(6, "2024-01-01 01:00:00", 1, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT win_start, event_type, n, total FROM tumbling")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.contains((ts("2024-01-01 00:00:00"), "click", 2L, 3.0)),
        s"closed 00:00 window wrong: ${rows.toSeq}")
      assert(rows.contains((ts("2024-01-01 00:10:00"), "view", 1L, 3.0)))
      // the late event must NOT have re-opened or augmented the 00:00 window
      assert(!rows.exists(r => r._1 == ts("2024-01-01 00:00:00") && r._3 != 2L))
      assert(!rows.exists(_._4 == 99.0))
    } finally q.stop()
  }

  test("streaming dedup: within-watermark duplicates drop, state evicts after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val deduped = EventStreams.dedupWithinWatermark(input.toDF(), "10 minutes", "event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: id=1 twice in the same batch → one row; id=2 once
      input.addData(
        ev(1, "2024-01-01 00:01:00", 1, "click", 1.0),
        ev(1, "2024-01-01 00:01:00", 1, "click", 1.0),
        ev(2, "2024-01-01 00:02:00", 2, "view", 2.0))
      q.processAllAvailable()
      // batch 2: id=1 again, still within the 10-min watermark → dropped
      input.addData(ev(1, "2024-01-01 00:05:00", 1, "click", 1.0))
      q.processAllAvailable()
      // batch 3: advance event time so the watermark (max ts - 10 min)
      // passes id=1's expiry → its dedup state is evicted
      input.addData(ev(3, "2024-01-01 01:00:00", 3, "click", 3.0))
      q.processAllAvailable()
      // batch 4: id=1 RE-arrives after eviction → emitted again
      // (the documented at-least-once contract of finite-state dedup)
      input.addData(ev(1, "2024-01-01 01:01:00", 1, "click", 1.0))
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup_stream")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.count(_ == 1L) == 2, s"expected id=1 twice (pre+post eviction): $ids")
      assert(ids.count(_ == 2L) == 1 && ids.count(_ == 3L) == 1, s"got $ids")
    } finally q.stop()
  }

  test("stateless ext operators (scrub, hash sampling) run unchanged on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    // same Column functions as the batch q65/q68 path, zero changes
    val cleaned = graft.ext.Sampling.hashSample(
      docs.select($"doc_id", graft.ext.TextAnalysis.scrub($"text").as("clean")),
      $"doc_id", fraction = 1.0)
    val q = cleaned.writeStream.format("memory").queryName("scrub_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "go to https://x.io  now"), (2L, "plain"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, clean FROM scrub_stream")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows == Map(1L -> "go to <URL> now", 2L -> "plain"))
    } finally q.stop()
  }

  test("streaming KMV sketch: incremental estimates converge to the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val est = EventStreams.kmvDistinctUsers(input.toDS(), k = 16, "10 minutes")
    val q = est.writeStream.format("memory").queryName("kmv_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      // clicks: 100 distinct users split across three micro-batches
      // (with repeats — multiplicity must not move the sketch);
      // views: 5 distinct users, below k -> exact
      input.addData((1L to 40L).map(u =>
        ev(u, "2024-01-01 00:01:00", u, "click", 1.0)): _*)
      q.processAllAvailable()
      input.addData((30L to 70L).map(u =>
        ev(100 + u, "2024-01-01 00:02:00", u, "click", 1.0)): _*)
      q.processAllAvailable()
      input.addData(((61L to 100L).map(u =>
        ev(300 + u, "2024-01-01 00:03:00", u, "click", 1.0)) ++
        (1L to 5L).map(u => ev(500 + u, "2024-01-01 00:03:30", u, "view", 1.0))): _*)
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n_seen, n_state, est FROM kmv_stream")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      // one Update row per (key, batch) it appeared in
      assert(rows.count(_._1 == "click") == 3 && rows.count(_._1 == "view") == 1)
      val finalClick = rows.filter(_._1 == "click").maxBy(_._2)
      val finalView = rows.filter(_._1 == "view").maxBy(_._2)
      assert(finalClick._2 == 121L && finalClick._3 == 16) // 40+41+40 events seen
      assert(finalView == (("view", 5L, 5, 5L))) // sub-k -> exact
      // the drained streaming estimate equals the batch q207 sketch on
      // the same (type, user) data — the mergeable-summary property
      val batch = graft.ext.Retrieval.kmvDistinct(
          ((1L to 100L).map(u => ("click", u)) ++ (1L to 5L).map(u => ("view", u)))
            .toDF("t", "u"),
          $"t", $"u", k = 16)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      assert(finalClick._4 == batch("click"), s"stream=$finalClick batch=$batch")
      assert(finalView._4 == batch("view"))
    } finally q.stop()
  }

  test("streaming quantile sketch: drained state equals the batch sketch, any arrival order") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // 600 rows, one key, k=64 -> forced compaction (t > 0); arrival
    // shuffled across three micro-batches
    val all = (1 to 600).map(i =>
      ev(i.toLong, "2024-01-01 00:01:00", i.toLong, "m", (i * 37 % 500).toDouble))
    val shuffled = all.sortBy(e => graft.ext.TextHash.hash64Local(s"arr:${e.event_id}"))
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.quantileSketchState(input.toDS(), k = 64, "10 minutes")
      .writeStream.format("memory").queryName("qsketch")
      .outputMode(OutputMode.Update()).start()
    try {
      shuffled.grouped(200).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val fin = spark.sql("SELECT n, t, n_items, p50_est, p90_est FROM qsketch")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
          r.getLong(4))).maxBy(_._1)
      assert(fin._1 == 600L)
      assert(fin._2 > 0, "k=64 over 600 rows must compact")
      // batch twin on the same rows (event_id as the row id, value as v)
      val batch = graft.ext.Retrieval.quantileSketch(
        all.map(e => ("m", e.value.toLong, e.event_id.toString)).toDF("g", "v", "id"),
        col("g"), col("v"), col("id"), k = 64)
      val b = batch.collect().head
      assert(fin._2 == b.getInt(2), "threshold identity")
      assert(fin._3 == b.getSeq[Any](3).size, "item count identity")
      val est = graft.ext.Retrieval.quantileSketchQuantiles(batch, Seq(500000L, 900000L))
        .collect().map(r => r.getLong(1) -> r.getLong(6)).toMap
      assert(fin._4 == est(500000L) && fin._5 == est(900000L),
        s"stream=$fin batch=$est")
    } finally q.stop()
  }

  test("streaming budget admission: final state equals the batch budgetMixtureSample cut") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // two weighted sources + one unlisted; docs arrive SHUFFLED across
    // three micro-batches — arrival order must not move the final cut
    val all = (1 to 60).map { i =>
      EventStreams.DocArrival(Seq("web", "code", "junk")(i % 3), i.toLong,
        (i % 5 + 1).toLong, ts("2024-01-01 00:01:00"))
    }
    val shuffled = all.sortBy(d => graft.ext.TextHash.hash64Local(s"arrival:${d.doc_id}"))
    val weights = Seq(("web", 2L), ("code", 1L))
    val input = MemoryStream[EventStreams.DocArrival]
    val adm = EventStreams.budgetAdmission(input.toDS(), weights, totalBudget = 45L)
    val q = adm.writeStream.format("memory").queryName("admission")
      .outputMode(OutputMode.Update()).start()
    try {
      shuffled.grouped(20).foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
      }
      val rows = spark.sql(
        "SELECT source, budget, n_seen, n_admitted, tokens_admitted, cut_hash FROM admission")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      val fin = rows.groupBy(_._1).map { case (s, rs) => s -> rs.maxBy(_._3) }
      // floor allocation: web 45*2/3 = 30, code 45*1/3 = 15; junk: no budget
      assert(fin("web")._2 == 30L && fin("code")._2 == 15L && fin("junk")._2 == 0L)
      assert(fin("junk")._4 == 0L && fin("junk")._5 == 0L)
      // batch twin over the same (unshuffled) feed
      val batch = graft.ext.Sampling.budgetMixtureSample(
          all.toDF(), col("doc_id"), col("source"), col("n_tokens"),
          weights, totalBudget = 45L)
        .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(3)))
      for (s <- Seq("web", "code")) {
        val kept = batch.filter(_._1 == s)
        assert(fin(s)._4 == kept.length.toLong, s"$s admitted count")
        assert(fin(s)._5 == kept.map(_._3).max, s"$s token sum") // max cum = total
        val maxHash = kept.map(k => graft.ext.TextHash.hash64Local(k._2.toString)).max
        assert(fin(s)._6 == maxHash, s"$s cut hash")
      }
    } finally q.stop()
  }

  test("leakage gate: streamed train docs flag exactly the batch cross-split near-dup pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // 30 unique base docs; docs 100+i exactly copy doc i (i<10); docs
    // 200+i near-copy doc i (i in 10..14, last 3 of 12 tokens changed)
    def baseText(i: Int) = (0 until 12).map(j => s"tok${i}_$j").mkString(" ")
    def nearText(i: Int) =
      ((0 until 9).map(j => s"tok${i}_$j") ++ (0 until 3).map(j => s"alt${i}_$j")).mkString(" ")
    val corpus = ((0 until 30).map(i => (i.toLong, baseText(i))) ++
      (0 until 10).map(i => (100L + i, baseText(i))) ++
      (10 until 15).map(i => (200L + i, nearText(i)))).toDF("doc_id", "text")
    val splits = Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25)
    val labeled = graft.ext.Sampling.hashSplit(corpus, col("doc_id"), splits)
      .localCheckpoint(false)
    val lbl = labeled.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val evalDocs = labeled.filter(col("split") =!= "train")
    val trainRows = labeled.filter(col("split") === "train")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val gate = EventStreams.leakageGate(
      input.toDS().toDF("doc_id", "text"), evalDocs, "doc_id", "text", "split",
      threshold = 0.5)
    val q = gate.writeStream.format("memory").queryName("leak_gate")
      .outputMode(OutputMode.Append()).start()
    try {
      // shuffled micro-batches + one doc re-delivered in a later batch
      val shuffled = trainRows.sortBy(d => graft.ext.TextHash.hash64Local(s"arr:${d._1}"))
      shuffled.grouped(math.max(1, shuffled.length / 3)).foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      }
      input.addData(shuffled.head); q.processAllAvailable() // re-delivery
      val flags = spark.sql("SELECT doc_id, eval_id, eval_split, jaccard FROM leak_gate")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      assert(flags.length == flags.distinct.length, "re-delivery must not duplicate flags")
      // batch twin: the verified LSH pairs of the union corpus with one
      // train and one eval side — identical bands, identical verify
      val want = graft.ext.Dedup.minhashLshPairs(corpus, "doc_id", "text",
          shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .flatMap { case (a, b, j) =>
          (lbl(a), lbl(b)) match {
            case ("train", e) if e != "train" => Some((a, b, e, j))
            case (e, "train") if e != "train" => Some((b, a, e, j))
            case _ => None
          }
        }.toSet
      assert(want.nonEmpty, s"fixture must produce cross pairs (labels: $lbl)")
      assert(flags.toSet == want)
      // and the per-split counts agree with the q238 audit's cross rows
      val audit = graft.ext.Dedup.splitLeakage(corpus, "doc_id", "text",
          splits, threshold = 0.5)
        .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      for (e <- Seq("test", "val")) {
        val pair = if (e < "train") (e, "train") else ("train", e)
        val fromAudit = audit.getOrElse(pair, 0L)
        assert(flags.count(_._3 == e).toLong == fromAudit, s"split $e count")
      }
    } finally q.stop()
  }

  test("leakage gate: shingle-volume guard trips on an oversized eval index") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // 2 docs <= maxEvalDocs=2, but together they carry > 100 x 2
    // shingle hashes — the BYTE bound must trip even when the doc
    // COUNT bound passes
    val longText = (0 until 250).map(i => s"w$i").mkString(" ") // ~248 shingles
    val evalDocs = Seq((1L, longText, "test"), (2L, longText, "val"))
      .toDF("doc_id", "text", "split")
    val input = MemoryStream[(Long, String)]
    val e = intercept[IllegalArgumentException] {
      EventStreams.leakageGate(
        input.toDS().toDF("doc_id", "text"), evalDocs, "doc_id", "text", "split",
        maxEvalDocs = 2)
    }
    assert(e.getMessage.contains("shingle"), e.getMessage)
  }

  test("audio admission gate: per-clip verdicts match the batch q253 screen, re-delivery inert") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def wav(samples: Seq[Int]): Array[Byte] = {
      val header = graft.multimodal.Media.wavHeader(samples.length, 8000, 1, 16)
      header ++ samples.flatMap(s =>
        Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    }
    val good = (1L, wav(Seq.tabulate(256)(i => (i % 200) - 100)))
    val short = (2L, wav(Seq(5, -5, 5, -5)))            // 0 ms at 8 kHz
    val clipped = (3L, wav(Seq.fill(256)(32767)))       // 100% rail-pinned
    val corrupt = (4L, Array[Byte](1, 2, 3))
    val clips = Seq(good, short, clipped, corrupt)
    val input = MemoryStream[(Long, Array[Byte])]
    val gate = EventStreams.audioAdmissionGate(
      input.toDS().toDF("media_id", "payload"), "media_id", "payload",
      minDurationMs = 10L, maxClipPpm = 200000L)
    val q = gate.writeStream.format("memory").queryName("audio_gate")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(clips: _*); q.processAllAvailable()
      input.addData(good, corrupt); q.processAllAvailable() // re-delivery
      val got = spark.sql(
        "SELECT media_id, admitted, reason, duration_ms, clip_ppm FROM audio_gate")
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getBoolean(1), r.getString(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got.size == 4, "one verdict per clip, re-delivery emits nothing")
      assert(got(1L) == ((true, "ok", 32L, 0L)))
      assert(got(2L) == ((false, "too_short", 0L, 0L)))
      assert(got(3L) == ((false, "clipped", 32L, 1000000L)))
      assert(got(4L)._2 == "undecodable" && !got(4L)._1)
      // batch twin: duration/clip numbers equal the q253 screen's
      val batch = graft.multimodal.Media.audioStats(
          clips.toDF("media_id", "payload"), "media_id", "payload")
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(5), r.getLong(8) * 1000000L / r.getLong(4)))).toMap
      for (id <- Seq(1L, 2L, 3L)) {
        assert(got(id)._3 == batch(id)._1, s"duration twin for $id")
        assert(got(id)._4 == batch(id)._2, s"clip share twin for $id")
      }
    } finally q.stop()
  }

  test("boilerplate gate: verdicts twin the batch q265 stage, over-chrome + empty docs rejected") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // chunkTokens = 2; "nav bar" appears in 4 corpus docs (df >= 3)
    val corpus = Seq(
      (1L, "nav bar alpha beta gamma delta"),
      (2L, "nav bar epsilon zeta"),
      (3L, "eta theta nav bar"),
      (4L, "nav bar")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val gate = EventStreams.boilerplateGate(
      input.toDS().toDF("doc_id", "text"), corpus, "doc_id", "text",
      chunkTokens = 2, maxDf = 3, maxDroppedPpm = 500000L)
    val q = gate.writeStream.format("memory").queryName("bp_gate")
      .outputMode(OutputMode.Append()).start()
    try {
      val arrivals = Seq(
        (1L, "nav bar alpha beta gamma delta"),
        (2L, "nav bar epsilon zeta"),
        (3L, "eta theta nav bar"),
        (4L, "nav bar"),            // 100% chrome -> rejected
        (5L, ""))                   // no tokens -> rejected
      input.addData(arrivals: _*); q.processAllAvailable()
      input.addData(arrivals.take(2): _*); q.processAllAvailable() // re-delivery
      val got = spark.sql(
        "SELECT doc_id, n_chunks, n_dropped, admitted, kept_text FROM bp_gate")
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4)))).toMap
      assert(got.size == 5, "one verdict per doc, re-delivery emits nothing")
      assert(got(1L) == ((3L, 1L, true, "alpha beta gamma delta")))
      assert(got(2L) == ((2L, 1L, true, "epsilon zeta"))) // 500000 ppm boundary
      assert(got(3L) == ((2L, 1L, true, "eta theta")))
      assert(got(4L) == ((1L, 1L, false, "")))
      assert(got(5L) == ((0L, 0L, false, "")))
      // batch twin: stripped text equals the q265 stage on the corpus
      val batch = graft.ext.Dedup.frequentChunkFilter(
          corpus, "doc_id", "text", chunkTokens = 2, maxDf = 3)
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      for (id <- 1L to 4L)
        assert(got(id)._4 == batch(id), s"kept_text twin for doc $id")
    } finally q.stop()
  }

  test("video admission gate: verdicts twin the batch q269 stats, re-delivery inert") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.MediaFunctions.aviEncode
    import org.apache.spark.sql.functions.lit
    def avi(frames: Seq[Seq[Int]]): Array[Byte] =
      Seq(Tuple1(frames)).toDF("frames")
        .select(aviEncode($"frames", lit(2), lit(2)).as("p"))
        .collect().head.getAs[Array[Byte]](0)
    val mid = Seq.fill(4)(0x505050)   // luma 80
    val dark = Seq.fill(4)(0x000000)  // luma 0
    val good = (1L, avi(Seq(mid, mid, mid)))
    val short = (2L, avi(Seq(mid)))
    val black = (3L, avi(Seq(dark, dark, dark)))
    val corrupt = (4L, Array[Byte](9, 9, 9))
    val vids = Seq(good, short, black, corrupt)
    val input = MemoryStream[(Long, Array[Byte])]
    val gate = EventStreams.videoAdmissionGate(
      input.toDS().toDF("media_id", "payload"), "media_id", "payload",
      every = 2, minFrames = 2, minLuma = 16L, maxLuma = 240L)
    val q = gate.writeStream.format("memory").queryName("video_gate")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(vids: _*); q.processAllAvailable()
      input.addData(good, corrupt); q.processAllAvailable() // re-delivery
      val got = spark.sql(
        "SELECT media_id, admitted, reason, n_frames, mean_luma FROM video_gate")
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getBoolean(1), r.getString(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got.size == 4, "one verdict per video, re-delivery emits nothing")
      assert(got(1L) == ((true, "ok", 3L, 80L)))
      assert(got(2L) == ((false, "too_short", 1L, 80L)))
      assert(got(3L) == ((false, "exposure", 3L, 0L)))
      assert(got(4L)._2 == "undecodable" && !got(4L)._1)
      // batch twin: the gate's mean is the floor-mean of the q269
      // per-frame means over the same sampled frames
      val batch = graft.multimodal.Media.videoFrameStats(
          Seq(good).toDF("media_id", "payload"), "media_id", "payload", every = 2)
        .collect().map(_.getLong(5))
      assert(got(1L)._4 == batch.sum / batch.length)
    } finally q.stop()
  }

  test("streaming fingerprint: running bucket XOR equals the batch fingerprint of the fed rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val fp = EventStreams.runningFingerprint(input.toDF(), "ts",
      col("event_id"), concat_ws(":", col("event_id"), col("event_type")),
      buckets = 4, delay = "10 minutes")
    val q = fp.writeStream.format("memory").queryName("fp_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((1L to 40L).map(i =>
        ev(i, "2024-01-01 00:01:00", i, s"t${i % 3}", 1.0)): _*)
      q.processAllAvailable()
      input.addData((41L to 100L).map(i =>
        ev(i, "2024-01-01 00:02:00", i, s"t${i % 3}", 1.0)): _*)
      q.processAllAvailable()
      // latest state per bucket = the rows with the highest n_rows
      val live = spark.sql("SELECT bucket, n_rows, xor_fp FROM fp_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (b, rs) => b -> rs.maxBy(_._2) }
      val batch = graft.ext.Profile.datasetFingerprint(
          (1L to 100L).map(i => (i, s"$i:t${i % 3}")).toDF("id", "repr")
            .select(pmod(graft.ext.TextHash.hash64(col("id").cast("string")), lit(4L))
              .as("bucket"), col("repr")),
          col("bucket"), col("repr"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(live.keySet == batch.keySet)
      live.foreach { case (b, (_, n, x)) =>
        assert((n, x) == batch(b), s"bucket $b: stream=($n,$x) batch=${batch(b)}")
      }
    } finally q.stop()
  }

  test("sessionization: gap splits sessions, timeout emits them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapMs = 10 * 60 * 1000, delay = "1 minute")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two bursts separated by > gap; user 2: one burst
      input.addData(
        ev(1, "2024-01-01 00:00:00", 1, "click", 1.0),
        ev(2, "2024-01-01 00:05:00", 1, "click", 2.0),
        ev(3, "2024-01-01 00:03:00", 2, "view", 5.0))
      q.processAllAvailable()
      input.addData( // second burst for user 1, 30 min later (> 10 min gap)
        ev(4, "2024-01-01 00:35:00", 1, "click", 4.0))
      q.processAllAvailable()
      // push watermark far ahead so every open session times out
      input.addData(ev(5, "2024-01-01 02:00:00", 3, "click", 0.0))
      q.processAllAvailable()
      input.addData(ev(6, "2024-01-01 03:00:00", 3, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT userId, startTs, endTs, nEvents, total FROM sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
      assert(rows.contains((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:05:00"), 2L, 3.0)),
        s"user1 first session: ${rows.toSeq}")
      assert(rows.contains((1L, ts("2024-01-01 00:35:00"), ts("2024-01-01 00:35:00"), 1L, 4.0)))
      assert(rows.contains((2L, ts("2024-01-01 00:03:00"), ts("2024-01-01 00:03:00"), 1L, 5.0)))
    } finally q.stop()
  }

  test("file-source stream: parquet in → windowed agg → parquet out, resumes from checkpoint") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val (inDir, outDir, ckDir) = (s"$root/in", s"$root/out", s"$root/ck")

    def writeBatch(rows: Seq[EventStreams.Event]): Unit =
      rows.toDF().coalesce(1).write.mode("append").parquet(inDir)

    def runOnce(): Unit = {
      val in = EventStreams.readEventStream(spark, inDir)
        .drop("props") // schema declares props; the fixture writes without it
      val q = EventStreams.writeEventStream(
        EventStreams.tumblingCounts(in, "10 minutes", "5 minutes"), outDir, ckDir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    writeBatch(Seq(
      ev(1, "2024-01-01 00:01:00", 1, "click", 1.0),
      ev(2, "2024-01-01 00:04:00", 1, "click", 2.0),
      ev(3, "2024-01-01 00:11:00", 2, "view", 3.0)))
    runOnce()
    // second run, new file: watermark passes the earlier windows → they emit;
    // the checkpoint guarantees the first batch is not reprocessed
    writeBatch(Seq(ev(4, "2024-01-01 01:00:00", 1, "click", 4.0)))
    runOnce()

    val out = spark.read.parquet(outDir)
      .select($"win_start", $"event_type", $"n", $"total")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(out.contains((ts("2024-01-01 00:00:00"), "click", 2L, 3.0)), s"got $out")
    assert(out.contains((ts("2024-01-01 00:10:00"), "view", 1L, 3.0)), s"got $out")
  }

  test("sessionization: a cross-batch late event within the gap extends the session backward") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapMs = 10 * 60 * 1000, delay = "2 hours")
    val q = sessions.writeStream.format("memory").queryName("late_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(ev(1, "2024-01-01 01:00:00", 1, "click", 1.0))
      q.processAllAvailable()
      // late event 5 min BEFORE the open session's start (within gap):
      // must extend the session backward, not open a phantom one
      input.addData(ev(2, "2024-01-01 00:55:00", 1, "click", 2.0))
      q.processAllAvailable()
      // push the watermark far ahead so the session times out and emits
      input.addData(
        ev(3, "2024-01-01 06:00:00", 9, "click", 0.0),
        ev(4, "2024-01-01 09:00:00", 9, "click", 0.0))
      q.processAllAvailable()
      input.addData(ev(5, "2024-01-01 12:00:00", 9, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT userId, startTs, endTs, nEvents, total FROM late_sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
      assert(rows.contains((1L, ts("2024-01-01 00:55:00"), ts("2024-01-01 01:00:00"), 2L, 3.0)),
        s"backward-extended session missing: ${rows.toSeq}")
    } finally q.stop()
  }

  test("seasonal anomalies: prequential slot scoring across batches, warm-up gate, slot isolation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val scored = EventStreams.seasonalAnomalies(input.toDS(), minObs = 4L, delay = "1 hour")
    val q = scored.writeStream.format("memory").queryName("slots")
      .outputMode(OutputMode.Append()).start()
    try {
      // slot A: Mondays 01:00 (2024-01-01 is a Monday) — 4 calm weeks
      def week(k: Int, id: Long, v: Double) =
        EventStreams.Event(id, new Timestamp(
          ts("2024-01-01 01:00:00").getTime + k * 168L * 3600L * 1000L), 1L, "m", v)
      input.addData(week(0, 1, 10.0), week(1, 2, 10.2), week(2, 3, 9.8), week(3, 4, 10.0))
      q.processAllAvailable()
      // week 5: a spike in the SAME slot — warm (n=4 ≥ minObs), must flag;
      // plus a first event in a DIFFERENT slot (02:00) — cold, never flags
      input.addData(week(4, 5, 50.0),
        EventStreams.Event(6L, ts("2024-01-01 02:00:00"), 1L, "m", 50.0))
      q.processAllAvailable()
      // week 6, back to normal in slot A: the spike joined the stats but
      // 10.0 is still within 3σ of the updated mean → not anomalous
      input.addData(week(5, 7, 10.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_id, phase, is_anomaly FROM slots")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      // warm-up: the first four never flag (n < minObs when scored)
      assert((1L to 4L).forall(id => !rows(id)._2), rows)
      assert(rows(5L)._2, s"spike must flag: $rows")
      assert(!rows(6L)._2, "cold slot must stay silent")
      assert(!rows(7L)._2, s"recovery must not flag: $rows")
      // the weekly events all share one slot; the 02:00 event does not
      assert(Seq(1L, 2L, 3L, 4L, 5L, 7L).map(rows(_)._1).distinct.size == 1)
      assert(rows(6L)._1 != rows(5L)._1)
    } finally q.stop()
  }

  test("stream-stream join correlates clicks to views within the time bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[EventStreams.Event]
    val views = MemoryStream[EventStreams.Event]
    val joined = EventStreams.correlate(
      clicks.toDF(), views.toDF(), withinMs = 10 * 60 * 1000, delay = "1 minute")
    val q = joined.writeStream.format("memory").queryName("correlated")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(
        ev(1, "2024-01-01 00:00:00", 1, "click", 0.0),
        ev(2, "2024-01-01 00:30:00", 2, "click", 0.0))
      views.addData(
        ev(10, "2024-01-01 00:05:00", 1, "view", 0.0), // within 10 min of click 1
        ev(11, "2024-01-01 00:20:00", 1, "view", 0.0), // too late for click 1
        ev(12, "2024-01-01 00:29:00", 2, "view", 0.0)) // BEFORE click 2 → no match
      q.processAllAvailable()
      // advance both watermarks so matched results emit
      clicks.addData(ev(3, "2024-01-01 02:00:00", 9, "click", 0.0))
      views.addData(ev(13, "2024-01-01 02:00:00", 9, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT click_id, view_id FROM correlated")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.contains((1L, 10L)), s"got $rows")
      assert(!rows.contains((1L, 11L)), s"got $rows")
      assert(!rows.contains((2L, 12L)), s"got $rows")
    } finally q.stop()
  }

  test("foreachBatch sink: streaming upsert into a JDBC warehouse (Derby)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    System.setProperty("derby.system.home", java.nio.file.Files.createTempDirectory("derby-fb").toString)
    val url = "jdbc:derby:memory:fbdb;create=true"
    val props = new java.util.Properties()
    val input = MemoryStream[EventStreams.Event]
    val agg = EventStreams.tumblingCounts(input.toDF(), "10 minutes", "5 minutes")
    // the prod pattern for warehouse sinks: per-microbatch JDBC append
    // keyed by batchId for idempotent retries
    val q = agg.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
          .write.mode("append").jdbc(url, "win_counts", props)
        ()
      }
      .start()
    try {
      input.addData(
        ev(1, "2024-01-01 00:01:00", 1, "click", 1.0),
        ev(2, "2024-01-01 00:04:00", 1, "click", 2.0))
      q.processAllAvailable()
      input.addData(ev(3, "2024-01-01 01:00:00", 2, "view", 0.0)) // closes the window
      q.processAllAvailable()
      val stored = spark.read.jdbc(url, "win_counts", props)
      val rows = stored.select("event_type", "n", "total")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("click", 2L, 3.0)), s"got $rows")
    } finally q.stop()
  }

  test("jdbcExactlyOnceSink: replayed micro-batches never double-append (batch ledger)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("derby-xo").toString)
    val url = "jdbc:derby:memory:xodb;create=true"
    val props = new java.util.Properties()
    val ckpt = java.nio.file.Files.createTempDirectory("xo-ckpt").toString
    val input = MemoryStream[EventStreams.Event]
    val agg = EventStreams.tumblingCounts(input.toDF(), "10 minutes", "5 minutes")
    val q = EventStreams.jdbcExactlyOnceSink(agg, url, "xo_counts", props, ckpt).start()
    try {
      input.addData(
        ev(1, "2024-01-01 00:01:00", 1, "click", 1.0),
        ev(2, "2024-01-01 00:04:00", 1, "click", 2.0))
      q.processAllAvailable()
      input.addData(ev(3, "2024-01-01 01:00:00", 2, "view", 0.0)) // closes the window
      q.processAllAvailable()
    } finally q.stop()
    val stored = spark.read.jdbc(url, "xo_counts", props)
    val before = stored.count()
    assert(before > 0)
    val batchIds = stored.select("batch_id").distinct()
      .collect().map(_.getLong(0)).sorted
    // REPLAY every committed batch verbatim (the at-least-once retry):
    // the ledger must skip each one, leaving the table bit-identical
    val replayRows = spark.read.jdbc(url, "xo_counts", props).localCheckpoint()
    for (bid <- batchIds) {
      val applied = EventStreams.jdbcIdempotentAppend(
        replayRows.filter(col("batch_id") === bid).drop("batch_id"),
        bid, url, "xo_counts", props)
      assert(!applied, s"replay of committed batch $bid must be skipped")
    }
    assert(spark.read.jdbc(url, "xo_counts", props).count() == before)
    // CRASHED-attempt repair: partial rows for a NEW batch id land in
    // the table without a ledger row; the retry must wipe them and
    // apply the full batch exactly once
    val next = batchIds.max + 100
    replayRows.limit(1).withColumn("batch_id", lit(next))
      .write.mode("append").jdbc(url, "xo_counts", props) // the "crash"
    val fullBatch = replayRows.drop("batch_id") // retry carries ALL rows
    assert(EventStreams.jdbcIdempotentAppend(fullBatch, next, url, "xo_counts", props))
    val afterRepair = spark.read.jdbc(url, "xo_counts", props)
      .filter(col("batch_id") === next).count()
    assert(afterRepair == fullBatch.count(), "partial rows repaired, batch applied once")
    // and a second retry of the same id is now a no-op
    assert(!EventStreams.jdbcIdempotentAppend(fullBatch, next, url, "xo_counts", props))
  }

  test("cdcApply: change stream merges continuously into the current-state table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.cdcApply(input.toDF(), "user_id", "ts", "event_id",
      s"$dir/table", s"$dir/ckpt").start()
    try {
      // batch 1: two users; user 1 twice in ONE batch — latest version wins
      input.addData(
        ev(1, "2024-01-01 00:00:00", 1, "signup", 1.0),
        ev(2, "2024-01-01 00:05:00", 1, "upgrade", 2.0),
        ev(3, "2024-01-01 00:01:00", 2, "signup", 1.0))
      q.processAllAvailable()
      val after1 = spark.read.parquet(s"$dir/table")
        .select("user_id", "event_type", "value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(after1 == Set((1L, "upgrade", 2.0), (2L, "signup", 1.0)))
      // batch 2: update user 2, insert user 3; user 1 untouched
      input.addData(
        ev(4, "2024-01-01 01:00:00", 2, "purchase", 9.0),
        ev(5, "2024-01-01 01:01:00", 3, "signup", 1.0))
      q.processAllAvailable()
      val after2 = spark.read.parquet(s"$dir/table")
        .select("user_id", "event_type", "value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(after2 == Set(
        (1L, "upgrade", 2.0), (2L, "purchase", 9.0), (3L, "signup", 1.0)))
    } finally q.stop()
  }

  test("cdcApply: delete tombstones remove keys; in-batch upsert-then-delete deletes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc_del").toString
    val input = MemoryStream[EventStreams.Event]
    // event_type "gone" marks the tombstone op
    import org.apache.spark.sql.functions.{col, when}
    val withOp = input.toDF()
      .withColumn("op", when(col("event_type") === "gone", "D").otherwise("U"))
    val q = EventStreams.cdcApply(withOp, "user_id", "ts", "event_id",
      s"$dir/table", s"$dir/ckpt", opCol = Some("op")).start()
    try {
      input.addData(
        ev(1, "2024-01-01 00:00:00", 1, "signup", 1.0),
        ev(2, "2024-01-01 00:01:00", 2, "signup", 1.0))
      q.processAllAvailable()
      // update user 1, tombstone user 2, and user 3 appears and is
      // tombstoned within ONE batch (latest-by-key first, so it deletes)
      input.addData(
        ev(3, "2024-01-01 01:00:00", 1, "upgrade", 2.0),
        ev(4, "2024-01-01 01:01:00", 2, "gone", 0.0),
        ev(5, "2024-01-01 01:02:00", 3, "signup", 1.0),
        ev(6, "2024-01-01 01:03:00", 3, "gone", 0.0))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/table")
        .select("user_id", "event_type", "value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == Set((1L, "upgrade", 2.0)))
      // the op column never lands in the table
      assert(!spark.read.parquet(s"$dir/table").columns.contains("op"))
    } finally q.stop()
  }

  test("correlateLeftOuter: unmatched clicks emit with null views after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[EventStreams.Event]
    val views = MemoryStream[EventStreams.Event]
    val joined = EventStreams.correlateLeftOuter(
      clicks.toDF(), views.toDF(), withinMs = 60000L, delay = "10 seconds")
    val q = joined.writeStream.format("memory").queryName("louter")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1 clicks and never sees a view; user 2 clicks and converts
      clicks.addData(
        ev(1, "2024-01-01 00:00:00", 1, "click", 1.0),
        ev(2, "2024-01-01 00:00:00", 2, "click", 1.0))
      views.addData(ev(3, "2024-01-01 00:00:30", 2, "view", 1.0))
      q.processAllAvailable()
      // advance BOTH watermarks far past click_ts + window + delay so
      // the unmatched left row is provably expired and must emit
      clicks.addData(ev(8, "2024-01-01 02:00:00", 9, "click", 1.0))
      views.addData(ev(9, "2024-01-01 02:00:00", 9, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("louter")
        .select("click_id", "view_id", "user_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSet
      assert(rows.contains((2L, Some(3L), 2L)), s"matched pair missing: $rows")
      assert(rows.contains((1L, None, 1L)), s"unmatched click not emitted: $rows")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog and stops on its own") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("avnow").toString
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 2L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/in")
    val q = EventStreams.readEventStream(spark, s"$dir/in")
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow query did not self-terminate")
    assert(spark.read.parquet(s"$dir/out").count() == 2)
  }

  test("staticKeyGate: stream rows matching the static block-list never reach the sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val blocked = Seq(2L, 4L).toDF("user_id")
    val input = MemoryStream[EventStreams.Event]
    val gated = EventStreams.staticKeyGate(input.toDF(), blocked, "user_id")
    val q = gated.writeStream.format("memory").queryName("gated")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        ev(1, "2024-01-01 00:01:00", 1, "click", 1.0),
        ev(2, "2024-01-01 00:02:00", 2, "click", 1.0),
        ev(3, "2024-01-01 00:03:00", 3, "click", 1.0))
      q.processAllAvailable()
      // second micro-batch re-plans the same static side
      input.addData(
        ev(4, "2024-01-01 00:04:00", 4, "click", 1.0),
        ev(5, "2024-01-01 00:05:00", 5, "click", 1.0))
      q.processAllAvailable()
      val seen = spark.sql("SELECT event_id FROM gated").as[Long].collect().sorted
      assert(seen.toSeq == Seq(1L, 3L, 5L))
      // allow-list mode keeps exactly the complement
      val input2 = MemoryStream[EventStreams.Event]
      val kept = EventStreams.staticKeyGate(input2.toDF(), blocked, "user_id", keep = true)
      val q2 = kept.writeStream.format("memory").queryName("kept")
        .outputMode(OutputMode.Append()).start()
      try {
        input2.addData(
          ev(1, "2024-01-01 00:01:00", 1, "click", 1.0),
          ev(2, "2024-01-01 00:02:00", 2, "click", 1.0),
          ev(4, "2024-01-01 00:03:00", 4, "click", 1.0))
        q2.processAllAvailable()
        assert(spark.sql("SELECT event_id FROM kept").as[Long].collect().sorted.toSeq ==
          Seq(2L, 4L))
      } finally q2.stop()
    } finally q.stop()
  }

  test("the same tumblingCounts function runs in batch mode (stream/batch unification)") {
    import spark.implicits._
    val batch = Seq(
      ev(1, "2024-01-01 00:01:00", 1, "click", 1.0),
      ev(2, "2024-01-01 00:04:00", 1, "click", 2.0),
      ev(3, "2024-01-01 00:11:00", 2, "view", 3.0)).toDF()
    val out = EventStreams.tumblingCounts(batch, "10 minutes", "5 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set(
      (ts("2024-01-01 00:00:00"), "click", 2L, 3.0),
      (ts("2024-01-01 00:10:00"), "view", 1L, 3.0)))
  }

  test("gapAlerts: one alert per silence episode; an in-deadline event re-arms silently") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val alerts = EventStreams.gapAlerts(
      input.toDS(), silenceMs = 30 * 60 * 1000, delay = "1 minute")
    val q = alerts.writeStream.format("memory").queryName("gap_alerts")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:00:00", 1, "view", 0.0),
        ev(2, "2024-01-01 10:00:00", 2, "view", 0.0))
      q.processAllAvailable()
      // user 1 speaks again BEFORE its 10:30 deadline — re-arms, no
      // alert; the batch's watermark (10:59) crosses user 2's deadline
      input.addData(ev(3, "2024-01-01 11:00:00", 1, "view", 0.0))
      q.processAllAvailable()
      // advance the watermark past user 1's re-armed 11:30 deadline
      input.addData(ev(4, "2024-01-01 13:00:00", 3, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT userId, lastTs, deadlineTs FROM gap_alerts")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
      assert(rows == Set(
        (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
        (1L, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:30:00"))),
        s"got $rows")
    } finally q.stop()
  }
}
