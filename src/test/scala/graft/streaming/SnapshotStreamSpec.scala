package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.etl.SnapshotStore

/** The snapshot store as a registered Structured Streaming source:
  * version offsets, checkpointed exactly-once delivery across query
  * restarts, O(increment) append batches, and the onOverwrite policy.
  */
class SnapshotStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.GraftSession.local("snapstream-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def tmp(): String = Files.createTempDirectory("graft-snapstream").toString

  private def frame(ids: Range, tag: String) = {
    import spark.implicits._
    ids.map(i => (i.toLong, tag)).toDF("id", "tag")
  }

  /** Drain everything currently committed into a parquet sink, then
    * stop — one AvailableNow run against a shared checkpoint.
    */
  private def drain(root: String, out: String, cp: String,
      onOverwrite: String = "fail"): Unit = {
    val q = spark.readStream.format("graft-snapshot")
      .option("path", root).option("onOverwrite", onOverwrite)
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("format resolves by short name and pins the manifest schema") {
    val root = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(frame(1 to 3, "v0"))
    val stream = spark.readStream.format("graft-snapshot").option("path", root).load()
    assert(stream.isStreaming)
    assert(stream.schema.fieldNames.toSeq == Seq("id", "tag"))
  }

  test("checkpointed AvailableNow runs deliver each version exactly once across restarts") {
    import spark.implicits._
    val root = tmp(); val out = tmp(); val cp = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(frame(1 to 3, "v0"))
    store.commitAppend(frame(10 to 11, "v1"))
    // run 1: everything committed so far
    drain(root, out, cp)
    assert(spark.read.parquet(out).count() == 5L)
    // run 2: nothing new -> nothing re-delivered (offsets held the line)
    drain(root, out, cp)
    assert(spark.read.parquet(out).count() == 5L)
    // a new append lands; run 3 delivers ONLY its rows
    store.commitAppend(frame(20 to 20, "v2"))
    drain(root, out, cp)
    val got = spark.read.parquet(out)
    assert(got.count() == 6L)
    assert(got.groupBy("tag").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("v0", 3L), ("v1", 2L), ("v2", 1L)))
    assert(got.filter($"tag" === "v2").select("id").head().getLong(0) == 20L)
  }

  test("an overwrite fails the append-only stream loudly by default") {
    val root = tmp(); val out = tmp(); val cp = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(frame(1 to 2, "v0"))
    drain(root, out, cp)
    store.commitOverwrite(frame(1 to 4, "v1")) // table rewrite
    val e = intercept[StreamingQueryException] { drain(root, out, cp) }
    assert(e.getCause.getMessage.contains("not an append"))
  }

  test("onOverwrite=emitNew re-emits the replacing snapshot instead of failing") {
    val root = tmp(); val out = tmp(); val cp = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(frame(1 to 2, "v0"))
    drain(root, out, cp, onOverwrite = "emitNew")
    store.commitOverwrite(frame(5 to 8, "v1"))
    drain(root, out, cp, onOverwrite = "emitNew")
    val got = spark.read.parquet(out)
    assert(got.count() == 6L) // 2 from v0 + the 4 replacing rows
    assert(got.groupBy("tag").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("v0", 2L), ("v1", 4L)))
  }

  test("batch read by format equals the store API, and versionAsOf time-travels") {
    import spark.implicits._
    val root = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(frame(1 to 5, "v0"))
    store.commitAppend(frame(6 to 8, "v1"))
    val latest = spark.read.format("graft-snapshot").option("path", root).load()
    assert(latest.count() == 8L)
    assert(latest.orderBy("id").collect().toSeq ==
      store.read(spark).orderBy("id").collect().toSeq)
    val v0 = spark.read.format("graft-snapshot")
      .option("path", root).option("versionAsOf", "0").load()
    assert(v0.count() == 5L &&
      v0.select("tag").distinct().head().getString(0) == "v0")
    // timestamp time travel: "now" resolves to the latest version
    val byTime = spark.read.format("graft-snapshot")
      .option("path", root)
      .option("timestampAsOf", java.time.Instant.now().toString).load()
    assert(byTime.count() == 8L)
    val both = intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot").option("path", root)
        .option("versionAsOf", "0")
        .option("timestampAsOf", java.time.Instant.now().toString).load()
    }
    assert(both.getMessage.contains("mutually exclusive"))
  }

  test("_metadata.file_modification_time through the file index reports the commit timestamp, not epoch 0") {
    import spark.implicits._
    val root = tmp()
    val store = new SnapshotStore(root)
    val before = System.currentTimeMillis()
    store.commitOverwrite(frame(1 to 5, "v0"))
    val after = System.currentTimeMillis()
    // manifest-synthesized FileStatus (size recorded -> no listing round
    // trip) must carry the version's commit #ts: it is a queryable
    // metadata column, and epoch 0 is a lie
    val mts = spark.read.format("graft-snapshot").option("path", root).load()
      .select(org.apache.spark.sql.functions.col("_metadata.file_modification_time"))
      .distinct().collect().map(_.getTimestamp(0).getTime)
    assert(mts.nonEmpty && mts.forall(t => t >= before - 1000 && t <= after + 1000),
      s"file_modification_time must be the commit ts (got ${mts.mkString(",")})")
  }

  test("batch format prunes files at planning time from the query's own predicates") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val root = tmp()
    val store = new SnapshotStore(root)
    val data = (1L to 8000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(8, org.apache.spark.sql.functions.col("id"))
    store.commitOverwrite(data, statsColumn = Some("id"))

    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
      scans.map(_.metrics("numFiles").value).sum
    }
    val all = spark.read.format("graft-snapshot").option("path", root).load()
    assert(scannedFiles(all) == 8L)
    // an ordinary .filter — no readRange cooperation — skips files
    val slice = all.filter($"id".between(2500L, 2600L))
    assert(slice.count() == 101L)
    assert(scannedFiles(all.filter($"id".between(2500L, 2600L))) < 8L,
      "manifest stats must prune non-intersecting files at planning time")
    // point lookup: one file
    assert(scannedFiles(all.filter($"id" === 4242L)) == 1L)
    // a predicate on a non-stats column prunes nothing but stays exact
    assert(scannedFiles(all.filter($"v" === "v77")) == 8L)
    assert(all.filter($"v" === "v77").count() == 1L)
  }

  test("file-index bounds folding handles conjuncts, flipped operands and IN-lists") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference,
      EqualTo, GreaterThan, In, LessThanOrEqual, Literal}
    import org.apache.spark.sql.types.LongType
    val root = tmp()
    val store = new SnapshotStore(root)
    import spark.implicits._
    val data = (1L to 4000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, org.apache.spark.sql.functions.col("id"))
    store.commitOverwrite(data, statsColumn = Some("id"))
    val index = new SnapshotFileIndex(spark, store)
    val id = AttributeReference("id", LongType)()
    def files(filters: org.apache.spark.sql.catalyst.expressions.Expression*): Int =
      index.listFiles(Nil, filters).head.files.length
    assert(files() == 4)
    assert(files(GreaterThan(id, Literal(3500L))) == 1)          // tail file only
    assert(files(LessThanOrEqual(Literal(3500L), id)) == 1)      // flipped operands
    assert(files(GreaterThan(id, Literal(900L)),
                 LessThanOrEqual(id, Literal(1100L))) == 2)      // straddles a boundary
    assert(files(EqualTo(id, Literal(2L))) == 1)
    assert(files(In(id, Seq(Literal(5L), Literal(7L)))) == 1)
    // contradictory bounds -> empty scan, not an error
    assert(files(GreaterThan(id, Literal(5000L))) == 0)
    // unrecognized conjunct alone prunes nothing
    assert(files(EqualTo(AttributeReference("v", LongType)(), Literal(1L))) == 4)
  }

  test("batch write by format: overwrite/append/mergeSchema/statsColumn/ErrorIfExists/Ignore") {
    import spark.implicits._
    val root = tmp()
    val store = new SnapshotStore(root)
    frame(1 to 4, "v0").write.format("graft-snapshot")
      .option("path", root).mode("overwrite").save()
    assert(store.read(spark).count() == 4L)
    frame(5 to 6, "v1").write.format("graft-snapshot")
      .option("path", root).mode("append").save()
    assert(store.versions == Seq(0L, 1L) && store.read(spark).count() == 6L)
    // evolving append through the option
    Seq((7L, "v2", "en")).toDF("id", "tag", "lang")
      .write.format("graft-snapshot").option("path", root)
      .option("mergeSchema", "true").mode("append").save()
    assert(store.read(spark).schema.fieldNames.toSeq == Seq("id", "tag", "lang"))
    assert(store.read(spark).filter($"lang".isNull).count() == 6L)
    // ErrorIfExists refuses a live table; Ignore is a no-op on one
    val e = intercept[IllegalStateException] {
      frame(1 to 1, "x").write.format("graft-snapshot")
        .option("path", root).mode("errorifexists").save()
    }
    assert(e.getMessage.contains("already has committed versions"))
    frame(1 to 9, "x").write.format("graft-snapshot")
      .option("path", root).mode("ignore").save()
    assert(store.read(spark).count() == 7L) // unchanged
    // statsColumn at write time feeds the reader's planning-time pruning
    val root2 = tmp()
    (1L to 4000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, org.apache.spark.sql.functions.col("id"))
      .write.format("graft-snapshot").option("path", root2)
      .option("statsColumn", "id").mode("overwrite").save()
    val pruned = new SnapshotStore(root2).readRange(spark, "id", 1L, 10L)
    assert(pruned.inputFiles.length == 1 && pruned.count() == 10L)
  }

  test("streaming sink commits each micro-batch as a version; batch-id replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmp(); val cp = tmp()
    val store = new SnapshotStore(root)
    // e2e happy path: two micro-batches -> two versions
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "tag")
      .writeStream.format("graft-snapshot")
      .option("path", root).option("checkpointLocation", cp)
      .outputMode("append").start()
    try {
      input.addData((1L, "a"), (2L, "a")); q.processAllAvailable()
      input.addData((3L, "b")); q.processAllAvailable()
    } finally q.stop()
    assert(store.versions.length == 2 && store.read(spark).count() == 3L)
    assert(store.lastTxn().contains(1L))
    // engine-style replay of an already-committed batch id: NO new version
    val sink = new SnapshotStreamSink(store,
      org.apache.spark.sql.streaming.OutputMode.Append(), None, false)
    sink.addBatch(1L, frame(90 to 99, "dup"))
    assert(store.versions.length == 2 && store.read(spark).count() == 3L)
    // a genuinely new batch id commits
    sink.addBatch(2L, frame(4 to 4, "c"))
    assert(store.versions.length == 3 && store.read(spark).count() == 4L)
  }

  test("streaming sink in Complete mode publishes each result as a full replace") {
    val root = tmp()
    val store = new SnapshotStore(root)
    val sink = new SnapshotStreamSink(store,
      org.apache.spark.sql.streaming.OutputMode.Complete(), None, false)
    sink.addBatch(0L, frame(1 to 5, "agg0"))
    sink.addBatch(1L, frame(1 to 2, "agg1"))
    assert(store.read(spark).count() == 2L) // latest result, not a union
    assert(store.read(spark, Some(0L)).count() == 5L) // history intact
  }

  test("a compaction mid-stream is invisible: default fail-on-rewrite stream delivers nothing and keeps going") {
    import spark.implicits._
    val root = tmp(); val out = tmp(); val cp = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(frame(1 to 3, "v0"))
    store.commitAppend(frame(4 to 6, "v1"))
    drain(root, out, cp) // position the stream past v1
    assert(spark.read.parquet(out).count() == 6L)
    // routine maintenance: compaction is NOT a data change...
    store.compactLatest(spark, targetFiles = 1)
    // ...so the strict append-only stream neither fails nor re-delivers
    drain(root, out, cp)
    assert(spark.read.parquet(out).count() == 6L)
    // and a later append still flows
    store.commitAppend(frame(7 to 7, "v2"))
    drain(root, out, cp)
    assert(spark.read.parquet(out).count() == 7L)
    assert(spark.read.parquet(out).filter($"tag" === "v2").count() == 1L)
    // the sink's txn marker survives a compaction of its table
    val sroot = tmp()
    val sstore = new SnapshotStore(sroot)
    val sink = new SnapshotStreamSink(sstore,
      org.apache.spark.sql.streaming.OutputMode.Append(), None, false)
    sink.addBatch(0L, frame(1 to 2, "b0"))
    sstore.compactLatest(spark, targetFiles = 1)
    assert(sstore.lastTxn().contains(0L))
    sink.addBatch(0L, frame(50 to 59, "dup")) // replay after compaction: still a no-op
    assert(sstore.read(spark).count() == 2L)
  }

  test("a vacuumed version inside the stream's range fails loudly with the recovery recipe") {
    val root = tmp(); val out = tmp(); val cp = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(frame(1 to 2, "v0"))
    drain(root, out, cp) // checkpointed at v0
    store.commitAppend(frame(3 to 3, "v1"))
    store.commitAppend(frame(4 to 4, "v2"))
    store.vacuum(keepLast = 1) // v0, v1 gone; stream is positioned at v0
    val e = intercept[StreamingQueryException] { drain(root, out, cp) }
    assert(e.getCause.getMessage.contains("were vacuumed"))
    assert(e.getCause.getMessage.contains("startingVersion=1"),
      e.getCause.getMessage) // earliest surviving is v2 -> recipe says 1
    // and the recipe works: a FRESH stream from startingVersion=1 gets
    // the earliest surviving version as its initial snapshot
    val out2 = tmp(); val cp2 = tmp()
    val q = spark.readStream.format("graft-snapshot")
      .option("path", root).option("startingVersion", "1").load()
      .writeStream.format("parquet")
      .option("path", out2).option("checkpointLocation", cp2)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(out2).count() == 4L) // full v2 snapshot
  }

  test("two sinks with distinct txnAppIds keep independent idempotence ledgers") {
    val root = tmp()
    val store = new SnapshotStore(root)
    val a = new SnapshotStreamSink(store,
      org.apache.spark.sql.streaming.OutputMode.Append(), None, false, "appA")
    val b = new SnapshotStreamSink(store,
      org.apache.spark.sql.streaming.OutputMode.Append(), None, false, "appB")
    a.addBatch(0L, frame(1 to 2, "a0"))
    // B's batch 0 must NOT be skipped by A's marker
    b.addBatch(0L, frame(10 to 10, "b0"))
    assert(store.read(spark).count() == 3L)
    // replays stay per-app no-ops
    a.addBatch(0L, frame(90 to 99, "dupA"))
    b.addBatch(0L, frame(90 to 99, "dupB"))
    assert(store.read(spark).count() == 3L)
    assert(store.lastTxn("appA").contains(0L) && store.lastTxn("appB").contains(0L))
    // interleaved progress: A@1 then B@1, both land, both ledgers advance
    a.addBatch(1L, frame(3 to 3, "a1"))
    b.addBatch(1L, frame(11 to 11, "b1"))
    assert(store.read(spark).count() == 5L)
    assert(store.lastTxn("appA").contains(1L) && store.lastTxn("appB").contains(1L))
  }

  test("SQL surface: CREATE TABLE ... USING graft-snapshot reads through the catalog") {
    val root = tmp()
    new SnapshotStore(root).commitOverwrite(frame(1 to 6, "sql"))
    spark.sql(s"CREATE TABLE snap_sql USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_sql").head().getLong(0) == 6L)
      assert(spark.sql("SELECT SUM(id) AS s FROM snap_sql WHERE tag = 'sql'")
        .head().getLong(0) == 21L)
    } finally spark.sql("DROP TABLE snap_sql")
  }

  private def nBatches(cp: String): Int = {
    val d = java.nio.file.Paths.get(cp, "offsets")
    if (!Files.isDirectory(d)) 0
    else {
      val s = Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(p =>
          p.getFileName.toString.forall(_.isDigit))
      } finally s.close()
    }
  }

  test("maxVersionsPerTrigger bounds catch-up batches; exactly-once survives a mid-catch-up restart") {
    import spark.implicits._
    val root = tmp(); val out = tmp(); val cp = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(frame(1 to 3, "v0"))
    store.commitAppend(frame(10 to 11, "v1"))
    store.commitAppend(frame(20 to 20, "v2"))
    def capped(trigger: Trigger) = {
      val q = spark.readStream.format("graft-snapshot")
        .option("path", root).option("maxVersionsPerTrigger", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(trigger).start()
      if (trigger == Trigger.Once()) q.awaitTermination()
      else { q.processAllAvailable(); q.stop(); q.awaitTermination() }
    }
    // run 1: ONE trigger (Trigger.Once) admits exactly ONE version
    capped(Trigger.Once())
    assert(nBatches(cp) == 1, s"one capped batch expected, got ${nBatches(cp)}")
    assert(spark.read.parquet(out).count() == 3L, "only v0's rows in batch 0")
    // restart MID-CATCH-UP: the backlog keeps paying out one version
    // per batch, nothing re-delivered, nothing skipped
    capped(Trigger.ProcessingTime(0))
    assert(nBatches(cp) == 3, s"3 versions -> 3 batches total, got ${nBatches(cp)}")
    val got = spark.read.parquet(out)
    assert(got.count() == 6L)
    assert(got.groupBy("tag").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("v0", 3L), ("v1", 2L), ("v2", 1L)))
    // caught up: another run delivers nothing new
    capped(Trigger.ProcessingTime(0))
    assert(spark.read.parquet(out).count() == 6L)
    // and new appends keep flowing under the cap
    store.commitAppend(frame(30 to 31, "v3"))
    store.commitAppend(frame(40 to 40, "v4"))
    capped(Trigger.ProcessingTime(0))
    assert(nBatches(cp) == 5)
    assert(spark.read.parquet(out).count() == 9L)
  }

  test("maxBytesPerTrigger stops extending a batch once the added bytes exceed the budget") {
    val root = tmp(); val out = tmp(); val cp = tmp()
    val store = new SnapshotStore(root)
    (0 until 4).foreach(r => store.commitAppend(frame(r * 10 to r * 10 + 5, s"v$r")))
    // a 1-byte budget admits exactly one version per trigger (always at
    // least one -> the stream still progresses)
    val q = spark.readStream.format("graft-snapshot")
      .option("path", root).option("maxBytesPerTrigger", "1")
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    assert(nBatches(cp) == 4, s"4 versions at 1 byte/trigger -> 4 batches, got ${nBatches(cp)}")
    assert(spark.read.parquet(out).count() == 24L)
    // a huge budget takes everything in one batch
    val out2 = tmp(); val cp2 = tmp()
    val q2 = spark.readStream.format("graft-snapshot")
      .option("path", root).option("maxBytesPerTrigger", (1L << 40).toString)
      .load()
      .writeStream.format("parquet")
      .option("path", out2).option("checkpointLocation", cp2)
      .trigger(Trigger.ProcessingTime(0)).start()
    q2.processAllAvailable(); q2.stop(); q2.awaitTermination()
    assert(nBatches(cp2) == 1)
    assert(spark.read.parquet(out2).count() == 24L)
  }

  test("SQL INSERT INTO / INSERT OVERWRITE commit manifest versions through the catalog") {
    import spark.implicits._
    val root = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(frame(1 to 3, "v0"))
    spark.sql(s"CREATE TABLE snap_ins USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      // INSERT INTO appends as ONE new version (positional, with coercion:
      // int literals land in the bigint column)
      spark.sql("INSERT INTO snap_ins VALUES (100, 'ins'), (101, 'ins')")
      assert(store.versions == Seq(0L, 1L), "one INSERT = one version")
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_ins").head().getLong(0) == 5L)
      assert(spark.sql("SELECT SUM(id) AS s FROM snap_ins WHERE tag = 'ins'")
        .head().getLong(0) == 201L)
      // the store API sees the same table (no bare files written around
      // the manifest)
      assert(store.read(spark).count() == 5L)
      val referenced = store.read(spark).inputFiles.length
      val onDisk = {
        val w = Files.walk(java.nio.file.Paths.get(root, "data"))
        try {
          import scala.jdk.CollectionConverters._
          w.iterator().asScala.count(p =>
            Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        } finally w.close()
      }
      assert(onDisk == referenced,
        s"INSERT must not strand unmanaged files: $onDisk on disk, $referenced referenced")
      // INSERT INTO ... SELECT
      spark.sql("INSERT INTO snap_ins SELECT id + 1000, 'sel' FROM snap_ins WHERE tag = 'v0'")
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_ins").head().getLong(0) == 8L)
      // INSERT OVERWRITE replaces as a new version; history stays readable
      spark.sql("INSERT OVERWRITE snap_ins VALUES (7, 'ow')")
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_ins").head().getLong(0) == 1L)
      assert(store.read(spark, Some(1L)).count() == 5L, "time travel intact")
      // change feed saw the SQL commits like any others
      assert(store.readChanges(spark, 0L, Some(1L))
        .select("tag").distinct().head().getString(0) == "ins")
      // column-count mismatch fails loudly, committing nothing
      val before = store.versions.length
      intercept[Exception] { spark.sql("INSERT INTO snap_ins VALUES (1)") }
      assert(store.versions.length == before)
    } finally spark.sql("DROP TABLE snap_ins")
  }

  test("partitioned format read: WHERE day = x plans only that day's files; partition + stats pruning compose") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val root = tmp()
    val store = new SnapshotStore(root)
    // 4 days × 2 files per day (range-clustered on id inside each day)
    val df = (1 to 4).flatMap(d =>
      (1L to 2000L).map(i => (d * 10000L + i, d))).toDF("id", "day")
      .repartitionByRange(8, org.apache.spark.sql.functions.col("day"),
        org.apache.spark.sql.functions.col("id"))
    store.commitOverwrite(df, statsColumn = Some("id"), partitionBy = Seq("day"))
    val perDay = store.readFullManifest(0L).entries
      .groupBy(e => store.partitionTupleOf(e.path, Seq("day"))).map(_._2.size)
    assert(perDay.sum == store.read(spark).inputFiles.length)

    def scanned(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      df.collect()
      val s = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f }.head
      (s.metrics("numFiles").value, df.count())
    }
    val all = spark.read.format("graft-snapshot").option("path", root).load()
    assert(all.count() == 8000L)
    assert(all.schema.fieldNames.toSeq == Seq("id", "day"))
    val total = all.inputFiles.length.toLong
    // partition pruning: one day's files only
    val day2Files = store.readFullManifest(0L).entries.count(e =>
      store.partitionTupleOf(e.path, Seq("day")) == Seq("2"))
    val (nf2, n2) = scanned(all.filter($"day" === 2))
    assert(n2 == 2000L)
    assert(nf2 == day2Files.toLong,
      s"WHERE day=2 must plan exactly that day's $day2Files files, planned $nf2")
    assert(nf2 < total)
    // partition + manifest-stats pruning compose: day filter picks the
    // partition, the id range then drops files inside it
    val (nfBoth, nBoth) = scanned(
      all.filter($"day" === 2 && $"id".between(20001L, 20050L)))
    assert(nBoth == 50L)
    assert(nfBoth <= nf2)
    // IS NULL / other-day filters stay exact
    assert(all.filter($"day" === 9).count() == 0L)
    // SQL through the catalog sees and prunes partitions too
    spark.sql(s"CREATE TABLE snap_part USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_part WHERE day = 3")
        .head().getLong(0) == 2000L)
      assert(spark.sql(
        "SELECT CAST(SUM(id) AS BIGINT) AS s FROM snap_part WHERE day = 1 AND id <= 10005")
        .head().getLong(0) == (10001L to 10005L).sum)
    } finally spark.sql("DROP TABLE snap_part")
  }

  test("SQL DELETE/UPDATE/MERGE are copy-on-write manifest commits with time travel intact") {
    import spark.implicits._
    val root = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(
      (1L to 8000L).map(i => (i, s"v$i")).toDF("id", "v")
        .repartitionByRange(8, org.apache.spark.sql.functions.col("id")),
      statsColumn = Some("id"))
    val basePaths = store.readFullManifest(0L).entries.map(_.path).toSet
    spark.sql(s"CREATE TABLE snap_dml USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      // DELETE: one version, banded predicate touches few files (CoW)
      spark.sql("DELETE FROM snap_dml WHERE id BETWEEN 100 AND 150 AND v IS NOT NULL")
      assert(store.versions == Seq(0L, 1L))
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_dml").head().getLong(0) == 7949L)
      val afterDelete = store.readFullManifest(1L).entries.map(_.path).toSet
      assert(afterDelete.intersect(basePaths).size >= 6,
        "banded DELETE must rewrite only stats-intersecting files")
      // UPDATE: assignments may reference other columns; NULL-safe WHERE
      spark.sql("UPDATE snap_dml SET v = concat(v, '!') WHERE id % 1000 = 7")
      assert(store.versions.length == 3)
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_dml WHERE v LIKE '%!'")
        .head().getLong(0) == 8L)
      // MERGE: canonical upsert (update a key, insert a new one)
      spark.sql("""
        MERGE INTO snap_dml USING
          (SELECT CAST(4242 AS BIGINT) AS id, 'merged' AS v
           UNION ALL SELECT 900001, 'inserted') s
        ON snap_dml.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      assert(store.versions.length == 4)
      assert(spark.sql("SELECT v FROM snap_dml WHERE id = 4242").head().getString(0) == "merged")
      assert(spark.sql("SELECT v FROM snap_dml WHERE id = 900001").head().getString(0) == "inserted")
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_dml").head().getLong(0) == 7950L)
      // every pre-DML version still reads as committed
      assert(store.read(spark, Some(0L)).count() == 8000L)
      assert(store.read(spark, Some(0L)).filter($"id" === 120L).count() == 1L)
      // the change feed saw three row-level commits, touched files only
      val feed = store.readChanges(spark, 0L)
      assert(feed.filter($"_change_type" === "insert" && $"v" === "merged").count() == 1L)
      // unsupported shapes fail loudly, committing nothing
      val before = store.versions.length
      val e1 = intercept[Exception] {
        spark.sql("DELETE FROM snap_dml WHERE id IN (SELECT id FROM snap_dml WHERE v = 'x')")
      }
      assert(e1.getMessage.contains("subqueries"))
      val e3 = intercept[Exception] {
        spark.sql("""MERGE INTO snap_dml USING (SELECT CAST(1 AS BIGINT) AS id, 'x' AS v) s
          ON snap_dml.id > s.id
          WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
      }
      assert(e3.getMessage.contains("equi-conditions"))
      assert(store.versions.length == before, "failed DML must commit nothing")
    } finally spark.sql("DROP TABLE snap_dml")
  }

  test("SQL MERGE general clauses: an op-coded change log lands as ONE CoW commit, equal to its sequential replay") {
    import spark.implicits._
    val root = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(
      (1L to 2000L).map(i => (i, s"v$i")).toDF("id", "v")
        .repartitionByRange(8, org.apache.spark.sql.functions.col("id")),
      statsColumn = Some("id"))
    spark.sql(s"CREATE TABLE snap_gm USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      // op-coded CDC batch: delete an existing key, update one, insert a
      // new one, delete an ABSENT one (must be a no-op), and an update
      // arriving for an absent key (falls to the INSERT arm)
      spark.sql("""
        MERGE INTO snap_gm USING (
          SELECT CAST(5 AS BIGINT) AS id, CAST(NULL AS STRING) AS nv, 'D' AS op
          UNION ALL SELECT 7, 'u7', 'U'
          UNION ALL SELECT 900001, 'new1', 'U'
          UNION ALL SELECT 900002, 'ghost', 'D'
        ) s
        ON snap_gm.id = s.id
        WHEN MATCHED AND s.op = 'D' THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.nv
        WHEN NOT MATCHED AND s.op = 'U' THEN INSERT (id, v) VALUES (s.id, s.nv)""")
      assert(store.versions == Seq(0L, 1L), "one statement = one version")
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_gm").head().getLong(0) == 2000L,
        "-1 delete +1 insert; the ghost delete and its non-insert op are no-ops")
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_gm WHERE id = 5").head().getLong(0) == 0L)
      assert(spark.sql("SELECT v FROM snap_gm WHERE id = 7").head().getString(0) == "u7")
      assert(spark.sql("SELECT v FROM snap_gm WHERE id = 900001").head().getString(0) == "new1")
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_gm WHERE id = 900002").head().getLong(0) == 0L)
      // equals the sequential replay of the same ops as separate statements
      val replay = new SnapshotStore(tmp())
      replay.commitOverwrite(
        (1L to 2000L).map(i => (i, s"v$i")).toDF("id", "v")
          .repartitionByRange(8, org.apache.spark.sql.functions.col("id")),
        statsColumn = Some("id"))
      replay.deleteWhere(spark, $"id" === 5L)
      replay.updateWhere(spark, $"id" === 7L,
        Map("v" -> org.apache.spark.sql.functions.lit("u7")))
      replay.commitAppend(Seq((900001L, "new1")).toDF("id", "v").coalesce(1))
      assert(store.read(spark).orderBy("id").collect().toSeq ==
        replay.read(spark).orderBy("id").collect().toSeq)
      // a TWO-SIDED condition (t.v <> s.nv) gates the update arm
      spark.sql("""
        MERGE INTO snap_gm USING (
          SELECT CAST(7 AS BIGINT) AS id, 'u7' AS nv
          UNION ALL SELECT 8, 'u8'
        ) s
        ON snap_gm.id = s.id
        WHEN MATCHED AND snap_gm.v <> s.nv THEN UPDATE SET v = s.nv""")
      assert(spark.sql("SELECT v FROM snap_gm WHERE id = 8").head().getString(0) == "u8")
      assert(spark.sql("SELECT v FROM snap_gm WHERE id = 7").head().getString(0) == "u7")
      // partial INSERT null-pads unassigned columns
      spark.sql("""
        MERGE INTO snap_gm USING (SELECT CAST(900005 AS BIGINT) AS id) s
        ON snap_gm.id = s.id
        WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id)""")
      assert(spark.sql("SELECT v FROM snap_gm WHERE id = 900005").head().isNullAt(0))
      // cardinality violation: duplicate source keys fail loudly, committing nothing
      val before = store.versions.length
      val e = intercept[Exception] {
        spark.sql("""
          MERGE INTO snap_gm USING (
            SELECT CAST(7 AS BIGINT) AS id, 'a' AS nv
            UNION ALL SELECT 7, 'b') s
          ON snap_gm.id = s.id
          WHEN MATCHED THEN UPDATE SET v = s.nv""")
      }
      assert(e.getMessage.contains("cardinality"))
      assert(store.versions.length == before)
    } finally spark.sql("DROP TABLE snap_gm")
    // candidate pruning on the general path: against a freshly
    // range-clustered table, a narrow-key conditional MERGE must keep
    // most base files by identity (the earlier table had been fully
    // rewritten by a merge spanning the whole key range — honest CoW)
    val root2 = tmp()
    val store2 = new SnapshotStore(root2)
    store2.commitOverwrite(
      (1L to 2000L).map(i => (i, s"v$i")).toDF("id", "v")
        .repartitionByRange(8, org.apache.spark.sql.functions.col("id")),
      statsColumn = Some("id"))
    spark.sql(s"CREATE TABLE snap_gm2 USING `graft-snapshot` OPTIONS (path '$root2')")
    try {
      spark.sql("""
        MERGE INTO snap_gm2 USING (SELECT CAST(42 AS BIGINT) AS id, 'x' AS nv) s
        ON snap_gm2.id = s.id
        WHEN MATCHED AND snap_gm2.v <> s.nv THEN UPDATE SET v = s.nv
        WHEN MATCHED THEN DELETE""")
      assert(spark.sql("SELECT v FROM snap_gm2 WHERE id = 42").head().getString(0) == "x")
      val prevPaths = store2.readFullManifest(0L).entries.map(_.path).toSet
      val curPaths = store2.readFullManifest(1L).entries.map(_.path).toSet
      assert(prevPaths.intersect(curPaths).size >= 6,
        "a 1-key general MERGE must rewrite only stats-intersecting files")
    } finally spark.sql("DROP TABLE snap_gm2")
  }

  test("SQL time travel: VERSION AS OF / TIMESTAMP AS OF resolve onto the format's pinned manifests") {
    import spark.implicits._
    val root = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(frame(1 to 100, "v0"))
    Thread.sleep(1100)
    val betweenMillis = System.currentTimeMillis()
    Thread.sleep(1100)
    store.commitAppend(frame(200 to 204, "v1"))
    spark.sql(s"CREATE TABLE snap_tt USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      // VERSION AS OF ≡ the option-based read, through plain SQL text
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_tt VERSION AS OF 0")
        .head().getLong(0) == 100L)
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_tt VERSION AS OF 1")
        .head().getLong(0) == 105L)
      assert(spark.sql(
        "SELECT CAST(SUM(id) AS BIGINT) AS s FROM snap_tt VERSION AS OF 0")
        .head().getLong(0) ==
        spark.read.format("graft-snapshot").option("path", root)
          .option("versionAsOf", "0").load()
          .agg(org.apache.spark.sql.functions.sum($"id")).head().getLong(0))
      // ...and the FOR SYSTEM_VERSION spelling
      assert(spark.sql(
        "SELECT COUNT(*) AS n FROM snap_tt FOR SYSTEM_VERSION AS OF 0")
        .head().getLong(0) == 100L)
      // TIMESTAMP AS OF resolves through the manifests' #ts instants
      val tsLit = new java.sql.Timestamp(betweenMillis).toInstant.toString
      assert(spark.sql(
        s"SELECT COUNT(*) AS n FROM snap_tt TIMESTAMP AS OF '$tsLit'")
        .head().getLong(0) == 100L)
      // the un-traveled table still reads latest
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_tt").head().getLong(0) == 105L)
      // a bad version fails with the STORE's own message
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM snap_tt VERSION AS OF 99").collect()
      }
      assert(e.getMessage.contains("version 99 does not exist"))
      // a non-snapshot table keeps Spark's own refusal
      spark.sql("CREATE TABLE plain_tt (id BIGINT) USING parquet")
      try {
        intercept[Exception] {
          spark.sql("SELECT * FROM plain_tt VERSION AS OF 0").collect()
        }
      } finally spark.sql("DROP TABLE plain_tt")
    } finally spark.sql("DROP TABLE snap_tt")
  }

  test("SQL-first lifecycle: CREATE TABLE with declared columns, INSERT, read — no DataFrame write needed") {
    val root = tmp()
    spark.sql(s"CREATE TABLE snap_ddl (id BIGINT, v STRING) " +
      s"USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      // the empty store was born with the declared shape (version 0)
      val store = new SnapshotStore(root)
      assert(store.versions == Seq(0L))
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_ddl").head().getLong(0) == 0L)
      spark.sql("INSERT INTO snap_ddl VALUES (1, 'a'), (2, 'b')")
      assert(spark.sql("SELECT SUM(id) AS s FROM snap_ddl").head().getLong(0) == 3L)
      assert(store.versions == Seq(0L, 1L))
      // re-declaring a DIFFERENT schema over an existing store is refused
      val e = intercept[Exception] {
        spark.sql(s"CREATE TABLE snap_ddl2 (wrong INT) " +
          s"USING `graft-snapshot` OPTIONS (path '$root')")
      }
      assert(e.getMessage.contains("does not match"))
    } finally spark.sql("DROP TABLE snap_ddl")
  }

  test("writeStream.partitionBy creates a hive-partitioned table; appends inherit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmp(); val cp = tmp()
    val store = new SnapshotStore(root)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Int)]
    val q = input.toDF().toDF("id", "day")
      .writeStream.format("graft-snapshot")
      .option("path", root).option("checkpointLocation", cp)
      .partitionBy("day")
      .outputMode("append").start()
    try {
      input.addData((1L, 1), (2L, 2)); q.processAllAvailable()
      input.addData((3L, 1)); q.processAllAvailable()
    } finally q.stop()
    assert(store.versions.length == 2)
    val got = store.read(spark)
    assert(got.count() == 3L)
    assert(got.filter($"day" === 1).count() == 2L)
    // partition values live in the staged paths (hive layout)
    assert(store.readFullManifest(1L).entries.forall(_.path.contains("day=")))
    // format read prunes by the partition filter
    val day1 = spark.read.format("graft-snapshot").option("path", root).load()
      .filter($"day" === 1)
    assert(day1.count() == 2L)
  }

  test("SQL DML on a PARTITIONED table: INSERT appends hive-style, OVERWRITE keeps the layout, MERGE moves rows") {
    import spark.implicits._
    val root = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(
      (1 to 3).flatMap(d => (1 to 5).map(i => (d * 100L + i, d)))
        .toDF("id", "day"),
      partitionBy = Seq("day"))
    spark.sql(s"CREATE TABLE snap_pdml USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      // INSERT must carry the partition column and stage hive-style
      spark.sql("INSERT INTO snap_pdml VALUES (401, 4), (402, 4)")
      val v0Paths = store.readFullManifest(0L).entries.map(_.path).toSet
      assert(store.readFullManifest(1L).entries
        .filterNot(e => v0Paths.contains(e.path))
        .forall(_.path.contains("day=4")))
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_pdml WHERE day = 4")
        .head().getLong(0) == 2L)
      // MERGE that changes a row's PARTITION VALUE physically moves it
      spark.sql("""
        MERGE INTO snap_pdml USING
          (SELECT CAST(101 AS BIGINT) AS id, 9 AS day) s
        ON snap_pdml.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      assert(spark.sql("SELECT day FROM snap_pdml WHERE id = 101").head().getInt(0) == 9)
      assert(spark.read.format("graft-snapshot").option("path", root).load()
        .filter($"day" === 9).count() == 1L)
      assert(store.readFullManifest(store.latestVersion.get)
        .entries.exists(_.path.contains("day=9")),
        "a merged row with a new partition value must live in its new directory")
      // INSERT OVERWRITE keeps the table partitioned
      spark.sql("INSERT OVERWRITE snap_pdml VALUES (7, 1), (8, 2)")
      val m = store.readFullManifest(store.latestVersion.get)
      assert(m.partCols == Seq("day"), "OVERWRITE must not drop the partition layout")
      assert(m.entries.forall(_.path.contains("day=")))
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_pdml").head().getLong(0) == 2L)
    } finally spark.sql("DROP TABLE snap_pdml")
  }

  test("change feed spans RENAME/DROP COLUMN coherently: end-of-range shape via physical identity, dropped values never resurrect, renames emit no rows") {
    import spark.implicits._
    val store = new SnapshotStore(tmp())
    // v0: overwrite with the ORIGINAL names
    store.commitOverwrite(
      Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
        .toDF("id", "uid", "note").repartitionByRange(3, org.apache.spark.sql.functions.col("id")),
      statsColumn = Some("id"))
    // v1: CoW delete BEFORE the rename — its feed segment scans
    // pre-rename manifests (logical name 'uid')
    store.deleteWhere(spark, $"id" === 2L)
    // v2: the rename itself — zero file changes, zero feed rows
    store.renameColumn(spark, "uid", "user_id")
    // v3: post-rename append under the NEW name
    store.commitAppend(Seq((9L, 90L, "z")).toDF("id", "user_id", "note")
      .coalesce(1))
    val feed = store.readChanges(spark, -1L)
    // ONE logical column: the physical identity maps pre-rename 'uid'
    // onto the feed-end name — no forked uid/user_id null-padding
    assert(feed.schema.fieldNames.contains("user_id") &&
      !feed.schema.fieldNames.contains("uid"),
      s"feed must render history under the end-of-range names, got " +
        feed.schema.fieldNames.mkString(","))
    // pre-rename rows carry their values UNDER the new name
    val v0Inserts = feed.filter($"_commit_version" === 0L &&
      $"_change_type" === "insert")
    assert(v0Inserts.count() == 3L &&
      v0Inserts.filter($"user_id".isNull).isEmpty)
    assert(feed.filter($"_commit_version" === 2L).isEmpty,
      "a rename commit changes no rows and must emit nothing")
    assert(feed.filter($"_commit_version" === 3L &&
      $"user_id" === 90L).count() == 1L)
    // v4: drop 'note'; v5: append without it — the feed renders the
    // END-OF-RANGE shape (Delta's CDF-under-column-mapping semantics):
    // the dropped column leaves the feed entirely, it never null-pads
    // nor leaks its retired physical
    store.dropColumn(spark, "note")
    store.commitAppend(Seq((11L, 110L)).toDF("id", "user_id").coalesce(1))
    val feed2 = store.readChanges(spark, -1L)
    assert(!feed2.schema.fieldNames.contains("note"),
      "a column dropped inside the range must not appear in the feed")
    assert(feed2.filter($"_commit_version" === 5L).count() == 1L)
    // re-adding the dropped name maps to a FRESH physical: ONE 'note'
    // column whose pre-re-add history is NULL — the retired physical's
    // values never resurrect under the re-bound identity
    store.addColumns(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("note",
        org.apache.spark.sql.types.StringType))))
    store.commitAppend(Seq((12L, 120L, "fresh")).toDF("id", "user_id", "note")
      .coalesce(1))
    val feed3 = store.readChanges(spark, -1L)
    assert(feed3.schema.fieldNames.count(_ == "note") == 1)
    val freshRow = feed3.filter($"_commit_version" === 7L).head()
    assert(freshRow.getString(feed3.schema.fieldIndex("note")) == "fresh")
    assert(feed3.filter($"_commit_version" === 0L && $"id" === 1L &&
      $"_change_type" === "insert").head()
      .isNullAt(feed3.schema.fieldIndex("note")),
      "pre-re-add history must be NULL under the fresh physical, never " +
        "the retired column's values")
    // a feed range ENDING before the rename keeps the old names: each
    // cursor renders onto its own end version
    val early = store.readChanges(spark, -1L, Some(1L))
    assert(early.schema.fieldNames.contains("uid") &&
      !early.schema.fieldNames.contains("user_id"))
  }

  test("streaming CDC apply: mergeKeys upserts each micro-batch copy-on-write, exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmp(); val cp = tmp()
    val store = new SnapshotStore(root)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "v")
      .writeStream.format("graft-snapshot")
      .option("path", root).option("checkpointLocation", cp)
      .option("mergeKeys", "id").option("statsColumn", "id")
      .outputMode("append").start()
    try {
      input.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      // batch 2 updates key 2 and inserts key 3
      input.addData((2L, "B"), (3L, "c")); q.processAllAvailable()
    } finally q.stop()
    assert(store.versions.length == 2)
    val got = store.read(spark).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c")),
      "micro-batch 2 must upsert, not append a duplicate key 2")
    // engine-style replay of a committed batch id: NO new version, no double-merge
    val sink = new SnapshotStreamSink(store,
      org.apache.spark.sql.streaming.OutputMode.Append(), Some("id"), false,
      "default", Nil, Seq("id"))
    sink.addBatch(1L, frame(90 to 99, "dup"))
    assert(store.versions.length == 2)
    assert(store.read(spark).count() == 3L)
    // a genuinely new batch merges
    import org.apache.spark.sql.functions.lit
    sink.addBatch(2L, Seq((3L, "C"), (4L, "d")).toDF("id", "v"))
    assert(store.versions.length == 3)
    assert(store.read(spark).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "C"), (4L, "d")))
    // history: every pre-merge state is still time-travelable
    assert(store.read(spark, Some(0L)).count() == 2L)
  }

  test("comma-list stats property: EVERY listed column skips files at planning time; readRange and DML prune on secondaries") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val root = tmp()
    val store = new SnapshotStore(root)
    // id and bucket are independently clustered after a z-order layout:
    // range-partition on id first, then OPTIMIZE ZORDER over both
    store.commitOverwrite(
      (1L to 6400L).map(i => (i, i % 80, s"v$i")).toDF("id", "bucket", "v")
        .repartitionByRange(8, $"id"),
      statsColumn = Some("id,bucket"))
    store.compactLatest(spark, targetFiles = 16, zorderBy = Seq("id", "bucket"))
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.map(_.metrics("numFiles").value).sum
    }
    val all = spark.read.format("graft-snapshot").option("path", root).load()
    assert(scannedFiles(all) == 16L)
    // a filter on the PRIMARY column skips files...
    assert(scannedFiles(all.filter($"id".between(1L, 400L))) < 16L)
    // ...and a filter on the SECONDARY column skips files too — the
    // multi-column payoff: after z-order BOTH dimensions have compact
    // per-file ranges and BOTH prune at planning time
    val byBucket = all.filter($"bucket" === 3L)
    assert(byBucket.count() == 80L)
    assert(scannedFiles(all.filter($"bucket" === 3L)) < 16L,
      "secondary stats column must skip files at planning time")
    // readRange accepts the secondary column
    assert(store.readRange(spark, "bucket", 3L, 3L).count() == 80L)
    // DML candidate pruning intersects ALL stats columns: a delete
    // constrained on the secondary rewrites only intersecting files
    val before = store.readFullManifest(store.latestVersion.get)
      .entries.map(_.path).toSet
    store.deleteWhere(spark, $"bucket" === 3L && $"id" <= 800L)
    val after = store.readFullManifest(store.latestVersion.get)
      .entries.map(_.path).toSet
    assert(before.intersect(after).nonEmpty,
      "files outside the (id AND bucket) bounds must keep identity")
    assert(store.read(spark).count() == 6400L - 10L)
    // the stats property is one authority string: a conflicting append
    // request fails loudly, a matching one keeps BOTH columns' stats
    intercept[IllegalArgumentException] {
      store.commitAppend(Seq((9001L, 1L, "x")).toDF("id", "bucket", "v"),
        statsColumn = Some("id"))
    }
    store.commitAppend(Seq((9001L, 1L, "x")).toDF("id", "bucket", "v"))
    val tail = store.readFullManifest(store.latestVersion.get)
      .entries.filterNot(e => after.contains(e.path))
    assert(tail.exists(e => e.min.contains(9001L) &&
      e.extra.exists { case (c, mn, mx) => c == "bucket" && mn == 1L && mx == 1L }),
      "appends keep collecting stats for every listed column")
  }

  test("live-DV versions stay fully usable through SQL: SELECT applies DVs, DML and OPTIMIZE still resolve") {
    import spark.implicits._
    val root = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(
      (1L to 800L).map(i => (i, s"v$i")).toDF("id", "v")
        .repartitionByRange(8, $"id"),
      statsColumn = Some("id"))
    store.deleteWhere(spark, $"id" === 5L, mergeOnRead = true)
    spark.sql(s"CREATE TABLE snap_dv USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      // SELECT plans the DV-applying fallback — tombstoned rows excluded
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_dv").head().getLong(0) == 799L)
      assert(spark.sql("SELECT * FROM snap_dv WHERE id = 5").isEmpty)
      // DESCRIBE HISTORY resolves through the fallback relation too
      assert(spark.sql("DESCRIBE HISTORY snap_dv").count() == 2L)
      // CoW DML on a live-DV table: the rewrite scan applies the DVs,
      // so the tombstoned row cannot resurrect through the UPDATE
      spark.sql("UPDATE snap_dv SET v = 'six' WHERE id = 6")
      assert(spark.sql("SELECT v FROM snap_dv WHERE id = 6").head().getString(0) == "six")
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_dv").head().getLong(0) == 799L)
      assert(spark.sql("SELECT * FROM snap_dv WHERE id = 5").isEmpty,
        "the CoW rewrite must not resurrect the MoR-deleted row")
      // OPTIMIZE settles the remaining tombstones; the next resolution
      // plans the pruned file-index path again
      spark.sql("OPTIMIZE snap_dv TARGET 2 FILES")
      assert(store.readFullManifest(store.latestVersion.get)
        .entries.forall(_.dv.isEmpty))
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_dv").head().getLong(0) == 799L)
    } finally spark.sql("DROP TABLE snap_dv")
  }

  test("CHECK constraints: a table property enforced in-plan on every write shape") {
    import spark.implicits._
    val root = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(
      (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"),
      statsColumn = Some("id"))
    spark.sql(s"CREATE TABLE snap_ck USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      spark.sql("ALTER TABLE snap_ck ADD CONSTRAINT positive CHECK (id > 0)")
      // a constraint the data already violates is refused up front
      val pre = intercept[Exception] {
        spark.sql("ALTER TABLE snap_ck ADD CONSTRAINT tiny CHECK (id < 50)")
      }
      assert(pre.getMessage.contains("existing rows violate"))
      // valid writes land; violating writes fail LOUDLY and commit NOTHING
      spark.sql("INSERT INTO snap_ck VALUES (101, 'ok')")
      val vAfterOk = store.latestVersion.get
      val bad = intercept[Exception] {
        spark.sql("INSERT INTO snap_ck VALUES (-1, 'nope')")
      }
      assert(bad.getMessage.contains("positive") ||
        bad.getCause != null && bad.getCause.getMessage.contains("positive"))
      assert(store.latestVersion.contains(vAfterOk),
        "a refused write must not publish a version")
      // NULL passes — SQL CHECK three-valued semantics
      spark.sql("ALTER TABLE snap_ck ADD CONSTRAINT shortv CHECK (length(v) <= 6)")
      spark.sql("INSERT INTO snap_ck VALUES (102, NULL)")
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_ck").head().getLong(0) == 102L)
      // the property follows the table through UPDATE, MERGE, OVERWRITE,
      // and OPTIMIZE — every shape funnels through the same staging gate
      intercept[Exception] {
        spark.sql("UPDATE snap_ck SET id = -5 WHERE id = 7")
      }
      intercept[Exception] {
        spark.sql("INSERT OVERWRITE snap_ck VALUES (0, 'zero')")
      }
      spark.sql("OPTIMIZE snap_ck TARGET 1 FILES")
      intercept[Exception] {
        store.commitAppend(Seq((-9L, "api")).toDF("id", "v"))
      }
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_ck").head().getLong(0) == 102L)
      // DESCRIBE DETAIL surfaces both constraints
      val detail = spark.sql("DESCRIBE DETAIL snap_ck").head()
        .getAs[String]("constraints")
      assert(detail.contains("positive") && detail.contains("shortv"))
      // DROP releases the gate
      spark.sql("ALTER TABLE snap_ck DROP CONSTRAINT positive")
      spark.sql("INSERT INTO snap_ck VALUES (-1, 'now ok')")
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_ck").head().getLong(0) == 103L)
      intercept[Exception] { // shortv still enforced
        spark.sql("INSERT INTO snap_ck VALUES (200, 'toolong!')")
      }
    } finally spark.sql("DROP TABLE snap_ck")
  }

  test("CDC replication loop: readChangeFeed stream + applyChangeFeed sink converge the replica, deletes included") {
    import spark.implicits._
    val srcRoot = tmp(); val dstRoot = tmp(); val cp = tmp()
    val src = new SnapshotStore(srcRoot)
    val dst = new SnapshotStore(dstRoot)
    src.commitOverwrite(
      (1L to 200L).map(i => (i, s"v$i")).toDF("id", "v")
        .repartitionByRange(4, $"id"),
      statsColumn = Some("id"))
    // mutations BEFORE the first replication run: a MoR delete, a CoW
    // update, an append — the feed renders all three honestly
    src.deleteWhere(spark, $"id" === 7L, mergeOnRead = true)
    src.updateWhere(spark, $"id" === 9L,
      Map("v" -> org.apache.spark.sql.functions.lit("nine")))
    src.commitAppend(Seq((201L, "tail")).toDF("id", "v"))
    // the replica target must EXIST (a change batch is not a table image)
    dst.commitTruncate(src.tableSchema())
    def replicate(): Unit = {
      val q = spark.readStream.format("graft-snapshot")
        .option("path", srcRoot).option("readChangeFeed", "true")
        .load()
        .writeStream.format("graft-snapshot")
        .option("path", dstRoot).option("checkpointLocation", cp)
        .option("mergeKeys", "id").option("applyChangeFeed", "true")
        .option("mergeOnRead", "true")
        .trigger(Trigger.AvailableNow()).outputMode("append").start()
      q.awaitTermination()
    }
    replicate()
    def rows(s: SnapshotStore) =
      s.read(spark).orderBy("id").collect().toSeq
    assert(rows(dst) == rows(src), "replica must equal the source")
    assert(dst.read(spark).filter($"id" === 7L).isEmpty,
      "the source's delete propagated")
    // more mutations, second incremental run from the same checkpoint:
    // only the NEW versions replay
    src.deleteWhere(spark, $"id" <= 3L)
    src.mergeInto(spark, Seq((9L, "nine2"), (300L, "new")).toDF("id", "v"),
      Seq("id"), mergeOnRead = true)
    val dstVersionsBefore = dst.versions.length
    replicate()
    assert(rows(dst) == rows(src), "second run converges the new changes")
    assert(dst.versions.length == dstVersionsBefore + 1,
      "one incremental batch, one replica commit")
    // exactly-once: an idle re-run replays nothing
    replicate()
    assert(rows(dst) == rows(src))
    // the batch TVF reads the same algebra: per-type counts over the
    // full feed match the replication arithmetic
    val tvf = spark.sql(
      s"SELECT _change_type AS t, COUNT(*) AS n FROM " +
        s"table_changes('$srcRoot', -1) GROUP BY 1").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // the TVF is the API feed verbatim (CoW commits render as per-FILE
    // diffs, so counts include rewritten files' unchanged rows)...
    val api = src.readChanges(spark, -1L).groupBy("_change_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(tvf == api)
    // ...and its net algebra reconstructs the live table size exactly
    assert(tvf("insert") - tvf("delete") == src.read(spark).count())
    // an applyChangeFeed sink without a pre-created target fails loudly
    val e = intercept[Exception] {
      val bad = spark.readStream.format("graft-snapshot")
        .option("path", srcRoot).option("readChangeFeed", "true").load()
        .writeStream.format("graft-snapshot")
        .option("path", tmp()).option("checkpointLocation", tmp())
        .option("mergeKeys", "id").option("applyChangeFeed", "true")
        .trigger(Trigger.AvailableNow()).outputMode("append").start()
      bad.awaitTermination()
    }
    assert(e.getMessage.contains("create it first") ||
      e.getCause != null && e.getCause.getMessage.contains("create it first"))
  }

  test("SQL ops statements: DESCRIBE HISTORY / OPTIMIZE ZORDER / ALTER ADD COLUMNS / RESTORE / VACUUM drive the store") {
    import spark.implicits._
    val root = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(
      (1L to 400L).map(i => (i, i % 7)).toDF("id", "b")
        .repartitionByRange(8, $"id"),
      statsColumn = Some("id"))
    spark.sql(s"CREATE TABLE snap_ops USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      spark.sql("INSERT INTO snap_ops SELECT id + 1000, id % 7 FROM snap_ops") // v1
      // DESCRIBE HISTORY: one row per version, newest first
      val hist = spark.sql("DESCRIBE HISTORY snap_ops").collect()
      assert(hist.map(_.getAs[Long]("version")).toSeq == Seq(1L, 0L))
      assert(hist.forall(_.getAs[Int]("n_files") > 0))
      // ...and by quoted store path, without a catalog entry
      assert(spark.sql(s"DESCRIBE HISTORY '$root'").count() == 2L)
      // OPTIMIZE ZORDER BY: a rewrite version, rows bit-identical
      val opt = spark.sql("OPTIMIZE snap_ops ZORDER BY (id, b) TARGET 2 FILES").head()
      assert(opt.getAs[Long]("version") == 2L && opt.getAs[Int]("target_files") == 2)
      assert(store.readFullManifest(2L).rewrite &&
        store.readFullManifest(2L).entries.length == 2)
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_ops").head().getLong(0) == 800L)
      // default TARGET follows bytes/128MiB -> 1 file for a tiny table
      assert(spark.sql("OPTIMIZE snap_ops").head().getAs[Int]("target_files") == 1)
      // OPTIMIZE ... SMALLER THAN parses through to the small-file
      // selection (every file here is tiny, so the rewrite lands)
      val vSmall = spark.sql("OPTIMIZE snap_ops TARGET 1 FILES SMALLER THAN 1 MB")
        .head().getAs[Long]("version")
      assert(store.readFullManifest(vSmall).entries.length == 1)
      // OPTIMIZE ... WHERE parses and reaches the scoped path (this
      // table is unpartitioned -> the store's own loud refusal)
      val eW = intercept[Exception] { spark.sql("OPTIMIZE snap_ops WHERE b = 1") }
      assert(eW.getMessage.contains("unpartitioned"))
      // ...and on a partitioned table it compacts ONLY the named partition
      val root2 = tmp()
      val store2 = new SnapshotStore(root2)
      store2.commitOverwrite(Seq((1L, "d1"), (2L, "d2")).toDF("id", "day"),
        partitionBy = Seq("day"))
      store2.commitAppend(Seq((3L, "d1")).toDF("id", "day"))
      val d2Files = store2.readFullManifest(1L).entries
        .filter(_.path.contains("day=d2")).map(_.path).toSet
      spark.sql(s"CREATE TABLE snap_ops2 USING `graft-snapshot` OPTIONS (path '$root2')")
      try {
        spark.sql("OPTIMIZE snap_ops2 WHERE day = 'd1' TARGET 1 FILES")
        val m2 = store2.readFullManifest(store2.latestVersion.get)
        assert(m2.entries.count(_.path.contains("day=d1")) == 1)
        assert(m2.entries.filter(_.path.contains("day=d2")).map(_.path).toSet
          == d2Files, "out-of-scope partition keeps file identity")
        assert(spark.sql("SELECT COUNT(*) AS n FROM snap_ops2").head().getLong(0) == 3L)
      } finally spark.sql("DROP TABLE snap_ops2")
      // ALTER TABLE ADD COLUMNS: O(manifest) schema evolution; old rows
      // null-pad, the catalog stays in step, inserts take the new shape
      spark.sql("ALTER TABLE snap_ops ADD COLUMNS (tag STRING, w DOUBLE)")
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_ops WHERE tag IS NULL")
        .head().getLong(0) == 800L)
      spark.sql("INSERT INTO snap_ops VALUES (9999, 0, 'tagged', 1.5)")
      assert(spark.sql("SELECT tag FROM snap_ops WHERE id = 9999")
        .head().getString(0) == "tagged")
      // RESTORE: zero-copy rollback to the pre-evolution state
      val rst = spark.sql("RESTORE TABLE snap_ops TO VERSION AS OF 1").head()
      assert(rst.getAs[Long]("restored_to") == 1L)
      assert(spark.sql("SELECT COUNT(*) AS n FROM snap_ops").head().getLong(0) == 800L)
      assert(store.tableSchema().fieldNames.toSeq == Seq("id", "b"),
        "restore returns the narrow schema")
      // VACUUM requires explicit retention...
      val bare = intercept[Exception] { spark.sql("VACUUM snap_ops") }
      assert(bare.getMessage.contains("RETAIN"))
      // DRY RUN lists the reclaimable files without touching anything
      val dry = spark.sql("VACUUM snap_ops RETAIN 2 VERSIONS DRY RUN").collect()
      assert(dry.nonEmpty && dry.forall(r => r.getLong(1) >= 0L && r.isNullAt(2)))
      assert(dry.exists(r => r.getString(0).endsWith(".parquet") && r.getLong(1) > 0L))
      val versionsBefore = store.versions.length
      assert(store.versions.length == versionsBefore,
        "dry run must not drop versions")
      // ...and with one, drops history
      assert(spark.sql("VACUUM snap_ops RETAIN 2 VERSIONS").head().getInt(0) == 2)
      assert(store.versions.length == 2)
      assert(spark.sql("VACUUM snap_ops RETAIN 2 VERSIONS DRY RUN").isEmpty,
        "nothing reclaimable after the real vacuum")
      // SQL-first PARTITIONED birth: layout + stats declared in OPTIONS,
      // no DataFrame write ever touches the table
      val root3 = tmp()
      spark.sql(s"CREATE TABLE snap_ops3 (id BIGINT, day STRING) " +
        s"USING `graft-snapshot` OPTIONS (path '$root3', " +
        "partitionBy 'day', statsColumn 'id')")
      try {
        spark.sql("INSERT INTO snap_ops3 VALUES (1, 'd1'), (2, 'd2'), (3, 'd1')")
        val store3 = new SnapshotStore(root3)
        val m3 = store3.readFullManifest(store3.latestVersion.get)
        assert(m3.partCols == Seq("day") &&
          m3.entries.forall(_.path.contains("day=")),
          "SQL-declared partitioning must land hive-style")
        assert(m3.statsColumn.contains("id") &&
          m3.entries.exists(_.min.isDefined),
          "SQL-declared stats property must collect footer stats")
        assert(spark.sql("SELECT COUNT(*) AS n FROM snap_ops3 WHERE day = 'd1'")
          .head().getLong(0) == 2L)
        // DESCRIBE DETAIL: the one-row live summary
        val d = spark.sql("DESCRIBE DETAIL snap_ops3").head()
        assert(d.getAs[String]("format") == "graft-snapshot" &&
          d.getAs[String]("partition_columns") == "day" &&
          d.getAs[String]("stats_columns") == "id" &&
          d.getAs[Int]("n_files") == m3.entries.length)
      } finally spark.sql("DROP TABLE snap_ops3")
      // ops on a non-snapshot table are refused loudly
      val e = intercept[Exception] {
        spark.sql("SELECT 1 AS x").createOrReplaceTempView("plain_v")
        spark.sql("DESCRIBE HISTORY plain_v").collect()
      }
      assert(e.getMessage.contains("graft-snapshot"))
      // ALTER ADD COLUMNS on a non-snapshot table falls back to Spark's own
      spark.sql("DROP TABLE IF EXISTS plain_pq")
      spark.sql(s"CREATE TABLE plain_pq (id INT) USING parquet LOCATION '${tmp()}/pq'")
      try {
        spark.sql("INSERT INTO plain_pq VALUES (1)")
        spark.sql("ALTER TABLE plain_pq ADD COLUMNS (extra STRING)")
        assert(spark.sql("SELECT extra FROM plain_pq").head().isNullAt(0))
      } finally spark.sql("DROP TABLE plain_pq")
    } finally spark.sql("DROP TABLE snap_ops")
  }

  test("SQL MERGE with NOT MATCHED BY SOURCE: full-state sync in one statement equals the declarative result") {
    import spark.implicits._
    val root = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(
      (1L to 100L).map(i => (i, s"v$i", "base")).toDF("id", "v", "st")
        .repartitionByRange(4, $"id"),
      statsColumn = Some("id"))
    spark.sql(s"CREATE TABLE snap_fss USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      // source = the DESIRED state: ids 1..40 (updated images) + 200..204
      // (new); everything else in the target is stale — flagged when
      // id % 10 == 7 (conditional orphan arm), deleted otherwise
      spark.sql("""
        MERGE INTO snap_fss USING (
          SELECT id, concat('s', id) AS v, 'synced' AS st
          FROM snap_fss WHERE id <= 40
          UNION ALL
          SELECT id, concat('s', id), 'synced'
          FROM (SELECT explode(sequence(200L, 204L)) AS id)
        ) s
        ON snap_fss.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE AND snap_fss.id % 10 = 7 THEN
          UPDATE SET st = 'orphan'
        WHEN NOT MATCHED BY SOURCE THEN DELETE""")
      val got = store.read(spark)
      // 40 synced + 5 inserted + orphans 47,57,67,77,87,97 kept flagged
      assert(got.count() == 51L)
      assert(got.filter($"st" === "synced").count() == 45L)
      assert(got.filter($"st" === "orphan").select("id").collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(47L, 57L, 67L, 77L, 87L, 97L))
      assert(got.filter($"id" === 7L).head().getAs[String]("st") == "synced",
        "a MATCHED row must never fall into the BY SOURCE arm")
      assert(got.filter($"id" === 41L).isEmpty, "unflagged stale rows deleted")
      // ONE commit; history intact
      assert(store.latestVersion.contains(1L))
      assert(store.read(spark, Some(0L)).count() == 100L)
      // a source-side reference in a BY SOURCE arm is refused loudly
      val e = intercept[Exception] {
        spark.sql("""
          MERGE INTO snap_fss USING (SELECT 1L AS id, 'x' AS v, 'y' AS st) s
          ON snap_fss.id = s.id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = s.v""")
      }
      assert(e.getMessage.contains("NOT MATCHED BY SOURCE") ||
        e.getMessage.contains("notMatchedBySource") ||
        e.getMessage.contains("UNRESOLVED"))
    } finally spark.sql("DROP TABLE snap_fss")
  }

  test("streaming CDC apply with mergeOnRead: each micro-batch is O(delta) — no data file rewritten, OPTIMIZE settles") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmp(); val cp = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(
      (1L to 400L).map(i => (i, s"v$i")).toDF("id", "v")
        .repartitionByRange(4, $"id"),
      statsColumn = Some("id"))
    val files0 = store.readFullManifest(0L).entries.map(_.path).toSet
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "v")
      .writeStream.format("graft-snapshot")
      .option("path", root).option("checkpointLocation", cp)
      .option("mergeKeys", "id").option("mergeOnRead", "true")
      .outputMode("append").start()
    try {
      input.addData((5L, "U5"), (401L, "n1")); q.processAllAvailable()
      input.addData((5L, "U5b"), (350L, "U350")); q.processAllAvailable()
    } finally q.stop()
    // every base file survived BOTH micro-batches by identity
    val mLast = store.readFullManifest(store.latestVersion.get)
    assert(files0.subsetOf(mLast.entries.map(_.path).toSet),
      "a MoR CDC stream must never rewrite a base data file")
    val got = store.read(spark)
    assert(got.count() == 401L)
    assert(got.filter($"id" === 5L).head().getString(1) == "U5b",
      "batch 2's image of key 5 wins (batch 1's is tombstoned)")
    assert(got.filter($"id" === 350L).head().getString(1) == "U350")
    // maintenance settles the tombstones: rows identical, DVs cleared
    store.compactLatest(spark, targetFiles = 2)
    val mc = store.readFullManifest(store.latestVersion.get)
    assert(mc.entries.forall(_.dv.isEmpty))
    assert(store.read(spark).count() == 401L &&
      store.read(spark).filter($"id" === 5L).head().getString(1) == "U5b")
    // mergeOnRead without mergeKeys is refused at sink construction
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("rate").load()
        .writeStream.format("graft-snapshot")
        .option("path", root).option("checkpointLocation", tmp())
        .option("mergeOnRead", "true").outputMode("append").start()
    }
    assert(e.getMessage.contains("mergeOnRead"))
  }

  test("SQL INSERT OVERWRITE preserves the table's stats column: data skipping survives SQL writers") {
    import spark.implicits._
    val root = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(
      (1L to 4000L).map(i => (i, "v0")).toDF("id", "tag").repartitionByRange(4, $"id"),
      statsColumn = Some("id"))
    spark.sql(s"CREATE TABLE snap_ow_stats USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      spark.sql("INSERT OVERWRITE snap_ow_stats " +
        "SELECT id, 'ow' AS tag FROM snap_ow_stats DISTRIBUTE BY id DIV 1000")
      // the stats PROPERTY survived the SQL overwrite...
      assert(store.readFullManifest(store.latestVersion.get).statsColumn.contains("id"),
        "INSERT OVERWRITE must republish the table's stats column")
      // ...with real per-file min/max: readRange doesn't throw and prunes
      val pruned = store.readRange(spark, "id", 1L, 50L)
      assert(pruned.count() == 50L)
      // and a later append still collects against the same authority
      spark.sql("INSERT INTO snap_ow_stats VALUES (9999, 'tail')")
      assert(store.readFullManifest(store.latestVersion.get)
        .entries.exists(e => e.min.isDefined && e.max.contains(9999L)))
    } finally spark.sql("DROP TABLE snap_ow_stats")
  }

  test("mergeKeys sink reorders the batch onto the table schema: partitionBy + CDC upsert compose") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmp(); val cp = tmp()
    val store = new SnapshotStore(root)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, String)]
    // input order (day, id, v): the partition column is FIRST here, but
    // the first batch's partitionBy normalizes it LAST in the table
    // schema — batch 2 must reshape, not crash on the positional check
    val q = input.toDF().toDF("day", "id", "v")
      .writeStream.format("graft-snapshot")
      .option("path", root).option("checkpointLocation", cp)
      .option("mergeKeys", "id")
      .partitionBy("day")
      .outputMode("append").start()
    try {
      input.addData(("d1", 1L, "a"), ("d2", 2L, "b")); q.processAllAvailable()
      input.addData(("d2", 2L, "B"), ("d1", 3L, "c")); q.processAllAvailable()
    } finally q.stop()
    assert(store.versions.length == 2)
    val got = store.read(spark).orderBy("id")
      .select("id", "v", "day").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq((1L, "a", "d1"), (2L, "B", "d2"), (3L, "c", "d1")),
      "batch 2 must upsert through the hive layout, key 2 updated in place")
  }

  test("rate limiting refuses a non-persistable floor; an inverted readInserts range fails loudly") {
    val root = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(frame(1 to 10, "v0"))
    // non-local checkpoint scheme: the floor cannot be persisted, so a
    // committed restart could silently re-deliver — refused at source
    // construction, not discovered as duplicates in production
    val e = intercept[IllegalArgumentException] {
      new SnapshotStreamSource(spark.sqlContext, store, store.tableSchema(),
        "fail", -1L, maxVersionsPerTrigger = Some(1L),
        metadataPath = "hdfs://nn/checkpoints/src0")
    }
    assert(e.getMessage.contains("non-local"))
    // the second line of defense: a regressed cursor (start ahead of
    // end) must fail, never silently return an empty batch
    val e2 = intercept[IllegalArgumentException] {
      store.readInserts(spark, 5L, 3L, store.tableSchema())
    }
    assert(e2.getMessage.contains("inverted"))
  }

  test("OPTIMIZE clause split is quote-aware: a predicate containing 'ZORDER BY' as a string literal cannot mis-split") {
    // unit surface: the tokenizer itself
    assert(SnapshotSqlParser.parseOptimizeTail(
      " WHERE note = 'use ZORDER BY id' TARGET 2 FILES") ==
      (Some("note = 'use ZORDER BY id'"), Nil, Some(2), None))
    assert(SnapshotSqlParser.parseOptimizeTail(
      " WHERE day = 'TARGET 9 FILES' SMALLER THAN 3 MB;") ==
      (Some("day = 'TARGET 9 FILES'"), Nil, None, Some(3L << 20)))
    assert(SnapshotSqlParser.parseOptimizeTail(
      " ZORDER BY (a, `b`) TARGET 4 FILES") ==
      (None, Seq("a", "b"), Some(4), None))
    assert(SnapshotSqlParser.parseOptimizeTail("") == (None, Nil, None, None))
    // a NESTED keyword inside parentheses belongs to the clause body,
    // not the grammar: a subquery's WHERE is neither a duplicate nor a
    // body terminator
    assert(SnapshotSqlParser.parseOptimizeTail(
      " WHERE k IN (SELECT k FROM u WHERE f = 1)") ==
      (Some("k IN (SELECT k FROM u WHERE f = 1)"), Nil, None, None))
    assert(SnapshotSqlParser.parseOptimizeTail(
      " WHERE k IN (SELECT k FROM u WHERE f = 1) TARGET 2 FILES") ==
      (Some("k IN (SELECT k FROM u WHERE f = 1)"), Nil, Some(2), None))
    // two TOP-LEVEL spellings of one clause are still a user error
    val eDup = intercept[IllegalArgumentException] {
      SnapshotSqlParser.parseOptimizeTail(" WHERE a = 1 WHERE b = 2")
    }
    assert(eDup.getMessage.contains("duplicate WHERE"))
    // doubled-quote SQL escape stays inside the string
    assert(SnapshotSqlParser.parseOptimizeTail(
      " WHERE note = 'it''s ZORDER BY o''clock'") ==
      (Some("note = 'it''s ZORDER BY o''clock'"), Nil, None, None))
    // garbage is loud, not silently dropped
    val eBad = intercept[IllegalArgumentException] {
      SnapshotSqlParser.parseOptimizeTail(" FROBNICATE 3")
    }
    assert(eBad.getMessage.contains("cannot parse clause text"))
    // end-to-end: the scoped rewrite reaches exactly the partition whose
    // VALUE contains the keyword text
    import spark.implicits._
    val root = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(
      Seq((1L, "use ZORDER BY id"), (2L, "plain")).toDF("id", "note"),
      partitionBy = Seq("note"))
    store.commitAppend(Seq((3L, "use ZORDER BY id")).toDF("id", "note"))
    val rows = store.read(spark).orderBy("id").collect().toSeq
    spark.sql(s"OPTIMIZE '$root' WHERE note = 'use ZORDER BY id' TARGET 1 FILES")
    val m = store.readFullManifest(store.latestVersion.get)
    assert(m.rewrite, "the scoped OPTIMIZE must have committed a rewrite")
    assert(store.read(spark).orderBy("id").collect().toSeq == rows)
    assert(m.entries.count(_.path.contains("note=plain")) == 1,
      "the untouched partition keeps its single original file")
  }

  test("applyChangeFeed sink refuses a change batch without _commit_version (ordering undefined)") {
    import spark.implicits._
    val root = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(Seq((1L, "a")).toDF("id", "v"))
    val sink = new SnapshotStreamSink(store, org.apache.spark.sql.streaming.OutputMode.Append(),
      None, false, "t", Nil, mergeKeys = Seq("id"), mergeOnRead = false,
      applyChangeFeed = true)
    // insert-then-delete for one key with no version column: the final
    // state is undefined — refused loudly instead of keeping the insert
    val batch = Seq((2L, "x", "insert"), (2L, "x", "delete"))
      .toDF("id", "v", "_change_type")
    val e = intercept[IllegalArgumentException] { sink.addBatch(0L, batch) }
    assert(e.getMessage.contains("_commit_version"))
    assert(store.latestVersion.contains(0L), "refusal must commit nothing")
  }

  test("RESTORE TO TIMESTAMP resolves zone-less literals in the SESSION timezone") {
    import spark.implicits._
    import java.nio.charset.StandardCharsets
    val root = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(Seq((1L, "v0")).toDF("id", "v"))
    store.commitAppend(Seq((2L, "v1")).toDF("id", "v"))
    store.commitAppend(Seq((3L, "v2")).toDF("id", "v"))
    // pin the commit instants by rewriting the #ts headers (manifests
    // are plain text; the instant is log data, not filesystem state)
    def setTs(v: Long, iso: String): Unit = {
      val p = java.nio.file.Paths.get(root, "manifests", f"v$v%012d.manifest")
      val body = new String(java.nio.file.Files.readAllBytes(p), StandardCharsets.UTF_8)
        .linesIterator.map(l => if (l.startsWith("#ts\t"))
          s"#ts\t${java.time.Instant.parse(iso).toEpochMilli}" else l)
        .mkString("\n") + "\n"
      java.nio.file.Files.write(p, body.getBytes(StandardCharsets.UTF_8))
    }
    setTs(0L, "2026-01-01T00:00:00Z")
    setTs(1L, "2026-01-02T00:00:00Z")
    setTs(2L, "2026-01-03T00:00:00Z")
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      // 2026-01-02 08:59 Tokyo = 2026-01-01 23:59 UTC -> version 0;
      // hardcoded-UTC parsing would have resolved version 1
      spark.sql(s"RESTORE '$root' TO TIMESTAMP AS OF '2026-01-02 08:59:00'")
      assert(store.read(spark).count() == 1L, "restored to v0 (session-tz resolution)")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("TWO concurrent partition-sharded CDC appliers converge one replica: rebase makes the q292 loop shardable") {
    import spark.implicits._
    val srcRoot = tmp(); val dstRoot = tmp()
    val src = new SnapshotStore(srcRoot)
    val dst = new SnapshotStore(dstRoot)
    // source is range-clustered on the key; the replica declares the
    // same stats column so each applier's commits are range-scoped —
    // what lets the CAS loser REBASE instead of failing
    src.commitOverwrite((1L to 200L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(2, $"id"), statsColumn = Some("id"))
    dst.commitTruncate(src.tableSchema(), statsColumn = Some("id"))
    def applier(shard: String, pred: org.apache.spark.sql.Column, cp: String) = {
      spark.readStream.format("graft-snapshot")
        .option("path", srcRoot).option("readChangeFeed", "true").load()
        .filter(pred)
        .writeStream.format("graft-snapshot")
        .option("path", dstRoot).option("checkpointLocation", cp)
        .option("mergeKeys", "id").option("applyChangeFeed", "true")
        .option("mergeOnRead", "true").option("txnAppId", shard)
        .trigger(Trigger.AvailableNow()).start()
    }
    val cpA = tmp(); val cpB = tmp()
    def drainBoth(): Unit = {
      // started together, so their micro-batch commits RACE on the
      // replica — the disjoint-range rebase is what lets both land
      val a = applier("low", $"id" <= 100L, cpA)
      val b = applier("high", $"id" > 100L, cpB)
      a.awaitTermination(); b.awaitTermination()
    }
    drainBoth()
    assert(dst.read(spark).orderBy("id").collect().toSeq ==
      src.read(spark).orderBy("id").collect().toSeq,
      "replica must converge to the source after the initial sync")
    // ongoing changes on BOTH shards: updates and a delete per shard
    src.mergeInto(spark, Seq((5L, "u5"), (105L, "u105")).toDF("id", "v"),
      Seq("id"), mergeOnRead = true)
    src.deleteWhere(spark, $"id" === 7L || $"id" === 107L, mergeOnRead = true)
    drainBoth()
    assert(dst.read(spark).orderBy("id").collect().toSeq ==
      src.read(spark).orderBy("id").collect().toSeq,
      "replica must converge after updates AND deletes on both shards")
    assert(dst.read(spark).count() == 198L)
  }

  test("SQL ALTER TABLE RENAME/DROP COLUMN: catalog stays in step, SELECT and time travel span the evolution") {
    import spark.implicits._
    val root = tmp()
    spark.sql(s"CREATE TABLE snap_cm (id BIGINT, name STRING, amt DOUBLE) " +
      s"USING `graft-snapshot` OPTIONS (path '$root')")
    spark.sql("INSERT INTO snap_cm VALUES (1, 'a1', 10.0), (2, 'a2', 20.0)")
    val store = new SnapshotStore(root)
    val files = store.readFullManifest(store.latestVersion.get).entries.map(_.path).toSet
    spark.sql("ALTER TABLE snap_cm RENAME COLUMN name TO label")
    assert(store.readFullManifest(store.latestVersion.get)
      .entries.map(_.path).toSet == files, "rename rewrites no file")
    // catalog schema followed; SELECT reads values under the new name
    assert(spark.table("snap_cm").columns.toSeq == Seq("id", "label", "amt"))
    assert(spark.sql("SELECT label FROM snap_cm WHERE id = 1").head().getString(0) == "a1")
    // INSERT through the new name still lands (physical mapping on write)
    spark.sql("INSERT INTO snap_cm VALUES (3, 'a3', 30.0)")
    assert(spark.sql("SELECT count(*) FROM snap_cm WHERE label = 'a3'").head().getLong(0) == 1L)
    // time travel across the evolution keeps each version's own names
    val preRename = spark.sql("SELECT * FROM snap_cm VERSION AS OF 1")
    assert(preRename.columns.contains("name") && !preRename.columns.contains("label"))
    // DROP COLUMN narrows; a non-snapshot table still takes Spark's path
    spark.sql("ALTER TABLE snap_cm DROP COLUMN label")
    assert(spark.table("snap_cm").columns.toSeq == Seq("id", "amt"))
    assert(spark.sql("SELECT SUM(amt) FROM snap_cm").head().getDouble(0) == 60.0)
    spark.sql("DROP TABLE snap_cm")
  }

  test("CDC replication under schema evolution: the replica's applyChangeFeed sink evolves with the source") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val srcRoot = tmp(); val dstRoot = tmp(); val cp = tmp()
    val src = new SnapshotStore(srcRoot)
    val dst = new SnapshotStore(dstRoot)
    src.commitOverwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      statsColumn = Some("id"))
    dst.commitTruncate(src.tableSchema(), statsColumn = Some("id"))
    def drain(): Unit = {
      val q = spark.readStream.format("graft-snapshot")
        .option("path", srcRoot).option("readChangeFeed", "true").load()
        .writeStream.format("graft-snapshot")
        .option("path", dstRoot).option("checkpointLocation", cp)
        .option("mergeKeys", "id").option("applyChangeFeed", "true")
        .option("mergeSchema", "true")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    val dstPreEvolution = dst.latestVersion.get
    assert(dst.read(spark).orderBy("id").collect().toSeq ==
      src.read(spark).orderBy("id").collect().toSeq)
    // the SOURCE evolves mid-stream: new column + rows carrying it
    src.addColumns(StructType(Seq(StructField("extra", LongType))))
    src.commitAppend(Seq((3L, "c", 30L)).toDF("id", "v", "extra"))
    src.mergeInto(spark, Seq((1L, "a1", 10L)).toDF("id", "v", "extra"),
      Seq("id"), mergeOnRead = true)
    // a NEW AvailableNow run re-pins the stream schema (now evolved);
    // the sink must EVOLVE the replica rather than refuse or silently
    // drop the new column
    drain()
    assert(dst.tableSchema().fieldNames.toSeq == src.tableSchema().fieldNames.toSeq)
    assert(dst.read(spark).orderBy("id").collect().toSeq ==
      src.read(spark).orderBy("id").collect().toSeq,
      "replica must converge with the evolved schema and values")
    // pre-evolution versions still time-travel on BOTH sides
    assert(!src.read(spark, Some(0L)).columns.contains("extra"))
    assert(!dst.read(spark, Some(dstPreEvolution)).columns.contains("extra"))
    // without mergeSchema the widened batch is refused loudly, not dropped
    val dst2Root = tmp()
    val dst2 = new SnapshotStore(dst2Root)
    dst2.commitTruncate(StructType(src.tableSchema().fields.filterNot(_.name == "extra")))
    val q2 = spark.readStream.format("graft-snapshot")
      .option("path", srcRoot).option("readChangeFeed", "true").load()
      .writeStream.format("graft-snapshot")
      .option("path", dst2Root).option("checkpointLocation", tmp())
      .option("mergeKeys", "id").option("applyChangeFeed", "true")
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[StreamingQueryException] { q2.awaitTermination() }
    assert(e.getMessage.contains("mergeSchema") ||
      Option(e.getCause).exists(_.getMessage.contains("mergeSchema")))
  }

  test("CTAS: CREATE TABLE ... USING graft-snapshot AS SELECT births the table with layout and stats properties") {
    import spark.implicits._
    val root = tmp()
    Seq((1L, "d1", 10.0), (2L, "d2", 20.0), (3L, "d1", 30.0))
      .toDF("id", "day", "amt").createOrReplaceTempView("ctas_src")
    spark.sql("DROP TABLE IF EXISTS snap_ctas")
    spark.sql(s"""CREATE TABLE snap_ctas USING `graft-snapshot`
      OPTIONS (path '$root', partitionBy 'day', statsColumn 'id')
      AS SELECT id, day, amt FROM ctas_src""")
    val store = new SnapshotStore(root)
    // CTAS lands version 0 with the declared layout + stats properties
    assert(store.latestVersion.contains(0L))
    val m = store.readFullManifest(0L)
    assert(m.partCols == Seq("day"), "partitionBy option must reach the store")
    assert(m.statsColumn.contains("id"), "statsColumn option must reach the store")
    assert(m.entries.forall(_.path.contains("day=")), "hive-partitioned staging")
    assert(m.entries.forall(e => e.min.nonEmpty && e.max.nonEmpty),
      "stats collected at CTAS time")
    // the catalog reads it back; later appends inherit the layout
    assert(spark.sql("SELECT SUM(amt) FROM snap_ctas").head().getDouble(0) == 60.0)
    spark.sql("INSERT INTO snap_ctas VALUES (4, 40.0, 'd2')")
    assert(spark.sql("SELECT COUNT(*) FROM snap_ctas WHERE day = 'd2'")
      .head().getLong(0) == 2L)
    spark.sql("DROP TABLE snap_ctas")
  }

  test("a mid-stream RENAME/DROP of a pinned column fails the stream loudly — never silent nulls") {
    import spark.implicits._
    val root = tmp(); val out = tmp(); val cp = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(Seq((1L, "a")).toDF("id", "v"))
    // a RUNNING query pins (id, v); the rename lands between triggers —
    // a restart would re-pin automatically, so mid-run is the only
    // window where silent null-padding could strike
    val q = spark.readStream.format("graft-snapshot").option("path", root).load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .start()
    try {
      q.processAllAvailable()
      store.renameColumn(spark, "v", "w")
      store.commitAppend(Seq((2L, "b")).toDF("id", "w"))
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(m => m.contains("renamed or dropped") &&
        m.contains("restart the stream")), msgs(e).mkString(" | "))
    } finally q.stop()
  }

  test("SQL CONVERT FROM DELTA: CREATE TABLE ... FROM DELTA adopts a Delta table zero-copy, with VERSION AS OF and STATS COLUMN") {
    import spark.implicits._
    // minimal public-protocol Delta fixture: two single-file commits +
    // a remove, log hand-written
    val delta = tmp()
    def dataFile(name: String, df: org.apache.spark.sql.DataFrame): Long = {
      val stage = Files.createTempDirectory("graft-sqldl")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val ls = Files.list(stage)
      val src = try {
        val it = ls.iterator()
        Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
          .find(_.getFileName.toString.endsWith(".parquet")).get
      } finally ls.close()
      val dst = java.nio.file.Paths.get(delta).resolve(name)
      Files.move(src, dst); Files.size(dst)
    }
    val s1 = dataFile("a.parquet", (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    val s2 = dataFile("b.parquet", (11L to 15L).map(i => (i, s"v$i")).toDF("id", "v"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val schemaJson = mapper.writeValueAsString(
      spark.read.parquet(s"$delta/a.parquet").schema.json)
    val logDir = java.nio.file.Paths.get(delta).resolve("_delta_log")
    Files.createDirectories(logDir)
    Files.write(logDir.resolve(f"${0L}%020d.json"), (
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""" + "\n" +
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":$schemaJson,"partitionColumns":[],"configuration":{},""" +
      s""""createdTime":0}}""" + "\n" +
      s"""{"add":{"path":"a.parquet","partitionValues":{},"size":$s1,""" +
      s""""modificationTime":0,"dataChange":true}}""" + "\n" +
      s"""{"add":{"path":"b.parquet","partitionValues":{},"size":$s2,""" +
      s""""modificationTime":0,"dataChange":true}}""" + "\n").getBytes("UTF-8"))
    Files.write(logDir.resolve(f"${1L}%020d.json"),
      ("""{"remove":{"path":"b.parquet","deletionTimestamp":0,""" +
        """"dataChange":true}}""" + "\n").getBytes("UTF-8"))
    spark.sql("DROP TABLE IF EXISTS snap_from_delta")
    val snapRoot = tmp()
    val row = spark.sql(s"CREATE TABLE snap_from_delta FROM DELTA '$delta' " +
      s"STATS COLUMN id LOCATION '$snapRoot'").collect().head
    assert(row.getLong(0) == 0L && row.getInt(1) == 1)
    assert(spark.table("snap_from_delta").count() == 10L)
    // the adopted table is a live citizen through SQL
    spark.sql("INSERT INTO snap_from_delta SELECT CAST(99 AS BIGINT), 'x'")
    assert(spark.table("snap_from_delta").count() == 11L)
    // VERSION AS OF adopts the pre-remove state to a quoted path
    val rootV0 = tmp()
    val row0 = spark.sql(s"CREATE TABLE '$rootV0' FROM DELTA '$delta' " +
      "VERSION AS OF 0").collect().head
    assert(row0.getInt(1) == 2)
    assert(new SnapshotStore(rootV0).read(spark).count() == 15L)
    // a catalog target without LOCATION is refused with the recipe
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE snap_from_delta2 FROM DELTA '$delta'")
    }
    assert(e.getMessage.contains("LOCATION"))
    // the round trip in SQL: EXPORT TABLE ... TO DELTA writes a stock
    // log beside the adopted store. An adopted store still references
    // the ORIGINAL Delta table's files — export refuses until a
    // compaction materializes it, then exports the self-contained
    // suffix as a checkpoint + deltas
    val refusal = intercept[Exception] {
      spark.sql("EXPORT TABLE snap_from_delta TO DELTA")
    }
    assert(refusal.getMessage.contains("self-contained"))
    new SnapshotStore(snapRoot).compactLatest(spark, targetFiles = 1)
    val exported = spark.sql("EXPORT TABLE snap_from_delta TO DELTA")
      .head().getLong(0)
    assert(exported == 2L, "adoption v0 + INSERT v1 + compaction v2")
    val back = new SnapshotStore(tmp())
    back.convertFromDelta(spark, snapRoot)
    assert(back.read(spark).count() == 11L)
    // WITH CHANGE FEED: a DML commit exports a cdc action + the CDF
    // config flag (the full algebra is spec'd in SnapshotSpec)
    new SnapshotStore(snapRoot).deleteWhere(spark,
      org.apache.spark.sql.functions.col("id") === 1L, mergeOnRead = true)
    assert(spark.sql("EXPORT TABLE snap_from_delta TO DELTA WITH CHANGE FEED")
      .head().getLong(0) == 3L)
    val v3 = Files.readAllLines(java.nio.file.Paths.get(snapRoot)
      .resolve("_delta_log").resolve(f"${3L}%020d.json"))
    assert(v3.toString.contains("\"cdc\"") &&
      v3.toString.contains("delta.enableChangeDataFeed"))
    spark.sql("DROP TABLE snap_from_delta")
  }

  test("SQL SHALLOW CLONE: CREATE TABLE ... SHALLOW CLONE with VERSION AS OF and LOCATION registers a zero-copy fork") {
    import spark.implicits._
    val srcRoot = tmp(); val cloneRoot = s"${tmp()}/clone"
    val src = new SnapshotStore(srcRoot)
    src.commitOverwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    src.commitAppend(Seq((3L, "c")).toDF("id", "v"))
    spark.sql("DROP TABLE IF EXISTS snap_clone_src")
    spark.sql(s"CREATE TABLE snap_clone_src USING `graft-snapshot` OPTIONS (path '$srcRoot')")
    spark.sql("DROP TABLE IF EXISTS snap_clone2")
    // clone at VERSION AS OF 0 — the fork pins history, not the live head
    val row = spark.sql("CREATE TABLE snap_clone2 SHALLOW CLONE snap_clone_src " +
      s"VERSION AS OF 0 LOCATION '$cloneRoot'").head()
    assert(row.getAs[Long]("cloned_version") == 0L)
    assert(spark.sql("SELECT COUNT(*) FROM snap_clone2").head().getLong(0) == 2L)
    // diverge through SQL: the clone takes writes, the source is untouched
    spark.sql("INSERT INTO snap_clone2 VALUES (9, 'z')")
    assert(spark.sql("SELECT COUNT(*) FROM snap_clone2").head().getLong(0) == 3L)
    assert(spark.sql("SELECT COUNT(*) FROM snap_clone_src").head().getLong(0) == 3L)
    assert(new SnapshotStore(srcRoot).latestVersion.contains(1L),
      "the source history gains no version from the clone's writes")
    // a catalog target without LOCATION is refused with the recipe
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE snap_clone3 SHALLOW CLONE snap_clone_src")
    }
    assert(e.getMessage.contains("LOCATION"))
    spark.sql("DROP TABLE snap_clone2"); spark.sql("DROP TABLE snap_clone_src")
  }

  test("bloom filters prune at PLANNING time through the format: SET BLOOMFILTER COLUMN + point predicate observe fewer files") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val root = tmp()
    val store = new SnapshotStore(root)
    def uidOf(i: Long): Long = i * 2654435761L % 1000003L
    // 500 distinct uids per file — the design density (saturation
    // honesty drops filters past ~950/file)
    store.commitOverwrite(
      (1L to 8000L).map(i => (i, uidOf(i), s"v$i")).toDF("id", "uid", "v")
        .repartitionByRange(16, $"id"), statsColumn = Some("id"))
    spark.sql("DROP TABLE IF EXISTS snap_bloom")
    spark.sql(s"CREATE TABLE snap_bloom USING `graft-snapshot` OPTIONS (path '$root')")
    spark.sql("ALTER TABLE snap_bloom SET BLOOMFILTER COLUMN uid")
    spark.sql("OPTIMIZE snap_bloom TARGET 16 FILES") // restage WITH filters
    def scannedFiles(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val n = df.count()
      val scans = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      (scans.map(_.metrics("numFiles").value).sum, n)
    }
    spark.catalog.refreshTable("snap_bloom")
    // a uid point lookup: range stats cannot prune (uid scatters across
    // every file) — the bloom must
    val (nf, rows) = scannedFiles(
      spark.table("snap_bloom").filter($"uid" === uidOf(4321L)))
    assert(rows == 1L)
    assert(nf < 16L, s"bloom skipping must plan fewer than all 16 files, got $nf")
    // IN-lists prune too; a value in NO file scans (almost) nothing
    val (nfIn, rowsIn) = scannedFiles(spark.table("snap_bloom")
      .filter($"uid".isin(uidOf(11L), uidOf(22L), uidOf(33L))))
    assert(rowsIn == 3L && nfIn < 16L)
    val (nfMiss, rowsMiss) = scannedFiles(
      spark.table("snap_bloom").filter($"uid" === -1L))
    assert(rowsMiss == 0L && nfMiss <= 1L,
      s"an absent value should bloom-skip essentially everything, got $nfMiss")
    // DROP BLOOMFILTER: the property leaves; future files are filterless
    spark.sql("ALTER TABLE snap_bloom DROP BLOOMFILTER")
    assert(store.readHeader(store.latestVersion.get).bloomColumn.isEmpty)
    spark.sql("DROP TABLE snap_bloom")
  }

  test("startingVersion skips history: the first batch begins after it") {
    val root = tmp(); val out = tmp(); val cp = tmp()
    val store = new SnapshotStore(root)
    store.commitOverwrite(frame(1 to 100, "bulk"))
    store.commitAppend(frame(200 to 201, "tail"))
    val q = spark.readStream.format("graft-snapshot")
      .option("path", root).option("startingVersion", "0")
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.count() == 2L)
    assert(got.select("tag").distinct().head().getString(0) == "tail")
  }

  // ---- graft-delta: continuous tailing of a live Delta table ----

  private def deltaFixture(): (String, org.apache.spark.sql.types.StructType) = {
    val delta = tmp()
    val sz = deltaWrite(delta, "f0.parquet", frame(1 to 3, "v0"))
    val schema = spark.read.parquet(s"$delta/f0.parquet").schema
    deltaCommit(delta, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"tail","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":${jq(schema.json)},""" +
        s""""partitionColumns":[],"configuration":{},"createdTime":0}}""",
      deltaAddLine("f0.parquet", sz)))
    (delta, schema)
  }

  private def jq(s: String): String =
    new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(s)

  private def deltaWrite(delta: String, name: String,
      df: org.apache.spark.sql.DataFrame): Long = {
    val stage = Files.createTempDirectory("graft-tail-st")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val ls = Files.list(stage)
    val src = try {
      val it = ls.iterator()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
        .find(_.getFileName.toString.endsWith(".parquet")).get
    } finally ls.close()
    val dst = java.nio.file.Paths.get(delta).resolve(name)
    Files.createDirectories(dst.getParent)
    Files.move(src, dst)
    Files.size(dst)
  }

  private def deltaAddLine(p: String, sz: Long,
      dataChange: Boolean = true): String =
    s"""{"add":{"path":${jq(p)},"partitionValues":{},"size":$sz,""" +
      s""""modificationTime":0,"dataChange":$dataChange}}"""

  private def deltaCommit(delta: String, v: Long, lines: Seq[String]): Unit = {
    val logDir = java.nio.file.Paths.get(delta).resolve("_delta_log")
    Files.createDirectories(logDir)
    Files.write(logDir.resolve(f"$v%020d.json"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
  }

  private def drainDelta(delta: String, out: String, cp: String,
      startingVersion: Long = -1L, onDelete: String = "fail"): Unit = {
    val q = spark.readStream.format("graft-delta")
      .option("path", delta).option("startingVersion", startingVersion)
      .option("onDelete", onDelete)
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("graft-delta tail: appends to a live Delta table arrive as exactly-once micro-batches across restarts") {
    import spark.implicits._
    val (delta, _) = deltaFixture()
    val out = tmp(); val cp = tmp()
    // run 1 replays the whole log as the initial batch
    drainDelta(delta, out, cp)
    assert(spark.read.parquet(out).count() == 3L)
    // two appends -> two new versions; one drain delivers both, once
    deltaCommit(delta, 1L, Seq(
      deltaAddLine("f1.parquet", deltaWrite(delta, "f1.parquet",
        frame(10 to 12, "v1")))))
    deltaCommit(delta, 2L, Seq(
      deltaAddLine("f2.parquet", deltaWrite(delta, "f2.parquet",
        frame(20 to 20, "v2")))))
    drainDelta(delta, out, cp)
    val afterTwo = spark.read.parquet(out)
    assert(afterTwo.count() == 7L, "3 + 3 + 1, each exactly once")
    assert(afterTwo.groupBy("id").count().filter($"count" > 1L).isEmpty,
      "no row delivered twice")
    // nothing new -> nothing re-delivered
    drainDelta(delta, out, cp)
    assert(spark.read.parquet(out).count() == 7L)
    // a restart from the same checkpoint picks up only the NEW version
    deltaCommit(delta, 3L, Seq(
      deltaAddLine("f3.parquet", deltaWrite(delta, "f3.parquet",
        frame(30 to 31, "v3")))))
    drainDelta(delta, out, cp)
    assert(spark.read.parquet(out).count() == 9L)
    // OPTIMIZE-shaped rewrite (dataChange=false add+remove) emits NOTHING
    deltaCommit(delta, 4L, Seq(
      deltaAddLine("f4.parquet", deltaWrite(delta, "f4.parquet",
        frame(1 to 3, "v0")), dataChange = false),
      s"""{"remove":{"path":"f0.parquet","deletionTimestamp":0,""" +
        s""""dataChange":false}}"""))
    drainDelta(delta, out, cp)
    assert(spark.read.parquet(out).count() == 9L,
      "a rewrite is the same rows in a new layout — the tail stays silent")
    // startingVersion = adopt-then-tail: a fresh stream from version 3
    // sees nothing old
    val out2 = tmp(); val cp2 = tmp()
    drainDelta(delta, out2, cp2, startingVersion = 4L)
    deltaCommit(delta, 5L, Seq(
      deltaAddLine("f5.parquet", deltaWrite(delta, "f5.parquet",
        frame(40 to 40, "v5")))))
    drainDelta(delta, out2, cp2, startingVersion = 4L)
    val tail2 = spark.read.parquet(out2)
    assert(tail2.count() == 1L && tail2.head().getLong(0) == 40L)
  }

  test("graft-delta tail fails loudly mid-log: data-changing removes, deletion vectors, schema changes, unsupported protocol") {
    val (delta, schema) = deltaFixture()
    // a running tail must fail LOUDLY when the log turns a corner it
    // cannot honor — one continuous query per case, the corner committed
    // mid-run
    def failsMidRun(lines: Seq[String], needle: String): Unit = {
      val d2 = tmp()
      val sz = deltaWrite(d2, "g0.parquet", frame(1 to 2, "x"))
      deltaCommit(d2, 0L, Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"t2","format":{"provider":"parquet",""" +
          s""""options":{}},"schemaString":${jq(spark.read
            .parquet(s"$d2/g0.parquet").schema.json)},""" +
          s""""partitionColumns":[],"configuration":{},"createdTime":0}}""",
        deltaAddLine("g0.parquet", sz)))
      val q = spark.readStream.format("graft-delta")
        .option("path", d2).option("startingVersion", -1L)
        .load()
        .writeStream.format("memory")
        .queryName(s"tailfail${System.nanoTime()}")
        .option("checkpointLocation", tmp()).start()
      try {
        q.processAllAvailable() // v0 delivered, the stream is pinned
        deltaCommit(d2, 1L, lines)
        val e = intercept[Exception] { q.processAllAvailable() }
        val msgs = (Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
            ++ q.exception.iterator.flatMap(x =>
              Iterator.iterate(x: Throwable)(_.getCause).takeWhile(_ != null)
                .map(t => Option(t.getMessage).getOrElse(""))))
          .mkString(" | ")
        assert(msgs.toLowerCase.contains(needle.toLowerCase),
          s"expected failure mentioning '$needle', got: $msgs")
      } finally q.stop()
    }
    // a data-changing remove (DELETE/overwrite) refuses by default
    failsMidRun(Seq(
      s"""{"remove":{"path":"g0.parquet","deletionTimestamp":0,""" +
        s""""dataChange":true}}"""), "insert-only")
    // an add carrying a (valid) deletion vector is row-level DML
    val (idv, isz, icard) = graft.etl.DeltaDv.inlineDescriptor(Array(0L))
    failsMidRun(Seq(
      s"""{"add":{"path":"g0.parquet","partitionValues":{},"size":1,""" +
        s""""modificationTime":0,"dataChange":true,"deletionVector":""" +
        s"""{"storageType":"i","pathOrInlineDv":"$idv","sizeInBytes":$isz,""" +
        s""""cardinality":$icard}}}"""), "DELETION VECTOR")
    // a mid-run schema change requires a restart to re-pin
    val widened = org.apache.spark.sql.types.StructType(
      spark.read.parquet(s"$delta/f0.parquet").schema.fields :+
        org.apache.spark.sql.types.StructField("extra",
          org.apache.spark.sql.types.LongType))
    failsMidRun(Seq(
      s"""{"metaData":{"id":"t2","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":${jq(widened.json)},""" +
        s""""partitionColumns":[],"configuration":{},"createdTime":0}}"""),
      "changes the table schema")
    // a protocol upgrade past what the reader honors
    failsMidRun(Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],"writerFeatures":[]}}"""),
      "unsupported reader feature")
    // onDelete=skip opts out deliberately
    val out = tmp(); val cp = tmp()
    drainDelta(delta, out, cp, onDelete = "skip")
    deltaCommit(delta, 1L, Seq(
      s"""{"remove":{"path":"f0.parquet","deletionTimestamp":0,""" +
        s""""dataChange":true}}"""))
    drainDelta(delta, out, cp, onDelete = "skip")
    assert(spark.read.parquet(out).count() == 3L, "skip: no new rows, no failure")
  }

  test("graft-delta tail: the stream's zero point is PINNED in query state — a crash between offset WAL and commit cannot lose versions") {
    import spark.implicits._
    val (delta, _) = deltaFixture() // v0: ids 1..3
    deltaCommit(delta, 1L, Seq(
      deltaAddLine("f1.parquet", deltaWrite(delta, "f1.parquet",
        frame(10 to 10, "v1")))))
    val out = tmp(); val cp = tmp()
    def run(startingVersion: Option[Long]): Unit = {
      var r = spark.readStream.format("graft-delta").option("path", delta)
      startingVersion.foreach(v => r = r.option("startingVersion", v))
      val q = r.load().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1 tails from version 0: batch 0 delivers version 1's row
    run(Some(0L))
    assert(spark.read.parquet(out).select("id").head().getLong(0) == 10L)
    // the RESOLVED zero point is durable query state under the source's
    // metadata directory, exactly like the offsets it anchors
    val pin = java.nio.file.Paths.get(cp, "sources", "0", "startingVersion")
    assert(Files.isRegularFile(pin) &&
      new String(Files.readAllBytes(pin), "UTF-8").trim == "0")
    // CRASH between the offset WAL and the batch commit: batch 0's
    // offset survives; its commit marker, any no-data follow-up batch,
    // and the sink's output do not
    def pruneDir(dir: java.nio.file.Path, keep: Set[String]): Unit = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(dir)
      try s.iterator().asScala.toVector.filterNot(p =>
        keep.contains(p.getFileName.toString)).foreach(Files.delete)
      finally s.close()
    }
    pruneDir(java.nio.file.Paths.get(cp, "commits"), Set.empty)
    pruneDir(java.nio.file.Paths.get(cp, "offsets"), Set("0"))
    deleteRecursively(java.nio.file.Paths.get(out))
    // the table advances meanwhile
    deltaCommit(delta, 2L, Seq(
      deltaAddLine("f2.parquet", deltaWrite(delta, "f2.parquet",
        frame(20 to 20, "v2")))))
    // restart WITHOUT startingVersion: a re-resolved default ("now" =
    // version 2) would replay batch 0 as an empty range and silently
    // drop version 1 forever — the pinned zero point must govern. ONE
    // AvailableNow run both replays the crashed batch AND drains to the
    // latched tip (native SupportsTriggerAvailableNow, no single-batch
    // fallback)
    run(None)
    assert(spark.read.parquet(out).select("id").collect()
      .map(_.getLong(0)).toSet == Set(10L, 20L),
      "the replayed batch redelivers version 1, then version 2 follows")
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try {
        val it = s.iterator()
        while (it.hasNext) deleteRecursively(it.next())
      } finally s.close()
    }
    Files.deleteIfExists(p)
  }

  test("graft-delta tail pins the COLUMN MAPPING: drop + re-add under the same logical name fails loudly instead of reading NULLs") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, MetadataBuilder, StringType,
      StructField, StructType}
    val delta = tmp()
    // files store PHYSICAL names; the schemaString maps them to logical
    val sz = deltaWrite(delta, "m0.parquet",
      Seq((1L, "a")).toDF("col-aa", "col-bb"))
    def mapped(name: String, phys: String, id: Long,
        dt: org.apache.spark.sql.types.DataType) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putLong("delta.columnMapping.id", id)
        .putString("delta.columnMapping.physicalName", phys).build())
    def metaLine(fields: Seq[StructField], maxId: Int): String =
      s"""{"metaData":{"id":"cm","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":${jq(StructType(fields).json)},""" +
        s""""partitionColumns":[],"configuration":{""" +
        s""""delta.columnMapping.mode":"name",""" +
        s""""delta.columnMapping.maxColumnId":"$maxId"},"createdTime":0}}"""
    deltaCommit(delta, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLine(Seq(mapped("id", "col-aa", 1L, LongType),
        mapped("v", "col-bb", 2L, StringType)), 2),
      deltaAddLine("m0.parquet", sz)))
    val name = s"cmpin${System.nanoTime()}"
    val q = spark.readStream.format("graft-delta")
      .option("path", delta).option("startingVersion", -1L)
      .load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", tmp()).start()
    try {
      q.processAllAvailable()
      // the mapped tail reads physical files under LOGICAL names
      val got = spark.table(name).collect()
      assert(got.map(r => (r.getLong(0), r.getString(1))).toSet ==
        Set((1L, "a")))
      // v1: drop `v`, re-add the SAME logical name over a FRESH physical
      // column — the stripped logical schema is unchanged, but reading
      // col-bb from new files would return silent NULLs
      deltaCommit(delta, 1L, Seq(
        metaLine(Seq(mapped("id", "col-aa", 1L, LongType),
          mapped("v", "col-cc", 3L, StringType)), 3)))
      val e = intercept[Exception] { q.processAllAvailable() }
      val msgs = (Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
          ++ q.exception.iterator.flatMap(x =>
            Iterator.iterate(x: Throwable)(_.getCause).takeWhile(_ != null)
              .map(t => Option(t.getMessage).getOrElse(""))))
        .mkString(" | ")
      assert(msgs.contains("COLUMN MAPPING"),
        s"expected a column-mapping pin failure, got: $msgs")
    } finally q.stop()
  }

  test("graft-delta CHANGE-FEED tail: DV deletes, file removes, and rewrites stream as honest change rows; the loop converges a replica store") {
    import spark.implicits._
    val delta = tmp()
    val f0sz = deltaWrite(delta, "f0.parquet", frame(1 to 5, "a"))
    val f1sz = deltaWrite(delta, "f1.parquet", frame(6 to 10, "b"))
    val schema = spark.read.parquet(s"$delta/f0.parquet").schema
    deltaCommit(delta, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"cdc","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":${jq(schema.json)},""" +
        s""""partitionColumns":[],"configuration":{},"createdTime":0}}""",
      deltaAddLine("f0.parquet", f0sz), deltaAddLine("f1.parquet", f1sz)))
    def dvAdd(path: String, sz: Long, positions: Array[Long]): String = {
      val (d, s, c) = graft.etl.DeltaDv.inlineDescriptor(positions)
      s"""{"add":{"path":"$path","partitionValues":{},"size":$sz,""" +
        s""""modificationTime":0,"dataChange":true,"deletionVector":""" +
        s"""{"storageType":"i","pathOrInlineDv":"$d","sizeInBytes":$s,""" +
        s""""cardinality":$c}}}"""
    }
    val out = tmp(); val cp = tmp()
    def drainCdc(): Unit = {
      val q = spark.readStream.format("graft-delta")
        .option("path", delta).option("startingVersion", -1L)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def changes(v: Long): Set[(String, Long)] = spark.read.parquet(out)
      .filter($"_commit_version" === v)
      .collect().map(r =>
        (r.getAs[String]("_change_type"), r.getAs[Long]("id"))).toSet
    drainCdc()
    assert(changes(0L) == (1L to 10L).map(("insert", _)).toSet)
    // v1: DELETE ids 2,4 — Delta renders a DV delete as remove +
    // re-add of the same file carrying the grown vector
    deltaCommit(delta, 1L, Seq(
      """{"remove":{"path":"f0.parquet","deletionTimestamp":0,""" +
        """"dataChange":true}}""",
      dvAdd("f0.parquet", f0sz, Array(1L, 3L))))
    // v2: the DV GROWS {1,3}→{1,3,4} — only the newly-dead position
    // streams (the DIFF, not the whole vector)
    deltaCommit(delta, 2L, Seq(
      """{"remove":{"path":"f0.parquet","deletionTimestamp":0,""" +
        """"dataChange":true}}""",
      dvAdd("f0.parquet", f0sz, Array(1L, 3L, 4L))))
    drainCdc()
    assert(changes(1L) == Set(("delete", 2L), ("delete", 4L)))
    assert(changes(2L) == Set(("delete", 5L)),
      "a grown DV streams its diff only")
    // v3: a full-file remove deletes every still-live row of the file
    deltaCommit(delta, 3L, Seq(
      """{"remove":{"path":"f1.parquet","deletionTimestamp":0,""" +
        """"dataChange":true}}"""))
    // v4: OPTIMIZE (dataChange=false rewrite) — emits NOTHING, but the
    // state must advance through it
    val f2sz = deltaWrite(delta, "f2.parquet",
      Seq((1L, "a"), (3L, "a")).toDF("id", "tag"))
    deltaCommit(delta, 4L, Seq(
      deltaAddLine("f2.parquet", f2sz, dataChange = false),
      """{"remove":{"path":"f0.parquet","deletionTimestamp":0,""" +
        """"dataChange":false}}"""))
    // v5: removing the COMPACTED file attributes through the rewrite
    deltaCommit(delta, 5L, Seq(
      """{"remove":{"path":"f2.parquet","deletionTimestamp":0,""" +
        """"dataChange":true}}"""))
    // v6: fresh appends still stream as inserts
    val f3sz = deltaWrite(delta, "f3.parquet", frame(20 to 21, "c"))
    deltaCommit(delta, 6L, Seq(deltaAddLine("f3.parquet", f3sz)))
    drainCdc()
    assert(changes(3L) == (6L to 10L).map(("delete", _)).toSet)
    assert(changes(4L).isEmpty, "a rewrite is the same rows — silent")
    assert(changes(5L) == Set(("delete", 1L), ("delete", 3L)),
      "the remove of a compacted file attributes through the rewrite")
    assert(changes(6L) == Set(("insert", 20L), ("insert", 21L)))
    // REPLICATION LOOP over the whole history: graft-delta change feed
    // into the graft-snapshot applyChangeFeed sink — the replica
    // converges through every delete/rewrite to the live two rows
    val dstRoot = tmp(); val dst = new SnapshotStore(dstRoot)
    dst.commitTruncate(schema)
    val q = spark.readStream.format("graft-delta")
      .option("path", delta).option("startingVersion", -1L)
      .option("readChangeFeed", "true").load()
      .writeStream.format("graft-snapshot")
      .option("path", dstRoot).option("checkpointLocation", tmp())
      .option("mergeKeys", "id").option("applyChangeFeed", "true")
      .option("mergeOnRead", "true")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q.awaitTermination()
    assert(dst.read(spark).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((20L, "c"), (21L, "c")),
      "the replica equals the Delta table's live state")
    // the insert-only knob and the change feed are different contracts
    assert(intercept[IllegalArgumentException] {
      spark.readStream.format("graft-delta").option("path", delta)
        .option("readChangeFeed", "true").option("onDelete", "skip").load()
    }.getMessage.contains("insert-only"))
  }

  test("graft-delta tail reads ID-mode column-mapped tables: the pinned schema's field ids resolve columns Spark-natively") {
    import org.apache.spark.sql.types.{LongType, MetadataBuilder, StringType,
      StructField, StructType}
    import scala.jdk.CollectionConverters._
    val delta = tmp()
    // file columns named like NEITHER the logical nor physical names —
    // only the parquet field ids identify them
    val fileSchema = StructType(Seq(
      StructField("zz1", LongType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 1L).build()),
      StructField("zz2", StringType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 2L).build())))
    val sz = deltaWrite(delta, "m0.parquet", spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(7L, "x")).asJava, fileSchema))
    def idMapped(name: String, phys: String, id: Long,
        dt: org.apache.spark.sql.types.DataType) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putLong("delta.columnMapping.id", id)
        .putString("delta.columnMapping.physicalName", phys).build())
    val logical = StructType(Seq(
      idMapped("id", "col-aa", 1L, LongType),
      idMapped("v", "col-bb", 2L, StringType)))
    deltaCommit(delta, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"im","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":${jq(logical.json)},""" +
        s""""partitionColumns":[],"configuration":{""" +
        s""""delta.columnMapping.mode":"id",""" +
        s""""delta.columnMapping.maxColumnId":"2"},"createdTime":0}}""",
      deltaAddLine("m0.parquet", sz)))
    val out = tmp(); val cp = tmp()
    drainDelta(delta, out, cp)
    val got = spark.read.parquet(out)
    assert(got.columns.toSeq == Seq("id", "v"))
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((7L, "x")), "values resolve by FIELD ID, not by any name")
  }

  test("graft-delta tail reads PARTITIONED name-mapped tables: partition values come from the add actions, not the hive layout") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, MetadataBuilder, StringType,
      StructField, StructType}
    val delta = tmp()
    // physical column name on disk AND a physical-name partition dir —
    // the layout the snapshot store's adoption refuses, but the tail
    // never parses paths: partitionValues on the add are authoritative
    val sz = deltaWrite(delta, "col-dd=1/p0.parquet",
      Seq((100L)).toDF("col-aa"))
    def mapped(name: String, phys: String, id: Long,
        dt: org.apache.spark.sql.types.DataType) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putLong("delta.columnMapping.id", id)
        .putString("delta.columnMapping.physicalName", phys).build())
    val logical = StructType(Seq(
      mapped("id", "col-aa", 1L, LongType),
      mapped("day", "col-dd", 2L, LongType)))
    deltaCommit(delta, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"pm","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":${jq(logical.json)},""" +
        s""""partitionColumns":["day"],"configuration":{""" +
        s""""delta.columnMapping.mode":"name",""" +
        s""""delta.columnMapping.maxColumnId":"2"},"createdTime":0}}""",
      s"""{"add":{"path":"col-dd=1/p0.parquet",""" +
        s""""partitionValues":{"col-dd":"1"},"size":$sz,""" +
        s""""modificationTime":0,"dataChange":true}}"""))
    val out = tmp(); val cp = tmp()
    drainDelta(delta, out, cp)
    val got = spark.read.parquet(out)
    assert(got.columns.toSeq == Seq("id", "day"), "logical names surface")
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((100L, 1L)),
      "the physical-name partition key resolves through the mapping")
  }
}
