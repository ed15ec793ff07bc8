package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftStreamBridge, SaveMode, SQLContext}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider,
  DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType
import graft.etl.SnapshotStore

/** `spark.readStream.format("graft-snapshot")` — the snapshot store as
  * a first-class Structured Streaming source, closing the loop between
  * the versioned RAW zone and the streaming surface (the same coupling
  * the reference gets from Delta: its `sync.py` overwrites a Delta RAW
  * zone that downstream consumers can tail as a stream).
  *
  * The design writes itself because manifest versions ARE streaming
  * offsets: monotone longs, atomically published, each denoting an
  * immutable file set. So:
  *
  *   - `getOffset` = the store's latest committed version — no
  *     listing, no modification-time heuristics (the built-in file
  *     stream source's weak spot: it infers progress from directory
  *     state; here progress is a committed fact);
  *   - `getBatch(v1, v2]` = [[SnapshotStore.readInserts]] — appends
  *     contribute exactly their added files (O(increment) at any table
  *     size), overwrites are governed by the `onOverwrite` option
  *     ('fail' default / 'emitNew' / 'skip');
  *   - exactly-once delivery is the engine's offset log doing what it
  *     always does: a restarted query replays `(lastCommitted, latest]`
  *     from its checkpoint, and because versions are immutable the
  *     replay is byte-identical — no dedup state needed in the source.
  *
  * Options: `path` (store root, required), `onOverwrite`
  * (fail|emitNew|skip, default fail), `startingVersion` (long, default
  * -1 = from table creation; the first batch of a fresh query reads
  * everything after it). The stream's schema is pinned at query start
  * (latest manifest, or the user-provided schema): later evolved
  * columns null-pad under the pinned shape until the query restarts.
  *
  * V1 `Source` SPI deliberately: its `getBatch` returns a DataFrame, so
  * the micro-batch IS the ordinary distributed parquet scan over the
  * manifest's file list — same plan as the batch reader, vectorized
  * reader and all. (The DSv2 streaming SPI would force a hand-rolled
  * per-partition parquet reader for zero gain here.)
  */
final class SnapshotSourceProvider extends StreamSourceProvider
    with RelationProvider with CreatableRelationProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  private def storeFor(parameters: Map[String, String]): SnapshotStore =
    new SnapshotStore(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-snapshot source: option 'path' (store root) is required")))

  /** Batch side of the format — `spark.read.format("graft-snapshot")
    * .option("path", root)[.option("versionAsOf", v)].load()`. The
    * relation is a [[HadoopFsRelation]] over [[SnapshotFileIndex]], so
    * the query plans THROUGH the ordinary file-source path: vectorized
    * parquet reader, whole-stage codegen, filter/column pushdown into
    * the scan — plus manifest-stats file skipping at planning time for
    * any predicate on the stats column. Time travel is one option away
    * instead of a library call.
    */
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val store = storeFor(parameters)
    val byVersion = parameters.get("versionAsOf").map(_.toLong)
    val byTime = parameters.get("timestampAsOf").map { s =>
      // ISO-8601 instant, or the oracle-canonical 'yyyy-MM-dd HH:mm:ss' (UTC)
      val inst = try java.time.Instant.parse(s) catch {
        case _: java.time.format.DateTimeParseException =>
          java.time.LocalDateTime.parse(s.replace(' ', 'T'))
            .toInstant(java.time.ZoneOffset.UTC)
      }
      store.versionAt(inst)
    }
    require(byVersion.isEmpty || byTime.isEmpty,
      "graft-snapshot: versionAsOf and timestampAsOf are mutually exclusive")
    val asOf = byVersion.orElse(byTime)
    val spark = sqlContext.sparkSession
    val index = new SnapshotFileIndex(spark, store, asOf)
    HadoopFsRelation(
      location = index,
      partitionSchema = StructType(Nil),
      dataSchema = index.dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(spark)
  }

  /** Batch write side — `df.write.format("graft-snapshot")
    * .mode(...).option("path", root).save()`:
    * Overwrite → [[SnapshotStore.commitOverwrite]] (a new version, old
    * ones stay readable), Append → [[SnapshotStore.commitAppend]]
    * (honoring `mergeSchema`), ErrorIfExists/Ignore behave like their
    * file-sink namesakes against "the table has any committed version".
    * `statsColumn` opts into manifest file statistics at write time.
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val store = storeFor(parameters)
    val stats = parameters.get("statsColumn")
    val merge = parameters.get("mergeSchema").exists(_.toBoolean)
    mode match {
      case SaveMode.Overwrite => store.commitOverwrite(data, stats)
      case SaveMode.Append => store.commitAppend(data, stats, mergeSchema = merge)
      case SaveMode.ErrorIfExists =>
        if (store.latestVersion.isDefined)
          throw new IllegalStateException(
            s"graft-snapshot: table already has committed versions " +
              s"(latest ${store.latestVersion.get}); use mode overwrite/append")
        store.commitOverwrite(data, stats)
      case SaveMode.Ignore =>
        if (store.latestVersion.isEmpty) store.commitOverwrite(data, stats)
    }
    createRelation(sqlContext, parameters)
  }

  /** Streaming sink side — `writeStream.format("graft-snapshot")`:
    * Append mode commits each micro-batch as a new version, Complete
    * mode (streaming aggregations) publishes each result as a full
    * snapshot replace — history stays time-travelable either way. The
    * micro-batch's id is recorded in the manifest (`#txn`), so a
    * replayed batch after a checkpoint-recovery restart is a NO-OP:
    * exactly-once on top of the engine's at-least-once replay, the same
    * ledger idea as the JDBC sink's batch_id repair but with zero
    * repair — the duplicate commit simply never happens.
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "graft-snapshot sink: partitionBy is not supported (use statsColumn clustering)")
    require(outputMode == OutputMode.Append() || outputMode == OutputMode.Complete(),
      s"graft-snapshot sink: unsupported output mode $outputMode (Append|Complete)")
    new SnapshotStreamSink(storeFor(parameters), outputMode,
      parameters.get("statsColumn"),
      parameters.get("mergeSchema").exists(_.toBoolean),
      parameters.getOrElse("txnAppId", "default"))
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(storeFor(parameters).tableSchema()))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val store = storeFor(parameters)
    val pinned = schema.getOrElse(store.tableSchema())
    val onOverwrite = parameters.getOrElse("onOverwrite", "fail")
    val startingVersion = parameters.get("startingVersion").map(_.toLong).getOrElse(-1L)
    new SnapshotStreamSource(sqlContext, store, pinned, onOverwrite, startingVersion)
  }
}

final class SnapshotStreamSink(
    store: SnapshotStore,
    outputMode: OutputMode,
    statsColumn: Option[String],
    mergeSchema: Boolean,
    txnAppId: String = "default") extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // checkpoint replay of a batch THIS app already committed: no-op
    if (store.lastTxn(txnAppId).exists(_ >= batchId)) return
    val batch = GraftStreamBridge.asBatchFrame(data)
    if (outputMode == OutputMode.Complete())
      store.commitOverwrite(batch, statsColumn, txn = Some((txnAppId, batchId)))
    else
      store.commitAppend(batch, statsColumn, mergeSchema,
        txn = Some((txnAppId, batchId)))
  }

  override def toString: String = s"SnapshotStreamSink[$store, $outputMode]"
}

final class SnapshotStreamSource(
    sqlContext: SQLContext,
    store: SnapshotStore,
    pinned: StructType,
    onOverwrite: String,
    startingVersion: Long) extends Source {

  override def schema: StructType = pinned

  /** Latest committed version — a manifest listing, no data IO. */
  override def getOffset: Option[Offset] =
    store.latestVersion.map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion)
    val batch = store.readInserts(
      sqlContext.sparkSession, from, versionOf(end), pinned, onOverwrite)
    GraftStreamBridge.asStreamingFrame(batch, pinned)
  }

  /** Offsets come back as [[SerializedOffset]] after a checkpoint
    * restart — same JSON, different wrapper.
    */
  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  override def stop(): Unit = ()

  override def toString: String = s"SnapshotStreamSource[$store]"
}
