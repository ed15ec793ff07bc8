package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftStreamBridge, SaveMode, SQLContext}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider,
  DataSourceRegister, RelationProvider, SchemaRelationProvider,
  StreamSinkProvider, StreamSourceProvider}
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
  * everything after it), `maxVersionsPerTrigger` / `maxBytesPerTrigger`
  * (admission control — see below). The stream's schema is pinned at
  * query start (latest manifest, or the user-provided schema): later
  * evolved columns null-pad under the pinned shape until the query
  * restarts.
  *
  * ADMISSION CONTROL — the catch-up problem: a consumer restarting
  * after a week of backlog would otherwise read the WHOLE backlog as
  * ONE micro-batch (at 100 TB: unbounded memory and first-trigger
  * latency). `maxVersionsPerTrigger` caps each batch at that many
  * manifest versions past the last delivered offset;
  * `maxBytesPerTrigger` additionally stops extending the batch once
  * the versions' ADDED file bytes (manifest metadata — no data IO)
  * exceed the budget, always admitting at least one version so the
  * stream progresses. Both are per-trigger caps on `getOffset`; the
  * offsets the engine logs are exactly the capped ones, so
  * exactly-once checkpoint recovery is untouched — a restart mid
  * catch-up resumes from the last logged version and keeps paying out
  * in bounded batches. The last-delivered floor is persisted under the
  * query's own `metadataPath` (dot-temp + atomic rename), because on a
  * fully-committed restart `getOffset` runs before any `getBatch`
  * could re-teach the source its position — without the floor a capped
  * offset could regress below the engine's committed offset.
  *
  * V1 `Source` SPI deliberately: its `getBatch` returns a DataFrame, so
  * the micro-batch IS the ordinary distributed parquet scan over the
  * manifest's file list — same plan as the batch reader, vectorized
  * reader and all. (The DSv2 streaming SPI would force a hand-rolled
  * per-partition parquet reader for zero gain here.)
  */
final class SnapshotSourceProvider extends StreamSourceProvider
    with RelationProvider with SchemaRelationProvider
    with CreatableRelationProvider
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
      // ISO-8601 instant (zone carried in the literal), or a zone-less
      // 'yyyy-MM-dd HH:mm:ss' resolved in the SESSION timezone — the
      // Spark convention for timestamp literals (UTC sessions, the
      // oracle configuration, behave exactly as before)
      val zone = java.time.ZoneId.of(
        sqlContext.sparkSession.sessionState.conf.sessionLocalTimeZone)
      val inst = try java.time.Instant.parse(s) catch {
        case _: java.time.format.DateTimeParseException =>
          java.time.LocalDateTime.parse(s.replace(' ', 'T'))
            .atZone(zone).toInstant
      }
      store.versionAt(inst)
    }
    require(byVersion.isEmpty || byTime.isEmpty,
      "graft-snapshot: versionAsOf and timestampAsOf are mutually exclusive")
    val asOf = byVersion.orElse(byTime)
    val spark = sqlContext.sparkSession
    // a version with LIVE merge-on-read deletion vectors cannot plan
    // through a plain file scan — fall back to the DV-applying
    // TableScan relation (correct rows, no planning-time skipping)
    // until compaction materializes the tombstones. Same fallback for
    // an ACTIVE COLUMN MAPPING (renamed/re-added columns): the files
    // store physical names only the store's own scan knows to rename.
    if (store.manifestAt(asOf)._3.exists(_.hasDv) ||
        store.hasColumnMapping(asOf))
      return new SnapshotDvRelation(spark, store, asOf)
    val index = new SnapshotFileIndex(spark, store, asOf)
    HadoopFsRelation(
      location = index,
      partitionSchema = index.partitionSchema,
      dataSchema = index.dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(spark)
  }

  /** Declared-schema creation — `CREATE TABLE t (id BIGINT, v STRING)
    * USING graft-snapshot OPTIONS (path ...)`: an empty store is BORN
    * with the declared shape (an empty version-0 manifest), so the
    * SQL-first workflow `CREATE TABLE` → `INSERT INTO` works without a
    * DataFrame write ever touching the table. Against an existing
    * store the declared schema must match the manifest — a silently
    * divergent catalog entry is how readers rot.
    */
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String], schema: StructType): BaseRelation = {
    val store = storeFor(parameters)
    store.latestVersion match {
      case None =>
        // the SQL-first birth may declare the table's layout and stats
        // properties too: CREATE TABLE ... OPTIONS (path ...,
        // partitionBy 'day', statsColumn 'id,bucket')
        val parts = parameters.get("partitionBy")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
        store.commitTruncate(schema, parameters.get("statsColumn"), parts)
      case Some(v) =>
        val table = store.tableSchema()
        val t = table.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
        val d = schema.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
        require(t == d,
          s"graft-snapshot: declared schema ${schema.simpleString} does not " +
            s"match the store's version-$v schema ${table.simpleString}")
    }
    createRelation(sqlContext, parameters)
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
    // `df.write.partitionBy(...)` arrives JSON-encoded under the
    // writer's internal key; an explicit `partitionBy` option (comma
    // separated) is accepted too
    val parts: Seq[String] =
      parameters.get("partitionBy").map(_.split(",").map(_.trim).toSeq)
        .orElse(parameters.get("__partition_columns").map(
          _.stripPrefix("[").stripSuffix("]")
            .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
            .filter(_.nonEmpty)))
        .getOrElse(Nil)
    mode match {
      case SaveMode.Overwrite => store.commitOverwrite(data, stats, partitionBy = parts)
      case SaveMode.Append =>
        require(parts.isEmpty || store.latestVersion.isEmpty,
          "graft-snapshot: partitionBy applies when the table is created; " +
            "appends inherit the table's partitioning")
        if (store.latestVersion.isEmpty && parts.nonEmpty)
          store.commitOverwrite(data, stats, partitionBy = parts)
        else store.commitAppend(data, stats, mergeSchema = merge)
      case SaveMode.ErrorIfExists =>
        if (store.latestVersion.isDefined)
          throw new IllegalStateException(
            s"graft-snapshot: table already has committed versions " +
              s"(latest ${store.latestVersion.get}); use mode overwrite/append")
        store.commitOverwrite(data, stats, partitionBy = parts)
      case SaveMode.Ignore =>
        if (store.latestVersion.isEmpty)
          store.commitOverwrite(data, stats, partitionBy = parts)
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
    *
    * Two Append-mode variants: `writeStream.partitionBy(cols)` makes
    * the FIRST batch create the table hive-partitioned (appends inherit
    * the layout), and `option("mergeKeys", "k1,k2")` turns every
    * micro-batch into a copy-on-write UPSERT by key — the streaming CDC
    * apply path, with the same `#txn` exactly-once.
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append() || outputMode == OutputMode.Complete(),
      s"graft-snapshot sink: unsupported output mode $outputMode (Append|Complete)")
    require(partitionColumns.isEmpty || outputMode == OutputMode.Append(),
      "graft-snapshot sink: partitionBy requires Append mode")
    val mergeKeys = parameters.get("mergeKeys")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    require(mergeKeys.isEmpty || outputMode == OutputMode.Append(),
      "graft-snapshot sink: mergeKeys requires Append mode " +
        "(each micro-batch upserts by key)")
    val mergeOnRead = parameters.get("mergeOnRead").exists(_.toBoolean)
    require(!mergeOnRead || mergeKeys.nonEmpty,
      "graft-snapshot sink: mergeOnRead applies to the mergeKeys upsert " +
        "path (plain appends never rewrite files)")
    val applyChangeFeed = parameters.get("applyChangeFeed").exists(_.toBoolean)
    require(!applyChangeFeed || mergeKeys.nonEmpty,
      "graft-snapshot sink: applyChangeFeed needs mergeKeys (the key the " +
        "change rows replace/delete by)")
    new SnapshotStreamSink(storeFor(parameters), outputMode,
      parameters.get("statsColumn"),
      parameters.get("mergeSchema").exists(_.toBoolean),
      parameters.getOrElse("txnAppId", "default"),
      partitionColumns, mergeKeys, mergeOnRead, applyChangeFeed)
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val base = schema.getOrElse(storeFor(parameters).tableSchema())
    val cdc = parameters.get("readChangeFeed").exists(_.toBoolean)
    (shortName(), if (cdc) SnapshotStreamSource.cdcSchema(base) else base)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val store = storeFor(parameters)
    val cdc = parameters.get("readChangeFeed").exists(_.toBoolean)
    // under readChangeFeed the engine hands back the WIDENED schema
    // from sourceSchema — strip the meta columns to recover the pinned
    // table shape the change frames are shaped onto
    val pinned = schema.map(s =>
      if (!cdc) s
      else StructType(s.fields.filterNot(f =>
        f.name == "_change_type" || f.name == "_commit_version")))
      .getOrElse(store.tableSchema())
    val onOverwrite = parameters.getOrElse("onOverwrite", "fail")
    val startingVersion = parameters.get("startingVersion").map(_.toLong).getOrElse(-1L)
    val maxVersions = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    val maxBytes = parameters.get("maxBytesPerTrigger").map(_.toLong)
    maxVersions.foreach(v => require(v >= 1L,
      s"graft-snapshot source: maxVersionsPerTrigger must be >= 1, got $v"))
    maxBytes.foreach(b => require(b >= 1L,
      s"graft-snapshot source: maxBytesPerTrigger must be >= 1, got $b"))
    new SnapshotStreamSource(sqlContext, store, pinned, onOverwrite,
      startingVersion, maxVersions, maxBytes, metadataPath, cdc)
  }
}

final class SnapshotStreamSink(
    store: SnapshotStore,
    outputMode: OutputMode,
    statsColumn: Option[String],
    mergeSchema: Boolean,
    txnAppId: String = "default",
    partitionBy: Seq[String] = Nil,
    mergeKeys: Seq[String] = Nil,
    mergeOnRead: Boolean = false,
    applyChangeFeed: Boolean = false) extends Sink {

  /** Highest batch id THIS sink instance committed (or found committed
    * on its first scan). `lastTxn` walks manifests newest-first — O(1)
    * when the app's marker is near the tail, but O(versions × files)
    * driver text IO when it ISN'T there at all (first batch of a new
    * app against a long batch-written history — every manifest read in
    * full). One scan per sink lifetime is enough: a txnAppId has a
    * single writer by contract, so after the first lookup the cache is
    * authoritative and each commit advances it locally.
    */
  private var cachedTxn: Option[Long] = None
  private var scanned = false

  /** Schema evolution for the MERGE sinks (mergeKeys / applyChangeFeed):
    * a batch carrying columns the target table lacks means the SOURCE
    * evolved — after a restart re-pins the stream's schema, the change
    * rows arrive wider than the replica. Silently dropping the new
    * column would desynchronize the replication loop forever, and
    * refusing would wedge it; with `mergeSchema = true` the replica
    * EVOLVES (one O(manifest) ADD COLUMNS commit — old rows null-pad),
    * mirroring `commitAppend(mergeSchema)`. A concurrent shard applier
    * may win the widening race — "already exists" then just means done.
    * Returns the (possibly widened) target schema.
    */
  private def evolveForBatch(batch: DataFrame,
      metaCols: Set[String]): StructType = {
    val table = store.tableSchema()
    val extra = batch.schema.fields.filterNot(f =>
      table.fieldNames.contains(f.name) || metaCols.contains(f.name))
    if (extra.isEmpty) return table
    require(mergeSchema,
      s"graft-snapshot sink: batch carries columns the table lacks " +
        s"(${extra.map(_.name).mkString(", ")}) — the source evolved; set " +
        "option(\"mergeSchema\", \"true\") to evolve the target, or drop " +
        "them upstream")
    try store.addColumns(StructType(extra.map(_.copy(nullable = true))))
    catch {
      case e: IllegalArgumentException if e.getMessage != null &&
          e.getMessage.contains("already exists") => () // a racer widened first
    }
    store.tableSchema()
  }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    if (!scanned) { cachedTxn = store.lastTxn(txnAppId); scanned = true }
    // checkpoint replay of a batch THIS app already committed: no-op
    if (cachedTxn.exists(_ >= batchId)) return
    val batch = GraftStreamBridge.asBatchFrame(data)
    if (outputMode == OutputMode.Complete())
      store.commitOverwrite(batch, statsColumn, txn = Some((txnAppId, batchId)))
    else if (store.latestVersion.isEmpty) {
      // the FIRST batch creates the table (hive-partitioned when
      // `writeStream.partitionBy(...)` asked for it); later batches
      // append or upsert against it. EXCEPT under applyChangeFeed: a
      // change batch is not a table image — silently enthroning it
      // (meta columns and all) would corrupt the replica's schema
      require(!applyChangeFeed,
        "graft-snapshot sink(applyChangeFeed): the target table does not " +
          "exist — create it first (CREATE TABLE / commitTruncate) so the " +
          "change rows have a schema to apply against")
      store.commitOverwrite(batch, statsColumn, txn = Some((txnAppId, batchId)),
        partitionBy = partitionBy)
    }
    else if (mergeKeys.nonEmpty && applyChangeFeed) {
      // CHANGE-FEED APPLY — the consumer half of CDC replication: the
      // batch is change ROWS (a readChangeFeed stream's shape — table
      // columns + `_change_type` [+ `_commit_version`]). Collapse to
      // the FINAL state per key first: within the newest commit that
      // touched a key, an insert beats a delete (a commit emitting
      // delete(old)+insert(new) for one key IS an update); a key whose
      // final change is a bare delete becomes a 'D'. One op-coded
      // commit applies it — deletes included, which plain mergeKeys
      // upserting cannot do — with the same #txn exactly-once.
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{col, desc, lit, row_number, when}
      require(batch.columns.contains("_change_type"),
        "graft-snapshot sink(applyChangeFeed): batch lacks _change_type " +
          "(read the upstream with option(\"readChangeFeed\", \"true\"))")
      val table = evolveForBatch(batch,
        metaCols = Set("_change_type", "_commit_version", "__ver", "__rn", "__op"))
      val have = batch.columns.toSet
      val missing = table.fieldNames.filterNot(have.contains)
      require(missing.isEmpty,
        s"graft-snapshot sink(applyChangeFeed): batch lacks table columns " +
          missing.mkString(", "))
      // ORDERING AUTHORITY: without _commit_version every change in the
      // batch would collapse into one pseudo-commit where insert always
      // beats delete — a foreign feed carrying insert-then-delete for a
      // key would make the replica KEEP a row the source deleted.
      // readChangeFeed always carries the column; a feed that lacks it
      // has no defined order and is refused loudly.
      require(have.contains("_commit_version"),
        "graft-snapshot sink(applyChangeFeed): batch lacks _commit_version " +
          "— change ordering is undefined without it (an insert-then-delete " +
          "key would resolve to the insert); read the upstream with " +
          "option(\"readChangeFeed\", \"true\"), which carries it")
      val ver = col("_commit_version")
      val w = Window.partitionBy(mergeKeys.map(col): _*)
        .orderBy(desc("__ver"),
          when(col("_change_type") === "insert", lit(0)).otherwise(lit(1)))
      val finalState = batch.withColumn("__ver", ver)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .withColumn("__op",
          when(col("_change_type") === "insert", lit("U")).otherwise(lit("D")))
      val shaped = finalState.select(
        table.fields.toSeq.map(f => col(f.name).cast(f.dataType).as(f.name)) :+
          col("__op"): _*)
      store.applyChanges(batch.sparkSession, shaped, mergeKeys,
        opCol = "__op", txn = Some((txnAppId, batchId)),
        mergeOnRead = mergeOnRead)
    }
    else if (mergeKeys.nonEmpty) {
      // STREAMING CDC APPLY: each micro-batch is a copy-on-write upsert
      // by key — stats-pruned candidates, touched files rewritten,
      // exactly-once via the same #txn ledger (a replayed batch whose
      // merge already committed is a no-op; a merge that failed
      // committed NOTHING, so the engine's replay re-runs it cleanly).
      // Shape onto the table's column ORDER first: mergeInto's schema
      // check is positional, and a partitionBy first batch normalized
      // the partition columns last — without the re-select any input
      // whose partition column isn't already last dies from batch 2 on.
      import org.apache.spark.sql.functions.col
      val table = evolveForBatch(batch, metaCols = Set.empty)
      val have = batch.columns.toSet
      val missing = table.fieldNames.filterNot(have.contains)
      require(missing.isEmpty,
        s"graft-snapshot sink(mergeKeys): batch lacks table columns " +
          missing.mkString(", "))
      val shaped = batch.select(table.fields.toSeq.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
      // `option("mergeOnRead", "true")` switches the physics: each
      // batch tombstones the matched rows through one DV sidecar and
      // appends its delta — O(delta) per trigger instead of rewriting
      // every hit file, with OPTIMIZE materializing tombstones on
      // maintenance cadence (the steady-CDC-stream configuration).
      store.mergeInto(batch.sparkSession, shaped, mergeKeys,
        txn = Some((txnAppId, batchId)), mergeOnRead = mergeOnRead)
    }
    else
      store.commitAppend(batch, statsColumn, mergeSchema,
        txn = Some((txnAppId, batchId)))
    cachedTxn = Some(batchId)
  }

  override def toString: String = s"SnapshotStreamSink[$store, $outputMode]"
}

object SnapshotStreamSource {
  import org.apache.spark.sql.types.{LongType, StringType, StructField}
  /** The change-feed stream shape: table columns + the feed's meta. */
  def cdcSchema(table: StructType): StructType = StructType(
    table.fields.toSeq :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", LongType, nullable = false))
}

final class SnapshotStreamSource(
    sqlContext: SQLContext,
    store: SnapshotStore,
    pinned: StructType,
    onOverwrite: String,
    startingVersion: Long,
    maxVersionsPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None,
    metadataPath: String = "",
    readChangeFeed: Boolean = false) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2,
    ReadLimit}

  private val rateLimited = maxVersionsPerTrigger.isDefined || maxBytesPerTrigger.isDefined

  // Admission control is only SAFE when the floor survives a restart:
  // with a non-persistable metadataPath a fully-committed restart's
  // first getOffset would count its cap from startingVersion, return an
  // offset BELOW the engine's committed one, and every later trigger
  // would silently re-deliver versions the checkpoint already owns.
  // Refuse loudly instead (readInserts' inverted-range require is the
  // second line of defense).
  require(!rateLimited || metadataPath.isEmpty || floorFile.isDefined,
    "graft-snapshot source: maxVersionsPerTrigger/maxBytesPerTrigger " +
      s"require a local (file:) checkpoint to persist the delivery floor; " +
      s"metadataPath '$metadataPath' has a non-local scheme — drop the rate " +
      "limit or use a local checkpointLocation")

  /** The floor: highest version ever handed to the engine. In-memory
    * for the running query; persisted under `metadataPath` (local
    * checkpoints; dot-temp + atomic rename) so a fully-committed
    * restart's FIRST `getOffset` — which runs before any `getBatch`
    * could re-teach the position — never returns a capped offset below
    * the engine's committed one. The floor only ever RAISES the base a
    * capped offset counts from; `getBatch` always reads the engine's
    * own (start, end] range, so a stale floor can delay but never skip
    * or duplicate data.
    */
  private var floor: Long = math.max(startingVersion, persistedFloor.getOrElse(Long.MinValue))

  private def floorFile: Option[java.nio.file.Path] =
    if (!rateLimited || metadataPath.isEmpty) None
    else {
      val asUri = try { val u = new java.net.URI(metadataPath)
        Option(u.getScheme).map(_ => u) }
      catch { case _: java.net.URISyntaxException => None }
      asUri match {
        case Some(u) if u.getScheme == "file" =>
          Some(java.nio.file.Paths.get(
            Option(u.getPath).getOrElse(u.getSchemeSpecificPart), "graft-floor"))
        case Some(u) if u.getScheme != null && u.getScheme.length > 1 =>
          None // non-local checkpoint: refused at construction above
        case _ => Some(java.nio.file.Paths.get(metadataPath, "graft-floor"))
      }
    }

  private def persistedFloor: Option[Long] = floorFile.flatMap { p =>
    if (!java.nio.file.Files.isRegularFile(p)) None
    else try Some(new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
    catch { case _: NumberFormatException => None } // torn write: safe fallback
  }

  private def advanceFloor(v: Long): Unit = {
    if (v <= floor) return
    floor = v
    floorFile.foreach { p =>
      java.nio.file.Files.createDirectories(p.getParent)
      val tmp = p.getParent.resolve(s".tmp-floor-${java.util.UUID.randomUUID}")
      java.nio.file.Files.write(tmp,
        v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Total bytes of the files version `v` ADDED over its predecessor —
    * manifest metadata ONLY (sizes are recorded at commit time; the
    * stat fallback fires only for pre-size manifests), no data IO and
    * no per-file HEAD storm per trigger tick. Conservative for rewrite
    * versions (their bytes count against the budget though they emit no
    * rows — batches only ever get smaller).
    */
  private def addedBytes(v: Long): Long = {
    // a vacuumed version inside the pending range: contribute nothing
    // here — getBatch will fail LOUDLY with readInserts' recovery
    // recipe, which beats an opaque missing-manifest error at offset
    // time
    if (!store.versions.contains(v)) return 0L
    val cur = store.manifestAt(Some(v))._3
    val prevPaths: Set[String] =
      if (!store.versions.contains(v - 1)) Set.empty
      else store.manifestAt(Some(v - 1))._3.map(_.absPath).toSet
    cur.filterNot(e => prevPaths.contains(e.absPath))
      .map(store.infoBytes).sum
  }

  override def schema: StructType =
    if (readChangeFeed) SnapshotStreamSource.cdcSchema(pinned) else pinned

  // AvailableNow contract: the store's tip is LATCHED at query start —
  // the run drains to exactly there (in capped batches when
  // rate-limited) and terminates, even while commits keep landing.
  // Native support also lets a restart with a pending batch replay it
  // AND continue in one run (the engine's fallback stops after the
  // replay).
  private var availableNowCap: Option[Option[Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(store.latestVersion)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 =
    getOffset.orNull

  override def reportLatestOffset(): OffsetV2 =
    store.latestVersion.map(LongOffset(_)).orNull

  override def initialOffset(): OffsetV2 = LongOffset(startingVersion)

  override def deserializeOffset(json: String): OffsetV2 =
    LongOffset(json.trim.toLong)

  override def commit(end: OffsetV2): Unit = ()

  /** Latest committed version (latched during an AvailableNow run),
    * capped by the per-trigger admission budget counted from the last
    * delivered offset — manifest metadata only, no data IO.
    */
  override def getOffset: Option[Offset] = {
    val latest = availableNowCap.getOrElse(store.latestVersion)
      .getOrElse(return None)
    if (!rateLimited) return Some(LongOffset(latest))
    val base = math.max(floor, startingVersion)
    // caught up (base == latest; base > latest cannot happen — the
    // floor only ever records versions that exist): re-announce the
    // latest offset, which equals the engine's committed one → no batch
    if (latest <= base) return Some(LongOffset(latest))
    var target = base
    val capByCount = maxVersionsPerTrigger.map(base + _).getOrElse(Long.MaxValue)
    var budget = maxBytesPerTrigger.getOrElse(Long.MaxValue)
    while (target < latest && target < capByCount && budget > 0L) {
      target += 1L
      budget -= addedBytes(target)
    }
    advanceFloor(target)
    Some(LongOffset(target))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion)
    val to = versionOf(end)
    advanceFloor(to)
    // The stream's schema is PINNED at query start; columns the table
    // gains later are legitimately invisible until restart, and a
    // pinned column absent from an EARLY version (catch-up batches:
    // born later, null-pads) is fine. What is NOT fine: a pinned
    // column absent from the batch-end version AND from the live
    // table — it was RENAMED or DROPPED mid-stream, and silently
    // null-padding it would deliver wrong rows forever. Loud, with the
    // recovery recipe. A vacuumed batch-end version skips the guard —
    // the read below fails with its own (better) recovery message.
    scala.util.Try(store.tableSchema(Some(to))).foreach { endSchema =>
      val end = endSchema.fieldNames.toSet
      lazy val live = store.tableSchema().fieldNames.toSet
      val gone = pinned.fieldNames
        .filterNot(end.contains).filterNot(live.contains)
      if (gone.nonEmpty)
        throw new IllegalStateException(
          s"graft-snapshot source: columns ${gone.mkString(", ")} of the " +
            s"stream's pinned schema were renamed or dropped by version $to " +
            "— restart the stream to re-pin the evolved schema")
    }
    if (readChangeFeed) {
      // CDC stream: every commit in (from, to] as change ROWS —
      // appends emit inserts, CoW/MoR row-level DML emits its honest
      // deletes+inserts, an overwrite emits delete(old)+insert(new)
      // (the CDC-correct rendering — no onOverwrite policy needed),
      // rewrites emit nothing. Vacuumed predecessors fail loudly with
      // readChanges' own recovery recipe.
      import org.apache.spark.sql.functions.{col, lit}
      val spark = sqlContext.sparkSession
      val out = SnapshotStreamSource.cdcSchema(pinned)
      val raw = store.readChanges(spark, from, Some(to))
      // older versions' schemas may lack later-evolved columns: pad to
      // the pinned shape exactly like the insert stream does
      val padded = out.fields.foldLeft(raw)((df, f) =>
        if (df.columns.contains(f.name)) df
        else df.withColumn(f.name, lit(null).cast(f.dataType)))
      val shaped = padded.select(out.fields.toSeq.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
      GraftStreamBridge.asStreamingFrame(shaped, out)
    } else {
      val batch = store.readInserts(
        sqlContext.sparkSession, from, to, pinned, onOverwrite)
      GraftStreamBridge.asStreamingFrame(batch, pinned)
    }
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
