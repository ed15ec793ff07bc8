package graft.streaming

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, GraftStreamBridge, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{DataType, StructType}
import graft.etl.DeltaConvert

/** CONTINUOUS DELTA TAILING — the migration-in-flight bridge: a
  * Structured Streaming SOURCE that follows a live Delta table's
  * `_delta_log/` versions as offsets, so a replica (a graft snapshot
  * store, a warehouse, anything `writeStream` reaches) converges while
  * the legacy pipeline still writes Delta (the reference's RAW zone,
  * `sync.py:112-114`). The streaming twin of
  * [[graft.etl.SnapshotStore.convertFromDelta]]: adopt once for the
  * snapshot, then `readStream.format("graft-delta")
  * .option("path", deltaRoot).option("startingVersion", adoptedV)` for
  * everything after — each Delta commit arrives as one exactly-once
  * micro-batch (offsets checkpoint with the query; `getBatch` re-reads
  * a replayed range deterministically from the immutable log).
  *
  * Insert-only by contract, loudly: the tail delivers each version's
  * `dataChange = true` ADD files. `dataChange = false` add/remove
  * pairs (OPTIMIZE rewrites) emit nothing — same rows, new layout. A
  * data-changing REMOVE (overwrite/DELETE) fails the query by default
  * (`onDelete = "fail"`; `"skip"` opts out) — silently treating a
  * shrinking table as append-only is how replicas diverge. An add
  * carrying a DELETION VECTOR mid-tail is row-level DML, refused the
  * same way (re-adopt + change-feed replication is the DML path). A
  * `metaData` schema change mid-tail fails loudly (restart re-pins,
  * exactly the snapshot source's rule); a `protocol` upgrade to
  * features this reader cannot honor fails through the shared
  * [[DeltaConvert.checkProtocol]] gate. A MISSING version file inside
  * the range (log cleaned past the checkpointed offset) fails with a
  * re-adopt recipe rather than skipping data.
  */
final class DeltaTailSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-delta"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta source: option 'path' (the Delta table root) is required"))

  private def readChangeFeedOf(parameters: Map[String, String]): Boolean = {
    val cdc = parameters.get("readChangeFeed").exists(_.toBoolean)
    require(!cdc || !parameters.contains("onDelete"),
      "graft-delta source: onDelete is the insert-only contract's knob — " +
        "a change-feed tail DELIVERS deletes; drop one of the options")
    cdc
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    // metadata-only replay: schema resolution never needs tombstones
    val st = DeltaConvert.replay(sqlContext.sparkSession, rootOf(parameters),
      decodeDvs = false)
    val table = schema.getOrElse(st.schema)
    (shortName(),
      if (readChangeFeedOf(parameters)) SnapshotStreamSource.cdcSchema(table)
      else table)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val root = rootOf(parameters)
    val st = DeltaConvert.replay(sqlContext.sparkSession, root,
      decodeDvs = false)
    val onDelete = parameters.getOrElse("onDelete", "fail")
    require(onDelete == "fail" || onDelete == "skip",
      s"graft-delta source: onDelete must be 'fail' or 'skip', got '$onDelete'")
    // default = tail from NOW (the adopt-then-tail flow passes the
    // adopted version); -1 replays the whole log as the first batch.
    // The RESOLVED default is pinned under metadataPath on first start:
    // re-resolving "now" after a crash-restart would move the floor
    // past versions whose batch WAL'd but never committed, silently
    // dropping them — the stream's zero point is query state, exactly
    // like the checkpointed offsets it anchors.
    val startingVersion = DeltaTailSource.pinStartingVersion(
      sqlContext, metadataPath,
      parameters.get("startingVersion").map(_.toLong).getOrElse(st.version))
    new DeltaTailSource(sqlContext, root, schema.getOrElse(st.schema),
      st.colMap, st.partitionColumns, startingVersion, onDelete,
      readChangeFeed = readChangeFeedOf(parameters))
  }
}

object DeltaTailSource {

  /** Resolve the stream's zero-point version: the value persisted under
    * `metadataPath` when one exists (restart), otherwise `resolved`
    * written there first (initial start — temp file + rename, the
    * checkpoint filesystem's own atomicity).
    */
  private[streaming] def pinStartingVersion(sqlContext: SQLContext,
      metadataPath: String, resolved: Long): Long = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(metadataPath)
    val fs = dir.getFileSystem(
      sqlContext.sparkSession.sparkContext.hadoopConfiguration)
    val file = new Path(dir, "startingVersion")
    def readPinned(): Long = {
      val in = fs.open(file)
      try new java.io.BufferedReader(
        new java.io.InputStreamReader(in, "UTF-8")).readLine().trim.toLong
      finally in.close()
    }
    if (fs.exists(file)) readPinned()
    else {
      fs.mkdirs(dir)
      val tmp = new Path(dir,
        s".startingVersion.${java.util.UUID.randomUUID}.tmp")
      val out = fs.create(tmp, false)
      try out.write(s"$resolved\n".getBytes("UTF-8")) finally out.close()
      if (fs.rename(tmp, file)) resolved
      else { // lost a (theoretical) race: the winner's pin governs
        fs.delete(tmp, false)
        readPinned()
      }
    }
  }
}

final class DeltaTailSource(
    sqlContext: SQLContext,
    deltaRoot: String,
    pinned: StructType,
    colMap: Map[String, String],
    partCols: Seq[String],
    startingVersion: Long,
    onDelete: String,
    readChangeFeed: Boolean = false) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2,
    ReadLimit}

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper
  private val root = Paths.get(deltaRoot).toAbsolutePath.normalize
  private val logDir = root.resolve("_delta_log")
  private val JsonFile = """(\d{20})\.json""".r

  override def schema: StructType =
    if (readChangeFeed) SnapshotStreamSource.cdcSchema(pinned) else pinned

  /** Newest version file in the log — one directory list, no data IO. */
  private def liveMax(): Option[Long] = {
    val s = Files.list(logDir)
    val max = try s.iterator().asScala.map(_.getFileName.toString)
      .collect { case JsonFile(v) => v.toLong }
      .foldLeft(-1L)(_ max _)
    finally s.close()
    if (max < 0) None else Some(max)
  }

  // AvailableNow contract: the log tip is LATCHED at query start and
  // the run drains to exactly there — a live writer committing during
  // the drain cannot keep the "finite" run alive forever. Supporting
  // the trigger natively also means a restart with a pending
  // (WAL'd-but-uncommitted) batch replays it AND continues to the
  // latched tip in the same run, instead of the engine's single-batch
  // fallback that stops after the replay.
  private var availableNowCap: Option[Option[Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(liveMax())

  override def getOffset: Option[Offset] =
    availableNowCap.getOrElse(liveMax()).map(LongOffset(_))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 =
    getOffset.orNull

  override def reportLatestOffset(): OffsetV2 =
    liveMax().map(LongOffset(_)).orNull

  override def initialOffset(): OffsetV2 = LongOffset(startingVersion)

  override def deserializeOffset(json: String): OffsetV2 =
    LongOffset(json.trim.toLong)

  override def commit(end: OffsetV2): Unit = ()

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion)
    val to = versionOf(end)
    if (readChangeFeed) return cdcBatch(from, to)
    val spark = sqlContext.sparkSession
    // (path, partitionValues) of every data-changing add in the range
    val adds = ((from + 1) to to).flatMap { v =>
      val f = logDir.resolve(f"$v%020d.json")
      require(Files.isRegularFile(f),
        s"graft-delta source: version file ${f.getFileName} is missing — " +
          "the log was cleaned past this stream's checkpointed offset; " +
          "re-adopt the table (convertFromDelta) and restart the tail " +
          "from the adopted version")
      Files.readAllLines(f).asScala.filter(_.trim.nonEmpty).flatMap { line =>
        val action = mapper.readTree(line)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Map[String, Option[String]])]
        val it = action.fields()
        while (it.hasNext) {
          val e = it.next()
          e.getKey match {
            case "add" =>
              val node = e.getValue
              val dataChange = Option(node.get("dataChange"))
                .forall(_.asBoolean(true))
              val dv = Option(node.get("deletionVector")).filterNot(_.isNull)
              require(dv.isEmpty,
                s"graft-delta source: version $v adds a DELETION VECTOR — " +
                  "row-level DML cannot stream as inserts; re-adopt the " +
                  "table and replicate through a change feed instead")
              if (dataChange) {
                val pv: Map[String, Option[String]] =
                  Option(node.get("partitionValues")).filterNot(_.isNull)
                    .map(_.fields().asScala.map(kv =>
                      kv.getKey -> (if (kv.getValue.isNull) None
                      else Some(kv.getValue.asText()))).toMap)
                    .getOrElse(Map.empty)
                out += ((DeltaConvert.decodePath(
                  node.get("path").asText()), pv))
              }
            case "remove" =>
              val dataChange = Option(e.getValue.get("dataChange"))
                .forall(_.asBoolean(true))
              require(!dataChange || onDelete == "skip",
                s"graft-delta source: version $v REMOVES " +
                  s"${e.getValue.get("path").asText()} with dataChange — " +
                  "the tail is insert-only; pass onDelete='skip' to ignore " +
                  "deletes deliberately, or replicate through a change feed")
            case "metaData" => pinGuard(e.getValue, v)
            case "protocol" => protocolGuard(e.getValue)
            case _ => () // txn / commitInfo / cdc: no tail state
          }
        }
        out
      }
    }
    GraftStreamBridge.asStreamingFrame(readAdds(adds), pinned)
  }

  /** Read the added files under the pinned LOGICAL schema: physical
    * names requested from parquet when the table is name-mapped,
    * partition values re-attached from the add actions' own
    * `partitionValues` (authoritative — no path parsing).
    */
  private def readAdds(
      adds: Seq[(String, Map[String, Option[String]])]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val spark = sqlContext.sparkSession
    val dataFields = pinned.fields.filterNot(f => partCols.contains(f.name))
    def phys(c: String) = colMap.getOrElse(c, c)
    val physSchema = StructType(dataFields.map(f => f.copy(name = phys(f.name))))
    if (adds.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pinned)
    val groups = adds.groupBy(_._2).toSeq.sortBy(_._1.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=${v.getOrElse("")}" }.mkString("/"))
    groups.map { case (pv, paths) =>
      val base = spark.read.schema(physSchema)
        .parquet(paths.map(p => root.resolve(p._1).toString).distinct: _*)
        .select(dataFields.toSeq.map(f => col(phys(f.name)).as(f.name)): _*)
      val withParts = partCols.foldLeft(base) { (df, c) =>
        val f = pinned(c)
        // a physical-name key is legal under column mapping
        val raw = pv.getOrElse(c, pv.getOrElse(phys(c), None))
        df.withColumn(c, raw.map(lit(_)).getOrElse(lit(null)).cast(f.dataType))
      }
      withParts.select(pinned.fieldNames.toSeq.map(col): _*)
    }.reduce(_.unionByName(_))
  }

  /** Mid-stream metaData guard: the logical schema AND the physical
    * column mapping are pinned at query start. A drop + re-add of a
    * column keeps the logical schema identical but moves its
    * physicalName, and reading old physical names from new files
    * returns silent NULLs — exactly the divergence this guard stops.
    */
  private def pinGuard(node: com.fasterxml.jackson.databind.JsonNode,
      v: Long): Unit = {
    val newSchema = DataType.fromJson(
      node.get("schemaString").asText()).asInstanceOf[StructType]
    val stripped = StructType(newSchema.fields.map(f =>
      f.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))
    require(stripped == StructType(pinned.fields.map(f =>
      f.copy(metadata = org.apache.spark.sql.types.Metadata.empty))),
      s"graft-delta source: version $v changes the table schema — " +
        "restart the stream to re-pin it")
    val PhysKey = "delta.columnMapping.physicalName"
    val newMap: Map[String, String] =
      newSchema.fields.toSeq.flatMap(f =>
        if (f.metadata.contains(PhysKey))
          Some(f.name -> f.metadata.getString(PhysKey))
        else None).toMap
    require(newMap == colMap,
      s"graft-delta source: version $v changes the COLUMN " +
        "MAPPING (a column was dropped and re-added, or " +
        "physically renamed) — restart the stream to re-pin it")
  }

  private def protocolGuard(
      node: com.fasterxml.jackson.databind.JsonNode): Unit =
    DeltaConvert.checkProtocol(
      Option(node.get("minReaderVersion")).map(_.asInt()).getOrElse(1),
      Option(node.get("readerFeatures")).filterNot(_.isNull)
        .map(_.elements().asScala.map(_.asText()).toSeq)
        .getOrElse(Nil))

  // ---- CHANGE-FEED tailing (readChangeFeed=true): the DML bridge ----
  //
  // Row-level DML on the source table — DV deletes, full-file removes,
  // updates (Delta renders them as remove+add / DV-growth + fresh adds)
  // — streams as honest change rows (`_change_type` insert/delete +
  // `_commit_version`) instead of refusing. Feed it to the
  // graft-snapshot sink's applyChangeFeed and a replica CONVERGES
  // through deletes and updates, closing the loop the insert-only
  // contract's error messages point at.
  //
  // The renderer needs each file's pre-version DV set and partition
  // tuple to attribute changes, so the source keeps per-file STATE —
  // rebuilt DETERMINISTICALLY from the immutable log (replay at the
  // batch's `from` version) whenever the cached state doesn't match,
  // which makes replayed ranges after a crash byte-identical.

  /** path → (partition tuple, deleted positions) at `stateVersion`. */
  private var fileState: scala.collection.mutable.LinkedHashMap[String,
    (Map[String, Option[String]], Array[Long])] = _
  private var stateVersion: Long = Long.MinValue

  private def ensureState(from: Long): Unit = {
    if (stateVersion == from && fileState != null) return
    fileState = scala.collection.mutable.LinkedHashMap.empty
    if (from >= 0L) {
      val st = DeltaConvert.replay(sqlContext.sparkSession, deltaRoot,
        versionAsOf = Some(from))
      st.files.foreach(f =>
        fileState.update(f.path, (f.partitionValues, f.dvPositions)))
    }
    stateVersion = from
  }

  private def cdcBatch(from: Long, to: Long): DataFrame = {
    ensureState(from)
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    ((from + 1) to to).foreach { v =>
      val f = logDir.resolve(f"$v%020d.json")
      require(Files.isRegularFile(f),
        s"graft-delta source: version file ${f.getFileName} is missing — " +
          "the log was cleaned past this stream's checkpointed offset; " +
          "re-adopt the table (convertFromDelta) and restart the tail " +
          "from the adopted version")
      // net action per path WITHIN the version (a DV delete is a
      // remove + re-add of the same file; the re-add wins)
      val adds = scala.collection.mutable.LinkedHashMap[String,
        (Array[Long], Map[String, Option[String]], Boolean)]()
      val removes = scala.collection.mutable.LinkedHashMap[String, Boolean]()
      Files.readAllLines(f).asScala.filter(_.trim.nonEmpty).foreach { line =>
        val action = mapper.readTree(line)
        val it = action.fields()
        while (it.hasNext) {
          val e = it.next()
          e.getKey match {
            case "add" =>
              val node = e.getValue
              val dataChange = Option(node.get("dataChange"))
                .forall(_.asBoolean(true))
              val dv = Option(node.get("deletionVector")).filterNot(_.isNull)
                .map(graft.etl.DeltaDv.readDescriptor(root, _))
                .getOrElse(Array.empty[Long])
              val pv: Map[String, Option[String]] =
                Option(node.get("partitionValues")).filterNot(_.isNull)
                  .map(_.fields().asScala.map(kv =>
                    kv.getKey -> (if (kv.getValue.isNull) None
                    else Some(kv.getValue.asText()))).toMap)
                  .getOrElse(Map.empty)
              adds.update(DeltaConvert.decodePath(
                node.get("path").asText()), (dv, pv, dataChange))
            case "remove" =>
              val dataChange = Option(e.getValue.get("dataChange"))
                .forall(_.asBoolean(true))
              removes.update(DeltaConvert.decodePath(
                e.getValue.get("path").asText()), dataChange)
            case "metaData" => pinGuard(e.getValue, v)
            case "protocol" => protocolGuard(e.getValue)
            case _ => () // txn / commitInfo / cdc / domainMetadata
          }
        }
      }
      // removed outright: every still-live row of the file is a delete
      removes.foreach { case (p, dc) =>
        if (!adds.contains(p)) {
          val (pv, oldDv) = fileState.getOrElse(p,
            throw new IllegalStateException(
              s"graft-delta source: version $v removes $p, which the " +
                "replayed state does not hold — corrupt or rewritten log"))
          if (dc) frames += changeRows(p, pv, exclude = oldDv,
            change = "delete", version = v)
          fileState.remove(p)
        }
      }
      adds.foreach { case (p, (newDv, pv, dc)) =>
        fileState.get(p) match {
          case Some((_, oldDv)) =>
            // same file, new DV: the DV DIFF is the change set — newly
            // dead positions delete, resurrected ones (RESTORE) insert
            val old = oldDv.toSet
            val neu = newDv.toSet
            val dead = newDv.filterNot(old.contains)
            val revived = oldDv.filterNot(neu.contains)
            if (dc && dead.nonEmpty)
              frames += changeRows(p, pv, include = Some(dead),
                change = "delete", version = v)
            if (dc && revived.nonEmpty)
              frames += changeRows(p, pv, include = Some(revived),
                change = "insert", version = v)
            fileState.update(p, (pv, newDv))
          case None =>
            // fresh file: its live rows insert (a rewrite's dc=false
            // adds update state silently — OPTIMIZE emits nothing, but
            // a later remove of the compacted file must attribute)
            if (dc) frames += changeRows(p, pv, exclude = newDv,
              change = "insert", version = v)
            fileState.update(p, (pv, newDv))
        }
      }
      stateVersion = v
    }
    val out = SnapshotStreamSource.cdcSchema(pinned)
    val batch =
      if (frames.isEmpty)
        sqlContext.sparkSession.createDataFrame(
          sqlContext.sparkSession.sparkContext
            .emptyRDD[org.apache.spark.sql.Row], out)
      else frames.reduce(_.unionByName(_))
    GraftStreamBridge.asStreamingFrame(batch, out)
  }

  /** Rows of one data file under the pinned logical schema + change
    * metadata, position-filtered: `include` keeps exactly those row
    * indexes (a DV diff — scattered and small by merge-on-read
    * discipline), otherwise all rows EXCEPT `exclude` (the file's DV).
    * Positions ride the scan's own `_metadata.row_index`; membership is
    * a broadcast semi/anti join, never a literal IN over thousands of
    * positions.
    */
  private def changeRows(p: String, pv: Map[String, Option[String]],
      exclude: Array[Long] = Array.empty,
      include: Option[Array[Long]] = None,
      change: String, version: Long): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val spark = sqlContext.sparkSession
    import spark.implicits._
    val dataFields = pinned.fields.filterNot(f => partCols.contains(f.name))
    def phys(c: String) = colMap.getOrElse(c, c)
    val physSchema = StructType(dataFields.map(f => f.copy(name = phys(f.name))))
    var df = spark.read.schema(physSchema)
      .parquet(root.resolve(p).toString)
      .withColumn("__pos", col("_metadata.row_index"))
    include match {
      case Some(ps) =>
        df = df.join(broadcast(ps.toSeq.toDF("__pos")), Seq("__pos"), "semi")
      case None =>
        if (exclude.nonEmpty)
          df = df.join(broadcast(exclude.toSeq.toDF("__pos")),
            Seq("__pos"), "anti")
    }
    val logical = df.select(dataFields.toSeq.map(f =>
      col(phys(f.name)).as(f.name)): _*)
    val withParts = partCols.foldLeft(logical) { (acc, c) =>
      val fld = pinned(c)
      val raw = pv.getOrElse(c, pv.getOrElse(phys(c), None))
      acc.withColumn(c,
        raw.map(lit(_)).getOrElse(lit(null)).cast(fld.dataType))
    }
    withParts
      .withColumn("_change_type", lit(change))
      .withColumn("_commit_version", lit(version))
      .select(SnapshotStreamSource.cdcSchema(pinned)
        .fieldNames.toSeq.map(col): _*)
  }

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  override def stop(): Unit = ()

  override def toString: String = s"DeltaTailSource[$deltaRoot]"
}
