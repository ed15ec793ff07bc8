package graft.etl

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Read-only replay of a Delta Lake transaction log (`_delta_log/`) —
  * the adoption bridge for tables that already live in Delta format
  * (reference: `sync.py:112-114` writes its RAW zone with
  * `format("delta")`; `ingest.py:636-650` reads it back). Implemented
  * from the PUBLIC Delta transaction-log protocol specification alone:
  * version files `%020d.json` hold one JSON action per line
  * (`metaData` / `protocol` / `add` / `remove` / `txn` / `commitInfo`),
  * checkpoints are parquet files of the same actions as struct columns
  * (classic `%020d.checkpoint.parquet` or multi-part
  * `%020d.checkpoint.%010d.%010d.parquet`), `add.path` is a
  * RFC 2396-encoded path relative to the table root, and the table
  * state at version V is the reconciliation "newest add/remove per
  * path wins" over checkpoint + later deltas.
  *
  * This is a READER for migration, not a Delta client: it produces the
  * live file list + schema + partition columns so
  * [[SnapshotStore.convertFromDelta]] can publish them as a zero-copy
  * version 0 (the CONVERT counterpart of [[SnapshotStore.cloneFrom]]).
  * Tables using reader features a plain file-list replay cannot honor
  * — deletion vectors, column mapping, v2 checkpoints — are REFUSED
  * loudly: silently ignoring a DV would resurrect deleted rows.
  */
object DeltaConvert {

  /** One live file of the reconciled state: `path` DECODED and
    * relative to the delta root, `bytes` the add action's recorded
    * size, `dvPositions` the file's deleted row indexes (decoded from
    * the add's deletion-vector descriptor; empty when the file carries
    * none), `partitionValues` the add action's own partition tuple
    * (authoritative — the CDC tail attributes a removed file's rows
    * without parsing its path).
    */
  final case class DeltaFile(path: String, bytes: Option[Long],
      dvPositions: Array[Long],
      partitionValues: Map[String, Option[String]] = Map.empty)

  /** Reconciled table state at the log's latest version. `colMap` is
    * the logical→physical column mapping when the table runs
    * `columnMapping.mode=name` (empty otherwise) — the same shape the
    * snapshot store's own rename machinery keeps, so adoption maps it
    * straight through.
    */
  final case class DeltaState(version: Long, schema: StructType,
      partitionColumns: Seq[String], files: Seq[DeltaFile],
      configuration: Map[String, String],
      colMap: Map[String, String] = Map.empty)

  private val mapper = new ObjectMapper

  private val JsonFile = """(\d{20})\.json""".r
  private val ClassicCkpt = """(\d{20})\.checkpoint\.parquet""".r
  private val MultiCkpt = """(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet""".r
  private val OtherCkpt = """(\d{20})\.checkpoint\..*""".r

  /** Reader features this replay can honor: deletion vectors are
    * decoded and TRANSLATED (see [[DeltaDv]]) rather than refused.
    * Everything else — typeWidening, v2Checkpoint — is refused;
    * honoring them requires interpreting per-file state this reader
    * does not carry over.
    */
  private val SupportedReaderFeatures =
    Set("timestampntz", "vacuumprotocolcheck", "deletionvectors",
      "columnmapping")

  /** The protocol gate, shared with the streaming tail: readers must
    * refuse tables whose features they cannot honor — that rule IS the
    * protocol's forward-compat story.
    */
  private[graft] def checkProtocol(minReader: Int,
      features: Seq[String]): Unit = {
    require(minReader <= 3,
      s"DeltaConvert: minReaderVersion $minReader is newer than this " +
        "reader understands")
    if (minReader >= 3) {
      val unsupported = features.map(_.toLowerCase)
        .filterNot(SupportedReaderFeatures.contains)
      require(unsupported.isEmpty,
        s"DeltaConvert: unsupported reader feature(s) " +
          s"${unsupported.mkString(", ")} — a file-list replay cannot " +
          "honor them")
    }
  }

  /** `decodeDvs = false` skips eager deletion-vector decoding for
    * metadata-only consumers (the streaming tail needs schema/mapping/
    * version, never the snapshot's tombstones — decoding every live
    * file's `.bin` at stream startup would be pure wasted IO);
    * `dvPositions` comes back empty for every file.
    */
  def replay(spark: SparkSession, deltaRoot: String,
      versionAsOf: Option[Long] = None,
      decodeDvs: Boolean = true): DeltaState = {
    val root = Paths.get(deltaRoot).toAbsolutePath.normalize
    val logDir = root.resolve("_delta_log")
    require(Files.isDirectory(logDir),
      s"DeltaConvert: no _delta_log/ under $deltaRoot — not a Delta table")
    val names = {
      val s = Files.list(logDir)
      try s.iterator().asScala.map(_.getFileName.toString).toVector
      finally s.close()
    }
    // TIME-TRAVEL adoption: replay stops at `versionAsOf` — log files
    // past it are simply invisible (same reconciliation, shorter log)
    val allJson = names.collect { case JsonFile(v) => v.toLong }.sorted
    // COMPLETE multi-part sets count toward the range ceiling too: a
    // version reconstructible solely from its multi-part checkpoint
    // (retention cleaned the jsons) is a legal versionAsOf target
    def completeMultiVersions(ms: Seq[(Long, Int, Int)]): Map[Long, Int] =
      ms.groupBy { case (v, _, n) => (v, n) }.collect {
        case ((v, n), parts) if parts.map(_._2).toSet == (1 to n).toSet =>
          (v, n)
      }.groupBy(_._1).map { case (v, sets) => v -> sets.map(_._2).max }
    val allMulti = names.collect { case MultiCkpt(v, i, n) =>
      (v.toLong, i.toInt, n.toInt) }
    versionAsOf.foreach { v =>
      val ceiling = (allJson ++
        names.collect { case ClassicCkpt(cv) => cv.toLong } ++
        completeMultiVersions(allMulti).keys)
        .reduceOption(_ max _).getOrElse(-1L)
      require(v >= 0 && v <= ceiling,
        s"DeltaConvert: versionAsOf $v is outside the log's range [0, $ceiling]")
    }
    val jsonVersions = allJson.filter(v => versionAsOf.forall(v <= _))
    val classic = names.collect { case ClassicCkpt(v) => v.toLong }
      .filter(v => versionAsOf.forall(v <= _))
    val multi = allMulti
      .filter { case (v, _, _) => versionAsOf.forall(v <= _) }
    // v2/uuid-named checkpoints change the action encoding (sidecars) —
    // refuse rather than replay a partial state
    val unknownCkpt = names.collect {
      case n @ OtherCkpt(_) if ClassicCkpt.unapplySeq(n).isEmpty &&
        MultiCkpt.unapplySeq(n).isEmpty => n
    }
    require(unknownCkpt.isEmpty,
      s"DeltaConvert: unsupported checkpoint format " +
        s"(${unknownCkpt.head}) — only classic and multi-part parquet " +
        "checkpoints are supported")
    // newest COMPLETE checkpoint: classic, or a multi-part set with all
    // n parts present
    // record the part count n OF THE COMPLETE SET: when two multi-part
    // sets exist for one version with different n, building the part
    // list from the global max n would read a nonexistent/incomplete set
    val multiComplete: Map[Long, Int] = completeMultiVersions(multi)
    val ckptVersion: Option[Long] =
      (classic ++ multiComplete.keys).sorted.lastOption
    require(jsonVersions.nonEmpty || ckptVersion.nonEmpty,
      s"DeltaConvert: _delta_log/ under $deltaRoot holds no version files")
    val latest = (jsonVersions ++ ckptVersion).max
    // the reconstructible ceiling must BE the requested version: with a
    // gap at exactly versionAsOf (earlier versions contiguous), the
    // replay would silently return an earlier state labeled as v
    versionAsOf.foreach { v =>
      require(latest == v,
        s"DeltaConvert: versionAsOf $v is not reconstructible — the log's " +
          s"newest version at or below it is $latest (missing " +
          f"$v%020d.json)")
    }
    // contiguity: every version after the checkpoint (or from 0) must
    // have its delta file — a gap means an incomplete copy of the log
    val needed = (ckptVersion.map(_ + 1L).getOrElse(0L) to latest)
    val have = jsonVersions.toSet
    val gaps = needed.filterNot(have.contains)
    require(gaps.isEmpty,
      s"DeltaConvert: log is missing version file(s) " +
        s"${gaps.take(5).map(v => f"$v%020d.json").mkString(", ")} — " +
        "incomplete _delta_log copy")

    // mutable replay state: newest action per decoded path wins; the
    // deletion-vector DESCRIPTOR travels with the add (decoded lazily
    // at the end, so removed files' DVs are never touched)
    val adds = scala.collection.mutable.LinkedHashMap[String,
      (Option[Long], Option[JsonNode], Map[String, Option[String]])]()
    var metaData: Option[JsonNode] = None
    var protocol: Option[(Int, Seq[String])] = None

    def applyAdd(path: String, size: Option[Long], node: JsonNode): Unit = {
      val dv = Option(node.get("deletionVector")).filterNot(_.isNull)
      val pv: Map[String, Option[String]] =
        Option(node.get("partitionValues")).filterNot(_.isNull)
          .map(_.fields().asScala.map(kv => kv.getKey ->
            (if (kv.getValue.isNull) None else Some(kv.getValue.asText())))
            .toMap)
          .getOrElse(Map.empty)
      adds.update(decodePath(path), (size, dv, pv))
    }
    def applyRemove(path: String): Unit = adds.remove(decodePath(path))
    def applyMeta(node: JsonNode): Unit = metaData = Some(node)
    def applyProtocol(minReader: Int, features: Seq[String]): Unit =
      protocol = Some((minReader, features))

    // 1) checkpoint (already reconciled: each path appears at most once)
    ckptVersion.foreach { cv =>
      val parts: Seq[String] =
        if (classic.contains(cv)) Seq(f"$cv%020d.checkpoint.parquet")
        else {
          val n = multiComplete(cv)
          (1 to n).map(i => f"$cv%020d.checkpoint.$i%010d.$n%010d.parquet")
        }
      val df = spark.read.parquet(parts.map(p => logDir.resolve(p).toString): _*)
      val cols = df.schema.fieldNames.toSet
      def field(r: Row, n: String): Option[Row] =
        if (!cols.contains(n)) None
        else Option(r.getAs[Row](n))
      // struct rows → the same JSON shape the delta files carry, via
      // Spark's own renderer — one parser for both log encodings
      val wanted = Seq("add", "remove", "metaData", "protocol").filter(cols)
      df.selectExpr(wanted.map(c => s"to_json($c) AS $c"): _*)
        .collect().foreach { r =>
          wanted.zipWithIndex.foreach { case (c, i) =>
            if (!r.isNullAt(i)) {
              val node = mapper.readTree(r.getString(i))
              c match {
                case "add" => applyAdd(node.get("path").asText(),
                  Option(node.get("size")).filterNot(_.isNull).map(_.asLong()), node)
                case "remove" => applyRemove(node.get("path").asText())
                case "metaData" => applyMeta(node)
                case "protocol" => applyProtocol(
                  Option(node.get("minReaderVersion")).map(_.asInt()).getOrElse(1),
                  Option(node.get("readerFeatures")).filterNot(_.isNull)
                    .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil))
              }
            }
          }
        }
    }

    // 2) JSON deltas after the checkpoint, ascending, lines in order
    jsonVersions.filter(v => ckptVersion.forall(v > _)).foreach { v =>
      val lines = Files.readAllLines(logDir.resolve(f"$v%020d.json")).asScala
      lines.filter(_.trim.nonEmpty).foreach { line =>
        val action = mapper.readTree(line)
        val it = action.fields()
        while (it.hasNext) {
          val e = it.next()
          e.getKey match {
            case "add" => applyAdd(e.getValue.get("path").asText(),
              Option(e.getValue.get("size")).filterNot(_.isNull).map(_.asLong()),
              e.getValue)
            case "remove" => applyRemove(e.getValue.get("path").asText())
            case "metaData" => applyMeta(e.getValue)
            case "protocol" => applyProtocol(
              Option(e.getValue.get("minReaderVersion")).map(_.asInt()).getOrElse(1),
              Option(e.getValue.get("readerFeatures")).filterNot(_.isNull)
                .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil))
            case _ => () // txn / commitInfo / cdc / domainMetadata: no table state
          }
        }
      }
    }

    protocol.foreach { case (mr, fs) => checkProtocol(mr, fs) }
    val meta = metaData.getOrElse(throw new IllegalArgumentException(
      "DeltaConvert: log has no metaData action — corrupt or empty table"))
    Option(meta.get("format")).flatMap(f => Option(f.get("provider")))
      .map(_.asText()).foreach(p => require(p == "parquet",
        s"DeltaConvert: table format '$p' is not parquet"))
    val configuration = Option(meta.get("configuration"))
      .filterNot(_.isNull).map(_.fields().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty[String, String])
    // columnMapping: 'name' mode maps straight onto the store's own
    // logical→physical mapping (files store physical NAMES, exactly
    // what the store's rename machinery reads through). 'id' mode
    // resolves parquet FIELD IDS: the adopted schema keeps each
    // field's `delta.columnMapping.id` as `parquet.field.id` metadata,
    // which Spark's own parquet reader resolves natively
    // (spark.sql.parquet.fieldId.read.enabled) — no custom scan.
    val cmMode = configuration.getOrElse("delta.columnMapping.mode", "none")
    require(cmMode == "none" || cmMode == "name" || cmMode == "id",
      s"DeltaConvert: unknown columnMapping.mode=$cmMode")
    val rawSchema = DataType.fromJson(meta.get("schemaString").asText())
      .asInstanceOf[StructType]
    val PhysKey = "delta.columnMapping.physicalName"
    val IdKey = "delta.columnMapping.id"
    val colMap: Map[String, String] =
      if (cmMode == "none") Map.empty
      else rawSchema.fields.toSeq.flatMap { f =>
        if (f.metadata.contains(PhysKey))
          Some(f.name -> f.metadata.getString(PhysKey))
        else None
      }.toMap
    // nested mapped fields would need per-level re-mapping the store's
    // flat colMap cannot express — refuse rather than misread
    if (cmMode == "name") {
      def nestedMapped(dt: DataType): Boolean = dt match {
        case s: StructType => s.fields.exists(f =>
          f.metadata.contains(PhysKey) || nestedMapped(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType => nestedMapped(a.elementType)
        case m: org.apache.spark.sql.types.MapType =>
          nestedMapped(m.keyType) || nestedMapped(m.valueType)
        case _ => false
      }
      rawSchema.fields.foreach(f => require(!nestedMapped(f.dataType),
        s"DeltaConvert: column '${f.name}' carries NESTED column-mapping " +
          "metadata — nested physical renames cannot be adopted"))
    }
    // the adopted schema is the clean LOGICAL one. Name mode: mapping
    // metadata lives in the store's colMap, field metadata empty. Id
    // mode: each field (nested included — parquet ids are per-node)
    // keeps ONLY `parquet.field.id`, the key Spark's reader honors.
    def toFieldId(m: org.apache.spark.sql.types.Metadata,
        where: String): org.apache.spark.sql.types.Metadata = {
      require(m.contains(IdKey),
        s"DeltaConvert: id-mode table field '$where' lacks " +
          s"$IdKey metadata — corrupt schemaString")
      new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("parquet.field.id", m.getLong(IdKey)).build()
    }
    def idType(dt: DataType, where: String): DataType = dt match {
      case s: StructType => StructType(s.fields.map(f => f.copy(
        dataType = idType(f.dataType, s"$where.${f.name}"),
        metadata = toFieldId(f.metadata, s"$where.${f.name}"))))
      case a: org.apache.spark.sql.types.ArrayType =>
        a.copy(elementType = idType(a.elementType, where))
      case m: org.apache.spark.sql.types.MapType =>
        m.copy(keyType = idType(m.keyType, where),
          valueType = idType(m.valueType, where))
      case other => other
    }
    val schema =
      if (cmMode == "id") StructType(rawSchema.fields.map(f => f.copy(
        dataType = idType(f.dataType, f.name),
        metadata = toFieldId(f.metadata, f.name))))
      else StructType(rawSchema.fields.map(f =>
        f.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))
    val partCols = Option(meta.get("partitionColumns")).filterNot(_.isNull)
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
    val files = adds.toSeq.map { case (path, (size, dv, pv)) =>
      DeltaFile(path, size,
        if (!decodeDvs) Array.empty[Long]
        else dv.map(DeltaDv.readDescriptor(root, _))
          .getOrElse(Array.empty[Long]),
        pv)
    }
    DeltaState(latest, schema, partCols, files, configuration, colMap)
  }

  /** RFC 2396 percent-decoding of a log-recorded relative path. Paths
    * with a scheme (absolute cross-table references) are refused —
    * adoption covers self-contained tables.
    */
  private[graft] def decodePath(p: String): String = {
    // refuse ANY non-relative reference: scheme'd URIs (both `s3://…`
    // and single-slash `file:/…`) and scheme-less absolute paths
    // (`/other/table/part.parquet` is valid per the Delta spec and
    // would otherwise resolve verbatim outside the table root)
    require(!p.startsWith("/") &&
        !p.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:.*"),
      s"DeltaConvert: absolute/external file reference '$p' — only " +
        "self-contained tables (relative paths) can be adopted")
    if (!p.contains('%')) return p
    // percent sequences encode UTF-8 BYTES — decode at the byte level,
    // then re-assemble, or multi-byte characters shear
    val out = new java.io.ByteArrayOutputStream(p.length)
    val raw = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < raw.length) {
      if (raw(i) == '%' && i + 2 < raw.length) {
        out.write(Integer.parseInt(
          new String(raw, i + 1, 2, java.nio.charset.StandardCharsets.US_ASCII),
          16))
        i += 3
      } else { out.write(raw(i)); i += 1 }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }
}
