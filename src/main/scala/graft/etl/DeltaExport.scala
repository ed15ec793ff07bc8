package graft.etl

import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructType}

/** Pure renderers for WRITING a Delta Lake transaction log — the
  * export half of the interop bridge whose read half is
  * [[DeltaConvert]]. Everything here is the PUBLIC Delta protocol:
  * one JSON action per line, `protocol` / `metaData` / `add` /
  * `remove` shapes, RFC 2396 path encoding, name-mode column-mapping
  * field metadata, and deletion-vector descriptors ([[DeltaDv]]).
  *
  * Why: the reference's RAW zone IS Delta (`sync.py:112-114`) — a
  * migrated pipeline whose downstream consumers still run stock
  * Delta readers needs the snapshot store's state readable in place.
  * [[SnapshotStore.exportToDelta]] drives these renderers.
  */
object DeltaExport {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper

  def q(s: String): String = mapper.writeValueAsString(s)

  /** RFC 2396 percent-encoding of a log path (the inverse of
    * [[DeltaConvert.decodePath]]): conservative — encode `%`, space
    * and control bytes; store-generated names never need more.
    */
  def encodePath(p: String): String =
    p.flatMap {
      case '%' => "%25"
      case ' ' => "%20"
      case c if c < 0x20 => f"%%${c.toInt}%02X"
      case c => c.toString
    }

  /** `schemaString` for the metaData action: the logical schema, with
    * name-mode column-mapping metadata woven in when `colMap` is
    * non-empty (physicalName + a stable field id by position).
    */
  def schemaString(schema: StructType, colMap: Map[String, String]): String = {
    if (colMap.isEmpty) schema.json
    else StructType(schema.fields.zipWithIndex.map { case (f, i) =>
      val b = new MetadataBuilder()
      b.putLong("delta.columnMapping.id", (i + 1).toLong)
      b.putString("delta.columnMapping.physicalName",
        colMap.getOrElse(f.name, f.name))
      f.copy(metadata = b.build())
    }).json
  }

  def protocolLine(dv: Boolean, mapping: Boolean): String =
    if (!dv && !mapping)
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    else {
      val features = (if (dv) Seq("deletionVectors") else Nil) ++
        (if (mapping) Seq("columnMapping") else Nil)
      val fs = features.map(q).mkString("[", ",", "]")
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        s""""readerFeatures":$fs,"writerFeatures":$fs}}"""
    }

  def metaLine(tableId: java.util.UUID, schema: StructType,
      partCols: Seq[String], colMap: Map[String, String],
      createdTime: Long): String = {
    val conf =
      if (colMap.isEmpty) "{}"
      else s"""{${q("delta.columnMapping.mode")}:${q("name")},""" +
        s"""${q("delta.columnMapping.maxColumnId")}:${q(schema.length.toString)}}"""
    s"""{"metaData":{"id":${q(tableId.toString)},""" +
      s""""format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${q(schemaString(schema, colMap))},""" +
      s""""partitionColumns":${partCols.map(q).mkString("[", ",", "]")},""" +
      s""""configuration":$conf,"createdTime":$createdTime}}"""
  }

  /** Deletion-vector descriptor JSON for `positions`: inline for small
    * bitmaps, a `"u"`-storage `.bin` at the table root otherwise.
    */
  def dvDescriptor(tableRoot: java.nio.file.Path,
      positions: Array[Long]): String = {
    val data = DeltaDv.serialize(positions)
    if (data.length <= 4096) {
      val (inline, size, card) = DeltaDv.inlineDescriptor(positions)
      s"""{"storageType":"i","pathOrInlineDv":${q(inline)},""" +
        s""""sizeInBytes":$size,"cardinality":$card}"""
    } else {
      val (pth, off, size, card) = DeltaDv.writeUuidFile(tableRoot, positions)
      s"""{"storageType":"u","pathOrInlineDv":${q(pth)},"offset":$off,""" +
        s""""sizeInBytes":$size,"cardinality":$card}"""
    }
  }

  def addLine(path: String, partitionValues: Seq[(String, Option[String])],
      size: Long, modificationTime: Long, dataChange: Boolean,
      dv: Option[String]): String = {
    val pv = partitionValues.map { case (k, v) =>
      s"${q(k)}:${v.map(q).getOrElse("null")}"
    }.mkString("{", ",", "}")
    s"""{"add":{"path":${q(encodePath(path))},"partitionValues":$pv,""" +
      s""""size":$size,"modificationTime":$modificationTime,""" +
      s""""dataChange":$dataChange""" +
      dv.map(d => s""","deletionVector":$d""").getOrElse("") + "}}"
  }

  def removeLine(path: String, deletionTimestamp: Long,
      dataChange: Boolean): String =
    s"""{"remove":{"path":${q(encodePath(path))},""" +
      s""""deletionTimestamp":$deletionTimestamp,"dataChange":$dataChange}}"""
}
