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

  /** `cdf` adds the CHANGE DATA FEED writer capability: a writer-only
    * feature — `minWriterVersion` 4 legacy when nothing else needs the
    * feature vectors, `changeDataFeed` in `writerFeatures` (NEVER
    * `readerFeatures` — reading CDF needs no reader capability)
    * otherwise.
    */
  def protocolLine(dv: Boolean, mapping: Boolean,
      cdf: Boolean = false): String =
    if (!dv && !mapping)
      if (!cdf) """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
      else """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}"""
    else {
      val reader = (if (dv) Seq("deletionVectors") else Nil) ++
        (if (mapping) Seq("columnMapping") else Nil)
      val writer = reader ++ (if (cdf) Seq("changeDataFeed") else Nil)
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        s""""readerFeatures":${reader.map(q).mkString("[", ",", "]")},""" +
        s""""writerFeatures":${writer.map(q).mkString("[", ",", "]")}}}"""
    }

  def metaConf(schema: StructType, colMap: Map[String, String],
      cdf: Boolean): Map[String, String] =
    (if (colMap.isEmpty) Map.empty[String, String]
     else Map("delta.columnMapping.mode" -> "name",
       "delta.columnMapping.maxColumnId" -> schema.length.toString)) ++
      (if (cdf) Map("delta.enableChangeDataFeed" -> "true") else Map.empty)

  def metaLine(tableId: java.util.UUID, schema: StructType,
      partCols: Seq[String], colMap: Map[String, String],
      createdTime: Long, cdf: Boolean = false): String = {
    val conf = metaConf(schema, colMap, cdf).toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    s"""{"metaData":{"id":${q(tableId.toString)},""" +
      s""""format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${q(schemaString(schema, colMap))},""" +
      s""""partitionColumns":${partCols.map(q).mkString("[", ",", "]")},""" +
      s""""configuration":$conf,"createdTime":$createdTime}}"""
  }

  /** `cdc` action line: one CHANGE DATA file of a commit. `dataChange`
    * is false by spec — the rows describe the change, they are not
    * table data.
    */
  def cdcLine(path: String, partitionValues: Seq[(String, Option[String])],
      size: Long): String = {
    val pv = partitionValues.map { case (k, v) =>
      s"${q(k)}:${v.map(q).getOrElse("null")}"
    }.mkString("{", ",", "}")
    s"""{"cdc":{"path":${q(encodePath(path))},"partitionValues":$pv,""" +
      s""""size":$size,"dataChange":false}}"""
  }

  /** Deletion-vector descriptor FIELDS
    * `(storageType, pathOrInlineDv, offset, sizeInBytes, cardinality)`:
    * inline for small bitmaps, a `"u"`-storage `.bin` at the table
    * root otherwise ([[DeltaDv.writeUuidFile]] is content-addressed,
    * so re-exporting an unchanged DV reuses the same file).
    */
  def dvDescriptorFields(tableRoot: java.nio.file.Path,
      positions: Array[Long]): (String, String, Option[Int], Int, Long) = {
    val data = DeltaDv.serialize(positions)
    if (data.length <= 4096) {
      val (inline, size, card) = DeltaDv.inlineDescriptor(positions)
      ("i", inline, None, size, card)
    } else {
      val (pth, off, size, card) = DeltaDv.writeUuidFile(tableRoot, positions)
      ("u", pth, Some(off), size, card)
    }
  }

  /** Deletion-vector descriptor JSON for an `add` action line. */
  def dvDescriptor(tableRoot: java.nio.file.Path,
      positions: Array[Long]): String = {
    val (st, p, off, size, card) = dvDescriptorFields(tableRoot, positions)
    s"""{"storageType":${q(st)},"pathOrInlineDv":${q(p)},""" +
      off.map(o => s""""offset":$o,""").getOrElse("") +
      s""""sizeInBytes":$size,"cardinality":$card}"""
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

  // ---- classic parquet checkpoint: FIXED schema, not JSON inference ----
  //
  // Stock Delta readers read checkpoints with the protocol's own action
  // schema: `add.partitionValues` MUST be map<string,string> (JSON
  // inference would type the literal `{"dt":"2024-01-01"}` as a struct,
  // or drop the column entirely for all-unpartitioned rows), and
  // checkpoint `add.dataChange` must be false. One explicit StructType
  // and typed Row renderers keep the parquet footer spec-shaped.

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types.{ArrayType, BooleanType, IntegerType,
    LongType, MapType, StringType, StructField}

  private val dvStructType = org.apache.spark.sql.types.StructType(Seq(
    StructField("storageType", StringType),
    StructField("pathOrInlineDv", StringType),
    StructField("offset", IntegerType),
    StructField("sizeInBytes", IntegerType),
    StructField("cardinality", LongType)))

  /** The classic-checkpoint parquet schema: one nullable struct column
    * per action kind, field shapes straight from the Delta protocol
    * spec's action definitions.
    */
  val checkpointSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      StructField("txn", org.apache.spark.sql.types.StructType(Seq(
        StructField("appId", StringType),
        StructField("version", LongType),
        StructField("lastUpdated", LongType)))),
      StructField("add", org.apache.spark.sql.types.StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues",
          MapType(StringType, StringType, valueContainsNull = true)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType),
        StructField("tags",
          MapType(StringType, StringType, valueContainsNull = true)),
        StructField("deletionVector", dvStructType),
        StructField("stats", StringType)))),
      StructField("remove", org.apache.spark.sql.types.StructType(Seq(
        StructField("path", StringType),
        StructField("deletionTimestamp", LongType),
        StructField("dataChange", BooleanType)))),
      StructField("metaData", org.apache.spark.sql.types.StructType(Seq(
        StructField("id", StringType),
        StructField("name", StringType),
        StructField("description", StringType),
        StructField("format", org.apache.spark.sql.types.StructType(Seq(
          StructField("provider", StringType),
          StructField("options",
            MapType(StringType, StringType, valueContainsNull = true))))),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration",
          MapType(StringType, StringType, valueContainsNull = true)),
        StructField("createdTime", LongType)))),
      StructField("protocol", org.apache.spark.sql.types.StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType),
        StructField("readerFeatures", ArrayType(StringType)),
        StructField("writerFeatures", ArrayType(StringType)))))))

  /** Top-level checkpoint row: exactly one non-null action column. */
  def ckptRow(add: Row = null, remove: Row = null, meta: Row = null,
      protocol: Row = null): Row = Row(null, add, remove, meta, protocol)

  /** `protocol` struct row — same values as [[protocolLine]]. */
  def protocolRow(dv: Boolean, mapping: Boolean, cdf: Boolean = false): Row =
    if (!dv && !mapping) Row(1, if (cdf) 4 else 2, null, null)
    else {
      val reader = (if (dv) Seq("deletionVectors") else Nil) ++
        (if (mapping) Seq("columnMapping") else Nil)
      val writer = reader ++ (if (cdf) Seq("changeDataFeed") else Nil)
      Row(3, 7, reader, writer)
    }

  /** `metaData` struct row — same values as [[metaLine]]. */
  def metaRow(tableId: java.util.UUID, schema: StructType,
      partCols: Seq[String], colMap: Map[String, String],
      createdTime: Long, cdf: Boolean = false): Row =
    Row(tableId.toString, null, null, Row("parquet", Map.empty[String, String]),
      schemaString(schema, colMap), partCols, metaConf(schema, colMap, cdf),
      createdTime)

  /** `add` struct row for a checkpoint: `dataChange` is false by spec
    * (a checkpoint restates the table, it changes nothing).
    */
  def addRow(path: String, partitionValues: Seq[(String, Option[String])],
      size: Long, modificationTime: Long,
      dv: Option[(String, String, Option[Int], Int, Long)]): Row = {
    val pv: Map[String, String] =
      partitionValues.map { case (k, v) => k -> v.orNull }.toMap
    val dvRow = dv.map { case (st, p, off, sz, card) =>
      Row(st, p, off.map(Int.box).orNull, sz, card)
    }.orNull
    Row(encodePath(path), pv, size, modificationTime, false, null, dvRow, null)
  }
}
