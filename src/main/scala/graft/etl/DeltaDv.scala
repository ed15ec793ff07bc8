package graft.etl

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}
import java.util.zip.CRC32
import com.fasterxml.jackson.databind.JsonNode
import org.roaringbitmap.RoaringBitmap

/** Codec for Delta Lake DELETION VECTORS, implemented from the PUBLIC
  * Delta transaction-log protocol specification (the "Deletion Vector
  * Descriptor Schema" and "Deletion Vector Format" sections) and the
  * public RoaringBitmap format spec. No Delta library involved — the
  * 32-bit roaring codec is `org.roaringbitmap` (already on Spark's
  * classpath; Spark itself ships it for shuffle tracking).
  *
  * Three layers, outermost first:
  *
  *  1. DESCRIPTOR (JSON on `add` actions): `storageType` `"u"`
  *     (UUID-named file relative to the table root), `"i"` (inline),
  *     or `"p"` (absolute path — refused here, adoption covers
  *     self-contained tables); `pathOrInlineDv`; optional `offset`;
  *     `sizeInBytes` (length of the serialized bitmap data);
  *     `cardinality` (number of deleted rows).
  *  2. FILE FRAMING (`"u"`/`"p"`): byte 0 holds format version `1`;
  *     each stored DV is `[dataSize: 4-byte big-endian int][data]
  *     [CRC-32 of data: 4-byte big-endian]`, with `offset` pointing at
  *     the dataSize word. Inline (`"i"`) carries `data` directly,
  *     Z85-encoded.
  *  3. DATA = serialized 64-bit RoaringBitmapArray, "portable" format:
  *     4-byte little-endian magic `1681511377`, 8-byte LE bitmap
  *     count, then per bitmap a 4-byte LE key (high 32 bits of the
  *     row indexes) followed by a standard-format 32-bit roaring
  *     bitmap of the low 32 bits. Keys ascend.
  *
  * Reference behavior: the reference's RAW zone is Delta
  * (`sync.py:112-114`), and tables that have run a modern Databricks
  * `DELETE`/`UPDATE` carry DVs by default — adoption translates them
  * into this store's native position-list sidecars instead of
  * refusing (see `SnapshotStore.convertFromDelta`).
  */
object DeltaDv {

  val Magic: Int = 1681511377

  // ---- Z85 (ZeroMQ spec 32): 4 bytes <-> 5 chars, big-endian ----

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val t = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => t(c.toInt) = i }
    t
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"z85Encode: length ${bytes.length} is not a multiple of 4")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xFFL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div >= 1) {
        sb.append(Z85Alphabet(((v / div) % 85).toInt))
        div /= 85
      }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0,
      s"z85Decode: length ${s.length} is not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        require(d >= 0, s"z85Decode: invalid character '$c'")
        v = v * 85 + d
        j += 1
      }
      var k = 0
      while (k < 4) {
        out(i / 5 * 4 + k) = ((v >>> (8 * (3 - k))) & 0xFF).toByte
        k += 1
      }
      i += 5
    }
    out
  }

  /** Delta encodes the 16-byte UUID of a `"u"` DV file as exactly 20
    * Z85 characters appended to an optional random prefix.
    */
  def encodeUuid(uuid: java.util.UUID): String = {
    val b = ByteBuffer.allocate(16)
    b.putLong(uuid.getMostSignificantBits)
    b.putLong(uuid.getLeastSignificantBits)
    z85Encode(b.array)
  }

  def decodeUuid(s20: String): java.util.UUID = {
    val b = ByteBuffer.wrap(z85Decode(s20))
    new java.util.UUID(b.getLong, b.getLong)
  }

  // ---- 64-bit RoaringBitmapArray, portable format ----

  /** Serialized `magic + portable` bytes for sorted-deduped positions. */
  def serialize(positions: Array[Long]): Array[Byte] = {
    val sorted = positions.distinct.sorted
    sorted.foreach(p => require(p >= 0, s"DeltaDv: negative row index $p"))
    val byKey = sorted.groupBy(p => (p >>> 32).toInt).toSeq.sortBy(_._1)
    val bitmaps = byKey.map { case (key, ps) =>
      val rb = new RoaringBitmap()
      ps.foreach(p => rb.add((p & 0xFFFFFFFFL).toInt))
      rb.runOptimize()
      (key, rb)
    }
    val size = 4 + 8 + bitmaps.map(b => 4 + b._2.serializedSizeInBytes()).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic)
    buf.putLong(bitmaps.length.toLong)
    bitmaps.foreach { case (key, rb) =>
      buf.putInt(key)
      rb.serialize(buf)
    }
    require(!buf.hasRemaining, "DeltaDv.serialize: size accounting bug")
    buf.array
  }

  /** Decode `magic + portable` bytes to sorted row indexes. Trailing
    * bytes beyond the declared bitmaps are tolerated (Z85 inline
    * encodings may pad to a 4-byte multiple).
    */
  def deserialize(data: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.remaining >= 12, "DeltaDv: truncated bitmap data")
    val magic = buf.getInt
    require(magic == Magic,
      s"DeltaDv: bad magic $magic (expected $Magic) — not a serialized " +
        "RoaringBitmapArray")
    val n = buf.getLong
    require(n >= 0 && n <= Int.MaxValue, s"DeltaDv: absurd bitmap count $n")
    val out = Array.newBuilder[Long]
    var i = 0L
    while (i < n) {
      require(buf.remaining >= 4, "DeltaDv: truncated bitmap key")
      val key = buf.getInt.toLong & 0xFFFFFFFFL
      val rb = new RoaringBitmap()
      rb.deserialize(buf) // reads at position, does not advance
      buf.position(buf.position() + rb.serializedSizeInBytes())
      val it = rb.getIntIterator
      while (it.hasNext) out += (key << 32) | (it.next().toLong & 0xFFFFFFFFL)
      i += 1
    }
    out.result()
  }

  // ---- file framing ----

  /** One DV framed for storage in a `.bin` file at a known offset:
    * `[size BE][data][crc32(data) BE]`.
    */
  def frame(data: Array[Byte]): Array[Byte] = {
    val crc = new CRC32
    crc.update(data)
    val buf = ByteBuffer.allocate(4 + data.length + 4) // big-endian default
    buf.putInt(data.length)
    buf.put(data)
    buf.putInt(crc.getValue.toInt)
    buf.array
  }

  private def readFramed(bytes: Array[Byte], offset: Int,
      sizeInBytes: Int, what: String): Array[Byte] = {
    require(bytes.nonEmpty && bytes(0) == 1,
      s"DeltaDv: $what has unsupported format version " +
        s"${if (bytes.isEmpty) "<empty>" else bytes(0)} (expected 1)")
    require(offset >= 1 && offset + 4 <= bytes.length,
      s"DeltaDv: $what offset $offset out of range (${bytes.length} bytes)")
    val buf = ByteBuffer.wrap(bytes) // big-endian default
    buf.position(offset)
    val size = buf.getInt
    require(size == sizeInBytes,
      s"DeltaDv: $what declares sizeInBytes=$sizeInBytes but the stored " +
        s"frame holds $size")
    require(buf.remaining >= size + 4,
      s"DeltaDv: $what truncated (need $size+4 bytes at offset $offset)")
    val data = new Array[Byte](size)
    buf.get(data)
    val stored = buf.getInt
    val crc = new CRC32
    crc.update(data)
    require(stored == crc.getValue.toInt,
      s"DeltaDv: $what CRC mismatch — corrupt deletion vector")
    data
  }

  /** Resolve + decode one descriptor (the `deletionVector` node of an
    * `add` action) into sorted deleted row indexes. `tableRoot` anchors
    * `"u"` storage. Absolute-path (`"p"`) DVs are refused for the same
    * reason absolute `add` paths are: adoption covers self-contained
    * tables.
    */
  def readDescriptor(tableRoot: Path, node: JsonNode): Array[Long] = {
    val storageType = Option(node.get("storageType")).map(_.asText())
      .getOrElse(throw new IllegalArgumentException(
        "DeltaDv: descriptor lacks storageType"))
    val pathOrInline = Option(node.get("pathOrInlineDv")).map(_.asText())
      .getOrElse(throw new IllegalArgumentException(
        "DeltaDv: descriptor lacks pathOrInlineDv"))
    val sizeInBytes = Option(node.get("sizeInBytes")).map(_.asInt())
      .getOrElse(throw new IllegalArgumentException(
        "DeltaDv: descriptor lacks sizeInBytes"))
    val cardinality = Option(node.get("cardinality")).map(_.asLong())
      .getOrElse(throw new IllegalArgumentException(
        "DeltaDv: descriptor lacks cardinality"))
    val positions = storageType match {
      case "i" =>
        val raw = z85Decode(pathOrInline)
        require(raw.length >= sizeInBytes,
          s"DeltaDv: inline DV decodes to ${raw.length} bytes but declares " +
            s"sizeInBytes=$sizeInBytes")
        deserialize(raw.take(sizeInBytes))
      case "u" =>
        require(pathOrInline.length >= 20,
          s"DeltaDv: '$pathOrInline' is too short to end in a Z85 UUID")
        val prefix = pathOrInline.dropRight(20)
        val uuid = decodeUuid(pathOrInline.takeRight(20))
        val dir = if (prefix.isEmpty) tableRoot else tableRoot.resolve(prefix)
        val file = dir.resolve(s"deletion_vector_$uuid.bin")
        require(Files.isRegularFile(file),
          s"DeltaDv: deletion vector file $file is missing — vacuumed or " +
            "partially copied table")
        val offset = Option(node.get("offset")).filterNot(_.isNull)
          .map(_.asInt()).getOrElse(1)
        deserialize(readFramed(Files.readAllBytes(file), offset, sizeInBytes,
          file.getFileName.toString))
      case "p" => throw new IllegalArgumentException(
        s"DeltaDv: absolute-path deletion vector '$pathOrInline' — only " +
          "self-contained tables can be adopted")
      case other => throw new IllegalArgumentException(
        s"DeltaDv: unknown storageType '$other'")
    }
    require(positions.length == cardinality,
      s"DeltaDv: descriptor declares cardinality $cardinality but the " +
        s"bitmap holds ${positions.length} positions — corrupt descriptor")
    positions
  }

  /** Write one `"u"`-storage DV file under `tableRoot` and return its
    * descriptor JSON fields — the export-side counterpart of
    * [[readDescriptor]] (used by the Delta-log export path and the
    * adoption specs' fixtures).
    *
    * CONTENT-ADDRESSED: the UUID is derived from the serialized bitmap
    * (name-based, not random), so re-exporting an UNCHANGED deletion
    * vector reuses the existing `.bin` instead of minting a fresh
    * orphan per pass — repeated export-after-vacuum cycles (whose
    * replay-base commit re-adds every entry) stay O(distinct DVs) on
    * disk. The spec only requires the name be a UUID; determinism is a
    * writer's choice, invisible to readers.
    */
  def writeUuidFile(tableRoot: Path, positions: Array[Long])
      : (String, Int, Int, Long) = {
    val data = serialize(positions)
    val uuid = java.util.UUID.nameUUIDFromBytes(data)
    val file = tableRoot.resolve(s"deletion_vector_$uuid.bin")
    if (!Files.exists(file)) {
      val framed = frame(data)
      val bytes = new Array[Byte](1 + framed.length)
      bytes(0) = 1
      System.arraycopy(framed, 0, bytes, 1, framed.length)
      Files.write(file, bytes)
    }
    (encodeUuid(uuid), 1, data.length, positions.distinct.length.toLong)
  }

  /** Inline (`"i"`) descriptor fields for small DVs: Z85 needs 4-byte
    * alignment, so the data is zero-padded and `sizeInBytes` records
    * the true length (the decoder tolerates the tail).
    */
  def inlineDescriptor(positions: Array[Long]): (String, Int, Long) = {
    val data = serialize(positions)
    val padded =
      if (data.length % 4 == 0) data
      else data ++ new Array[Byte](4 - data.length % 4)
    (z85Encode(padded), data.length, positions.distinct.length.toLong)
  }
}
