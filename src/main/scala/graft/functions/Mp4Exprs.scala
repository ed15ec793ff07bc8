package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** MP4/MOV (ISO BMFF) container triage — the dominant-container twin of
  * the AVI pair [[AviEncodeMeta]]/[[AviProbe]]: real video corpora are
  * overwhelmingly MP4, and the JDK ships no H.264/H.265 decoder, so
  * admission, codec census, size/shape QA and exact-duplicate detection
  * must ride on container METADATA (the reference's pipeline lands
  * binary assets whose decode happens elsewhere; triage is the part the
  * engine CAN do honestly). The box grammar is the published ISO/IEC
  * 14496-12 one: length-prefixed big-endian boxes, `moov/trak/mdia/
  * minf/stbl` carrying the sample tables — `stsd` (codec fourcc +
  * geometry), `stsz` (per-sample sizes), `stss` (sync/keyframe table).
  * Same output struct as [[AviProbe]], so the census/fingerprint
  * machinery downstream ([[graft.multimodal.Media.videoContainerStats]])
  * is container-independent.
  */
object Mp4 {

  /** Concatenate child boxes under a fourcc header. */
  private[functions] def box(fourcc: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.map(_.length).sum
    val b = java.nio.ByteBuffer.allocate(8 + body) // MP4 is BIG-endian
    b.putInt(8 + body).put(fourcc.getBytes("US-ASCII"))
    parts.foreach(b.put)
    b.array()
  }

  /** Structurally-real ISO BMFF container around REAL sample payloads —
    * the fixture builder behind [[Mp4EncodeMeta]] (which feeds it
    * deterministic filler) and the MJPEG-in-MP4 round-trip specs (which
    * feed it actual JPEG frames for [[Mp4Frames]] to decode). One chunk
    * holds all samples; sample tables are full and valid. Null on the
    * same shape violations as [[Mp4EncodeMeta]].
    */
  def container(codec: String, w: Int, h: Int, samples: Seq[Array[Byte]],
      keyEvery: Int): Array[Byte] = {
    if (codec == null || samples == null) return null
    val nf = samples.length
    if (codec.length != 4 || !codec.forall(c => c >= 0x20 && c < 0x7f)) return null
    if (w <= 0 || h <= 0 || w > 0xffff || h > 0xffff ||
      nf <= 0 || nf > 4096 || keyEvery <= 0) return null
    if (samples.exists(_ == null)) return null
    val payload = samples.map(_.length.toLong).sum
    if (payload > (1L << 26)) return null

    val ftyp = {
      val b = java.nio.ByteBuffer.allocate(24)
      b.putInt(24).put("ftyp".getBytes("US-ASCII"))
        .put("isom".getBytes("US-ASCII")).putInt(0)
        .put("isom".getBytes("US-ASCII")).put("mp41".getBytes("US-ASCII"))
      b.array()
    }
    val mdatBody = {
      val b = java.nio.ByteBuffer.allocate(payload.toInt)
      samples.foreach(b.put)
      b.array()
    }
    val mdat = box("mdat", mdatBody)
    // one chunk holding all samples; its payload starts right after the
    // ftyp box and the mdat header
    val chunkOffset = ftyp.length + 8

    def u32s(vals: Int*): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 * vals.length)
      vals.foreach(b.putInt)
      b.array()
    }
    val visualEntry = {
      // VisualSampleEntry: 8 header + 6 reserved + 2 dri + 16 predefined
      // + w16 + h16 + 8 dpi + 4 reserved + 2 frame_count + 32 name +
      // 2 depth + 2 predefined(-1) = 86 bytes
      val b = java.nio.ByteBuffer.allocate(86)
      b.putInt(86).put(codec.getBytes("US-ASCII"))
      b.put(new Array[Byte](6)).putShort(1) // data_reference_index
      b.put(new Array[Byte](16))
      b.putShort(w.toShort).putShort(h.toShort)
      b.putInt(0x00480000).putInt(0x00480000) // 72 dpi
      b.putInt(0)
      b.putShort(1) // frame_count per sample
      b.put(new Array[Byte](32)) // compressorname
      b.putShort(24).putShort(-1)
      b.array()
    }
    val stsd = box("stsd", u32s(0, 1), visualEntry)
    val stts = box("stts", u32s(0, 1, nf, 1))
    val stsc = box("stsc", u32s(0, 1, 1, nf, 1))
    val sizes = samples.map(_.length).toArray
    val stsz = box("stsz", u32s(0 +: 0 +: nf +: sizes.toIndexedSeq: _*))
    val stco = box("stco", u32s(0, 1, chunkOffset))
    val syncs = (1 to nf by keyEvery).toArray // 1-based sample numbers
    val stss = box("stss", u32s(0 +: syncs.length +: syncs.toIndexedSeq: _*))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco, stss)
    val vmhd = box("vmhd", u32s(1), Array[Byte](0, 0, 0, 0, 0, 0, 0, 0))
    val dref = box("dref", u32s(0, 1), box("url ", u32s(1)))
    val dinf = box("dinf", dref)
    val minf = box("minf", vmhd, dinf, stbl)
    val hdlr = box("hdlr", u32s(0, 0),
      "vide".getBytes("US-ASCII"), u32s(0, 0, 0), Array[Byte](0))
    val mdhd = box("mdhd", u32s(0, 0, 0, 25, nf), Array[Byte](0x55, (0xc4 & 0xff).toByte, 0, 0))
    val mdia = box("mdia", mdhd, hdlr, minf)
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(92)
      b.putInt(92).put("tkhd".getBytes("US-ASCII"))
      b.putInt(0x000007) // version 0, flags: enabled|in_movie|in_preview
      b.putInt(0).putInt(0).putInt(1).putInt(0).putInt(nf)
      b.putLong(0L).putShort(0).putShort(0).putShort(0).putShort(0)
      // identity matrix (16.16 / 2.30 fixed)
      b.putInt(0x00010000).putInt(0).putInt(0)
      b.putInt(0).putInt(0x00010000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      b.putInt(w << 16).putInt(h << 16)
      b.array()
    }
    val trak = box("trak", tkhd, mdia)
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(108)
      b.putInt(108).put("mvhd".getBytes("US-ASCII"))
      b.putInt(0).putInt(0).putInt(0).putInt(25).putInt(nf)
      b.putInt(0x00010000).putShort(0x0100).putShort(0).putLong(0L)
      b.putInt(0x00010000).putInt(0).putInt(0)
      b.putInt(0).putInt(0x00010000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      (0 until 6).foreach(_ => b.putInt(0))
      b.putInt(2) // next_track_ID
      b.array()
    }
    val moov = box("moov", mvhd, trak)
    val out = new Array[Byte](ftyp.length + mdat.length + moov.length)
    System.arraycopy(ftyp, 0, out, 0, ftyp.length)
    System.arraycopy(mdat, 0, out, ftyp.length, mdat.length)
    System.arraycopy(moov, 0, out, ftyp.length + mdat.length, moov.length)
    out
  }
}

/** Fixture-side MP4 encoder with ARBITRARY codec fourcc and frame-size
  * plan: writes a structurally-real ISO BMFF file — `ftyp` (isom),
  * `mdat` with the planned frame payloads (deterministic filler, same
  * formula as [[AviEncodeMeta]]), and a `moov` whose single video track
  * carries full sample tables: `stsd` with one VisualSampleEntry of the
  * given fourcc ("avc1", "hvc1", "mp4v", ...) and geometry, `stts`/
  * `stsc`/`stco` minimal-but-valid, `stsz` with the planned sizes, and
  * `stss` marking every `keyEvery`-th sample as a sync sample.
  * [[Mp4Probe]] must recover exactly the planted codec, geometry,
  * sizes, and keyframe census. Inputs and bounds mirror
  * [[AviEncodeMeta]]: codec must be 4 printable ASCII chars; null /
  * shape violations / >2²⁶ total payload → null.
  */
case class Mp4EncodeMeta(children: Seq[Expression]) extends Expression {

  require(children.length == 5,
    "mp4_encode_meta(codec, width, height, frame_sizes, key_every)")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    children.map(_.dataType) match {
      case Seq(StringType, IntegerType, IntegerType,
        ArrayType(IntegerType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mp4_encode_meta requires (string, int, int, array<int>, int), got $other")
    }

  /** Public so codegen can call it; null on any shape violation.
    * Delegates the box assembly to [[Mp4.container]] with deterministic
    * filler payloads (byte j of frame i = (i*131 + j*7) mod 256 — the
    * [[AviEncodeMeta]] formula).
    */
  def encode(codecU: org.apache.spark.unsafe.types.UTF8String,
      w: Int, h: Int, sizesAd: ArrayData, keyEvery: Int): Array[Byte] = {
    if (codecU == null || sizesAd == null) return null
    val nf = sizesAd.numElements()
    if (nf <= 0 || nf > 4096) return null
    var payload = 0L
    var i = 0
    while (i < nf) {
      val s = sizesAd.getInt(i)
      if (s < 0) return null
      payload += s
      i += 1
    }
    if (payload > (1L << 26)) return null
    val samples = (0 until nf).map { fi =>
      val s = sizesAd.getInt(fi)
      val a = new Array[Byte](s)
      var j = 0
      while (j < s) { a(j) = ((fi * 131 + j * 7) & 0xff).toByte; j += 1 }
      a
    }
    Mp4.container(codecU.toString, w, h, samples, keyEvery)
  }

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    encode(vs(0).asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      vs(1).asInstanceOf[Int], vs(2).asInstanceOf[Int],
      vs(3).asInstanceOf[ArrayData], vs(4).asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("mp4EncodeMeta", this, classOf[Mp4EncodeMeta].getName)
    val gens = children.map(_.genCode(ctx))
    val anyNull = gens.map(_.isNull).mkString(" || ")
    val resultCode =
      s"""
        ${gens.map(_.code).mkString("\n")}
        boolean ${ev.isNull} = true;
        byte[] ${ev.value} = null;
        if (!($anyNull)) {
          ${ev.value} = $ref.encode(${gens(0).value}, ${gens(1).value},
            ${gens(2).value}, ${gens(3).value}, ${gens(4).value});
          ${ev.isNull} = (${ev.value} == null);
        }
      """
    ev.copy(code = code"$resultCode")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Mp4EncodeMeta =
    copy(children = newChildren)
}

/** MP4/MOV container triage WITHOUT decoding: walk the ISO BMFF box
  * tree (`moov/trak/mdia/minf/stbl`), take the first video track
  * (`hdlr` handler 'vide', or the first track carrying an `stsz`), and
  * read codec fourcc + geometry from `stsd`'s first VisualSampleEntry,
  * per-sample sizes from `stsz` (fixed-size form included), and the
  * keyframe census from `stss` (absent table → -1, mirroring
  * [[AviProbe]]'s no-idx1 convention; per spec an absent `stss` means
  * every sample is sync — the census distinguishes "no table" from a
  * counted one, and the QA gate decides). Output struct is IDENTICAL to
  * [[AviProbe]] so downstream census/fingerprint/dedup code is
  * container-independent. Robustness contract: any malformation →
  * NULL; sample-count bomb guard (2²⁰) bounds allocation; box sizes
  * are bounds-checked before any read; 64-bit largesize boxes are
  * rejected (a fixture-scale probe, not a streaming demuxer).
  */
case class Mp4Probe(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("codec", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("n_keyframes", IntegerType, nullable = false),
    StructField("frame_sizes", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"mp4_probe requires binary, got $other")
  }

  /** Public so codegen can call it; null on any malformation. */
  def probe(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 16) return null
    val b = java.nio.ByteBuffer.wrap(bytes) // ISO BMFF is BIG-endian
    def fcc(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, "US-ASCII")
    if (b.getInt(0) < 8 || fcc(4) != "ftyp") return null
    try {
      var codec: String = null
      var w = -1; var h = -1
      var sizes: Array[Int] = null
      var nKey = -1

      // visit the direct children of a container box; returns false on
      // malformed sizes (caller nulls out). Boxes must tile their
      // parent exactly — trailing garbage is a malformation.
      def walk(start: Int, end: Int)(f: (String, Int, Int) => Boolean): Boolean = {
        var p = start
        while (p + 8 <= end) {
          val size = b.getInt(p)
          val id = fcc(p + 4)
          if (size < 8 || p + size > end) return false // includes 0/1 largesize
          if (!f(id, p + 8, size - 8)) return false
          p += size
        }
        p == end
      }

      def parseStbl(off: Int, end: Int): Boolean =
        walk(off, end) { (id, o, sz) =>
          if (id == "stsd" && sz >= 16) {
            val n = b.getInt(o + 4)
            if (n < 1) false
            else {
              val entry = o + 8
              val esz = b.getInt(entry)
              // bound against the stsd box's OWN end (o + sz), not the
              // enclosing stbl's: an entry overrunning stsd but staying
              // inside stbl would read sibling-box bytes as codec bytes
              if (esz < 36 || entry + esz > o + sz) false
              else {
                codec = fcc(entry + 4).trim
                w = b.getShort(entry + 32) & 0xffff
                h = b.getShort(entry + 34) & 0xffff
                true
              }
            }
          } else if (id == "stsz" && sz >= 12) {
            val fixed = b.getInt(o + 4)
            val n = b.getInt(o + 8)
            if (n < 0 || n > (1 << 20)) false // sample-count bomb guard
            else if (fixed != 0) { sizes = Array.fill(n)(fixed); true }
            else if (sz < 12 + 4L * n) false
            else { sizes = Array.tabulate(n)(i => b.getInt(o + 12 + 4 * i)); true }
          } else if (id == "stss" && sz >= 8) {
            val n = b.getInt(o + 4)
            if (n < 0 || sz < 8 + 4L * n) false
            else { nKey = n; true }
          } else true
        }

      def parseTrak(off: Int, end: Int): Boolean = {
        var handler = ""
        var stbl = -1; var stblEnd = -1
        def scan(s: Int, e: Int): Boolean =
          walk(s, e) { (id, o, sz) =>
            id match {
              case "mdia" | "minf" => scan(o, o + sz)
              case "hdlr" if sz >= 12 => handler = fcc(o + 8); true
              case "stbl" => stbl = o; stblEnd = o + sz; true
              case _ => true
            }
          }
        if (!scan(off, end)) return false
        // first VIDEO track wins; ignore sound/hint tracks
        if (stbl >= 0 && (handler == "vide" || handler.isEmpty) && codec == null) {
          if (!parseStbl(stbl, stblEnd)) return false
        }
        true
      }

      val ok = walk(0, bytes.length) { (id, o, sz) =>
        if (id == "moov")
          walk(o, o + sz) { (id2, o2, sz2) =>
            if (id2 == "trak" && codec == null) parseTrak(o2, o2 + sz2)
            else true
          }
        else true
      }
      if (!ok || codec == null || w <= 0 || h <= 0 ||
        sizes == null || sizes.isEmpty) return null
      new GenericInternalRow(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString(codec),
        w, h, sizes.length, nKey,
        new GenericArrayData(sizes.map(x => x: Any))))
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mp4Probe", this, classOf[Mp4Probe].getName)
    nullSafeCodeGen(ctx, ev, bytes => s"""
      ${ev.value} = (InternalRow) $ref.probe($bytes);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Mp4Probe =
    copy(child = newChild)
}

/** REAL frame decode for MOTION-JPEG inside MP4/MOV — the ISO BMFF twin
  * of [[AviFrames]]' MJPG branch, retiring one more row of the honest
  * compressed-video stub: when `stsd` declares a JPEG codec (`jpeg`,
  * QuickTime's Motion-JPEG; `mjpa`, Motion-JPEG A — both are per-frame
  * JFIF payloads the JDK's built-in reader decodes), the sample extents
  * recovered from the FULL sample tables (`stsz` sizes + `stsc`
  * sample-to-chunk runs + `stco` chunk offsets — the published
  * ISO/IEC 14496-12 mapping, not the one-chunk fixture shortcut) are
  * routed through `ImageIO` to per-frame Rec. 709 integer gray rasters,
  * every k-th sample, in the exact output struct of [[AviFrames]] — so
  * the luma-stats / key-frame-near-dup / curation machinery is
  * container-independent. Inter-frame codecs the JDK lacks
  * (H.264-class) stay NULL here and are triaged by [[Mp4Probe]]
  * metadata instead.
  *
  * Robustness contract identical to [[AviFrames]]: any malformation —
  * bad magic, inconsistent sample tables, out-of-bounds extents, a
  * frame whose decoded geometry disagrees with `stsd` — is NULL, never
  * an error; sample-count (2²⁰) and pixel-volume (2²⁴) bomb guards
  * bound allocation before any decode.
  */
case class Mp4Frames(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frames", ArrayType(StructType(Seq(
      StructField("idx", IntegerType, nullable = false),
      StructField("gray", ArrayType(IntegerType, containsNull = false),
        nullable = false))), containsNull = false), nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mp4_frames requires (binary, int), got $other")
    }

  /** Public so codegen can call it; null on any malformation. */
  def decode(bytes: Array[Byte], every: Int): InternalRow = {
    if (bytes == null || bytes.length < 16 || every <= 0) return null
    val b = java.nio.ByteBuffer.wrap(bytes) // ISO BMFF is BIG-endian
    def fcc(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, "US-ASCII")
    if (b.getInt(0) < 8 || fcc(4) != "ftyp") return null
    try {
      var codec: String = null
      var w = -1; var h = -1
      var sizes: Array[Int] = null
      var chunkOffsets: Array[Long] = null
      var stscRuns: Array[(Int, Int)] = null // (first_chunk 1-based, samples_per_chunk)

      def walk(start: Int, end: Int)(f: (String, Int, Int) => Boolean): Boolean = {
        var p = start
        while (p + 8 <= end) {
          val size = b.getInt(p)
          val id = fcc(p + 4)
          if (size < 8 || p + size > end) return false
          if (!f(id, p + 8, size - 8)) return false
          p += size
        }
        p == end
      }

      def parseStbl(off: Int, end: Int): Boolean =
        walk(off, end) { (id, o, sz) =>
          if (id == "stsd" && sz >= 16) {
            val n = b.getInt(o + 4)
            if (n < 1) false
            else {
              val entry = o + 8
              val esz = b.getInt(entry)
              if (esz < 36 || entry + esz > o + sz) false
              else {
                codec = fcc(entry + 4).trim
                w = b.getShort(entry + 32) & 0xffff
                h = b.getShort(entry + 34) & 0xffff
                true
              }
            }
          } else if (id == "stsz" && sz >= 12) {
            val fixed = b.getInt(o + 4)
            val n = b.getInt(o + 8)
            if (n < 0 || n > (1 << 20)) false // sample-count bomb guard
            else if (fixed != 0) { sizes = Array.fill(n)(fixed); true }
            else if (sz < 12 + 4L * n) false
            else { sizes = Array.tabulate(n)(i => b.getInt(o + 12 + 4 * i)); true }
          } else if (id == "stco" && sz >= 8) {
            val n = b.getInt(o + 4)
            if (n < 0 || n > (1 << 20) || sz < 8 + 4L * n) false
            else {
              chunkOffsets = Array.tabulate(n)(i =>
                (b.getInt(o + 8 + 4 * i).toLong) & 0xffffffffL)
              true
            }
          } else if (id == "stsc" && sz >= 8) {
            val n = b.getInt(o + 4)
            if (n < 0 || n > (1 << 20) || sz < 8 + 12L * n) false
            else {
              stscRuns = Array.tabulate(n)(i =>
                (b.getInt(o + 8 + 12 * i), b.getInt(o + 8 + 12 * i + 4)))
              true
            }
          } else true
        }

      def parseTrak(off: Int, end: Int): Boolean = {
        var handler = ""
        var stbl = -1; var stblEnd = -1
        def scan(s: Int, e: Int): Boolean =
          walk(s, e) { (id, o, sz) =>
            id match {
              case "mdia" | "minf" => scan(o, o + sz)
              case "hdlr" if sz >= 12 => handler = fcc(o + 8); true
              case "stbl" => stbl = o; stblEnd = o + sz; true
              case _ => true
            }
          }
        if (!scan(off, end)) return false
        if (stbl >= 0 && (handler == "vide" || handler.isEmpty) && codec == null) {
          if (!parseStbl(stbl, stblEnd)) return false
        }
        true
      }

      val ok = walk(0, bytes.length) { (id, o, sz) =>
        if (id == "moov")
          walk(o, o + sz) { (id2, o2, sz2) =>
            if (id2 == "trak" && codec == null) parseTrak(o2, o2 + sz2)
            else true
          }
        else true
      }
      if (!ok || codec == null || w <= 0 || h <= 0 ||
        sizes == null || sizes.isEmpty ||
        chunkOffsets == null || chunkOffsets.isEmpty ||
        stscRuns == null || stscRuns.isEmpty) return null
      // only per-frame JPEG codecs decode; everything else is Mp4Probe's
      // metadata-triage territory
      val lc = codec.toLowerCase(java.util.Locale.ROOT)
      if (lc != "jpeg" && lc != "mjpa") return null
      if (w.toLong * h > (1L << 24)) return null
      // sample extents from the published stsc/stco/stsz mapping: for
      // chunk c (1-based), samples_per_chunk is the run with the
      // greatest first_chunk <= c; samples pack back-to-back from the
      // chunk's stco offset in stsz order
      if (stscRuns.head._1 != 1) return null // spec: first run covers chunk 1
      var run = 0
      var sample = 0
      val offsets = new Array[Long](sizes.length)
      var c = 1
      while (c <= chunkOffsets.length && sample < sizes.length) {
        while (run + 1 < stscRuns.length && stscRuns(run + 1)._1 <= c) run += 1
        val spc = stscRuns(run)._2
        if (spc <= 0) return null
        var off = chunkOffsets(c - 1)
        var k = 0
        while (k < spc && sample < sizes.length) {
          if (sizes(sample) < 0 || off < 0 ||
            off + sizes(sample) > bytes.length) return null
          offsets(sample) = off
          off += sizes(sample)
          sample += 1; k += 1
        }
        c += 1
      }
      if (sample < sizes.length) return null // tables cover fewer samples
      val sampled = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Int])]
      var fi = 0
      while (fi < sizes.length) {
        if (fi % every == 0) {
          if ((sampled.length + 1).toLong * w * h > (1L << 24)) return null
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes, offsets(fi).toInt, sizes(fi)))
          if (img == null || img.getWidth != w || img.getHeight != h) return null
          // bulk ARGB grab + Rec. 709 integer luma — the AviFrames formula
          val argb = img.getRGB(0, 0, w, h, null, 0, w)
          val gray = new Array[Int](w * h)
          var i = 0
          while (i < gray.length) {
            val rgb = argb(i)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val bl = rgb & 0xff
            gray(i) = ((2126L * r + 7152L * g + 722L * bl) / 10000L).toInt
            i += 1
          }
          sampled += ((fi, gray))
        }
        fi += 1
      }
      if (sampled.isEmpty) return null
      val frames = sampled.map { case (idx, gray) =>
        new GenericInternalRow(Array[Any](idx,
          org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
            .fromPrimitiveArray(gray)))
      }.toArray[Any]
      new GenericInternalRow(Array[Any](w, h, sizes.length,
        new GenericArrayData(frames)))
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  override protected def nullSafeEval(bytes: Any, every: Any): Any =
    decode(bytes.asInstanceOf[Array[Byte]], every.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mp4Frames", this, classOf[Mp4Frames].getName)
    nullSafeCodeGen(ctx, ev, (bytes, every) => s"""
      ${ev.value} = (InternalRow) $ref.decode($bytes, $every);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Mp4Frames =
    copy(left = newLeft, right = newRight)
}

object Mp4Functions {
  def mp4EncodeMeta(codec: Column, width: Column, height: Column,
      frameSizes: Column, keyEvery: Column): Column =
    GraftExprBridge.column(Mp4EncodeMeta(Seq(
      GraftExprBridge.expression(codec),
      GraftExprBridge.expression(width),
      GraftExprBridge.expression(height),
      GraftExprBridge.expression(frameSizes),
      GraftExprBridge.expression(keyEvery))))
  def mp4Probe(bytes: Column): Column =
    GraftExprBridge.column(Mp4Probe(GraftExprBridge.expression(bytes)))
  def mp4Frames(bytes: Column, every: Column): Column =
    GraftExprBridge.column(Mp4Frames(
      GraftExprBridge.expression(bytes), GraftExprBridge.expression(every)))
}
