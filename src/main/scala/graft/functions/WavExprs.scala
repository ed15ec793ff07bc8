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

/** Pure-JVM decoder for RIFF/WAVE PCM audio — the audio sibling of
  * [[PnmDecode]] (raw uncompressed samples, deterministic integer
  * parse end to end, no codec library), extending the multimodal
  * family from images to audio. Covers the format every capture
  * pipeline can emit losslessly: canonical RIFF container, PCM
  * (`audioFormat = 1`), 8-bit unsigned or 16-bit signed
  * little-endian samples, any channel count up to 8.
  *
  * Container walk (RIFF spec / WAVE PCM profile):
  *   - "RIFF" magic, 4-byte LE riff size (not trusted — the payload
  *     length is), "WAVE" form type;
  *   - chunk sequence from offset 12: 4-byte id + 4-byte LE size;
  *     unknown chunks are skipped; chunks are WORD-aligned, so an
  *     odd-sized chunk is followed by one pad byte;
  *   - "fmt " must precede "data" and declare PCM with bits ∈ {8, 16},
  *     channels ∈ [1, 8], sampleRate ≥ 1;
  *   - "data" holds ⌊size / blockAlign⌋ frames; CHANNEL 0 of each
  *     frame is decoded (the mono projection every fingerprint /
  *     QA screen runs on; a stereo-aware caller re-decodes per
  *     channel by remixing upstream). 8-bit samples are unsigned and
  *     re-centered (b − 128); 16-bit are signed LE — both land in
  *     the same int range convention (negative = below center).
  *
  * Any malformation — bad magic, missing/short chunk, non-PCM format,
  * unsupported bits, truncated raster — decodes to NULL (decode
  * failure is data, not an error: a 100 TB media scan must not abort
  * on one corrupt blob). More than 2²² samples also decodes to NULL —
  * the in-plan bomb guard (≈8.7 min at 8 kHz; long-form assets are
  * chunk-split upstream, same contract as PnmDecode's 16 MP cap).
  *
  * Output: struct(sample_rate, channels, bits, n_samples,
  * samples array<int>).
  */
case class WavDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("samples", ArrayType(IntegerType, containsNull = false), nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"wav_decode requires binary, got $other")
  }

  /** Full parse; null on any malformation. Public so codegen can call it. */
  def decode(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length
    if (n < 12) return null

    def u8(p: Int): Int = bytes(p) & 0xff
    def u16(p: Int): Int = u8(p) | (u8(p + 1) << 8)
    def u32(p: Int): Long = u16(p).toLong | (u16(p + 2).toLong << 16)
    def tag(p: Int, s: String): Boolean =
      bytes(p) == s.charAt(0) && bytes(p + 1) == s.charAt(1) &&
        bytes(p + 2) == s.charAt(2) && bytes(p + 3) == s.charAt(3)

    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return null
    var pos = 12
    var sampleRate = -1
    var channels = -1
    var bits = -1
    var blockAlign = -1
    while (pos + 8 <= n) {
      val size = u32(pos + 4)
      val body = pos + 8
      if (size < 0L || body + size > n) return null
      if (tag(pos, "fmt ")) {
        if (size < 16L) return null
        val audioFormat = u16(body)
        channels = u16(body + 2)
        sampleRate = u32(body + 4).toInt
        blockAlign = u16(body + 12)
        bits = u16(body + 14)
        if (audioFormat != 1 || channels < 1 || channels > 8 ||
          sampleRate < 1 || (bits != 8 && bits != 16) ||
          blockAlign != channels * (bits / 8)) return null
      } else if (tag(pos, "data")) {
        if (sampleRate < 0) return null // fmt must precede data
        val frames = size / blockAlign
        if (frames > (1L << 22)) return null
        val out = new Array[Int](frames.toInt)
        var i = 0
        var p = body
        while (i < out.length) {
          // channel 0 of each frame
          out(i) = if (bits == 8) u8(p) - 128 else u16(p).toShort.toInt
          p += blockAlign
          i += 1
        }
        return new GenericInternalRow(Array[Any](
          sampleRate, channels, bits, out.length,
          // zero-boxing wrap for the PCM sample array (same GC story
          // as the video frame grays)
          org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)))
      }
      pos = body + size.toInt + (size.toInt & 1) // WORD-aligned chunks
    }
    null // no data chunk
  }

  override protected def nullSafeEval(input: Any): Any =
    decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wavDecode", this, classOf[WavDecode].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.decode($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): WavDecode =
    copy(child = newChild)
}

/** (samples array<int>, nWindows) → nWindows-cell amplitude envelope:
  * cell C is the floor mean of |sample_i| over samples with
  * ⌊i·nW/n⌋ = C — the 1-D box filter of the rectified signal, the
  * audio analogue of [[LumaGrid2D]]. The envelope is what survives
  * re-encoding (level structure), which makes it the dHash input for
  * audio near-dup. Cells with no source sample (n < nW) read 0.
  */
case class AmplitudeEnvelope(first: Expression, second: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = first
  override def right: Expression = second
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"amplitude_envelope requires (array<int>, int), got $other")
    }

  /** Public so codegen can call it; null on a non-positive window count. */
  def envelope(ad: ArrayData, nw: Int): GenericArrayData = {
    if (nw <= 0 || nw > 4096) return null
    val n = ad.numElements()
    val sums = new Array[Long](nw)
    val counts = new Array[Long](nw)
    var i = 0
    while (i < n) {
      val c = ((i.toLong * nw) / n).toInt
      val v = ad.getInt(i)
      sums(c) += (if (v < 0) -v.toLong else v.toLong)
      counts(c) += 1L
      i += 1
    }
    val out = new Array[Int](nw)
    var c = 0
    while (c < nw) {
      if (counts(c) > 0L) out(c) = (sums(c) / counts(c)).toInt
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(s: Any, w: Any): Any =
    envelope(s.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ampEnvelope", this, classOf[AmplitudeEnvelope].getName)
    nullSafeCodeGen(ctx, ev, (s, w) => s"""
      ${ev.value} = $ref.envelope($s, $w);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AmplitudeEnvelope =
    copy(first = newLeft, second = newRight)
}

/** Column-API wrappers for the audio expressions. */
object AudioFunctions {
  def wavDecode(bytes: Column): Column =
    GraftExprBridge.column(WavDecode(GraftExprBridge.expression(bytes)))
  def amplitudeEnvelope(samples: Column, nWindows: Column): Column =
    GraftExprBridge.column(AmplitudeEnvelope(
      GraftExprBridge.expression(samples),
      GraftExprBridge.expression(nWindows)))
}
