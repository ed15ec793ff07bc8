package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for perceptual hashing of opaque media
  * payloads (the q45/q52 binary-column family): a locality-preserving
  * "decode" that box-filters the byte stream onto a fixed 8×8 grid, and
  * the two classic integer perceptual hashes over that grid
  * (average-hash and difference-hash — the aHash/dHash family used for
  * image near-dup since the ImageHash lineage). Everything is integer
  * floor arithmetic, so a SQL engine replays each bit exactly — unlike
  * the md5 stub codec in [[graft.multimodal.Media.decodeStub]], a LOCAL
  * byte edit (a re-encoded region, a brightness patch) moves only the
  * cells it touches, which is the property image near-dup needs.
  *
  * A real deployment decodes actual pixels and resizes; this grid is the
  * sandbox stand-in with the same shape (64 small ints), so the hashes,
  * the Hamming bucketing, and every plan around them carry over
  * unchanged when the codec becomes real.
  */

/** binary → array<int> of 64 cells: cell c = floor(mean of unsigned
  * bytes at positions i with i·64 div L = c) — a 1-D box-filter
  * downscale of the payload onto an 8×8 grid (row-major). Cells with no
  * position (L < 64) and the empty payload read 0. Null input → null.
  */
case class LumaGrid(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"luma_grid requires binary, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    val n = bytes.length
    var i = 0
    while (i < n) {
      val c = ((i.toLong * 64L) / n).toInt
      sums(c) += (bytes(i) & 0xff)
      counts(c) += 1L
      i += 1
    }
    val out = new Array[Int](64)
    var c = 0
    while (c < 64) {
      if (counts(c) > 0L) out(c) = (sums(c) / counts(c)).toInt
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val sums = ctx.freshName("sums")
      val counts = ctx.freshName("counts")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
        int $n = $bytes.length;
        long[] $sums = new long[64];
        long[] $counts = new long[64];
        for (int $i = 0; $i < $n; $i++) {
          int $c = (int) (((long) $i * 64L) / $n);
          $sums[$c] += ($bytes[$i] & 0xff);
          $counts[$c] += 1L;
        }
        int[] $out = new int[64];
        for (int $c = 0; $c < 64; $c++) {
          if ($counts[$c] > 0L) { $out[$c] = (int) ($sums[$c] / $counts[$c]); }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): LumaGrid =
    copy(child = newChild)
}

/** array<int> (64-cell grid) → 64-bit average hash: bit i set iff
  * cell i > floor(Σcells / 64). Null for grids that are not exactly 64
  * cells (the [[LumaGrid]] contract).
  */
case class AHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"ahash64 requires array<int>, got $other")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    if (ad.numElements() != 64) null
    else {
      var sum = 0L
      var i = 0
      while (i < 64) { sum += ad.getInt(i); i += 1 }
      val mean = sum / 64L
      var h = 0L
      i = 0
      while (i < 64) { if (ad.getInt(i) > mean) h |= (1L << i); i += 1 }
      java.lang.Long.valueOf(h)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => {
      val sum = ctx.freshName("sum")
      val mean = ctx.freshName("mean")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
        if ($g.numElements() != 64) {
          ${ev.isNull} = true;
        } else {
          long $sum = 0L;
          for (int $i = 0; $i < 64; $i++) { $sum += $g.getInt($i); }
          long $mean = $sum / 64L;
          long $h = 0L;
          for (int $i = 0; $i < 64; $i++) {
            if ($g.getInt($i) > $mean) { $h |= (1L << $i); }
          }
          ${ev.value} = $h;
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
}

/** array<int> (64-cell grid, row-major 8×8) → 64-bit difference hash:
  * bit i (row r = i div 8, col c = i mod 8) set iff the right neighbor
  * (wrapping within the row) is strictly brighter:
  * grid[r·8 + (c+1) mod 8] > grid[i]. Null for non-64-cell grids.
  */
case class DHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"dhash64 requires array<int>, got $other")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    if (ad.numElements() != 64) null
    else {
      var h = 0L
      var i = 0
      while (i < 64) {
        val nb = (i / 8) * 8 + ((i % 8) + 1) % 8
        if (ad.getInt(nb) > ad.getInt(i)) h |= (1L << i)
        i += 1
      }
      java.lang.Long.valueOf(h)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => {
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val nb = ctx.freshName("nb")
      s"""
        if ($g.numElements() != 64) {
          ${ev.isNull} = true;
        } else {
          long $h = 0L;
          for (int $i = 0; $i < 64; $i++) {
            int $nb = ($i / 8) * 8 + (($i % 8) + 1) % 8;
            if ($g.getInt($nb) > $g.getInt($i)) { $h |= (1L << $i); }
          }
          ${ev.value} = $h;
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}

/** array<int> → binary: each element's low byte, in order — the
  * constructor side of the binary-payload plumbing (build raster bytes
  * from computed integer pixels without a UDF). Null input → null.
  */
case class PackBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"pack_bytes requires array<int>, got $other")
  }

  /** Public so codegen can call it. */
  def pack(ad: ArrayData): Array[Byte] = {
    val n = ad.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = (ad.getInt(i) & 0xff).toByte; i += 1 }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("packBytes", this, classOf[PackBytes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.pack($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PackBytes =
    copy(child = newChild)
}

/** Pure-JVM decoder for binary (raw) PNM images — PGM "P5" (grayscale)
  * and PPM "P6" (RGB), the uncompressed Netpbm formats whose decode is
  * deterministic integer math end to end (header token scan + fixed-
  * layout raster), so it needs no image library and any SQL engine can
  * replay it bit for bit. This replaces the md5 stub codec as the REAL
  * pixel source for the perceptual-hash family.
  *
  * Spec coverage (Netpbm pgm(5)/ppm(5)):
  *   - magic "P5"/"P6"; header ints (width, height, maxval) separated
  *     by arbitrary whitespace with `#`-to-end-of-line comments;
  *   - exactly ONE whitespace byte after maxval, then the raster;
  *   - samples are 1 byte for maxval < 256, 2 bytes big-endian for
  *     maxval in [256, 65535];
  *   - P6 pixels reduce to luma by the Rec. 709 integer surrogate
  *     ⌊(2126·R + 7152·G + 722·B) / 10000⌋ — exact floor division, no
  *     float weights;
  *   - trailing bytes after the raster are ignored (multi-image
  *     streams are out of scope).
  *
  * Output: struct(fmt 5|6, width, height, maxval, gray array<int> of
  * width·height row-major luma samples). Any malformed payload — bad
  * magic, non-numeric header, maxval outside [1, 65535], truncated
  * raster — decodes to NULL (decode failure is data, not an error:
  * a 100 TB media scan must not abort on one corrupt blob). Payloads
  * above 2²⁴ pixels also decode to NULL — an in-plan bomb guard: a
  * 16 MP cap bounds per-row memory at ~64 MB while covering any
  * thumbnail/preview pipeline; full-resolution assets should be
  * tile-split upstream.
  */
case class PnmDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("fmt", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("maxval", IntegerType, nullable = false),
    StructField("gray", ArrayType(IntegerType, containsNull = false), nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"pnm_decode requires binary, got $other")
  }

  /** Full parse; null on any malformation. Public so codegen can call it. */
  def decode(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length
    if (n < 2 || bytes(0) != 'P') return null
    val fmt = bytes(1) match {
      case '5' => 5
      case '6' => 6
      case _ => return null
    }
    var pos = 2

    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == 0x0c

    // skip whitespace and #-comments; false on EOF
    def skipWs(): Boolean = {
      var inComment = false
      while (pos < n) {
        val b = bytes(pos)
        if (inComment) {
          if (b == '\n' || b == '\r') inComment = false
          pos += 1
        } else if (b == '#') { inComment = true; pos += 1 }
        else if (isWs(b)) pos += 1
        else return true
      }
      false
    }

    // non-negative decimal int; -1 on malformation
    def readInt(): Int = {
      if (!skipWs()) return -1
      var v = 0L
      var any = false
      while (pos < n && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10L + (bytes(pos) - '0')
        if (v > Int.MaxValue) return -1
        any = true
        pos += 1
      }
      if (any) v.toInt else -1
    }

    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 65535) return null
    val pixels = w.toLong * h
    if (pixels > (1L << 24)) return null
    // exactly one whitespace byte separates maxval from the raster
    if (pos >= n || !isWs(bytes(pos))) return null
    pos += 1
    val two = maxval > 255
    val perSample = if (two) 2 else 1
    val perPixel = perSample * (if (fmt == 6) 3 else 1)
    if (n - pos < pixels * perPixel) return null

    def sample(off: Int): Int =
      if (two) ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
      else bytes(off) & 0xff

    val gray = new Array[Int](pixels.toInt)
    var i = 0
    var p = pos
    while (i < gray.length) {
      if (fmt == 5) {
        gray(i) = sample(p)
        p += perSample
      } else {
        val r = sample(p)
        val g = sample(p + perSample)
        val b = sample(p + 2 * perSample)
        p += perPixel
        gray(i) = ((2126L * r + 7152L * g + 722L * b) / 10000L).toInt
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](fmt, w, h, maxval,
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(gray)))
  }

  override protected def nullSafeEval(input: Any): Any =
    decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pnmDecode", this, classOf[PnmDecode].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.decode($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PnmDecode =
    copy(child = newChild)
}

/** (pixels array<int>, width, height) → 64-cell 8×8 luma grid: cell
  * (R, C) is the floor mean of pixels (r, c) with ⌊r·8/h⌋ = R and
  * ⌊c·8/w⌋ = C — the standard 2-D box-filter downscale, the REAL-pixel
  * replacement for the 1-D byte-stream [[LumaGrid]]. Cells with no
  * source pixel (w or h < 8) read 0, matching the 1-D convention.
  * Null when the array length is not width·height (or w/h ≤ 0).
  */
case class LumaGrid2D(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"luma_grid_2d requires (array<int>, int, int), got $other")
    }

  /** Public so codegen can call it; null on shape mismatch. */
  def grid(ad: ArrayData, w: Int, h: Int): GenericArrayData = {
    if (w <= 0 || h <= 0 || ad.numElements() != w.toLong * h) return null
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var r = 0
    while (r < h) {
      val rr = ((r.toLong * 8L) / h).toInt * 8
      var c = 0
      while (c < w) {
        val cell = rr + ((c.toLong * 8L) / w).toInt
        sums(cell) += ad.getInt(r * w + c)
        counts(cell) += 1L
        c += 1
      }
      r += 1
    }
    val out = new Array[Int](64)
    var i = 0
    while (i < 64) {
      if (counts(i) > 0L) out(i) = (sums(i) / counts(i)).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(px: Any, w: Any, h: Any): Any =
    grid(px.asInstanceOf[ArrayData], w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lumaGrid2d", this, classOf[LumaGrid2D].getName)
    nullSafeCodeGen(ctx, ev, (px, w, h) => s"""
      ${ev.value} = $ref.grid($px, $w, $h);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LumaGrid2D =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** (pixels array<int> of 0xRRGGBB, width, height) → binary PNG via the
  * JDK's built-in encoder (javax.imageio ships in java.desktop — no
  * external jar). PNG is LOSSLESS: decode(encode(px)) == px exactly,
  * which is what makes the compressed-image path oracle-checkable —
  * the oracle replays the PIXEL formula while Spark round-trips the
  * actual container bytes. Null when the array length ≠ width·height
  * (or w/h ≤ 0, or > 2²⁴ pixels — the same bomb rail as the decoders).
  */
case class PngEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"png_encode requires (array<int>, int, int), got $other")
    }

  /** Public so codegen can call it; null on shape mismatch. */
  def encode(ad: ArrayData, w: Int, h: Int): Array[Byte] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24) ||
      ad.numElements() != w.toLong * h) return null
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    val n = w * h
    while (i < n) {
      img.setRGB(i % w, i / w, ad.getInt(i))
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream(64 + n * 3)
    // MemoryCacheImageOutputStream: no disk-cache temp files per row
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      if (!javax.imageio.ImageIO.write(img, "png", ios)) return null
      ios.flush()
    } finally ios.close()
    out.toByteArray
  }

  override protected def nullSafeEval(px: Any, w: Any, h: Any): Any =
    encode(px.asInstanceOf[ArrayData], w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pngEncode", this, classOf[PngEncode].getName)
    nullSafeCodeGen(ctx, ev, (px, w, h) => s"""
      ${ev.value} = $ref.encode($px, $w, $h);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PngEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Compressed-image decode via the JDK-builtin `javax.imageio` readers
  * (PNG / JPEG / BMP / GIF / WBMP — java.desktop, no external jar):
  * binary → struct(fmt, width, height, gray array<int>), gray being the
  * same Rec. 709 integer surrogate ⌊(2126·R + 7152·G + 722·B)/10000⌋
  * per pixel as [[PnmDecode]], over the decoder's 8-bit sRGB output.
  * This retires the md5 stub for images: PNM covers the byte-exact
  * oracle path, ImageIoDecode the real-world container formats.
  *
  * Robustness contract (identical to PnmDecode): any malformed payload
  * — unknown magic, truncated stream, decoder exception — is NULL, not
  * an error. The bomb guard reads width/height from the HEADER first
  * (ImageReader.getWidth/getHeight are metadata peeks, not decodes) and
  * nulls anything above 2²⁴ pixels BEFORE allocating the raster, so a
  * decompression bomb costs a header parse, never memory.
  *
  * Determinism: PNG/BMP/GIF decode is bit-exact by spec. JPEG inverse
  * DCT may vary across JDK builds — fine for near-dup fingerprints
  * (grid means absorb ±1 pixel noise), not for an oracle; oracle
  * queries use PNG (lossless) payloads only.
  */
case class ImageIoDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("fmt", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("gray", ArrayType(IntegerType, containsNull = false), nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"imageio_decode requires binary, got $other")
  }

  /** Header-guarded decode; null on any malformation. Public for codegen. */
  def decode(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length == 0) return null
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val w = reader.getWidth(0) // header peek, no raster allocation
        val h = reader.getHeight(0)
        if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return null
        val img = reader.read(0)
        val fmt = org.apache.spark.unsafe.types.UTF8String.fromString(
          reader.getFormatName.toLowerCase(java.util.Locale.ROOT))
        // one bulk grab instead of w*h virtual getRGB(x,y) calls — the
        // Javadoc pins both to the same default-sRGB conversion, so the
        // luma ints are bit-identical
        val argb = img.getRGB(0, 0, w, h, null, 0, w)
        val gray = new Array[Int](w * h)
        var i = 0
        while (i < gray.length) {
          val rgb = argb(i)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          gray(i) = ((2126L * r + 7152L * g + 722L * b) / 10000L).toInt
          i += 1
        }
        new GenericInternalRow(Array[Any](fmt, w, h,
          org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(gray)))
      } finally reader.dispose()
    } catch {
      case scala.util.control.NonFatal(_) => null // decode failure is data
    } finally iis.close()
  }

  override protected def nullSafeEval(input: Any): Any =
    decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("imageIoDecode", this, classOf[ImageIoDecode].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.decode($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): ImageIoDecode =
    copy(child = newChild)
}

/** Column-API wrappers for the media perceptual-hash expressions. */
object MediaFunctions {
  def lumaGrid(bytes: Column): Column =
    GraftExprBridge.column(LumaGrid(GraftExprBridge.expression(bytes)))
  def aHash64(grid: Column): Column =
    GraftExprBridge.column(AHash64(GraftExprBridge.expression(grid)))
  def dHash64(grid: Column): Column =
    GraftExprBridge.column(DHash64(GraftExprBridge.expression(grid)))
  def packBytes(ints: Column): Column =
    GraftExprBridge.column(PackBytes(GraftExprBridge.expression(ints)))
  def pnmDecode(bytes: Column): Column =
    GraftExprBridge.column(PnmDecode(GraftExprBridge.expression(bytes)))
  def lumaGrid2d(pixels: Column, width: Column, height: Column): Column =
    GraftExprBridge.column(LumaGrid2D(
      GraftExprBridge.expression(pixels),
      GraftExprBridge.expression(width),
      GraftExprBridge.expression(height)))
  def pngEncode(pixels: Column, width: Column, height: Column): Column =
    GraftExprBridge.column(PngEncode(
      GraftExprBridge.expression(pixels),
      GraftExprBridge.expression(width),
      GraftExprBridge.expression(height)))
  def imageIoDecode(bytes: Column): Column =
    GraftExprBridge.column(ImageIoDecode(GraftExprBridge.expression(bytes)))
  def aviEncode(frames: Column, width: Column, height: Column): Column =
    GraftExprBridge.column(AviEncode(
      GraftExprBridge.expression(frames),
      GraftExprBridge.expression(width),
      GraftExprBridge.expression(height)))
  def aviFrames(bytes: Column, every: Column): Column =
    GraftExprBridge.column(AviFrames(
      GraftExprBridge.expression(bytes),
      GraftExprBridge.expression(every)))
  def aviEncodeMeta(codec: Column, width: Column, height: Column,
      frameSizes: Column, keyEvery: Column): Column =
    GraftExprBridge.column(AviEncodeMeta(Seq(
      GraftExprBridge.expression(codec),
      GraftExprBridge.expression(width),
      GraftExprBridge.expression(height),
      GraftExprBridge.expression(frameSizes),
      GraftExprBridge.expression(keyEvery))))
  def aviProbe(bytes: Column): Column =
    GraftExprBridge.column(AviProbe(GraftExprBridge.expression(bytes)))
}

/** Minimal AVI (RIFF) container encoder over UNCOMPRESSED 24-bit DIB
  * frames ('00db' chunks, biCompression = BI_RGB): array of packed
  * 0xRRGGBB int arrays → playable AVI bytes (hdrl with avih + one
  * vids/DIB stream, movi with one '00db' per frame, rows bottom-up
  * BGR with 4-byte stride padding — the DIB layout). The fixture-side
  * twin of [[AviFrames]]: formula-derived frames go through REAL
  * container bytes so every field of the decoder's RIFF walk is
  * exercised by the oracle.
  */
case class AviEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(ArrayType(IntegerType, _), _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"avi_encode requires (array<array<int>>, int, int), got $other")
    }

  /** Public so codegen can call it; null on shape mismatch. */
  def encode(framesAd: ArrayData, w: Int, h: Int): Array[Byte] = {
    val nf = framesAd.numElements()
    if (w <= 0 || h <= 0 || nf <= 0 || w.toLong * h * nf > (1L << 24)) return null
    val stride = (w * 3 + 3) & ~3
    val frameBytes = stride * h
    var f = 0
    while (f < nf) {
      val fr = framesAd.getArray(f)
      if (fr == null || fr.numElements() != w.toLong * h) return null
      f += 1
    }
    val moviSize = 4 + nf * (8 + frameBytes)
    // RIFF(12) + LIST hdrl(12 + avih(64) + LIST strl(12 + strh(64) + strf(48)))
    val hdrlContent = 4 + 64 + (8 + 4 + 64 + 48)
    val total = 12 + (8 + hdrlContent) + (8 + moviSize)
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); b.putInt(total - 8); fourcc("AVI ")
    fourcc("LIST"); b.putInt(hdrlContent); fourcc("hdrl")
    fourcc("avih"); b.putInt(56)
    b.putInt(40000).putInt(0).putInt(0).putInt(0)     // usec/frame, maxbps, pad, flags
    b.putInt(nf).putInt(0).putInt(1).putInt(frameBytes) // frames, initial, streams, bufsize
    b.putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0) // w, h, reserved[4]
    fourcc("LIST"); b.putInt(4 + 64 + 48); fourcc("strl")
    fourcc("strh"); b.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    b.putInt(0).putShort(0).putShort(0).putInt(0)     // flags, prio, lang, initial
    b.putInt(1).putInt(25).putInt(0).putInt(nf)       // scale, rate, start, length
    b.putInt(frameBytes).putInt(-1).putInt(0)         // bufsize, quality, samplesize
    b.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
    fourcc("strf"); b.putInt(40)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    b.putInt(0).putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); b.putInt(moviSize); fourcc("movi")
    f = 0
    while (f < nf) {
      val fr = framesAd.getArray(f)
      fourcc("00db"); b.putInt(frameBytes)
      var row = h - 1 // DIB rows are bottom-up
      while (row >= 0) {
        var x = 0
        while (x < w) {
          val p = fr.getInt(row * w + x)
          b.put((p & 0xff).toByte)          // B
          b.put(((p >> 8) & 0xff).toByte)   // G
          b.put(((p >> 16) & 0xff).toByte)  // R
          x += 1
        }
        var pad = stride - w * 3
        while (pad > 0) { b.put(0.toByte); pad -= 1 }
        row -= 1
      }
      f += 1
    }
    b.array()
  }

  override protected def nullSafeEval(fr: Any, w: Any, h: Any): Any =
    encode(fr.asInstanceOf[ArrayData], w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("aviEncode", this, classOf[AviEncode].getName)
    nullSafeCodeGen(ctx, ev, (fr, w, h) => s"""
      ${ev.value} = $ref.encode($fr, $w, $h);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): AviEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** REAL video-container decode for AVI: RIFF walk (WORD-aligned chunk
  * skipping, the [[WavDecode]] discipline) → 'strf' BITMAPINFOHEADER
  * validation (24 bpp; BI_RGB or MJPG) → 'movi' scan taking every
  * k-th frame → per-frame Rec. 709 integer gray rasters in top-down
  * row order. Two codec paths: '00db' raw bottom-up DIB rows
  * (bit-exact, the oracle-checkable fixture format) and — when the
  * stream declares MJPG — '00dc' per-frame JPEG through the
  * JDK-builtin reader (real Motion-JPEG; deterministic within a JDK,
  * so spec-checked rather than oracle-replayed). Retires the video
  * row of [[graft.multimodal.Media.decodeStub]] for both formats;
  * only inter-frame codecs the JDK lacks (H.264-class) remain
  * honestly stubbed.
  *
  * Output: struct(width, height, n_frames, frames array<struct<idx,
  * gray>>) where n_frames counts ALL frames in the container and
  * frames carries the sampled subset. Robustness contract identical
  * to PnmDecode/WavDecode/ImageIoDecode: any malformation — bad
  * magic, truncated chunk, compressed stream, frame-size mismatch —
  * is NULL, not an error; a pixel-volume bomb guard (2²⁴) reads the
  * header before any allocation.
  */
case class AviFrames(left: Expression, right: Expression)
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
        s"avi_frames requires (binary, int), got $other")
    }

  /** Public so codegen can call it; null on any malformation. */
  def decode(bytes: Array[Byte], every: Int): InternalRow = {
    if (bytes == null || bytes.length < 24 || every <= 0) return null
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, "US-ASCII")
    if (fcc(0) != "RIFF" || fcc(8) != "AVI ") return null
    try {
      // pass 1: find strf (inside hdrl/strl) for the geometry
      var w = -1; var h = -1; var mjpeg = false
      def walk(start: Int, end: Int, depth: Int)(chunk: (String, Int, Int) => Boolean): Boolean = {
        var p = start
        while (p + 8 <= end) {
          val id = fcc(p)
          val size = b.getInt(p + 4)
          if (size < 0 || p + 8 + size > bytes.length) return false
          if (id == "LIST" && depth < 4) {
            if (!walk(p + 12, p + 8 + size, depth + 1)(chunk)) return false
          } else if (!chunk(id, p + 8, size)) return false
          p += 8 + size + (size & 1) // WORD-aligned chunk skip
        }
        true
      }
      val geomOk = walk(12, bytes.length, 0) { (id, off, size) =>
        if (id == "strf" && size >= 40) {
          if (b.getInt(off) < 40) false
          else {
            w = b.getInt(off + 4); h = b.getInt(off + 8)
            val planes = b.getShort(off + 12); val bpp = b.getShort(off + 14)
            val comp = b.getInt(off + 16)
            // BI_RGB uncompressed DIB, or MJPG (per-frame JPEG — the
            // JDK ships a JPEG reader, so Motion-JPEG decodes for real)
            mjpeg = comp == 0x47504A4D
            planes == 1 && bpp == 24 && (comp == 0 || mjpeg)
          }
        } else true
      }
      if (!geomOk || w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return null
      val stride = (w * 3 + 3) & ~3
      val frameBytes = stride * h
      // pass 2: every k-th frame — '00db'/'01db' raw DIB (bottom-up →
      // top-down), or '00dc'/'01dc' JPEG when the stream declares MJPG
      val sampled = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Int])]
      var nFrames = 0
      def dibGray(off: Int): Array[Int] = {
        val gray = new Array[Int](w * h)
        var row = 0
        while (row < h) {
          val src = off + (h - 1 - row) * stride
          var x = 0
          while (x < w) {
            val bl = bytes(src + x * 3) & 0xff
            val g = bytes(src + x * 3 + 1) & 0xff
            val r = bytes(src + x * 3 + 2) & 0xff
            gray(row * w + x) = ((2126L * r + 7152L * g + 722L * bl) / 10000L).toInt
            x += 1
          }
          row += 1
        }
        gray
      }
      // per-frame JPEG through the JDK reader; null (via None) on any
      // decoder failure or a frame whose geometry disagrees with strf
      def jpegGray(off: Int, size: Int): Option[Array[Int]] = {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes, off, size))
        if (img == null || img.getWidth != w || img.getHeight != h) None
        else {
          // bulk ARGB grab — same default-sRGB ints as getRGB(x,y),
          // one call per frame instead of one per pixel
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
          Some(gray)
        }
      }
      val framesOk = walk(12, bytes.length, 0) { (id, off, size) =>
        val isDib = id == "00db" || id == "01db"
        val isJpg = mjpeg && (id == "00dc" || id == "01dc")
        if (!isDib && !isJpg) true
        else if (isDib && size != frameBytes) false // geometry and payload disagree
        else {
          if (nFrames % every == 0) {
            if ((sampled.length + 1).toLong * w * h > (1L << 24)) return null
            val gray =
              if (isDib) dibGray(off)
              else jpegGray(off, size) match {
                case Some(g) => g
                case None => return null
              }
            sampled += ((nFrames, gray))
          }
          nFrames += 1
          true
        }
      }
      if (!framesOk || nFrames == 0) return null
      val frames = sampled.map { case (idx, gray) =>
        new GenericInternalRow(Array[Any](idx,
          // zero-boxing wrap: a GenericArrayData here boxed every pixel
          // (~16 B/px of garbage per sampled frame - the measured GC
          // pressure behind q269's full-catalog inflation)
          org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(gray)))
      }.toArray[Any]
      new GenericInternalRow(Array[Any](w, h, nFrames, new GenericArrayData(frames)))
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  override protected def nullSafeEval(bytes: Any, every: Any): Any =
    decode(bytes.asInstanceOf[Array[Byte]], every.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("aviFrames", this, classOf[AviFrames].getName)
    nullSafeCodeGen(ctx, ev, (bytes, every) => s"""
      ${ev.value} = (InternalRow) $ref.decode($bytes, $every);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AviFrames =
    copy(left = newLeft, right = newRight)
}

/** Fixture-side AVI container encoder with ARBITRARY codec fourcc and
  * frame-size plan — the compressed-video twin of [[AviEncode]]: where
  * AviEncode writes decodable DIB payloads, this writes a
  * structurally-real container (RIFF/hdrl/strl/strf/movi/idx1) whose
  * '00dc' frame payloads are opaque filler of the PLANNED sizes, plus a
  * real 'idx1' index with AVIIF_KEYFRAME flags every `keyEvery`-th
  * frame. [[AviProbe]] must recover exactly the planted codec,
  * geometry, frame sizes, and keyframe census from these bytes — the
  * container-level triage contract for codecs the JVM cannot decode
  * (H.264-class), where admission/dedup decisions ride on metadata.
  *
  * Inputs: codec (exactly 4 ASCII chars, e.g. "H264", "MJPG"; "DIB "
  * writes biCompression 0), width, height, frameSizes (bytes per
  * frame), keyEvery (>0). Null / shape violations / >2²⁶ total bytes →
  * null.
  */
case class AviEncodeMeta(children: Seq[Expression])
    extends Expression {

  require(children.length == 5,
    "avi_encode_meta(codec, width, height, frame_sizes, key_every)")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    children.map(_.dataType) match {
      case Seq(StringType, IntegerType, IntegerType,
        ArrayType(IntegerType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"avi_encode_meta requires (string, int, int, array<int>, int), got $other")
    }

  /** Public so codegen can call it; null on any shape violation. */
  def encode(codecU: org.apache.spark.unsafe.types.UTF8String,
      w: Int, h: Int, sizesAd: ArrayData, keyEvery: Int): Array[Byte] = {
    if (codecU == null || sizesAd == null) return null
    val codec = codecU.toString
    val nf = sizesAd.numElements()
    if (codec.length != 4 || !codec.forall(c => c >= 0x20 && c < 0x7f)) return null
    if (w <= 0 || h <= 0 || nf <= 0 || nf > 4096 || keyEvery <= 0) return null
    var payload = 0L
    var i = 0
    while (i < nf) {
      val s = sizesAd.getInt(i)
      if (s < 0) return null
      payload += s + 8 + (s & 1)
      i += 1
    }
    if (payload > (1L << 26)) return null
    val comp = if (codec == "DIB ") 0
    else codec.charAt(0) | (codec.charAt(1) << 8) | (codec.charAt(2) << 16) | (codec.charAt(3) << 24)
    val moviSize = 4 + payload.toInt
    val idxSize = 16 * nf
    val hdrlContent = 4 + 64 + (8 + 4 + 64 + 48)
    val total = 12 + (8 + hdrlContent) + (8 + moviSize) + (8 + idxSize)
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); b.putInt(total - 8); fourcc("AVI ")
    fourcc("LIST"); b.putInt(hdrlContent); fourcc("hdrl")
    fourcc("avih"); b.putInt(56)
    b.putInt(40000).putInt(0).putInt(0).putInt(0)
    b.putInt(nf).putInt(0).putInt(1).putInt(0)
    b.putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); b.putInt(4 + 64 + 48); fourcc("strl")
    fourcc("strh"); b.putInt(56)
    fourcc("vids"); fourcc(codec)
    b.putInt(0).putShort(0).putShort(0).putInt(0)
    b.putInt(1).putInt(25).putInt(0).putInt(nf)
    b.putInt(0).putInt(-1).putInt(0)
    b.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    fourcc("strf"); b.putInt(40)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    b.putInt(comp).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); b.putInt(moviSize); fourcc("movi")
    val offsets = new Array[Int](nf)
    i = 0
    while (i < nf) {
      offsets(i) = b.position() - (12 + (8 + hdrlContent) + 8) // rel. 'movi'
      val s = sizesAd.getInt(i)
      fourcc("00dc"); b.putInt(s)
      // deterministic filler: byte j of frame i = (i*131 + j*7) mod 256
      var j = 0
      while (j < s) { b.put(((i * 131 + j * 7) & 0xff).toByte); j += 1 }
      if ((s & 1) == 1) b.put(0.toByte) // WORD alignment pad
      i += 1
    }
    fourcc("idx1"); b.putInt(idxSize)
    i = 0
    while (i < nf) {
      fourcc("00dc")
      b.putInt(if (i % keyEvery == 0) 0x10 else 0) // AVIIF_KEYFRAME
      b.putInt(offsets(i))
      b.putInt(sizesAd.getInt(i))
      i += 1
    }
    b.array()
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
    val ref = ctx.addReferenceObj("aviEncodeMeta", this, classOf[AviEncodeMeta].getName)
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
      newChildren: IndexedSeq[Expression]): AviEncodeMeta =
    copy(children = newChildren)
}

/** Container-level video triage WITHOUT decoding — the operational
  * answer for codecs the JVM cannot decompress offline (H.264-class):
  * parse the fourcc, geometry, per-frame chunk sizes, and the 'idx1'
  * keyframe census straight off the RIFF structure, so a curation
  * pipeline can run codec censuses, size/shape QA gates, and
  * exact-duplicate detection (a container fingerprint over the frame
  * size sequence) on compressed video it cannot decode — by metadata
  * instead of dropping the asset.
  *
  * Output: struct(codec, width, height, n_frames, n_keyframes,
  * frame_sizes) where codec is "DIB" for biCompression 0 and the ASCII
  * fourcc otherwise; n_keyframes counts AVIIF_KEYFRAME (0x10) entries
  * in 'idx1', or -1 when the container carries no index (DIB fixtures
  * from [[AviEncode]]). Robustness contract identical to [[AviFrames]]:
  * any malformation → NULL; a frame-count bomb guard (2²⁰) bounds the
  * array before any allocation. Works on ANY video stream the RIFF
  * walk accepts, including those [[AviFrames]] decodes — triage and
  * decode agree on geometry and frame count by construction.
  */
case class AviProbe(child: Expression) extends UnaryExpression {

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
      TypeCheckResult.TypeCheckFailure(s"avi_probe requires binary, got $other")
  }

  /** Public so codegen can call it; null on any malformation. */
  def probe(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 24) return null
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, "US-ASCII")
    if (fcc(0) != "RIFF" || fcc(8) != "AVI ") return null
    try {
      var w = -1; var h = -1; var comp = Int.MinValue
      var nKey = -1
      val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
      def walk(start: Int, end: Int, depth: Int)(chunk: (String, Int, Int) => Boolean): Boolean = {
        var p = start
        while (p + 8 <= end) {
          val id = fcc(p)
          val size = b.getInt(p + 4)
          if (size < 0 || p + 8 + size > bytes.length) return false
          if (id == "LIST" && depth < 4) {
            if (!walk(p + 12, p + 8 + size, depth + 1)(chunk)) return false
          } else if (!chunk(id, p + 8, size)) return false
          p += 8 + size + (size & 1)
        }
        true
      }
      val ok = walk(12, bytes.length, 0) { (id, off, size) =>
        if (id == "strf" && size >= 40) {
          if (b.getInt(off) < 40) false
          else {
            w = b.getInt(off + 4); h = b.getInt(off + 8)
            comp = b.getInt(off + 16)
            true
          }
        } else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
            (id.endsWith("db") || id.endsWith("dc"))) {
          if (sizes.length >= (1 << 20)) false // frame-count bomb guard
          else { sizes += size; true }
        } else if (id == "idx1") {
          if (size % 16 != 0) false
          else {
            var k = 0
            var e = off
            while (e + 16 <= off + size) {
              if ((b.getInt(e + 4) & 0x10) != 0) k += 1
              e += 16
            }
            nKey = k
            true
          }
        } else true
      }
      if (!ok || w <= 0 || h <= 0 || comp == Int.MinValue || sizes.isEmpty) return null
      val codec =
        if (comp == 0) "DIB"
        else new String(Array[Byte](
          (comp & 0xff).toByte, ((comp >> 8) & 0xff).toByte,
          ((comp >> 16) & 0xff).toByte, ((comp >> 24) & 0xff).toByte), "US-ASCII")
      new GenericInternalRow(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString(codec),
        w, h, sizes.length, nKey,
        new GenericArrayData(sizes.toArray[Any])))
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("aviProbe", this, classOf[AviProbe].getName)
    nullSafeCodeGen(ctx, ev, bytes => s"""
      ${ev.value} = (InternalRow) $ref.probe($bytes);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): AviProbe =
    copy(child = newChild)
}
