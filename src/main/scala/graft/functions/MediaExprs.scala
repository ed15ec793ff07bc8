package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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

/** Column-API wrappers for the media perceptual-hash expressions. */
object MediaFunctions {
  def lumaGrid(bytes: Column): Column =
    GraftExprBridge.column(LumaGrid(GraftExprBridge.expression(bytes)))
  def aHash64(grid: Column): Column =
    GraftExprBridge.column(AHash64(GraftExprBridge.expression(grid)))
  def dHash64(grid: Column): Column =
    GraftExprBridge.column(DHash64(GraftExprBridge.expression(grid)))
}
