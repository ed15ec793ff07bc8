package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.types._

/** Encoding-sanity native expression — step ZERO of web-scale text
  * curation, before language ID or any quality gate: is this byte
  * sequence actually the UTF-8 text it claims to be?
  *
  * [[Utf8Stats]] runs the full RFC 3629 state machine over a BINARY
  * value in one compiled pass, counting:
  *   - `n_bytes` — raw length;
  *   - `n_invalid` — bytes that are not part of any well-formed UTF-8
  *     sequence (stray continuations, overlong encodings, surrogate
  *     code points ED A0..BF, leads F5..FF, truncated tails). Each
  *     offending byte counts once and decoding resynchronizes at the
  *     next byte — the same recovery a lenient decoder performs;
  *   - `n_replacement` — well-formed U+FFFD code points (EF BF BD): the
  *     scar tissue of an EARLIER lossy decode somewhere upstream;
  *   - `n_ctl` — C0 control bytes other than tab/LF/CR: legal UTF-8,
  *     but prose never contains them (binary payloads and terminal
  *     escapes do).
  *
  * A SQL engine cannot express the invalid-byte count (DuckDB VARCHAR
  * *requires* valid UTF-8, so the question cannot even be asked of a
  * string column there); on valid text the replacement/control counts
  * are exactly replicable with `regexp_count`, which is what the q198
  * oracle checks. Scan-stage, zero allocation, codegen'd.
  */
case class Utf8Stats(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType => L}
  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", L, nullable = false),
    StructField("n_invalid", L, nullable = false),
    StructField("n_replacement", L, nullable = false),
    StructField("n_ctl", L, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"utf8_stats requires binary, got $other")
  }
  override def nullSafeEval(v: Any): Any =
    Utf8Stats.compute(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Utf8Stats.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Utf8Stats =
    copy(child = newChild)
  override def prettyName: String = "utf8_stats"
}

object Utf8Stats {
  /** One pass over the bytes; resynchronizes after an invalid byte. */
  def compute(b: Array[Byte]): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val n = b.length
    var invalid = 0L
    var repl = 0L
    var ctl = 0L
    var i = 0
    while (i < n) {
      val b0 = b(i) & 0xFF
      if (b0 < 0x80) {
        if (b0 < 0x20 && b0 != 0x09 && b0 != 0x0A && b0 != 0x0D) ctl += 1
        i += 1
      } else if (b0 < 0xC2) {
        // stray continuation (80..BF) or overlong 2-byte lead (C0/C1)
        invalid += 1; i += 1
      } else if (b0 < 0xE0) {
        if (i + 1 < n && (b(i + 1) & 0xC0) == 0x80) i += 2
        else { invalid += 1; i += 1 }
      } else if (b0 < 0xF0) {
        // E0 requires A0..BF (no overlong); ED excludes A0..BF (surrogates)
        val okCont1 = i + 1 < n && (b(i + 1) & 0xC0) == 0x80 &&
          !(b0 == 0xE0 && (b(i + 1) & 0xFF) < 0xA0) &&
          !(b0 == 0xED && (b(i + 1) & 0xFF) >= 0xA0)
        if (okCont1 && i + 2 < n && (b(i + 2) & 0xC0) == 0x80) {
          if (b0 == 0xEF && (b(i + 1) & 0xFF) == 0xBF && (b(i + 2) & 0xFF) == 0xBD)
            repl += 1
          i += 3
        } else { invalid += 1; i += 1 }
      } else if (b0 < 0xF5) {
        // F0 requires 90..BF (no overlong); F4 requires 80..8F (<= U+10FFFF)
        val okCont1 = i + 1 < n && (b(i + 1) & 0xC0) == 0x80 &&
          !(b0 == 0xF0 && (b(i + 1) & 0xFF) < 0x90) &&
          !(b0 == 0xF4 && (b(i + 1) & 0xFF) >= 0x90)
        if (okCont1 && i + 2 < n && (b(i + 2) & 0xC0) == 0x80 &&
          i + 3 < n && (b(i + 3) & 0xC0) == 0x80) i += 4
        else { invalid += 1; i += 1 }
      } else {
        invalid += 1; i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, invalid, repl, ctl))
  }
}

object EncodingFunctions {
  def utf8Stats(bytes: Column): Column =
    GraftExprBridge.column(Utf8Stats(GraftExprBridge.expression(bytes)))
}
