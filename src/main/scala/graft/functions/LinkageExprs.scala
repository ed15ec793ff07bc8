package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native compiled expression — the
  * record-linkage scorer ([[graft.ext.Linkage]]'s q-gram + Levenshtein
  * pipeline covers edit distance; Jaro–Winkler is the name-matching
  * standard: order-tolerant within a sliding match window, with the
  * Winkler prefix boost that rewards the shared beginnings human-entered
  * names actually share).
  *
  * Semantics (the classic Winkler 1990 form, matching DuckDB/rapidfuzz's
  * `jaro_winkler_similarity` so the oracle can replicate values):
  *   - match window = ⌊max(|a|,|b|)/2⌋ − 1 (min 0); greedy left-to-right
  *     matching; transpositions = half the out-of-order matches;
  *   - jaro = (m/|a| + m/|b| + (m−t)/m)/3, 0.0 when m = 0;
  *   - winkler boost only above 0.7: jw = j + ℓ·0.1·(1−j) with ℓ the
  *     common prefix capped at 4;
  *   - both empty → 1.0, one empty → 0.0.
  *
  * Operates on Unicode CODE POINTS, not UTF-8 bytes: multi-byte
  * characters compare as single units, matching DuckDB/rapidfuzz's
  * character-level semantics on any input (byte-wise comparison would
  * score non-ASCII names wrongly and could spuriously match
  * continuation bytes across different characters). ASCII input — the
  * dominant linkage domain — takes a widening copy of the byte array
  * with no decode; only non-ASCII strings pay a real UTF-8 decode,
  * once per value. The final arithmetic is a fixed shape of IEEE
  * double ops; catalog queries round the score (both sides) so a
  * last-ulp libm difference can't flip a hash.
  */
object JaroWinklerImpl {

  /** UTF-8 → code points; ASCII fast path widens bytes without decoding. */
  private def codePoints(s: UTF8String): Array[Int] = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (i < bytes.length && ascii) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) {
      val out = new Array[Int](bytes.length)
      i = 0
      while (i < bytes.length) { out(i) = bytes(i); i += 1 }
      out
    } else s.toString.codePoints().toArray
  }

  /** Static entry shared by interpreted eval and generated code. */
  def sim(a: UTF8String, b: UTF8String): Double = {
    val x = codePoints(a)
    val y = codePoints(b)
    val la = x.length
    val lb = y.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val bound = math.max(0, math.max(la, lb) / 2 - 1)
    // the matched-flag arrays below index code points, not bytes
    val mx = new Array[Boolean](la)
    val my = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - bound)
      val hi = math.min(lb - 1, i + bound)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!my(j) && y(j) == x(i)) {
          mx(i) = true; my(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk the two matched subsequences in order
    var t2 = 0
    var j = 0
    i = 0
    while (i < la) {
      if (mx(i)) {
        while (!my(j)) j += 1
        if (x(i) != y(j)) t2 += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val t = (t2 / 2).toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lmax = math.min(4, math.min(la, lb))
    while (l < lmax && x(l) == y(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (string, string), got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.sim($a, $b);")

  override def prettyName: String = "jaro_winkler"

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinkler =
    copy(left = l, right = r)
}

object LinkageFunctions {
  def jaroWinkler(a: Column, b: Column): Column =
    GraftExprBridge.column(JaroWinkler(
      GraftExprBridge.expression(a), GraftExprBridge.expression(b)))
}
