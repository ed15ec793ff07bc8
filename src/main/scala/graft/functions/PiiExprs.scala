package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Checksum-validated PII detectors. A bare digit-run regex
  * false-positives on order ids, timestamps and hashes; the structured
  * identifiers that matter (payment cards, IBANs) carry checksums, so
  * validation is exact integer arithmetic — which also means a SQL
  * oracle can replicate the verdict digit for digit (q199).
  *
  * Both expressions are single-pass, zero-allocation compiled scalars,
  * designed to run INSIDE a candidate-extraction pipeline:
  * `regexp_extract_all` proposes spans, these confirm them. They
  * deliberately validate the candidate string alone (no document
  * context) so Spark and DuckDB agree on exactly one contract.
  */

/** Luhn (ISO/IEC 7812) check over a candidate card span: separators
  * (space/dash) are skipped, any other non-digit fails, 13–19 digits
  * required, doubled-every-second-from-the-right digit sum ≡ 0 mod 10.
  */
case class LuhnValid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"luhn_valid requires string, got $other")
  }
  override def nullSafeEval(v: Any): Any =
    LuhnValid.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LuhnValid.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): LuhnValid =
    copy(child = newChild)
  override def prettyName: String = "luhn_valid"
}

object LuhnValid {
  def compute(s: UTF8String): Boolean = {
    val str = s.toString
    var sum = 0
    var nDigits = 0
    var alt = false
    var i = str.length - 1
    while (i >= 0) {
      val c = str.charAt(i)
      if (c >= '0' && c <= '9') {
        var d = c - '0'
        if (alt) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        nDigits += 1
        alt = !alt
      } else if (c != ' ' && c != '-') return false
      i -= 1
    }
    nDigits >= 13 && nDigits <= 19 && sum % 10 == 0
  }
}

/** IBAN mod-97 (ISO 13616): first four chars rotated to the end,
  * letters mapped A=10..Z=35, and the resulting decimal ≡ 1 mod 97 —
  * computed incrementally (acc stays < 97·100) so no big-integer is
  * ever materialized. 15–34 chars, A–Z and 0–9 only (candidates come
  * compact, without display spacing).
  */
case class IbanValid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"iban_valid requires string, got $other")
  }
  override def nullSafeEval(v: Any): Any =
    IbanValid.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IbanValid.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): IbanValid =
    copy(child = newChild)
  override def prettyName: String = "iban_valid"
}

object IbanValid {
  def compute(s: UTF8String): Boolean = {
    val str = s.toString
    val n = str.length
    if (n < 15 || n > 34) return false
    var acc = 0L
    var k = 0
    while (k < n) {
      val c = str.charAt((k + 4) % n)
      if (c >= '0' && c <= '9') acc = (acc * 10L + (c - '0')) % 97L
      else if (c >= 'A' && c <= 'Z') acc = (acc * 100L + (c - 'A' + 10)) % 97L
      else return false
      k += 1
    }
    acc == 1L
  }
}

object PiiFunctions {
  def luhnValid(c: Column): Column =
    GraftExprBridge.column(LuhnValid(GraftExprBridge.expression(c)))
  def ibanValid(c: Column): Column =
    GraftExprBridge.column(IbanValid(GraftExprBridge.expression(c)))
}
