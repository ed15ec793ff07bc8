package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.types._

/** Linear Kaplan–Meier survival fold (Kaplan & Meier JASA 1958): given
  * the per-group step array sorted by time — each element a struct
  * carrying at-risk count `n` and event count `d` as longs — emit the
  * running product-limit estimate as an integer ppm sequence,
  * S₀ = 10⁶, Sᵢ = Sᵢ₋₁ · (nᵢ − dᵢ) div nᵢ (non-negative floor
  * division, the engine-exact recurrence any oracle replays step for
  * step).
  *
  * This replaces the former `aggregate(slice(steps, 1, i), ...)` HOF,
  * which re-folded the prefix for every step — O(k²) long ops inside
  * ONE task at k = maxSteps. The expression is a single O(k) pass, so
  * a max-resolution curve (10⁵ steps) costs 10⁵ multiply-divides
  * instead of 5·10⁹.
  *
  * Field lookup is by NAME (`n`, `d`), not ordinal, so callers may
  * carry any extra fields (t, censored counts) in the same struct.
  */
case class KmFoldPpm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  @transient private lazy val (nIdx: Int, dIdx: Int, numFields: Int) =
    child.dataType match {
      case ArrayType(st: StructType, _) =>
        (st.fieldIndex("n"), st.fieldIndex("d"), st.size)
    }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.fieldNames.contains("n") && st.fieldNames.contains("d") &&
          st("n").dataType == LongType && st("d").dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"km_fold_ppm requires array<struct<..., n: bigint, d: bigint, ...>>, got $other")
  }

  /** One linear pass; public so codegen can call it.
    *
    * A step with n ≤ 0 (or a null element that slipped past analysis)
    * has no defined product-limit factor: its output — and every
    * later step's, since the accumulator is poisoned — is null,
    * matching what the former SQL `div`-by-zero fold produced.
    */
  def fold(arr: ArrayData): GenericArrayData = {
    val k = arr.numElements()
    val out = new Array[Any](k)
    var acc = 1000000L
    var poisoned = false
    var i = 0
    while (i < k) {
      if (!poisoned) {
        if (arr.isNullAt(i)) { poisoned = true }
        else {
          val row = arr.getStruct(i, numFields)
          val n = row.getLong(nIdx)
          val d = row.getLong(dIdx)
          if (n <= 0L) { poisoned = true }
          else {
            // n ≥ d + 1 by construction (at-risk includes this step's
            // events); floorDiv keeps parity with SQL div on the
            // non-negative operands.
            acc = Math.floorDiv(acc * (n - d), n)
            out(i) = acc
          }
        }
      }
      if (poisoned) out(i) = null
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    fold(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kmFold", this, classOf[KmFoldPpm].getName)
    defineCodeGen(ctx, ev, c => s"$ref.fold($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): KmFoldPpm =
    copy(child = newChild)
}

object StatFunctions {
  def kmFoldPpm(steps: Column): Column =
    GraftExprBridge.column(KmFoldPpm(GraftExprBridge.expression(steps)))
}
