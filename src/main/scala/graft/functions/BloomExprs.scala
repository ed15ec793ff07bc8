package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter, as a native
  * codegen expression.
  *
  * This is the scan-stage half of the bloom-pruned semi-join
  * ([[graft.ext.Joins.bloomPrunedSemiJoin]]): the expression carries a
  * `Broadcast` HANDLE to the filter bytes, not the bytes themselves —
  * the serialized task binary stays a few bytes and the filter ships
  * to each executor ONCE over the torrent broadcast path, however many
  * stages and task retries reference it. (Embedding the bytes as an
  * expression literal would re-ship them inside every task closure —
  * at the documented 10^8-key sizing that is ~10^2 MB per stage.)
  * Deserialization happens once per task, and the per-row work is a
  * handful of xxhash probes — no UDF, no boxing, stays inside
  * WholeStageCodegen.
  *
  * False positives are expected and harmless by contract: callers MUST
  * follow with an exact join. False negatives cannot happen, so the
  * composed result is exact.
  */
case class BloomMightContain(child: org.apache.spark.sql.catalyst.expressions.Expression,
    bloomBc: Broadcast[Array[Byte]])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs an integral or string key, got ${other.sql}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBc.value))

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => bloom.mightContainString(v.toString)
    case _ => bloom.mightContainLong(v.asInstanceOf[Number].longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcClass = classOf[Broadcast[_]].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloomBc, bcClass)
    val bfClass = classOf[BloomFilter].getName
    val bf = ctx.addMutableState(bfClass, "graftBloom")
    val probe = child.dataType match {
      case StringType => (v: String) => s"$bf.mightContainString($v.toString())"
      case _ => (v: String) => s"$bf.mightContainLong((long) $v)"
    }
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |if ($bf == null) {
         |  try {
         |    $bf = $bfClass.readFrom(
         |      new java.io.ByteArrayInputStream((byte[]) $bcRef.value()));
         |  } catch (java.io.IOException e) { throw new RuntimeException(e); }
         |}
         |${ev.value} = ${probe(v)};
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

/** SQL-facing sibling of [[BloomMightContain]]: the serialized filter
  * arrives as a FOLDABLE binary expression (a literal or parameter)
  * instead of a Broadcast handle, so the function is registrable via
  * SparkSessionExtensions. The filter deserializes once per expression
  * instance (lazily, on first row), never per row; for big production
  * filters prefer the broadcast-based Column API — a SQL literal ships
  * the bytes inside the plan itself.
  */
case class BloomMightContainBytes(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType | IntegerType | ShortType | ByteType | StringType, BinaryType)
        if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs (integral or string key, foldable binary filter), got $other")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(
      right.eval(null).asInstanceOf[Array[Byte]]))

  /** Shared by interpreted eval and generated code (autoboxed there). */
  def might(v: Any): Boolean = left.dataType match {
    case StringType => bloom.mightContainString(v.toString)
    case _ => bloom.mightContainLong(v.asInstanceOf[Number].longValue())
  }

  override def nullSafeEval(l: Any, r: Any): Any = might(l)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBytesExpr", this,
      classOf[BloomMightContainBytes].getName)
    nullSafeCodeGen(ctx, ev, (l, _) => s"${ev.value} = $ref.might($l);")
  }

  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression): BloomMightContainBytes =
    copy(left = l, right = r)

  override def prettyName: String = "bloom_might_contain"
}

object BloomFunctions {
  /** Column API for [[BloomMightContain]] — takes the already-broadcast
    * filter bytes so one broadcast serves every stage that probes it.
    */
  def mightContain(key: Column, bloomBc: Broadcast[Array[Byte]]): Column =
    GraftExprBridge.column(BloomMightContain(GraftExprBridge.expression(key), bloomBc))
}
