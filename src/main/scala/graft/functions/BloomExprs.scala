package graft.functions

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
  * ([[graft.ext.Joins.bloomPrunedSemiJoin]]): the filter bytes ship
  * once per task as a reference object (exactly how Spark's own
  * runtime-bloom rewrite ships its `might_contain`), deserialization
  * happens once per task, and the per-row work is a handful of xxhash
  * probes — no UDF, no boxing, stays inside WholeStageCodegen.
  *
  * False positives are expected and harmless by contract: callers MUST
  * follow with an exact join. False negatives cannot happen, so the
  * composed result is exact.
  */
case class BloomMightContain(child: org.apache.spark.sql.catalyst.expressions.Expression,
    bloomBytes: Array[Byte])
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
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => bloom.mightContainString(v.toString)
    case _ => bloom.mightContainLong(v.asInstanceOf[Number].longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("bloomBytes", bloomBytes, "byte[]")
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
         |    $bf = $bfClass.readFrom(new java.io.ByteArrayInputStream($bytesRef));
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

object BloomFunctions {
  /** Column API for [[BloomMightContain]]. */
  def mightContain(key: Column, bloomBytes: Array[Byte]): Column =
    GraftExprBridge.column(BloomMightContain(GraftExprBridge.expression(key), bloomBytes))
}
