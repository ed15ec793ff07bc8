package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bounded-heap grouped top-k: `array<struct<score,id>>` of the k
  * highest-score (id-ascending tiebreak) pairs per group, as a
  * TypedImperativeAggregate.
  *
  * WHY an aggregate and not a window: `row_number().over(partitionBy
  * (key).orderBy(...)) <= k` shuffles EVERY row to its key's partition
  * and sorts there — at 100 TB that is a full-data shuffle for a
  * k-row-per-key answer. An aggregate gets map-side partial aggregation
  * (ObjectHashAggregate): each task reduces its rows to a k-heap per
  * key locally, so the shuffle carries at most k pairs per (key, task)
  * — the same contract that makes sum() scale. The payload stays OUT of
  * the aggregate by design: ship (score, id), re-join wide columns on
  * the k·|keys| survivors (the narrow-candidates trick the ANN
  * operators use).
  *
  * Scores must not be NaN (document ordering would be undefined);
  * nulls in score or id are skipped like every Spark aggregate.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_pairs expects (double, bigint), got (${score.dataType}, ${id.dataType})")

  // dequeues the WORST entry first: lowest score, then largest id
  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(ord)

  private def push(buf: mutable.PriorityQueue[(Double, Long)], s: Double, i: Long): Unit =
    if (buf.size < k) buf.enqueue((s, i))
    else {
      val (ws, wi) = buf.head
      if (s > ws || (s == ws && i < wi)) { buf.dequeue(); buf.enqueue((s, i)) }
    }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) push(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach { case (s, i) => push(b1, s, i) }
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any =
    new GenericArrayData(
      buf.toArray.sortBy { case (s, i) => (-s, i) }
        .map { case (s, i) => new GenericInternalRow(Array[Any](s, i)) })

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "topk_pairs"
}

/** DataFrame-facing grouped top-k operator. */
object TopK {

  /** `array<struct<score,id>>` aggregate column (k best, score desc, id asc). */
  def topKPairs(score: Column, id: Column, k: Int): Column =
    GraftExprBridge.column(
      TopKPairs(GraftExprBridge.expression(score), GraftExprBridge.expression(id), k)
        .toAggregateExpression())

  /** Long-format grouped top-k: (keys..., rank, id, score), rank 1..k —
    * identical to row_number-window + filter for non-null (score, id)
    * rows, physically a partial-aggregating k-heap (see [[TopKPairs]]).
    * Null semantics are the AGGREGATE's, not the window's: rows with a
    * null score or id are skipped (like max/min), where row_number
    * ranks them last — a group of only nulls produces no output row.
    */
  def perKey(df: DataFrame, keys: Seq[String], score: Column, id: Column, k: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(topKPairs(score, id, k).as("__topk"))
      .select(keys.map(col) :+ posexplode(col("__topk")).as(Seq("__pos", "__p")): _*)
      .select(keys.map(col) ++ Seq(
        (col("__pos") + 1).cast("int").as("rank"),
        col("__p.id").as("id"),
        col("__p.score").as("score")): _*)
}
