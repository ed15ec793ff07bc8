package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval joins that scale past broadcast. A range predicate join
  * (`p BETWEEN lo AND hi`) has no equi-key, so Spark plans
  * BroadcastNestedLoopJoin — fine when one side broadcasts (q46's tiny
  * band table), O(n·m) when both sides are large. Bucketing restores an
  * equi-key: quantize the domain into width-w buckets, explode each
  * interval to the buckets it covers, tag each point with its bucket,
  * equi-join on the bucket and verify the exact predicate. A
  * (point, interval) pair can only meet in the point's own bucket, so
  * no dedup is needed. Shuffle volume is rows × (1 + span/w) — pick w
  * near the typical interval span so most intervals explode to ≤2
  * buckets. The final BETWEEN keeps semantics exact; bucketing is
  * purely physical (the q73 oracle is the plain theta join).
  */
object Ranges {

  def pointInInterval(
      points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__b", floor(col(pCol) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("__b", explode(sequence(
      floor(col(loCol) / bucketWidth).cast("long"),
      floor(col(hiCol) / bucketWidth).cast("long"))))
    pb.join(ib, Seq("__b"))
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__b")
  }
}
