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

  /** Null bounds drop the interval (a NULL never satisfies the BETWEEN,
    * matching the theta join); non-finite bounds or a span wider than
    * `maxBucketsPerInterval` buckets raise a clear error instead of an
    * ANSI cast failure / runaway sequence — one sentinel row like
    * hi = 1e18 must not OOM the whole job silently.
    */
  def pointInInterval(
      points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double,
      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lo = col(loCol).cast("double")
    val hi = col(hiCol).cast("double")
    val bLo = floor(lo / bucketWidth).cast("long")
    val bHi = floor(hi / bucketWidth).cast("long")
    val buckets =
      when(lo.isNull || hi.isNull || hi < lo, array().cast("array<bigint>"))
        .when(isnan(lo) || isnan(hi) ||
            abs(lo) === lit(Double.PositiveInfinity) ||
            abs(hi) === lit(Double.PositiveInfinity),
          raise_error(lit("pointInInterval: non-finite interval bound")))
        .when(bHi - bLo >= maxBucketsPerInterval,
          raise_error(concat(lit("pointInInterval: interval spans more than "),
            lit(maxBucketsPerInterval), lit(" buckets; raise bucketWidth"))))
        .otherwise(sequence(bLo, bHi))
    val pb = points.withColumn("__b", floor(col(pCol) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("__b", explode(buckets))
    pb.join(ib, Seq("__b"))
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__b")
  }

  /** Large×large interval OVERLAP join: pairs whose [lo, hi] ranges
    * intersect (`aLo <= bHi && bLo <= aHi`) — temporal entity overlap,
    * session co-occurrence, genomic-style range intersection. Same
    * bucket trick as [[pointInInterval]], plus the standard
    * emit-once rule that replaces a post-join `distinct` (a full
    * shuffle of the output): a pair meets in every shared bucket, but
    * is EMITTED only in the bucket that contains the overlap's start
    * (`floor(max(aLo, bLo)/w)`) — which both sides' bucket lists
    * always contain. Each qualifying pair therefore appears exactly
    * once, with no dedup stage.
    *
    * Column names must be disjoint between the two inputs (standard
    * for the ext joins); bounds/width contract as in
    * [[pointInInterval]].
    */
  def intervalOverlapJoin(
      left: DataFrame, lLoCol: String, lHiCol: String,
      right: DataFrame, rLoCol: String, rHiCol: String,
      bucketWidth: Double,
      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def buckets(loCol: String, hiCol: String) = {
      val lo = col(loCol).cast("double")
      val hi = col(hiCol).cast("double")
      val bLo = floor(lo / bucketWidth).cast("long")
      val bHi = floor(hi / bucketWidth).cast("long")
      when(lo.isNull || hi.isNull || hi < lo, array().cast("array<bigint>"))
        .when(isnan(lo) || isnan(hi) ||
            abs(lo) === lit(Double.PositiveInfinity) ||
            abs(hi) === lit(Double.PositiveInfinity),
          raise_error(lit("intervalOverlapJoin: non-finite interval bound")))
        .when(bHi - bLo >= maxBucketsPerInterval,
          raise_error(concat(lit("intervalOverlapJoin: interval spans more than "),
            lit(maxBucketsPerInterval), lit(" buckets; raise bucketWidth"))))
        .otherwise(sequence(bLo, bHi))
    }
    val lb = left.withColumn("__b", explode(buckets(lLoCol, lHiCol)))
    val rb = right.withColumn("__b", explode(buckets(rLoCol, rHiCol)))
    lb.join(rb, Seq("__b"))
      .filter(
        col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol) &&
          col("__b") === floor(
            greatest(col(lLoCol).cast("double"), col(rLoCol).cast("double")) /
              bucketWidth).cast("long"))
      .drop("__b")
  }

  /** Merge overlapping-or-touching intervals per key (gaps-and-
    * islands): an island breaks where an interval starts strictly
    * after the running max of all earlier ends — `[1,5]` and `[5,8]`
    * touch and merge, `[1,5]` and `[6,8]` do not. Output one row per
    * island: (key, start, end, n_merged). The coverage/availability
    * reduction — maintenance windows, sensor uptime, booked slots —
    * and the interval-algebra complement of [[intervalOverlap]] (that
    * one finds pairs ACROSS relations, this one collapses WITHIN one).
    *
    * `tieBreak` totally orders identical (start, end) rows so the
    * island numbering is deterministic under retry. One Exchange on
    * the key, two Window passes over the same sort, one aggregate.
    * Works on any ordered type (dates, timestamps, numerics) — bounds
    * are compared, never subtracted.
    *
    * Rows with a null start OR end bound no interval and are dropped
    * (they cannot contribute coverage). An INVERTED interval
    * (start > end) raises a clear per-row error — sorted by its start
    * it would silently seed an island whose end precedes its start.
    */
  def intervalMerge(
      df: DataFrame,
      key: org.apache.spark.sql.Column,
      start: org.apache.spark.sql.Column,
      end: org.apache.spark.sql.Column,
      tieBreak: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key"))
      .orderBy(col("__s"), col("__e"), col("__tb"))
    val base = df
      .filter(start.isNotNull && end.isNotNull)
      .select(key.as("key"), start.as("__s"), end.as("__e"), tieBreak.as("__tb"))
      .withColumn("__ok",
        when(col("__s") <= col("__e"), lit(true))
          .otherwise(raise_error(concat(
            lit("intervalMerge: inverted interval: start "), col("__s").cast("string"),
            lit(" > end "), col("__e").cast("string")))))
      .filter(col("__ok")).drop("__ok")
    base
      .withColumn("__pm",
        max(col("__e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__isl",
        sum(when(col("__pm").isNull || col("__s") > col("__pm"), 1).otherwise(0))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("key"), col("__isl"))
      .agg(min(col("__s")).as("start"), max(col("__e")).as("end"),
        count(lit(1)).as("n_merged"))
      .drop("__isl")
  }
}
