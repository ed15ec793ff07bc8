package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: how rows are ARRANGED into files decides how
  * much of 100 TB a query has to read. Parquet/ORC footers carry
  * per-file (and per-row-group) min/max stats; a scan prunes a file
  * when the predicate excludes its [min, max] box. Sorting by one
  * column gives perfect pruning on that column and none on the others
  * — Z-ordering interleaves the bits of several columns so every file
  * covers a small HYPER-RECTANGLE of the key space, and selective
  * predicates on ANY of the z-columns prune most files.
  */
object Layout {

  /** Morton (Z-order) key: interleave the low `bitsPer` bits of each
    * bucketized column; column j contributes bit i to output bit
    * (i·N + j). Built from shift/mask/or Column arithmetic only — the
    * whole key stays inside WholeStageCodegen, no UDF, no custom
    * expression needed.
    *
    * Inputs must already be integer bucket ids in [0, 2^bitsPer); see
    * [[rangeBucket]] for the scaling step. N·bitsPer must fit a signed
    * long (≤ 62 here, conservatively).
    */
  def mortonKey(buckets: Seq[Column], bitsPer: Int): Column = {
    val n = buckets.size
    require(n >= 1 && n * bitsPer <= 62, s"morton: $n cols x $bitsPer bits exceeds a long")
    val terms = for {
      j <- 0 until n
      i <- 0 until bitsPer
    } yield shiftleft(
      shiftrightunsigned(buckets(j).cast("long"), i).bitwiseAND(lit(1L)),
      i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Uniform-width bucket id in [0, 2^bitsPer) for a numeric column
    * given its [lo, hi] range: floor((x − lo)/(hi − lo) · 2^bitsPer),
    * clamped. Deterministic double arithmetic (one subtract, one
    * divide, one multiply, one floor) so an external engine reproduces
    * the exact ids. Width-based (not rank-based) bucketing keeps the
    * formula stateless; at heavy skew, feed a pre-transformed column
    * (log, rank) instead.
    */
  def rangeBucket(x: Column, lo: Column, hi: Column, bitsPer: Int): Column = {
    val buckets = (1L << bitsPer).toDouble
    val raw = floor((x.cast("double") - lo.cast("double")) /
      (hi.cast("double") - lo.cast("double")) * buckets).cast("long")
    least(greatest(raw, lit(0L)), lit((1L << bitsPer) - 1L))
  }

  /** Z-order a frame by `cols` and return it range-partitioned into
    * `numFiles` partitions, each sorted by the z-key — writing the
    * result yields files whose footer min/max boxes tile the key space
    * as near-squares, so selective predicates on ANY z-column prune
    * most files (a single-column sort prunes only its own column).
    *
    * Plan shape at 100 TB: one tiny min/max aggregate (1 row,
    * broadcast), z-key computed in the scan stage, ONE range shuffle
    * (sampled boundaries — Spark's RangePartitioner) and an in-partition
    * sort that feeds the writer directly. That is the same shuffle any
    * global sort pays; the interleave itself is free arithmetic.
    */
  /** Rendezvous (highest-random-weight) shard assignment — Thaler &
    * Ravishankar '98, the consistent-placement scheme behind cache
    * rings and shard maps: a key goes to the shard whose
    * `hash(shard:key)` is highest. The property that matters: when a
    * shard is ADDED, a key either stays put or moves TO the new shard
    * (its old winner's hash didn't change — only a new, higher hash
    * can take over), so a k→k+1 resize relocates ~1/(k+1) of keys
    * instead of the (k−1)/k a modulo partitioner reshuffles.
    *
    * Pure scan-stage Column arithmetic: |shards| md5 hashes and one
    * lexicographic array_max per row — no shuffle, no state, engine-
    * replayable (ties, were a 60-bit collision ever to happen, break
    * to the lexicographically largest shard name on both sides).
    */
  def rendezvousShard(key: Column, shards: Seq[String]): Column = {
    require(shards.nonEmpty && shards.distinct.size == shards.size,
      s"rendezvousShard: non-empty distinct shard names required, got $shards")
    array_max(array(shards.map { s =>
      struct(
        TextHash.hash64(concat(lit(s), lit(":"), key.cast("string"))).as("h"),
        lit(s).as("shard"))
    }: _*)).getField("shard")
  }

  def zorderLayout(
      df: DataFrame, cols: Seq[String], numFiles: Int, bitsPer: Int = 16): DataFrame = {
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).as(s"__lo$i"), max(col(c)).as(s"__hi$i"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val withKey = df.crossJoin(broadcast(stats))
      .withColumn("__z", mortonKey(
        cols.zipWithIndex.map { case (c, i) =>
          rangeBucket(col(c), col(s"__lo$i"), col(s"__hi$i"), bitsPer)
        }, bitsPer))
      .drop(cols.indices.flatMap(i => Seq(s"__lo$i", s"__hi$i")): _*)
    withKey
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
