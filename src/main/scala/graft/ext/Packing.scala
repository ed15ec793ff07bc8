package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic batch assembly for training pipelines: assign every
  * row (a chunk, a document) to a reproducible batch id without a
  * global sequence.
  *
  * `zipWithIndex`/`monotonically_increasing_id` numbering depends on
  * partition layout — a re-run on a different cluster shuffles the
  * batches. Here rows are first sharded by a content hash of the key
  * (shard count = the parallelism knob: each shard is one window
  * partition, so pick shards >> executor count at scale), then numbered
  * within their shard by a total order, and packed `batchSize` at a
  * time. Batch membership is a pure function of (key, sort columns) —
  * the same corpus packs identically on any engine, any layout.
  */
object Packing {

  /** Adds `shard` and `batch_id` ("[within-]shard-seq") columns.
    * `sortBy` must totally order rows within a shard (e.g. doc_id,
    * chunk_id) or the packing is nondeterministic under retry.
    * `within` columns (e.g. a train/val/test split label) fence the
    * packing: a batch never spans two `within` groups.
    */
  def shardedBatches(
      df: DataFrame,
      key: Column,
      sortBy: Seq[Column],
      shards: Int,
      batchSize: Int,
      within: Seq[Column] = Nil): DataFrame = {
    require(shards > 0 && batchSize > 0,
      s"shardedBatches: need positive shards/batchSize, got $shards/$batchSize")
    val w = Window.partitionBy(within :+ col("shard"): _*).orderBy(sortBy: _*)
    df.withColumn("shard", pmod(TextHash.hash64(key.cast("string")), lit(shards.toLong)))
      .withColumn("__seq", row_number().over(w))
      .withColumn("batch_id",
        concat_ws("-",
          within ++ Seq(col("shard"),
            floor((col("__seq") - 1) / lit(batchSize)).cast("long")): _*))
      .drop("__seq")
  }
}
