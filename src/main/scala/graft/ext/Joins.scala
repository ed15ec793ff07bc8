package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.BloomFunctions

/** Join-shape operators for the sizes where neither standard strategy
  * is right on its own.
  */
object Joins {

  /** Semi-join a huge fact table against a dimension that is too large
    * to broadcast as a hash relation but whose KEY SET fits a Bloom
    * filter — the standard 100 TB shape (e.g. 10^8 allow-listed ids ≈
    * 10^2 MB of bloom at 1% fpp vs tens of GB as a broadcast hash
    * table).
    *
    * Plan: build the bloom with one distributed pass over the dim keys
    * (`DataFrameStatFunctions.bloomFilter`, a treeAggregate), ship it
    * to every task as a reference object, filter the fact in the SCAN
    * stage ([[graft.functions.BloomMightContain]], codegen), then run
    * the exact shuffle semi-join on the survivors. The bloom can only
    * pass false POSITIVES, and the exact join removes them — the
    * result is byte-identical to a plain semi-join while the shuffle
    * moves ~selectivity·|fact| rows instead of all of them. This is
    * Spark's own runtime-bloom-filter rewrite made explicit, sized by
    * the caller (the automatic rewrite caps creation at a fixed
    * threshold and can decline; a pipeline that KNOWS its dim
    * cardinality shouldn't gamble on that heuristic).
    *
    * `expectedItems` sizes the bloom (overestimate is safe, only
    * memory); `fpp` trades bloom size against wasted shuffle.
    */
  def bloomPrunedSemiJoin(
      fact: DataFrame,
      factKey: Column,
      dim: DataFrame,
      dimKey: Column,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val keys = dim.select(dimKey.as("__k")).filter(col("__k").isNotNull)
    val bloom = keys.stat.bloomFilter("__k", expectedItems, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    fact
      .filter(BloomFunctions.mightContain(factKey, bytes))
      .join(keys, factKey === col("__k"), "left_semi")
  }
}
