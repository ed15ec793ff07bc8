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
    * once per executor via `sparkContext.broadcast` (the expression
    * carries only the handle), filter the fact in the SCAN
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
    // broadcast, not an expression literal: the filter ships to each
    // executor once (torrent), instead of riding the serialized task
    // closure of every stage that probes it
    val bc = fact.sparkSession.sparkContext.broadcast(bytes)
    fact
      .filter(BloomFunctions.mightContain(factKey, bc))
      .join(keys, factKey === col("__k"), "left_semi")
  }

  /** Large×large numeric band join — pairs with |a − b| ≤ eps — as a
    * bucketed EQUI-join, never a nested loop: the right side lands in
    * its own width-`eps` bucket, the left side probes its bucket ± 1
    * (a match at distance ≤ eps can live nowhere else), and the exact
    * predicate verifies the survivors. Each qualifying pair meets in
    * EXACTLY one bucket (the right row's own), so no dedup pass is
    * needed. Shuffle volume is 3 rows per left row + 1 per right row;
    * at no point does any executor hold more than one bucket
    * neighborhood — this is the numeric twin of
    * [[Ranges.pointInInterval]]'s contract, and the plan a BNLJ-based
    * theta join cannot give past broadcast size.
    *
    * Self-joining a relation with itself returns both orientations and
    * self-pairs — filter `id_a < id_b` downstream for unordered pairs.
    *
    * Domain bound: the bucket id is `floor(val/eps)` as a long, so
    * |val|/eps must stay below 2⁶² — a tiny eps against huge values
    * raises a clear per-row error instead of overflowing the cast
    * (ANSI: mid-job cast failure; non-ANSI: silent null bucket =
    * silently dropped pairs).
    */
  def bandJoin(
      left: DataFrame, leftId: Column, leftVal: Column,
      right: DataFrame, rightId: Column, rightVal: Column,
      eps: Double): DataFrame = {
    require(eps > 0 && java.lang.Double.isFinite(eps), s"bandJoin: eps > 0 required, got $eps")
    // 2^62: comfortably inside long even after the ±1 probe offsets
    def bucket(v: Column): Column = {
      val ratio = v / eps
      when(abs(ratio) < lit(4.611686018427388e18), floor(ratio).cast("long"))
        .otherwise(raise_error(concat(
          lit(s"bandJoin: |val|/eps exceeds the long bucket domain (eps=$eps, val="),
          v.cast("string"), lit(")"))))
    }
    val r = right
      .select(rightId.as("id_b"), rightVal.cast("double").as("val_b"))
      .filter(col("val_b").isNotNull)
      .withColumn("__b", bucket(col("val_b")))
    val lb = bucket(col("val_a"))
    val l = left
      .select(leftId.as("id_a"), leftVal.cast("double").as("val_a"))
      .filter(col("val_a").isNotNull)
      .withColumn("__b", explode(array(lb - 1, lb, lb + 1)))
    l.join(r, Seq("__b"))
      .filter(abs(col("val_a") - col("val_b")) <= eps)
      .select(col("id_a"), col("val_a"), col("id_b"), col("val_b"))
  }

  /** Longest-prefix-match join — the IP-routing-table / hierarchical
    * dictionary shape: each probe key matches every route whose prefix
    * equals the key's top `prefixLen` bits, and the MOST SPECIFIC
    * (longest) match wins.
    *
    * Plan: one equi-join per DISTINCT prefix length (the lengths set
    * is small and fixed — e.g. /16,/20,/24 — never per-row), probe key
    * shifted down to each length in the scan stage, all candidates
    * unioned, then one argmax-by-length aggregate per probe. The
    * routes side is broadcast per length slice (a routing table is
    * KB–MB); the probe table — the 100 TB side — is never shuffled
    * until the final partial-aggregating argmax, and that aggregate
    * carries at most |lengths| rows per probe. A range/theta join
    * formulation (`probe BETWEEN lo AND hi`) would BNLJ; this stays
    * equi all the way.
    *
    * Routes carrying the same (length, prefix) twice are collapsed to
    * the minimum target (deterministic); probes matching no route are
    * absent from the output (left-join downstream if the miss rows
    * matter). `keyBits` is the width of the probe key space; every
    * length must lie in (0, keyBits].
    */
  def longestPrefixMatch(
      probes: DataFrame, probeId: Column, probeKey: Column,
      routes: DataFrame, prefix: Column, prefixLen: Column, target: Column,
      keyBits: Int, lengths: Seq[Int]): DataFrame = {
    require(lengths.nonEmpty && lengths == lengths.distinct,
      s"longestPrefixMatch: non-empty distinct lengths required, got $lengths")
    require(lengths.forall(l => l > 0 && l <= keyBits),
      s"longestPrefixMatch: lengths must lie in (0, $keyBits], got $lengths")
    val r = routes
      .select(prefixLen.cast("int").as("__len"), prefix.cast("long").as("__pfx"),
        target.as("__tgt"))
      .filter(col("__pfx").isNotNull && col("__len").isin(lengths.map(Integer.valueOf): _*))
      .groupBy(col("__len"), col("__pfx"))
      .agg(min(col("__tgt")).as("__tgt"))
    val p = probes.select(probeId.as("probe_id"), probeKey.cast("long").as("__key"))
      .filter(col("__key").isNotNull)
    val candidates = lengths.map { l =>
      p.withColumn("__probe_pfx", shiftright(col("__key"), keyBits - l))
        .join(broadcast(r.filter(col("__len") === l)),
          col("__probe_pfx") === col("__pfx"))
        .select(col("probe_id"), col("__key"), col("__len"), col("__pfx"), col("__tgt"))
    }.reduce(_ unionAll _)
    candidates
      .groupBy(col("probe_id"), col("__key"))
      // (len, pfx, tgt) is unique per probe+len after the route dedup,
      // so lexicographic struct-max == longest length, deterministically
      .agg(max(struct(col("__len"), col("__pfx"), col("__tgt"))).as("__m"))
      .select(col("probe_id"), col("__key").as("probe_key"),
        col("__m.__len").as("match_len"), col("__m.__pfx").as("match_prefix"),
        col("__m.__tgt").as("target"))
  }
}
