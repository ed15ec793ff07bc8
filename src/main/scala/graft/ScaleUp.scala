package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe for the operators whose cost is data-shape-dependent
  * (dedup self-joins, ANN candidate joins, the Zipf-skewed q63 term
  * join): materializes an N× corpus via shifted-id union — every doc
  * gains N-1 exact copies with distinct ids, the worst case for
  * pair-producing operators — then times selected catalog queries at 1×
  * and N× and prints one JSON line per query. Feeds the BASELINE.md
  * scale-up table.
  *
  *   runMain graft.ScaleUp [sfDir] [factor] [q...]
  */
object ScaleUp {

  private def scaled(df: DataFrame, idCol: String, factor: Int): DataFrame = {
    val offset = 10000000L
    (1 until factor).foldLeft(df) { (acc, i) =>
      acc.unionByName(df.withColumn(idCol, col(idCol) + lit(i * offset)))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val wanted =
      if (args.length > 2) args.drop(2).toSet
      else Set("q35_dedup_minhash_lsh", "q36_dedup_simhash", "q37_dedup_ngram_jaccard",
        "q38_embedding_neardup", "q63_tf_top_terms", "q64_dedup_canonical_neardup",
        "q231_phash_neardup", "q243_pnm_phash_neardup", "q245_crossdoc_spans",
        "q263_png_phash_neardup")
    val spark = GraftSession.local("graft-scaleup", cores = 32)
    val big = java.nio.file.Files.createTempDirectory("graft_scale").toString
    scaled(Tables.load(spark, sfDir, "documents"), "doc_id", factor)
      .write.mode("overwrite").parquet(s"$big/documents.parquet")
    scaled(Tables.load(spark, sfDir, "embeddings"), "vec_id", factor)
      .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    // events scale by event_id only: each copy is a distinct event for
    // the SAME user/ts space — window/session/as-of state per key grows
    // 10x, the worst case for those operators
    scaled(Tables.load(spark, sfDir, "events"), "event_id", factor)
      .write.mode("overwrite").parquet(s"$big/events.parquet")
    // orders/lineitem for the top-k aggregate (q70) and the large-large
    // interval join (q73): both sides of the join grow N×
    scaled(Tables.load(spark, sfDir, "orders"), "o_orderkey", factor)
      .write.mode("overwrite").parquet(s"$big/orders.parquet")
    scaled(Tables.load(spark, sfDir, "lineitem"), "l_orderkey", factor)
      .write.mode("overwrite").parquet(s"$big/lineitem.parquet")
    // dimensions ride along unscaled (the realistic shape: fact growth
    // against a fixed dim) so every catalog query can run at N×.
    // Exception: a q267 probe scales CUSTOMER itself — record linkage's
    // worst case is entity growth, where blocked pair space grows
    // quadratically within each block
    val scaleCustomer = wanted("q267_fs_linkage")
    if (scaleCustomer)
      scaled(Tables.load(spark, sfDir, "customer"), "c_custkey", factor)
        .write.mode("overwrite").parquet(s"$big/customer.parquet")
    val dims = Seq("part", "region", "nation", "supplier") ++
      (if (scaleCustomer) Nil else Seq("customer"))
    dims.foreach(t =>
      Tables.load(spark, sfDir, t).write.mode("overwrite").parquet(s"$big/$t.parquet"))

    def time(dir: String, name: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = queries.Catalog.all.find(_.name == name).get.build(spark, dir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    for (name <- queries.Catalog.all.map(_.name).filter(wanted)) {
      val (t1, n1) = time(sfDir, name)
      val (tN, nN) = time(big, name)
      println(f"""{"q":"$name","sec_1x":$t1%.2f,"rows_1x":$n1,"sec_${factor}x":$tN%.2f,"rows_${factor}x":$nN,"factor":${tN / t1}%.1f}""")
    }
    // non-catalog scale probe: the two-level (O(n·√k) assignment)
    // semantic near-dup, timed against the same corpus as q141
    if (wanted("twolevel")) {
      def timeTL(dir: String): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = ext.Similarity.semanticNearDupPairsScaled(
          Tables.load(spark, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.3, targetCellSize = 64L).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (t1, n1) = timeTL(sfDir)
      val (tN, nN) = timeTL(big)
      println(f"""{"q":"twolevel_semantic_neardup","sec_1x":$t1%.2f,"rows_1x":$n1,"sec_${factor}x":$tN%.2f,"rows_${factor}x":$nN,"factor":${tN / t1}%.1f}""")
    }
    spark.stop()
  }
}
