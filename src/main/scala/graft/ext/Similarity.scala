package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Designs and their scale rationale:
  *   - dot/cosine are index-fold expressions (whole-stage codegen, no
  *     UDF) with a FIXED left-to-right summation order so the DuckDB
  *     oracle reproduces the exact IEEE double;
  *   - brute-force top-k is a scan + TakeOrderedAndProject — correct
  *     baseline, O(n·d), embarrassingly parallel, no shuffle of the
  *     corpus; fine whenever k ≪ n;
  *   - the scale path is sign-LSH (random-hyperplane) bucketing: each
  *     vector maps to `tables` bucket keys; query-time work collapses
  *     from n to the bucket population. Hyperplanes are derived from
  *     md5 so they're deterministic and engine-portable;
  *   - near-dup pairs = bucketed self-join + exact cosine verify, the
  *     embedding analogue of Dedup.minhashLshPairs.
  */
object Similarity {

  /** Sequential-fold dot product of two equal-length double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      transform(sequence(lit(1), size(a)), i => element_at(a, i) * element_at(b, i)),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Brute-force top-k by cosine against one query vector (itself a row
    * of `df` identified by `queryId`). The 1-row query side is
    * broadcast; the corpus is never shuffled.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = broadcast(
      df.filter(col(idCol) === queryId)
        .select(asDouble(col(vecCol)).as("q_vec")))
    df.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("vec"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= queryId)
      .select(col("neighbor_id"), cosine(col("vec"), col("q_vec")).as("cos"))
      .orderBy(col("cos").desc, col("neighbor_id"))
      .limit(k)
  }

  /** Deterministic hyperplane component: h(table, plane, dim) ∈ [-0.5, 0.5).
    * Derived from md5 so any engine can rebuild the same planes.
    */
  private def planeComponent(table: Int, plane: Int, dim: Column): Column =
    (TextHash.hash64(concat(lit(s"$table:$plane:"), dim.cast("string"))) % 1000L)
      .cast("double") / 1000.0 - 0.5

  /** Sign-LSH bucket key for one hash table: `planes` sign bits of
    * hyperplane projections, packed into a long.
    */
  def lshBucket(vec: Column, table: Int, planes: Int): Column = {
    val v = asDouble(vec)
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        transform(sequence(lit(1), size(v)),
          i => element_at(v, i) * planeComponent(table, p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0.0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Near-duplicate embedding pairs: candidates from `tables` sign-LSH
    * bucketings (equi-join per table), verified with exact cosine.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tables: Int = 2, planes: Int = 8): DataFrame = {
    val base = df.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("vec"))
    val bucketed = base.withColumn("bucket", explode(array(
      (0 until tables).map(t =>
        concat(lit(s"$t#"), lshBucket(col("vec"), t, planes).cast("string"))): _*)))
    val a = bucketed.select(col("vid").as("id_a"), col("vec").as("vec_a"), col("bucket"))
    val b = bucketed.select(col("vid").as("id_b"), col("vec").as("vec_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("vec_a"), col("vec_b"))
      .distinct()
      .select(col("id_a"), col("id_b"), cosine(col("vec_a"), col("vec_b")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Batched ANN: top-k neighbors for EVERY query in a (small) query set,
    * via LSH-bucket join + per-query window top-k. The full-corpus
    * variant of this at 100 TB keeps the corpus bucketed/bucketed-sorted
    * on disk so query batches join without reshuffling the corpus.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, tables: Int = 2, planes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def bucketize(df: DataFrame, idAs: String, vecAs: String) =
      df.select(col(idCol).as(idAs), asDouble(col(vecCol)).as(vecAs))
        .withColumn("bucket", explode(array(
          (0 until tables).map(t =>
            concat(lit(s"$t#"), lshBucket(col(vecAs), t, planes).cast("string"))): _*)))
    val c = bucketize(corpus, "neighbor_id", "c_vec")
    val q = bucketize(queries, "query_id", "q_vec")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("q_vec"), col("c_vec"))
      .distinct()
      .select(col("query_id"), col("neighbor_id"), cosine(col("q_vec"), col("c_vec")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }
}
