package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** SQL-TEXT surface parity: the catalog is DataFrame-built and
  * GraftExtensions registers the function library, but a user of the
  * north star's "SQL + DataFrame" claim writes `spark.sql("...")`.
  * This spec registers the test tables as views and proves
  * representative catalog shapes — multi-way join + aggregate,
  * window ranking, set ops, and the registered graft_* functions —
  * produce IDENTICAL results through the SQL-text path and the
  * DataFrame path in the same session.
  */
class SqlSurfaceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.GraftSession.local("sql-surface-spec", cores = 4)
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    for (t <- Seq("region", "nation", "customer", "orders", "lineitem", "documents"))
      graft.Tables.load(spark, dir, t).createOrReplaceTempView(t)
  }
  override def afterAll(): Unit = spark.stop()

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("join + aggregate: 4-way revenue-by-nation matches the DataFrame twin") {
    val sql = spark.sql("""
      SELECT n.n_name AS nation,
             CAST(SUM(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
               AS revenue_cents,
             COUNT(DISTINCT o.o_orderkey) AS n_orders
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY n.n_name
      ORDER BY nation
    """)
    val df = spark.table("lineitem").as("l")
      .join(spark.table("orders").as("o"), col("l.l_orderkey") === col("o.o_orderkey"))
      .join(spark.table("customer").as("c"), col("o.o_custkey") === col("c.c_custkey"))
      .join(spark.table("nation").as("n"), col("c.c_nationkey") === col("n.n_nationkey"))
      .filter(col("o.o_orderstatus") === "F")
      .groupBy(col("n.n_name").as("nation"))
      .agg(sum(col("l.l_extendedprice") * (lit(1) - col("l.l_discount")) * 100)
        .cast("bigint").as("revenue_cents"),
        countDistinct(col("o.o_orderkey")).as("n_orders"))
      .orderBy(col("nation"))
    assert(rows(sql) == rows(df))
    assert(rows(sql).nonEmpty)
    // the SQL path gets the same broadcast plan the DataFrame path does
    val plan = sql.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("window ranking: top-3 orders per customer matches the DataFrame twin") {
    val sql = spark.sql("""
      SELECT o_custkey, o_orderkey, rnk FROM (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders)
      WHERE rnk <= 3
      ORDER BY o_custkey, rnk
    """)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = spark.table("orders")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey", "rnk")
      .orderBy(col("o_custkey"), col("rnk"))
    assert(rows(sql) == rows(df))
    assert(rows(sql).nonEmpty)
  }

  test("set ops + scalar functions through SQL text match the DataFrame twin") {
    val sql = spark.sql("""
      SELECT c_custkey FROM customer WHERE c_nationkey < 5
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      ORDER BY c_custkey
    """)
    val df = spark.table("customer").filter(col("c_nationkey") < 5)
      .select(col("c_custkey"))
      .intersect(spark.table("orders").filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")
    assert(rows(sql) == rows(df))
    assert(rows(sql).nonEmpty)
  }

  test("registered graft_* functions are callable from SQL text with DataFrame parity") {
    // jaro_winkler: SQL text vs the Column-API bridge over the same rows
    val sqlJw = spark.sql("""
      SELECT doc_id,
             graft_jaro_winkler(text, upper(text)) AS jw,
             graft_lang_id(text) AS lang,
             graft_fingerprint64(text, 4) AS fp
      FROM documents
      ORDER BY doc_id LIMIT 50
    """)
    val df = spark.table("documents")
      .select(col("doc_id"),
        expr("graft_jaro_winkler(text, upper(text))").as("jw"),
        expr("graft_lang_id(text)").as("lang"),
        expr("graft_fingerprint64(text, 4)").as("fp"))
      .orderBy("doc_id").limit(50)
    assert(rows(sqlJw) == rows(df))
    assert(rows(sqlJw).size == 50)
    // an end-to-end SQL-only near-dup sketch: minhash band keys join
    val lsh = spark.sql("""
      WITH sigs AS (
        SELECT doc_id,
               graft_minhash_sig(
                 graft_word_shingle_hashes(text, 3, 1000000007), 16) AS sig
        FROM documents)
      SELECT COUNT(*) AS n FROM sigs WHERE size(sig) = 16
    """).collect().head.getLong(0)
    val total = spark.table("documents").count()
    assert(lsh == total, s"every doc must carry a 16-element minhash sig ($lsh/$total)")
  }
}
