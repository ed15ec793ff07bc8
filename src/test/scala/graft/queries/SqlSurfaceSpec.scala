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
    for (t <- Seq("region", "nation", "customer", "orders", "lineitem",
        "documents", "events"))
      graft.Tables.load(spark, dir, t).createOrReplaceTempView(t)
  }

  private def catalog(name: String): org.apache.spark.sql.DataFrame =
    Catalog.all.find(_.name == name).get.build(spark, dir)
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

  test("LLM surface in SQL text: the full MinHash-LSH dedup pair query equals q35") {
    // the COMPLETE q35 pipeline — shingle, minhash, band, candidate
    // self-join, exact-Jaccard verify — written as one SQL statement
    // over the registered graft_* functions. 8 bands × 2 rows, same
    // parameters as the catalog entry.
    val bandExprs = (0 until 8).map { b =>
      s"concat_ws('_', '$b', CAST(element_at(sig, ${2 * b + 1}) AS STRING), " +
        s"CAST(element_at(sig, ${2 * b + 2}) AS STRING))"
    }.mkString(", ")
    val sql = spark.sql(s"""
      WITH base AS (
        SELECT doc_id,
               graft_word_shingle_hashes(text, 3, 2147483647) AS shingles
        FROM documents),
      sigs AS (
        SELECT doc_id, shingles,
               graft_minhash_sig(shingles, 16) AS sig
        FROM base),
      banded AS (
        SELECT doc_id, explode(array($bandExprs)) AS band FROM sigs),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.doc_id < b.doc_id),
      verified AS (
        SELECT id_a, id_b,
               CAST(size(array_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 AS inter,
               size(sa.shingles) AS na, size(sb.shingles) AS nb
        FROM cand
        JOIN sigs sa ON sa.doc_id = id_a
        JOIN sigs sb ON sb.doc_id = id_b)
      SELECT id_a, id_b, inter / (na + nb - inter) AS jaccard
      FROM verified
      WHERE inter / (na + nb - inter) >= 0.5
      ORDER BY id_a, id_b
    """)
    assert(rows(sql) == rows(catalog("q35_dedup_minhash_lsh")))
    assert(rows(sql).nonEmpty)
  }

  test("LLM surface in SQL text: BM25 retrieval equals q86") {
    val sql = spark.sql("""
      WITH base AS (
        SELECT doc_id,
               filter(split(lower(text), ' '), x -> x != '') AS toks
        FROM documents WHERE text IS NOT NULL),
      d AS (SELECT doc_id, toks, CAST(size(toks) AS BIGINT) AS dl FROM base),
      stats AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(dl AS DECIMAL(38,10))) AS DOUBLE) /
                 CAST(COUNT(*) AS DOUBLE) AS avgdl
        FROM d),
      tf AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM (SELECT doc_id, dl, explode(toks) AS term FROM d)
        WHERE term IN ('join', 'vector', 'stream', 'window')
        GROUP BY doc_id, dl, term),
      dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      scored AS (
        SELECT doc_id,
               ((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
                  (CAST(df AS DOUBLE) + 0.5)) *
               (CAST(tf AS DOUBLE) * (1.2 + 1.0) /
                  (CAST(tf AS DOUBLE) +
                   1.2 * ((1.0 - 0.75) + CAST(dl AS DOUBLE) / avgdl * 0.75)))
                 AS s
        FROM tf JOIN dfreq USING (term) CROSS JOIN stats)
      SELECT doc_id, COUNT(*) AS n_terms,
             CAST(SUM(CAST(s AS DECIMAL(38,10))) AS DOUBLE) AS score
      FROM scored GROUP BY doc_id
      ORDER BY score DESC, doc_id LIMIT 20
    """)
    assert(rows(sql) == rows(catalog("q86_bm25_topk")))
    assert(rows(sql).nonEmpty)
  }

  test("LLM surface in SQL text: the forward as-of join equals q113") {
    // the union + ignore-nulls-last window formulation of as-of — the
    // same algorithm AsOf.join plans, written as SQL text. The right
    // side's value rides inside a struct so the matched row's NULL is
    // surfaced, not skipped past (the DuckDB ASOF contract).
    val sql = spark.sql("""
      WITH clicks AS (
        SELECT event_id, user_id, ts, CAST(NULL AS STRUCT<v: DOUBLE>) AS rv,
               1 AS side
        FROM events WHERE event_type = 'click'),
      views AS (
        SELECT CAST(NULL AS BIGINT) AS event_id, user_id, ts,
               named_struct('v', MAX(value)) AS rv, 0 AS side
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, ts),
      u AS (SELECT * FROM clicks UNION ALL SELECT * FROM views),
      m AS (
        SELECT event_id, user_id, ts, side,
               last(rv, true) OVER (
                 PARTITION BY user_id ORDER BY ts DESC, side ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW).v
                 AS next_view_value
        FROM u)
      SELECT event_id, user_id,
             date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS click_ts,
             next_view_value
      FROM m WHERE side = 1
      ORDER BY event_id
    """)
    assert(rows(sql) == rows(catalog("q113_asof_forward")))
    assert(rows(sql).nonEmpty)
  }
}
