package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Layout, Ranges, Sampling, TextAnalysis, TextHash}
import Q._

/** Round-5 scale-infrastructure surface: Z-order layout keys, exact
  * stratified sampling, canonical text fingerprints, and mergeable HLL
  * sketch algebra.
  */
object Scale {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** DuckDB replica of Layout.mortonKey(Seq(b0, b1), 8): column j bit i
    * lands at output bit i·2 + j.
    */
  private def morton2Sql(b0: String, b1: String): String =
    (0 until 8).flatMap { i =>
      Seq(s"((($b0 >> $i) & 1) << ${2 * i})", s"((($b1 >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  /** DuckDB replica of Layout.rangeBucket(x, lo, hi, 8). */
  private def bucketSql(x: String, lo: String, hi: String): String =
    s"""LEAST(GREATEST(CAST(floor((CAST($x AS DOUBLE) - $lo) / ($hi - $lo) * 256.0)
       | AS BIGINT), 0), 255)""".stripMargin

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // Z-order (Morton) clustering key: bucketize each layout column to
    // its [min,max] range, interleave the bits. Writing range-
    // partitioned + sorted by this key tiles files into near-square
    // min/max boxes, so predicates on ANY z-column prune files. The
    // oracle re-derives bucket ids and the interleave bit-for-bit.
    Q(
      "q95_zorder_key",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        val stats = o.agg(
          min($"o_custkey").as("__lo0"), max($"o_custkey").as("__hi0"),
          min($"o_totalprice").as("__lo1"), max($"o_totalprice").as("__hi1"))
        o.select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .crossJoin(broadcast(stats))
          .select(
            $"o_orderkey",
            Layout.rangeBucket($"o_custkey", $"__lo0", $"__hi0", 8).as("b_cust"),
            Layout.rangeBucket($"o_totalprice", $"__lo1", $"__hi1", 8).as("b_price"))
          .withColumn("zkey", Layout.mortonKey(Seq(col("b_cust"), col("b_price")), 8))
          .orderBy($"o_orderkey")
      },
      Some(s"""
        WITH st AS (
          SELECT CAST(MIN(o_custkey) AS DOUBLE) AS lo0, CAST(MAX(o_custkey) AS DOUBLE) AS hi0,
                 CAST(MIN(o_totalprice) AS DOUBLE) AS lo1, CAST(MAX(o_totalprice) AS DOUBLE) AS hi1
          FROM orders),
        b AS (
          SELECT o_orderkey,
                 ${bucketSql("o_custkey", "lo0", "hi0")} AS b_cust,
                 ${bucketSql("o_totalprice", "lo1", "hi1")} AS b_price
          FROM orders, st)
        SELECT o_orderkey, b_cust, b_price,
               ${morton2Sql("b_cust", "b_price")} AS zkey
        FROM b ORDER BY o_orderkey
      """)),
    // ----------------------------------------------------------------
    // Exact-size stratified sample: exactly 20 docs per language by
    // hash order — fixed per-stratum training budgets, reproducible on
    // any engine. Bounded-heap top-k: the corpus never full-shuffles.
    Q(
      "q96_exact_stratified",
      (s, dir) => {
        import s.implicits._
        Sampling.exactStratifiedSample(
            t(s, dir, "documents").select($"doc_id", $"lang"),
            $"doc_id", $"lang", n = 20)
          .select($"stratum".as("lang"), $"rank", $"id".as("doc_id"))
          .orderBy($"lang", $"rank")
      },
      Some(s"""
        SELECT lang, CAST(rn AS INTEGER) AS rank, doc_id FROM (
          SELECT lang, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY ${OracleSql.hash64("CAST(doc_id AS VARCHAR)")} >> 10,
                            doc_id) AS rn
          FROM documents)
        WHERE rn <= 20
        ORDER BY lang, rank
      """)),
    // ----------------------------------------------------------------
    // Canonical-form fingerprint: trim/lower/collapse-whitespace/NFC
    // then hash — formatting and encoding variants of the same prose
    // collapse to one fingerprint. DuckDB's nfc_normalize implements
    // the same UAX #15 normalization as the compiled NfcNormalize.
    Q(
      "q97_canonical_fingerprint",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents").select(
          $"doc_id",
          length(TextAnalysis.canonicalize($"text")).cast("long").as("canon_len"),
          TextHash.hash64(TextAnalysis.canonicalize($"text")).as("fp"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH c AS (
          SELECT doc_id,
                 nfc_normalize(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS ct
          FROM documents)
        SELECT doc_id, CAST(length(ct) AS BIGINT) AS canon_len,
               ${OracleSql.hash64("ct")} AS fp
        FROM c ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Mergeable HLL sketch algebra (Datasketches): per-nation customer
    // sketches union up to region estimates WITHOUT re-scanning —
    // the incremental-stats primitive at 100 TB (per-partition
    // sketches persist; any rollup is a cheap union). Self-verifying
    // envelope: the sketch rollup is joined to its exact twin and the
    // emitted row is the exact count + the deterministic within-5%
    // verdict (default lgConfigK=12 → ~0.8% std error; the 5% bound
    // is what SketchSpec asserts). The oracle replays the exact side
    // + TRUE, so the row hash-matches with the sketch still exercised.
    Q(
      "q98_hll_union",
      (s, dir) => {
        import s.implicits._
        val cust = t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation").select($"n_nationkey", $"n_regionkey")),
            $"c_nationkey" === $"n_nationkey")
        val approx = cust
          .groupBy($"c_nationkey", $"n_regionkey")
          .agg(hll_sketch_agg($"c_custkey").as("sk"))
          .groupBy($"n_regionkey")
          .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("approx_customers"))
        val exact = cust
          .groupBy($"n_regionkey")
          .agg(countDistinct($"c_custkey").as("exact_customers"))
        approx
          .join(exact, Seq("n_regionkey"))
          .select(
            $"n_regionkey",
            $"exact_customers",
            (abs($"approx_customers" - $"exact_customers")
              <= $"exact_customers" * 0.05).as("within_5pct"))
          .orderBy($"n_regionkey")
      },
      Some("""
        SELECT n_regionkey, COUNT(DISTINCT c_custkey) AS exact_customers,
               TRUE AS within_5pct
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1 ORDER BY 1
      """)),
    // ----------------------------------------------------------------
    // Sketched heavy hitters, self-verifying envelope: approx_top_k
    // over the token stream (the bounded-memory twin of the exact
    // vocabulary build, q105) is checked in-query against the exact
    // top-10 (count desc, token — a total order). The emitted rows are
    // the exact top-10 plus a deterministic verdict that each token
    // surfaced in the sketch's top-100 candidates with its estimate
    // within max(2%, 1). The oracle replays the exact side + TRUE.
    // Flattened to scalar rows (the q56 lesson: array cells don't
    // canonicalize in the harness).
    Q(
      "q115_approx_topk",
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .select(explode(TextHash.tokens($"text")).as("tok"))
        val approx = toks
          .agg(expr("approx_top_k(tok, 100, 100000)").as("top"))
          .select(explode($"top").as("e"))
          .select($"e.item".as("token"), $"e.count".as("est_count"))
        val w = Window.orderBy($"exact_count".desc, $"token")
        val exactTop = toks
          .groupBy($"tok".as("token"))
          .agg(count(lit(1)).as("exact_count"))
          .orderBy($"exact_count".desc, $"token")
          .limit(10)
          .select(row_number().over(w).as("rnk"), $"token", $"exact_count")
        exactTop
          .join(approx, Seq("token"), "left")
          .select(
            $"rnk", $"token", $"exact_count",
            ($"est_count".isNotNull &&
              abs($"est_count" - $"exact_count")
                <= greatest($"exact_count" * 0.02, lit(1.0))).as("within_bound"))
          .orderBy($"rnk")
      },
      Some(s"""
        WITH cnt AS (
          SELECT tok AS token, COUNT(*) AS exact_count
          FROM (SELECT unnest(${OracleSql.tokens("text")}) AS tok FROM documents)
          GROUP BY 1)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY exact_count DESC, token) AS INTEGER)
                 AS rnk,
               token, exact_count, TRUE AS within_bound
        FROM cnt ORDER BY rnk LIMIT 10
      """)),
    // ----------------------------------------------------------------
    // Large x large interval OVERLAP join: bucket equi-join with the
    // emit-once rule (pair surfaces only in the bucket holding the
    // overlap's start) — no post-join distinct. The oracle is the
    // plain theta join.
    Q(
      "q99_interval_overlap",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events")
        def side(m: Int, pid: String, plo: String, phi: String) = e
          .filter($"event_id" % m === 0 && $"value".isNotNull)
          .select($"event_id".as(pid), $"value".cast("double").as(plo),
            ($"value".cast("double") + 10.0).as(phi))
        Ranges.intervalOverlapJoin(
            side(50, "l_id", "l_lo", "l_hi"),
            "l_lo", "l_hi",
            side(47, "r_id", "r_lo", "r_hi"),
            "r_lo", "r_hi",
            bucketWidth = 10.0)
          .select($"l_id", $"r_id", $"l_lo", $"r_lo")
          .orderBy($"l_id", $"r_id")
      },
      Some("""
        WITH l AS (
          SELECT event_id AS l_id, CAST(value AS DOUBLE) AS l_lo,
                 CAST(value AS DOUBLE) + 10.0 AS l_hi
          FROM events WHERE event_id % 50 = 0 AND value IS NOT NULL),
        r AS (
          SELECT event_id AS r_id, CAST(value AS DOUBLE) AS r_lo,
                 CAST(value AS DOUBLE) + 10.0 AS r_hi
          FROM events WHERE event_id % 47 = 0 AND value IS NOT NULL)
        SELECT l_id, r_id, l_lo, r_lo
        FROM l JOIN r ON l_lo <= r_hi AND r_lo <= l_hi
        ORDER BY l_id, r_id
      """))
  )
}
