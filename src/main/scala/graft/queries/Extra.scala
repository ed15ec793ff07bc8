package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Q._

/** Coverage for declared operators not exercised by q01–q45: non-equi
  * (theta/range) join, typed JSON parse + re-serialize, map columns,
  * RANGE window frames + ntile, keyed dropDuplicates.
  */
object Extra {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // DuckDB formula fragments live ONCE in OracleSql; these are local names.
  private def buckSql(tables: Int, planes: Int): String = OracleSql.embeddingBuckets(tables, planes)
  private def cosSql(a: String, b: String): String = OracleSql.cosine(a, b)

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // Theta join: part × tiny band table on a range predicate. The band
    // side is broadcast (BroadcastNestedLoopJoin) — the right physical
    // plan for a non-equi join with a small side at any scale.
    Q(
      "q46_range_join",
      (s, dir) => {
        import s.implicits._
        val bands = Seq(
          ("low", 0.0, 933.0),
          ("mid", 933.0, 966.0),
          ("high", 966.0, 1e9)).toDF("band", "lo", "hi")
        t(s, dir, "part")
          .join(broadcast(bands), $"p_retailprice" >= $"lo" && $"p_retailprice" < $"hi")
          .groupBy($"band")
          .agg(count(lit(1)).as("n"), dsum($"p_retailprice").as("sum_price"))
          .orderBy($"band")
      },
      Some("""
        SELECT band, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_price
        FROM part
        JOIN (VALUES ('low', 0.0, 933.0), ('mid', 933.0, 966.0),
                     ('high', 966.0, 1e9)) b(band, lo, hi)
          ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY band
        ORDER BY band
      """)),
    // ----------------------------------------------------------------
    // Typed JSON: from_json with a declared schema, field access, and a
    // deterministic to_json re-serialization.
    Q(
      "q47_json_roundtrip",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select($"event_id",
            from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("j"))
          .select(
            $"event_id", $"j.k".as("k"),
            to_json(struct($"j.k".as("k"))).as("rt"))
          .orderBy($"event_id")
      },
      Some("""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INTEGER) AS k,
               '{"k":' || CAST(CAST(json_extract(props, '$.k') AS INTEGER) AS VARCHAR) || '}' AS rt
        FROM events
        ORDER BY event_id
      """)),
    // ----------------------------------------------------------------
    // Map columns: construct, explode to entries.
    Q(
      "q48_map_entries",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select(
            $"event_id",
            explode(map(
              lit("type"), $"event_type",
              lit("uid"), $"user_id".cast("string"))).as(Seq("mk", "mv")))
          .orderBy($"event_id", $"mk")
      },
      Some("""
        SELECT event_id, mk, mv FROM (
          SELECT event_id, 'type' AS mk, event_type AS mv FROM events
          UNION ALL
          SELECT event_id, 'uid' AS mk, CAST(user_id AS VARCHAR) AS mv FROM events)
        ORDER BY event_id, mk
      """)),
    // ----------------------------------------------------------------
    // RANGE window frame (7 trailing days per customer) + ntile quartile.
    Q(
      "q49_window_range_frame",
      (s, dir) => {
        import s.implicits._
        val wRange = Window.partitionBy($"o_custkey")
          .orderBy(unix_timestamp($"o_orderdate"))
          .rangeBetween(-604800L, Window.currentRow)
        val wNtile = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate", $"o_orderkey")
        t(s, dir, "orders")
          .select(
            $"o_orderkey", $"o_custkey",
            sum($"o_totalprice".cast(Dec)).over(wRange).cast("double").as("sum_7d"),
            ntile(4).over(wNtile).as("quartile"))
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_custkey,
               CAST(CAST(sum_7d_dec AS VARCHAR) AS DOUBLE) AS sum_7d, quartile
        FROM (
          SELECT o_orderkey, o_custkey,
                 SUM(CAST(o_totalprice AS DECIMAL(38,10))) OVER (
                   PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                   RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS sum_7d_dec,
                 NTILE(4) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS quartile
          FROM orders)
        ORDER BY o_orderkey
      """)),
    // ----------------------------------------------------------------
    // Keyed dropDuplicates: survivor rows are nondeterministic by
    // contract, so the checked result is the (deterministic) survivor
    // count per event_type.
    Q(
      "q50_dropdup_keys",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .dropDuplicates("user_id", "event_type")
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type, COUNT(*) AS n
        FROM (SELECT DISTINCT user_id, event_type FROM events)
        GROUP BY event_type
        ORDER BY event_type
      """)),
    // ----------------------------------------------------------------
    // Batched ANN, the scale path: LSH-bucket join for candidates,
    // exact-cosine verify, per-query window top-k. Queries = vec_id < 5.
    Q(
      "q51_ann_lsh_topk",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        graft.ext.Similarity.lshTopK(
          emb, emb.filter($"vec_id" < 5), "vec_id", "embedding",
          k = 5, tables = 4, planes = 6)
          .orderBy($"query_id", $"neighbor_id")
      },
      Some(s"""
        WITH ${buckSql(4, 6)},
        cand AS (
          SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
          FROM buck q JOIN buck c ON q.bucket = c.bucket
          WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
        scored AS (
          SELECT query_id, neighbor_id,
                 ${cosSql("qv.vec", "cv.vec")} AS cos
          FROM cand JOIN v qv ON qv.vec_id = query_id
                    JOIN v cv ON cv.vec_id = neighbor_id),
        ranked AS (
          SELECT query_id, neighbor_id, cos,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id) AS rn
          FROM scored)
        SELECT query_id, neighbor_id, cos FROM ranked
        WHERE rn <= 5
        ORDER BY query_id, neighbor_id
      """)),
    // ----------------------------------------------------------------
    // Multimodal frame-sample planning: pure-expression offsets (no
    // UDF) from a per-row duration — the plan side of video sampling;
    // the byte-level frame grab sits behind the stubbed codec.
    Q(
      "q52_frame_sampling",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select($"event_id",
            // floor before the long cast: Spark's double→long cast
            // truncates, DuckDB's rounds — floor makes both exact
            floor($"value" * 1000.0).cast("long").as("duration_ms"))
          .select($"event_id", $"duration_ms",
            graft.multimodal.Media.frameOffsets($"duration_ms", 250L).as("offs"))
          .select($"event_id", $"duration_ms",
            size($"offs").as("n_frames"),
            when(size($"offs") > 0, element_at($"offs", -1)).otherwise(lit(-1L)).as("last_off"))
          .orderBy($"event_id")
      },
      Some("""
        SELECT event_id, duration_ms,
               CAST(len(offs) AS INTEGER) AS n_frames,
               COALESCE(offs[-1], -1) AS last_off
        FROM (
          SELECT event_id, duration_ms,
                 CASE WHEN duration_ms > 0
                      THEN list_transform(range(0, (duration_ms - 1) // 250 + 1), i -> i * 250)
                      ELSE [] END AS offs
          FROM (SELECT event_id, CAST(floor(value * 1000.0) AS BIGINT) AS duration_ms FROM events))
        ORDER BY event_id
      """)),
    // ----------------------------------------------------------------
    // Skew-safe exact count-distinct: two cardinality-bounded stages
    // instead of funneling a hot key's values through one reducer.
    Q(
      "q53_skew_distinct",
      (s, dir) => {
        import s.implicits._
        graft.ext.Skew.countDistinctTwoPhase(
          t(s, dir, "events"), $"event_type", $"user_id")
          .orderBy($"key")
      },
      Some("""
        SELECT event_type AS key, COUNT(DISTINCT user_id) AS n_distinct
        FROM events
        GROUP BY event_type
        ORDER BY key
      """)),
    // ----------------------------------------------------------------
    // Batch session windows (30-minute inactivity gap per user) via the
    // native session_window; the DuckDB oracle rebuilds sessions with
    // gaps-and-islands. The streaming twin is EventStreams.sessionize.
    Q(
      "q54_session_window",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(session_window($"ts", "30 minutes"), $"user_id")
          .agg(count(lit(1)).as("n"), dsum($"value").as("total"))
          .select(
            $"user_id",
            tstr($"session_window.start").as("sess_start"),
            $"n", $"total")
          .orderBy($"user_id", $"sess_start")
      },
      Some("""
        WITH e AS (
          SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, value FROM events),
        marked AS (
          SELECT user_id, ts, value,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_sess
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        grp AS (
          SELECT user_id, ts, value,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked)
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
               COUNT(*) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS total
        FROM grp
        GROUP BY user_id, sid
        ORDER BY user_id, sess_start
      """)),
    // ----------------------------------------------------------------
    // IVF-style ANN: nearest-centroid partitioning + nProbe-cell search.
    // Complements the LSH path (q51); centroids are TRAINED (seeded
    // Lloyd's k-means, 2 iterations, deterministic init vec_id < 16 and
    // exact-decimal means) so the oracle rebuilds the identical index.
    Q(
      "q55_ann_ivf_topk",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        graft.ext.Similarity.ivfTopK(
          emb, emb.filter($"vec_id" < 5), "vec_id", "embedding",
          k = 5, nCells = 16, nProbe = 4, kmeansIters = 2)
          .orderBy($"query_id", $"neighbor_id")
      },
      Some(s"""
        WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                   FROM embeddings),
        ${OracleSql.kmeansCents(16, 2)},
        assigned AS (
          SELECT cid, cvec, cell FROM (
            SELECT c.vec_id AS cid, c.vec AS cvec, ct.cent_id AS cell,
                   ROW_NUMBER() OVER (PARTITION BY c.vec_id
                     ORDER BY ${cosSql("c.vec", "ct.cent_vec")} DESC, ct.cent_id) AS rn
            FROM v c CROSS JOIN cents ct)
          WHERE rn = 1),
        probes AS (
          SELECT qid, qvec, cell FROM (
            SELECT q.vec_id AS qid, q.vec AS qvec, ct.cent_id AS cell,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                     ORDER BY ${cosSql("q.vec", "ct.cent_vec")} DESC, ct.cent_id) AS rn
            FROM v q CROSS JOIN cents ct WHERE q.vec_id < 5)
          WHERE rn <= 4),
        scored AS (
          SELECT p.qid AS query_id, a.cid AS neighbor_id,
                 ${cosSql("p.qvec", "a.cvec")} AS cos
          FROM probes p JOIN assigned a ON p.cell = a.cell
          WHERE p.qid <> a.cid),
        ranked AS (
          SELECT query_id, neighbor_id, cos,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id) AS rn
          FROM scored)
        SELECT query_id, neighbor_id, cos FROM ranked WHERE rn <= 5
        ORDER BY query_id, neighbor_id
      """)),
    // ----------------------------------------------------------------
    // Sketch quantiles, self-verifying envelope: approx_percentile
    // (accuracy=10000 → rank error ≤ n/10000) runs next to its exact
    // twin (q83's percentile/quantile_cont interpolation contract) in
    // ONE aggregate; the emitted row is the exact quartiles plus the
    // deterministic within-5%-envelope verdict on the sketch. The
    // oracle replays the exact side + TRUE, so the row hash-matches
    // while the sketch is still exercised and bounded every round.
    Q(
      "q56_approx_percentile",
      (s, dir) => {
        import s.implicits._
        val price = $"l_extendedprice".cast("double")
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            approx_percentile(price, array(lit(0.25), lit(0.5), lit(0.75)),
              lit(10000)).as("q"),
            percentile(price, lit(0.25)).as("p25"),
            percentile(price, lit(0.5)).as("p50"),
            percentile(price, lit(0.75)).as("p75"))
          .select(
            $"l_returnflag", $"p25", $"p50", $"p75",
            (abs(element_at($"q", 1) - $"p25") <= abs($"p25") * 0.05 &&
              abs(element_at($"q", 2) - $"p50") <= abs($"p50") * 0.05 &&
              abs(element_at($"q", 3) - $"p75") <= abs($"p75") * 0.05)
              .as("within_5pct"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS p25,
               quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS p50,
               quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) AS p75,
               TRUE AS within_5pct
        FROM lineitem GROUP BY 1 ORDER BY 1
      """)),
    // ----------------------------------------------------------------
    // Pivot: wide sum-of-quantity by return flag (explicit value list →
    // stable output schema), decimal-exact sums.
    Q(
      "q57_pivot",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_linestatus")
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(dsum($"l_quantity"))
          .orderBy($"l_linestatus")
      },
      Some("""
        SELECT l_linestatus,
               CAST(CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(38,10)) END) AS VARCHAR) AS DOUBLE) AS A,
               CAST(CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(38,10)) END) AS VARCHAR) AS DOUBLE) AS N,
               CAST(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(38,10)) END) AS VARCHAR) AS DOUBLE) AS R
        FROM lineitem
        GROUP BY l_linestatus
        ORDER BY l_linestatus
      """)),
    // ----------------------------------------------------------------
    // Unpivot (melt): wide → long over two measure columns.
    Q(
      "q58_unpivot",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
          .unpivot(
            Array($"l_orderkey", $"l_linenumber"),
            Array($"l_quantity", $"l_extendedprice"),
            "measure", "val")
          .orderBy($"l_orderkey", $"l_linenumber", $"measure")
      },
      Some("""
        SELECT l_orderkey, l_linenumber, measure, val FROM (
          SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
          FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
          FROM lineitem)
        ORDER BY l_orderkey, l_linenumber, measure
      """)),
    // ----------------------------------------------------------------
    // Collection aggregates, flattened to a canonical string so both
    // engines compare exactly (raw array columns hash differently in
    // the driver's pandas canonicalization).
    Q(
      "q59_collect_agg",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy($"user_id")
          .agg(
            array_join(sort_array(collect_set($"event_type")), ",").as("types"),
            count(lit(1)).as("n"))
          .orderBy($"user_id")
      },
      Some("""
        SELECT user_id,
               string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
               COUNT(*) AS n
        FROM events
        GROUP BY user_id
        ORDER BY user_id
      """)),
    // ----------------------------------------------------------------
    // Statistical aggregates with exact parity: variance/stddev derived
    // from DECIMAL-exact sums (sum, sum of squares, count) so the only
    // floating-point ops are the identical final formula in both
    // engines — built-in stddev implementations differ numerically.
    Q(
      "q60_exact_stats",
      (s, dir) => {
        import s.implicits._
        val sx = sum($"l_quantity".cast(Dec)).cast("double")
        val sxx = sum(($"l_quantity" * $"l_quantity").cast(Dec)).cast("double")
        val n = count(lit(1)).cast("double")
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            ((sxx - sx * sx / n) / (n - lit(1.0))).as("var_qty"),
            sqrt((sxx - sx * sx / n) / (n - lit(1.0))).as("std_qty"),
            n.cast("long").as("n"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               (sxx - sx * sx / n) / (n - 1.0) AS var_qty,
               sqrt((sxx - sx * sx / n) / (n - 1.0)) AS std_qty,
               CAST(n AS BIGINT) AS n
        FROM (
          SELECT l_returnflag,
                 CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sx,
                 CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sxx,
                 CAST(COUNT(*) AS DOUBLE) AS n
          FROM lineitem
          GROUP BY l_returnflag)
        ORDER BY l_returnflag
      """)),
    // ----------------------------------------------------------------
    // Scalar subquery: parts above the global average price. The scalar
    // side is a 1-row broadcast; the average goes through the exact
    // decimal path so both engines compare against the identical double.
    Q(
      "q61_scalar_subquery",
      (s, dir) => {
        import s.implicits._
        val avgPrice = t(s, dir, "part")
          .agg(davg($"p_retailprice").as("avg_price"))
        t(s, dir, "part")
          .crossJoin(broadcast(avgPrice))
          .filter($"p_retailprice" > $"avg_price")
          .groupBy($"p_brand")
          .agg(count(lit(1)).as("n_above"), dsum($"p_retailprice").as("sum_above"))
          .orderBy($"p_brand")
      },
      Some("""
        SELECT p_brand, COUNT(*) AS n_above,
               CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_above
        FROM part
        WHERE p_retailprice > (
          SELECT CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
                 / CAST(COUNT(p_retailprice) AS DOUBLE)
          FROM part)
        GROUP BY p_brand
        ORDER BY p_brand
      """)),
    // ----------------------------------------------------------------
    // Null-safe equality join (<=>): NULL keys match NULL keys, unlike
    // plain =. Keys are made nullable by folding 'click' to NULL.
    Q(
      "q62_nullsafe_join",
      (s, dir) => {
        import s.implicits._
        val base = t(s, dir, "events")
          .select(nullif($"event_type", lit("click")).as("k"), $"value", $"user_id")
        val a = base.groupBy($"k").agg(count(lit(1)).as("n_a"))
        val b = base.filter($"user_id" % 2 === 0)
          .groupBy($"k").agg(count(lit(1)).as("n_b"))
        a.join(b, a("k") <=> b("k"), "left")
          .select(a("k").as("k"), $"n_a", coalesce($"n_b", lit(0L)).as("n_b"))
          .orderBy($"k")
      },
      Some("""
        SELECT a.k AS k, a.n_a, COALESCE(b.n_b, 0) AS n_b
        FROM (SELECT nullif(event_type, 'click') AS k, COUNT(*) AS n_a
              FROM events GROUP BY 1) a
        LEFT JOIN (SELECT nullif(event_type, 'click') AS k, COUNT(*) AS n_b
                   FROM events WHERE user_id % 2 = 0 GROUP BY 1) b
          ON a.k IS NOT DISTINCT FROM b.k
        ORDER BY k NULLS FIRST
      """)),
    // ----------------------------------------------------------------
    // TF/DF scoring: top-3 most distinctive terms per document by
    // tf/df (one double division — identical in both engines; ln-based
    // idf is NOT used because libm ulps differ across engines).
    // Skew posture at 100 TB: the tf⋈df join key is Zipf-distributed
    // (stopwords dominate), but the df side carries exactly ONE row per
    // term, so AQE's OptimizeSkewedJoin splits the hot tf partitions and
    // replicates the matching single-row df partitions — no salting
    // needed. Measured at 10× docs in BASELINE.md's scale-up table. A
    // lossy mitigation (pre-filtering terms with df above a stopword
    // threshold) would change the ranking contract, so it is not applied.
    // Considered and rejected: df as count().over(partitionBy(term)) is
    // ~10% faster at sf0.1 (drops the build-side exchange) but pins every
    // row of a hot term into ONE window partition — and AQE can split a
    // skewed JOIN partition, never a window partition. Join wins at scale.
    Q(
      "q63_tf_top_terms",
      (s, dir) => {
        import s.implicits._
        val tf = t(s, dir, "documents")
          .select($"doc_id", explode(graft.ext.TextHash.tokens(lower($"text"))).as("term"))
          .groupBy($"doc_id", $"term")
          .agg(count(lit(1)).as("tf"))
        val df_ = tf.groupBy($"term").agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id")
          .orderBy(($"tf".cast("double") / $"df".cast("double")).desc, $"term")
        tf.join(df_, Seq("term"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"doc_id", $"term", $"tf", $"df", $"rn")
          .orderBy($"doc_id", $"rn")
      },
      Some("""
        WITH tf AS (
          SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS term
          FROM documents),
        tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
        dfc AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1),
        ranked AS (
          SELECT doc_id, term, tf, df,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) DESC, term) AS rn
          FROM tfc JOIN dfc USING (term))
        SELECT doc_id, term, tf, df, rn FROM ranked WHERE rn <= 3
        ORDER BY doc_id, rn
      """))
  )
}
