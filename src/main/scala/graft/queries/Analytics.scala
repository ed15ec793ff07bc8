package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Dedup, Funnel, Graph, Joins, Profile, Ranges, Sampling, Similarity, Skew, TextAnalysis, TextHash, TimeSeries}
import graft.etl.Merge
import Q._

/** Round-6 analytics surface: planned skew mitigation (salted join),
  * Markov transition matrices, and distribution-shape moments — the
  * profiling/sequence questions left open after rounds 1–5.
  */
object Analytics {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // Salted shuffle join: events (5 hot event_type keys — maximal
    // skew: every row is one of 5 values) joined to a per-type weight
    // dim under a shuffle_hash hint (standing in for a dim too big to
    // broadcast), salt spreading each hot key over 8 reducers. The
    // oracle is the plain unsalted join — salting must be
    // result-invisible.
    Q(
      "q117_salted_join",
      (s, dir) => {
        import s.implicits._
        val weights = Seq(
          ("view", 1.0), ("click", 2.0), ("purchase", 10.0),
          ("signup", 5.0), ("error", 0.5)).toDF("event_type", "weight")
        Skew.saltedJoin(
            t(s, dir, "events"), weights.hint("shuffle_hash"),
            keys = Seq("event_type"), saltBy = Seq($"event_id"), salts = 8)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), dsum($"value" * $"weight").as("weighted_sum"))
          .orderBy($"event_type")
      },
      Some(s"""
        WITH w(event_type, weight) AS (VALUES
          ('view', 1.0), ('click', 2.0), ('purchase', 10.0),
          ('signup', 5.0), ('error', 0.5))
        SELECT e.event_type, COUNT(*) AS n,
               ${OracleSql.dsum("e.value * w.weight")} AS weighted_sum
        FROM events e JOIN w USING (event_type)
        GROUP BY e.event_type
        ORDER BY e.event_type
      """)),
    // ----------------------------------------------------------------
    // First-order event-type transition matrix per user: pair counts
    // and P(next | prev) in exact ppb (integer floor-division — the
    // q107 convention). Oracle rebuilds the pairs with a LAG window.
    Q(
      "q118_transition_matrix",
      (s, dir) => {
        import s.implicits._
        Funnel.transitionMatrix(
            t(s, dir, "events"), $"user_id", $"ts", $"event_type", $"event_id")
          .orderBy($"from_state", $"to_state")
      },
      Some("""
        WITH p AS (
          SELECT LAG(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS from_state,
                 event_type AS to_state
          FROM events),
        c AS (
          SELECT from_state, to_state, COUNT(*) AS n
          FROM p WHERE from_state IS NOT NULL
          GROUP BY from_state, to_state),
        tot AS (SELECT from_state, CAST(SUM(n) AS BIGINT) AS tt
                FROM c GROUP BY from_state)
        SELECT c.from_state, c.to_state, c.n,
               c.n * 1000000000 // tot.tt AS prob_ppb
        FROM c JOIN tot USING (from_state)
        ORDER BY from_state, to_state
      """)),
    // ----------------------------------------------------------------
    // Distribution-shape moments of l_quantity per return flag:
    // decimal-exact power sums, fixed-op-order closing formulas (see
    // Profile.moments scaladoc) — the oracle replays the identical
    // IEEE operation sequence.
    Q(
      "q119_moments",
      (s, dir) => {
        import s.implicits._
        Profile.moments(t(s, dir, "lineitem"), Seq("l_returnflag"), $"l_quantity")
          .orderBy($"l_returnflag")
      },
      Some(s"""
        WITH a AS (
          SELECT l_returnflag,
                 CAST(COUNT(x) AS DOUBLE) AS n,
                 ${OracleSql.dsum("x")} AS s1,
                 ${OracleSql.dsum("x * x")} AS s2,
                 ${OracleSql.dsum("x * x * x")} AS s3,
                 ${OracleSql.dsum("x * x * x * x")} AS s4
          FROM (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS x FROM lineitem)
          GROUP BY l_returnflag),
        b AS (SELECT *, s1 / n AS mu FROM a),
        m AS (
          SELECT l_returnflag, n, mu,
                 s2 - mu * s1 AS m2,
                 s3 - 3.0 * mu * s2 + 2.0 * mu * mu * s1 AS m3,
                 s4 - 4.0 * mu * s3 + 6.0 * mu * mu * s2
                    - 3.0 * mu * mu * mu * s1 AS m4
          FROM b)
        SELECT l_returnflag, CAST(n AS BIGINT) AS n, mu AS mean,
               m2 / n AS variance,
               CASE WHEN m2 > 0
                    THEN (m3 / n) / ((m2 / n) * sqrt(m2 / n)) END AS skewness,
               CASE WHEN m2 > 0
                    THEN (m4 / n) / ((m2 / n) * (m2 / n)) - 3.0 END AS kurtosis
        FROM m ORDER BY l_returnflag
      """)),
    // ----------------------------------------------------------------
    // Correlated EXISTS / NOT EXISTS: orders with at least one
    // high-quantity line and no returned line. Catalyst decorrelates
    // both subqueries into one semi- and one anti-join — the SQL
    // surface every warehouse migration exercises first.
    Q(
      "q120_exists_subquery",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("q120_orders")
        t(s, dir, "lineitem").createOrReplaceTempView("q120_lineitem")
        s.sql("""
          SELECT o_orderkey, o_totalprice FROM q120_orders o
          WHERE EXISTS (SELECT 1 FROM q120_lineitem l
                        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
            AND NOT EXISTS (SELECT 1 FROM q120_lineitem l2
                            WHERE l2.l_orderkey = o.o_orderkey
                              AND l2.l_returnflag = 'R')
          ORDER BY o_orderkey
        """)
      },
      Some("""
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
          AND NOT EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = o.o_orderkey
                            AND l2.l_returnflag = 'R')
        ORDER BY o_orderkey
      """)),
    // ----------------------------------------------------------------
    // Character-class distribution per doc: one compiled scan-stage
    // pass (no explode, no log). The oracle rebuilds the histogram the
    // expensive way — per-character unnest — which is exactly why the
    // engine side must not.
    Q(
      "q121_char_stats",
      (s, dir) => {
        import s.implicits._
        TextAnalysis.charStats(t(s, dir, "documents"), $"doc_id", $"text")
          .orderBy($"doc_id")
      },
      Some("""
        WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        ch AS (
          SELECT doc_id, unicode(c) AS u
          FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM d)
          WHERE unicode(c) >= 0),
        cls AS (
          SELECT doc_id, COUNT(*) AS n_chars,
                 COUNT(*) FILTER (WHERE u < 128) AS n_ascii,
                 COUNT(*) FILTER (WHERE u IN (32, 9, 10, 13)) AS n_ws,
                 COUNT(*) FILTER (WHERE u BETWEEN 48 AND 57) AS n_digit,
                 COUNT(*) FILTER (WHERE u BETWEEN 65 AND 90
                                     OR u BETWEEN 97 AND 122) AS n_alpha,
                 COUNT(*) FILTER (WHERE u BETWEEN 65 AND 90) AS n_upper
          FROM ch GROUP BY doc_id),
        hist AS (
          SELECT doc_id, u, COUNT(*) AS cnt
          FROM ch WHERE u < 128 GROUP BY doc_id, u),
        h AS (
          SELECT doc_id, COUNT(*) AS n_distinct_ascii, MAX(cnt) AS top_ascii_count
          FROM hist GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(cls.n_chars, 0) AS n_chars,
               COALESCE(cls.n_ascii, 0) AS n_ascii,
               COALESCE(cls.n_ws, 0) AS n_ws,
               COALESCE(cls.n_digit, 0) AS n_digit,
               COALESCE(cls.n_alpha, 0) AS n_alpha,
               COALESCE(cls.n_upper, 0) AS n_upper,
               COALESCE(h.n_distinct_ascii, 0) AS n_distinct_ascii,
               COALESCE(h.top_ascii_count, 0) AS top_ascii_count
        FROM d LEFT JOIN cls USING (doc_id) LEFT JOIN h USING (doc_id)
        ORDER BY d.doc_id
      """)),
    // ----------------------------------------------------------------
    // posexplode: tokens with their in-document ordinal (the generator
    // that carries position — explode alone loses it), first three
    // tokens per doc.
    Q(
      "q122_pos_tokens",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id",
            posexplode(TextHash.tokens(lower($"text"))).as(Seq("pos", "tok")))
          .filter($"pos" < 3)
          .orderBy($"doc_id", $"pos")
      },
      Some(s"""
        SELECT doc_id, CAST(ord - 1 AS INTEGER) AS pos, tok
        FROM (
          SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
          FROM (SELECT doc_id, ${OracleSql.tokens("lower(text)")} AS toks
                FROM documents))
        WHERE ord <= 3
        ORDER BY doc_id, pos
      """)),
    // ----------------------------------------------------------------
    // PageRank (3 damped iterations, exact ppm integer arithmetic)
    // over the undirected customer↔supplier trade graph. The oracle
    // unrolls the iterations as a CTE chain — every operation is
    // integer, so the two engines agree bit-for-bit.
    Q(
      "q123_pagerank",
      (s, dir) => {
        import s.implicits._
        // pinned: both union orientations read the join+distinct chain,
        // which otherwise executes twice (once per flip side)
        val pair = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
          .select(concat(lit("c"), $"o_custkey".cast("string")).as("a"),
            concat(lit("s"), $"l_suppkey".cast("string")).as("b"))
          .distinct()
          .localCheckpoint()
        val edges = pair.select($"a".as("src"), $"b".as("dst"))
          .unionByName(pair.select($"b".as("src"), $"a".as("dst")))
        // rankUnit 10⁹: the graph has ~16k nodes at sf0.1 — the default
        // ppm unit would leave <100 rank units per node (guard-rejected)
        Graph.pageRank(edges, "src", "dst", iters = 3,
          rankUnit = 1000000000L).orderBy($"node")
      },
      Some {
        def inflow(i: Int) = s"""
          i$i AS (
            SELECT e.dst AS node, CAST(SUM(r.r // deg.d) AS BIGINT) AS s
            FROM e JOIN r${i - 1} r ON e.src = r.node
                   JOIN deg ON e.src = deg.src
            GROUP BY e.dst),
          r$i AS (
            SELECT deg.src AS node,
                   CAST(150000000 // nn.n
                        + (850000 * COALESCE(i$i.s, 0)) // 1000000 AS BIGINT) AS r
            FROM deg CROSS JOIN nn LEFT JOIN i$i ON deg.src = i$i.node)"""
        s"""
        WITH pair AS (
          SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS a,
                          's' || CAST(l.l_suppkey AS VARCHAR) AS b
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        e AS (SELECT a AS src, b AS dst FROM pair
              UNION SELECT b AS src, a AS dst FROM pair),
        deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
        nn AS (SELECT COUNT(*) AS n FROM deg),
        r0 AS (SELECT deg.src AS node, CAST(1000000000 // nn.n AS BIGINT) AS r
               FROM deg CROSS JOIN nn),
        ${inflow(1)},
        ${inflow(2)},
        ${inflow(3)}
        SELECT node, r AS rank_ppm FROM r3 ORDER BY node
        """
      }),
    // ----------------------------------------------------------------
    // Exact join-output cardinality WITHOUT running the join: the
    // pre-flight skew check. Self-join of events on user_id — every
    // key's contribution is n², summarized to one row.
    Q(
      "q124_join_cardinality",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        // out_rows is decimal(38,0) (overflow-safe at corpus scale);
        // the long casts here are for the oracle hash only and are
        // exact at the test scale factors
        Profile.joinCardinality(ev, $"user_id", ev, $"user_id")
          .agg(sum($"out_rows").cast("long").as("total_rows"),
            max($"out_rows").cast("long").as("max_key_rows"),
            count(lit(1)).as("n_keys"))
      },
      Some("""
        WITH a AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id)
        SELECT CAST(SUM(n * n) AS BIGINT) AS total_rows,
               CAST(MAX(n * n) AS BIGINT) AS max_key_rows,
               COUNT(*) AS n_keys
        FROM a
      """)),
    // ----------------------------------------------------------------
    // Change-log apply with delete tombstones: orders keys ≡0 (mod 10)
    // deleted, ≡1/2 updated (+1 price), rest pass through — MERGE
    // WHEN MATCHED THEN DELETE semantics as one keyed shuffle, no join.
    Q(
      "q125_apply_changelog",
      (s, dir) => {
        import s.implicits._
        val orders = t(s, dir, "orders")
        val changes = orders.filter($"o_orderkey" % 10 < 3)
          .withColumn("o_totalprice", $"o_totalprice" + lit(1.0))
          .withColumn("op", when($"o_orderkey" % 10 === 0, "D").otherwise("U"))
        Merge.applyChangeLog(orders, changes, Seq("o_orderkey"), "op")
          .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          .orderBy($"o_orderkey")
      },
      Some("""
        WITH ch AS (
          SELECT o_orderkey, o_totalprice + 1.0 AS newp,
                 CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op
          FROM orders WHERE o_orderkey % 10 < 3)
        SELECT o.o_orderkey,
               COALESCE(ch.newp, o.o_totalprice) AS o_totalprice,
               o.o_orderstatus
        FROM orders o LEFT JOIN ch USING (o_orderkey)
        WHERE ch.op IS NULL OR ch.op = 'U'
        ORDER BY o_orderkey
      """)),
    // ----------------------------------------------------------------
    // Percentile winsorization of event values per type: clamp into
    // [p05, p95] of the group — outlier treatment that preserves row
    // count. Exact percentile edges (quantile_cont parity, q83's
    // contract).
    Q(
      "q126_winsorize",
      (s, dir) => {
        import s.implicits._
        Profile.winsorize(
            t(s, dir, "events"), Seq("event_type"), $"value", 0.05, 0.95)
          .select($"event_id", $"event_type", $"value", $"winsorized")
          .orderBy($"event_id")
      },
      Some("""
        WITH q AS (
          SELECT event_type,
                 quantile_cont(value, 0.05) AS plo,
                 quantile_cont(value, 0.95) AS phi
          FROM events GROUP BY event_type)
        SELECT e.event_id, e.event_type, e.value,
               CASE WHEN e.value IS NULL THEN NULL
                    ELSE LEAST(GREATEST(e.value, q.plo), q.phi) END AS winsorized
        FROM events e JOIN q ON e.event_type IS NOT DISTINCT FROM q.event_type
        ORDER BY e.event_id
      """)),
    // ----------------------------------------------------------------
    // Frequent 3-step session paths: sliding event-type trigrams per
    // user, counted corpus-wide, top 20 (total order: count desc then
    // path). The sequence-mining complement of q118.
    Q(
      "q127_path_ngrams",
      (s, dir) => {
        import s.implicits._
        Funnel.pathNgrams(
            t(s, dir, "events"), $"user_id", $"ts", $"event_type", $"event_id", n = 3)
          .orderBy($"n".desc, $"path")
          .limit(20)
      },
      Some("""
        WITH o AS (
          SELECT event_type AS s0,
                 LEAD(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS s1,
                 LEAD(event_type, 2) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS s2
          FROM events)
        SELECT s0 || ' > ' || s1 || ' > ' || s2 AS path, COUNT(*) AS n
        FROM o WHERE s0 IS NOT NULL AND s1 IS NOT NULL AND s2 IS NOT NULL
        GROUP BY path ORDER BY n DESC, path LIMIT 20
      """)),
    // ----------------------------------------------------------------
    // Lag/rolling feature block per user: lag_1, lag_3, trailing-5
    // count/mean/min/max — all windows share ONE Exchange + Sort. The
    // rolling mean is exact-decimal sum / count (frame-order-free).
    Q(
      "q128_lag_features",
      (s, dir) => {
        import s.implicits._
        TimeSeries.lagFeatures(
            t(s, dir, "events"), $"user_id", $"ts", $"value", $"event_id",
            lags = Seq(1, 3), rollWindow = 5)
          .select($"key", tstr($"ts").as("ts"), $"tiebreak".as("event_id"),
            $"value", $"lag_1", $"lag_3", $"roll_n", $"roll_mean",
            $"roll_min", $"roll_max")
          .orderBy($"key", $"ts", $"event_id")
      },
      Some("""
        WITH e AS (
          SELECT user_id AS key, make_timestamp(epoch_ns(ts) // 1000) AS ts,
                 event_id, CAST(value AS DOUBLE) AS value
          FROM events)
        SELECT key, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_id, value,
               LAG(value, 1) OVER w AS lag_1,
               LAG(value, 3) OVER w AS lag_3,
               COUNT(value) OVER wr AS roll_n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) OVER wr AS VARCHAR)
                    AS DOUBLE)
                 / CAST(COUNT(value) OVER wr AS DOUBLE) AS roll_mean,
               MIN(value) OVER wr AS roll_min,
               MAX(value) OVER wr AS roll_max
        FROM e
        WINDOW w AS (PARTITION BY key ORDER BY ts, event_id),
               wr AS (PARTITION BY key ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        ORDER BY key, strftime(ts, '%Y-%m-%d %H:%M:%S'), event_id
      """)),
    // ----------------------------------------------------------------
    // Bipartite projection: suppliers linked by shared customers,
    // hub customers (degree > 30) excluded by contract — the
    // co-occurrence graph builder with its quadratic cost capped.
    Q(
      "q129_bipartite_project",
      (s, dir) => {
        import s.implicits._
        val pair = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey", $"l_suppkey")
        Graph.bipartiteProject(pair, "o_custkey", "l_suppkey", maxDegree = 30)
          .orderBy($"a", $"b")
      },
      Some("""
        WITH e AS (
          SELECT DISTINCT o_custkey AS l, l_suppkey AS r
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        deg AS (SELECT l, COUNT(*) AS d FROM e GROUP BY l),
        kept AS (SELECT e.l, e.r FROM e JOIN deg USING (l) WHERE deg.d <= 30),
        p AS (SELECT k1.r AS a, k2.r AS b
              FROM kept k1 JOIN kept k2 USING (l) WHERE k1.r < k2.r)
        SELECT a, b, COUNT(*) AS weight FROM p GROUP BY a, b ORDER BY a, b
      """)),
    // ----------------------------------------------------------------
    // Join-key overlap diagnostic: customers vs orders — distinct keys
    // per side / in both, plus matched/unmatched ROW volume per side.
    Q(
      "q130_key_overlap",
      (s, dir) => {
        import s.implicits._
        Profile.keyOverlap(
          t(s, dir, "customer"), $"c_custkey",
          t(s, dir, "orders"), $"o_custkey")
      },
      Some("""
        WITH la AS (SELECT c_custkey AS key, COUNT(*) AS ln FROM customer GROUP BY 1),
        ra AS (SELECT o_custkey AS key, COUNT(*) AS rn FROM orders GROUP BY 1),
        j AS (SELECT la.ln, ra.rn FROM la FULL OUTER JOIN ra USING (key))
        SELECT COUNT(ln) AS n_keys_left, COUNT(rn) AS n_keys_right,
               COUNT(CASE WHEN ln IS NOT NULL AND rn IS NOT NULL THEN 1 END)
                 AS n_keys_both,
               CAST(COALESCE(SUM(CASE WHEN rn IS NOT NULL THEN ln END), 0) AS BIGINT)
                 AS rows_left_matched,
               CAST(COALESCE(SUM(CASE WHEN rn IS NULL THEN ln END), 0) AS BIGINT)
                 AS rows_left_unmatched,
               CAST(COALESCE(SUM(CASE WHEN ln IS NOT NULL THEN rn END), 0) AS BIGINT)
                 AS rows_right_matched,
               CAST(COALESCE(SUM(CASE WHEN ln IS NULL THEN rn END), 0) AS BIGINT)
                 AS rows_right_unmatched
        FROM j
      """)),
    // ----------------------------------------------------------------
    // Temporal train/test split with a 1-hour embargo: train ≤ the
    // exact p80 time cut, test > cut + 3600 s, the embargo span
    // excluded (null) so boundary-straddling features can't leak.
    Q(
      "q131_split_by_time",
      (s, dir) => {
        import s.implicits._
        Sampling.splitByTime(t(s, dir, "events"), $"ts", 0.8, 3600L)
          .select($"event_id", $"split")
          .orderBy($"event_id")
      },
      Some("""
        WITH c AS (
          SELECT quantile_cont(CAST(epoch_ns(ts) // 1000000000 AS DOUBLE), 0.8)
            AS cut
          FROM events)
        SELECT e.event_id,
               CASE WHEN CAST(epoch_ns(e.ts) // 1000000000 AS DOUBLE) <= c.cut
                    THEN 'train'
                    WHEN CAST(epoch_ns(e.ts) // 1000000000 AS DOUBLE)
                         > c.cut + 3600.0
                    THEN 'test' END AS split
        FROM events e CROSS JOIN c
        ORDER BY e.event_id
      """)),
    // ----------------------------------------------------------------
    // Merge overlapping shipping-week intervals per order
    // (gaps-and-islands): each line covers [shipdate, shipdate+7d];
    // touching intervals merge, one row per coverage island.
    Q(
      "q132_interval_merge",
      (s, dir) => {
        import s.implicits._
        val iv = t(s, dir, "lineitem")
          .select($"l_orderkey", to_date($"l_shipdate").as("l_shipday"),
            date_add(to_date($"l_shipdate"), 7).as("l_shipend"), $"l_linenumber")
        Ranges.intervalMerge(iv,
            $"l_orderkey", $"l_shipday", $"l_shipend", $"l_linenumber")
          .select($"key".as("l_orderkey"),
            $"start".cast("string").as("start_date"),
            $"end".cast("string").as("end_date"), $"n_merged")
          .orderBy($"l_orderkey", $"start_date")
      },
      Some("""
        WITH b AS (
          SELECT l_orderkey AS k, CAST(l_shipdate AS DATE) AS s,
                 CAST(l_shipdate AS DATE) + 7 AS e,
                 l_linenumber AS tb
          FROM lineitem),
        w1 AS (
          SELECT k, s, e, tb,
                 MAX(e) OVER (PARTITION BY k ORDER BY s, e, tb
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
          FROM b),
        w2 AS (
          SELECT k, s, e,
                 SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
                   OVER (PARTITION BY k ORDER BY s, e, tb
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
          FROM w1)
        SELECT k AS l_orderkey, CAST(MIN(s) AS VARCHAR) AS start_date,
               CAST(MAX(e) AS VARCHAR) AS end_date, COUNT(*) AS n_merged
        FROM w2 GROUP BY k, isl
        ORDER BY l_orderkey, start_date
      """)),
    // ----------------------------------------------------------------
    // Measured LSH recall on a 70% hash sample: exact Jaccard pairs
    // as ground truth, the q35 LSH parameters as candidate, recall in
    // exact ppb. The oracle replays the full composition (sample →
    // shingles → truth join → minhash/band/verify → counts).
    Q(
      "q133_lsh_recall_probe",
      (s, dir) => {
        import s.implicits._
        Dedup.lshRecallProbe(t(s, dir, "documents"), "doc_id", "text",
          sampleRate = 0.7, shingleSize = 3, bands = 8, rowsPerBand = 2,
          threshold = 0.5)
      },
      Some {
        val params = TextHash.minhashParams(16)
        val seedRows = params.zipWithIndex
          .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
        val h = OracleSql.hash64("'0'", "g")
        s"""
        WITH d AS (
          SELECT doc_id, text FROM documents
          WHERE ${OracleSql.hash64("'0'", "CAST(doc_id AS VARCHAR)")} % 10000 < 7000),
        sh AS (SELECT doc_id,
                 list_distinct(list_transform(${OracleSql.wordShingles3("text")},
                   g -> $h % 2147483647)) AS shingles
               FROM d),
        post AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
        sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        truth AS (
          SELECT id_a, id_b
          FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
          WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.5),
        sig AS (
          SELECT doc_id, s.seed, MIN((g * s.a + s.b) % 2147483647) AS mh
          FROM post CROSS JOIN (VALUES $seedRows) s(seed, a, b)
          GROUP BY 1, 2),
        sigarr AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM sig GROUP BY 1),
        bandkey AS (
          SELECT doc_id,
                 CAST(b AS VARCHAR) || '_' || CAST(sig[2*b+1] AS VARCHAR) || '_' ||
                 CAST(sig[2*b+2] AS VARCHAR) AS key
          FROM sigarr CROSS JOIN (SELECT unnest(range(0, 8)) AS b)),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bandkey a JOIN bandkey b ON a.key = b.key AND a.doc_id < b.doc_id),
        lsh AS (
          SELECT c.id_a, c.id_b
          FROM cand c JOIN sz sa ON sa.doc_id = c.id_a
                      JOIN sz sb ON sb.doc_id = c.id_b
                      JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
          WHERE CAST(i.inter AS DOUBLE)
                / CAST(sa.n + sb.n - i.inter AS DOUBLE) >= 0.5),
        fnd AS (SELECT * FROM truth INTERSECT SELECT * FROM lsh)
        SELECT (SELECT COUNT(*) FROM truth) AS n_true_pairs,
               (SELECT COUNT(*) FROM fnd) AS n_found_pairs,
               CASE WHEN (SELECT COUNT(*) FROM truth) > 0
                    THEN (SELECT COUNT(*) FROM fnd) * 1000000000
                         // (SELECT COUNT(*) FROM truth) END AS recall_ppb
        """
      }),
    // ----------------------------------------------------------------
    // n-gram novelty of odd docs against the even-doc corpus: the
    // memorization triage signal — fraction of each probe's distinct
    // trigrams the corpus has never seen (full 60-bit hash space).
    Q(
      "q134_ngram_novelty",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        TextAnalysis.ngramNovelty(
            docs.filter($"doc_id" % 2 === 1), $"doc_id", $"text",
            docs.filter($"doc_id" % 2 === 0), $"text")
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH base AS (
          SELECT doc_id, ${OracleSql.hashedShingles3Full("text")} AS sh
          FROM documents WHERE doc_id % 2 = 1),
        post AS (SELECT doc_id, unnest(sh) AS g FROM base),
        seen AS (
          SELECT DISTINCT unnest(${OracleSql.hashedShingles3Full("text")}) AS g,
                 1 AS fl
          FROM documents WHERE doc_id % 2 = 0),
        pd AS (
          SELECT p.doc_id, COUNT(*) AS n_grams,
                 CAST(SUM(CASE WHEN seen.fl IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_novel
          FROM post p LEFT JOIN seen ON p.g = seen.g
          GROUP BY p.doc_id)
        SELECT b.doc_id,
               COALESCE(pd.n_grams, 0) AS n_grams,
               COALESCE(pd.n_novel, 0) AS n_novel,
               CASE WHEN COALESCE(pd.n_grams, 0) > 0
                    THEN CAST(pd.n_novel AS DOUBLE) / CAST(pd.n_grams AS DOUBLE)
                    END AS novelty_frac
        FROM base b LEFT JOIN pd USING (doc_id)
        ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Numeric band join |a−b| ≤ 0.01 over purchase values as a
    // bucketed equi-join (bucket ± 1 probe) — the large×large near-
    // join BNLJ can't do past broadcast size. Oracle is the plain
    // theta join.
    Q(
      "q135_band_join",
      (s, dir) => {
        import s.implicits._
        val p = t(s, dir, "events").filter($"event_type" === "purchase")
        Joins.bandJoin(p, $"event_id", $"value", p, $"event_id", $"value",
            eps = 0.01)
          .filter($"id_a" < $"id_b")
          .orderBy($"id_a", $"id_b")
      },
      Some("""
        WITH p AS (
          SELECT event_id, CAST(value AS DOUBLE) AS v FROM events
          WHERE event_type = 'purchase' AND value IS NOT NULL)
        SELECT a.event_id AS id_a, a.v AS val_a, b.event_id AS id_b, b.v AS val_b
        FROM p a JOIN p b
          ON abs(a.v - b.v) <= 0.01 AND a.event_id < b.event_id
        ORDER BY id_a, id_b
      """)),
    // ----------------------------------------------------------------
    // Time-interval RANGE frame: per-user trailing-1-hour event count
    // and exact-decimal value sum — the "rolling window by TIME, not
    // by rows" shape q49's numeric RANGE frame doesn't cover.
    Q(
      "q136_time_range_window",
      (s, dir) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id")
          .orderBy(unix_timestamp($"ts"))
          .rangeBetween(-3600L, 0L)
        t(s, dir, "events")
          .select($"user_id", $"ts", $"event_id", $"value",
            count(lit(1)).over(w).as("n_1h"),
            sum($"value".cast(Dec)).over(w).cast("double").as("sum_1h"))
          .select($"user_id", tstr($"ts").as("ts"), $"event_id", $"value",
            $"n_1h", $"sum_1h")
          .orderBy($"user_id", $"ts", $"event_id")
      },
      Some("""
        WITH e AS (
          SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
                 event_id, value,
                 epoch_ns(ts) // 1000000000 AS sec
          FROM events)
        SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_id, value,
               COUNT(*) OVER w AS n_1h,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) OVER w AS VARCHAR)
                    AS DOUBLE) AS sum_1h
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY sec
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, strftime(ts, '%Y-%m-%d %H:%M:%S'), event_id
      """)),
    // ----------------------------------------------------------------
    // LOCF gap-fill (last observation carried forward): values < 10
    // masked to null, then filled from the latest preceding non-null
    // per user — the IGNORE NULLS window surface (q101 uses it inside
    // resampleFill; this is the bare operator on the raw event grid).
    Q(
      "q137_locf",
      (s, dir) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id")
          .orderBy($"ts", $"event_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        t(s, dir, "events")
          .withColumn("observed", when($"value" >= 10.0, $"value"))
          .select($"user_id", tstr($"ts").as("ts"), $"event_id", $"observed",
            last($"observed", ignoreNulls = true).over(w).as("filled"))
          .orderBy($"user_id", $"ts", $"event_id")
      },
      Some("""
        WITH e AS (
          SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_id,
                 CASE WHEN value >= 10.0 THEN value END AS observed
          FROM events)
        SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_id, observed,
               LAST_VALUE(observed IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        FROM e
        ORDER BY user_id, strftime(ts, '%Y-%m-%d %H:%M:%S'), event_id
      """)),
    // ----------------------------------------------------------------
    // explode_outer: docs whose filtered token array is EMPTY survive
    // with a null token — the generator variant plain explode silently
    // drops (q29's twin with row preservation). Tokens longer
    // than 6 chars; short-token-only docs keep their row.
    Q(
      "q138_explode_outer",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id",
            explode_outer(filter(TextHash.tokens(lower($"text")),
              t => length(t) > 6)).as("long_tok"))
          .orderBy($"doc_id", $"long_tok")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(${OracleSql.tokens("lower(text)")},
                   x -> length(x) > 6) AS toks
          FROM documents)
        SELECT doc_id, CASE WHEN len(toks) = 0 THEN NULL ELSE u.tok END AS long_tok
        FROM d LEFT JOIN LATERAL (SELECT unnest(toks) AS tok) u ON TRUE
        ORDER BY doc_id, long_tok
      """)),
    // ----------------------------------------------------------------
    // unionByName with missing columns: two differently-shaped event
    // projections union by NAME (not position), absent columns
    // null-padded — the schema-evolution union the reference's
    // positional unions can't express.
    Q(
      "q139_union_missing_cols",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val a = ev.filter($"event_type" === "click")
          .select($"event_id", $"user_id", $"value")
        val b = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"event_type")
        a.unionByName(b, allowMissingColumns = true)
          .orderBy($"event_id")
      },
      Some("""
        SELECT event_id, user_id, value, NULL AS event_type
        FROM events WHERE event_type = 'click'
        UNION ALL BY NAME
        SELECT event_id, user_id, NULL AS value, event_type
        FROM events WHERE event_type = 'purchase'
        ORDER BY event_id
      """)),
    // ----------------------------------------------------------------
    // The higher-order functions q28 doesn't touch: zip_with (pairwise
    // combine of two arrays — the self-reverse dot and an index-
    // weighted sum), and map_filter (entry-wise predicate over a map
    // built with map_from_arrays). All codegen scan-stage work, no
    // shuffle, same fixed 0.0-seeded left-fold contract as q28 so the
    // oracle reproduces the exact IEEE doubles.
    Q(
      "q140_higher_order",
      (s, dir) => {
        import s.implicits._
        val d = transform($"embedding", x => x.cast("double"))
        val idx = sequence(lit(1), size($"embedding"))
        t(s, dir, "embeddings")
          .select(
            $"vec_id",
            aggregate(zip_with(d, reverse(d), (a, b) => a * b),
              lit(0.0), (acc, x) => acc + x).as("rev_dot"),
            size(map_filter(map_from_arrays(idx, d), (_, v) => v > 0.0))
              .cast("long").as("n_pos_entries"),
            aggregate(zip_with(d, transform(idx, i => i.cast("double")),
                (a, i) => a * i),
              lit(0.0), (acc, x) => acc + x).as("pos_weighted_sum"))
          .orderBy($"vec_id")
      },
      Some("""
        WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS d
          FROM embeddings)
        SELECT vec_id,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(1, len(d)+1), i -> d[i] * d[len(d)+1-i])),
                 (a,b) -> a+b) AS rev_dot,
               CAST(len(list_filter(d, x -> x > 0.0)) AS BIGINT) AS n_pos_entries,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(1, len(d)+1), i -> d[i] * CAST(i AS DOUBLE))),
                 (a,b) -> a+b) AS pos_weighted_sum
        FROM e
        ORDER BY vec_id
      """)),
    // ----------------------------------------------------------------
    // SemDeDup semantic near-dup pairs with the CORPUS-DERIVED cell
    // count (targetCellSize=64 → ⌈n/64⌉ cells, clamped [2, 2^20]):
    // the q55 k-means chain, but the sizing contract itself is under
    // oracle — DuckDB re-derives k from its own COUNT(*), so a drift
    // in the derivation (the thing that keeps Σ|cell|² linear at
    // 100 TB) breaks the hash, not just a unit test.
    Q(
      "q141_semantic_neardup",
      (s, dir) => {
        import s.implicits._
        Similarity.semanticNearDupPairs(
            t(s, dir, "embeddings"), "vec_id", "embedding",
            threshold = 0.3, targetCellSize = 64L)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""
        WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                   FROM embeddings),
        ${OracleSql.kmeansCents(
          "SELECT GREATEST(2, LEAST((COUNT(*) - 1) // 64 + 1, 1048576)) FROM v", 2)},
        assigned AS (
          SELECT vid, vec, cell FROM (
            SELECT c.vec_id AS vid, c.vec AS vec, ct.cent_id AS cell,
                   ROW_NUMBER() OVER (PARTITION BY c.vec_id
                     ORDER BY ${OracleSql.cosine("c.vec", "ct.cent_vec")} DESC, ct.cent_id) AS rn
            FROM v c CROSS JOIN cents ct)
          WHERE rn = 1)
        SELECT cell, id_a, id_b, cos FROM (
          SELECT a.cell AS cell, a.vid AS id_a, b.vid AS id_b,
                 ${OracleSql.cosine("a.vec", "b.vec")} AS cos
          FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vid < b.vid)
        WHERE cos >= 0.3
        ORDER BY id_a, id_b
      """))
  )
}
