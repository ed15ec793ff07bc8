package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.ext.{Assoc, Funnel, Graph, Profile, Retrieval, TextAnalysis, TimeSeries}
import Q._

/** Round-6 analytical surface: grouped regression, deterministic mode,
  * bitwise rollups, ordered listagg, association rules, triangle
  * census, token-diversity curation signals, lateral top-k, and the
  * arrays_zip/inline generator pair.
  */
object Insights {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // Grouped OLS (y = extendedprice on x = quantity per returnflag):
    // one aggregation, five exact-decimal power/cross sums, closed-form
    // algebra in doubles — the moments (q119) discipline applied to
    // regression. Null guards: slope/intercept null on constant x,
    // R² additionally on constant y.
    Q(
      "q142_grouped_ols",
      (s, dir) => {
        import s.implicits._
        Profile.groupedOls(t(s, dir, "lineitem"),
            Seq("l_returnflag"), $"l_quantity", $"l_extendedprice")
          .orderBy($"l_returnflag")
      },
      Some(s"""
        WITH sums AS (
          SELECT l_returnflag,
                 CAST(COUNT(l_quantity * l_extendedprice) AS DOUBLE) AS n,
                 ${OracleSql.dsum("l_quantity")} AS sx,
                 ${OracleSql.dsum("l_extendedprice")} AS sy,
                 ${OracleSql.dsum("l_quantity * l_quantity")} AS sxx,
                 ${OracleSql.dsum("l_quantity * l_extendedprice")} AS sxy,
                 ${OracleSql.dsum("l_extendedprice * l_extendedprice")} AS syy
          FROM lineitem GROUP BY l_returnflag),
        alg AS (
          SELECT l_returnflag, n,
                 n * sxy - sx * sy AS covn,
                 n * sxx - sx * sx AS varxn,
                 n * syy - sy * sy AS varyn,
                 sx, sy
          FROM sums)
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n_obs,
               CASE WHEN varxn > 0 THEN covn / varxn END AS slope,
               CASE WHEN varxn > 0 THEN (sy - covn / varxn * sx) / n END AS intercept,
               CASE WHEN varxn > 0 AND varyn > 0
                    THEN (covn * covn) / (varxn * varyn) END AS r2
        FROM alg ORDER BY l_returnflag
      """)),
    // ----------------------------------------------------------------
    // Grouped mode with a DETERMINISTIC tie-break (max count, then
    // smallest value) — Spark's native `mode` aggregate is explicitly
    // nondeterministic on ties, so the portable form is the count +
    // row_number pick: one keyed aggregation, one window over
    // group-count-sized input, never a corpus shuffle.
    Q(
      "q143_grouped_mode",
      (s, dir) => {
        import s.implicits._
        val cnts = t(s, dir, "events")
          .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy($"user_id").orderBy($"cnt".desc, $"event_type")
        cnts.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
          .select($"user_id", $"event_type".as("mode_event"), $"cnt".as("mode_count"))
          .orderBy($"user_id")
      },
      Some("""
        SELECT user_id, event_type AS mode_event, cnt AS mode_count FROM (
          SELECT user_id, event_type, COUNT(*) AS cnt,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY COUNT(*) DESC, event_type) AS rn
          FROM events GROUP BY user_id, event_type)
        WHERE rn = 1 ORDER BY user_id
      """)),
    // ----------------------------------------------------------------
    // Bitwise aggregates — AND/OR/XOR rollups of a flag word per group
    // (permission masks, feature-bit unions, parity checks). Exact
    // integer semantics, map-side partial aggregation like any sum.
    Q(
      "q144_bitwise_agg",
      (s, dir) => {
        import s.implicits._
        val flags = ($"event_id" % 65536L).cast("long")
        t(s, dir, "events").groupBy($"event_type")
          .agg(bit_and(flags).as("flags_and"),
            bit_or(flags).as("flags_or"),
            bit_xor(flags).as("flags_xor"))
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type,
               BIT_AND(CAST(event_id % 65536 AS BIGINT)) AS flags_and,
               BIT_OR(CAST(event_id % 65536 AS BIGINT)) AS flags_or,
               BIT_XOR(CAST(event_id % 65536 AS BIGINT)) AS flags_xor
        FROM events GROUP BY event_type ORDER BY event_type
      """)),
    // ----------------------------------------------------------------
    // Ordered listagg / string_agg: the deterministic form is
    // array_sort(collect_list) → array_join — partition order never
    // leaks into the result, which is what makes a listagg
    // hash-checkable at all (Spark's listagg without WITHIN GROUP
    // inherits arrival order). Per-group state is the group's values:
    // cap group size upstream at 100 TB (q77's per-source caps).
    Q(
      "q145_listagg",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "region")
          .join(t(s, dir, "nation"), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name")
          .agg(array_join(array_sort(collect_list($"n_name")), "|").as("nations"),
            count(lit(1)).as("n_nations"))
          .orderBy($"r_name")
      },
      Some("""
        SELECT r.r_name,
               string_agg(n.n_name, '|' ORDER BY n.n_name) AS nations,
               COUNT(*) AS n_nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
      """)),
    // ----------------------------------------------------------------
    // Association rules over (user, day) baskets of event types:
    // support / confidence / lift at the 2-itemset level. Baskets
    // above maxBasketSize are excluded entirely (the hub-key rule —
    // none are at size 32 over 5 event types, and the oracle replays
    // the same filter so the contract itself is under test).
    Q(
      "q146_assoc_rules",
      (s, dir) => {
        import s.implicits._
        Assoc.associationRules(t(s, dir, "events"),
            concat_ws("|", $"user_id", to_date($"ts")), $"event_type",
            maxBasketSize = 32)
          .orderBy($"ante", $"cons")
      },
      Some("""
        WITH b AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
                   FROM events),
        deg AS (SELECT user_id, d FROM b GROUP BY user_id, d
                HAVING COUNT(*) <= 32),
        kept AS (SELECT b.* FROM b JOIN deg USING (user_id, d)),
        tot AS (SELECT COUNT(*) AS nb FROM deg),
        sup AS (SELECT event_type, COUNT(*) AS cnt FROM kept GROUP BY event_type),
        pairs AS (
          SELECT a.event_type AS ante, c.event_type AS cons, COUNT(*) AS n_both
          FROM kept a JOIN kept c
            ON a.user_id = c.user_id AND a.d = c.d AND a.event_type < c.event_type
          GROUP BY 1, 2)
        SELECT p.ante, p.cons, p.n_both,
               CAST(p.n_both AS DOUBLE) / CAST(sa.cnt AS DOUBLE) AS confidence,
               CAST(p.n_both AS DOUBLE) * CAST(t.nb AS DOUBLE) /
                 (CAST(sa.cnt AS DOUBLE) * CAST(sc.cnt AS DOUBLE)) AS lift
        FROM pairs p
        JOIN sup sa ON sa.event_type = p.ante
        JOIN sup sc ON sc.event_type = p.cons
        CROSS JOIN tot t
        ORDER BY p.ante, p.cons
      """)),
    // ----------------------------------------------------------------
    // Triangle census of the co-purchase graph (parts sharing an
    // order, restricted to three brands so the wedge space stays
    // bench-sized — the full-catalog graph at sf0.1 has 148M wedges).
    // Edges via bipartiteProject, census via degree-oriented wedge
    // enumeration; the oracle replays the whole composition including
    // the orientation rule.
    Q(
      "q147_triangles",
      (s, dir) => {
        import s.implicits._
        val pk = t(s, dir, "part")
          .filter($"p_brand".isin("Brand#1", "Brand#2", "Brand#3"))
          .select($"p_partkey")
        val ip = t(s, dir, "lineitem")
          .join(pk, $"l_partkey" === $"p_partkey")
          .select($"l_orderkey", $"l_partkey")
        val edges = Graph.bipartiteProject(ip, "l_orderkey", "l_partkey",
          maxDegree = 64)
        Graph.triangleCount(edges, "a", "b")
      },
      Some("""
        WITH ip AS (
          SELECT DISTINCT l_orderkey, l_partkey
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')),
        deg0 AS (SELECT l_orderkey FROM ip GROUP BY l_orderkey
                 HAVING COUNT(*) <= 64),
        kept AS (SELECT ip.* FROM ip JOIN deg0 USING (l_orderkey)),
        edges AS (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM kept a JOIN kept b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2),
        deg AS (SELECT id, COUNT(*) AS d FROM (
                  SELECT u AS id FROM edges UNION ALL SELECT v FROM edges)
                GROUP BY 1),
        oriented AS (
          SELECT CASE WHEN du.d <= dv.d THEN e.u ELSE e.v END AS s,
                 CASE WHEN du.d <= dv.d THEN e.v ELSE e.u END AS t
          FROM edges e JOIN deg du ON du.id = e.u JOIN deg dv ON dv.id = e.v),
        tri AS (
          SELECT COUNT(*) AS n_triangles
          FROM (SELECT o1.t AS b, o2.t AS c
                FROM oriented o1 JOIN oriented o2 ON o1.s = o2.s AND o1.t < o2.t) w
          JOIN edges e ON e.u = LEAST(w.b, w.c) AND e.v = GREATEST(w.b, w.c))
        SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
               (SELECT COUNT(*) FROM edges) AS n_edges,
               (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
               (SELECT n_triangles FROM tri) AS n_triangles,
               CASE WHEN (SELECT SUM(d * (d - 1) // 2) FROM deg) > 0 THEN
                 (3.0 * CAST((SELECT n_triangles FROM tri) AS DOUBLE)) /
                   CAST((SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg) AS DOUBLE)
               END AS global_cc
      """)),
    // ----------------------------------------------------------------
    // Token-diversity curation signals: Simpson concentration, top-
    // token share, type-token ratio — the log-free entropy family
    // (ratios of exact longs, hash-stable across engines). Docs with
    // no tokens are absent by the no-evidence contract.
    Q(
      "q148_token_diversity",
      (s, dir) => {
        import s.implicits._
        TextAnalysis.tokenDiversity(t(s, dir, "documents"), $"doc_id", lower($"text"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, unnest(${OracleSql.tokens("lower(text)")}) AS tok
          FROM documents),
        cnts AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2)
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(c * c) AS DOUBLE) /
                 CAST(SUM(c) * SUM(c) AS DOUBLE) AS concentration,
               CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_frac,
               CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS ttr
        FROM cnts GROUP BY doc_id ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Correlated LATERAL top-k — "each customer's 2 biggest orders"
    // via Dataset.lateralJoin with a correlated ORDER BY ... LIMIT
    // subquery (the SQL:2016 LATERAL surface; Catalyst decorrelates
    // it to a keyed window, so the plan is one shuffle, not a
    // per-customer loop).
    Q(
      "q149_lateral_topk",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
          .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
        val inner = t(s, dir, "orders")
          .where($"o_custkey" === $"c_custkey".outer())
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(2)
          .select($"o_orderkey", $"o_totalprice")
        c.lateralJoin(inner).orderBy($"c_custkey", $"o_orderkey")
      },
      Some("""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_mktsegment = 'BUILDING'
        ORDER BY c.c_custkey, o.o_orderkey
      """)),
    // ----------------------------------------------------------------
    // arrays_zip + inline: zip an array with its 1-based index into an
    // array of structs and explode the structs into columns — the
    // generator pair q122 (posexplode) and q138 (explode_outer) don't
    // touch. Scan-stage only; the filter keeps output sparse.
    Q(
      "q150_zip_inline",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "embeddings")
          .select($"vec_id", inline(arrays_zip(
            sequence(lit(1), size($"embedding")).as("idx"),
            transform($"embedding", x => x.cast("double")).as("val"))))
          .filter($"val" > 0.3)
          .orderBy($"vec_id", $"idx")
      },
      Some("""
        SELECT vec_id, CAST(i AS INT) AS idx, CAST(embedding[i] AS DOUBLE) AS val
        FROM embeddings, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i)
        WHERE CAST(embedding[i] AS DOUBLE) > 0.3
        ORDER BY vec_id, idx
      """)),
    // ----------------------------------------------------------------
    // Multiset set ops — EXCEPT ALL / INTERSECT ALL keep duplicate
    // multiplicity (q14-q17 cover the DISTINCT forms). Spark plans
    // both as a count-aggregate + generate, one keyed shuffle each —
    // never a join on the raw multiset.
    Q(
      "q151_set_ops_all",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val a = li.filter($"l_quantity" > 10).select($"l_partkey", $"l_suppkey")
        val b = li.filter($"l_returnflag" === "R").select($"l_partkey", $"l_suppkey")
        a.exceptAll(b).select(lit("except").as("op"), $"l_partkey", $"l_suppkey")
          .unionAll(a.intersectAll(b)
            .select(lit("intersect").as("op"), $"l_partkey", $"l_suppkey"))
          .orderBy($"op", $"l_partkey", $"l_suppkey")
      },
      Some("""
        SELECT 'except' AS op, l_partkey, l_suppkey FROM (
          SELECT l_partkey, l_suppkey FROM lineitem WHERE l_quantity > 10
          EXCEPT ALL
          SELECT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
        UNION ALL
        SELECT 'intersect' AS op, l_partkey, l_suppkey FROM (
          SELECT l_partkey, l_suppkey FROM lineitem WHERE l_quantity > 10
          INTERSECT ALL
          SELECT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
        ORDER BY op, l_partkey, l_suppkey
      """)),
    // ----------------------------------------------------------------
    // Last-touch attribution: purchases credited to the most recent
    // preceding non-purchase event of the same user within 7 days,
    // else "direct". One user-keyed window pass (ROWS to 1 PRECEDING,
    // event_id tiebreak), channel-cardinality aggregate.
    Q(
      "q152_attribution",
      (s, dir) => {
        import s.implicits._
        Funnel.lastTouchAttribution(t(s, dir, "events"),
            $"user_id", $"ts", $"event_type", $"value",
            conversion = "purchase", tieBreak = $"event_id", lookbackDays = 7)
          .orderBy($"touch")
      },
      Some(s"""
        WITH touched AS (
          SELECT event_type, ts, value,
                 last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                   IGNORE NULLS) OVER w AS touch_type,
                 last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                   IGNORE NULLS) OVER w AS touch_ts
          FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        SELECT COALESCE(CASE WHEN touch_ts >= ts - INTERVAL 7 DAY THEN touch_type END,
                        'direct') AS touch,
               COUNT(*) AS conversions,
               ${OracleSql.dsum("value")} AS value_sum
        FROM touched WHERE event_type = 'purchase'
        GROUP BY 1 ORDER BY 1
      """)),
    // ----------------------------------------------------------------
    // Hop-bounded multi-source BFS over the q147 co-purchase graph:
    // min distance <= 3 hops from the 5 smallest part nodes. The
    // frontier, not the graph, bounds each round's two keyed shuffles;
    // the DuckDB oracle replays it as a depth-bounded recursive CTE.
    Q(
      "q153_bfs_khop",
      (s, dir) => {
        import s.implicits._
        val pk = t(s, dir, "part")
          .filter($"p_brand".isin("Brand#1", "Brand#2", "Brand#3"))
          .select($"p_partkey")
        val ip = t(s, dir, "lineitem")
          .join(pk, $"l_partkey" === $"p_partkey")
          .select($"l_orderkey", $"l_partkey")
        val edges = Graph.bipartiteProject(ip, "l_orderkey", "l_partkey",
          maxDegree = 64)
        val seeds = edges.select(least($"a", $"b").as("id"))
          .unionAll(edges.select(greatest($"a", $"b").as("id")))
          .distinct().orderBy($"id").limit(5)
        Graph.bfsDistances(edges, "a", "b", seeds, "id", maxHops = 3)
          .orderBy($"id")
      },
      Some("""
        WITH ip AS (
          SELECT DISTINCT l_orderkey, l_partkey
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')),
        deg0 AS (SELECT l_orderkey FROM ip GROUP BY l_orderkey
                 HAVING COUNT(*) <= 64),
        kept AS (SELECT ip.* FROM ip JOIN deg0 USING (l_orderkey)),
        edges AS (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM kept a JOIN kept b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2),
        bidir AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
        seeds AS (SELECT DISTINCT u AS id FROM bidir ORDER BY id LIMIT 5),
        bfs AS (
          WITH RECURSIVE r(node, d) AS (
            SELECT id, 0 FROM seeds
            UNION
            SELECT b.v, r.d + 1 FROM r JOIN bidir b ON b.u = r.node WHERE r.d < 3)
          SELECT node, MIN(d) AS dist FROM r GROUP BY node)
        SELECT node AS id, CAST(dist AS INT) AS dist FROM bfs ORDER BY id
      """)),
    // ----------------------------------------------------------------
    // Chi-square independence of event_type x day-of-week + Cramér's V,
    // via the zero-cell-exact identity chi2 = n·Σ o²/(rᵢ·cⱼ) − n.
    // Exact cell counts, decimal-exact term sum, IEEE sqrt — the whole
    // statistic is hash-stable. DuckDB's dayofweek is 0-6 vs Spark's
    // 1-7, aligned explicitly in the oracle.
    Q(
      "q154_chi_square",
      (s, dir) => {
        import s.implicits._
        Profile.chiSquare(t(s, dir, "events"), $"event_type", dayofweek($"ts"))
      },
      Some("""
        WITH o AS (SELECT event_type AS r, dayofweek(ts) + 1 AS c, COUNT(*) AS o
                   FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
                   GROUP BY 1, 2),
        tot AS (SELECT CAST(SUM(o) AS DOUBLE) AS n,
                       CAST(COUNT(DISTINCT r) AS BIGINT) AS nr,
                       CAST(COUNT(DISTINCT c) AS BIGINT) AS nc FROM o),
        chi AS (
          SELECT tot.n * CAST(CAST(SUM(CAST(
                   CAST(o.o AS DOUBLE) * CAST(o.o AS DOUBLE) / (rt.rsum * ct.csum)
                 AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) - tot.n AS chi2
          FROM o
          JOIN (SELECT r, CAST(SUM(o) AS DOUBLE) AS rsum FROM o GROUP BY 1) rt USING (r)
          JOIN (SELECT c, CAST(SUM(o) AS DOUBLE) AS csum FROM o GROUP BY 1) ct USING (c)
          CROSS JOIN tot GROUP BY tot.n)
        SELECT CAST(tot.n AS BIGINT) AS n_obs, tot.nr AS n_rows, tot.nc AS n_cols,
               chi.chi2 AS chi2,
               CASE WHEN LEAST(tot.nr, tot.nc) > 1 THEN
                 sqrt(chi.chi2 / (tot.n * CAST(LEAST(tot.nr - 1, tot.nc - 1) AS DOUBLE)))
               END AS cramers_v
        FROM tot CROSS JOIN chi
      """)),
    // ----------------------------------------------------------------
    // Reciprocal-rank fusion of two part rankings (total quantity vs
    // total revenue): ranks over exact decimal sums, per-list terms
    // 1/(60+rank), decimal-exact cross-list sum. Top 100 fused.
    Q(
      "q155_rrf_fusion",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.types.DecimalType
        val dec = DecimalType(38, 10)
        val li = t(s, dir, "lineitem")
        val byQty = li.groupBy($"l_partkey")
          .agg(sum($"l_quantity".cast(dec)).as("s")).select($"l_partkey", $"s")
        val byRev = li.groupBy($"l_partkey")
          .agg(sum($"l_extendedprice".cast(dec)).as("s")).select($"l_partkey", $"s")
        Retrieval.rrfFuse(Seq(byQty, byRev), c = 60)
          .withColumnRenamed("id", "l_partkey")
          .orderBy($"rrf".desc, $"l_partkey").limit(100)
      },
      Some("""
        WITH m AS (
          SELECT l_partkey,
                 SUM(CAST(l_quantity AS DECIMAL(38,10))) AS qty_s,
                 SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS rev_s
          FROM lineitem GROUP BY 1),
        r AS (
          SELECT l_partkey,
                 RANK() OVER (ORDER BY qty_s DESC, l_partkey) AS r1,
                 RANK() OVER (ORDER BY rev_s DESC, l_partkey) AS r2
          FROM m)
        SELECT l_partkey, CAST(2 AS BIGINT) AS n_lists,
               CAST(LEAST(r1, r2) AS INT) AS best_rank,
               CAST(CAST(CAST(1.0 / (60 + CAST(r1 AS DOUBLE)) AS DECIMAL(38,10)) +
                         CAST(1.0 / (60 + CAST(r2 AS DOUBLE)) AS DECIMAL(38,10))
                    AS VARCHAR) AS DOUBLE) AS rrf
        FROM r ORDER BY rrf DESC, l_partkey LIMIT 100
      """)),
    // ----------------------------------------------------------------
    // Equi-width histogram of l_extendedprice, 20 bins over the global
    // [min, max] (1-row broadcast bounds, scan-stage binning) — the
    // equi-DEPTH complement is q106.
    Q(
      "q156_histogram",
      (s, dir) => {
        import s.implicits._
        Profile.equiWidthHistogram(t(s, dir, "lineitem"), $"l_extendedprice", 20)
          .orderBy($"bin")
      },
      Some(s"""
        WITH b AS (SELECT CAST(MIN(l_extendedprice) AS DOUBLE) AS lo,
                          CAST(MAX(l_extendedprice) AS DOUBLE) AS hi FROM lineitem)
        SELECT CAST(CASE WHEN b.hi > b.lo THEN
                 LEAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - b.lo) /
                             ((b.hi - b.lo) / 20)), 19)
               ELSE 0 END AS INT) AS bin,
               COUNT(*) AS n,
               ${OracleSql.dsum("CAST(l_extendedprice AS DOUBLE)")} AS sum_value
        FROM lineitem CROSS JOIN b
        WHERE l_extendedprice IS NOT NULL
        GROUP BY 1 ORDER BY 1
      """)),
    // ----------------------------------------------------------------
    // BPE-style adjacent token-pair counts, top 50 — the counting step
    // a tokenizer trainer iterates. Scan-stage zip_with pair
    // extraction, (a, b)-keyed count, fully-tiebroken top-k.
    Q(
      "q157_bpe_pairs",
      (s, dir) => {
        import s.implicits._
        TextAnalysis.bpePairCounts(t(s, dir, "documents"), $"text", topK = 50)
      },
      Some(s"""
        WITH toks AS (
          SELECT ${OracleSql.tokens("text")} AS t
          FROM documents WHERE text IS NOT NULL),
        pairs AS (
          SELECT t[i] AS a, t[i+1] AS b
          FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
          WHERE len(t) >= 2)
        SELECT a, b, COUNT(*) AS n FROM pairs GROUP BY 1, 2
        ORDER BY n DESC, a, b LIMIT 50
      """)),
    // ----------------------------------------------------------------
    // Trailing 7-day distinct active users per day: distinct
    // (day, user) first, bounded 7-day Generate fanout, per-day
    // distinct count — never a range self-join over raw events.
    Q(
      "q158_sliding_distinct",
      (s, dir) => {
        import s.implicits._
        TimeSeries.slidingDistinct(t(s, dir, "events"), $"ts", $"user_id", windowDays = 7)
          .orderBy($"day")
      },
      Some("""
        WITH du AS (
          SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
          WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        fan AS (
          SELECT d + CAST(o AS INTEGER) AS day, user_id
          FROM du, LATERAL (SELECT unnest(range(0, 7)) AS o)),
        span AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM du)
        SELECT day, COUNT(DISTINCT user_id) AS active_entities
        FROM fan, span WHERE day BETWEEN lo AND hi
        GROUP BY day ORDER BY day
      """)),
    // ----------------------------------------------------------------
    // Term-distribution drift between two corpus slices: total
    // variation distance over the union vocabulary — log-free, so
    // hash-exact (the text twin of q112's numeric bin drift).
    Q(
      "q159_term_drift",
      (s, dir) => {
        import s.implicits._
        TextAnalysis.termDrift(t(s, dir, "documents"), $"text", $"source", "src0", "src1")
      },
      Some(s"""
        WITH toks AS (
          SELECT source, unnest(${OracleSql.tokens("text")}) AS tok
          FROM documents WHERE text IS NOT NULL AND source IN ('src0', 'src1')),
        cnt AS (SELECT source, tok, COUNT(*) AS n FROM toks GROUP BY 1, 2),
        tot AS (SELECT source, SUM(n) AS t FROM cnt GROUP BY 1),
        nm AS (SELECT tok,
                 COALESCE(MAX(CASE WHEN source = 'src0' THEN n END), 0) AS na,
                 COALESCE(MAX(CASE WHEN source = 'src1' THEN n END), 0) AS nb
               FROM cnt GROUP BY tok),
        tt AS (SELECT MAX(CASE WHEN source = 'src0' THEN t END) AS ta,
                      MAX(CASE WHEN source = 'src1' THEN t END) AS tb FROM tot)
        SELECT CAST(CAST(s AS VARCHAR) AS DOUBLE)
                 / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)) / 2 AS tv_distance,
               n_terms
        FROM (SELECT SUM(abs(CAST(na AS DECIMAL(18,0)) * CAST(tb AS DECIMAL(18,0)) -
                             CAST(nb AS DECIMAL(18,0)) * CAST(ta AS DECIMAL(18,0)))) AS s,
                     COUNT(*) AS n_terms, MAX(ta) AS ta, MAX(tb) AS tb
              FROM nm CROSS JOIN tt)
      """)),
    // ----------------------------------------------------------------
    // Gini concentration of line revenue per return flag — the
    // bounded skew meter (rank formulation, tie-invariant, exact
    // decimal sums).
    Q(
      "q160_gini",
      (s, dir) => {
        import s.implicits._
        Profile.giniConcentration(t(s, dir, "lineitem"), $"l_returnflag", $"l_extendedprice")
          .orderBy($"grp")
      },
      Some("""
        WITH v AS (SELECT l_returnflag AS grp, CAST(l_extendedprice AS DOUBLE) AS x
                   FROM lineitem
                   WHERE l_extendedprice IS NOT NULL AND l_extendedprice >= 0
                     AND l_returnflag IS NOT NULL),
        rk AS (SELECT grp, x,
                      CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x) AS DOUBLE) AS i
               FROM v),
        agg AS (SELECT grp, COUNT(*) AS n,
                CAST(CAST(SUM(CAST(x AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sx,
                CAST(CAST(SUM(CAST(i * x AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS six
                FROM rk GROUP BY grp)
        SELECT grp, n,
               CASE WHEN sx > 0 THEN
                 2.0 * six / (CAST(n AS DOUBLE) * sx)
                   - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)
               END AS gini
        FROM agg ORDER BY grp
      """)),
    // ----------------------------------------------------------------
    // Exact weighted median of price weighted by quantity per return
    // flag — decimal cumulative weights, exact decimal threshold
    // compare (no float boundary flip).
    Q(
      "q161_weighted_median",
      (s, dir) => {
        import s.implicits._
        Profile.weightedMedian(t(s, dir, "lineitem"),
            $"l_returnflag", $"l_extendedprice", $"l_quantity")
          .orderBy($"grp")
      },
      Some("""
        WITH v AS (SELECT l_returnflag AS grp, CAST(l_extendedprice AS DOUBLE) AS x,
                          CAST(l_quantity AS DECIMAL(38,10)) AS w
                   FROM lineitem
                   WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
                     AND l_quantity > 0 AND l_returnflag IS NOT NULL),
        cum AS (SELECT grp, x,
                SUM(w) OVER (PARTITION BY grp ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
                SUM(w) OVER (PARTITION BY grp) AS tw
                FROM v)
        SELECT grp, MIN(x) AS wmedian FROM cum WHERE cw * 2 >= tw
        GROUP BY grp ORDER BY grp
      """)),
    // ----------------------------------------------------------------
    // Functional-dependency profile over three candidate dependencies
    // — keys, violations, strength per pair; each pair one keyed
    // countDistinct aggregate.
    Q(
      "q162_fd_profile",
      (s, dir) => {
        import s.implicits._
        Profile.fdProfile(t(s, dir, "lineitem"),
            Seq("l_orderkey" -> "l_returnflag",
                "l_orderkey" -> "l_linestatus",
                "l_partkey" -> "l_suppkey"))
          .orderBy($"fd")
      },
      Some(Seq(
        ("l_orderkey", "l_returnflag"),
        ("l_orderkey", "l_linestatus"),
        ("l_partkey", "l_suppkey")).map { case (det, dep) => s"""
        SELECT '$det->$dep' AS fd, COUNT(*) AS n_keys,
               CAST(COALESCE(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
                 AS n_violations,
               CASE WHEN COUNT(*) > 0 THEN
                 1.0 - CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE) END AS strength
        FROM (SELECT $det, COUNT(DISTINCT $dep) AS nd FROM lineitem
              WHERE $det IS NOT NULL AND $dep IS NOT NULL GROUP BY $det)"""
      }.mkString("", " UNION ALL ", " ORDER BY fd"))),
    // ----------------------------------------------------------------
    // 4-core of the q153-style co-purchase graph: iterative peel to
    // the densely-connected backbone, surviving nodes with their
    // in-core degree. The oracle unrolls the peel as materialized
    // CTE rounds (12 >= the peel's convergence depth here; the Spark
    // side stops at the fixpoint, which the extra oracle rounds leave
    // unchanged).
    Q(
      "q163_kcore",
      (s, dir) => {
        import s.implicits._
        val pk = t(s, dir, "part")
          .filter($"p_brand".isin("Brand#1", "Brand#2"))
          .select($"p_partkey")
        val ip = t(s, dir, "lineitem")
          .join(pk, $"l_partkey" === $"p_partkey")
          .select($"l_orderkey", $"l_partkey")
        val edges = Graph.bipartiteProject(ip, "l_orderkey", "l_partkey", maxDegree = 64)
        Graph.kCore(edges, "a", "b", k = 4, maxRounds = 20)
          .orderBy($"node")
      },
      Some {
        val rounds = (1 to 12).map(i => s""",
        a$i AS MATERIALIZED (
          SELECT e.u AS node FROM bidir e
          JOIN a${i - 1} pu ON pu.node = e.u
          JOIN a${i - 1} pv ON pv.node = e.v
          GROUP BY e.u HAVING COUNT(*) >= 4)""").mkString
        s"""
        WITH ip AS MATERIALIZED (
          SELECT DISTINCT l_orderkey, l_partkey
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_brand IN ('Brand#1', 'Brand#2')),
        deg0 AS (SELECT l_orderkey FROM ip GROUP BY l_orderkey
                 HAVING COUNT(*) <= 64),
        kept AS MATERIALIZED (SELECT ip.* FROM ip JOIN deg0 USING (l_orderkey)),
        edges AS MATERIALIZED (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM kept a JOIN kept b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2),
        bidir AS MATERIALIZED (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
        a0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM bidir)$rounds
        SELECT e.u AS node, COUNT(*) AS core_degree
        FROM bidir e
        JOIN a12 pu ON pu.node = e.u
        JOIN a12 pv ON pv.node = e.v
        GROUP BY e.u ORDER BY e.u
      """
      }),
    // ----------------------------------------------------------------
    // Benford first-digit profile of line amounts — integer-part digit
    // (format-stable), shared literal expectations, 9-row aggregate.
    Q(
      "q164_benford",
      (s, dir) => {
        import s.implicits._
        Profile.benfordProfile(t(s, dir, "lineitem"), $"l_extendedprice")
          .orderBy($"fsd")
      },
      Some {
        val expect = (1 to 9).map(i =>
          s"WHEN fsd = $i THEN CAST('${math.log10(1.0 + 1.0 / i)}' AS DOUBLE)").mkString(" ")
        s"""
        WITH d AS (
          SELECT CAST(substr(CAST(CAST(FLOOR(CAST(l_extendedprice AS DOUBLE)) AS BIGINT)
                   AS VARCHAR), 1, 1) AS INTEGER) AS fsd
          FROM lineitem
          WHERE l_extendedprice IS NOT NULL AND CAST(l_extendedprice AS DOUBLE) >= 1),
        tot AS (SELECT COUNT(*) AS t FROM d),
        g AS (SELECT fsd, COUNT(*) AS n, CAST(MAX(t) AS BIGINT) AS t
              FROM d CROSS JOIN tot GROUP BY fsd)
        SELECT fsd, n, frac, expected, frac - expected AS dev
        FROM (SELECT fsd, n, CAST(n AS DOUBLE) / CAST(t AS DOUBLE) AS frac,
                     CASE $expect END AS expected
              FROM g)
        ORDER BY fsd
      """
      }),
    // ----------------------------------------------------------------
    // Positional inverted index for a 3-term probe — postings with
    // 1-based positions and tf, scan-stage IN-set filter before the
    // shuffle.
    Q(
      "q165_positional_index",
      (s, dir) => {
        import s.implicits._
        Retrieval.positionalIndex(t(s, dir, "documents"), $"doc_id", $"text",
            Seq("data", "model", "table"))
          // The driver's oracle compare hashes via pandas, which cannot
          // factorize array cells — serialize the posting list to a
          // canonical comma-joined string (same info, hashable).
          .withColumn("positions", concat_ws(",", $"positions".cast("array<string>")))
          .orderBy($"term", $"doc_id")
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, ${OracleSql.tokens("text")} AS t
          FROM documents WHERE text IS NOT NULL),
        pos AS (
          SELECT doc_id, t[i] AS term, i
          FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i)
          WHERE t[i] IN ('data', 'model', 'table'))
        SELECT term, doc_id,
               string_agg(CAST(i AS VARCHAR), ',' ORDER BY i) AS positions,
               COUNT(*) AS tf
        FROM pos GROUP BY term, doc_id ORDER BY term, doc_id
      """)),
    // ----------------------------------------------------------------
    // Pareto frontier of (min price, total quantity) per part — per-x
    // keyed aggregate, then one running-max pass over the distinct-x
    // relation.
    Q(
      "q166_skyline",
      (s, dir) => {
        import s.implicits._
        val pts = t(s, dir, "lineitem")
          .groupBy($"l_partkey")
          .agg(min($"l_extendedprice").as("x"), sum($"l_quantity".cast("long")).as("y"))
        Profile.paretoFront(pts, $"x", $"y").orderBy($"x")
      },
      Some("""
        WITH pts AS (
          SELECT l_partkey, CAST(MIN(l_extendedprice) AS DOUBLE) AS x,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y
          FROM lineitem GROUP BY l_partkey),
        gx AS (SELECT x, MAX(y) AS ymax FROM pts GROUP BY x),
        rm AS (SELECT x, ymax, MAX(ymax) OVER (ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax FROM gx)
        SELECT x, ymax AS y FROM rm WHERE prevmax IS NULL OR ymax > prevmax
        ORDER BY x
      """)),
    // ----------------------------------------------------------------
    // Time-decayed event value per type: daily half-life (exact
    // power-of-two weights), decayed vs plain sum side by side.
    Q(
      "q167_decayed_sum",
      (s, dir) => {
        import s.implicits._
        TimeSeries.decayedSum(t(s, dir, "events"), $"event_type", $"ts", $"value",
            halfLifeDays = 1, maxAgeDays = 50)
          .orderBy($"grp")
      },
      Some(s"""
        WITH rows_ AS (
          SELECT event_type AS grp, CAST(ts AS DATE) AS d, CAST(value AS DOUBLE) AS v
          FROM events
          WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL),
        mx AS (SELECT MAX(d) AS md FROM rows_),
        w AS (SELECT grp,
                CAST(round(v * pow(2.0, -FLOOR(CAST(date_diff('day', d, md) AS DOUBLE) / 1.0))
                           * 1000000.0) AS DECIMAL(38,0)) AS dvm,
                v
              FROM rows_ CROSS JOIN mx
              WHERE date_diff('day', d, md) <= 50)
        SELECT grp,
               CAST(SUM(dvm) AS DOUBLE) / 1000000.0 AS decayed_sum,
               ${OracleSql.dsum("v")} AS plain_sum,
               COUNT(*) AS n
        FROM w GROUP BY grp ORDER BY grp
      """)),
    // ----------------------------------------------------------------
    // Containment near-dup pairs — |A∩B|/|A| with A the smaller
    // shingle set: catches doc-inside-doc where Jaccard stays low.
    // Prefix-filtered on the contained side only, preflight-guarded.
    Q(
      "q168_containment",
      (s, dir) => {
        import s.implicits._
        graft.ext.Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
            shingleSize = 3, threshold = 0.8)
          .orderBy($"id_small", $"id_big")
      },
      Some(s"""
        WITH sh AS (SELECT doc_id, ${OracleSql.hashedShingles3("text")} AS shingles
                    FROM documents),
        post AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
        sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
        inter AS (
          SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS o
          FROM post a JOIN post b ON a.g = b.g AND a.doc_id <> b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT ia AS id_small, ib AS id_big, o, sa.n AS na
          FROM inter JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
          WHERE sb.n > sa.n OR (sb.n = sa.n AND ia < ib))
        SELECT id_small, id_big, CAST(o AS DOUBLE) / CAST(na AS DOUBLE) AS containment
        FROM pairs WHERE CAST(o AS DOUBLE) / CAST(na AS DOUBLE) >= 0.8
        ORDER BY id_small, id_big
      """)),
    // ----------------------------------------------------------------
    // Cohen's kappa between two threshold raters over lineitem —
    // chance-corrected agreement, exact-integer marginal products.
    Q(
      "q169_kappa",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
          .filter($"l_quantity".isNotNull && $"l_extendedprice".isNotNull)
        Profile.agreementKappa(li,
          when($"l_quantity" > 25, "high").otherwise("low"),
          when($"l_extendedprice" > 50000, "high").otherwise("low"))
      },
      Some("""
        WITH r AS (
          SELECT CASE WHEN l_quantity > 25 THEN 'high' ELSE 'low' END AS a,
                 CASE WHEN l_extendedprice > 50000 THEN 'high' ELSE 'low' END AS b
          FROM lineitem
          WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        base AS (SELECT COUNT(*) AS nn,
                        CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
                 FROM r),
        ra AS (SELECT a AS k, COUNT(*) AS rr FROM r GROUP BY a),
        cb AS (SELECT b AS k, COUNT(*) AS cc FROM r GROUP BY b),
        pe AS (SELECT CAST(CAST(SUM(CAST(COALESCE(rr, 0) AS DECIMAL(38,0)) *
                                    CAST(COALESCE(cc, 0) AS DECIMAL(38,0)))
                       AS VARCHAR) AS DOUBLE) AS rc,
                      COUNT(*) AS ncat
               FROM ra FULL OUTER JOIN cb USING (k))
        SELECT nn AS n_obs, ncat AS n_categories,
               CAST(agree AS DOUBLE) / CAST(nn AS DOUBLE) AS po,
               rc / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)) AS pe,
               CASE WHEN rc / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)) < 1.0 THEN
                 (CAST(agree AS DOUBLE) / CAST(nn AS DOUBLE)
                    - rc / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))
                 / (1.0 - rc / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))
               END AS kappa
        FROM base CROSS JOIN pe
      """)),
    // ----------------------------------------------------------------
    // Per-label embedding centroids, long format — exact decimal
    // component sums over one posexplode + keyed aggregate.
    Q(
      "q170_centroids",
      (s, dir) => {
        import s.implicits._
        graft.ext.Similarity.groupCentroids(t(s, dir, "embeddings"), $"label", $"embedding")
          .orderBy($"grp", $"dim")
      },
      Some(s"""
        WITH pos AS (
          SELECT label AS grp, CAST(i AS BIGINT) AS dim, CAST(embedding[i] AS DOUBLE) AS v
          FROM embeddings, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i)
          WHERE embedding IS NOT NULL AND label IS NOT NULL)
        SELECT grp, dim,
               CAST(SUM(CAST(round(v * 1.0E9) AS DECIMAL(38,0))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 1.0E9 AS centroid
        FROM pos GROUP BY grp, dim ORDER BY grp, dim
      """)),
    // ----------------------------------------------------------------
    // Item-item co-occurrence cosine (Ochiai) over order baskets —
    // capped pair generation + popularity normalization, top 100 by
    // score with full tiebreak.
    Q(
      "q171_cooccurrence",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem").select($"l_orderkey", $"l_partkey")
        Graph.cooccurrenceCosine(li, "l_orderkey", "l_partkey",
            maxDegree = 64, minCo = 2)
          .orderBy($"cos".desc, $"a", $"b").limit(100)
      },
      Some("""
        WITH e AS (SELECT DISTINCT l_orderkey AS l, l_partkey AS r FROM lineitem),
        deg AS (SELECT l FROM e GROUP BY l HAVING COUNT(*) <= 64),
        kept AS (SELECT e.* FROM e JOIN deg USING (l)),
        pairs AS (
          SELECT a.r AS a, b.r AS b, COUNT(*) AS co
          FROM kept a JOIN kept b ON a.l = b.l AND a.r < b.r
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        n AS (SELECT r AS item, COUNT(*) AS nn FROM kept GROUP BY r)
        SELECT a, b, co,
               CAST(co AS DOUBLE) / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)) AS cos
        FROM pairs JOIN n na ON na.item = a JOIN n nb ON nb.item = b
        ORDER BY cos DESC, a, b LIMIT 100
      """))
  )
}
