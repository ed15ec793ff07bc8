package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Graph, Profile, Retrieval, Sampling, TextHash, TimeSeries}
import Q._

/** Round-8 expansion batch: weighted graph distances, mergeable
  * cardinality sketches, token-budget mix assembly, and the privacy
  * audit — four operator families the catalog had adjacent machinery
  * for (BFS but unweighted, CMS but frequency-not-cardinality, row-
  * but not token-budget sampling, PII detection but no release gate)
  * and now closes.
  */
object Frontier {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Hop rounds for q206; the oracle unrolls exactly this many. */
  private val SsspHops = 4

  /** One full-relaxation min-plus round in DuckDB. Equivalent to the
    * Scala side's frontier (delta) form: dist after round r is the min
    * cost over paths of at most r edges either way (min is idempotent,
    * improvements propagate the round after they happen).
    */
  private def ssspRoundSql(r: Int): String =
    s"""d$r AS MATERIALIZED (
       |  SELECT id, MIN(dist) AS dist FROM (
       |    SELECT id, dist FROM d${r - 1}
       |    UNION ALL
       |    SELECT a.v AS id, d.dist + a.w AS dist
       |    FROM d${r - 1} d JOIN adj a ON a.u = d.id)
       |  GROUP BY id)""".stripMargin

  /** q207 sketch size and its 3σ relative-error envelope (ppm). The
    * bound literal is computed ONCE here and interpolated into the
    * oracle, so both engines compare against the identical integer.
    */
  private val KmvK = 32
  private val KmvBoundPpm = (3.0e6 / math.sqrt((KmvK - 2).toDouble)).toLong
  private val KmvSpace = 1L << 40

  /** q208 mixture spec: per-source weights cycle 1,2,3 across the 20
    * synthetic sources; budgets are floor-allocated from the total
    * ONCE here (the same arithmetic [[Sampling.budgetMixtureSample]]
    * applies) and the oracle's VALUES table carries the result, so a
    * rounding change can't silently fork the two sides.
    */
  private val MixWeights: Seq[(String, Long)] =
    (0 until 20).map(i => (s"src$i", (i % 3 + 1).toLong))
  private val MixBudget = 12000L
  private val MixBudgets: Seq[(String, Long)] = {
    val wsum = MixWeights.map(_._2).sum
    MixWeights.map { case (s, w) => (s, MixBudget * w / wsum) }
  }

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // Hop-bounded weighted shortest paths (Bellman–Ford with the
    // frontier optimization) over the supplier–part shipment graph:
    // node ids are disjoint (parts offset by 100000), parallel
    // shipments collapse to their cheapest quantity, seeds are the
    // three lowest suppliers, 4 hop rounds. The oracle unrolls the
    // four min-plus rounds in full-relaxation form — provably the
    // same per-round state the delta implementation reaches.
    Q(
      "q206_weighted_sssp",
      (s, dir) => {
        import s.implicits._
        val edges = t(s, dir, "lineitem")
          .select($"l_suppkey".as("u"), ($"l_partkey" + 100000L).as("v"),
            $"l_quantity".cast("long").as("w"))
        val seeds = t(s, dir, "supplier").filter($"s_suppkey" <= 3)
        Graph.weightedShortestPaths(edges, "u", "v", "w", seeds, "s_suppkey",
            maxHops = SsspHops)
          .orderBy($"node")
      },
      Some(s"""
        WITH e0 AS (
          SELECT l_suppkey AS u, l_partkey + 100000 AS v,
                 CAST(l_quantity AS BIGINT) AS w
          FROM lineitem),
        adj AS MATERIALIZED (
          SELECT u, v, MIN(w) AS w FROM (
            SELECT u, v, w FROM e0 UNION ALL SELECT v AS u, u AS v, w FROM e0)
          GROUP BY u, v),
        d0 AS (SELECT s_suppkey AS id, CAST(0 AS BIGINT) AS dist
               FROM supplier WHERE s_suppkey <= 3),
        ${(1 to SsspHops).map(ssspRoundSql).mkString(",\n")}
        SELECT id AS node, dist FROM d$SsspHops ORDER BY node
      """)),
    // ----------------------------------------------------------------
    // KMV distinct-count sketch per source over the token stream, with
    // the self-verifying envelope: exact distinct-hash count, the k-th
    // minimum hash, the (k-1)·2^40/h_k estimate, and a 3σ relative-
    // error verdict — all integers, so DuckDB rebuilds the sketch
    // value for value.
    Q(
      "q207_kmv_distinct",
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents").filter($"text".isNotNull)
          .select($"source", explode(TextHash.tokens($"text")).as("tok"))
        Retrieval.kmvDistinct(toks, $"source", $"tok", k = KmvK)
          .select(col("grp").as("source"), col("exact"), col("kth_hash"),
            col("est"), col("within_bound"))
          .orderBy($"source")
      },
      Some(s"""
        WITH toks AS (
          SELECT source, unnest(${OracleSql.tokens("text")}) AS tok
          FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
        h AS (
          SELECT DISTINCT source, ${OracleSql.hash64("tok")} % $KmvSpace AS h
          FROM toks),
        n AS (SELECT source, COUNT(*) AS exact FROM h GROUP BY 1),
        kth AS (
          SELECT source, h AS kth_hash FROM (
            SELECT source, h,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM h)
          WHERE rn = $KmvK),
        est AS (
          SELECT n.source, exact, kth_hash,
                 CASE WHEN exact <= $KmvK OR kth_hash IS NULL THEN exact
                      ELSE ${(KmvK - 1) * KmvSpace} // kth_hash END AS est
          FROM n LEFT JOIN kth USING (source))
        SELECT source, exact, kth_hash, est,
               abs(est - exact) * 1000000 <= $KmvBoundPpm * exact AS within_bound
        FROM est ORDER BY source
      """)),
    // ----------------------------------------------------------------
    // Token-budget mixture sampling: 20 sources weighted 1/2/3, a
    // 12000-token total budget floor-allocated by weight, and per
    // source the greedy hash-ordered document prefix whose running
    // token count fits. The oracle replays the same hash order and
    // integer window sum; budgets are shared literals.
    Q(
      "q208_budget_mixture",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents").filter($"text".isNotNull)
        Sampling.budgetMixtureSample(docs, $"doc_id", $"source",
            size(TextHash.tokens($"text")), MixWeights, MixBudget)
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH b(src, budget) AS (VALUES
          ${MixBudgets.map { case (s0, b) => s"('$s0', CAST($b AS BIGINT))" }
            .mkString(", ")}),
        d AS (
          SELECT doc_id, source,
                 CAST(len(${OracleSql.tokens("text")}) AS BIGINT) AS n_tokens,
                 ${OracleSql.hash64("CAST(doc_id AS VARCHAR)")} AS h
          FROM documents
          WHERE text IS NOT NULL AND doc_id IS NOT NULL AND source IS NOT NULL),
        c AS (
          SELECT doc_id, source, n_tokens,
                 CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
                 budget
          FROM d JOIN b ON source = src)
        SELECT doc_id, source, n_tokens, cum_tokens, budget
        FROM c WHERE cum_tokens <= budget ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // k-anonymity / l-diversity audit over customer: equivalence
    // classes = (nation, 1000-unit balance bucket), sensitive =
    // market segment, k=5, l=3. One hash aggregate; the oracle is the
    // same GROUP BY verbatim.
    Q(
      "q209_k_anonymity",
      (s, dir) => {
        import s.implicits._
        Profile.kAnonymityAudit(t(s, dir, "customer"),
            Seq($"c_nationkey",
              floor($"c_acctbal" / 1000.0).cast("long").as("bal_bucket")),
            $"c_mktsegment", k = 5, l = 3)
          .orderBy($"c_nationkey", $"bal_bucket")
      },
      Some("""
        SELECT c_nationkey,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
               COUNT(*) AS n,
               COUNT(DISTINCT c_mktsegment) AS n_sensitive,
               COUNT(*) >= 5 AS k_anonymous,
               COUNT(DISTINCT c_mktsegment) >= 3 AS l_diverse
        FROM customer
        GROUP BY 1, 2
        ORDER BY c_nationkey NULLS FIRST, bal_bucket NULLS FIRST
      """)),
    // ----------------------------------------------------------------
    // Quantile normalization of per-source doc lengths to the global
    // length distribution: integer percent-ranks within each source, a
    // 257-point exact interpolated global quantile table (the q83
    // quantile_cont parity contract at dyadic probe points), one array
    // lookup per row. Output values ARE global quantiles — no value
    // arithmetic to diverge on.
    Q(
      "q210_quantile_norm",
      (s, dir) => {
        import s.implicits._
        Profile.quantileNormalize(t(s, dir, "documents"),
            $"doc_id", $"source", $"n_chars", resolution = 256)
          .select(col("id").as("doc_id"), col("grp").as("source"),
            col("value").as("n_chars"), col("p_ppm"), col("norm_value"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH base AS (
          SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS value
          FROM documents
          WHERE doc_id IS NOT NULL AND source IS NOT NULL AND n_chars IS NOT NULL),
        ranked AS (
          SELECT doc_id, source, value,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY value, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY source) AS ns
          FROM base),
        e AS (
          SELECT quantile_cont(value,
            [${(0 to 256).map(i => (i / 256.0).toString).mkString(", ")}]) AS edges
          FROM base),
        p AS (
          SELECT doc_id, source, value,
                 CASE WHEN ns = 1 THEN 500000
                      ELSE (rn - 1) * 1000000 // (ns - 1) END AS p_ppm
          FROM ranked)
        SELECT doc_id, source, value AS n_chars, CAST(p_ppm AS BIGINT) AS p_ppm,
               edges[CAST(p_ppm * 256 // 1000000 AS INTEGER) + 1] AS norm_value
        FROM p CROSS JOIN e ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Rolling-median / MAD (Hampel-style) anomaly screen over each
    // user's event-value series: trailing-15 window, lower medians
    // (values from the data, never derived floats), 3×MAD flag with a
    // 5-point warm-up. The robust complement of q194's mean±3σ slots.
    Q(
      "q211_rolling_mad",
      (s, dir) => {
        import s.implicits._
        TimeSeries.rollingMedianMad(t(s, dir, "events"),
            $"user_id", $"ts", $"value", $"event_id", window = 15)
          .select(col("key").as("user_id"), tstr(col("ts")).as("ts"),
            col("tiebreak").as("event_id"), col("value"), col("n_win"),
            col("med"), col("mad"), col("is_anomaly"))
          .orderBy($"user_id", $"ts", $"event_id")
      },
      Some("""
        WITH base AS (
          SELECT user_id AS key, ts, event_id, CAST(value AS DOUBLE) AS value
          FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        l AS (
          SELECT key, ts, event_id, value,
                 list(value) OVER (PARTITION BY key ORDER BY ts, event_id
                   ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) AS arr
          FROM base),
        m AS (SELECT *, list_sort(arr) AS sa, len(arr) AS n FROM l),
        m2 AS (SELECT *, sa[(n + 1) // 2] AS med FROM m),
        m3 AS (SELECT *,
                 list_sort(list_transform(sa, x -> abs(x - med))) AS dv
               FROM m2)
        SELECT key AS user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_id,
               value, CAST(n AS BIGINT) AS n_win, med, dv[(n + 1) // 2] AS mad,
               (n >= 5 AND abs(value - med) > 3.0 * mad) AS is_anomaly
        FROM m3
        ORDER BY user_id, strftime(ts, '%Y-%m-%d %H:%M:%S'), event_id
      """)),
    // ----------------------------------------------------------------
    // Readability profile: Flesch Reading Ease in integer millipoints
    // from RE2-safe counts (vowel-group syllables, terminal-
    // punctuation sentences), plus the banded label. Scan-stage only.
    Q(
      "q212_readability",
      (s, dir) => {
        import s.implicits._
        graft.ext.TextAnalysis.readability(t(s, dir, "documents"),
            $"doc_id", $"text")
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH m AS (
          SELECT doc_id,
                 CAST(len(${OracleSql.tokens("text")}) AS BIGINT) AS n_words,
                 CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                   AS BIGINT) AS n_sents,
                 CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                   AS BIGINT) AS n_syll
          FROM documents WHERE text IS NOT NULL),
        f AS (
          SELECT doc_id, n_words, n_sents, n_syll,
                 CASE WHEN n_words > 0
                      THEN 206835 - (1015 * n_words // n_sents)
                                  - (84600 * n_syll // n_words) END AS fre_milli
          FROM m)
        SELECT doc_id, n_words, n_sents, n_syll, CAST(fre_milli AS BIGINT) AS fre_milli,
               CASE WHEN fre_milli IS NULL THEN NULL
                    WHEN fre_milli >= 90000 THEN 'very_easy'
                    WHEN fre_milli >= 70000 THEN 'easy'
                    WHEN fre_milli >= 50000 THEN 'standard'
                    WHEN fre_milli >= 30000 THEN 'difficult'
                    ELSE 'very_difficult' END AS band
        FROM f ORDER BY doc_id NULLS FIRST
      """)),
    // ----------------------------------------------------------------
    // Per-domain URL census with PLANTED links (the q198/q199 planting
    // pattern — the synthetic corpus has no URLs of its own): a
    // deterministic doc subset gets example.com / cdn.example.com /
    // data.example.org links appended, and the census must count
    // URLs, citing docs, and path depths exactly.
    Q(
      "q213_url_domains",
      (s, dir) => {
        import s.implicits._
        val planted = when($"doc_id" % 5 === 0,
            concat($"text",
              lit(" ref https://example.com/a/b/c and https://cdn.example.com/x.png")))
          .when($"doc_id" % 5 === 1,
            concat($"text", lit(" see http://data.example.org/d")))
          .when($"doc_id" % 5 === 2, concat($"text", lit(" home https://example.com/")))
          .otherwise($"text")
        val src = t(s, dir, "documents").filter($"text".isNotNull)
          .select($"doc_id", planted.as("text"))
        graft.ext.TextAnalysis.urlDomainProfile(src, $"doc_id", $"text")
          .orderBy($"domain")
      },
      Some(s"""
        WITH src AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0 THEN text ||
                        ' ref https://example.com/a/b/c and https://cdn.example.com/x.png'
                      WHEN doc_id % 5 = 1 THEN text || ' see http://data.example.org/d'
                      WHEN doc_id % 5 = 2 THEN text || ' home https://example.com/'
                      ELSE text END AS t
          FROM documents WHERE text IS NOT NULL),
        u AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(t, '${graft.ext.TextAnalysis.UrlPattern}'))
                   AS url
          FROM src),
        d AS (
          SELECT doc_id,
                 regexp_extract(url, '^https?://([^/]+)', 1) AS domain,
                 regexp_extract(url, '^https?://[^/]+(.*)$$', 1) AS path
          FROM u)
        SELECT domain, COUNT(*) AS n_urls, COUNT(DISTINCT doc_id) AS n_docs,
               CAST(SUM(len(path) - len(replace(path, '/', ''))) AS BIGINT)
                 AS total_path_depth
        FROM d WHERE domain <> '' GROUP BY 1 ORDER BY domain
      """)),
    // ----------------------------------------------------------------
    // Order-independent dataset fingerprint per order status: XOR of
    // md5 row hashes + count + hash extrema. The row rendering uses
    // only stable formats (longs, cent-scaled price, formatted
    // timestamp) — never raw double→string. The content-level upgrade
    // of the reference's count-only reconciliation.
    Q(
      "q214_dataset_fingerprint",
      (s, dir) => {
        import s.implicits._
        val repr = concat_ws("\u0001",
          $"o_orderkey".cast("string"),
          $"o_custkey".cast("string"),
          floor($"o_totalprice" * 100 + 0.5).cast("long").cast("string"),
          tstr($"o_orderdate"),
          $"o_orderpriority")
        Profile.datasetFingerprint(t(s, dir, "orders"), $"o_orderstatus", repr)
          .select(col("grp").as("o_orderstatus"), col("n_rows"), col("xor_fp"),
            col("min_hash"), col("max_hash"))
          .orderBy($"o_orderstatus")
      },
      Some(s"""
        WITH h AS (
          SELECT o_orderstatus,
                 ${OracleSql.hash64(
                   "concat_ws(chr(1), CAST(o_orderkey AS VARCHAR), " +
                   "CAST(o_custkey AS VARCHAR), " +
                   "CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), " +
                   "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), o_orderpriority)")}
                   AS h
          FROM orders)
        SELECT o_orderstatus, COUNT(*) AS n_rows,
               bit_xor(h) AS xor_fp, MIN(h) AS min_hash, MAX(h) AS max_hash
        FROM h GROUP BY 1 ORDER BY o_orderstatus
      """)),
    // ----------------------------------------------------------------
    // SAX symbolization of each user's event-value series: trailing
    // row index → 8-point segments → exact-decimal PAA means →
    // global-quartile symbols a–d (the q83 percentile parity
    // contract). Feeds motif counting and cheap series similarity.
    Q(
      "q216_sax_symbols",
      (s, dir) => {
        import s.implicits._
        TimeSeries.saxSymbols(t(s, dir, "events"),
            $"user_id", $"ts", $"value", $"event_id", segLen = 8)
          .select(col("key").as("user_id"), col("segment"), col("n_points"),
            col("paa"), col("symbol"))
          .orderBy($"user_id", $"segment")
      },
      Some("""
        WITH base AS (
          SELECT user_id AS key, ts, event_id, CAST(value AS DOUBLE) AS v
          FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        r AS (
          SELECT key, v,
                 (ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts, event_id) - 1)
                   // 8 AS segment
          FROM base),
        paa AS (
          SELECT key, segment, COUNT(*) AS n_points,
                 CAST(CAST(SUM(CAST(v AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
                   / COUNT(*) AS paa
          FROM r GROUP BY 1, 2),
        b AS (
          SELECT quantile_cont(paa, 0.25) AS b1, quantile_cont(paa, 0.5) AS b2,
                 quantile_cont(paa, 0.75) AS b3
          FROM paa)
        SELECT key AS user_id, segment, CAST(n_points AS BIGINT) AS n_points, paa,
               CASE WHEN paa <= b1 THEN 'a' WHEN paa <= b2 THEN 'b'
                    WHEN paa <= b3 THEN 'c' ELSE 'd' END AS symbol
        FROM paa CROSS JOIN b ORDER BY user_id, segment
      """)),
    // ----------------------------------------------------------------
    // Personalized PageRank from the three lowest suppliers over the
    // q123 customer↔supplier trade graph: restart mass on the seeds
    // only, 3 damped iterations of exact rank-unit integers. Ranks
    // measure proximity to the seed suppliers, not global centrality
    // — compare q123's uniform restart on the same graph.
    Q(
      "q217_personalized_pagerank",
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
        val seeds = t(s, dir, "supplier").filter($"s_suppkey" <= 3)
          .select(concat(lit("s"), $"s_suppkey".cast("string")).as("sid"))
        Graph.personalizedPageRank(edges, "src", "dst", seeds, "sid",
            iters = 3, rankUnit = 1000000000L)
          .orderBy($"node")
      },
      Some {
        def round(i: Int) = s"""
          i$i AS (
            SELECT e.dst AS node, CAST(SUM(r.r // deg.d) AS BIGINT) AS s
            FROM e JOIN r${i - 1} r ON e.src = r.node
                   JOIN deg ON e.src = deg.src
            GROUP BY e.dst),
          r$i AS (
            SELECT deg.src AS node,
                   CAST(CASE WHEN sd.node IS NOT NULL
                             THEN (1000000000 // 1000000 * 150000) // ns.n
                             ELSE 0 END
                        + (850000 * COALESCE(i$i.s, 0)) // 1000000 AS BIGINT) AS r
            FROM deg CROSS JOIN ns
                 LEFT JOIN sd ON deg.src = sd.node
                 LEFT JOIN i$i ON deg.src = i$i.node)"""
        s"""
        WITH pair AS (
          SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS a,
                          's' || CAST(l.l_suppkey AS VARCHAR) AS b
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        e AS (SELECT a AS src, b AS dst FROM pair
              UNION SELECT b AS src, a AS dst FROM pair),
        deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
        sd AS (SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
               FROM supplier WHERE s_suppkey <= 3),
        ns AS (SELECT COUNT(*) AS n FROM sd JOIN deg ON sd.node = deg.src),
        r0 AS (SELECT deg.src AS node,
                      CAST(CASE WHEN sd.node IS NOT NULL THEN 1000000000 // ns.n
                                ELSE 0 END AS BIGINT) AS r
               FROM deg CROSS JOIN ns LEFT JOIN sd ON deg.src = sd.node),
        ${round(1)},
        ${round(2)},
        ${round(3)}
        SELECT node, r AS rank_ppm FROM r3 ORDER BY node
        """
      }),
    // ----------------------------------------------------------------
    // Rendezvous (HRW) sharding stability: assign every doc under 4
    // shards and under 5, report the transition matrix — and the HRW
    // guarantee as a SELF-VERIFYING column: a doc either stays put or
    // moves to the NEW shard (valid_move), never between old shards.
    Q(
      "q219_rendezvous_shards",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id",
            graft.ext.Layout.rendezvousShard($"doc_id",
              (0 until 4).map(i => s"n$i")).as("shard_before"),
            graft.ext.Layout.rendezvousShard($"doc_id",
              (0 until 5).map(i => s"n$i")).as("shard_after"))
          .groupBy($"shard_before", $"shard_after")
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("valid_move",
            $"shard_before" === $"shard_after" || $"shard_after" === "n4")
          .orderBy($"shard_before", $"shard_after")
      },
      Some {
        def assign(cte: String, tbl: String, as: String) = s"""
          $cte AS (
            SELECT doc_id, shard AS $as FROM (
              SELECT i.doc_id, s.shard,
                     ROW_NUMBER() OVER (PARTITION BY i.doc_id ORDER BY
                       ${OracleSql.hash64("(s.shard || ':' || CAST(i.doc_id AS VARCHAR))")}
                       DESC, s.shard DESC) AS rn
              FROM ids i CROSS JOIN $tbl s)
            WHERE rn = 1)"""
        s"""
        WITH ids AS (SELECT doc_id FROM documents),
        sh4(shard) AS (VALUES ('n0'), ('n1'), ('n2'), ('n3')),
        sh5(shard) AS (VALUES ('n0'), ('n1'), ('n2'), ('n3'), ('n4')),
        ${assign("a4", "sh4", "shard_before")},
        ${assign("a5", "sh5", "shard_after")}
        SELECT shard_before, shard_after, COUNT(*) AS n_docs,
               (shard_before = shard_after OR shard_after = 'n4') AS valid_move
        FROM a4 JOIN a5 USING (doc_id)
        GROUP BY 1, 2 ORDER BY shard_before, shard_after
        """
      }),
    // ----------------------------------------------------------------
    // Merkle-style bucket diff: orders vs a tampered snapshot (one row
    // deleted, every 97th price bumped), 64 key-hash buckets, XOR
    // fingerprints per side — differing buckets localize the damage.
    // Row rendering = the q214 stable formats.
    Q(
      "q220_bucket_diff",
      (s, dir) => {
        import s.implicits._
        def repr = concat_ws("\u0001",
          $"o_orderkey".cast("string"),
          $"o_custkey".cast("string"),
          floor($"o_totalprice" * 100 + 0.5).cast("long").cast("string"),
          tstr($"o_orderdate"),
          $"o_orderpriority")
        val a = t(s, dir, "orders")
        val b = t(s, dir, "orders").filter($"o_orderkey" =!= 7)
          .withColumn("o_totalprice",
            when($"o_orderkey" % 97 === 0, $"o_totalprice" + 1.0)
              .otherwise($"o_totalprice"))
        Profile.bucketDiff(a, b, $"o_orderkey", repr, buckets = 64)
          .orderBy($"bucket")
      },
      Some {
        val repr = "concat_ws(chr(1), CAST(o_orderkey AS VARCHAR), " +
          "CAST(o_custkey AS VARCHAR), " +
          "CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), " +
          "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), o_orderpriority)"
        def side(src: String, sfx: String) = s"""
          g$sfx AS (
            SELECT ${OracleSql.hash64("CAST(o_orderkey AS VARCHAR)")} % 64 AS bucket,
                   COUNT(*) AS n_$sfx, bit_xor(${OracleSql.hash64(repr)}) AS fp_$sfx
            FROM $src GROUP BY 1)"""
        s"""
        WITH bsnap AS (
          SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1.0
                      ELSE o_totalprice END AS o_totalprice,
                 o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey <> 7),
        ${side("orders", "a")},
        ${side("bsnap", "b")}
        SELECT bucket,
               coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
               coalesce(fp_a, 0) AS fp_a, coalesce(fp_b, 0) AS fp_b,
               (coalesce(n_a, 0) <> coalesce(n_b, 0)
                OR coalesce(fp_a, 0) <> coalesce(fp_b, 0)) AS differs
        FROM ga FULL OUTER JOIN gb USING (bucket)
        ORDER BY bucket
        """
      }),
    // ----------------------------------------------------------------
    // Diversified top-k (composition, not a new operator): global
    // top-20 orders by price with AT MOST 2 per customer — the
    // diversity constraint every retrieval/recommendation surface
    // applies. Per-customer rank prunes via WindowGroupLimit before
    // the shuffle; the global cut is a TakeOrderedAndProject.
    Q(
      "q221_diversified_topk",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
        t(s, dir, "orders")
          .withColumn("cust_rank", row_number().over(w))
          .filter($"cust_rank" <= 2)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"cust_rank")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(20)
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice, CAST(rn AS INTEGER) AS cust_rank
        FROM (
          SELECT o_orderkey, o_custkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
        WHERE rn <= 2
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
      """)),
    // ----------------------------------------------------------------
    // Classical additive seasonal-trend decomposition over each event
    // type's hourly mean series: 2×24 centered-MA trend (half-weighted
    // endpoints), centered ordinal-phase seasonal, residual — every
    // mean exact-decimal, every derived double micro-quantized. The
    // oracle replays the identical window/phase chain.
    Q(
      "q222_stl_decompose",
      (s, dir) => {
        import s.implicits._
        val hourly = t(s, dir, "events")
          .filter($"ts".isNotNull && $"value".isNotNull)
          .groupBy($"event_type",
            floor(unix_timestamp($"ts") / 3600).cast("long").as("hour"))
          .agg((sum($"value".cast(Dec)).cast("double") /
            count(lit(1)).cast("double")).as("v"))
        TimeSeries.decompose(hourly, $"event_type", $"hour", $"v", period = 24)
          .select(col("key").as("event_type"), col("t").as("hour"), col("rn"),
            col("phase"), col("value"), col("trend"), col("seasonal"),
            col("residual"))
          .orderBy($"event_type", $"hour")
      },
      Some("""
        WITH hourly AS (
          SELECT event_type AS key, (epoch_ns(ts) // 1000000000) // 3600 AS t,
                 CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
                   / COUNT(*) AS v
          FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
          GROUP BY 1, 2),
        w AS (
          SELECT key, t, v,
                 ROW_NUMBER() OVER pk AS rn,
                 CAST(CAST(SUM(CAST(v AS DECIMAL(38,10))) OVER
                   (PARTITION BY key ORDER BY t
                    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS VARCHAR)
                   AS DOUBLE) AS mfull,
                 COUNT(*) OVER (PARTITION BY key ORDER BY t
                   ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS cnt,
                 LAG(v, 12) OVER pk AS el, LEAD(v, 12) OVER pk AS er
          FROM hourly
          WINDOW pk AS (PARTITION BY key ORDER BY t)),
        b AS (
          SELECT *, (rn - 1) % 24 AS phase,
                 CASE WHEN cnt = 25 THEN
                   floor((mfull - 0.5 * el - 0.5 * er) / 24 * 1000000.0 + 0.5)
                     / 1000000.0 END AS trend
          FROM w),
        d AS (SELECT *, v - trend AS det FROM b),
        pm AS (
          SELECT key, phase,
                 CAST(CAST(SUM(CAST(det AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
                   / COUNT(*) AS sp
          FROM d WHERE det IS NOT NULL GROUP BY 1, 2),
        ce AS (
          SELECT key,
                 CAST(CAST(SUM(CAST(sp AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
                   / COUNT(*) AS c
          FROM pm GROUP BY 1)
        SELECT d.key AS event_type, CAST(d.t AS BIGINT) AS hour,
               CAST(rn AS INTEGER) AS rn, CAST(d.phase AS INTEGER) AS phase,
               v AS value, trend,
               floor((sp - c) * 1000000.0 + 0.5) / 1000000.0 AS seasonal,
               CASE WHEN trend IS NOT NULL AND sp IS NOT NULL THEN
                 floor((v - trend - floor((sp - c) * 1000000.0 + 0.5) / 1000000.0)
                   * 1000000.0 + 0.5) / 1000000.0 END AS residual
        FROM d LEFT JOIN pm ON d.key = pm.key AND d.phase = pm.phase
               LEFT JOIN ce ON d.key = ce.key
        ORDER BY event_type, hour
      """)),
    // ----------------------------------------------------------------
    // Blocking-quality scorecard over a PLANTED-duplicate corpus
    // (every 10th doc re-enters with a shifted id): truth = canonical-
    // text-equality pairs, candidates = q172's sorted-neighborhood
    // blocking — pair completeness vs reduction ratio, the frontier
    // that judges any blocking scheme.
    Q(
      "q224_blocking_quality",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents").filter($"text".isNotNull)
          .select($"doc_id", $"text")
        val aug = docs.unionByName(
          docs.filter($"doc_id" % 10 === 0)
            .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
        val keyed = aug.select($"doc_id",
          TextHash.hash64(graft.ext.TextAnalysis.canonicalize($"text")).as("__k"))
        val truth = keyed.as("x").join(keyed.as("y"),
            col("x.__k") === col("y.__k") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        val cand = graft.ext.Dedup.sortedNeighborPairs(aug, "doc_id", "text",
            windowSize = 3, blockPrefix = 4, minJaccard = 0.5)
          .select($"id_a", $"id_b")
        graft.ext.Linkage.blockingQuality(truth, cand, aug)
      },
      Some {
        val leads = (1 to 2).map { j =>
          s"""SELECT doc_id AS ida, toks AS ta,
             |  LEAD(doc_id, $j) OVER (PARTITION BY blk ORDER BY k, doc_id) AS idb,
             |  LEAD(toks, $j) OVER (PARTITION BY blk ORDER BY k, doc_id) AS tb
             |FROM b""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""
        WITH docs0 AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        aug AS (
          SELECT doc_id, text FROM docs0
          UNION ALL
          SELECT doc_id + 1000000, text FROM docs0 WHERE doc_id % 10 = 0),
        keyed AS (
          SELECT doc_id, ${OracleSql.hash64(OracleSql.canonical("text"))} AS hk
          FROM aug),
        truth AS (
          SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
          FROM keyed x JOIN keyed y ON x.hk = y.hk AND x.doc_id < y.doc_id),
        base AS (
          SELECT doc_id, ${OracleSql.canonical("text")} AS k,
                 list_distinct(${OracleSql.tokens(OracleSql.canonical("text"))}) AS toks
          FROM aug),
        b AS (SELECT doc_id, k, toks, substr(k, 1, 4) AS blk FROM base),
        cand0 AS ($leads),
        cp AS (
          SELECT DISTINCT LEAST(ida, idb) AS id_a, GREATEST(ida, idb) AS id_b
          FROM cand0
          WHERE idb IS NOT NULL AND
            CAST(len(list_intersect(ta, tb)) AS DOUBLE) /
              CAST(len(ta) + len(tb) - len(list_intersect(ta, tb)) AS DOUBLE)
              >= 0.5),
        tc AS (SELECT COUNT(*) AS n_truth FROM truth),
        cc AS (SELECT COUNT(*) AS n_cand FROM cp),
        hc AS (SELECT COUNT(*) AS n_hit FROM truth JOIN cp USING (id_a, id_b)),
        rc AS (SELECT COUNT(*) AS n_records FROM aug)
        SELECT n_records, n_truth, n_cand, n_hit,
               CAST(CASE WHEN n_truth > 0 THEN n_hit * 1000000 // n_truth END
                 AS BIGINT) AS pair_completeness_ppm,
               CAST(CASE WHEN n_records >= 2 THEN 1000000 -
                 CAST(n_cand AS HUGEINT) * 2000000 //
                   (CAST(n_records AS HUGEINT) * (n_records - 1)) END
                 AS BIGINT) AS reduction_ratio_ppm
        FROM rc CROSS JOIN tc CROSS JOIN cc CROSS JOIN hc
        """
      }),
    // ----------------------------------------------------------------
    // Per-column cardinality/concentration profile over customer:
    // distinct counts, hottest-value share, Herfindahl index — the
    // numbers that pick salting/bucketing/pruning strategy per column.
    Q(
      "q225_column_concentration",
      (s, dir) => {
        import s.implicits._
        Profile.concentrationProfile(t(s, dir, "customer"),
            Seq("c_mktsegment", "c_nationkey", "c_name"))
          .orderBy($"column_name")
      },
      Some("""
        WITH st AS (
          SELECT 'c_mktsegment' AS column_name, CAST(c_mktsegment AS VARCHAR) AS v
          FROM customer
          UNION ALL
          SELECT 'c_nationkey', CAST(c_nationkey AS VARCHAR) FROM customer
          UNION ALL
          SELECT 'c_name', CAST(c_name AS VARCHAR) FROM customer),
        counts AS (
          SELECT column_name, v, COUNT(*) AS cnt FROM st
          WHERE v IS NOT NULL GROUP BY 1, 2)
        SELECT column_name, CAST(SUM(cnt) AS BIGINT) AS n,
               COUNT(*) AS n_distinct,
               CAST(MAX(cnt) AS BIGINT) AS top_count,
               CAST(CAST(MAX(cnt) AS HUGEINT) * 1000000 // SUM(cnt) AS BIGINT)
                 AS top_share_ppm,
               CAST(SUM(CAST(cnt AS HUGEINT) * cnt) * 1000000 //
                 (CAST(SUM(cnt) AS HUGEINT) * SUM(cnt)) AS BIGINT) AS hhi_ppm
        FROM counts GROUP BY 1 ORDER BY column_name
      """)),
    // ----------------------------------------------------------------
    // Grouped two-feature least squares: price ~ quantity + discount
    // per return flag, closed-form Cramer over nine exact-decimal raw
    // moments, micro-quantized coefficients. The oracle evaluates the
    // IDENTICAL determinant expression trees.
    Q(
      "q226_grouped_ols2",
      (s, dir) => {
        import s.implicits._
        Profile.groupedOls2(t(s, dir, "lineitem"), Seq("l_returnflag"),
            $"l_quantity", $"l_discount", $"l_extendedprice")
          .orderBy($"l_returnflag")
      },
      Some(s"""
        WITH base AS (
          SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS x1,
                 CAST(l_discount AS DOUBLE) AS x2,
                 CAST(l_extendedprice AS DOUBLE) AS y
          FROM lineitem
          WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
            AND l_extendedprice IS NOT NULL),
        a AS (
          SELECT g, CAST(COUNT(*) AS DOUBLE) AS n,
                 ${OracleSql.dsum("x1")} AS s1, ${OracleSql.dsum("x2")} AS s2,
                 ${OracleSql.dsum("y")} AS sy,
                 ${OracleSql.dsum("x1*x1")} AS s11, ${OracleSql.dsum("x1*x2")} AS s12,
                 ${OracleSql.dsum("x2*x2")} AS s22,
                 ${OracleSql.dsum("x1*y")} AS s1y, ${OracleSql.dsum("x2*y")} AS s2y
          FROM base GROUP BY 1),
        d AS (
          SELECT *,
            n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS det,
            sy*(s11*s22 - s12*s12) - s1y*(s1*s22 - s12*s2) + s2y*(s1*s12 - s11*s2) AS det0,
            n*(s1y*s22 - s2y*s12) - s1*(sy*s22 - s2y*s2) + s2*(sy*s12 - s1y*s2) AS det1,
            n*(s11*s2y - s12*s1y) - s1*(s1*s2y - s12*sy) + s2*(s1*s1y - s11*sy) AS det2
          FROM a)
        SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
               CASE WHEN det <> 0 THEN floor(det0/det*1000000.0+0.5)/1000000.0 END AS b0,
               CASE WHEN det <> 0 THEN floor(det1/det*1000000.0+0.5)/1000000.0 END AS b1,
               CASE WHEN det <> 0 THEN floor(det2/det*1000000.0+0.5)/1000000.0 END AS b2
        FROM d ORDER BY l_returnflag
      """)),
    // ----------------------------------------------------------------
    // Lead-lag cross-correlation: click-rate vs purchase-rate hourly
    // series at lags 0..6 — Pearson r per lag from exact-decimal
    // sums, micro-quantized. The peak lag is the lead time.
    Q(
      "q227_cross_correlation",
      (s, dir) => {
        import s.implicits._
        def hourly(typ: String) = t(s, dir, "events")
          .filter($"ts".isNotNull && $"value".isNotNull && $"event_type" === typ)
          .groupBy(floor(unix_timestamp($"ts") / 3600).cast("long").as("hour"))
          .agg((sum($"value".cast(Dec)).cast("double") /
            count(lit(1)).cast("double")).as("v"))
        TimeSeries.crossCorrelation(hourly("click"), $"hour", $"v",
            hourly("purchase"), $"hour", $"v", maxLag = 6)
          .orderBy($"lag")
      },
      Some(s"""
        WITH ha AS (
          SELECT (epoch_ns(ts) // 1000000000) // 3600 AS t,
                 CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
                   / COUNT(*) AS v
          FROM events
          WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type = 'click'
          GROUP BY 1),
        hb AS (
          SELECT (epoch_ns(ts) // 1000000000) // 3600 AS t,
                 CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
                   / COUNT(*) AS v
          FROM events
          WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type = 'purchase'
          GROUP BY 1),
        l AS (
          SELECT ha.t + g.lag AS tb, g.lag, ha.v AS va
          FROM ha CROSS JOIN (SELECT unnest(range(0, 7)) AS lag) g),
        j AS (SELECT l.lag, l.va, hb.v AS vb FROM l JOIN hb ON hb.t = l.tb),
        a AS (
          SELECT lag, CAST(COUNT(*) AS DOUBLE) AS n,
                 ${OracleSql.dsum("va")} AS sa, ${OracleSql.dsum("vb")} AS sb,
                 ${OracleSql.dsum("va*va")} AS saa, ${OracleSql.dsum("vb*vb")} AS sbb,
                 ${OracleSql.dsum("va*vb")} AS sab
          FROM j GROUP BY 1),
        d AS (SELECT *, n*saa - sa*sa AS d1, n*sbb - sb*sb AS d2 FROM a)
        SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
               CASE WHEN n >= 2 AND d1 > 0 AND d2 > 0 THEN
                 floor((n*sab - sa*sb)/sqrt(d1*d2)*1000000.0+0.5)/1000000.0 END AS r
        FROM d ORDER BY lag
      """)),
    // ----------------------------------------------------------------
    // Grid-cell density clustering (DBSCAN-lite) over the q183
    // synthetic customer points: 10-degree cells, minPts 5, clusters =
    // connected components over 8-adjacent dense cells (modular x, so
    // antimeridian clusters stay whole). The oracle closes the cell
    // graph with WITH RECURSIVE (the q74 pattern).
    Q(
      "q228_grid_dbscan",
      (s, dir) => {
        import s.implicits._
        val pts = t(s, dir, "customer").select(
          ((($"c_custkey" * 37) % 1200).cast("double") / 10.0 - 60.0).as("plat"),
          ((($"c_custkey" * 91) % 3600).cast("double") / 10.0 - 180.0).as("plon"))
        graft.ext.Geo.gridDbscan(pts, $"plat", $"plon", cellDeg = 10.0, minPts = 5)
          .orderBy($"cell_x", $"cell_y")
      },
      Some("""
        WITH RECURSIVE pts AS (
          SELECT CAST((c_custkey * 37) % 1200 AS DOUBLE) / 10.0 - 60.0 AS plat,
                 CAST((c_custkey * 91) % 3600 AS DOUBLE) / 10.0 - 180.0 AS plon
          FROM customer),
        cells AS (
          SELECT ((CAST(floor(plon / 10.0) AS BIGINT) % 36) + 36) % 36 AS cell_x,
                 CAST(floor(plat / 10.0) AS BIGINT) AS cell_y,
                 COUNT(*) AS n_points
          FROM pts WHERE plat IS NOT NULL AND plon IS NOT NULL
          GROUP BY 1, 2),
        dense AS (
          SELECT cell_x, cell_y, n_points,
                 (cell_y + 100000) * 36 + cell_x AS cid
          FROM cells WHERE n_points >= 5),
        offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)),
        edges AS (
          SELECT a.cid AS s, b.cid AS d
          FROM dense a CROSS JOIN offs o
          JOIN dense b
            ON b.cell_x = (((a.cell_x + o.dx) % 36) + 36) % 36
           AND b.cell_y = a.cell_y + o.dy),
        reach(id, lab) AS (
          SELECT DISTINCT s, s FROM edges
          UNION
          SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.id),
        comp AS (SELECT id, MIN(lab) AS comp FROM reach GROUP BY id)
        SELECT d2.cell_x, d2.cell_y, CAST(d2.n_points AS BIGINT) AS n_points,
               coalesce(c.comp, d2.cid) AS cluster_id
        FROM dense d2 LEFT JOIN comp c ON c.id = d2.cid
        ORDER BY cell_x, cell_y
      """)),
    // ----------------------------------------------------------------
    // KMV sketch-merge identity, oracle-checked: sketch the even and
    // odd doc halves separately, merge (union + re-take k smallest),
    // and assert per source that the merged sketch EQUALS the
    // whole-corpus sketch — min-of-mins commutes with union, the
    // property that lets per-shard sketches compose at 100 TB without
    // rescans. sketch_equal is the self-verifying verdict.
    Q(
      "q229_kmv_merge",
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .filter($"text".isNotNull && $"source".isNotNull && $"doc_id".isNotNull)
          .select($"doc_id", $"source", explode(TextHash.tokens($"text")).as("tok"))
        val whole = Retrieval.kmvSketch(toks, $"source", $"tok", k = KmvK)
        val even = Retrieval.kmvSketch(toks.filter($"doc_id" % 2 === 0),
          $"source", $"tok", KmvK)
        val odd = Retrieval.kmvSketch(toks.filter($"doc_id" % 2 === 1),
          $"source", $"tok", KmvK)
        val merged = Retrieval.kmvMergeEstimate(even, odd, KmvK)
        whole.select($"grp".as("source"),
            size($"hashes").cast("long").as("n_whole"), $"hashes".as("__hw"))
          .join(merged.select($"grp".as("source"),
            size($"hashes").cast("long").as("n_merged"),
            $"est".as("est_merged"), $"hashes".as("__hm")), Seq("source"))
          .select($"source", $"n_whole", $"n_merged", $"est_merged",
            ($"__hw" === $"__hm").as("sketch_equal"))
          .orderBy($"source")
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, source, unnest(${OracleSql.tokens("text")}) AS tok
          FROM documents
          WHERE text IS NOT NULL AND source IS NOT NULL AND doc_id IS NOT NULL),
        hw AS (SELECT DISTINCT source, ${OracleSql.hash64("tok")} % $KmvSpace AS h
               FROM toks),
        whole AS (
          SELECT source, list(h ORDER BY h) AS hs FROM (
            SELECT source, h,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM hw)
          WHERE rn <= $KmvK GROUP BY source),
        he AS (SELECT DISTINCT source, ${OracleSql.hash64("tok")} % $KmvSpace AS h
               FROM toks WHERE doc_id % 2 = 0),
        ho AS (SELECT DISTINCT source, ${OracleSql.hash64("tok")} % $KmvSpace AS h
               FROM toks WHERE doc_id % 2 = 1),
        se AS (
          SELECT source, list(h ORDER BY h) AS hs FROM (
            SELECT source, h,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM he)
          WHERE rn <= $KmvK GROUP BY source),
        so AS (
          SELECT source, list(h ORDER BY h) AS hs FROM (
            SELECT source, h,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM ho)
          WHERE rn <= $KmvK GROUP BY source),
        m AS (
          SELECT source,
                 list_slice(list_sort(list_distinct(
                   coalesce(se.hs, CAST([] AS BIGINT[])) ||
                   coalesce(so.hs, CAST([] AS BIGINT[])))), 1, $KmvK) AS hs
          FROM se FULL OUTER JOIN so USING (source))
        SELECT w.source, CAST(len(w.hs) AS BIGINT) AS n_whole,
               CAST(len(m.hs) AS BIGINT) AS n_merged,
               CAST(CASE WHEN len(m.hs) < $KmvK THEN len(m.hs)
                    ELSE ${(KmvK - 1) * KmvSpace} // m.hs[$KmvK] END AS BIGINT)
                 AS est_merged,
               (w.hs = m.hs) AS sketch_equal
        FROM whole w JOIN m USING (source)
        ORDER BY source
      """)),
    // ----------------------------------------------------------------
    // Salt advisor over the event-type key: per key its count, ppm
    // share, and the ceil(count·parts/total) salt factor a 32-way
    // shuffle needs — the measure→prescribe closer of the q53/q117
    // skew family, run on the cheap side BEFORE the big join.
    Q(
      "q230_salt_advisor",
      (s, dir) => {
        import s.implicits._
        graft.ext.Skew.saltAdvisor(t(s, dir, "events"), $"event_type",
            parts = 32, minSharePpm = 10000L)
          .select($"key".as("event_type"), $"n", $"share_ppm", $"salt")
          .orderBy($"event_type")
      },
      Some("""
        WITH c AS (
          SELECT event_type AS k, COUNT(*) AS n FROM events
          WHERE event_type IS NOT NULL GROUP BY 1),
        t AS (SELECT SUM(n) AS total FROM c)
        SELECT k AS event_type, n,
               CAST(n * 1000000 // total AS BIGINT) AS share_ppm,
               CAST((n * 32 + total - 1) // total AS BIGINT) AS salt
        FROM c CROSS JOIN t
        WHERE n * 1000000 // total >= 10000
        ORDER BY event_type
      """))
  )
}
