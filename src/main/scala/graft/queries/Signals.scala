package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Dedup, Graph, LangModel, Profile, Retrieval, TextAnalysis, TimeSeries}
import graft.functions.LinkageFunctions
import Q._

/** Round-7 surface: sorted-neighborhood dedup, per-node clustering
  * coefficient, linear-interpolation resampling, Welch's t-test,
  * first-seen growth curves, Jaro–Winkler linkage, sentence-shape
  * quality signals.
  */
object Signals {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Hourly bucket id over the micro-precision parquet timestamps —
    * exact integer floor-division replica of the Scala side's
    * floor(unix_timestamp / 3600) (same fragment as Temporal's).
    */
  private val HourBucket = "(epoch_ns(ts) // 1000000000) // 3600"

  /** Raw epoch seconds off the nanos parquet timestamps. */
  private val EpochSec = "(epoch_ns(ts) // 1000000000)"

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // Sorted-neighborhood near-dup pairs: canonical-key sort, compare
    // each doc with its next windowSize-1 neighbors inside a key-prefix
    // block, verify by exact token-set Jaccard. One window shuffle,
    // zero joins — the linear-cost candidate generator. The oracle
    // replays the composition with per-offset LEAD windows.
    Q(
      "q172_sorted_neighbors",
      (s, dir) => {
        import s.implicits._
        Dedup.sortedNeighborPairs(t(s, dir, "documents"), "doc_id", "text",
            windowSize = 3, blockPrefix = 4, minJaccard = 0.5)
          .orderBy($"id_a", $"id_b")
      },
      Some {
        val leads = (1 to 2).map { j =>
          s"""SELECT doc_id AS ida, toks AS ta,
             |  LEAD(doc_id, $j) OVER (PARTITION BY blk ORDER BY k, doc_id) AS idb,
             |  LEAD(toks, $j) OVER (PARTITION BY blk ORDER BY k, doc_id) AS tb
             |FROM b""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""
        WITH base AS (
          SELECT doc_id, ${OracleSql.canonical("text")} AS k,
                 list_distinct(${OracleSql.tokens(OracleSql.canonical("text"))}) AS toks
          FROM documents WHERE text IS NOT NULL),
        b AS (SELECT doc_id, k, toks, substr(k, 1, 4) AS blk FROM base),
        cand AS ($leads),
        pairs AS (
          SELECT LEAST(ida, idb) AS id_a, GREATEST(ida, idb) AS id_b,
                 CAST(len(list_intersect(ta, tb)) AS DOUBLE) /
                   CAST(len(ta) + len(tb) - len(list_intersect(ta, tb)) AS DOUBLE)
                   AS jaccard
          FROM cand WHERE idb IS NOT NULL)
        SELECT id_a, id_b, jaccard FROM pairs
        WHERE jaccard >= 0.5 ORDER BY id_a, id_b
      """
      }),
    // ----------------------------------------------------------------
    // Per-node clustering coefficient of the brand-restricted
    // co-purchase graph (q147's edge relation): degree, incident
    // triangles, 2t/(d(d-1)) — null below degree 2. The oracle extends
    // the q147 orientation replica with the three-corner unpivot.
    Q(
      "q173_local_cc",
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
        Graph.clusteringCoefficient(edges, "a", "b").orderBy($"id")
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
          SELECT w.s AS s, w.b AS b, w.c AS c
          FROM (SELECT o1.s AS s, o1.t AS b, o2.t AS c
                FROM oriented o1 JOIN oriented o2 ON o1.s = o2.s AND o1.t < o2.t) w
          JOIN edges e ON e.u = LEAST(w.b, w.c) AND e.v = GREATEST(w.b, w.c)),
        corners AS (
          SELECT s AS id FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri),
        tc AS (SELECT id, COUNT(*) AS t FROM corners GROUP BY id)
        SELECT deg.id AS id, deg.d AS degree,
               CAST(COALESCE(tc.t, 0) AS BIGINT) AS triangles,
               CASE WHEN deg.d >= 2 THEN
                 2.0 * CAST(COALESCE(tc.t, 0) AS DOUBLE) /
                   CAST(deg.d * (deg.d - 1) AS DOUBLE) END AS local_cc
        FROM deg LEFT JOIN tc ON tc.id = deg.id ORDER BY id
      """)),
    // ----------------------------------------------------------------
    // Per-user hourly grid with LINEAR interpolation across empty
    // cells (null before first / after last observation — measurements
    // are not extrapolated). The q101 grid replica plus four
    // IGNORE NULLS anchor windows and the verbatim fixed-shape
    // interpolation expression.
    Q(
      "q174_interpolate_fill",
      (s, dir) => {
        import s.implicits._
        TimeSeries.interpolateFill(
            t(s, dir, "events"),
            $"user_id", $"ts", $"value", $"event_id",
            stepSeconds = 3600L)
          .select($"key".as("user_id"), tstr($"bucket_ts").as("bucket_ts"),
            $"is_observed", $"value_interp")
          .orderBy($"user_id", $"bucket_ts")
      },
      Some(s"""
        WITH obs AS (
          SELECT user_id AS k, $HourBucket AS b,
                 make_timestamp(epoch_ns(ts) // 1000) AS ts, event_id, value
          FROM events WHERE value IS NOT NULL),
        cell AS (
          SELECT k, b, value FROM (
            SELECT k, b, value,
                   ROW_NUMBER() OVER (PARTITION BY k, b
                     ORDER BY ts DESC, event_id DESC) AS rn
            FROM obs)
          WHERE rn = 1),
        bounds AS (SELECT k, MIN(b) AS lo, MAX(b) AS hi FROM obs GROUP BY k),
        grid AS (SELECT k, unnest(range(lo, hi + 1)) AS b FROM bounds),
        g AS (
          SELECT g.k, g.b, c.value AS v,
            LAST_VALUE(c.b IGNORE NULLS) OVER (PARTITION BY g.k ORDER BY g.b
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bp,
            LAST_VALUE(c.value IGNORE NULLS) OVER (PARTITION BY g.k ORDER BY g.b
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS vp,
            FIRST_VALUE(c.b IGNORE NULLS) OVER (PARTITION BY g.k ORDER BY g.b
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS bn,
            FIRST_VALUE(c.value IGNORE NULLS) OVER (PARTITION BY g.k ORDER BY g.b
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS vn
          FROM grid g LEFT JOIN cell c ON g.k = c.k AND g.b = c.b)
        SELECT k AS user_id,
               strftime(make_timestamp(b * 3600 * 1000000), '%Y-%m-%d %H:%M:%S')
                 AS bucket_ts,
               v IS NOT NULL AS is_observed,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN vp IS NOT NULL AND vn IS NOT NULL THEN
                      vp + (CAST(b - bp AS DOUBLE) * (vn - vp)) /
                        CAST(bn - bp AS DOUBLE)
               END AS value_interp
        FROM g ORDER BY user_id, bucket_ts
      """)),
    // ----------------------------------------------------------------
    // Welch's unequal-variance t-test: purchase vs view event values.
    // One conditional aggregate; the oracle replays the decimal power
    // sums and the identical double algebra.
    Q(
      "q175_welch_ttest",
      (s, dir) => {
        import s.implicits._
        Profile.welchTTest(t(s, dir, "events"), $"event_type", $"value",
          a = "purchase", b = "view")
      },
      Some(s"""
        WITH s AS (
          SELECT
            CAST(COUNT(CASE WHEN event_type = 'purchase' THEN value END) AS DOUBLE) AS na,
            ${OracleSql.dsum("CASE WHEN event_type = 'purchase' THEN value END")} AS sxa,
            ${OracleSql.dsum(
              "CASE WHEN event_type = 'purchase' THEN value END * CASE WHEN event_type = 'purchase' THEN value END")} AS sxxa,
            CAST(COUNT(CASE WHEN event_type = 'view' THEN value END) AS DOUBLE) AS nb,
            ${OracleSql.dsum("CASE WHEN event_type = 'view' THEN value END")} AS sxb,
            ${OracleSql.dsum(
              "CASE WHEN event_type = 'view' THEN value END * CASE WHEN event_type = 'view' THEN value END")} AS sxxb
          FROM events
          WHERE value IS NOT NULL AND event_type IN ('purchase', 'view')),
        alg AS (
          SELECT na, nb, sxa / na AS ma, sxb / nb AS mb,
                 CASE WHEN na >= 2 THEN (na * sxxa - sxa * sxa) / (na * (na - 1.0)) END AS va,
                 CASE WHEN nb >= 2 THEN (nb * sxxb - sxb * sxb) / (nb * (nb - 1.0)) END AS vb
          FROM s)
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               CASE WHEN na >= 1 THEN ma END AS mean_a,
               CASE WHEN nb >= 1 THEN mb END AS mean_b,
               va AS var_a, vb AS var_b,
               CASE WHEN na >= 2 AND nb >= 2 AND (va / na + vb / nb) > 0 THEN
                 (ma - mb) / sqrt(va / na + vb / nb) END AS t_stat,
               CASE WHEN na >= 2 AND nb >= 2 AND (va / na + vb / nb) > 0
                     AND ((va / na) * (va / na) / (na - 1.0) +
                          (vb / nb) * (vb / nb) / (nb - 1.0)) > 0 THEN
                 (va / na + vb / nb) * (va / na + vb / nb) /
                   ((va / na) * (va / na) / (na - 1.0) +
                    (vb / nb) * (vb / nb) / (nb - 1.0)) END AS welch_df
        FROM alg
      """)),
    // ----------------------------------------------------------------
    // First-seen growth curve: new users per day + running total.
    // Event-scale work is one keyed min-aggregate; the running sum
    // windows over the day-sized relation.
    Q(
      "q176_first_seen",
      (s, dir) => {
        import s.implicits._
        TimeSeries.firstSeenCumulative(t(s, dir, "events"), $"user_id", $"ts")
          .orderBy($"day")
      },
      Some("""
        WITH f AS (
          SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
          FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
          GROUP BY user_id),
        d AS (SELECT d0 AS day, COUNT(*) AS n_new FROM f GROUP BY d0)
        SELECT day, n_new,
               CAST(SUM(n_new) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS n_cumulative
        FROM d ORDER BY day
      """)),
    // ----------------------------------------------------------------
    // Jaro–Winkler fuzzy part-name linkage, blocked on the first TWO
    // name tokens (the synthetic palette has ~8 first words, so
    // one-word blocks go quadratic — measured 25M pairs at sf0.1; two
    // words keep Σ|block|² linear-ish). Scores are micro-quantized to
    // integers BEFORE the threshold filter so a last-ulp disagreement
    // between the compiled expression and DuckDB's rapidfuzz can
    // neither flip a hash nor flip set membership at the boundary —
    // via floor(x·10⁶ + ½) (exact double ops, half-up for the positive
    // domain), NOT round(), whose double path allocates a BigDecimal
    // per row (measured 3× the cost of the JW scorer itself).
    Q(
      "q177_jaro_winkler",
      (s, dir) => {
        import s.implicits._
        val w = split($"p_name", " ")
        val p = t(s, dir, "part")
          .select($"p_partkey", $"p_name",
            concat_ws(" ", w.getItem(0), w.getItem(1)).as("__blk"))
        // the probe side of the block self-join is one small parquet
        // file = 1-3 scan tasks, which serialized the per-pair
        // Jaro-Winkler evaluation on 32 cores (the q263 docIds
        // starvation shape); round-robin the narrow (key, name, blk)
        // rows first so the BHJ+JW stage runs cluster-wide — pair set
        // and scores are partition-independent
        p.repartition(s.sparkContext.defaultParallelism).as("a").join(p.as("b"),
            col("a.__blk") === col("b.__blk") &&
              col("a.p_partkey") < col("b.p_partkey"))
          .select(
            col("a.p_partkey").as("key_a"),
            col("b.p_partkey").as("key_b"),
            floor(LinkageFunctions.jaroWinkler(col("a.p_name"), col("b.p_name")) *
              lit(1000000.0) + lit(0.5)).cast("long").as("jw_micro"))
          .filter($"jw_micro" >= 950000L)
          // deterministic top-k (total order: keys are unique) keeps the
          // result bounded at any SF — TakeOrdered, never a full sort
          .orderBy($"jw_micro".desc, $"key_a", $"key_b")
          .limit(200)
      },
      Some("""
        WITH p AS (
          SELECT p_partkey, p_name,
                 split_part(p_name, ' ', 1) || ' ' || split_part(p_name, ' ', 2) AS blk
          FROM part),
        pairs AS (
          SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
                 CAST(FLOOR(jaro_winkler_similarity(a.p_name, b.p_name) * 1000000.0
                   + 0.5) AS BIGINT) AS jw_micro
          FROM p a JOIN p b
            ON a.blk = b.blk AND a.p_partkey < b.p_partkey)
        SELECT key_a, key_b, jw_micro FROM pairs
        WHERE jw_micro >= 950000
        ORDER BY jw_micro DESC, key_a, key_b LIMIT 200
      """)),
    // ----------------------------------------------------------------
    // Sentence-shape quality signals: terminator-run sentence count,
    // token count, mean tokens/sentence, ends-at-boundary flag — all
    // RE2-safe regex counts and one fixed-shape division.
    Q(
      "q178_sentence_stats",
      (s, dir) => {
        import s.implicits._
        TextAnalysis.sentenceStats(t(s, dir, "documents"), $"doc_id", $"text")
          .orderBy($"doc_id")
      },
      Some(s"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sentences,
               CAST(len(${OracleSql.tokens("text")}) AS BIGINT) AS n_tokens,
               CASE WHEN len(regexp_extract_all(text, '[.!?]+')) > 0 THEN
                 CAST(len(${OracleSql.tokens("text")}) AS DOUBLE) /
                   CAST(len(regexp_extract_all(text, '[.!?]+')) AS DOUBLE)
               END AS mean_sent_tokens,
               substr(regexp_replace(text, '[ \\t\\n\\f\\r]+$$', '', 'g'), -1, 1)
                 IN ('.', '!', '?') AS ends_terminal
        FROM documents WHERE text IS NOT NULL ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Single change-point per user: the split maximizing
    // |mean(left) − mean(right)| with both segments >= 10 rows —
    // decimal-exact prefix sums, fixed-shape double algebra, earliest-
    // position tie-break. One keyed Exchange serves all four windows.
    Q(
      "q179_change_point",
      (s, dir) => {
        import s.implicits._
        TimeSeries.changePoint(t(s, dir, "events"),
            $"user_id", $"ts", $"value", $"event_id", minSegment = 10)
          .select($"key".as("user_id"), $"split_idx",
            tstr($"split_ts").as("split_ts"),
            $"mean_left", $"mean_right", $"stat")
          .orderBy($"user_id")
      },
      Some("""
        WITH r AS (
          SELECT user_id AS k, make_timestamp(epoch_ns(ts) // 1000) AS ts,
                 event_id, value
          FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        w AS (
          SELECT k, ts, value,
            CAST(ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts, event_id)
              AS BIGINT) AS i,
            CAST(CAST(SUM(CAST(value AS DECIMAL(38,10)))
                OVER (PARTITION BY k ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS VARCHAR) AS DOUBLE) AS c,
            COUNT(*) OVER (PARTITION BY k) AS n,
            CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) OVER (PARTITION BY k)
              AS VARCHAR) AS DOUBLE) AS s
          FROM r),
        cand AS (
          SELECT k, i, ts,
                 c / CAST(i AS DOUBLE) AS ml,
                 (s - c) / (CAST(n AS DOUBLE) - CAST(i AS DOUBLE)) AS mr,
                 abs(c / CAST(i AS DOUBLE) -
                     (s - c) / (CAST(n AS DOUBLE) - CAST(i AS DOUBLE))) AS stat
          FROM w WHERE i >= 10 AND i <= n - 10),
        best AS (
          SELECT k, i, ts, ml, mr, stat,
                 ROW_NUMBER() OVER (PARTITION BY k ORDER BY stat DESC, i) AS rn
          FROM cand)
        SELECT k AS user_id, i AS split_idx,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS split_ts,
               ml AS mean_left, mr AS mean_right, stat
        FROM best WHERE rn = 1 ORDER BY user_id
      """)),
    // ----------------------------------------------------------------
    // Vocabulary growth over ingest buckets of 50 docs: token volume,
    // new types, cumulative types — the Heaps-law saturation probe.
    Q(
      "q180_vocab_growth",
      (s, dir) => {
        import s.implicits._
        TextAnalysis.vocabGrowth(t(s, dir, "documents"),
            expr("CAST(doc_id AS BIGINT) div 50"), $"text")
          .orderBy($"bucket")
      },
      Some(s"""
        WITH tb AS (
          SELECT doc_id // 50 AS b, unnest(${OracleSql.tokens("text")}) AS t
          FROM documents WHERE text IS NOT NULL),
        nt AS (SELECT b0 AS bucket, COUNT(*) AS n_new_types FROM (
                 SELECT t, MIN(b) AS b0 FROM tb GROUP BY t) GROUP BY b0),
        tc AS (SELECT b AS bucket, COUNT(*) AS n_tokens FROM tb GROUP BY b)
        SELECT tc.bucket, tc.n_tokens,
               CAST(COALESCE(nt.n_new_types, 0) AS BIGINT) AS n_new_types,
               CAST(SUM(COALESCE(nt.n_new_types, 0)) OVER (ORDER BY tc.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_types
        FROM tc LEFT JOIN nt ON nt.bucket = tc.bucket ORDER BY tc.bucket
      """)),
    // ----------------------------------------------------------------
    // Per-source exact-dup report: corpus-wide canonical-hash counts,
    // joined back and rolled up per source.
    Q(
      "q181_dup_rate_by_source",
      (s, dir) => {
        import s.implicits._
        Dedup.dupRateBySource(t(s, dir, "documents"), $"source", $"text")
          .orderBy($"source")
      },
      Some(s"""
        WITH base AS (
          SELECT source AS src, md5(${OracleSql.canonical("text")}) AS h
          FROM documents WHERE text IS NOT NULL),
        c AS (SELECT h, COUNT(*) AS cnt FROM base GROUP BY h),
        j AS (SELECT base.src, c.cnt FROM base JOIN c ON base.h = c.h),
        agg AS (
          SELECT src AS source, COUNT(*) AS n_docs,
                 CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_docs
          FROM j GROUP BY src)
        SELECT source, n_docs, n_dup_docs,
               CAST(n_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_frac
        FROM agg ORDER BY source
      """)),
    // ----------------------------------------------------------------
    // Cross-source n-gram-overlap matrix: distinct canonical 3-gram
    // shingle hashes shared per source pair, plus containment vs the
    // smaller side's shingle vocabulary.
    Q(
      "q182_source_overlap",
      (s, dir) => {
        import s.implicits._
        Dedup.sourceOverlap(t(s, dir, "documents"), $"source", $"text")
          .orderBy($"source_a", $"source_b")
      },
      Some(s"""
        WITH sh AS (
          SELECT DISTINCT src, h FROM (
            SELECT source AS src,
                   unnest(${OracleSql.hashedShingles3Full(OracleSql.canonical("text"))}) AS h
            FROM documents WHERE text IS NOT NULL AND source IS NOT NULL)),
        tot AS (SELECT src, COUNT(*) AS t FROM sh GROUP BY src),
        p AS (
          SELECT a.src AS source_a, b.src AS source_b, COUNT(*) AS n_shared
          FROM sh a JOIN sh b ON a.h = b.h AND a.src < b.src
          GROUP BY 1, 2)
        SELECT p.source_a, p.source_b, p.n_shared,
               CAST(p.n_shared AS DOUBLE) / CAST(LEAST(ta.t, tb.t) AS DOUBLE)
                 AS containment
        FROM p JOIN tot ta ON ta.src = p.source_a
               JOIN tot tb ON tb.src = p.source_b
        ORDER BY source_a, source_b
      """)),
    // ----------------------------------------------------------------
    // Trigram Stupid-Backoff LM scoring: even docs train, odd docs are
    // scored held-out (backoff can actually fire). Integer ppb
    // conditionals, 0.4 backoff as ·2 div 5 — engine-portable exactly.
    Q(
      "q189_trigram_backoff",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        LangModel.trigramBackoffScore(
            docs.filter($"doc_id" % 2 === 0), docs.filter($"doc_id" % 2 === 1),
            $"doc_id", $"text")
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH tok AS (
          SELECT doc_id, t, i FROM (
            SELECT doc_id, unnest(toks) AS t,
                   unnest(range(1, len(toks) + 1)) AS i
            FROM (SELECT doc_id, ${OracleSql.tokens("text")} AS toks
                  FROM documents WHERE text IS NOT NULL))),
        ttr AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
        tsc AS (SELECT * FROM tok WHERE doc_id % 2 = 1),
        tri_tr AS (
          SELECT w1, w2, w3 FROM (
            SELECT t AS w1, LEAD(t, 1) OVER win AS w2, LEAD(t, 2) OVER win AS w3
            FROM ttr WINDOW win AS (PARTITION BY doc_id ORDER BY i))
          WHERE w3 IS NOT NULL),
        bg_tr AS (
          SELECT a, b FROM (
            SELECT t AS a, LEAD(t) OVER win AS b
            FROM ttr WINDOW win AS (PARTITION BY doc_id ORDER BY i))
          WHERE b IS NOT NULL),
        ct3 AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM tri_tr GROUP BY 1, 2, 3),
        ct2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM tri_tr GROUP BY 1, 2),
        cb2 AS (SELECT a, b, COUNT(*) AS cb FROM bg_tr GROUP BY 1, 2),
        cb1 AS (SELECT a, COUNT(*) AS cb1 FROM bg_tr GROUP BY 1),
        cu AS (SELECT t, COUNT(*) AS cu FROM ttr GROUP BY t),
        nt AS (SELECT COUNT(*) AS n_total FROM ttr),
        tri_sc AS (
          SELECT doc_id, w1, w2, w3 FROM (
            SELECT doc_id, t AS w1, LEAD(t, 1) OVER win AS w2, LEAD(t, 2) OVER win AS w3
            FROM tsc WINDOW win AS (PARTITION BY doc_id ORDER BY i))
          WHERE w3 IS NOT NULL),
        sc AS (
          SELECT s.doc_id,
                 CASE WHEN ct3.c3 IS NOT NULL THEN 0
                      WHEN cb2.cb IS NOT NULL THEN 1 ELSE 2 END AS lvl,
                 CASE WHEN ct3.c3 IS NOT NULL THEN (ct3.c3 * 1000000000) // ct2.c2
                      WHEN cb2.cb IS NOT NULL
                        THEN ((cb2.cb * 1000000000) // cb1.cb1) * 2 // 5
                      ELSE (((COALESCE(cu.cu, 0) * 1000000000) // nt.n_total)
                        * 2 // 5) * 2 // 5 END AS ppb
          FROM tri_sc s
          LEFT JOIN ct3 ON ct3.w1 = s.w1 AND ct3.w2 = s.w2 AND ct3.w3 = s.w3
          LEFT JOIN ct2 ON ct2.w1 = s.w1 AND ct2.w2 = s.w2
          LEFT JOIN cb2 ON cb2.a = s.w2 AND cb2.b = s.w3
          LEFT JOIN cb1 ON cb1.a = s.w2
          LEFT JOIN cu ON cu.t = s.w3
          CROSS JOIN nt)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
               CAST(SUM(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri_hits,
               CAST(SUM(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bi_backoff,
               CAST(SUM(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_uni_backoff,
               CAST(SUM(ppb) AS DOUBLE) / COUNT(*) AS mean_p_ppb
        FROM sc GROUP BY doc_id ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // All-pairs sparse cosine over a DF-pruned shingle inverted index:
    // pair space Σdf² ≤ maxDf·|postings| (linear for a fixed cap),
    // integer dot/norm sums, one quantized division per pair.
    Q(
      "q190_sparse_cosine_pairs",
      (s, dir) => {
        import s.implicits._
        Retrieval.sparseCosinePairs(t(s, dir, "documents"),
            $"doc_id", $"text", maxDf = 20, minCos = 0.05)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""
        WITH g AS (
          SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
                   i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS g
          FROM (SELECT doc_id, ${OracleSql.tokens("text")} AS toks
                FROM documents WHERE text IS NOT NULL)),
        tf AS (SELECT doc_id, g, COUNT(*) AS tf FROM g GROUP BY 1, 2),
        kept AS (
          SELECT tf.* FROM tf
          JOIN (SELECT g FROM tf GROUP BY g HAVING COUNT(*) <= 20) d USING (g)),
        norms AS (
          SELECT doc_id, sqrt(CAST(SUM(tf * tf) AS DOUBLE)) AS nrm
          FROM kept GROUP BY doc_id),
        dots AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.tf * b.tf) AS dot
          FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        c AS (
          SELECT id_a, id_b,
                 floor(CAST(dot AS DOUBLE) / (na.nrm * nb.nrm)
                   * 1000000.0 + 0.5) / 1000000.0 AS cos
          FROM dots JOIN norms na ON na.doc_id = id_a
                    JOIN norms nb ON nb.doc_id = id_b)
        SELECT id_a, id_b, cos FROM c WHERE cos >= 0.05 ORDER BY id_a, id_b
      """)),
    // ----------------------------------------------------------------
    // Zipf head/tail concentration per source: top-1/top-10 token
    // share + hapax type fraction — the log-free rank-frequency screen.
    Q(
      "q191_zipf_profile",
      (s, dir) => {
        import s.implicits._
        TextAnalysis.zipfProfile(t(s, dir, "documents"), $"source", $"text")
          .orderBy($"slice")
      },
      Some(s"""
        WITH cnt AS (
          SELECT slice, tok, COUNT(*) AS n FROM (
            SELECT source AS slice, unnest(${OracleSql.tokens("text")}) AS tok
            FROM documents WHERE text IS NOT NULL)
          GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (PARTITION BY slice
                ORDER BY n DESC, tok) AS rk FROM cnt),
        a AS (
          SELECT slice, CAST(SUM(n) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_types,
                 CAST(SUM(CASE WHEN rk = 1 THEN n ELSE 0 END) AS BIGINT) AS top1,
                 CAST(SUM(CASE WHEN rk <= 10 THEN n ELSE 0 END) AS BIGINT) AS top10,
                 CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
          FROM r GROUP BY slice)
        SELECT slice, n_tokens, n_types,
               CAST(top1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top1_share,
               CAST(top10 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top10_share,
               CAST(hapax AS DOUBLE) / CAST(n_types AS DOUBLE) AS hapax_frac
        FROM a ORDER BY slice
      """)),
    // ----------------------------------------------------------------
    // Bytes-per-token + type-byte share per source — the tokenizer-
    // fertility / vocabulary-compressibility screen.
    Q(
      "q192_byte_token_stats",
      (s, dir) => {
        import s.implicits._
        TextAnalysis.byteTokenStats(t(s, dir, "documents"), $"source", $"text")
          .orderBy($"slice")
      },
      Some(s"""
        WITH d AS (
          SELECT source AS slice, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes
          FROM documents WHERE text IS NOT NULL GROUP BY 1),
        t0 AS (
          SELECT source AS slice, tok, strlen(tok) AS tb FROM (
            SELECT source, unnest(${OracleSql.tokens("text")}) AS tok
            FROM documents WHERE text IS NOT NULL) u(source, tok)),
        g AS (SELECT slice, tok, COUNT(*) AS n, MAX(tb) AS tb
              FROM t0 GROUP BY 1, 2),
        ta AS (
          SELECT slice, CAST(SUM(n) AS BIGINT) AS n_tokens,
                 CAST(SUM(tb * n) AS BIGINT) AS tok_bytes,
                 CAST(SUM(tb) AS BIGINT) AS type_bytes
          FROM g GROUP BY slice)
        SELECT slice, n_docs, total_bytes, n_tokens,
               CAST(total_bytes AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                 AS bytes_per_token,
               CAST(type_bytes AS DOUBLE) / CAST(tok_bytes AS DOUBLE)
                 AS type_byte_share
        FROM d JOIN ta USING (slice) ORDER BY slice
      """)),
    // ----------------------------------------------------------------
    // Golden-record survivorship: per user, each field independently
    // keeps its latest non-null value — one struct-max hash aggregate,
    // no window, no per-field join. The oracle replays it with
    // IGNORE-NULLS last_value windows.
    Q(
      "q193_golden_record",
      (s, dir) => {
        import s.implicits._
        val src = t(s, dir, "events").select($"user_id", $"ts", $"event_id",
          when($"event_type" === "click", $"value").as("f_click"),
          when($"event_type" === "purchase", $"value").as("f_purchase"),
          when($"event_type" === "signup", $"value").as("f_signup"))
        graft.etl.Merge.goldenRecord(src, $"user_id", $"ts", $"event_id",
            Seq("f_click", "f_purchase", "f_signup"))
          .orderBy($"key")
      },
      Some("""
        WITH src AS (
          SELECT user_id AS key, ts, event_id,
                 CASE WHEN event_type = 'click' THEN value END AS f_click,
                 CASE WHEN event_type = 'purchase' THEN value END AS f_purchase,
                 CASE WHEN event_type = 'signup' THEN value END AS f_signup
          FROM events
          WHERE user_id IS NOT NULL),
        g AS (
          SELECT key,
                 last_value(f_click IGNORE NULLS) OVER w AS f_click,
                 last_value(f_purchase IGNORE NULLS) OVER w AS f_purchase,
                 last_value(f_signup IGNORE NULLS) OVER w AS f_signup,
                 COUNT(*) OVER (PARTITION BY key) AS n_records,
                 row_number() OVER (PARTITION BY key
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM src
          WINDOW w AS (PARTITION BY key
                       ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        SELECT key, f_click, f_purchase, f_signup,
               CAST(n_records AS BIGINT) AS n_records
        FROM g WHERE rn = 1 ORDER BY key
      """)),
    // ----------------------------------------------------------------
    // Seasonal-naive anomaly: each event vs its phase-of-week slot's
    // mean ± 3σ (slot stats micro-quantized — the FMA guard).
    Q(
      "q194_seasonal_anomaly",
      (s, dir) => {
        import s.implicits._
        val r = TimeSeries.seasonalNaiveResidual(t(s, dir, "events"),
          $"event_type", $"ts", $"value", $"event_id")
        r.select($"key", $"phase", tstr($"ts").as("ts"), $"tiebreak",
            $"value", $"baseline", $"residual", $"is_anomaly")
          .orderBy($"key", $"ts", $"tiebreak")
      },
      Some(s"""
        WITH base AS (
          SELECT event_type AS key, ts, event_id AS tiebreak, value AS v,
                 ($EpochSec // 3600) % 168 AS phase
          FROM events
          WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL),
        st AS (
          SELECT key, phase, CAST(COUNT(*) AS DOUBLE) AS n,
                 ${OracleSql.dsum("v")} AS s1, ${OracleSql.dsum("v * v")} AS s2
          FROM base GROUP BY 1, 2),
        stq AS (
          SELECT key, phase,
                 floor(s1 / n * 1000000.0 + 0.5) / 1000000.0 AS baseline,
                 CASE WHEN n >= 2 THEN
                   floor(sqrt(greatest((n * s2 - s1 * s1) / (n * n), 0.0))
                     * 1000000.0 + 0.5) / 1000000.0 END AS sd
          FROM st)
        SELECT b.key, b.phase, strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS ts,
               b.tiebreak, b.v AS value, q.baseline,
               b.v - q.baseline AS residual,
               COALESCE(abs(b.v - q.baseline) > 3.0 * q.sd, false) AS is_anomaly
        FROM base b JOIN stq q USING (key, phase)
        ORDER BY key, ts, tiebreak
      """)),
    // ----------------------------------------------------------------
    // Time-decay multi-touch attribution: bucketed range self-join,
    // integer half-life weights (10^9 >> steps), ppb-normalized credit
    // per conversion — exact integer sums end to end.
    Q(
      "q195_decay_attribution",
      (s, dir) => {
        import s.implicits._
        graft.ext.Funnel.decayAttribution(t(s, dir, "events"),
            $"user_id", $"ts", $"event_type", $"event_id",
            conversion = "purchase", halfLifeSeconds = 86400L, lookbackSteps = 7)
          .orderBy($"channel")
      },
      Some(s"""
        WITH base AS (
          SELECT user_id AS k, $EpochSec AS t, event_type AS e, event_id AS tb
          FROM events
          WHERE ts IS NOT NULL AND event_type IS NOT NULL AND user_id IS NOT NULL),
        conv AS (SELECT k, t AS tc, tb AS cid FROM base WHERE e = 'purchase'),
        tch AS (SELECT k, t AS tt, e AS channel FROM base WHERE e <> 'purchase'),
        pairs AS (
          SELECT t.k, c.cid, t.channel,
                 CAST(1000000000 AS BIGINT) >> CAST((c.tc - t.tt) // 86400 AS INTEGER) AS w
          FROM tch t JOIN conv c ON t.k = c.k
          WHERE c.tc >= t.tt AND c.tc - t.tt <= 604800),
        n AS (SELECT k, cid, channel,
                (w * 1000000000) // SUM(w) OVER (PARTITION BY k, cid) AS ppb
              FROM pairs)
        SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(COUNT(DISTINCT (k, cid)) AS BIGINT) AS n_conversions,
               CAST(SUM(ppb) AS DOUBLE) / 1000000000.0 AS credit
        FROM n GROUP BY channel ORDER BY channel
      """)),
    // ----------------------------------------------------------------
    // Inter-arrival burstiness profile per user: integer gap moments,
    // micro-quantized σ, Goh–Barabási B = (σ−μ)/(σ+μ).
    Q(
      "q196_interarrival_profile",
      (s, dir) => {
        import s.implicits._
        TimeSeries.interArrivalProfile(t(s, dir, "events"),
            $"user_id", $"ts", $"event_id")
          .orderBy($"key")
      },
      Some(s"""
        WITH e AS (
          SELECT user_id AS key, ts, event_id, $EpochSec AS t
          FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        d AS (
          SELECT key, CAST(t - LAG(t) OVER (PARTITION BY key
                   ORDER BY ts, event_id) AS DOUBLE) AS d
          FROM e QUALIFY d IS NOT NULL),
        a AS (
          SELECT key, CAST(COUNT(*) AS DOUBLE) AS n,
                 ${OracleSql.dsum("d")} AS s1, ${OracleSql.dsum("d * d")} AS s2
          FROM d GROUP BY key),
        b AS (
          SELECT key, CAST(n AS BIGINT) AS n_gaps, s1 / n AS mean_gap,
                 floor(sqrt(greatest((n * s2 - s1 * s1) / (n * n), 0.0))
                   * 1000000.0 + 0.5) / 1000000.0 AS sd_gap
          FROM a)
        SELECT key, n_gaps, mean_gap, sd_gap,
               CASE WHEN mean_gap > 0 THEN sd_gap / mean_gap END AS cv,
               CASE WHEN sd_gap + mean_gap > 0 THEN
                 (sd_gap - mean_gap) / (sd_gap + mean_gap) END AS burstiness
        FROM b ORDER BY key
      """))
  )
}
