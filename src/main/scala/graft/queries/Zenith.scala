package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 expansion batch: rank statistics (Spearman, Mann–Whitney),
  * resampling inference (Poisson bootstrap), link analysis (HITS),
  * retrieval eval (MAP/MRR), collocation mining, and the dominant
  * principal component — the distribution-free / spectral half of the
  * profile family.
  */
object Zenith {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** One HITS half-round pair as oracle CTEs (round r reads h{r-1}). */
  private def hitsRoundSql(r: Int): String =
    s"""a${r}r AS MATERIALIZED (
       |  SELECT e.d AS node, SUM(CAST(h${r - 1}.sc AS HUGEINT)) AS r
       |  FROM e JOIN h${r - 1} ON e.s = h${r - 1}.node GROUP BY 1),
       |a$r AS MATERIALIZED (SELECT node,
       |  CAST(r * 1000000 // (SELECT MAX(r) FROM a${r}r) AS BIGINT) AS sc
       |  FROM a${r}r),
       |h${r}r AS MATERIALIZED (
       |  SELECT e.s AS node, SUM(CAST(a$r.sc AS HUGEINT)) AS r
       |  FROM e JOIN a$r ON e.d = a$r.node GROUP BY 1),
       |h$r AS MATERIALIZED (SELECT node,
       |  CAST(r * 1000000 // (SELECT MAX(r) FROM h${r}r) AS BIGINT) AS sc
       |  FROM h${r}r)""".stripMargin

  /** The one-way-ANOVA oracle chain over a CTE `arows(g, c, v)` —
    * shared by q259 (raw metric) and q260 (|v − median| transform).
    * Mirrors [[graft.ext.Profile.oneWayAnova]]'s milli fixed point:
    * cell terms s²·10³ // n floor FIRST, then one double ratio.
    */
  private val anovaTailSql: String =
    s"""cl AS (SELECT g, c, COUNT(*) AS n, SUM(CAST(v AS HUGEINT)) AS s,
       |              SUM(CAST(v AS HUGEINT) * v) AS q
       |       FROM arows GROUP BY 1, 2),
       |ct AS (SELECT g, c, n, s, q, s * s * 1000 // n AS t FROM cl),
       |ag AS (SELECT g, COUNT(*) AS k, SUM(n) AS n, SUM(s) AS ts,
       |              SUM(q) AS tq, SUM(t) AS b
       |       FROM ct GROUP BY 1),
       |ff AS (SELECT g, k, n,
       |              b - ts * ts * 1000 // n AS ssb,
       |              tq * 1000 - b AS ssw
       |       FROM ag)
       |SELECT g AS grp, CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
       |       CASE WHEN k > 1 AND n > k AND ssw > 0 THEN
       |         CAST(floor(CAST(CAST(ssb AS VARCHAR) AS DOUBLE) *
       |           CAST(n - k AS DOUBLE) /
       |           (CAST(CAST(ssw AS VARCHAR) AS DOUBLE) * CAST(k - 1 AS DOUBLE)) *
       |           1000.0 + 0.5) AS BIGINT)
       |       END AS f_milli
       |FROM ff ORDER BY grp""".stripMargin

  /** One power-iteration round as oracle CTEs (reads v{r-1} over pc). */
  private def pcRoundSql(r: Int): String =
    s"""s$r AS MATERIALIZED (
       |  SELECT id, SUM(xc * v) AS sc
       |  FROM pc JOIN v${r - 1} USING (pos) GROUP BY 1),
       |w$r AS MATERIALIZED (
       |  SELECT pos, SUM(CAST(xc AS HUGEINT) * sc) AS w
       |  FROM pc JOIN s$r USING (id) GROUP BY 1),
       |v$r AS MATERIALIZED (SELECT pos,
       |  CAST(w * 1000000 // (SELECT MAX(abs(w)) FROM w$r) AS BIGINT) AS v
       |  FROM w$r)""".stripMargin

  def all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // Spearman rank correlation per return flag: monotone association
    // between quantity and extended price — Pearson over doubled
    // tie-averaged ranks, exact decimal power sums, one closing
    // IEEE-identical double ratio.
    Q(
      "q246_spearman_corr",
      (s, dir) => {
        import s.implicits._
        graft.ext.Profile.spearmanCorr(t(s, dir, "lineitem"),
            $"l_returnflag", $"l_quantity", $"l_extendedprice")
          .orderBy($"grp")
      },
      Some("""
        WITH rws AS MATERIALIZED (
          SELECT l_returnflag AS g, l_quantity AS x, l_extendedprice AS y
          FROM lineitem
          WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
            AND l_extendedprice IS NOT NULL),
        cx AS (SELECT g, x, COUNT(*) AS cnt FROM rws GROUP BY 1, 2),
        rx AS (SELECT g, x,
          2 * SUM(cnt) OVER (PARTITION BY g ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt + 1 AS rx2
          FROM cx),
        cy AS (SELECT g, y, COUNT(*) AS cnt FROM rws GROUP BY 1, 2),
        ry AS (SELECT g, y,
          2 * SUM(cnt) OVER (PARTITION BY g ORDER BY y
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt + 1 AS ry2
          FROM cy),
        j AS (SELECT r.g, rx2, ry2
              FROM rws r
              JOIN rx ON r.g = rx.g AND r.x = rx.x
              JOIN ry ON r.g = ry.g AND r.y = ry.y),
        agg AS (SELECT g, COUNT(*) AS n,
          SUM(CAST(rx2 AS HUGEINT)) AS sx, SUM(CAST(ry2 AS HUGEINT)) AS sy,
          SUM(CAST(rx2 AS HUGEINT) * rx2) AS sxx,
          SUM(CAST(ry2 AS HUGEINT) * ry2) AS syy,
          SUM(CAST(rx2 AS HUGEINT) * ry2) AS sxy
          FROM j GROUP BY 1),
        f AS (SELECT g, n,
          CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS num,
          CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS d1,
          CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS d2
          FROM agg)
        SELECT g AS grp, CAST(n AS BIGINT) AS n,
               CASE WHEN d1 > 0 AND d2 > 0 THEN
                 CAST(floor(num / sqrt(d1 * d2) * 1000000.0 + 0.5) AS BIGINT)
               END AS rho_ppm
        FROM f ORDER BY grp
      """)),
    // ----------------------------------------------------------------
    // Mann–Whitney U per source: do English docs run longer (n_chars)
    // than the rest? Distribution-free rank-sum with exact tie
    // correction; z² in milli against the 3.841 (p<.05) line.
    Q(
      "q247_mann_whitney",
      (s, dir) => {
        import s.implicits._
        graft.ext.Profile.mannWhitney(
            t(s, dir, "documents").filter($"lang".isNotNull),
            $"source", $"lang" === "en", $"n_chars")
          .orderBy($"grp")
      },
      Some("""
        WITH rws AS MATERIALIZED (
          SELECT source AS g, (lang = 'en') AS a, n_chars AS v
          FROM documents
          WHERE source IS NOT NULL AND lang IS NOT NULL AND n_chars IS NOT NULL),
        cv AS (SELECT g, v, SUM(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
                      COUNT(*) AS cnt
               FROM rws GROUP BY 1, 2),
        rk AS (SELECT g, ca, cnt,
          2 * SUM(cnt) OVER (PARTITION BY g ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt + 1 AS avg2
          FROM cv),
        agg AS (SELECT g, SUM(ca) AS na, SUM(cnt - ca) AS nb,
          SUM(CAST(ca AS HUGEINT) * avg2) AS r2a,
          SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS ties
          FROM rk GROUP BY 1),
        u AS (SELECT g, na, nb, na + nb AS N, ties,
                     CAST(r2a - CAST(na AS HUGEINT) * (na + 1) AS BIGINT) AS u2
              FROM agg),
        f AS (SELECT g, na, nb, u2,
          CAST(CAST(CAST(u2 AS HUGEINT) - CAST(na AS HUGEINT) * nb AS VARCHAR)
            AS DOUBLE) AS dev,
          CAST(CAST(CAST(na AS HUGEINT) * nb *
            (CAST(N AS HUGEINT) * (N + 1) * (N - 1) - ties) AS VARCHAR)
            AS DOUBLE) AS den,
          CAST(CAST(CAST(N AS HUGEINT) * (N - 1) * 3 AS VARCHAR) AS DOUBLE) AS fac
          FROM u)
        SELECT g AS grp, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, u2,
               CASE WHEN na > 0 AND nb > 0 AND den > 0 THEN
                 CAST(floor(dev * dev * fac / den * 1000.0 + 0.5) AS BIGINT)
               END AS z2_milli,
               (na > 0 AND nb > 0 AND den > 0 AND
                floor(dev * dev * fac / den * 1000.0 + 0.5) >= 3841)
                 AS significant_95
        FROM f ORDER BY grp
      """)),
    // ----------------------------------------------------------------
    // Poisson-bootstrap CI for mean doc length per source: 40
    // deterministic hash-seeded replicas, integer micro-means, the
    // (2nd, 39th) order statistics as the 95% band.
    Q(
      "q248_bootstrap_ci",
      (s, dir) => {
        import s.implicits._
        graft.ext.Profile.bootstrapCi(t(s, dir, "documents"),
            $"source", $"doc_id", $"n_chars", b = 40)
          .orderBy($"grp")
      },
      Some("""
        WITH rws AS MATERIALIZED (
          SELECT source AS g, CAST(doc_id AS VARCHAR) AS id, n_chars AS v
          FROM documents
          WHERE source IS NOT NULL AND doc_id IS NOT NULL AND n_chars IS NOT NULL),
        pt AS (SELECT g, COUNT(*) AS n,
                      CAST(SUM(CAST(v AS HUGEINT)) * 1000000 // COUNT(*) AS BIGINT)
                        AS mean_micro
               FROM rws GROUP BY 1),
        wts AS (SELECT g, v, b,
          CAST('0x' || substr(md5('0:' || id || ':' || CAST(b AS VARCHAR)), 1, 15)
            AS BIGINT) % 1000000 AS u
          FROM rws, range(40) r(b)),
        ws AS (SELECT g, b, v,
          CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
               WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
               WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
               WHEN u < 999917 THEN 6 ELSE 7 END AS w
          FROM wts),
        mb AS (SELECT g, b, SUM(w) AS sw, SUM(CAST(w AS HUGEINT) * v) AS sv
               FROM ws GROUP BY 1, 2),
        mm AS (SELECT g, b, CAST(sv * 1000000 // CAST(sw AS HUGEINT) AS BIGINT) AS m
               FROM mb WHERE sw > 0),
        rk AS (SELECT g, m, ROW_NUMBER() OVER (PARTITION BY g ORDER BY m, b) AS rn
               FROM mm),
        ci AS (SELECT g, COUNT(*) AS n_replicas,
                      MAX(CASE WHEN rn = 2 THEN m END) AS ci_lo_micro,
                      MAX(CASE WHEN rn = 39 THEN m END) AS ci_hi_micro
               FROM rk GROUP BY 1)
        SELECT g AS grp, CAST(n AS BIGINT) AS n, mean_micro,
               CAST(n_replicas AS BIGINT) AS n_replicas, ci_lo_micro, ci_hi_micro
        FROM pt JOIN ci USING (g) ORDER BY grp
      """)),
    // ----------------------------------------------------------------
    // HITS over the customer → supplier fulfillment graph: hubs =
    // customers whose orders span the good suppliers, authorities =
    // suppliers the good hubs converge on; top 20 per side after 4
    // integer ppm power-iteration rounds.
    Q(
      "q249_hits_rank",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val e = t(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey")
          .join(t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey"),
            $"o_orderkey" === $"l_orderkey")
          .select($"o_custkey".as("src"), $"l_suppkey".as("dst"))
          .filter($"src".isNotNull && $"dst".isNotNull)
        val w = Window.partitionBy($"side").orderBy($"score_ppm".desc, $"node")
        graft.ext.Graph.hits(e, "src", "dst", iters = 4)
          .withColumn("__rn", row_number().over(w))
          .filter($"__rn" <= 20).drop("__rn")
          .orderBy($"side", $"score_ppm".desc, $"node")
      },
      Some(s"""
        WITH e AS MATERIALIZED (
          SELECT DISTINCT o.o_custkey AS s, l.l_suppkey AS d
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          WHERE o.o_custkey IS NOT NULL AND l.l_suppkey IS NOT NULL),
        h0 AS MATERIALIZED (SELECT DISTINCT s AS node, 1000000 AS sc FROM e),
        ${(1 to 4).map(hitsRoundSql).mkString(",\n")},
        u AS (SELECT 'auth' AS side, node, sc AS score_ppm FROM a4
              UNION ALL
              SELECT 'hub' AS side, node, sc AS score_ppm FROM h4),
        rk AS (SELECT side, node, score_ppm,
                 ROW_NUMBER() OVER (PARTITION BY side
                   ORDER BY score_ppm DESC, node) AS rn
               FROM u)
        SELECT side, node, score_ppm FROM rk WHERE rn <= 20
        ORDER BY side, score_ppm DESC, node
      """)),
    // ----------------------------------------------------------------
    // MAP@10 + MRR@10 for the q240 retrieval run (docs ranked by
    // n_chars per source, relevant = English): term-wise micro
    // fixed-point precision fold, zero float exposure.
    Q(
      "q250_map_mrr",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .filter($"source".isNotNull && $"doc_id".isNotNull &&
            $"n_chars".isNotNull && $"lang".isNotNull)
        graft.ext.Retrieval.mapMrrAtK(docs, $"source", $"doc_id", $"n_chars",
            $"lang" === "en", k = 10)
          .orderBy($"query")
      },
      Some("""
        WITH base AS (
          SELECT source AS q, doc_id AS i, n_chars AS s, (lang = 'en') AS r
          FROM documents
          WHERE source IS NOT NULL AND doc_id IS NOT NULL
            AND n_chars IS NOT NULL AND lang IS NOT NULL),
        rk AS (SELECT q, i, r,
          ROW_NUMBER() OVER (PARTITION BY q ORDER BY s DESC, i) AS rnk,
          SUM(CASE WHEN r THEN 1 ELSE 0 END) OVER (PARTITION BY q
            ORDER BY s DESC, i
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM base),
        agg AS (SELECT q, COUNT(*) AS n_ranked,
          SUM(CASE WHEN r THEN 1 ELSE 0 END) AS n_rel,
          SUM(CASE WHEN r AND rnk <= 10 THEN cum * 1000000 // rnk ELSE 0 END)
            AS apnum,
          MIN(CASE WHEN r AND rnk <= 10 THEN rnk END) AS first_hit
          FROM rk GROUP BY 1)
        SELECT q AS query, CAST(n_ranked AS BIGINT) AS n_ranked,
               CAST(n_rel AS BIGINT) AS n_rel,
               CASE WHEN n_rel > 0
                 THEN CAST(apnum // LEAST(n_rel, 10) AS BIGINT) END AS ap_micro,
               COALESCE(CAST(1000000 // first_hit AS BIGINT), 0) AS rr_micro
        FROM agg ORDER BY query
      """)),
    // ----------------------------------------------------------------
    // Collocation mining: top 50 adjacent bigrams by lift (log-free
    // PMI), marginals and N from the bigram relation itself, ≥5
    // occurrences — the phrase-mining feed for tokenizer vocabularies.
    Q(
      "q251_collocations",
      (s, dir) => {
        import s.implicits._
        graft.ext.TextAnalysis.collocations(
            t(s, dir, "documents"), $"text", minCount = 5L)
          .orderBy($"lift_ppm".desc, $"w1", $"w2")
          .limit(50)
      },
      Some("""
        WITH toks AS (
          SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
          FROM documents WHERE text IS NOT NULL),
        big AS (SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
                FROM toks WHERE len(t) >= 2),
        pc AS MATERIALIZED (SELECT w1, w2, COUNT(*) AS c_xy FROM big GROUP BY 1, 2),
        lx AS (SELECT w1, SUM(c_xy) AS c_x FROM pc GROUP BY 1),
        ry AS (SELECT w2, SUM(c_xy) AS c_y FROM pc GROUP BY 1),
        tot AS (SELECT SUM(c_xy) AS N FROM pc)
        SELECT w1, w2, c_xy,
               CAST(c_x AS BIGINT) AS c_x, CAST(c_y AS BIGINT) AS c_y,
               CAST(CAST(c_xy AS HUGEINT) * N * 1000000 //
                 (CAST(c_x AS HUGEINT) * c_y) AS BIGINT) AS lift_ppm
        FROM pc JOIN lx USING (w1) JOIN ry USING (w2) CROSS JOIN tot
        WHERE c_xy >= 5
        ORDER BY lift_ppm DESC, w1, w2 LIMIT 50
      """)),
    // ----------------------------------------------------------------
    // Dominant principal component of the embedding corpus: integer
    // power iteration (quantize → center → 3 rounds of XᵀX·v with ℓ∞
    // ppm normalization) — the whitening/drift axis.
    Q(
      "q252_top_pc",
      (s, dir) => {
        import s.implicits._
        graft.ext.Similarity.powerIterationPC(
            t(s, dir, "embeddings"), "vec_id", "embedding", iters = 3)
          .orderBy($"dim")
      },
      Some(s"""
        WITH p AS MATERIALIZED (
          SELECT vec_id AS id,
                 CAST(unnest(range(1, len(embedding) + 1)) - 1 AS INTEGER) AS pos,
                 unnest(list_transform(embedding,
                   e -> CAST(floor(CAST(e AS DOUBLE) * 1000.0) AS BIGINT))) AS xq
          FROM embeddings
          WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
        m AS MATERIALIZED (SELECT pos, CAST(SUM(CAST(xq AS HUGEINT)) // COUNT(*) AS BIGINT)
                       AS mean_q
              FROM p GROUP BY 1),
        pc AS MATERIALIZED (SELECT id, p.pos, xq - mean_q AS xc FROM p JOIN m USING (pos)),
        v0 AS (SELECT pos, 1000000 AS v FROM m),
        ${(1 to 3).map(pcRoundSql).mkString(",\n")}
        SELECT m.pos AS dim, mean_q, v3.v AS v_ppm
        FROM v3 JOIN m ON v3.pos = m.pos ORDER BY dim
      """)),
    // ----------------------------------------------------------------
    // Two-sample Kolmogorov–Smirnov per source (en vs rest on doc
    // length): max CDF gap via integer cross-multiplication, ppm D,
    // Smirnov asymptotic 95% verdict — the shape-sensitive complement
    // to q247's rank-location test on the same samples.
    Q(
      "q255_ks_test",
      (s, dir) => {
        import s.implicits._
        graft.ext.Profile.ksTest(
            t(s, dir, "documents").filter($"lang".isNotNull),
            $"source", $"lang" === "en", $"n_chars")
          .orderBy($"grp")
      },
      Some("""
        WITH rws AS MATERIALIZED (
          SELECT source AS g, (lang = 'en') AS a, n_chars AS v
          FROM documents
          WHERE source IS NOT NULL AND lang IS NOT NULL AND n_chars IS NOT NULL),
        cv AS (SELECT g, v,
                      SUM(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
                      SUM(CASE WHEN a THEN 0 ELSE 1 END) AS cb
               FROM rws GROUP BY 1, 2),
        cum AS (SELECT g, ca, cb,
          SUM(ca) OVER (PARTITION BY g ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
          SUM(cb) OVER (PARTITION BY g ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2,
          SUM(ca) OVER (PARTITION BY g) AS n1,
          SUM(cb) OVER (PARTITION BY g) AS n2
          FROM cv),
        agg AS (SELECT g, MAX(n1) AS na, MAX(n2) AS nb,
                 MAX(abs(CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1)) AS gap
                FROM cum GROUP BY 1)
        SELECT g AS grp, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               CASE WHEN na > 0 AND nb > 0 THEN
                 CAST(gap * 1000000 // (CAST(na AS HUGEINT) * nb) AS BIGINT)
               END AS d_ppm,
               (na > 0 AND nb > 0 AND
                CAST(CAST(gap AS VARCHAR) AS DOUBLE) *
                  CAST(CAST(gap AS VARCHAR) AS DOUBLE) * 1000000.0 >=
                1844466.0 *
                  CAST(CAST(CAST(na AS HUGEINT) * nb * (na + nb) AS VARCHAR) AS DOUBLE))
                 AS significant_95
        FROM agg ORDER BY grp
      """)),
    // ----------------------------------------------------------------
    // Degree assortativity of the customer↔supplier fulfillment graph
    // (suppliers offset into their own id space): strongly negative by
    // construction — a bipartite hub-and-spoke — the mixing summary
    // that flags star topology before a percolation-style dedup run.
    Q(
      "q256_assortativity",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey")
          .join(t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey"),
            $"o_orderkey" === $"l_orderkey")
          .select($"o_custkey".as("src"),
            ($"l_suppkey" + 1000000000L).as("dst"))
          .filter($"src".isNotNull && $"dst".isNotNull)
        graft.ext.Graph.assortativity(e, "src", "dst")
      },
      Some("""
        WITH e0 AS MATERIALIZED (
          SELECT DISTINCT o.o_custkey AS s, l.l_suppkey + 1000000000 AS d
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          WHERE o.o_custkey IS NOT NULL AND l.l_suppkey IS NOT NULL),
        bid AS MATERIALIZED (
          SELECT DISTINCT s, d FROM (
            SELECT s, d FROM e0 UNION ALL SELECT d AS s, s AS d FROM e0)
          WHERE s <> d),
        deg AS (SELECT s AS node, COUNT(*) AS deg FROM bid GROUP BY 1),
        pj AS (SELECT du.deg AS x, dv.deg AS y
               FROM bid
               JOIN deg du ON bid.s = du.node
               JOIN deg dv ON bid.d = dv.node),
        agg AS (SELECT COUNT(*) AS n,
          SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
          SUM(CAST(x AS HUGEINT) * x) AS sxx, SUM(CAST(y AS HUGEINT) * y) AS syy,
          SUM(CAST(x AS HUGEINT) * y) AS sxy
          FROM pj),
        f AS (SELECT n,
          CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS num,
          CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS d1,
          CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS d2
          FROM agg)
        SELECT CAST(n AS BIGINT) AS n_pairs,
               CASE WHEN d1 > 0 AND d2 > 0 THEN
                 CAST(floor(num / sqrt(d1 * d2) * 1000000.0 + 0.5) AS BIGINT)
               END AS r_ppm
        FROM f
      """)),
    // ----------------------------------------------------------------
    // Simplified silhouette per cluster over the q55 k-means fit:
    // s = (c₁−c₂)/(1−c₂) floored to ppm per vector, integer cluster
    // means — the cell-quality gate for the SemDeDup/IVF family.
    Q(
      "q257_silhouette",
      (s, dir) => {
        import s.implicits._
        graft.ext.Similarity.silhouetteScore(
            t(s, dir, "embeddings"), "vec_id", "embedding", k = 8, iters = 2)
          .orderBy($"cell")
      },
      Some(s"""
        WITH v AS MATERIALIZED (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
          FROM embeddings),
        ${OracleSql.kmeansCents(8, 2)},
        sc AS MATERIALIZED (
          SELECT c.vec_id AS vid, ct.cent_id,
                 ${OracleSql.cosine("c.vec", "ct.cent_vec")} AS cc,
                 ROW_NUMBER() OVER (PARTITION BY c.vec_id
                   ORDER BY ${OracleSql.cosine("c.vec", "ct.cent_vec")} DESC,
                            ct.cent_id) AS rn
          FROM v c CROSS JOIN cents ct),
        ab AS (SELECT a.vid, a.cent_id AS cell, a.cc AS c1, b.cc AS c2
               FROM sc a JOIN sc b ON a.vid = b.vid
               WHERE a.rn = 1 AND b.rn = 2),
        sv AS (SELECT cell,
                 CASE WHEN 1.0 - c2 > 0 THEN
                   CAST(floor((c1 - c2) / (1.0 - c2) * 1000000.0 + 0.5) AS BIGINT)
                 ELSE 0 END AS s
               FROM ab)
        SELECT cell, COUNT(*) AS n, CAST(SUM(s) // COUNT(*) AS BIGINT) AS mean_s_ppm
        FROM sv GROUP BY 1 ORDER BY cell
      """)),
    // ----------------------------------------------------------------
    // Per-label projection onto the q252 dominant component: the 1-D
    // semantic shadow (count / mean / min / max of the integer
    // projection) — the embedding-drift readout a corpus monitor
    // compares release-over-release.
    Q(
      "q258_pc_projection",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
          .filter($"vec_id".isNotNull && $"embedding".isNotNull && $"label".isNotNull)
        val pc = graft.ext.Similarity.powerIterationPC(
          emb, "vec_id", "embedding", iters = 3)
        val posting = emb
          .select($"vec_id", $"label", posexplode($"embedding").as(Seq("dim", "__x")))
          .select($"vec_id", $"label", $"dim",
            floor($"__x".cast("double") * 1000.0).cast("long").as("__xq"))
        posting.join(broadcast(pc), Seq("dim"))
          .groupBy($"vec_id", $"label")
          .agg(sum(($"__xq" - $"mean_q") * $"v_ppm").as("__proj"))
          .groupBy($"label")
          .agg(count(lit(1)).as("n"),
            expr("CAST(sum(CAST(__proj AS DECIMAL(38,0))) div count(1) AS BIGINT)")
              .as("mean_proj"),
            min($"__proj").as("min_proj"),
            max($"__proj").as("max_proj"))
          .orderBy($"label")
      },
      Some(s"""
        WITH p AS MATERIALIZED (
          SELECT vec_id AS id,
                 CAST(unnest(range(1, len(embedding) + 1)) - 1 AS INTEGER) AS pos,
                 unnest(list_transform(embedding,
                   e -> CAST(floor(CAST(e AS DOUBLE) * 1000.0) AS BIGINT))) AS xq
          FROM embeddings
          WHERE vec_id IS NOT NULL AND embedding IS NOT NULL AND label IS NOT NULL),
        m AS MATERIALIZED (
          SELECT pos, CAST(SUM(CAST(xq AS HUGEINT)) // COUNT(*) AS BIGINT) AS mean_q
          FROM p GROUP BY 1),
        pc AS MATERIALIZED (SELECT id, p.pos, xq - mean_q AS xc FROM p JOIN m USING (pos)),
        v0 AS (SELECT pos, 1000000 AS v FROM m),
        ${(1 to 3).map(pcRoundSql).mkString(",\n")},
        proj AS (SELECT id, SUM(xc * v) AS pr
                 FROM pc JOIN v3 USING (pos) GROUP BY 1),
        lab AS (SELECT vec_id AS id, label FROM embeddings
                WHERE vec_id IS NOT NULL AND embedding IS NOT NULL AND label IS NOT NULL)
        SELECT label, COUNT(*) AS n,
               CAST(SUM(CAST(pr AS HUGEINT)) // COUNT(*) AS BIGINT) AS mean_proj,
               CAST(MIN(pr) AS BIGINT) AS min_proj,
               CAST(MAX(pr) AS BIGINT) AS max_proj
        FROM proj JOIN lab USING (id) GROUP BY 1 ORDER BY label
      """)),
    // ----------------------------------------------------------------
    // One-way ANOVA F per source: does mean doc length differ across
    // languages? Milli fixed-point sum-of-squares split, one double
    // ratio, dofs in the row — the mean-difference complement to
    // q247/q255 on the same cells.
    Q(
      "q259_anova",
      (s, dir) => {
        import s.implicits._
        graft.ext.Profile.oneWayAnova(t(s, dir, "documents"),
            $"source", $"lang", $"n_chars")
          .orderBy($"grp")
      },
      Some(s"""
        WITH arows AS MATERIALIZED (
          SELECT source AS g, lang AS c, n_chars AS v
          FROM documents
          WHERE source IS NOT NULL AND lang IS NOT NULL AND n_chars IS NOT NULL),
        $anovaTailSql
      """)),
    // ----------------------------------------------------------------
    // Brown–Forsythe (robust Levene) per source: equality of SPREAD
    // across languages — the q259 machinery on |v − cell median| with
    // the exact lower median, catching dispersion shifts that leave
    // means alone.
    Q(
      "q260_levene",
      (s, dir) => {
        import s.implicits._
        graft.ext.Profile.brownForsythe(t(s, dir, "documents"),
            $"source", $"lang", $"n_chars")
          .orderBy($"grp")
      },
      Some(s"""
        WITH rws AS MATERIALIZED (
          SELECT source AS g, lang AS c, n_chars AS v
          FROM documents
          WHERE source IS NOT NULL AND lang IS NOT NULL AND n_chars IS NOT NULL),
        med AS (SELECT g, c, v AS m FROM (
                  SELECT g, c, v,
                         ROW_NUMBER() OVER (PARTITION BY g, c ORDER BY v) AS rn,
                         COUNT(*) OVER (PARTITION BY g, c) AS cnt
                  FROM rws)
                WHERE rn = (cnt + 1) // 2),
        arows AS MATERIALIZED (
          SELECT r.g, r.c, abs(r.v - med.m) AS v
          FROM rws r JOIN med ON r.g = med.g AND r.c = med.c),
        $anovaTailSql
      """)),
    // ----------------------------------------------------------------
    // Stationary distribution of the per-user event-type Markov chain:
    // the q118 transition matrix powered to steady state by integer
    // ppm iteration with l1 renormalization — where the session
    // process spends its long-run time.
    Q(
      "q261_stationary_dist",
      (s, dir) => {
        import s.implicits._
        val tm = graft.ext.Funnel.transitionMatrix(
          t(s, dir, "events"), $"user_id", $"ts", $"event_type", $"event_id")
        graft.ext.Graph.stationaryDistribution(
            tm, "from_state", "to_state", "prob_ppb", iters = 6)
          .orderBy($"state")
      },
      Some {
        def round(r: Int): String =
          s"""r${r}r AS MATERIALIZED (
             |  SELECT e.t AS state,
             |         CAST(SUM(CAST(pi AS HUGEINT) * p) // 1000000000 AS BIGINT) AS r
             |  FROM e JOIN pi${r - 1} ON e.f = pi${r - 1}.state GROUP BY 1),
             |pi$r AS MATERIALIZED (SELECT state,
             |  CAST(r * 1000000 // (SELECT SUM(r) FROM r${r}r) AS BIGINT) AS pi
             |  FROM r${r}r)""".stripMargin
        s"""
        WITH pr AS (
          SELECT LAG(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS f,
                 event_type AS t
          FROM events),
        cn AS (SELECT f, t, COUNT(*) AS n FROM pr WHERE f IS NOT NULL GROUP BY 1, 2),
        tt AS (SELECT f, SUM(n) AS tot FROM cn GROUP BY 1),
        tm AS (SELECT cn.f, CAST(cn.t AS VARCHAR) AS t,
                      n * 1000000000 // tot AS p
               FROM cn JOIN tt USING (f)),
        st AS MATERIALIZED (SELECT DISTINCT CAST(f AS VARCHAR) AS state FROM tm),
        e0 AS MATERIALIZED (
          SELECT CAST(tm.f AS VARCHAR) AS f, tm.t, tm.p
          FROM tm JOIN st ON tm.t = st.state),
        e AS MATERIALIZED (
          SELECT f, t, p FROM e0
          UNION ALL
          -- dangling after the gate: implicit self-loop keeps the mass
          SELECT state, state, 1000000000 FROM st
          WHERE state NOT IN (SELECT DISTINCT f FROM e0)),
        pi0 AS (SELECT state, 1000000 AS pi FROM st),
        ${(1 to 6).map(round).mkString(",\n")}
        SELECT st.state, COALESCE(pi6.pi, 0) AS pi_ppm
        FROM st LEFT JOIN pi6 USING (state) ORDER BY state
      """
      })
  )
}
