package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Graph, Profile, Retrieval, Sampling, TextHash}
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
          FROM documents WHERE text IS NOT NULL),
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
          FROM documents WHERE text IS NOT NULL),
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
        ORDER BY c_nationkey, bal_bucket
      """))
  )
}
