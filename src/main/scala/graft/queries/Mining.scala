package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Dedup, Joins, Profile, Retrieval, Sampling, TextAnalysis}
import Q._

/** Round-5 data-selection / corpus-mining surface: BM25 probe-set
  * retrieval, one-pass correlation profiling, weighted importance
  * sampling, and corpus-level boilerplate measurement. Oracles
  * replicate the exact arithmetic (same IEEE op order, same
  * exact-decimal sums) in DuckDB — they verify the algorithm, not
  * plausibility.
  */
object Mining {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Columns profiled by q87; shared with its oracle generator. */
  private val CorrCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  private def corrOracle: String = {
    import OracleSql.dsum
    val cols = CorrCols
    val pairs = for { i <- cols.indices; j <- i + 1 until cols.size } yield (cols(i), cols(j))
    val sums =
      cols.map(c => s"${dsum(c)} AS s_$c, ${dsum(s"$c * $c")} AS ss_$c") ++
        pairs.map { case (a, b) => s"${dsum(s"$a * $b")} AS sp_${a}__$b" }
    val arms = pairs.map { case (a, b) =>
      val den = s"sqrt(n * ss_$a - s_$a * s_$a) * sqrt(n * ss_$b - s_$b * s_$b)"
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
         |  CASE WHEN $den > 0
         |       THEN (n * sp_${a}__$b - s_$a * s_$b) / ($den)
         |       ELSE NULL END AS corr
         |FROM a""".stripMargin
    }
    s"""
      WITH a AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               ${sums.mkString(",\n               ")}
        FROM lineitem)
      ${arms.mkString("\n      UNION ALL\n      ")}
      ORDER BY col_a, col_b
    """
  }

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // BM25 probe-set retrieval: rank the corpus by relevance to a fixed
    // term set — the data-selection primitive (domain mining,
    // contamination triage). Rational idf (no log) keeps the doubles
    // bit-reproducible; the oracle re-derives score with the identical
    // IEEE op order, so the top-k hash-matches exactly.
    Q(
      "q86_bm25_topk",
      (s, dir) => {
        import s.implicits._
        Retrieval.bm25TopK(t(s, dir, "documents"), $"doc_id", $"text",
          terms = Seq("join", "vector", "stream", "window"), k = 20)
      },
      Some(s"""
        WITH base AS (
          SELECT doc_id, ${OracleSql.tokens("lower(text)")} AS toks
          FROM documents WHERE text IS NOT NULL),
        d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM base),
        stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ${OracleSql.dsum("dl")} / CAST(COUNT(*) AS DOUBLE) AS avgdl
          FROM d),
        tf AS (
          SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
          WHERE term IN ('join', 'vector', 'stream', 'window')
          GROUP BY 1, 2, 3),
        dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        scored AS (
          SELECT doc_id,
                 ((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
                    (CAST(df AS DOUBLE) + 0.5)) *
                 (CAST(tf AS DOUBLE) * (1.2 + 1.0) /
                    (CAST(tf AS DOUBLE) +
                     1.2 * ((1.0 - 0.75) + CAST(dl AS DOUBLE) / avgdl * 0.75))) AS s
          FROM tf JOIN dfreq USING (term) CROSS JOIN stats)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
               ${OracleSql.dsum("s")} AS score
        FROM scored GROUP BY doc_id
        ORDER BY score DESC, doc_id LIMIT 20
      """)),
    // ----------------------------------------------------------------
    // One-pass all-pairs Pearson correlation: n + decimal Σx/Σx²/Σxy
    // for every pair in ONE aggregate over the fact table, formula on
    // the 1-row result. The oracle recomputes the same decimal sums
    // and the same double op order.
    Q(
      "q87_corr_matrix",
      (s, dir) =>
        Profile.corrMatrix(t(s, dir, "lineitem"), CorrCols)
          .orderBy(col("col_a"), col("col_b")),
      Some(corrOracle)),
    // ----------------------------------------------------------------
    // Weighted deterministic Bernoulli sampling: keep probability
    // proportional to weight (importance sampling for training mixes),
    // membership a pure function of the key so the oracle reproduces
    // the exact sample.
    Q(
      "q88_weighted_sample",
      (s, dir) => {
        import s.implicits._
        Sampling.weightedHashSample(
            t(s, dir, "documents").select($"doc_id", $"n_chars"),
            $"doc_id", $"n_chars", targetRate = 0.2)
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH w AS (
          SELECT doc_id, n_chars,
                 GREATEST(COALESCE(CAST(n_chars AS DOUBLE), 0.0), 0.0) AS wt
          FROM documents),
        m AS (
          SELECT ${OracleSql.dsum("wt")} / CAST(COUNT(*) AS DOUBLE) AS meanw
          FROM w)
        SELECT doc_id, n_chars
        FROM w, m
        WHERE ${OracleSql.hash64("CAST(doc_id AS VARCHAR)")} % 10000 <
              CAST(floor(LEAST(1.0, 0.2 * wt / meanw) * 10000) AS BIGINT)
        ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Corpus-level boilerplate: fraction of each doc's distinct word
    // 3-grams shared with >= 1 other doc (C4-style chrome/template
    // signal). Full 60-bit hash space — no modulus — so cross-doc hash
    // collisions can't fake sharing.
    Q(
      "q89_boilerplate",
      (s, dir) => {
        import s.implicits._
        TextAnalysis.boilerplateFractions(
            t(s, dir, "documents"), $"doc_id", $"text",
            shingleSize = 3, minDocs = 2)
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH sh AS (
          SELECT doc_id, ${OracleSql.hashedShingles3Full("text")} AS gs
          FROM documents),
        post AS (SELECT doc_id, unnest(gs) AS g FROM sh),
        dfreq AS (SELECT g, COUNT(*) AS df FROM post GROUP BY 1),
        pd AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                 CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
          FROM post JOIN dfreq USING (g) GROUP BY 1)
        SELECT d.doc_id,
               COALESCE(n_grams, 0) AS n_grams,
               COALESCE(n_boiler, 0) AS n_boiler,
               CASE WHEN COALESCE(n_grams, 0) > 0
                    THEN CAST(n_boiler AS DOUBLE) / CAST(n_grams AS DOUBLE)
                    ELSE 0.0 END AS boiler_frac
        FROM documents d LEFT JOIN pd USING (doc_id)
        ORDER BY d.doc_id
      """)),
    // ----------------------------------------------------------------
    // Bloom-pruned semi-join: the fact table is filtered in the scan
    // stage by a bloom of the dim keys BEFORE the exact shuffle
    // semi-join. The bloom only passes false positives and the exact
    // join removes them, so the result is byte-identical to the plain
    // semi-join the oracle runs.
    Q(
      "q90_bloom_semijoin",
      (s, dir) => {
        import s.implicits._
        Joins.bloomPrunedSemiJoin(
            t(s, dir, "lineitem").select($"l_orderkey", $"l_linenumber", $"l_extendedprice"),
            $"l_orderkey",
            t(s, dir, "orders").filter($"o_totalprice" > 150000.0),
            $"o_orderkey",
            expectedItems = 100000L)
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        WHERE l_orderkey IN
              (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0)
        ORDER BY l_orderkey, l_linenumber
      """)),
    // ----------------------------------------------------------------
    // Passage-level exact-substring dedup: maximal per-doc spans
    // covered by a 10-token window that occurs verbatim in >= 2 docs.
    // The oracle recomputes the same window hashes and merges islands
    // with the same running-max formulation.
    Q(
      "q91_passage_spans",
      (s, dir) => {
        import s.implicits._
        Dedup.passageDupSpans(t(s, dir, "documents"), "doc_id", "text",
            window = 10, stride = 5)
          .orderBy($"doc_id", $"span_start")
      },
      Some(s"""
        WITH base AS (
          SELECT doc_id, ${OracleSql.tokens("text")} AS toks FROM documents),
        wins AS (
          SELECT doc_id, CAST(st AS BIGINT) AS s,
                 ${OracleSql.hash64("array_to_string(list_slice(toks, st + 1, st + 10), ' ')")} AS h
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(0, len(toks) - 10, 5)) AS st
                FROM base WHERE len(toks) >= 10)),
        dup AS (SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
        m AS (SELECT doc_id, s, s + 10 AS e FROM wins JOIN dup USING (h)),
        isl AS (
          SELECT doc_id, s, e,
                 MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
          FROM m),
        isl2 AS (
          SELECT doc_id, s, e,
                 SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          FROM isl)
        SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end,
               CAST(COUNT(*) AS BIGINT) AS n_windows
        FROM isl2 GROUP BY doc_id, island
        ORDER BY doc_id, span_start
      """)),
    // ----------------------------------------------------------------
    // Cross-document exact-substring dedup (the Lee et al. '22 span
    // operator): PLANTED cross-doc repeats — each doc_id % 20 < 2 pair
    // shares a unique 10-token passage appended to otherwise-unrelated
    // texts — must come back as aligned per-pair spans. Window hashes
    // at stride 1 (alignment-exact), df gate 2..8 (the Σdf² bound;
    // natural exact-dup clusters in the corpus stay under it, a
    // hypothetical viral passage is excluded by design), hash-keyed
    // pair join, diagonal island merge. The oracle replays hashes,
    // gate, pairs, and the running-max merge verbatim.
    Q(
      "q245_crossdoc_spans",
      (s, dir) => {
        import s.implicits._
        val bucket = expr("doc_id div 20")
        val passage = concat_ws(" ",
          (0 until 10).map(j =>
            concat(lit("p"), bucket.cast("string"), lit(s"_$j"))): _*)
        val src = t(s, dir, "documents").select($"doc_id",
          when($"doc_id" % 20 < 2, concat($"text", lit(" "), passage))
            .otherwise($"text").as("text"))
        Dedup.crossDocDupSpans(src, "doc_id", "text", window = 8, maxDf = 8,
            maxPerDoc = 8)
          .orderBy($"id_a", $"id_b", $"a_start", $"b_start")
      },
      Some(s"""
        WITH src AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 20 < 2 THEN text || ' ' ||
                   ${(0 until 10).map(j => s"'p' || CAST(doc_id // 20 AS VARCHAR) || '_$j'")
                     .mkString(" || ' ' || ")}
                 ELSE text END AS text
          FROM documents),
        base AS (
          SELECT doc_id, ${OracleSql.tokens("text")} AS toks FROM src),
        wins AS (
          SELECT doc_id, CAST(st AS BIGINT) AS s,
                 ${OracleSql.hash64("array_to_string(list_slice(toks, st + 1, st + 8), ' ')")} AS h
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(0, len(toks) - 8, 1)) AS st
                FROM base WHERE len(toks) >= 8)),
        ok AS (SELECT h FROM wins GROUP BY h
               HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 8),
        posts AS (
          SELECT doc_id, s, h FROM (
            SELECT doc_id, s, h,
                   ROW_NUMBER() OVER (PARTITION BY doc_id, h ORDER BY s) AS occ
            FROM wins JOIN ok USING (h))
          WHERE occ <= 8),
        m AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 a.s AS sa, a.s + 8 AS ea, b.s - a.s AS diag
          FROM posts a JOIN posts b
            ON a.h = b.h AND a.doc_id < b.doc_id),
        isl AS (
          SELECT *, MAX(ea) OVER (PARTITION BY id_a, id_b, diag ORDER BY sa
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
          FROM m),
        isl2 AS (
          SELECT *, SUM(CASE WHEN pm IS NULL OR sa > pm THEN 1 ELSE 0 END)
                   OVER (PARTITION BY id_a, id_b, diag ORDER BY sa
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          FROM isl)
        SELECT id_a, id_b, MIN(sa) AS a_start, MAX(ea) AS a_end,
               MIN(sa) + diag AS b_start, MAX(ea) + diag AS b_end,
               CAST(COUNT(*) AS BIGINT) AS n_windows
        FROM isl2 GROUP BY id_a, id_b, diag, island
        ORDER BY id_a, id_b, a_start, b_start
      """)),
    // ----------------------------------------------------------------
    // Frequency-capped soft dedup: at most 2 docs survive per near-dup
    // cluster; singletons always survive. The oracle closes the pair
    // graph with a recursive CTE (independent connectivity
    // formulation) and caps with row_number.
    Q(
      "q92_cap_per_cluster",
      (s, dir) => {
        import s.implicits._
        Dedup.capPerCluster(t(s, dir, "documents"), "doc_id", "text",
            cap = 2, shingleSize = 3, threshold = 0.6)
          .orderBy($"cluster_id", $"rank")
      },
      Some(s"""
        WITH RECURSIVE sh AS (
          SELECT doc_id, ${OracleSql.hashedShingles3("text")} AS shingles
          FROM documents),
        post AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
        sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT id_a, id_b
          FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
          WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.6),
        bidir AS (
          SELECT id_a AS s, id_b AS d FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(id, lab) AS (
          SELECT DISTINCT s, s FROM bidir
          UNION
          SELECT e.d, r.lab FROM reach r JOIN bidir e ON e.s = r.id),
        comp AS (SELECT id, MIN(lab) AS cluster_id FROM reach GROUP BY id),
        lab AS (
          SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
        rk AS (
          SELECT cluster_id,
                 CAST(ROW_NUMBER() OVER
                   (PARTITION BY cluster_id ORDER BY doc_id) AS INTEGER) AS rank,
                 doc_id
          FROM lab)
        SELECT cluster_id, rank, doc_id FROM rk WHERE rank <= 2
        ORDER BY cluster_id, rank
      """)),
    // ----------------------------------------------------------------
    // Robust outlier detection: |x - median| / (1.4826 * MAD) > 3 per
    // event type. Exact percentile both sides -> identical medians ->
    // identical robust z doubles.
    Q(
      "q93_robust_outliers",
      (s, dir) => {
        import s.implicits._
        Profile.robustOutliers(
            t(s, dir, "events").select($"event_id", $"event_type", $"value"),
            Seq("event_type"), $"value", k = 3.0)
          .select($"event_id", $"event_type", $"value", $"robust_z")
          .orderBy($"event_id")
      },
      Some("""
        WITH m AS (
          SELECT event_type, quantile_cont(CAST(value AS DOUBLE), 0.5) AS med
          FROM events GROUP BY 1),
        d AS (
          SELECT event_id, e.event_type, CAST(value AS DOUBLE) AS v, med
          FROM events e JOIN m USING (event_type)),
        md AS (
          SELECT event_type, quantile_cont(abs(v - med), 0.5) AS mad
          FROM d GROUP BY 1)
        SELECT event_id, event_type, v AS value,
               (v - med) / (mad * 1.4826) AS robust_z
        FROM d JOIN md USING (event_type)
        WHERE mad > 0 AND abs(v - med) / (mad * 1.4826) > 3.0
        ORDER BY event_id
      """)),
    // ----------------------------------------------------------------
    // Per-group z-score normalization with exact-decimal moment sums;
    // sample std (n-1), zero-variance -> null. The broadcast-stats
    // plan never shuffles the input itself.
    Q(
      "q94_zscore_norm",
      (s, dir) => {
        import s.implicits._
        Profile.zscoreNormalize(
            t(s, dir, "lineitem")
              .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_quantity"),
            Seq("l_returnflag"), $"l_quantity")
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some(s"""
        WITH st AS (
          SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
                 ${OracleSql.dsum("l_quantity")} AS s,
                 ${OracleSql.dsum("l_quantity * l_quantity")} AS ss
          FROM lineitem GROUP BY 1)
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
               CASE WHEN (ss - s * s / n) / (n - 1.0) > 0
                    THEN (l_quantity - s / n) / sqrt((ss - s * s / n) / (n - 1.0))
                    ELSE NULL END AS z
        FROM lineitem JOIN st USING (l_returnflag)
        ORDER BY l_orderkey, l_linenumber
      """))
  )
}
