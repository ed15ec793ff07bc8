package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Profile, Retrieval, Sampling, TextAnalysis}
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
      """))
  )
}
