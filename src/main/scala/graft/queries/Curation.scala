package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.Dedup
import Q._

/** Round-3 corpus-curation surface: dedup clustering (pairs → connected
  * components → canonical survivors), warehouse merge semantics
  * (upsert / SCD type-2), per-source caps, Gopher-style quality rules,
  * and embedding quantization. Oracles replicate each algorithm in
  * DuckDB (same hash formulas, same fold order) — they verify the
  * implementation, not plausibility.
  */
object Curation {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // Near-dup pairs → transitive closure → clusters with a canonical
    // survivor. The oracle computes the same pairs with the plain
    // inverted-index join, then closes them with a recursive CTE — an
    // independent formulation of connectivity (fixpoint recursion there,
    // label propagation + pointer jumping here).
    Q(
      "q74_dedup_clusters",
      (s, dir) => {
        import s.implicits._
        Dedup.nearDupClusters(t(s, dir, "documents"), "doc_id", "text",
          shingleSize = 3, threshold = 0.6)
          .orderBy($"doc_id")
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
        csz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY 1)
        SELECT id AS doc_id, cluster_id, cluster_size,
               (id = cluster_id) AS is_canonical
        FROM comp JOIN csz USING (cluster_id)
        ORDER BY doc_id
      """))
  )
}
