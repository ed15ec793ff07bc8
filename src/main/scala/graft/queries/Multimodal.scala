package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Media
import Q._

/** Multimodal plumbing as an oracle-checked query: documents' text bytes
  * stand in for media payloads (same opaque-binary path), run through the
  * typed Dataset + mapPartitions feature extraction. The DuckDB oracle
  * replicates the deterministic stub-codec math — verifying the
  * distributed pipeline byte-for-byte.
  */
object Multimodal {

  private def hSql(v: String): String = OracleSql.hash64(v)

  val all: Seq[Q] = Seq(
    Q(
      "q45_multimodal_features",
      (s, dir) => {
        import s.implicits._
        val media = Media.asMedia(
          Tables.load(s, dir, "documents").select($"doc_id", $"text"),
          "doc_id", "text", kind = "image")
        Media.extractFeatures(media, dim = 8).toDF()
          .select(
            $"media_id", $"kind", $"dim",
            element_at($"features", 1).cast("double").as("f0"),
            element_at($"features", 8).cast("double").as("f7"),
            graft.functions.VectorFunctions.arraySum($"features").as("checksum"))
          .orderBy($"media_id")
      },
      Some(s"""
        WITH f AS (
          SELECT doc_id AS media_id, 'image' AS kind, 8 AS dim,
                 list_transform(range(0, 8),
                   i -> CAST((${hSql("md5(text) || ':' || CAST(i AS VARCHAR)")} % 1000) / CAST(1000.0 AS DOUBLE) AS FLOAT)) AS features
          FROM documents)
        SELECT media_id, kind, dim,
               CAST(features[1] AS DOUBLE) AS f0,
               CAST(features[8] AS DOUBLE) AS f7,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(features, x -> CAST(x AS DOUBLE))), (a, x) -> a + x) AS checksum
        FROM f
        ORDER BY media_id
      """))
  )
}
