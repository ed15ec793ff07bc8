package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.{Cleanse, Conform}
import Q._

/** The reference's cleanse/conform operator surface (SURVEY.md §2.A P1-P5,
  * F3-F5, scalar inventory) exercised as oracle-checked queries. Dirty
  * inputs are derived deterministically from testdata keys so Spark and
  * the DuckDB oracle see byte-identical inputs.
  *
  * The lenient-parse UDF path is deliberately NOT reachable here (inputs
  * are ISO-or-garbage): its non-SQL-expressible formats are covered by
  * CleanseSpec instead. Everything below stays whole-stage-codegen.
  */
object Etl {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Deterministic dirty boolean-ish string from a bigint key. */
  private def dirtyBool(key: Column): Column =
    when(key % 13 === 0, lit(null))
      .otherwise(
        when(key % 8 === 0, lit("true")).when(key % 8 === 1, lit("1"))
          .when(key % 8 === 2, lit("yes")).when(key % 8 === 3, lit("T"))
          .when(key % 8 === 4, lit("false")).when(key % 8 === 5, lit("0"))
          .when(key % 8 === 6, lit("no")).otherwise(lit("maybe")))

  private val dirtyBoolSql =
    """CASE WHEN doc_id % 13 = 0 THEN NULL ELSE
      |  CASE doc_id % 8 WHEN 0 THEN 'true' WHEN 1 THEN '1' WHEN 2 THEN 'yes'
      |    WHEN 3 THEN 'T' WHEN 4 THEN 'false' WHEN 5 THEN '0' WHEN 6 THEN 'no'
      |    ELSE 'maybe' END END""".stripMargin

  /** Deterministic dirty timestamp-ish string from a bigint key. */
  private def dirtyTs(key: Column): Column =
    when(key % 7 === 0, lit(null))
      .otherwise(
        when(key % 6 === 0, lit("2024-03-05 10:20:30"))
          .when(key % 6 === 1, lit("2024-03-05"))
          .when(key % 6 === 2, lit("abc"))
          .when(key % 6 === 3, lit("x1"))
          .when(key % 6 === 4, lit("junk text 99"))
          .otherwise(concat(lit("2024-0"), (key % 6).cast("string"), lit("-15 06:30:00"))))

  private def dirtyTsSql(key: String): String =
    s"""CASE WHEN $key % 7 = 0 THEN NULL ELSE
       |  CASE $key % 6 WHEN 0 THEN '2024-03-05 10:20:30' WHEN 1 THEN '2024-03-05'
       |    WHEN 2 THEN 'abc' WHEN 3 THEN 'x1' WHEN 4 THEN 'junk text 99'
       |    ELSE '2024-0' || CAST($key % 6 AS VARCHAR) || '-15 06:30:00' END END""".stripMargin

  /** DuckDB replica of Cleanse.parseBoolean / canonicalizeBooleanString. */
  private def parseBoolSql(c: String) =
    s"""CASE WHEN lower($c) IN ('true','1','yes') THEN TRUE
       |     WHEN lower($c) IN ('false','0','no') THEN FALSE
       |     WHEN $c IS NULL THEN NULL
       |     WHEN length($c) = 1 AND lower($c) = 't' THEN TRUE
       |     WHEN length($c) = 1 AND lower($c) = 'f' THEN FALSE
       |     ELSE NULL END""".stripMargin
  private def canonBoolSql(c: String) =
    s"""CASE WHEN lower($c) IN ('true','1','yes','t') THEN 'TRUE'
       |     WHEN lower($c) IN ('false','0','no','f') THEN 'FALSE'
       |     ELSE $c END""".stripMargin
  private def garbageSql(c: String) =
    s"(regexp_matches($c, '^[A-Za-z]{1,3}$$') OR length($c) <= 3 OR NOT regexp_matches($c, '.*[0-9]+.*'))"

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q30_cleanse_booleans",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id", dirtyBool($"doc_id").as("dirty"))
          .select(
            $"doc_id", $"dirty",
            Cleanse.parseBoolean($"dirty").as("parsed"),
            Cleanse.canonicalizeBooleanString($"dirty").as("canon"))
          .orderBy($"doc_id")
      },
      Some(s"""
        SELECT doc_id, dirty,
               ${parseBoolSql("dirty")} AS parsed,
               ${canonBoolSql("dirty")} AS canon
        FROM (SELECT doc_id, $dirtyBoolSql AS dirty FROM documents)
        ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    Q(
      "q31_cleanse_timestamps",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select($"event_id", dirtyTs($"event_id").as("dirty"))
          .select(
            $"event_id", $"dirty",
            coalesce(Cleanse.garbageTemporal($"dirty"), lit(false)).as("is_garbage"),
            tstr(Cleanse.toTimestampLenient($"dirty")).as("parsed_ts"))
          .orderBy($"event_id")
      },
      Some(s"""
        SELECT event_id, dirty,
               COALESCE(${garbageSql("dirty")}, FALSE) AS is_garbage,
               strftime(CASE WHEN ${garbageSql("dirty")} THEN NULL
                             ELSE TRY_CAST(dirty AS TIMESTAMP) END,
                        '%Y-%m-%d %H:%M:%S') AS parsed_ts
        FROM (SELECT event_id, ${dirtyTsSql("event_id")} AS dirty FROM events)
        ORDER BY event_id
      """)),
    // ----------------------------------------------------------------
    // Full conform chain (rename→pad→transform→metadata→reorder→sweep)
    // over a synthetic lead_xref feed derived from events; fixed clock so
    // the ETL_* columns are deterministic.
    Q(
      "q32_conform_lead_xref",
      (s, dir) => {
        import s.implicits._
        val clock = to_timestamp(lit("2025-01-01 00:00:00"))
        val feed = t(s, dir, "events").select(
          $"event_id".cast("string").as("LeadXrefGuid"), // case-insensitive rename
          concat(lit("LC"), $"event_id".cast("string")).as("leadcode"),
          $"event_type".as("leadlevel"),
          dirtyTs($"event_id").as("createdate"),
          when($"event_id" % 3 === 0, lit(null))
            .otherwise(lit("2024-06-01 12:00:00")).as("modifydate"),
          dirtyBool($"event_id").as("isdeletedsource"),
          lit("dropped-later").as("noise_column"))
        val out = Conform.conform(feed, "lead_xref", clock)
        out.select(out.schema.fields.toSeq.map { f =>
          f.dataType match {
            case _: org.apache.spark.sql.types.TimestampType => tstr(col(f.name)).as(f.name)
            case _ => col(f.name)
          }
        }: _*).orderBy(length($"LEAD_XREF_GUID"), $"LEAD_XREF_GUID")
      },
      Some(s"""
        SELECT CAST(NULL AS VARCHAR) AS STG_LCR_LEAD_XREF_KEY,
               CAST(event_id AS VARCHAR) AS LEAD_XREF_GUID,
               CAST(NULL AS VARCHAR) AS LEGACY_LEAD_ID,
               'LC' || CAST(event_id AS VARCHAR) AS LEAD_CODE,
               CAST(NULL AS VARCHAR) AS LEAD_LEVEL_ID,
               event_type AS LEAD_LEVEL,
               CAST(NULL AS VARCHAR) AS DATA_SOURCE_ID,
               CAST(NULL AS VARCHAR) AS LEVEL_DATE,
               strftime(CASE WHEN ${garbageSql("dirty")} THEN NULL
                             ELSE TRY_CAST(dirty AS TIMESTAMP) END,
                        '%Y-%m-%d %H:%M:%S') AS CREATE_DATE,
               CASE WHEN event_id % 3 = 0 THEN NULL
                    ELSE '2024-06-01 12:00:00' END AS MODIFY_DATE,
               CAST(NULL AS VARCHAR) AS AVAILABLE_FOR_PURCHASE_IND,
               ${canonBoolSql("boolish")} AS IS_DELETED_SOURCE,
               CAST(NULL AS VARCHAR) AS LEAD_LEVEL_ALIAS,
               '2025-01-01 00:00:00' AS ETL_CREATED_DATE,
               '2025-01-01 00:00:00' AS ETL_LAST_UPDATE_DATE,
               'ETL_PROCESS' AS CREATED_BY,
               TRUE AS TO_PROCESS,
               'LeadCustodyRepository' AS EDW_EXTERNAL_SOURCE_SYSTEM
        FROM (SELECT event_id, event_type,
                     ${dirtyTsSql("event_id")} AS dirty,
                     $dirtyBoolSql2 AS boolish
              FROM events)
        ORDER BY length(CAST(event_id AS VARCHAR)), CAST(event_id AS VARCHAR)
      """))
  )

  // dirtyBool over event_id instead of doc_id (same rule, different key)
  private def dirtyBoolSql2: String = dirtyBoolSql.replace("doc_id", "event_id")
}
