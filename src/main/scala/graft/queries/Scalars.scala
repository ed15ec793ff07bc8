package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Q._

/** Scalar-function surface: string, date/time, math, conditional, JSON,
  * array/higher-order, explode. SURVEY.md §2.B row "Scalar fns".
  * All pure `Column` expressions — whole-stage-codegen friendly, no UDFs.
  */
object Scalars {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q24_string_fns",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .select(
            $"p_partkey",
            lower($"p_name").as("lname"),
            upper($"p_brand").as("ubrand"),
            substring($"p_type", 1, 5).as("type5"),
            length($"p_name").cast("long").as("name_len"),
            concat($"p_brand", lit("#"), $"p_type").as("brand_type"),
            split($"p_name", " ").getItem(0).as("first_word"),
            trim($"p_name").as("trimmed"),
            regexp_replace($"p_name", "[aeiou]", "_").as("devoweled"),
            lpad($"p_brand", 12, "0").as("padded"))
          .orderBy($"p_partkey")
      },
      Some("""
        SELECT p_partkey,
               lower(p_name) AS lname,
               upper(p_brand) AS ubrand,
               substring(p_type, 1, 5) AS type5,
               CAST(length(p_name) AS BIGINT) AS name_len,
               p_brand || '#' || p_type AS brand_type,
               string_split(p_name, ' ')[1] AS first_word,
               trim(p_name) AS trimmed,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
               lpad(p_brand, 12, '0') AS padded
        FROM part
        ORDER BY p_partkey
      """)),
    // ----------------------------------------------------------------
    Q(
      "q25_datetime_fns",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .select(
            $"o_orderkey",
            year($"o_orderdate").cast("long").as("yr"),
            month($"o_orderdate").cast("long").as("mo"),
            dayofmonth($"o_orderdate").cast("long").as("dom"),
            tstr(date_trunc("month", $"o_orderdate")).as("month_start"),
            datediff($"o_orderdate", to_date(lit("1995-01-01")))
              .cast("long").as("days_since"),
            date_format($"o_orderdate", "yyyy-MM").as("ym"))
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS mo,
               CAST(day(o_orderdate) AS BIGINT) AS dom,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
               CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
               strftime(o_orderdate, '%Y-%m') AS ym
        FROM orders
        ORDER BY o_orderkey
      """)),
    // ----------------------------------------------------------------
    Q(
      "q26_math_cond",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .select(
            $"c_custkey",
            round($"c_acctbal", 1).as("bal_r1"),
            abs($"c_acctbal").as("bal_abs"),
            floor($"c_acctbal").cast("long").as("bal_floor"),
            ceil($"c_acctbal").cast("long").as("bal_ceil"),
            when($"c_acctbal" < 0.0, lit("debt"))
              .when($"c_acctbal" < 1000.0, lit("low"))
              .otherwise(lit("high")).as("bal_band"),
            coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("__masked__"))
              .as("seg_masked"),
            greatest($"c_acctbal", lit(0.0)).as("bal_pos"),
            least($"c_nationkey".cast("long"), lit(10L)).as("nk_cap"))
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey,
               round(c_acctbal, 1) AS bal_r1,
               abs(c_acctbal) AS bal_abs,
               CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
               CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
               CASE WHEN c_acctbal < 0.0 THEN 'debt'
                    WHEN c_acctbal < 1000.0 THEN 'low'
                    ELSE 'high' END AS bal_band,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '__masked__') AS seg_masked,
               greatest(c_acctbal, 0.0) AS bal_pos,
               least(CAST(c_nationkey AS BIGINT), 10) AS nk_cap
        FROM customer
        ORDER BY c_custkey
      """)),
    // ----------------------------------------------------------------
    Q(
      "q27_json_extract",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select($"event_type",
            get_json_object($"props", "$.k").cast("long").as("k"))
          .groupBy($"event_type")
          .agg(
            count($"k").as("n"),
            sum($"k").as("sum_k"),
            min($"k").as("min_k"),
            max($"k").as("max_k"))
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type,
               COUNT(k) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
               MIN(k) AS min_k, MAX(k) AS max_k
        FROM (SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events)
        GROUP BY event_type
        ORDER BY event_type
      """)),
    // ----------------------------------------------------------------
    Q(
      "q28_array_fns",
      (s, dir) => {
        import s.implicits._
        // higher-order functions over array<float>: no UDF, stays codegen.
        val asDouble = transform($"embedding", x => x.cast("double"))
        t(s, dir, "embeddings")
          .select(
            $"vec_id",
            size($"embedding").cast("long").as("dim"),
            element_at($"embedding", 1).cast("double").as("e1"),
            aggregate(asDouble, lit(0.0), (acc, x) => acc + x).as("vec_sum"),
            aggregate(asDouble, lit(0.0), (acc, x) => acc + x * x).as("vec_sq"),
            size(filter(asDouble, x => x > 0.0)).cast("long").as("n_pos"))
          .orderBy($"vec_id")
      },
      Some("""
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS dim,
               CAST(embedding[1] AS DOUBLE) AS e1,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(embedding, x -> CAST(x AS DOUBLE))), (a,b) -> a + b) AS vec_sum,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b) AS vec_sq,
               CAST(len(list_filter(list_transform(embedding, x -> CAST(x AS DOUBLE)), x -> x > 0.0)) AS BIGINT) AS n_pos
        FROM embeddings
        ORDER BY vec_id
      """)),
    // ----------------------------------------------------------------
    Q(
      "q29_explode_tokens",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select(explode(split($"text", " ")).as("token"))
          .filter(length($"token") > 0)
          .groupBy($"token")
          .agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"token")
          .limit(50)
      },
      Some("""
        SELECT token, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        WHERE length(token) > 0
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 50
      """)),
    // ----------------------------------------------------------------
    // Conditional/boolean aggregate completion: count_if, bool_and,
    // bool_or, max_by/min_by. The max_by/min_by ordering key is the
    // UNIQUE c_custkey — with a non-unique key the pick is tie-broken
    // by partition order and no oracle could reproduce it.
    Q(
      "q110_conditional_aggs",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .groupBy($"c_nationkey")
          .agg(
            count_if($"c_acctbal" > 0).as("n_positive"),
            expr("bool_and(c_acctbal > -1000.0)").as("none_deep_debt"),
            expr("bool_or(c_acctbal > 9000.0)").as("any_rich"),
            max_by($"c_name", $"c_custkey").as("newest_name"),
            min_by($"c_name", $"c_custkey").as("oldest_name"))
          .orderBy($"c_nationkey")
      },
      Some("""
        SELECT c_nationkey,
               CAST(SUM(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_positive,
               bool_and(c_acctbal > -1000.0) AS none_deep_debt,
               bool_or(c_acctbal > 9000.0) AS any_rich,
               arg_max(c_name, c_custkey) AS newest_name,
               arg_min(c_name, c_custkey) AS oldest_name
        FROM customer
        GROUP BY c_nationkey ORDER BY c_nationkey
      """)),
    // ----------------------------------------------------------------
    // regexp_extract_all surface: every >=6-letter token, flattened to
    // a joined string (array cells don't canonicalize in the harness —
    // the q59 flatten rule). Pattern stays in the RE2-and-Java-common
    // subset, same contract as q65/q78.
    Q(
      "q111_regexp_extract_all",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select(
            $"doc_id",
            array_join(regexp_extract_all($"text", lit("[a-z]{6,}"), lit(0)), " ")
              .as("long_words"),
            size(regexp_extract_all($"text", lit("[a-z]{6,}"), lit(0)))
              .cast("long").as("n_long"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               -- DuckDB array_to_string([]) is NULL; Spark array_join([]) is ''
               COALESCE(array_to_string(regexp_extract_all(text, '[a-z]{6,}'), ' '), '')
                 AS long_words,
               CAST(len(regexp_extract_all(text, '[a-z]{6,}')) AS BIGINT)
                 AS n_long
        FROM documents ORDER BY doc_id
      """))
  )
}
