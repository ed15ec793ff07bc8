package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One catalog entry: a Spark query plus (when SQL-expressible) the
  * equivalent DuckDB SQL the driver uses as a correctness oracle.
  *
  * Oracle-parity rules (both sides must follow them or the value hash
  * diverges for reasons that have nothing to do with correctness):
  *   - numeric aggregates go through exact DECIMAL(38,10) arithmetic and
  *     are cast to DOUBLE at the end — double summation is
  *     order-dependent and Spark/DuckDB reduce in different orders;
  *   - timestamps are formatted to strings ('yyyy-MM-dd HH:mm:ss') —
  *     parquet tz-annotation round-trips differ between writers;
  *   - every computed column is aliased identically in both dialects;
  *   - results carry an ORDER BY over a unique key set (DuckDB default
  *     is NULLS LAST, Spark's is NULLS FIRST — sort keys must be
  *     non-null or explicitly NULLS FIRST in the SQL).
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Exact decimal accumulator type for double-safe aggregation. */
  val Dec: DecimalType = DecimalType(38, 10)

  /** Order-insensitive exact sum of a double expression, as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** avg with deterministic IEEE semantics: exact sum / count. */
  def davg(c: Column): Column = dsum(c) / count(c).cast("double")

  /** Timestamp → canonical string (matches DuckDB strftime '%Y-%m-%d %H:%M:%S'). */
  def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
