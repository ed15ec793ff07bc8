package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiler: per column — row count, non-null count,
  * exact distinct count, min/max (as canonical strings so mixed-type
  * columns stack into one long-format result). The data-quality
  * snapshot a pipeline takes before/after each load (the reference
  * reconciles bare row counts, sync.py:90; this is the same idea with
  * per-column depth).
  *
  * All columns profile in ONE aggregation over one scan: Spark plans
  * the multiple count(DISTINCT) via a single Expand (rows × columns),
  * so the input is read once regardless of how many columns are
  * profiled. Exact distinct is the oracle-checkable default; at 100 TB
  * swap `approxDistinct = true` to replace the Expand with one
  * HLL-sketch pass (no per-column row multiplication).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], approxDistinct: Boolean = false): DataFrame = {
    def nd(c: String): Column =
      if (approxDistinct) approx_count_distinct(col(c)) else countDistinct(col(c))
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        nd(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = cols.map { c =>
      struct(
        lit(c).as("col_name"), col("__n").as("n_rows"), col(s"__nn_$c").as("n_nonnull"),
        col(s"__nd_$c").as("n_distinct"), col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }
}
