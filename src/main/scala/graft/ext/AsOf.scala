package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row picks up the value of the
  * most recent right row with the same keys and `rightTs <= leftTs`.
  * The canonical time-series lookup (price as of trade time, last
  * telemetry before an event) that plain equi-joins can't express.
  *
  * Implementation is the UNION-WINDOW algorithm, not a range join: tag
  * both inputs, union them, and run one `last(value, ignoreNulls)` over
  * a (keys, ts, side)-ordered running window, then keep the left rows.
  * One shuffle on the keys, no join at all — a range-condition join
  * would plan as BroadcastNestedLoop/cartesian and explode at scale,
  * while this is O(n log n) per key and AQE-skew-splittable like any
  * window. Right rows order BEFORE left rows at equal timestamps, so
  * the match is at-or-before inclusive (DuckDB `ASOF JOIN ... >=`
  * semantics, which the q66 oracle uses verbatim).
  *
  * Precondition for determinism: the right side has at most one row per
  * (keys, rightTs) — pre-aggregate if it doesn't (the window tiebreak
  * would otherwise pick an arbitrary equal-ts right row).
  *
  * `direction = "forward"` flips the match to the EARLIEST right row
  * with `rightTs >= leftTs` (next quote after the order, first
  * telemetry after the fault) — same union-window plan, the running
  * scan just walks time backwards; equal timestamps still match
  * (DuckDB `ASOF JOIN ... ON l.ts <= r.ts` semantics).
  */
object AsOf {

  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      carry: Seq[String],
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asof direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    // each carry value travels inside a struct whose presence marker is
    // non-null even when the VALUE is null: last(_, ignoreNulls) must
    // stop at the matched right row and surface its null, not skip back
    // to an older row (DuckDB ASOF returns the matched row's null)
    def carryType(c: String) = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__v", right.schema(c).dataType)))
    val l = carry.foldLeft(
        left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))) {
      (df, c) => df.withColumn(s"__r_$c", lit(null).cast(carryType(c)))
    }
    val rBase = right
      .select((keys :+ rightTs).map(col) ++
        carry.map(c => struct(col(c).as("__v")).as(s"__r_$c")): _*)
      .withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))
    // null-pad the left-only columns so the union schemas line up
    val r = leftCols.filterNot(c => keys.contains(c) || c == rightTs).foldLeft(rBase) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    // either direction scans right-before-left at equal timestamps, so
    // an equal-ts right row is visible to its left row (inclusive match)
    val timeOrder =
      if (direction == "backward") col("__ts").asc else col("__ts").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carry.foldLeft(l.unionByName(r)) { (df, c) =>
        df.withColumn(c + "_asof",
          last(col(s"__r_$c"), ignoreNulls = true).over(w).getField("__v"))
      }
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ carry.map(c => col(c + "_asof")): _*)
  }
}
