package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse merge semantics as pure relational plans.
  *
  * The reference's incremental mode appends the delta and leaves
  * last-write-wins to readers (`/root/reference/ingest.py:783-807`,
  * `write_mode="delta_insert"`); a consumer-facing table needs the
  * merge itself. Both operators here are single-shuffle formulations —
  * the MERGE INTO of transactional table formats re-expressed as plans
  * any sink can materialize.
  */
object Merge {

  /** Upsert: rows of `updates` replace same-key rows of `base`; keys
    * only in one side pass through. Both sides must share the schema
    * and be unique per key (the usual staging-table contract; enforced
    * upstream by [[graft.ext.Dedup.latestByKey]] when the delta carries
    * multiple versions).
    *
    * Formulated as union + per-key priority pick, NOT as a full outer
    * join: one shuffle on the key, no join at all, and the window sort
    * is (key, prio) — 2 values of prio — so the per-partition sort is
    * effectively a counting pass. At 100 TB the delta is typically tiny
    * next to base; AQE splits any hot key's partition. A broadcast
    * outer join would be the alternative only when base is bucketed on
    * the key and re-shuffling it is the cost to avoid.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(base.columns.sorted.sameElements(updates.columns.sorted),
      s"upsert: schemas differ: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__prio"))
    updates.withColumn("__prio", lit(0))
      .unionByName(base.withColumn("__prio", lit(1)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__prio", "__rn")
  }

  /** Runtime guard for change-log op markers: anything but 'U'/'D'
    * (including NULL) raises a clear error at execution. Without this
    * a NULL op would WIN the priority window and then fail the
    * `=!= "D"` filter as three-valued NULL — the key silently
    * disappears, which is data loss, not merge semantics.
    */
  private[graft] def validatedOp(op: Column): Column =
    when(op.isin("U", "D"), op)
      .otherwise(raise_error(concat(
        lit("applyChangeLog: op must be 'U' or 'D', got "),
        coalesce(op, lit("NULL")))))

  /** Change-log apply with delete tombstones: like [[upsert]], but
    * each change row carries an op marker — `"U"` replaces/inserts,
    * `"D"` removes the key. The same single-shuffle union +
    * per-key-priority formulation (no join): the winning row per key
    * is the change if one exists, and a winning delete drops the key
    * entirely. Deleting an absent key is a no-op, as MERGE semantics
    * require. `changes` must share `base`'s schema plus the op column
    * and be unique per key ([[graft.ext.Dedup.latestByKey]] upstream
    * when a batch carries several versions).
    */
  def applyChangeLog(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      opCol: String): DataFrame = {
    require(changes.columns.contains(opCol), s"applyChangeLog: changes lacks op column $opCol")
    // names AND types: a retyped column would pass a name-only check
    // and then silently widen under unionByName (or fail late in
    // analysis), changing base's output schema
    val baseTypes = base.schema.fields.map(f => f.name -> f.dataType).toMap
    val changeTypes = changes.schema.fields.filterNot(_.name == opCol)
      .map(f => f.name -> f.dataType).toMap
    val mismatches = (baseTypes.keySet ++ changeTypes.keySet).toSeq.sorted.flatMap { n =>
      (baseTypes.get(n), changeTypes.get(n)) match {
        case (Some(a), Some(b)) if a == b => None
        case (a, b) => Some(s"$n: ${a.map(_.sql).getOrElse("missing")} vs " +
          s"${b.map(_.sql).getOrElse("missing")}")
      }
    }
    require(mismatches.isEmpty,
      s"applyChangeLog: schemas differ (base vs changes) — ${mismatches.mkString("; ")}")
    // internal column names must not collide with the CALLER's op
    // column (the streaming sink passes opCol = "__op"): withColumn
    // would otherwise REPLACE it and the following drop would erase
    // the ops before the union — deletes silently become keeps
    val (opI, prioI, rnI) = ("__cl_op", "__cl_prio", "__cl_rn")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(prioI))
    changes.withColumn(opI, validatedOp(col(opCol))).drop(opCol)
      .withColumn(prioI, lit(0))
      .unionByName(base.withColumn(opI, lit("U")).withColumn(prioI, lit(1)))
      .withColumn(rnI, row_number().over(w))
      .filter(col(rnI) === 1 && col(opI) =!= "D")
      .drop(prioI, rnI, opI)
  }

  /** SCD type-2 history from a change log: collapse consecutive
    * no-op rows (tracked attribute unchanged), then interval-ize —
    * `valid_from` = first ts of the run, `valid_to` = start of the next
    * run (null while current), `version` = 1-based run index.
    *
    * One shuffle: both windows partition by `key` and order by
    * (`ts`, tiebreak), so Catalyst plans a single Exchange + Sort and
    * runs the lag and lead passes over the same sorted partitions.
    * State never accumulates — this is the batch twin of
    * sessionization, with attribute-change as the boundary instead of
    * a gap timeout.
    *
    * @param tiebreak total-orders simultaneous events per key (change
    *                 logs carry same-timestamp rows; without it both
    *                 the runs and the intervals would be
    *                 nondeterministic under retry).
    */
  def scd2FromChangeLog(
      log: DataFrame,
      key: Column,
      ts: Column,
      attr: Column,
      tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tiebreak)
    val runs = log
      .select(key.as("key"), ts.as("__ts"), attr.as("attr"), tiebreak.as("__tb"))
      .withColumn("__prev", lag(col("attr"), 1).over(
        Window.partitionBy(col("key")).orderBy(col("__ts"), col("__tb"))))
      .filter(col("__prev").isNull || !(col("__prev") <=> col("attr")))
    val w2 = Window.partitionBy(col("key")).orderBy(col("__ts"), col("__tb"))
    runs
      .withColumn("valid_from", col("__ts"))
      .withColumn("valid_to", lead(col("__ts"), 1).over(w2))
      .withColumn("version", row_number().over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__ts", "__tb", "__prev")
  }

  /** Snapshot diff: the row-level changelog between two versions of the
    * same table — what a CDC feed would have carried, recovered from
    * the states themselves. The audit/backfill primitive: "what did
    * yesterday's load actually change?"
    *
    * One full-outer join on the key (a single keyed shuffle — both
    * snapshots co-partition); change detection is null-safe
    * column-wise equality (`<=>`), so a value flipping to/from NULL is
    * an update, not a no-op. Rows equal in every non-key column are
    * omitted. Keys must be non-null and unique per snapshot.
    *
    * Output: key columns + `change_type` ('insert' | 'delete' |
    * 'update') + `n_changed` (changed non-key columns; 0 for
    * insert/delete, where the row has no counterpart).
    */
  def snapshotDiff(base: DataFrame, cur: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff: no key columns")
    val valCols = cur.columns.toSeq.filterNot(keys.contains)
    require(base.columns.toSeq == cur.columns.toSeq,
      "snapshotDiff: snapshots must share a schema")
    val b = base.select(
      keys.map(col) ++ (lit(1).as("__in_b") +: valCols.map(c => col(c).as(s"__b_$c"))): _*)
    val c = cur.select(
      keys.map(col) ++ (lit(1).as("__in_c") +: valCols.map(c0 => col(c0).as(s"__c_$c0"))): _*)
    val changed = valCols
      .map(v => when(!(col(s"__b_$v") <=> col(s"__c_$v")), 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0))
    b.join(c, keys, "full_outer")
      .withColumn("__n_changed", changed)
      .withColumn("change_type",
        when(col("__in_b").isNull, lit("insert"))
          .when(col("__in_c").isNull, lit("delete"))
          .when(col("__n_changed") > 0, lit("update")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type") :+
        when(col("change_type") === "update", col("__n_changed"))
          .otherwise(lit(0)).as("n_changed"): _*)
  }

  /** Field-level survivorship ("golden record", the merge/purge
    * endgame): one row per key where EACH requested field
    * independently carries its value from the latest record — by
    * (orderCol, tiebreak) — in which that field was non-null. This is
    * the MDM consolidation rule "most recent non-null wins, per
    * field": a key whose newest record has a null email but an older
    * one has it keeps the older email alongside the newer phone.
    *
    * ONE hash aggregate, no window, no per-field joins: each field
    * rides a lexicographic struct-max over (order, tiebreak, value)
    * gated to its non-null rows — partials combine map-side, so at
    * 100 TB the shuffle carries one candidate struct per (key, field,
    * task) instead of every record. The unique tiebreak makes equal-
    * order survivors deterministic.
    *
    * Output: (key, <fields...>, n_records); a field null in every
    * record stays null.
    */
  def goldenRecord(
      df: DataFrame,
      key: Column,
      orderCol: Column,
      tiebreak: Column,
      fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "goldenRecord: at least one field required")
    val base = df.filter(key.isNotNull)
      .select(key.as("key") +: orderCol.as("__o") +: tiebreak.as("__t") +:
        fields.map(col): _*)
    val aggs = fields.map { f =>
      max(when(col(f).isNotNull,
        struct(col("__o").as("o"), col("__t").as("t"), col(f).as("v")))).as(s"__m_$f")
    } :+ count(lit(1)).as("n_records")
    base.groupBy(col("key"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("key") +: fields.map(f => col(s"__m_$f.v").as(f)) :+
        col("n_records"): _*)
  }
}
