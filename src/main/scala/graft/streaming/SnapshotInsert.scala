package graft.streaming

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import graft.etl.SnapshotStore

/** Resolution rule: route SQL DML at `graft-snapshot` catalog tables
  * through the manifest commit protocol — the SQL + DataFrame parity
  * north star at the DML edge. Without it, `CREATE TABLE ... USING
  * graft-snapshot` reads fine but `INSERT INTO t SELECT ...` falls
  * through to `InsertIntoHadoopFsRelationCommand`, which would write
  * bare parquet files AROUND the manifest — invisible to readers at
  * best, a corrupted file inventory at worst. The rule intercepts the
  * statement while the target is still a plain `LogicalRelation` over
  * our [[SnapshotFileIndex]] and rewrites it to a command that commits
  * a real version:
  *
  *   - `INSERT INTO`        → [[SnapshotStore.commitAppend]]
  *   - `INSERT OVERWRITE`   → [[SnapshotStore.commitOverwrite]]
  *
  * so SQL writers get the same atomicity, time travel, change-feed and
  * CAS-loser semantics as `df.write.format("graft-snapshot")`.
  * Registered by `graft.GraftExtensions` (injectResolutionRule).
  */
final class SnapshotInsertRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case i @ InsertIntoStatement(
        lr @ LogicalRelation(h: HadoopFsRelation, _, catalogTable, _, _),
        partitionSpec, userCols, query, overwrite, ifPartitionNotExists, byName)
        if h.location.isInstanceOf[SnapshotFileIndex] && query.resolved =>
      val index = h.location.asInstanceOf[SnapshotFileIndex]
      require(partitionSpec.isEmpty && !ifPartitionNotExists,
        "graft-snapshot: INSERT ... PARTITION is not supported " +
          "(the store clusters by statsColumn; partition columns prune at scan)")
      require(userCols.isEmpty,
        "graft-snapshot: INSERT with an explicit column list is not supported; " +
          "INSERT ... BY NAME or match the table's column order")
      require(index.asOfVersion.isEmpty,
        "graft-snapshot: cannot INSERT into a time-traveled relation " +
          "(versionAsOf/timestampAsOf reads are immutable snapshots)")
      InsertIntoSnapshotCommand(index.store, index.dataSchema, query, overwrite,
        byName, catalogTable.map(_.identifier.unquotedString))
  }
}

/** Executes the rewritten INSERT: shapes the source query onto the
  * table schema (positional, or name-matched for `BY NAME`), commits
  * one snapshot version, and refreshes the catalog's cached relation so
  * the next SELECT plans against the new manifest.
  */
final case class InsertIntoSnapshotCommand(
    store: SnapshotStore,
    tableSchema: StructType,
    query: LogicalPlan,
    overwrite: Boolean,
    byName: Boolean,
    tableName: Option[String]) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(session: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.GraftStreamBridge.ofRows(session, query)
    val shaped =
      if (byName) {
        val have = df.columns.toSet
        val missing = tableSchema.fieldNames.filterNot(have.contains)
        require(missing.isEmpty,
          s"graft-snapshot INSERT BY NAME: query lacks columns ${missing.mkString(", ")}")
        df.select(tableSchema.fields.toSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
      } else {
        require(df.columns.length == tableSchema.fields.length,
          s"graft-snapshot INSERT: query has ${df.columns.length} columns, " +
            s"table has ${tableSchema.fields.length}")
        df.select(tableSchema.fields.toSeq.zip(df.columns.toSeq).map {
          case (f, c) => col(c).cast(f.dataType).as(f.name)
        }: _*)
      }
    if (overwrite) store.commitOverwrite(shaped)
    else store.commitAppend(shaped)
    // the catalog caches the resolved LogicalRelation (and with it the
    // pre-insert SnapshotFileIndex): invalidate so readers re-plan
    tableName.foreach(session.catalog.refreshTable)
    Seq.empty
  }
}
