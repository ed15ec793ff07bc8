package graft.streaming

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction,
  DeleteFromTable, InsertAction, InsertIntoStatement, InsertStarAction,
  LogicalPlan, MergeIntoTable, UpdateAction, UpdateStarAction, UpdateTable}
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
        lr @ LogicalRelation(rel, _, catalogTable, _, _),
        partitionSpec, userCols, query, overwrite, ifPartitionNotExists, byName)
        if SnapshotTargetInfo.of(rel).isDefined && query.resolved =>
      val index = SnapshotTargetInfo.of(rel).get
      require(partitionSpec.isEmpty && !ifPartitionNotExists,
        "graft-snapshot: INSERT ... PARTITION is not supported " +
          "(the store clusters by statsColumn; partition columns prune at scan)")
      require(userCols.isEmpty,
        "graft-snapshot: INSERT with an explicit column list is not supported; " +
          "INSERT ... BY NAME or match the table's column order")
      require(index.asOfVersion.isEmpty,
        "graft-snapshot: cannot INSERT into a time-traveled relation " +
          "(versionAsOf/timestampAsOf reads are immutable snapshots)")
      InsertIntoSnapshotCommand(index.store, index.fullSchema, query, overwrite,
        byName, catalogTable.map(_.identifier.unquotedString),
        index.partitionCols, index.statsCol)
  }
}

/** Resolution rule: SQL row-level DML — `DELETE FROM`, `UPDATE`,
  * `MERGE INTO` — on `graft-snapshot` catalog tables, rewritten to the
  * store's copy-on-write operations while the target is still a plain
  * `LogicalRelation` (Spark's own path refuses: V1 tables "do not
  * support DELETE/UPDATE/MERGE"). Each statement becomes ONE manifest
  * version with the CoW cost model: candidate files pruned by manifest
  * stats against the predicate/delta, only touched files rewritten,
  * untouched files republished by identity — so the change feed emits
  * only touched rows and time travel keeps the pre-DML table.
  *
  *   - `DELETE FROM t WHERE p`            → [[SnapshotStore.deleteWhere]]
  *   - `UPDATE t SET c = e, ... WHERE p`  → [[SnapshotStore.updateWhere]]
  *   - `MERGE INTO t USING s ON t.k = s.k
  *      WHEN MATCHED THEN UPDATE SET *
  *      WHEN NOT MATCHED THEN INSERT *`   → [[SnapshotStore.mergeInto]]
  *   - general MERGE (conditional/partial UPDATE, DELETE, conditional
  *     INSERT, `WHEN NOT MATCHED BY SOURCE THEN UPDATE/DELETE`)
  *                                        → [[SnapshotStore.mergeClauses]]
  *
  * The ON clause must be a conjunction of same-named equi-conditions
  * (t.k = s.k). Conditions referencing subqueries are refused (they
  * cannot be re-bound against the rewrite scan), and NOT MATCHED BY
  * SOURCE clauses may reference target columns only.
  */
final class SnapshotDmlRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def snapshotTarget(plan: LogicalPlan): Option[(SnapshotTargetInfo, Option[String])] =
    plan.collectFirst {
      case LogicalRelation(rel, _, ct, _, _)
          if SnapshotTargetInfo.of(rel).isDefined =>
        (SnapshotTargetInfo.of(rel).get, ct.map(_.identifier.unquotedString))
    }

  /** Re-expressible predicate as an opaque [[Column]]: attribute
    * references become unresolved names that re-bind against the
    * rewrite scan by name. A Column field is invisible to
    * `QueryPlan.expressions`, so the command node stays `resolved`
    * (an unresolved Expression field would fail CheckAnalysis).
    * Subqueries cannot re-bind — refused loudly.
    */
  private def rebindable(e: Expression): Column = {
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      "graft-snapshot DML: subqueries in the condition are not supported " +
        "(rewrite with a literal predicate, or use the DataFrame API)")
    // Inline RuntimeReplaceable + With/CommonExpressionRef (the
    // analyzer's forms of BETWEEN etc.) FIRST: a With node cannot
    // carry unresolved children, and the re-analysis of the rewrite
    // scan will just re-factor the duplication anyway.
    val inlined = SnapshotStore.inlineReplaceable(e)
    org.apache.spark.sql.GraftExprBridge.column(
      inlined.transform { case a: AttributeReference => UnresolvedAttribute(a.name) })
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case d @ DeleteFromTable(target, condition)
        if condition.resolved && snapshotTarget(target).isDefined =>
      val (index, name) = snapshotTarget(target).get
      require(index.asOfVersion.isEmpty,
        "graft-snapshot: cannot DELETE from a time-traveled relation")
      DeleteFromSnapshotCommand(index.store, rebindable(condition), name)

    case u @ UpdateTable(target, assignments, condition)
        if u.resolved && snapshotTarget(target).isDefined =>
      val (index, name) = snapshotTarget(target).get
      require(index.asOfVersion.isEmpty,
        "graft-snapshot: cannot UPDATE a time-traveled relation")
      val sets = assignments.map {
        case Assignment(k: AttributeReference, v) => k.name -> rebindable(v)
        case Assignment(k: UnresolvedAttribute, v) => k.name -> rebindable(v)
        case other => throw new IllegalArgumentException(
          s"graft-snapshot UPDATE: unsupported assignment target $other " +
            "(top-level columns only)")
      }.toMap
      UpdateSnapshotCommand(index.store, sets,
        condition.map(rebindable), name)

    // a source reading the TARGET table itself is fine: the source plan
    // is pinned to the pre-merge manifest (snapshot isolation), and the
    // merge commit only adds files
    case m @ MergeIntoTable(target, source, cond, matched, notMatched,
        notMatchedBySource, withSchemaEvolution)
        if m.childrenResolved && cond.resolved &&
          (matched ++ notMatched ++ notMatchedBySource).forall(actionResolved) &&
          snapshotTarget(target).isDefined =>
      val (index, name) = snapshotTarget(target).get
      require(index.asOfVersion.isEmpty,
        "graft-snapshot: cannot MERGE into a time-traveled relation")
      require(!withSchemaEvolution,
        "graft-snapshot MERGE: WITH SCHEMA EVOLUTION is not supported " +
          "(evolve with commitAppend(mergeSchema = true) first)")
      // the canonical upsert shape, before OR after the analyzer
      // expands star actions to per-column assignments
      def starLike(actions: Seq[org.apache.spark.sql.catalyst.plans.logical.MergeAction],
          isUpdate: Boolean): Boolean = actions match {
        case Seq(UpdateStarAction(None)) if isUpdate => true
        case Seq(InsertStarAction(None)) if !isUpdate => true
        case Seq(UpdateAction(None, as, _)) if isUpdate => allIdentity(as)
        case Seq(InsertAction(None, as)) if !isUpdate => allIdentity(as)
        case _ => false
      }
      def stripCast(e: Expression): Expression = e match {
        case c: org.apache.spark.sql.catalyst.expressions.Cast => stripCast(c.child)
        case o => o
      }
      val keys = splitConjuncts(cond).map { conjunct =>
        (conjunct match {
          case EqualTo(l, r) => (stripCast(l), stripCast(r)) match {
            case (a: AttributeReference, b: AttributeReference)
                if a.name == b.name => Some(a.name)
            case _ => None
          }
          case _ => None
        }).getOrElse(throw new IllegalArgumentException(
          s"graft-snapshot MERGE: ON must be a conjunction of same-named " +
            s"equi-conditions (t.k = s.k), got ${conjunct.sql}"))
      }
      if (starLike(matched, isUpdate = true) && starLike(notMatched, isUpdate = false) &&
          notMatchedBySource.isEmpty)
        // canonical upsert: the cheaper single-shuffle union+window path
        MergeIntoSnapshotCommand(index.store, index.fullSchema, source, keys, name)
      else {
        // GENERAL clause set (conditional/partial UPDATE, DELETE,
        // conditional INSERT) → the store's full-outer-join CoW merge.
        // Attribute references re-bind into the executor's __t_/__s_
        // prefix namespace BY SIDE (exprId membership — names alone
        // cannot disambiguate `t.v` from `s.v` in a condition).
        val tAttrs = target.outputSet
        val sAttrs = source.outputSet
        def rebind2(e: Expression): Column = {
          require(!e.exists(_.isInstanceOf[SubqueryExpression]),
            "graft-snapshot MERGE: subqueries in clause conditions/values " +
              "are not supported")
          val inlined = SnapshotStore.inlineReplaceable(e)
          org.apache.spark.sql.GraftExprBridge.column(inlined.transform {
            case a: AttributeReference if tAttrs.contains(a) =>
              UnresolvedAttribute(s"__t_${a.name}")
            case a: AttributeReference if sAttrs.contains(a) =>
              UnresolvedAttribute(s"__s_${a.name}")
          })
        }
        def setsOf(as: Seq[Assignment]): Map[String, Column] = as.map {
          case Assignment(k: AttributeReference, value) => k.name -> rebind2(value)
          case Assignment(k: UnresolvedAttribute, value) => k.name -> rebind2(value)
          case other => throw new IllegalArgumentException(
            s"graft-snapshot MERGE: unsupported assignment target $other " +
              "(top-level columns only)")
        }.toMap
        val mClauses: Seq[SnapshotStore.MergeClause] = matched.map {
          case UpdateStarAction(c) =>
            SnapshotStore.MergeUpdate(c.map(rebind2), Map.empty)
          case UpdateAction(c, as, _) =>
            SnapshotStore.MergeUpdate(c.map(rebind2), setsOf(as))
          case DeleteAction(c) =>
            SnapshotStore.MergeDelete(c.map(rebind2))
          case other => throw new IllegalArgumentException(
            s"graft-snapshot MERGE: unsupported MATCHED action $other")
        }
        val nClauses: Seq[SnapshotStore.MergeClause] = notMatched.map {
          case InsertStarAction(c) =>
            SnapshotStore.MergeInsert(c.map(rebind2), Map.empty)
          case InsertAction(c, as) =>
            SnapshotStore.MergeInsert(c.map(rebind2), setsOf(as))
          case other => throw new IllegalArgumentException(
            s"graft-snapshot MERGE: unsupported NOT MATCHED action $other")
        }
        // NOT MATCHED BY SOURCE arms see no source row: a source-side
        // reference would silently evaluate against NULL — refused
        // (SQL's own analyzer refuses it too; this guards the rebind)
        def rebindTargetOnly(e: Expression): Column = {
          e.foreach {
            case a: AttributeReference if sAttrs.contains(a) =>
              throw new IllegalArgumentException(
                "graft-snapshot MERGE: a NOT MATCHED BY SOURCE clause " +
                  s"cannot reference source column '${a.name}'")
            case _ => ()
          }
          rebind2(e)
        }
        def setsOfTargetOnly(as: Seq[Assignment]): Map[String, Column] = as.map {
          case Assignment(k: AttributeReference, value) =>
            k.name -> rebindTargetOnly(value)
          case Assignment(k: UnresolvedAttribute, value) =>
            k.name -> rebindTargetOnly(value)
          case other => throw new IllegalArgumentException(
            s"graft-snapshot MERGE: unsupported assignment target $other " +
              "(top-level columns only)")
        }.toMap
        val bClauses: Seq[SnapshotStore.MergeClause] = notMatchedBySource.map {
          case UpdateAction(c, as, _) =>
            SnapshotStore.MergeUpdate(c.map(rebindTargetOnly), setsOfTargetOnly(as))
          case DeleteAction(c) =>
            SnapshotStore.MergeDelete(c.map(rebindTargetOnly))
          case other => throw new IllegalArgumentException(
            s"graft-snapshot MERGE: unsupported NOT MATCHED BY SOURCE action $other")
        }
        MergeClausesSnapshotCommand(index.store, source, keys,
          mClauses, nClauses, bClauses, name)
      }
  }

  /** Star actions carry no expressions to resolve (they expand
    * instead); explicit actions must have fully-resolved conditions and
    * assignments before the rewrite can re-bind them by SIDE — waiting
    * another fixed-point iteration costs nothing, rewriting an
    * unresolved tree mis-binds.
    */
  private def actionResolved(
      a: org.apache.spark.sql.catalyst.plans.logical.MergeAction): Boolean =
    a match {
      case UpdateStarAction(c) => c.forall(_.resolved)
      case InsertStarAction(c) => c.forall(_.resolved)
      case UpdateAction(c, as, _) =>
        c.forall(_.resolved) && as.forall(x => x.value.resolved &&
          (x.key.resolved || x.key.isInstanceOf[UnresolvedAttribute]))
      case InsertAction(c, as) =>
        c.forall(_.resolved) && as.forall(x => x.value.resolved &&
          (x.key.resolved || x.key.isInstanceOf[UnresolvedAttribute]))
      case DeleteAction(c) => c.forall(_.resolved)
      case _ => false
    }

  /** Post-expansion star: every assignment is `col = <source col of the
    * same name>`.
    */
  private def allIdentity(as: Seq[Assignment]): Boolean =
    as.nonEmpty && as.forall {
      case Assignment(k: AttributeReference, v: AttributeReference) =>
        k.name == v.name
      case _ => false
    }
}

final case class DeleteFromSnapshotCommand(
    store: SnapshotStore,
    condition: Column,
    tableName: Option[String]) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    store.deleteWhere(session, condition)
    tableName.foreach(session.catalog.refreshTable)
    Seq.empty
  }
}

final case class UpdateSnapshotCommand(
    store: SnapshotStore,
    assignments: Map[String, Column],
    condition: Option[Column],
    tableName: Option[String]) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.lit
    store.updateWhere(session,
      condition.getOrElse(lit(true)), assignments)
    tableName.foreach(session.catalog.refreshTable)
    Seq.empty
  }
}

final case class MergeIntoSnapshotCommand(
    store: SnapshotStore,
    tableSchema: StructType,
    source: LogicalPlan,
    keys: Seq[String],
    tableName: Option[String]) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.GraftStreamBridge.ofRows(session, source)
    val have = src.columns.toSet
    val missing = tableSchema.fieldNames.filterNot(have.contains)
    require(missing.isEmpty,
      s"graft-snapshot MERGE: source lacks table columns ${missing.mkString(", ")}")
    val shaped = src.select(tableSchema.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
    store.mergeInto(session, shaped, keys)
    tableName.foreach(session.catalog.refreshTable)
    Seq.empty
  }
}

/** The general SQL MERGE (conditional/partial clauses, DELETE action)
  * → [[SnapshotStore.mergeClauses]]: one copy-on-write version,
  * first-match-wins clause order, candidate files pruned by the
  * source's key range. Clause Columns are opaque (resolved names in
  * the `__t_`/`__s_` namespace), so the command analyzes clean.
  */
final case class MergeClausesSnapshotCommand(
    store: SnapshotStore,
    source: LogicalPlan,
    keys: Seq[String],
    matched: Seq[SnapshotStore.MergeClause],
    notMatched: Seq[SnapshotStore.MergeClause],
    notMatchedBySource: Seq[SnapshotStore.MergeClause],
    tableName: Option[String]) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.GraftStreamBridge.ofRows(session, source)
    store.mergeClauses(session, src, keys, matched, notMatched, notMatchedBySource)
    tableName.foreach(session.catalog.refreshTable)
    Seq.empty
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
    tableName: Option[String],
    partitionCols: Seq[String] = Nil,
    statsColumn: Option[String] = None) extends LeafRunnableCommand {

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
    // INSERT OVERWRITE on a partitioned table keeps the table's layout
    // AND its stats column (a SQL writer has neither a partitionBy nor a
    // statsColumn to pass; silently dropping either would kill every
    // reader's pruning — partition or manifest-min/max — after one SQL
    // overwrite). Append inherits the stats column inside commitAppend.
    if (overwrite) store.commitOverwrite(shaped, statsColumn,
      partitionBy = partitionCols)
    else store.commitAppend(shaped)
    // the catalog caches the resolved LogicalRelation (and with it the
    // pre-insert SnapshotFileIndex): invalidate so readers re-plan
    tableName.foreach(session.catalog.refreshTable)
    Seq.empty
  }
}
