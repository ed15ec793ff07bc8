package graft.streaming

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructType, TimestampType}
import graft.etl.SnapshotStore

/** SQL parity for the snapshot store's OPS surface — the statements
  * Delta exposes that core Spark SQL has no grammar for:
  *
  *   - `DESCRIBE HISTORY t`                       → [[SnapshotStore.history]]
  *   - `DESCRIBE DETAIL t`                        → one-row live summary
  *   - `OPTIMIZE t [WHERE p] [ZORDER BY (c,...)] [TARGET n FILES]`
  *                                                → [[SnapshotStore.compactLatest]]
  *   - `VACUUM t RETAIN n VERSIONS`               → [[SnapshotStore.vacuum]]
  *   - `RESTORE [TABLE] t TO VERSION AS OF v`
  *     `RESTORE [TABLE] t TO TIMESTAMP AS OF 'ts'`→ [[SnapshotStore.restore]]
  *   - `ALTER TABLE t ADD COLUMNS (c TYPE, ...)`  → [[SnapshotStore.addColumns]]
  *   - `ALTER TABLE t ADD CONSTRAINT n CHECK (e)` → [[SnapshotStore.addConstraint]]
  *   - `ALTER TABLE t DROP CONSTRAINT n`          → [[SnapshotStore.dropConstraint]]
  *
  * Injected via `SparkSessionExtensions.injectParser` (registered by
  * `graft.GraftExtensions`): anything the ops grammar doesn't match
  * falls through to the delegate untouched, so the engine's parser is a
  * strict superset of Spark's. The target may be a catalog table name
  * or a quoted store-root path (`'/path/to/store'`). Only `ALTER TABLE
  * ADD COLUMNS` collides with grammar Spark already owns — that command
  * resolves its target at execution and re-runs the DELEGATE's plan
  * when the table is not a graft-snapshot table, so parquet/hive tables
  * keep Spark's own ALTER semantics.
  *
  * Reference anchor: the reference's ops surface is Databricks-managed
  * (Delta `DESCRIBE HISTORY` / `OPTIMIZE` / `VACUUM` on its RAW zone);
  * these statements are that surface re-derived on the manifest store.
  */
final class SnapshotSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  import SnapshotSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case DescHistoryRe(target) =>
      DescribeHistoryCommand(target.trim)
    case DescDetailRe(target) =>
      DescribeDetailCommand(target.trim)
    case OptimizeHeadRe(target, tail) =>
      val (where, z, files, smallerBytes) = parseOptimizeTail(tail)
      OptimizeSnapshotCommand(target.trim, z, files, where, smallerBytes)
    case VacuumRe(target, keep, dry) =>
      VacuumSnapshotCommand(target.trim, keep.toInt, dryRun = dry != null)
    case VacuumBareRe(target) =>
      throw new IllegalArgumentException(
        "graft-snapshot VACUUM requires an explicit retention " +
          s"(VACUUM $target RETAIN n VERSIONS) — a default that silently " +
          "erases time travel is how history disappears")
    case ShallowCloneRe(target, source, v, location) =>
      ShallowCloneSnapshotCommand(target.trim, source.trim,
        Option(v).map(_.toLong), Option(location))
    case ConvertFromDeltaRe(target, deltaPath, v, statsCol, location) =>
      ConvertFromDeltaSnapshotCommand(target.trim, deltaPath,
        Option(v).map(_.toLong), Option(statsCol).map(stripIdent),
        Option(location))
    case ExportToDeltaRe(target, cdf) =>
      ExportToDeltaSnapshotCommand(target.trim, changeDataFeed = cdf != null)
    case RestoreVersionRe(target, v) =>
      RestoreSnapshotCommand(target.trim, Some(v.toLong), None)
    case RestoreTimestampRe(target, ts) =>
      RestoreSnapshotCommand(target.trim, None, Some(ts))
    case AddColumnsRe(target, cols) =>
      // Spark owns this grammar for other providers: keep the
      // delegate's plan as the non-snapshot fallback
      AddColumnsSnapshotCommand(target.trim, cols, delegate.parsePlan(sqlText))
    case AlterColumnTypeRe(target, colName, ddlType) =>
      AlterColumnTypeSnapshotCommand(target.trim, stripIdent(colName),
        ddlType.trim, fallbackOf(sqlText))
    case SetBloomRe(target, colName) =>
      SetBloomSnapshotCommand(target.trim, Some(stripIdent(colName)))
    case DropBloomRe(target) =>
      SetBloomSnapshotCommand(target.trim, None)
    case RenameColumnRe(target, from, to) =>
      AlterColumnSnapshotCommand(target.trim,
        rename = Some((stripIdent(from), stripIdent(to))), drops = Nil,
        fallback = fallbackOf(sqlText))
    case DropColumnRe(target, cols) =>
      AlterColumnSnapshotCommand(target.trim, rename = None,
        drops = cols.split(",").map(stripIdent).toSeq,
        fallback = fallbackOf(sqlText))
    case AddConstraintRe(target, name, check) =>
      AlterConstraintSnapshotCommand(target.trim, name,
        Some(check.trim), fallbackOf(sqlText))
    case DropConstraintRe(target, name) =>
      AlterConstraintSnapshotCommand(target.trim, name, None,
        fallbackOf(sqlText))
    case _ => delegate.parsePlan(sqlText)
  }

  /** Delegate plan for grammar Spark MAY also own (constraint DDL is
    * DSv2-side in newer Spark) — None when the delegate cannot parse
    * it, so a non-snapshot target fails at RUN time with a clear
    * message instead of a parse error on a valid snapshot statement.
    */
  private def fallbackOf(sqlText: String): Option[LogicalPlan] =
    try Some(delegate.parsePlan(sqlText)) catch {
      case _: ParseException => None
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object SnapshotSqlParser {
  // `(?is)`: case-insensitive, dot-matches-newline. Targets are a
  // quoted path or a (possibly backticked, dotted) identifier. The
  // DESCRIBE arm requires a target AFTER the HISTORY keyword, so plain
  // `DESCRIBE history` (a table literally named history) still falls
  // through to Spark.
  private val T = """('[^']+'|"[^"]+"|[\w.`]+)"""
  private[streaming] val DescHistoryRe =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$T\\s*;?\\s*""".r
  private[streaming] val DescDetailRe =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$T\\s*;?\\s*""".r
  private[streaming] val OptimizeHeadRe =
    s"""(?is)\\s*OPTIMIZE\\s+$T((?s).*)""".r
  private[streaming] val VacuumRe =
    s"""(?is)\\s*VACUUM\\s+$T\\s+RETAIN\\s+(\\d+)\\s+VERSIONS(\\s+DRY\\s+RUN)?\\s*;?\\s*""".r
  private[streaming] val VacuumBareRe =
    s"""(?is)\\s*VACUUM\\s+$T\\s*;?\\s*""".r
  private[streaming] val ShallowCloneRe =
    (s"""(?is)\\s*CREATE\\s+TABLE\\s+$T\\s+SHALLOW\\s+CLONE\\s+$T""" +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?""" +
      """(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*""").r
  private[streaming] val ConvertFromDeltaRe =
    (s"""(?is)\\s*CREATE\\s+TABLE\\s+$T\\s+FROM\\s+DELTA\\s+'([^']+)'""" +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?""" +
      """(?:\s+STATS\s+COLUMN\s+([\w`,]+))?""" +
      """(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*""").r
  private[streaming] val ExportToDeltaRe =
    (s"""(?is)\\s*EXPORT\\s+TABLE\\s+$T\\s+TO\\s+DELTA""" +
      """(\s+WITH\s+CHANGE\s+FEED)?\s*;?\s*""").r
  private[streaming] val RestoreVersionRe =
    (s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$T""" +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""").r
  private[streaming] val RestoreTimestampRe =
    (s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$T""" +
      """\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""").r
  private[streaming] val AddColumnsRe =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$T""" +
      """\s+ADD\s+COLUMNS?\s*\((.+)\)\s*;?\s*""").r
  private[streaming] val AlterColumnTypeRe =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$T""" +
      """\s+(?:ALTER|CHANGE)\s+COLUMN\s+([\w`]+)\s+TYPE\s+([\w(),\s]+?)\s*;?\s*""").r
  private[streaming] val SetBloomRe =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$T""" +
      """\s+SET\s+BLOOMFILTER\s+COLUMN\s+([\w`]+)\s*;?\s*""").r
  private[streaming] val DropBloomRe =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$T""" +
      """\s+DROP\s+BLOOMFILTER\s*;?\s*""").r
  private[streaming] val RenameColumnRe =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$T""" +
      """\s+RENAME\s+COLUMN\s+([\w`]+)\s+TO\s+([\w`]+)\s*;?\s*""").r
  private[streaming] val DropColumnRe =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$T""" +
      """\s+DROP\s+COLUMNS?\s*\(?\s*([\w`]+(?:\s*,\s*[\w`]+)*)\s*\)?\s*;?\s*""").r
  private[streaming] val AddConstraintRe =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$T""" +
      """\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""").r
  private[streaming] val DropConstraintRe =
    (s"""(?is)\\s*ALTER\\s+TABLE\\s+$T""" +
      """\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""").r

  private def stripIdent(s: String): String =
    s.trim.stripPrefix("`").stripSuffix("`")

  /** Mask the contents of single/double-quoted strings and backticked
    * identifiers with spaces (same length, so indices map 1:1 onto
    * the original text). Doubled quotes inside a string are the SQL
    * escape and stay inside it. Clause-keyword recognition runs on the
    * MASKED text, so a predicate containing the literal string
    * 'ZORDER BY' (or `TARGET`, `WHERE`...) can never mis-split an
    * OPTIMIZE statement — the nit a bare regex-over-SQL grammar has.
    */
  private[streaming] def maskQuoted(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var q: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q == 0) {
        sb.append(c)
        if (c == '\'' || c == '"' || c == '`') q = c
      } else if (c == q) {
        if (c != '`' && i + 1 < s.length && s.charAt(i + 1) == q) {
          sb.append(' ').append(' '); i += 1 // escaped quote
        } else { sb.append(c); q = 0 }
      } else sb.append(' ')
      i += 1
    }
    sb.toString
  }

  private val OptWhereKw = """(?i)\bWHERE\b""".r
  private val OptZorderKw = """(?i)\bZORDER\s+BY\b""".r
  private val OptTargetKw = """(?i)\bTARGET\s+(\d+)\s+FILES\b""".r
  private val OptSmallerKw = """(?i)\bSMALLER\s+THAN\s+(\d+)\s*MB\b""".r

  /** Quote-aware clause split of everything after `OPTIMIZE <target>`:
    * keyword positions are found on the masked text, clause BODIES are
    * sliced from the original. Clauses may appear in any order, at most
    * once each; unparseable leftovers are refused loudly (OPTIMIZE is
    * this parser's own grammar — falling through to Spark would only
    * produce a less useful error).
    */
  private[streaming] def parseOptimizeTail(tail0: String)
      : (Option[String], Seq[String], Option[Int], Option[Long]) = {
    val tail = tail0.replaceAll("(?s)\\s*;?\\s*$", "")
    if (tail.trim.isEmpty) return (None, Nil, None, None)
    val masked = maskQuoted(tail)
    final case class Kw(name: String, start: Int, bodyStart: Int,
        num: Option[String])
    // Parenthesis depth at each masked-text position: keyword hits
    // inside parens belong to a clause body (a subquery's WHERE in
    // `OPTIMIZE t WHERE k IN (SELECT k FROM u WHERE f)`), not to this
    // grammar — only DEPTH-0 hits are clause starts, for both the
    // duplicate check and the body slicing below. SQL nests only via
    // parentheses, so depth 0 is exactly "top level" on quote-masked
    // text.
    val depth = new Array[Int](masked.length + 1)
    var d = 0
    var p = 0
    while (p < masked.length) {
      depth(p) = d
      masked.charAt(p) match {
        case '(' => d += 1
        case ')' => d = math.max(0, d - 1)
        case _ =>
      }
      p += 1
    }
    val hits = (
      OptWhereKw.findAllMatchIn(masked).map(m =>
        Kw("WHERE", m.start, m.end, None)) ++
      OptZorderKw.findAllMatchIn(masked).map(m =>
        Kw("ZORDER", m.start, m.end, None)) ++
      OptTargetKw.findAllMatchIn(masked).map(m =>
        Kw("TARGET", m.start, m.end, Some(m.group(1)))) ++
      OptSmallerKw.findAllMatchIn(masked).map(m =>
        Kw("SMALLER", m.start, m.end, Some(m.group(1))))
    ).toSeq.filter(k => depth(k.start) == 0).sortBy(_.start)
    require(hits.nonEmpty && tail.substring(0, hits.head.start).trim.isEmpty,
      s"OPTIMIZE: cannot parse clause text '${tail.trim.take(80)}' — " +
        "expected [WHERE p] [ZORDER BY (c,...)] [TARGET n FILES] " +
        "[SMALLER THAN n MB]")
    val dup = hits.groupBy(_.name).collectFirst { case (n, hs) if hs.length > 1 => n }
    require(dup.isEmpty, s"OPTIMIZE: duplicate ${dup.get} clause")
    var where: Option[String] = None
    var zorder: Seq[String] = Nil
    var files: Option[Int] = None
    var smaller: Option[Long] = None
    hits.zipWithIndex.foreach { case (kw, i) =>
      val end = if (i + 1 < hits.length) hits(i + 1).start else tail.length
      val body = tail.substring(kw.bodyStart, end).trim
      kw.name match {
        case "WHERE" =>
          require(body.nonEmpty, "OPTIMIZE ... WHERE: empty predicate")
          where = Some(body)
        case "ZORDER" =>
          val ZCols = """(?s)\(?\s*([\w`]+(?:\s*,\s*[\w`]+)*)\s*\)?""".r
          body match {
            case ZCols(cols) => zorder = cols.split(",").map(stripIdent).toSeq
            case _ => throw new IllegalArgumentException(
              s"OPTIMIZE ... ZORDER BY: cannot parse column list '$body'")
          }
        case "TARGET" =>
          require(body.isEmpty,
            s"OPTIMIZE: unexpected text after TARGET n FILES: '$body'")
          files = Some(kw.num.get.toInt)
        case "SMALLER" =>
          require(body.isEmpty,
            s"OPTIMIZE: unexpected text after SMALLER THAN n MB: '$body'")
          smaller = Some(kw.num.get.toLong * (1L << 20))
      }
    }
    (where, zorder, files, smaller)
  }

  /** Resolve an ops-statement target to its store: a quoted path makes
    * the store directly; an identifier resolves through the catalog and
    * must be backed by a [[SnapshotFileIndex]]. Returns the catalog name
    * (for cache refresh) when there is one.
    */
  private[streaming] def resolveStore(session: SparkSession,
      target: String): (SnapshotStore, Option[String]) = {
    val t = target.trim
    if ((t.startsWith("'") && t.endsWith("'")) ||
        (t.startsWith("\"") && t.endsWith("\"")))
      (new SnapshotStore(t.substring(1, t.length - 1)), None)
    else {
      val name = stripIdent(t)
      val plan = session.table(name).queryExecution.analyzed
      val index = plan.collectFirst {
        case LogicalRelation(rel, _, _, _, _)
            if SnapshotTargetInfo.of(rel).isDefined =>
          SnapshotTargetInfo.of(rel).get
      }.getOrElse(throw new IllegalArgumentException(
        s"'$name' is not a graft-snapshot table — snapshot ops statements " +
          "(DESCRIBE HISTORY / OPTIMIZE / VACUUM / RESTORE) apply to " +
          "`USING graft-snapshot` tables or quoted store paths"))
      require(index.asOfVersion.isEmpty,
        s"'$name' is a time-traveled relation — ops statements apply to " +
          "the live table")
      (index.store, Some(name))
    }
  }

  /** Name-or-path resolution for the `table_changes` TVF: a registered
    * catalog table resolves through [[resolveStore]]'s index probe; an
    * unregistered string is taken as a store-root path.
    */
  private[graft] def storeForNameOrPath(session: SparkSession,
      target: String): SnapshotStore = {
    val asTable = scala.util.Try {
      session.sessionState.catalog.tableExists(
        session.sessionState.sqlParser.parseTableIdentifier(target))
    }.getOrElse(false)
    if (asTable) resolveStore(session, target)._1
    else new SnapshotStore(target)
  }

  /** Non-snapshot fallback probe for ALTER: true when the target is a
    * graft-snapshot table (quoted paths are always ours).
    */
  private[streaming] def isSnapshotTarget(session: SparkSession,
      target: String): Boolean = {
    val t = target.trim
    if ((t.startsWith("'") && t.endsWith("'")) ||
        (t.startsWith("\"") && t.endsWith("\""))) true
    else try {
      session.table(stripIdent(t)).queryExecution.analyzed.collectFirst {
        case LogicalRelation(rel, _, _, _, _)
            if SnapshotTargetInfo.of(rel).isDefined => ()
      }.isDefined
    } catch {
      // ONLY "no such table/view" means "not ours — take the delegate's
      // fallback". Any other resolution failure (e.g. the provider's
      // loud catalog/manifest schema-divergence refusal) must
      // propagate: swallowing it would route an ALTER to Spark's
      // catalog-only path, widening the catalog schema WITHOUT a
      // manifest commit and deepening the very divergence that threw.
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition != null &&
            (e.getCondition.contains("TABLE_OR_VIEW_NOT_FOUND") ||
             e.getCondition.contains("UNRESOLVED_RELATION")) => false
      case _: org.apache.spark.sql.catalyst.parser.ParseException => false
    }
  }

  /** A catalog-backed table stores its schema in the metastore, and the
    * relation provider REFUSES a divergent declared schema — any ops
    * statement that changes the manifest schema (ALTER ADD COLUMNS,
    * RESTORE across an evolution) must keep the catalog in step.
    */
  private[streaming] def syncCatalogSchema(session: SparkSession,
      name: String, store: SnapshotStore): Unit = {
    val ident = session.sessionState.sqlParser.parseTableIdentifier(name)
    val catalog = session.sessionState.catalog
    if (catalog.tableExists(ident)) {
      // alterTable (not alterTableDataSchema): a RESTORE across an
      // evolution NARROWS the schema, which the data-schema path
      // refuses as a column drop — here the manifest is the authority
      val meta = catalog.getTableMetadata(ident)
      catalog.alterTable(meta.copy(schema = store.tableSchema()))
    }
    session.catalog.refreshTable(name)
  }

  /** Byte total of the LATEST version's files — manifest metadata only
    * (commit-time recorded sizes; counted stat fallback for pre-size
    * manifests), never the O(versions × files) history walk and never
    * an O(files) HEAD storm.
    */
  private[streaming] def latestBytes(store: SnapshotStore): Long =
    store.manifestAt()._3.map(store.infoBytes).sum

  private def attr(name: String, dt: org.apache.spark.sql.types.DataType) =
    AttributeReference(name, dt, nullable = true)()

  private[streaming] val historyOutput: Seq[Attribute] = Seq(
    attr("version", LongType), attr("committed_at", TimestampType),
    attr("n_files", IntegerType), attr("bytes", LongType),
    attr("is_rewrite", BooleanType), attr("txn_app", StringType),
    attr("txn", LongType), attr("stats_column", StringType),
    attr("n_columns", IntegerType))
}

/** `DESCRIBE HISTORY t` — the commit log as rows, newest first. */
final case class DescribeHistoryCommand(target: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = SnapshotSqlParser.historyOutput
  override def run(session: SparkSession): Seq[Row] = {
    val (store, _) = SnapshotSqlParser.resolveStore(session, target)
    store.history(session)
      .orderBy(org.apache.spark.sql.functions.col("version").desc)
      .collect().toSeq
  }
}

/** `DESCRIBE DETAIL t` — the live table's one-row summary: format,
  * version, file/byte totals, live-DV count, partition columns and the
  * stats property (Delta's DESCRIBE DETAIL on the manifest's terms).
  */
final case class DescribeDetailCommand(target: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = {
    def attr(n: String, dt: org.apache.spark.sql.types.DataType) =
      AttributeReference(n, dt, nullable = true)()
    Seq(attr("format", StringType), attr("version", LongType),
      attr("n_files", IntegerType), attr("bytes", LongType),
      attr("n_live_dv_files", IntegerType),
      attr("partition_columns", StringType), attr("stats_columns", StringType),
      attr("n_columns", IntegerType), attr("constraints", StringType),
      attr("committed_at", TimestampType))
  }
  override def run(session: SparkSession): Seq[Row] = {
    val (store, _) = SnapshotSqlParser.resolveStore(session, target)
    val v = store.latestVersion.getOrElse(throw new IllegalArgumentException(
      s"DESCRIBE DETAIL: no committed versions"))
    val m = store.readFullManifest(v)
    Seq(Row("graft-snapshot", v, m.entries.length,
      SnapshotSqlParser.latestBytes(store), m.entries.count(_.dv.nonEmpty),
      m.partCols.mkString(","), m.statsColumn.getOrElse(""),
      m.schema.fieldNames.length,
      m.constraints.map { case (n, c) => s"$n: CHECK ($c)" }.mkString("; "),
      new java.sql.Timestamp(m.ts.getOrElse(0L))))
  }
}

/** `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` / `DROP CONSTRAINT
  * name` on a snapshot table: a table property enforced in-plan on
  * every subsequent write; ADD validates existing data first. A
  * non-snapshot target re-runs the delegate's plan when the delegate
  * parses the statement at all, and fails with a clear message
  * otherwise.
  */
final case class AlterConstraintSnapshotCommand(target: String, name: String,
    check: Option[String], fallback: Option[LogicalPlan])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = fallback.toSeq
  override def run(session: SparkSession): Seq[Row] = {
    if (!SnapshotSqlParser.isSnapshotTarget(session, target)) {
      val plan = fallback.getOrElse(throw new IllegalArgumentException(
        s"ALTER TABLE ... CONSTRAINT: '$target' is not a graft-snapshot " +
          "table and Spark's own parser does not accept this statement"))
      org.apache.spark.sql.GraftStreamBridge.ofRows(session, plan).collect()
      return Seq.empty
    }
    val (store, nameOpt) = SnapshotSqlParser.resolveStore(session, target)
    check match {
      case Some(c) => store.addConstraint(session, name, c)
      case None => store.dropConstraint(name)
    }
    nameOpt.foreach(session.catalog.refreshTable)
    Seq.empty
  }
}

/** `OPTIMIZE t [WHERE p] [ZORDER BY (c,...)] [TARGET n FILES]
  * [SMALLER THAN n MB]` — small-file compaction (dataChange = false).
  * `WHERE` scopes the rewrite to the matching PARTITIONS and
  * `SMALLER THAN` to the under-sized files within them (live-DV files
  * are always candidates — compaction is how tombstones materialize):
  * incremental maintenance in both dimensions, the only OPTIMIZE shape
  * that works at 100 TB. Without an explicit TARGET the file count
  * follows the table's bytes at a 128 MiB default target file size —
  * the bin-packing default, never fewer than one file.
  */
final case class OptimizeSnapshotCommand(target: String,
    zorderBy: Seq[String], targetFiles: Option[Int],
    where: Option[String] = None,
    onlySmallerThanBytes: Option[Long] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("target_files", IntegerType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (store, name) = SnapshotSqlParser.resolveStore(session, target)
    val tf = targetFiles.getOrElse {
      // latest version's bytes only — O(files), not the O(versions ×
      // files) a history() walk would pay on a long-retention table
      val bytes = SnapshotSqlParser.latestBytes(store)
      math.max(1L, (bytes + (128L << 20) - 1) / (128L << 20)).toInt
    }
    val scope = where.map(w => org.apache.spark.sql.GraftExprBridge.column(
      session.sessionState.sqlParser.parseExpression(w)))
    val v = store.compactLatest(session, targetFiles = tf,
      zorderBy = zorderBy, scope = scope,
      onlySmallerThanBytes = onlySmallerThanBytes)
    name.foreach(session.catalog.refreshTable)
    Seq(Row(v, tf))
  }
}

/** `VACUUM t RETAIN n VERSIONS` — drop all but the last n versions and
  * reclaim unreferenced files. The retention clause is mandatory: a
  * default that silently erases time travel is how history disappears.
  */
final case class VacuumSnapshotCommand(target: String, retainVersions: Int,
    dryRun: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    if (dryRun) Seq(
      AttributeReference("path", StringType, nullable = false)(),
      AttributeReference("bytes", LongType, nullable = false)(),
      AttributeReference("pinned_by_clone", StringType, nullable = true)())
    else Seq(
      AttributeReference("retained_versions", IntegerType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    require(retainVersions >= 1,
      s"VACUUM: RETAIN must be >= 1 version, got $retainVersions")
    val (store, name) = SnapshotSqlParser.resolveStore(session, target)
    if (dryRun)
      // look-before-you-reclaim (Delta's VACUUM ... DRY RUN): the exact
      // files the real vacuum would delete, clone pins surfaced — NO
      // mutation of manifests, data, or the clone ledger
      store.vacuumPreview(keepLast = retainVersions)
        .sortBy(_._1)
        .map { case (path, bytes, pin) => Row(path, bytes, pin.orNull) }
    else {
      store.vacuum(keepLast = retainVersions)
      name.foreach(session.catalog.refreshTable)
      Seq(Row(store.versions.length))
    }
  }
}

/** `CREATE TABLE t2 SHALLOW CLONE t1 [VERSION AS OF v] [LOCATION 'p']` —
  * zero-copy table fork: one manifest commit referencing the source's
  * files by absolute path ([[SnapshotStore.cloneFrom]]). A catalog-name
  * target requires LOCATION (the clone needs its own store root) and is
  * registered in the catalog; a quoted-path target clones straight to
  * that path. Histories diverge independently afterwards.
  */
final case class ShallowCloneSnapshotCommand(target: String, source: String,
    version: Option[Long], location: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("cloned_version", LongType, nullable = false)(),
    AttributeReference("n_files", IntegerType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (src, _) = SnapshotSqlParser.resolveStore(session, source)
    val t = target.trim
    val quotedPath = (t.startsWith("'") && t.endsWith("'")) ||
      (t.startsWith("\"") && t.endsWith("\""))
    val root = if (quotedPath) t.substring(1, t.length - 1)
      else location.getOrElse(throw new IllegalArgumentException(
        s"SHALLOW CLONE: catalog target '$target' needs LOCATION '<path>' " +
          "(the clone is a new store; its root cannot be inferred)"))
    val clone = new SnapshotStore(root)
    clone.cloneFrom(src, version)
    if (!quotedPath)
      session.sql(s"CREATE TABLE $target USING `graft-snapshot` " +
        s"OPTIONS (path '${root.replace("'", "''")}')")
    val m = clone.readFullManifest(0L)
    Seq(Row(version.getOrElse(src.latestVersion.get), m.entries.length))
  }
}

/** `CREATE TABLE t FROM DELTA '<path>' [VERSION AS OF n]
  * [STATS COLUMN c] [LOCATION '<root>']` — SQL rail for
  * [[SnapshotStore.convertFromDelta]]: adopt an existing Delta Lake
  * table (optionally at an historical version) as a zero-copy
  * version 0, the migration statement a user coming off the
  * reference's Delta-format RAW zone runs on day one. Same target
  * shape as SHALLOW CLONE: a catalog name needs LOCATION (the adopted
  * store's own root), a quoted path adopts straight there.
  */
final case class ConvertFromDeltaSnapshotCommand(target: String,
    deltaPath: String, version: Option[Long], statsColumn: Option[String],
    location: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("adopted_version", LongType, nullable = false)(),
    AttributeReference("n_files", IntegerType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val t = target.trim
    val quotedPath = (t.startsWith("'") && t.endsWith("'")) ||
      (t.startsWith("\"") && t.endsWith("\""))
    val root = if (quotedPath) t.substring(1, t.length - 1)
      else location.getOrElse(throw new IllegalArgumentException(
        s"CREATE TABLE ... FROM DELTA: catalog target '$target' needs " +
          "LOCATION '<path>' (the adopted store is new; its root cannot " +
          "be inferred)"))
    val store = new graft.etl.SnapshotStore(root)
    val v = store.convertFromDelta(session, deltaPath, statsColumn, version)
    if (!quotedPath)
      session.sql(s"CREATE TABLE $target USING `graft-snapshot` " +
        s"OPTIONS (path '${root.replace("'", "''")}')")
    Seq(Row(v, store.readFullManifest(v).entries.length))
  }
}

/** `EXPORT TABLE t TO DELTA [WITH CHANGE FEED]` — SQL rail for
  * [[SnapshotStore.exportToDelta]]: write (or incrementally extend) a
  * stock Delta transaction log beside the store's own manifests, so
  * downstream Delta readers consume the table in place. Idempotent;
  * re-run after commits to mirror them. `WITH CHANGE FEED` exports the
  * store's change feed as Delta CDF (`cdc` actions + `_change_data/`).
  */
final case class ExportToDeltaSnapshotCommand(target: String,
    changeDataFeed: Boolean = false) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("exported_version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (store, _) = SnapshotSqlParser.resolveStore(session, target)
    Seq(Row(store.exportToDelta(session, changeDataFeed)))
  }
}

/** `RESTORE [TABLE] t TO VERSION AS OF v` / `TO TIMESTAMP AS OF 'ts'` —
  * zero-copy rollback by manifest republish.
  */
final case class RestoreSnapshotCommand(target: String,
    toVersion: Option[Long], toTimestamp: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_to", LongType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (store, name) = SnapshotSqlParser.resolveStore(session, target)
    val v = toVersion.getOrElse {
      val s = toTimestamp.get
      // Spark convention: a zone-less timestamp literal resolves in the
      // SESSION timezone, not hardcoded UTC — a non-UTC session must
      // not restore to a version offset by the UTC delta
      val zone = java.time.ZoneId.of(
        session.sessionState.conf.sessionLocalTimeZone)
      val inst = try java.time.Instant.parse(s) catch {
        case _: java.time.format.DateTimeParseException =>
          java.time.LocalDateTime.parse(s.replace(' ', 'T'))
            .atZone(zone).toInstant
      }
      store.versionAt(inst)
    }
    val nv = store.restore(session, v)
    // a restore across a schema evolution changes the live schema
    name.foreach(SnapshotSqlParser.syncCatalogSchema(session, _, store))
    Seq(Row(v, nv))
  }
}

/** `ALTER TABLE t SET BLOOMFILTER COLUMN c` / `DROP BLOOMFILTER` —
  * the point-lookup file-skipping property for an UNCLUSTERED column:
  * files staged from now on carry a 512-byte membership filter in
  * their manifest entries; point predicates, point deletes/updates and
  * small-key-set merges skip files the value cannot be in.
  */
final case class SetBloomSnapshotCommand(target: String,
    column: Option[String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (store, name) = SnapshotSqlParser.resolveStore(session, target)
    store.setBloomFilter(column)
    name.foreach(session.catalog.refreshTable)
    Seq.empty
  }
}

/** `ALTER TABLE t ALTER COLUMN c TYPE <wider>` on a snapshot table:
  * TYPE WIDENING as one O(manifest) commit — old narrow files upcast
  * at scan time (Spark's parquet reader does this natively), new files
  * store the wide type. Non-snapshot targets re-run the delegate's plan.
  */
final case class AlterColumnTypeSnapshotCommand(target: String,
    column: String, ddlType: String, fallback: Option[LogicalPlan])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = fallback.toSeq
  override def run(session: SparkSession): Seq[Row] = {
    if (!SnapshotSqlParser.isSnapshotTarget(session, target)) {
      val plan = fallback.getOrElse(throw new IllegalArgumentException(
        s"ALTER TABLE ... ALTER COLUMN TYPE: '$target' is not a " +
          "graft-snapshot table and Spark's own parser does not accept " +
          "this statement"))
      org.apache.spark.sql.GraftStreamBridge.ofRows(session, plan).collect()
      return Seq.empty
    }
    val (store, name) = SnapshotSqlParser.resolveStore(session, target)
    store.widenColumnType(column,
      session.sessionState.sqlParser.parseDataType(ddlType))
    name.foreach(SnapshotSqlParser.syncCatalogSchema(session, _, store))
    Seq.empty
  }
}

/** `ALTER TABLE t RENAME COLUMN a TO b` / `DROP COLUMN c` on a
  * snapshot table: one O(manifest) commit via COLUMN MAPPING — zero
  * file rewrites, old versions time-travel with their own names, and
  * a re-added name never resurrects dropped values (retired-physical
  * tracking). Non-snapshot targets re-run the delegate's own plan.
  */
final case class AlterColumnSnapshotCommand(target: String,
    rename: Option[(String, String)], drops: Seq[String],
    fallback: Option[LogicalPlan]) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = fallback.toSeq
  override def run(session: SparkSession): Seq[Row] = {
    if (!SnapshotSqlParser.isSnapshotTarget(session, target)) {
      val plan = fallback.getOrElse(throw new IllegalArgumentException(
        s"ALTER TABLE ... COLUMN: '$target' is not a graft-snapshot table " +
          "and Spark's own parser does not accept this statement"))
      org.apache.spark.sql.GraftStreamBridge.ofRows(session, plan).collect()
      return Seq.empty
    }
    val (store, name) = SnapshotSqlParser.resolveStore(session, target)
    rename match {
      case Some((from, to)) => store.renameColumn(session, from, to)
      case None => drops.foreach(c => store.dropColumn(session, c))
    }
    name.foreach(SnapshotSqlParser.syncCatalogSchema(session, _, store))
    Seq.empty
  }
}

/** `ALTER TABLE t ADD COLUMNS (c TYPE, ...)` on a snapshot table: one
  * O(manifest) commit widening the schema (old files null-pad). Any
  * other table re-runs the delegate parser's own plan, so non-snapshot
  * ALTERs are untouched.
  */
final case class AddColumnsSnapshotCommand(target: String, colsDdl: String,
    fallback: LogicalPlan) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(fallback)
  override def run(session: SparkSession): Seq[Row] = {
    if (!SnapshotSqlParser.isSnapshotTarget(session, target)) {
      org.apache.spark.sql.GraftStreamBridge.ofRows(session, fallback).collect()
      return Seq.empty
    }
    val (store, name) = SnapshotSqlParser.resolveStore(session, target)
    val newCols = session.sessionState.sqlParser.parseTableSchema(colsDdl)
    store.addColumns(newCols)
    name.foreach(SnapshotSqlParser.syncCatalogSchema(session, _, store))
    Seq.empty
  }
}
