package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Resolution rule: SQL time travel on `graft-snapshot` catalog tables —
  *
  * {{{
  *   SELECT ... FROM t VERSION AS OF 3
  *   SELECT ... FROM t TIMESTAMP AS OF '2026-01-01 00:00:00'
  * }}}
  *
  * Spark parses the travel spec into [[RelationTimeTravel]] and resolves
  * it only through the DSv2 `loadTable(ident, version)` path — a V1
  * session-catalog table never gets there. This rule intercepts the
  * node while its child is still an [[UnresolvedRelation]], looks the
  * identifier up in the session catalog, and — when the table's
  * provider is `graft-snapshot` — folds the travel spec onto the
  * format's own reader options (`versionAsOf` / `timestampAsOf`), which
  * plan through [[SnapshotFileIndex]] with the manifest pinned to that
  * version. Everything else is left untouched for Spark's own
  * resolution (and its own unsupported-time-travel error).
  *
  * A non-existent version fails with the STORE's message (version list
  * included) during relation construction — same failure surface as the
  * option-based read, because it IS the option-based read.
  */
final class SnapshotTimeTravelRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, timestamp, version)
        if timestamp.forall(_.resolved) =>
      snapshotPath(u.multipartIdentifier) match {
        case None => tt // not ours: Spark's own resolution owns it
        case Some(path) =>
          val reader = session.read.format("graft-snapshot").option("path", path)
          val withSpec = (version, timestamp) match {
            case (Some(v), None) => reader.option("versionAsOf", v)
            case (None, Some(ts)) =>
              reader.option("timestampAsOf", timestampString(ts))
            case _ => throw new IllegalArgumentException(
              "graft-snapshot: VERSION AS OF and TIMESTAMP AS OF are mutually exclusive")
          }
          withSpec.load().queryExecution.logical
      }
  }

  /** The store root of a `graft-snapshot` catalog table, or None when
    * the identifier is not one (unknown table, other provider, a view —
    * all Spark's business, not ours).
    */
  private def snapshotPath(parts: Seq[String]): Option[String] = {
    val catalog = session.sessionState.catalog
    val ti = parts match {
      case Seq(t) => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case Seq(cat, db, t) if cat.equalsIgnoreCase("spark_catalog") =>
        TableIdentifier(t, Some(db))
      case _ => return None
    }
    if (!catalog.tableExists(ti)) return None
    val meta = catalog.getTableMetadata(ti)
    if (!meta.provider.exists(_.equalsIgnoreCase("graft-snapshot"))) None
    else meta.storage.properties.get("path")
      .orElse(meta.storage.locationUri.map(_.toString))
  }

  /** TIMESTAMP AS OF operand → the format's `timestampAsOf` option
    * string: a string literal passes through (the reader parses ISO and
    * 'yyyy-MM-dd HH:mm:ss'), a timestamp-typed foldable expression
    * (e.g. `current_timestamp() - INTERVAL 1 HOUR`) evaluates to micros
    * and renders as an ISO instant.
    */
  private def timestampString(
      e: org.apache.spark.sql.catalyst.expressions.Expression): String = {
    require(e.foldable,
      s"graft-snapshot: TIMESTAMP AS OF must be a constant expression, got ${e.sql}")
    e.eval(null) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case micros: Long =>
        java.time.Instant.EPOCH.plus(micros, java.time.temporal.ChronoUnit.MICROS)
          .toString
      case other => throw new IllegalArgumentException(
        s"graft-snapshot: cannot read TIMESTAMP AS OF value $other")
    }
  }
}
