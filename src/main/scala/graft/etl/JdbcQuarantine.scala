package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-wise JDBC append with per-row error capture — the engine-side
  * replica of the reference warehouse's `on_error=CONTINUE` load option
  * (`/root/reference/ingest.py:795-799`): the warehouse's COPY skips
  * rows that violate the target and files them in its rejects view;
  * plain JDBC has no such mode, so one poison row aborts the whole
  * batch the reference would have loaded.
  *
  * This is the FALLBACK path, not the default: callers first attempt
  * the bulk `df.write.jdbc` (batched inserts, one transaction per
  * partition — the fast path), and only on failure re-apply row-wise.
  * Row-at-a-time inserts are ~10-50× slower per row, which is the
  * right trade exactly once a batch is known-poisoned: correctness of
  * the N-1 good rows over throughput of the retry.
  *
  * Distribution: the retry runs as a `foreachPartition` job — each
  * executor opens one connection and streams its partition through two
  * prepared statements (target insert, quarantine insert). No driver
  * collect, no per-row connection churn; at warehouse scale the retry
  * parallelism equals the batch's partitioning, same as the bulk path.
  *
  * Quarantine table shape (created on first use):
  * `(batch_id BIGINT, err VARCHAR(2048), payload VARCHAR(16384))` —
  * the cause as the database reported it, and the full rejected row
  * rendered as JSON so a human (or a replay job) can reconstruct it
  * without the source batch.
  */
object JdbcQuarantine {

  /** The SQLException at the root of a (possibly Spark-wrapped) write
    * failure, if any — the fallback trigger: only DATABASE rejections
    * get the row-wise retry; a dead network or an OOM should propagate.
    */
  def rootSql(e: Throwable): Option[java.sql.SQLException] = {
    var cur = e
    var hops = 0
    while (cur != null && hops < 20) {
      cur match {
        case s: java.sql.SQLException => return Some(s)
        case _ => cur = cur.getCause; hops += 1
      }
    }
    None
  }

  private def sqlTypeOf(dt: DataType): Int = dt match {
    case StringType => java.sql.Types.VARCHAR
    case LongType => java.sql.Types.BIGINT
    case IntegerType => java.sql.Types.INTEGER
    case ShortType => java.sql.Types.SMALLINT
    case ByteType => java.sql.Types.TINYINT
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.FLOAT
    case BooleanType => java.sql.Types.BOOLEAN
    case BinaryType => java.sql.Types.BINARY
    case TimestampType => java.sql.Types.TIMESTAMP
    case DateType => java.sql.Types.DATE
    case _: DecimalType => java.sql.Types.DECIMAL
    case _ => java.sql.Types.OTHER
  }

  /** Ensure the quarantine table exists (racing creators are fine). */
  def ensureQuarantineTable(url: String, q: String,
      props: java.util.Properties): Unit = {
    val c = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = c.createStatement()
      try st.executeUpdate(
        s"CREATE TABLE $q (batch_id BIGINT, err VARCHAR(2048), payload VARCHAR(16384))")
      catch { case _: java.sql.SQLException => () } // already exists
      finally st.close()
    } finally c.close()
  }

  /** Insert `df` into `table` one row at a time; rows the database
    * rejects land in `quarantineTable` with the error text and the row
    * as JSON. Returns (inserted, quarantined) counts.
    *
    * Column names are double-quoted in the INSERT (the Spark JDBC
    * writer creates case-exact quoted identifiers); the target table
    * must already exist — a poison ROW presupposes a table with
    * constraints to violate.
    */
  def rowwiseAppend(
      df: DataFrame,
      url: String,
      table: String,
      quarantineTable: String,
      props: java.util.Properties): (Long, Long) = {
    ensureQuarantineTable(url, quarantineTable, props)
    val cols = df.schema.fields
    val names = cols.map(_.name)
    val types = cols.map(f => sqlTypeOf(f.dataType))
    val batchIdIdx = names.indexOf("batch_id") // -1 when untagged
    val insertSql = s"INSERT INTO $table (" +
      names.map(n => s""""$n"""").mkString(",") + ") VALUES (" +
      names.map(_ => "?").mkString(",") + ")"
    val qSql = s"INSERT INTO $quarantineTable (batch_id, err, payload) VALUES (?,?,?)"
    val spark = df.sparkSession
    val okAcc = spark.sparkContext.longAccumulator("quarantine_inserted")
    val badAcc = spark.sparkContext.longAccumulator("quarantine_rejected")
    // payload rendered engine-side (to_json handles timestamps/decimals
    // canonically) so the executor loop only ships strings
    val withPayload = df.withColumn("__payload",
      to_json(struct(names.map(col).toIndexedSeq: _*)))
    withPayload.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.nonEmpty) {
        val c = java.sql.DriverManager.getConnection(url, props)
        try {
          c.setAutoCommit(true) // per-row durability: a crash mid-retry
          // loses nothing and the ledger repair wipes this batch anyway
          val ins = c.prepareStatement(insertSql)
          val qst = c.prepareStatement(qSql)
          try {
            it.foreach { row =>
              var i = 0
              while (i < names.length) {
                val v = row.get(i)
                if (v == null) ins.setNull(i + 1, types(i))
                else ins.setObject(i + 1, v)
                i += 1
              }
              try { ins.executeUpdate(); okAcc.add(1L) }
              catch {
                case e: java.sql.SQLException =>
                  val bid = if (batchIdIdx >= 0 && !row.isNullAt(batchIdIdx))
                    row.getLong(batchIdIdx) else -1L
                  val err = Option(e.getMessage).getOrElse(e.getClass.getName)
                  qst.setLong(1, bid)
                  qst.setString(2, err.take(2048))
                  qst.setString(3, row.getString(names.length).take(16384))
                  qst.executeUpdate()
                  badAcc.add(1L)
              }
            }
          } finally { ins.close(); qst.close() }
        } finally c.close()
      }
    }
    (okAcc.value, badAcc.value)
  }
}
