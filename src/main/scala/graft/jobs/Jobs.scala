package graft.jobs

import org.apache.spark.sql.SparkSession
import graft.GraftSession
import graft.etl.Pipeline
import scala.util.{Failure, Success}

/** Runnable jobs mirroring the reference's two entry points — the
  * "switch your cron job over" surface. Config is CLI flags (the
  * reference hard-codes Databricks secret lookups, sync.py:184-204 /
  * ingest.py:25-38; here everything injects).
  */
private[jobs] object JobArgs {
  def parse(args: Array[String]): Map[String, String] = {
    require(args.length % 2 == 0,
      s"flags must come in --key value pairs, got: ${args.mkString(" ")}")
    args.sliding(2, 2).map {
      case Array(k, v) if k.startsWith("--") && !v.startsWith("--") =>
        k.stripPrefix("--") -> v
      case Array(k, v) =>
        throw new IllegalArgumentException(s"malformed flag pair: '$k $v'")
    }.toMap
  }

  def session(name: String): SparkSession =
    GraftSession.tuned(SparkSession.builder().appName(name)).getOrCreate()

  def jdbcProps(conf: Map[String, String]): java.util.Properties = {
    val p = new java.util.Properties()
    conf.get("jdbc-driver").foreach(p.setProperty("driver", _))
    conf.get("jdbc-user").foreach(p.setProperty("user", _))
    conf.get("jdbc-password").foreach(p.setProperty("password", _))
    p.setProperty("fetchsize", conf.getOrElse("fetchsize", "10000")) // sync.py:74
    p
  }
}

/** Stage 1 — database → columnar RAW zone (the reference's sync.py):
  * per-table JDBC read → parquet overwrite → re-read count
  * reconciliation, per-table error isolation (sync.py:169-179).
  *
  *   --jdbc-url URL --tables t1,t2 --dest DIR
  *   [--partition-col col:lo:hi:n]  (ALWAYS set in production — the
  *     reference's unpartitioned read serializes the table through one
  *     task, sync.py:82)
  *   [--jdbc-driver CLS --jdbc-user U --jdbc-password P --fetchsize N]
  */
object SyncJob {
  def run(spark: SparkSession, conf: Map[String, String]): Seq[(String, Long, Long)] = {
    val url = conf("jdbc-url")
    val dest = conf("dest")
    val props = JobArgs.jdbcProps(conf)
    val partition = conf.get("partition-col").map { s =>
      val Array(c, lo, hi, n) = s.split(":")
      (c, lo.toLong, hi.toLong, n.toInt)
    }
    conf("tables").split(",").toSeq.flatMap { table =>
      try {
        val df = Pipeline.JdbcSource(url, table, props, partition).load(spark)
        val sourceCount = df.count()
        df.write.mode("overwrite").parquet(s"$dest/$table.parquet")
        val written = spark.read.parquet(s"$dest/$table.parquet").count()
        if (written != sourceCount)
          System.err.println(s"""{"job":"sync","table":"$table","warn":"count drift $sourceCount -> $written"}""")
        println(s"""{"job":"sync","table":"$table","source_rows":$sourceCount,"written_rows":$written}""")
        Some((table, sourceCount, written))
      } catch {
        case e: Exception => // isolate-and-continue, sync.py:169-179
          System.err.println(s"""{"job":"sync","table":"$table","error":"${e.getMessage}"}""")
          None
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = JobArgs.session("graft-sync")
    try run(spark, JobArgs.parse(args)) finally spark.stop()
  }
}

/** Stage 2 — RAW zone → conform/cleanse/validate → warehouse staging
  * (the reference's ingest.py): per-table conform pipeline with
  * append / truncate-then-append / watermark-incremental modes,
  * fail-fast error policy (ingest.py:829-832).
  *
  *   --source-dir DIR --sink-dir DIR --watermark-dir DIR
  *   [--tables lead_assignment,lead_xref,lead] [--mode append|delta_insert]
  *   [--historical true] [--truncate true]
  */
object IngestJob {
  def run(spark: SparkSession, conf: Map[String, String]): Seq[(String, Pipeline.Report)] = {
    val src = conf("source-dir")
    val dst = conf("sink-dir")
    val tables = conf.getOrElse("tables", "lead_assignment,lead_xref,lead").split(",").toSeq
    val mode: Pipeline.WriteMode = conf.getOrElse("mode", "append") match {
      case "append" => Pipeline.Append(truncateFirst = conf.get("truncate").contains("true"))
      case "delta_insert" => Pipeline.DeltaInsert
      case other => throw new IllegalArgumentException(s"unknown mode $other") // ingest.py:823-825
    }
    val out = Pipeline.run(
      spark,
      tables = tables,
      enabled = tables.map(_ -> true).toMap,
      source = t => Pipeline.ParquetSource(s"$src/$t.parquet"),
      sink = t => Pipeline.ParquetSink(s"$dst/$t"),
      mode = mode,
      watermarks = new Pipeline.WatermarkStore(conf.getOrElse("watermark-dir", s"$dst/_watermarks")),
      historicalLoad = conf.get("historical").contains("true"),
      failFast = true)
    out.foreach {
      case (t, Success(r)) =>
        println(s"""{"job":"ingest","table":"$t","rows":${r.rowsWritten},"skipped_empty":${r.skippedEmpty}}""")
      case (t, Failure(e)) =>
        System.err.println(s"""{"job":"ingest","table":"$t","error":"${e.getMessage}"}""")
    }
    out.collect { case (t, Success(r)) => (t, r) }
  }

  def main(args: Array[String]): Unit = {
    val spark = JobArgs.session("graft-ingest")
    try run(spark, JobArgs.parse(args)) finally spark.stop()
  }
}
