package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** File-count scale probe for the LOG-STRUCTURED manifest: measures a
  * 1-row append's commit latency and manifest bytes against a table of
  * F files and one of 10F files. Under the pre-round-15 full-list
  * format both grew linearly with the file count (every commit re-read
  * and re-wrote the whole list); under delta commits both must be FLAT
  * — the 100 TB criterion, where a per-minute CDC sink appends into a
  * ~10⁶-file table. Feeds the BASELINE.md scale table.
  *
  *   runMain graft.ManifestScale [files] [appendsPerPoint]
  */
object ManifestScale {
  def main(args: Array[String]): Unit = {
    val files = args.headOption.map(_.toInt).getOrElse(200)
    val appends = args.lift(1).map(_.toInt).getOrElse(9)
    val spark = GraftSession.local("graft-manifest-scale", cores = 32)
    import spark.implicits._

    def measure(f: Int): (Double, Long, Long) = {
      val root = java.nio.file.Files.createTempDirectory(s"graft-ms$f").toString
      val store = new graft.etl.SnapshotStore(root)
      store.commitOverwrite(
        (1L to (f * 100L)).map(i => (i, s"v$i")).toDF("id", "v")
          .repartition(f),
        statsColumn = Some("id"))
      // steady-state appends (skip v1 — it may pay one-time JIT);
      // median wall-clock per commitAppend, bytes of its manifest file
      val one = Seq((0L, "x")).toDF("id", "v").coalesce(1)
      val times = (1 to appends).map { k =>
        val t0 = System.nanoTime()
        val v = store.commitAppend(one)
        val ms = (System.nanoTime() - t0) / 1e6
        val bytes = java.nio.file.Files.size(java.nio.file.Paths.get(
          root, "manifests", f"v$v%012d.manifest"))
        (ms, bytes)
      }
      // MIN is the steady-state estimator (same contract as the
      // bench's min-of-two): a single append absorbing a GC/JIT spike
      // must not read as file-count scaling
      val minMs = times.map(_._1).min
      val deltaBytes = times.map(_._2).min // smallest = a pure delta commit
      val ckBytes = java.nio.file.Files.size(java.nio.file.Paths.get(
        root, "manifests", f"v${0L}%012d.manifest"))
      (minMs, deltaBytes, ckBytes)
    }
    val (ms1, db1, cb1) = measure(files)
    val (ms10, db10, cb10) = measure(files * 10)
    println(
      s"""{"probe":"manifest_append_scale","files_1x":$files,""" +
      s""""append_ms_1x":${f"$ms1%.1f"},"delta_bytes_1x":$db1,"checkpoint_bytes_1x":$cb1,""" +
      s""""files_10x":${files * 10},"append_ms_10x":${f"$ms10%.1f"},""" +
      s""""delta_bytes_10x":$db10,"checkpoint_bytes_10x":$cb10}""")
    spark.stop()
  }
}
