package graft

import org.apache.spark.sql.functions._

/** File-count scale probe for manifest-resident bloom skipping: builds
  * a table of F bloom-indexed files and one of 10F, then measures a
  * point lookup that HITS one file and one that MISSES every file (the
  * miss is the pure planning + per-file probe cost — zero data IO when
  * every filter excludes the value). Bounded probe cost is the
  * saturation-honesty criterion: k=6 word probes per file regardless
  * of filter size, filterless (past-cap) entries probed not at all.
  *
  *   runMain graft.BloomScale [files] [reps]
  */
object BloomScale {
  def main(args: Array[String]): Unit = {
    val files = args.headOption.map(_.toInt).getOrElse(64)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.local("graft-bloom-scale", cores = 32)
    import spark.implicits._

    def measure(f: Int): (Double, Double, Long, Double) = {
      val root = java.nio.file.Files.createTempDirectory(s"graft-bs$f").toString
      val store = new graft.etl.SnapshotStore(root)
      val rows = f * 500L // 500 distinct uids per file: the design density
      store.commitOverwrite(
        spark.range(1L, rows + 1L)
          .select($"id", ($"id" * 2654435761L % 999999937L).as("uid"), $"id".as("v"))
          .repartitionByRange(f, $"id"),
        statsColumn = Some("id"))
      store.setBloomFilter(Some("uid"))
      // build cost: compaction restages every file WITH filters — the
      // two-pass distributed bloom build (exact countDistinct sizing +
      // executor-side OR-merge; the driver holds only the manifest
      // payload, never hash sets)
      val tb0 = System.nanoTime()
      store.compactLatest(spark, targetFiles = f)
      val buildMs = (System.nanoTime() - tb0) / 1e6
      val df = spark.read.format("graft-snapshot").option("path", root).load()
      val hit = 777L * 2654435761L % 999999937L
      def time(value: Long): Double =
        (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          df.filter($"uid" === value).count()
          (System.nanoTime() - t0) / 1e6
        }.min
      val manifestBytes = java.nio.file.Files.size(java.nio.file.Paths.get(
        root, "manifests", f"v${store.latestVersion.get}%012d.manifest"))
      (time(hit), time(-1L), manifestBytes, buildMs)
    }
    val (hit1, miss1, mb1, b1) = measure(files)
    val (hit10, miss10, mb10, b10) = measure(files * 10)
    println(
      s"""{"probe":"bloom_probe_scale","files_1x":$files,""" +
      s""""hit_ms_1x":${f"$hit1%.1f"},"miss_ms_1x":${f"$miss1%.1f"},""" +
      s""""manifest_bytes_1x":$mb1,"build_ms_1x":${f"$b1%.0f"},""" +
      s""""files_10x":${files * 10},""" +
      s""""hit_ms_10x":${f"$hit10%.1f"},"miss_ms_10x":${f"$miss10%.1f"},""" +
      s""""manifest_bytes_10x":$mb10,"build_ms_10x":${f"$b10%.0f"}}""")
    spark.stop()
  }
}
