package graft.multimodal

import java.security.MessageDigest
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video carried as opaque
  * `binary` columns with a typed metadata struct, plus the
  * decode / feature-extract / resize / frame-sample operator set.
  *
  * The Spark-side plumbing is real: typed Dataset API, mapPartitions
  * batch execution (one codec init per partition — the Scala analogue of
  * a pandas-batched UDF), binary-safe schemas, deterministic output.
  *
  * Codecs: IMAGES decode for REAL — raw PNM (PGM "P5"/PPM "P6") via
  * the pure-JVM [[graft.functions.PnmDecode]] expression (header parse
  * + raster read + Rec. 709 integer luma), and compressed containers
  * (PNG/JPEG/BMP/GIF) via the JDK-builtin
  * [[graft.functions.ImageIoDecode]] (javax.imageio ships in
  * java.desktop); [[imageDecode]] unifies both behind one struct.
  * AUDIO (RIFF/WAVE PCM) decodes for real via
  * [[graft.functions.WavDecode]]. VIDEO decodes for real via
  * [[graft.functions.AviFrames]] for AVI — uncompressed DIB frames
  * bit-exactly, and Motion-JPEG ('MJPG') frames through the
  * JDK-builtin JPEG reader. PCM RESAMPLING is real integer linear
  * interpolation ([[audioResample]]). Only inter-frame codecs the JDK
  * lacks (H.264-class) still need external libraries, so
  * [[Media.decodeStub]] stands in for those, deriving features from
  * md5 of the payload; a real deployment swaps that one function for
  * the JNI/FFI call — every signature, schema and partitioning
  * decision stays.
  */
object Media {

  /** Typed metadata carried beside the payload; unused fields are 0/"". */
  final case class MediaMeta(
      kind: String, // "image" | "audio" | "video"
      width: Int, height: Int,
      sampleRateHz: Int, durationMs: Long,
      codec: String)

  final case class MediaRecord(media_id: Long, meta: MediaMeta, bytes: Array[Byte])

  final case class MediaFeatures(media_id: Long, kind: String, dim: Int, features: Array[Float])

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes).map("%02x".format(_)).mkString

  /** 60-bit seeded hash, identical to graft.ext.TextHash.hash64 (and so
    * to the DuckDB oracle's arithmetic).
    */
  private def hash64(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s"0:$s".getBytes("UTF-8").clone()).take(15), 16)

  /** CODEC STUB — deterministic fake decode, now covering ONLY
    * inter-frame video codecs the JDK lacks (H.264-class); JPEG/PNG/
    * BMP/GIF/PNM images, WAV audio, PCM resampling, and DIB/MJPEG AVI
    * all decode for real elsewhere in this object. The fake derives
    * `dim` floats in [0,1) from the md5 of the payload so the
    * distributed pipeline around it is fully verifiable. Swap this
    * single function for the real FFI call.
    */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val h = md5Hex(bytes)
    Array.tabulate(dim)(i => ((hash64(s"$h:$i") % 1000L).toDouble / 1000.0).toFloat)
  }

  /** Batched feature extraction: mapPartitions so per-partition setup
    * (real codecs are expensive to init) happens once per task, not per
    * row — the JVM shape of a pandas-batched UDF. Output is a typed
    * Dataset; partitioning of the input is preserved (narrow op).
    */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition codec init would go here
      it.map(r => MediaFeatures(r.media_id, r.meta.kind, dim, decodeStub(r.bytes, dim)))
    }
  }

  /** Resize planning: target box fit preserving aspect ratio — pure
    * metadata math (the byte-level resample lives behind the codec stub).
    */
  def fitWithin(meta: MediaMeta, maxW: Int, maxH: Int): (Int, Int) = {
    if (meta.width <= 0 || meta.height <= 0) (0, 0)
    else {
      val scale = math.min(1.0, math.min(maxW.toDouble / meta.width, maxH.toDouble / meta.height))
      (math.max(1, (meta.width * scale).toInt), math.max(1, (meta.height * scale).toInt))
    }
  }

  /** Frame-sample plan for a video payload: offsets (ms) of frames to
    * grab, one every `everyMs`, as a pure expression usable in a select
    * over millions of rows (no UDF).
    */
  def frameOffsets(durationMs: org.apache.spark.sql.Column, everyMs: Long): org.apache.spark.sql.Column =
    when(durationMs > 0,
      transform(
        // Column `/` is double division — floor+cast makes it the
        // integer division sequence() needs (exact for positive ms)
        sequence(lit(0L), floor((durationMs - 1) / lit(everyMs)).cast("long")),
        i => i * lit(everyMs)))
      .otherwise(array().cast("array<bigint>"))

  /** Perceptual hashes of a binary payload column: the 8×8 box-filter
    * luma grid ([[graft.functions.LumaGrid]]) plus the 64-bit
    * average-hash and difference-hash over it — the integer-exact
    * image-fingerprint pair (aHash tracks global brightness shape,
    * dHash local gradients; dedup uses dHash, retrieval filters often
    * want both). Scan-stage, codegen, no shuffle.
    */
  def perceptualHashes(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    import graft.functions.MediaFunctions._
    df.select(col(idCol).as("media_id"),
        lumaGrid(col(bytesCol).cast("binary")).as("luma"))
      .select(col("media_id"), col("luma"),
        aHash64(col("luma")).as("ahash"), dHash64(col("luma")).as("dhash"))
  }

  /** Binary near-duplicate pairs by dHash Hamming distance — the image
    * twin of [[graft.ext.Dedup.simhashPairs]], same pigeonhole
    * bucketing: split the 64-bit dHash into maxHamming+1 disjoint
    * chunks, equi-join on (chunkIdx, chunkValue) — any pair within the
    * Hamming bound shares at least one exact chunk — then verify with
    * the true popcount. No pair explosion: the join is a keyed
    * equi-join on chunk values, never payload×payload.
    *
    * Scale: hashes are scan-stage; the shuffle carries (chunks per
    * media) 16-byte rows. An identical-plan self-join lets
    * ReuseExchange compute the hashes once.
    */
  def phashPairs(
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      maxHamming: Int = 4): DataFrame =
    dhashNeardupPairs(
      df.select(col(idCol).as("media_id"),
        graft.functions.MediaFunctions.dHash64(
          graft.functions.MediaFunctions.lumaGrid(col(bytesCol).cast("binary")))
          .as("dh")),
      maxHamming)

  /** [[phashPairs]] over REAL pixels: payloads are raw PNM images
    * (PGM "P5" / PPM "P6"), decoded by the pure-JVM
    * [[graft.functions.PnmDecode]] expression, box-filtered 2-D onto
    * the 8×8 grid ([[graft.functions.LumaGrid2D]]), dHashed, and
    * pigeonhole-bucketed exactly like the byte-stream variant.
    * Undecodable payloads (corrupt header, truncated raster) drop out
    * — decode failure is data, not an abort. Same scale shape:
    * scan-stage hashes, keyed chunk join, no pair blowup.
    */
  def pnmPhashPairs(
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      maxHamming: Int = 4): DataFrame = {
    import graft.functions.MediaFunctions._
    val base = df
      .select(col(idCol).as("media_id"),
        bindOnce(pnmDecode(col(bytesCol).cast("binary")), _.isNotNull)(p =>
          dHash64(lumaGrid2d(p.getField("gray"), p.getField("width"),
            p.getField("height")))).as("dh"))
      .filter(col("dh").isNotNull)
    dhashNeardupPairs(base, maxHamming)
  }

  /** Evaluates `once` EXACTLY once per row: the value binds as a
    * higher-order-function lambda variable, rows failing `keep` drop
    * via the empty-array explode, and `body(v)` is the generated
    * column. This is the decode boundary every media operator routes
    * through, and it exists because the innocent spelling
    * `.select(decode.as("x")).filter(x.isNotNull)` is a performance
    * trap: Catalyst's filter pushdown substitutes the alias into the
    * pushed predicate, so the ENTIRE decode pipeline re-evaluates per
    * pushed conjunct — measured 2× on the AVI frame-stats path
    * (5.5 s → 3.0 s at sf0.1 after this rewrite, rows bit-identical).
    * Binding through `filter(array(once), keep)` makes single
    * evaluation STRUCTURAL rather than optimizer-dependent, and the
    * Generate output is a pushdown barrier, so downstream filters on
    * the result stay cheap attribute predicates. The HOF wrapper
    * itself is O(1) per row (a 1-element array).
    */
  private def bindOnce(once: Column, keep: Column => Column)(
      body: Column => Column): Column =
    explode(transform(filter(array(once), keep), body))

  /** TRUE integral division (Catalyst IntegralDivide == SQL `div`,
    * truncating toward zero like DuckDB `//`) — Column `/` on longs is
    * double division, whose exactness would silently depend on operand
    * magnitude staying below 2^53.
    */
  private def ldiv(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftExprBridge.expression(a.cast("long")),
        org.apache.spark.sql.GraftExprBridge.expression(b.cast("long"))))

  /** Unified image decode over mixed-container payloads: raw PNM (PGM
    * "P5"/PPM "P6") through the byte-exact [[graft.functions.PnmDecode]]
    * scan, everything else (PNG/JPEG/BMP/GIF) through the JDK-builtin
    * [[graft.functions.ImageIoDecode]]. One output shape —
    * struct(fmt string, width, height, gray) — so every downstream
    * operator (QA gates, 2-D luma grid, dHash) is container-agnostic.
    * Evaluation is lazy per row: the cheap PNM header scan runs first
    * and ImageIO is only consulted when it rejects. Undecodable
    * payloads are NULL (decode failure is data, the q243 contract).
    */
  def imageDecode(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.functions.MediaFunctions._
    val pnm = pnmDecode(bytes)
    when(pnm.isNotNull,
      struct(
        concat(lit("p"), pnm.getField("fmt").cast("string")).as("fmt"),
        pnm.getField("width").as("width"),
        pnm.getField("height").as("height"),
        pnm.getField("gray").as("gray")))
      .otherwise(imageIoDecode(bytes))
  }

  /** [[pnmPhashPairs]] generalized to mixed containers via
    * [[imageDecode]]: PNM and PNG/JPEG/BMP/GIF payloads hash into ONE
    * fingerprint space, so a re-encoded copy (PNM original, PNG
    * variant) still pairs. Same scale shape: scan-stage decode+hash,
    * keyed chunk join, no pair blowup.
    */
  def imagePhashPairs(
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      maxHamming: Int = 4): DataFrame = {
    import graft.functions.MediaFunctions._
    val base = df
      .select(col(idCol).as("media_id"),
        bindOnce(imageDecode(col(bytesCol).cast("binary")), _.isNotNull)(img =>
          dHash64(lumaGrid2d(img.getField("gray"), img.getField("width"),
            img.getField("height")))).as("dh"))
      .filter(col("dh").isNotNull)
    dhashNeardupPairs(base, maxHamming)
  }

  /** Shared pigeonhole Hamming machinery over a (media_id, dh) relation. */
  private def dhashNeardupPairs(base: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"phashPairs: maxHamming in [0, 15] required, got $maxHamming")
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    // lazy localCheckpoint: the fingerprint relation feeds BOTH sides
    // of the chunk self-join, and the decode+hash pipeline above it is
    // the expensive part (measured on q263: the un-pinned join
    // re-executed the whole ImageIO decode per side — 24 s vs ~10 s).
    // Pinning materializes only (media_id, dh): 16 bytes per item.
    val pinned = base.localCheckpoint(false)
    val chunked = pinned.withColumn("chunk", explode(array((0 until chunks).map { i =>
      struct(lit(i).as("idx"),
        shiftrightunsigned(col("dh"), i * bitsPer)
          .bitwiseAND(lit((1L << bitsPer) - 1)).as("v"))
    }: _*)))
    chunked.as("a").join(chunked.as("b"), col("a.chunk") === col("b.chunk"))
      .filter(col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        graft.ext.TextHash.hamming64(col("a.dh"), col("b.dh")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Per-clip audio QA stats over RIFF/WAVE PCM payloads, decoded for
    * REAL by the pure-JVM [[graft.functions.WavDecode]] expression —
    * the audio row of the quality-screen family: duration, peak,
    * energy (Σs², the exact integer form of RMS²·n), hard-clipping
    * count (samples pinned at the rail — the recording-chain defect
    * detector), and zero crossings (the coarse pitch/noisiness
    * proxy). Undecodable payloads drop out (decode failure is data).
    *
    * Everything after the decode is array HOFs over the samples —
    * scan-stage codegen, zero shuffle at any scale; energy peaks at
    * 2²² samples · 32768² ≈ 2⁵² — inside a long by construction of
    * the decoder's bomb guard.
    */
  def audioStats(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    import graft.functions.AudioFunctions._
    // identity bindOnce: decode + null-drop inside the generator (one
    // evaluation, pushdown-proof), the per-sample statistics downstream
    // over the generated struct's fields exactly as before — moving
    // them INTO the lambda body measured SLOWER (interpreted lambda
    // body vs the mixed codegen/HOF projection Spark builds here)
    df.select(col(idCol).as("media_id"),
        bindOnce(wavDecode(col(bytesCol).cast("binary")), _.isNotNull)(
          identity).as("__wav"))
      .select(col("media_id"),
        col("__wav.sample_rate").as("sample_rate"),
        col("__wav.channels").as("channels"),
        col("__wav.bits").as("bits"),
        col("__wav.n_samples").cast("long").as("n_samples"),
        col("__wav.samples").as("__s"))
      .withColumn("__hi", when(col("bits") === 16, 32767).otherwise(127))
      .withColumn("__lo", when(col("bits") === 16, -32768).otherwise(-128))
      .select(col("media_id"), col("sample_rate"), col("channels"), col("bits"),
        col("n_samples"),
        expr("n_samples * 1000L div sample_rate").as("duration_ms"),
        coalesce(array_max(transform(col("__s"),
          x => when(x < 0, -x).otherwise(x))).cast("long"), lit(0L)).as("peak"),
        aggregate(col("__s"), lit(0L),
          (acc, x) => acc + x.cast("long") * x.cast("long")).as("energy"),
        size(filter(col("__s"),
          x => x >= col("__hi") || x <= col("__lo"))).cast("long").as("clip_count"),
        when(col("n_samples") < 2L, lit(0L)).otherwise(
          size(filter(sequence(lit(1), col("n_samples").cast("int") - 1),
            i => (element_at(col("__s"), i) < 0) =!=
              (element_at(col("__s"), i + 1) < 0))).cast("long"))
          .as("zero_crossings"))
  }

  /** REAL integer PCM resampling — the standard audio-prep stage
    * (convert everything to one target rate before featurization),
    * previously a documented stub: linear interpolation on the exact
    * rational grid, pure integer arithmetic so any engine replays it
    * bit-for-bit. Output sample j sits at source position
    * j·src/dst: idx = (j·src) div dst, rem = (j·src) mod dst,
    * out[j] = s[idx] + (s[idx+1] − s[idx])·rem div dst (truncating
    * toward zero on both Spark `div` and DuckDB `//`);
    * n_out = (n_in − 1)·dst div src + 1, so the last output lands
    * exactly on the last input. Works for up- and down-sampling.
    * Everything is scan-stage HOF column algebra over the decoded
    * raster — no new expression, no shuffle, no allocation beyond the
    * output array.
    *
    * Output: (media_id, src_rate, n_in, n_out, sum_out, min_out,
    * max_out) — the exact integer summary of the resampled signal
    * (the array itself stays inside the plan; consumers chain more
    * column algebra on `__resampled` via [[resampleExpr]]).
    */
  def audioResample(
      df: DataFrame, idCol: String, bytesCol: String, dstRate: Int): DataFrame = {
    import graft.functions.AudioFunctions._
    require(dstRate >= 1, s"audioResample: dstRate >= 1, got $dstRate")
    // identity bindOnce, resample + aggregates downstream (see
    // audioStats for why the work stays OUT of the lambda body)
    df.select(col(idCol).as("media_id"),
        bindOnce(wavDecode(col(bytesCol).cast("binary")),
          w => w.isNotNull && w.getField("n_samples") >= 1)(
          identity).as("__wav"))
      .select(col("media_id"),
        col("__wav.sample_rate").as("src_rate"),
        col("__wav.n_samples").cast("long").as("n_in"),
        resampleExpr(col("__wav.samples"), col("__wav.sample_rate"), dstRate)
          .as("__r"))
      .select(col("media_id"), col("src_rate"), col("n_in"),
        size(col("__r")).cast("long").as("n_out"),
        aggregate(col("__r"), lit(0L), (a, x) => a + x.cast("long")).as("sum_out"),
        array_min(col("__r")).cast("long").as("min_out"),
        array_max(col("__r")).cast("long").as("max_out"))
  }

  /** The resampling grid as a reusable column: array<int> → array<int>
    * at `dstRate` given the source rate column. See [[audioResample]]
    * for the exact integer contract.
    */
  def resampleExpr(samples: Column, srcRate: Column, dstRate: Int): Column = {
    val s = samples
    val nIn = size(s)
    // j ranges over 0 .. (n_in-1)*dst div src
    val lastJ = ldiv((nIn - 1).cast("long") * dstRate, srcRate.cast("long"))
    transform(sequence(lit(0L), lastJ.cast("long")), { j =>
      val posNum = j * srcRate.cast("long")
      val idx = ldiv(posNum, lit(dstRate)).cast("int")
      val rem = posNum % dstRate
      val a = element_at(s, idx + 1)
      val b = element_at(s, least(idx + 2, nIn))
      (a + ldiv((b - a).cast("long") * rem, lit(dstRate)).cast("int")).cast("int")
    })
  }

  /** Audio near-duplicate pairs: decode (WavDecode) → 64-window
    * amplitude envelope ([[graft.functions.AmplitudeEnvelope]] — the
    * level structure that survives re-encoding) → dHash64 over the
    * envelope → the same pigeonhole Hamming machinery as the image
    * family. Scan-stage fingerprints, keyed chunk join, no pair
    * blowup.
    */
  def audioNeardupPairs(
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      maxHamming: Int = 4): DataFrame = {
    import graft.functions.AudioFunctions._
    import graft.functions.MediaFunctions.dHash64
    val base = df
      .select(col(idCol).as("media_id"),
        bindOnce(wavDecode(col(bytesCol).cast("binary")), _.isNotNull)(w =>
          dHash64(amplitudeEnvelope(w.getField("samples"), lit(64)))).as("dh"))
      .filter(col("dh").isNotNull)
    dhashNeardupPairs(base, maxHamming)
  }

  /** Per-clip fundamental-period estimate by autocorrelation peak
    * (the classic time-domain pitch detector — Rabiner '77 lineage):
    * decode (WavDecode), then over lags L ∈ [minLag, maxLag] compute
    * the integer autocorrelation r_L = Σ sᵢ·sᵢ₊L and report the
    * arg-max lag (ties to the SMALLEST lag — the fundamental beats
    * its harmonics because shorter lags keep more overlap terms),
    * the implied frequency f₀ = rate div period, and the peak value.
    * The audio QA feature behind voiced/unvoiced screens and
    * duplicate-speaker heuristics.
    *
    * All integer, all array HOFs after the scan-stage decode — the
    * O(n·L) work (n ≤ 2²² by the decoder's bomb guard, L bounded by
    * `maxLag` ≤ 2048) runs inside the scan task, no shuffle. Clips
    * shorter than maxLag+2 samples drop out (no meaningful lag
    * range), as do undecodables.
    */
  def audioPitch(
      df: DataFrame,
      idCol: String,
      bytesCol: String,
      minLag: Int,
      maxLag: Int): DataFrame = {
    require(minLag >= 1 && maxLag > minLag && maxLag <= 2048,
      s"audioPitch: need 1 <= minLag < maxLag <= 2048, got ($minLag, $maxLag)")
    import graft.functions.AudioFunctions._
    val lagCorr = transform(sequence(lit(minLag), lit(maxLag)), l =>
      struct(
        aggregate(sequence(lit(1), col("__a.__n") - l), lit(0L),
          (acc, i) => acc +
            element_at(col("__a.__s"), i).cast("long") *
            element_at(col("__a.__s"), i + l).cast("long")).as("r"),
        l.as("lag")))
    df.select(col(idCol).as("media_id"),
        bindOnce(wavDecode(col(bytesCol).cast("binary")),
          w => w.isNotNull && w.getField("n_samples") >= maxLag + 2)(w =>
          struct(
            w.getField("sample_rate").as("sample_rate"),
            w.getField("n_samples").as("__n"),
            w.getField("samples").as("__s"))).as("__a"))
      .withColumn("__best",
        aggregate(lagCorr, struct(lit(Long.MinValue).as("r"), lit(0).as("lag")),
          (best, x) => when(x.getField("r") > best.getField("r"), x).otherwise(best)))
      .select(col("media_id"),
        col("__best.lag").as("period"),
        expr("CAST(__a.sample_rate AS BIGINT) div __best.lag").as("f0_hz"),
        col("__best.r").as("peak_corr"))
  }

  /** Canonical RIFF/WAVE header for a PCM clip — plan-time constant
    * builder for tests and in-plan payload synthesis (the raster is
    * appended via PackBytes).
    */
  /** Per-sampled-frame luma statistics over uncompressed AVI payloads,
    * decoded for REAL by [[graft.functions.AviFrames]] (RIFF walk,
    * BITMAPINFOHEADER validation, bottom-up DIB rows) — the video row
    * of the decode family: every k-th frame's integer gray raster
    * yields (mean, min, max) luma, the shot/exposure screen a video
    * curation pass runs before anything expensive. Frame sampling
    * happens INSIDE the decode expression (un-sampled frames are never
    * materialized), and everything is scan-stage codegen: no shuffle
    * exists in this operator at any corpus size.
    */
  /** Container-agnostic frame decode: AVI (DIB or MJPG) through
    * [[graft.functions.AviFrames]], Motion-JPEG MP4/MOV through
    * [[graft.functions.Mp4Frames]] — each returns NULL instantly on the
    * other's magic bytes (RIFF vs ftyp), so the coalesce costs one
    * header check, and downstream machinery never knows the container.
    */
  def videoFrames(bytes: org.apache.spark.sql.Column,
      every: Int): org.apache.spark.sql.Column = {
    import graft.functions.MediaFunctions.aviFrames
    import graft.functions.Mp4Functions.mp4Frames
    coalesce(aviFrames(bytes, lit(every)), mp4Frames(bytes, lit(every)))
  }

  def videoFrameStats(
      df: DataFrame, idCol: String, bytesCol: String, every: Int = 2): DataFrame = {
    require(every >= 1, s"videoFrameStats: every >= 1, got $every")
    // one generated row per sampled frame, the container metadata
    // packed alongside — flatten(transform(transform)) keeps the
    // decode inside ONE bindOnce binding (null payloads flatten to
    // null -> explode drops the row)
    df.select(col(idCol).cast("long").as("media_id"),
        explode(flatten(transform(
          filter(array(videoFrames(col(bytesCol).cast("binary"), every)),
            v => v.isNotNull),
          v => transform(v.getField("frames"), f => struct(
            f.getField("idx").as("frame_idx"),
            v.getField("width").as("width"),
            v.getField("height").as("height"),
            v.getField("n_frames").as("n_frames"),
            f.getField("gray").as("gray")))))).as("__f"))
      .select(col("media_id"), col("__f.frame_idx").as("frame_idx"),
        col("__f.width").as("width"), col("__f.height").as("height"),
        col("__f.n_frames").as("n_frames"),
        expr("aggregate(__f.gray, 0L, (a, x) -> a + x) div size(__f.gray)")
          .as("mean_luma"),
        array_min(col("__f.gray")).cast("long").as("min_luma"),
        array_max(col("__f.gray")).cast("long").as("max_luma"))
  }

  /** Key-frame perceptual near-dup over uncompressed AVI payloads —
    * the video row of the near-dup family (image q243/q263, audio
    * q254): the FIRST sampled frame is the key frame (the classic
    * key-frame-fingerprinting shortcut — temporal alignment is a
    * separate problem; the key frame catches re-encodes, resizes and
    * re-containers of the same footage), its 8×8 luma grid dHash goes
    * through the shared pigeonhole Hamming machinery. Decode + hash
    * are scan-stage; pairs carry 16-byte fingerprints only.
    */
  def videoKeyframeNeardupPairs(
      df: DataFrame, idCol: String, bytesCol: String,
      every: Int = 2, maxHamming: Int = 4): DataFrame = {
    import graft.functions.MediaFunctions._
    require(every >= 1, s"videoKeyframeNeardupPairs: every >= 1, got $every")
    val base = df
      .select(col(idCol).as("media_id"),
        bindOnce(videoFrames(col(bytesCol).cast("binary"), every),
          v => v.isNotNull && size(v.getField("frames")) > 0)(v =>
          dHash64(lumaGrid2d(
            element_at(v.getField("frames"), 1).getField("gray"),
            v.getField("width"), v.getField("height")))).as("dh"))
      .filter(col("dh").isNotNull)
    dhashNeardupPairs(base, maxHamming)
  }

  /** Container-level video triage (no decode): per-video codec,
    * geometry, frame/keyframe census, size stats, and a 60-bit
    * container fingerprint — the operational QA surface for compressed
    * codecs the JVM cannot decompress offline (H.264-class). The
    * fingerprint hashes the codec + geometry + exact frame-size
    * sequence (md5-60bit, the engine-wide [[graft.ext.TextHash]]
    * scheme), which identifies byte-identical re-uploads and
    * re-containered copies of the same encoded stream without touching
    * a single pixel; a re-ENCODE changes the size sequence and is
    * near-dup territory (the decode path's job, where a codec exists).
    * Everything is scan-stage: probe + fingerprint per row, zero
    * shuffle.
    *
    * Container-independent: both probes emit the same struct, each
    * NULLs on the other's magic (RIFF vs ftyp), so one coalesce triages
    * an AVI + MP4/MOV mixed corpus in a single pass — and because the
    * fingerprint hashes codec + geometry + frame-size sequence (not
    * container framing), a re-CONTAINERED copy of the same encoded
    * stream (AVI→MP4 remux) lands in the same dup group.
    */
  def videoContainerStats(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    import graft.functions.MediaFunctions._
    import graft.functions.Mp4Functions.mp4Probe
    df.select(col(idCol).cast("long").as("media_id"),
        bindOnce(coalesce(aviProbe(col(bytesCol).cast("binary")),
          mp4Probe(col(bytesCol).cast("binary"))), _.isNotNull)(c =>
          struct(
            c.getField("codec").as("codec"),
            c.getField("width").as("width"),
            c.getField("height").as("height"),
            c.getField("n_frames").as("n_frames"),
            c.getField("n_keyframes").as("n_keyframes"),
            aggregate(c.getField("frame_sizes"), lit(0L),
              (a, x) => a + x.cast("long")).as("total_frame_bytes"),
            array_max(c.getField("frame_sizes")).as("max_frame_bytes"),
            graft.ext.TextHash.hash64(
              concat_ws(":", c.getField("codec"),
                c.getField("width").cast("string"),
                c.getField("height").cast("string"),
                array_join(c.getField("frame_sizes").cast("array<string>"), ",")))
              .as("container_fp"))).as("__c"))
      .select(col("media_id"), col("__c.*"))
  }

  def wavHeader(nSamples: Int, sampleRate: Int, channels: Int, bits: Int): Array[Byte] = {
    val blockAlign = channels * (bits / 8)
    val dataSize = nSamples * blockAlign
    val riffSize = 36 + dataSize
    val b = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * blockAlign)
      .putShort(blockAlign.toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    b.array()
  }

  /** Wrap a DataFrame with (id, binary payload) columns into the typed
    * media shape with metadata defaults — the ingestion boundary.
    */
  def asMedia(df: DataFrame, idCol: String, bytesCol: String, kind: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      struct(
        lit(kind).as("kind"),
        lit(0).as("width"), lit(0).as("height"),
        lit(0).as("sampleRateHz"), lit(0L).as("durationMs"),
        lit("stub").as("codec")).as("meta"),
      col(bytesCol).cast("binary").as("bytes"))
      .as[MediaRecord]
  }
}
