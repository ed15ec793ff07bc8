package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Media
import Q._

/** Multimodal plumbing as an oracle-checked query: documents' text bytes
  * stand in for media payloads (same opaque-binary path), run through the
  * typed Dataset + mapPartitions feature extraction. The DuckDB oracle
  * replicates the deterministic stub-codec math — verifying the
  * distributed pipeline byte-for-byte.
  */
object Multimodal {

  private def hSql(v: String): String = OracleSql.hash64(v)

  /** doc_id spine for the synthesized-media fixtures, spread across the
    * cluster BEFORE the heavy per-row synthesize→encode→decode work:
    * the documents scan is one small file = ONE scan partition, which
    * would run every media pipeline single-threaded (measured on q263:
    * the whole decode stage sat in 2 tasks on 32 cores). The shuffled
    * rows are 8-byte ids; at real scale the scan is already wide and
    * the round-robin is noise.
    */
  private def docIds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents").select($"doc_id")
      .repartition(s.sparkContext.defaultParallelism)
  }

  /** q263/q270 fixture: the md5-per-pixel 16×16 image per doc,
    * synthesized ONCE and pinned (it feeds both the base and the
    * bumped-variant branch — un-shared, the generator dominated the
    * query: ~6 s of md5 at sf0.1, paid twice).
    */
  private def pngBasePx(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docIds(s, dir).select($"doc_id",
      transform(sequence(lit(0), lit(255)), { i =>
        val h = graft.ext.TextHash.hash64(
          concat($"doc_id".cast("string"), lit(":"), i.cast("string")))
        def ch(sh: Int): Column =
          shiftrightunsigned(h, sh).bitwiseAND(lit(255L)).cast("int")
        (shiftleft(ch(0), 16) + shiftleft(ch(8), 8) + ch(16)).cast("int")
      }).as("px"))
      .localCheckpoint(false)
  }

  /** q253/q272 fixture: one 8 kHz / 16-bit / 256-sample WAV per doc,
    * md5-derived samples wrapped in REAL RIFF bytes (the oracle's sm
    * CTE re-derives the samples from the same formula).
    */
  private def mdWavMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.MediaFunctions.packBytes
    val docs = docIds(s, dir)
    val header = lit(graft.multimodal.Media.wavHeader(
      nSamples = 256, sampleRate = 8000, channels = 1, bits = 16))
    val samples = transform(sequence(lit(0), lit(255)), { i =>
      val raw = (graft.ext.TextHash.hash64(
        concat($"doc_id".cast("string"), lit(":"), i.cast("string")))
        % 80001 - 40000).cast("int")
      greatest(lit(-32768), least(lit(32767), raw))
    })
    val payload = concat(header, packBytes(
      flatten(transform(samples, x => array(x, shiftright(x, 8))))))
    docs.select($"doc_id".as("media_id"), payload.as("payload"))
  }

  /** The planted near-dup perturbation: +40-capped on every channel of
    * the top-left corner pixels — exactly the oracle's variant CASE.
    */
  private def bumpPx(p: Column, i: Column): Column =
    when(i < 32 && i % 16 < 4,
      shiftleft(least(lit(255),
        shiftrightunsigned(p, 16).bitwiseAND(lit(255)) + 40), 16) +
      shiftleft(least(lit(255),
        shiftrightunsigned(p, 8).bitwiseAND(lit(255)) + 40), 8) +
      least(lit(255), p.bitwiseAND(lit(255)) + 40))
    .otherwise(p).cast("int")

  /** Shared dHash-pairs oracle over the md5 pixel fixture - q263
    * consumes it through the PNG encode/ImageIO decode path, q270
    * through AVI encode + RIFF-walk key-frame extraction; one
    * definition, two decode paths checked against it.
    */
  private val PhashPairsOracle: String = s"""
        WITH basepx AS MATERIALIZED (
          SELECT doc_id, i,
                 h % 256 AS r, (h // 256) % 256 AS g, (h // 65536) % 256 AS b
          FROM (SELECT doc_id, i,
                       ${hSql("CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")} AS h
                FROM documents CROSS JOIN (SELECT unnest(range(0, 256)) AS i))),
        px AS (
          SELECT doc_id*2 AS media_id, i,
                 (2126*r + 7152*g + 722*b) // 10000 AS p
          FROM basepx
          UNION ALL
          SELECT doc_id*2+1, i,
                 CASE WHEN i < 32 AND i % 16 < 4
                   THEN (2126*LEAST(255, r+40) + 7152*LEAST(255, g+40)
                         + 722*LEAST(255, b+40)) // 10000
                   ELSE (2126*r + 7152*g + 722*b) // 10000 END
          FROM basepx),
        cells AS (
          SELECT media_id,
                 (((i // 16) * 8) // 16) * 8 + (((i % 16) * 8) // 16) AS c,
                 SUM(p) // COUNT(*) AS lum
          FROM px GROUP BY 1, 2),
        g8 AS (SELECT media_id, list(lum ORDER BY c) AS g FROM cells GROUP BY media_id),
        hash AS (
          SELECT media_id,
            CAST(SUM(CASE WHEN g[CAST((i//8)*8 + ((i%8)+1)%8 + 1 AS INT)] > g[CAST(i+1 AS INT)]
              THEN CASE WHEN i = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                   ELSE (CAST(1 AS BIGINT) << CAST(i AS INTEGER)) END
              ELSE 0 END) AS BIGINT) AS dh
          FROM g8 CROSS JOIN (SELECT unnest(range(0, 64)) AS i) GROUP BY 1),
        chunked AS (
          SELECT media_id, dh, c, (dh >> CAST(c*12 AS INTEGER)) & 4095 AS v
          FROM hash CROSS JOIN (SELECT unnest(range(0, 5)) AS c)),
        cand AS (
          SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b, a.dh AS ha, b.dh AS hb
          FROM chunked a JOIN chunked b
            ON a.c = b.c AND a.v = b.v AND a.media_id < b.media_id)
        SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(ha, hb)) <= 4
        ORDER BY id_a, id_b
      """

  val all: Seq[Q] = Seq(
    Q(
      "q45_multimodal_features",
      (s, dir) => {
        import s.implicits._
        val media = Media.asMedia(
          Tables.load(s, dir, "documents").select($"doc_id", $"text"),
          "doc_id", "text", kind = "image")
        Media.extractFeatures(media, dim = 8).toDF()
          .select(
            $"media_id", $"kind", $"dim",
            element_at($"features", 1).cast("double").as("f0"),
            element_at($"features", 8).cast("double").as("f7"),
            graft.functions.VectorFunctions.arraySum($"features").as("checksum"))
          .orderBy($"media_id")
      },
      Some(s"""
        WITH f AS (
          SELECT doc_id AS media_id, 'image' AS kind, 8 AS dim,
                 list_transform(range(0, 8),
                   i -> CAST((${hSql("md5(text) || ':' || CAST(i AS VARCHAR)")} % 1000) / CAST(1000.0 AS DOUBLE) AS FLOAT)) AS features
          FROM documents)
        SELECT media_id, kind, dim,
               CAST(features[1] AS DOUBLE) AS f0,
               CAST(features[8] AS DOUBLE) AS f7,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(features, x -> CAST(x AS DOUBLE))), (a, x) -> a + x) AS checksum
        FROM f
        ORDER BY media_id
      """)),
    // ----------------------------------------------------------------
    // Perceptual-hash binary near-dup: payloads are document bytes plus
    // a PLANTED near-identical variant per document (a small local byte
    // edit — the first 8 bytes uppercased — the image analogue of a
    // re-encoded corner region). dHash over the 8×8 box-filter luma
    // grid, pigeonhole Hamming bucketing (5 disjoint 12-bit chunks for
    // maxHamming 4), popcount verify. At sf0.01 every planted pair
    // lands at Hamming 0-3 while the closest unrelated pair sits at 15
    // (measured) — the operator separates local byte edits from
    // different content. All integer math; the oracle replays each
    // grid cell, hash bit, and bucket exactly.
    Q(
      "q231_phash_neardup",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val media = docs
          .select(($"doc_id" * 2).as("media_id"), $"text".cast("binary").as("payload"))
          .unionAll(docs.select(($"doc_id" * 2 + 1).as("media_id"),
            concat(upper(substring($"text", 1, 8)), expr("substring(text, 9)"))
              .cast("binary").as("payload")))
        Media.phashPairs(media, "media_id", "payload", maxHamming = 4)
          .orderBy($"id_a", $"id_b")
      },
      Some("""
        WITH media AS (
          -- LOUD encoding guard: this oracle walks CHARACTERS
          -- (length/unicode) while Spark hashes UTF-8 BYTES — identical
          -- only for pure-ASCII text. A multi-byte character must fail
          -- fast here, not silently shift every grid cell.
          SELECT doc_id*2 AS media_id,
                 CASE WHEN octet_length(encode(text)) = length(text) THEN text
                      ELSE error('q231 oracle: non-ASCII text in doc_id '
                                 || CAST(doc_id AS VARCHAR)) END AS payload
          FROM documents
          UNION ALL
          SELECT doc_id*2+1, upper(payload[1:8]) || payload[9:]
          FROM (SELECT doc_id,
                  CASE WHEN octet_length(encode(text)) = length(text) THEN text
                       ELSE error('q231 oracle: non-ASCII text in doc_id '
                                  || CAST(doc_id AS VARCHAR)) END AS payload
                FROM documents)),
        pb AS (
          SELECT media_id, (i*64)//length(payload) AS c,
                 unicode(payload[CAST(i+1 AS INT):CAST(i+1 AS INT)]) AS b
          FROM (SELECT media_id, payload,
                       unnest(range(0, length(payload))) AS i FROM media)),
        nonempty AS (SELECT media_id, c, SUM(b)//COUNT(*) AS lum FROM pb GROUP BY 1, 2),
        grid AS (SELECT media_id, unnest(range(0, 64)) AS c FROM media),
        cells AS (
          SELECT g.media_id, g.c, COALESCE(n.lum, 0) AS lum
          FROM grid g LEFT JOIN nonempty n ON g.media_id = n.media_id AND g.c = n.c),
        g8 AS (SELECT media_id, list(lum ORDER BY c) AS g FROM cells GROUP BY media_id),
        hash AS (
          SELECT media_id,
            CAST(SUM(CASE WHEN g[CAST((i//8)*8 + ((i%8)+1)%8 + 1 AS INT)] > g[CAST(i+1 AS INT)]
              THEN CASE WHEN i = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                   ELSE (CAST(1 AS BIGINT) << CAST(i AS INTEGER)) END
              ELSE 0 END) AS BIGINT) AS dh
          FROM g8 CROSS JOIN (SELECT unnest(range(0, 64)) AS i) GROUP BY 1),
        chunked AS (
          SELECT media_id, dh, c, (dh >> CAST(c*12 AS INTEGER)) & 4095 AS v
          FROM hash CROSS JOIN (SELECT unnest(range(0, 5)) AS c)),
        cand AS (
          SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b, a.dh AS ha, b.dh AS hb
          FROM chunked a JOIN chunked b
            ON a.c = b.c AND a.v = b.v AND a.media_id < b.media_id)
        SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(ha, hb)) <= 4
        ORDER BY id_a, id_b
      """)),
    // ----------------------------------------------------------------
    // REAL-pixel perceptual near-dup: each document becomes a 16×16
    // 8-bit PGM image (pixels = md5-hash-derived bytes, so grids are
    // independent across docs) serialized as actual "P5" bytes
    // (header + raster via PackBytes), plus a planted variant with a
    // +40 brightness patch on the top-left 2×4-pixel region — the
    // image analogue of a re-encoded corner. The pipeline then runs
    // the PURE-JVM PNM decoder (PnmDecode: header token scan, raster
    // read) on those bytes, 2-D box-filters the decoded pixels onto
    // the 8×8 grid (LumaGrid2D), dHashes, and pigeonhole-buckets —
    // so a decoder mis-parse of any byte breaks the oracle match. The
    // patch moves only grid cells (0,0)/(0,1), keeping planted pairs
    // within Hamming 4 while unrelated docs sit near 32. The oracle
    // replays the pixel formula, every 2-D cell mean, hash bit, and
    // bucket in exact integer math.
    Q(
      "q243_pnm_phash_neardup",
      (s, dir) => {
        import s.implicits._
        import graft.functions.MediaFunctions.packBytes
        val docs = docIds(s, dir)
        def px(variant: Boolean) =
          transform(sequence(lit(0), lit(255)), { i =>
            val p = (graft.ext.TextHash.hash64(
              concat($"doc_id".cast("string"), lit(":"), i.cast("string")))
              % 256).cast("int")
            if (variant)
              when(i < 32 && i % 16 < 4, least(lit(255), p + 40)).otherwise(p)
            else p
          })
        val header = lit("P5\n16 16\n255\n").cast("binary")
        val media = docs
          .select(($"doc_id" * 2).as("media_id"),
            concat(header, packBytes(px(variant = false))).as("payload"))
          .unionAll(docs.select(($"doc_id" * 2 + 1).as("media_id"),
            concat(header, packBytes(px(variant = true))).as("payload")))
        Media.pnmPhashPairs(media, "media_id", "payload", maxHamming = 4)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""
        WITH basepx AS (
          SELECT doc_id, i,
                 ${hSql("CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")} % 256 AS p
          FROM documents CROSS JOIN (SELECT unnest(range(0, 256)) AS i)),
        px AS (
          SELECT doc_id*2 AS media_id, i, p FROM basepx
          UNION ALL
          SELECT doc_id*2+1, i,
                 CASE WHEN i < 32 AND i % 16 < 4 THEN LEAST(255, p + 40) ELSE p END
          FROM basepx),
        cells AS (
          SELECT media_id,
                 (((i // 16) * 8) // 16) * 8 + (((i % 16) * 8) // 16) AS c,
                 SUM(p) // COUNT(*) AS lum
          FROM px GROUP BY 1, 2),
        g8 AS (SELECT media_id, list(lum ORDER BY c) AS g FROM cells GROUP BY media_id),
        hash AS (
          SELECT media_id,
            CAST(SUM(CASE WHEN g[CAST((i//8)*8 + ((i%8)+1)%8 + 1 AS INT)] > g[CAST(i+1 AS INT)]
              THEN CASE WHEN i = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                   ELSE (CAST(1 AS BIGINT) << CAST(i AS INTEGER)) END
              ELSE 0 END) AS BIGINT) AS dh
          FROM g8 CROSS JOIN (SELECT unnest(range(0, 64)) AS i) GROUP BY 1),
        chunked AS (
          SELECT media_id, dh, c, (dh >> CAST(c*12 AS INTEGER)) & 4095 AS v
          FROM hash CROSS JOIN (SELECT unnest(range(0, 5)) AS c)),
        cand AS (
          SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b, a.dh AS ha, b.dh AS hb
          FROM chunked a JOIN chunked b
            ON a.c = b.c AND a.v = b.v AND a.media_id < b.media_id)
        SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(ha, hb)) <= 4
        ORDER BY id_a, id_b
      """)),
    // ----------------------------------------------------------------
    // REAL audio decode + QA stats: each document becomes a canonical
    // RIFF/WAVE clip (16-bit PCM mono 8 kHz, 256 samples of clamped
    // hash noise — ~9% of samples pin at each rail by construction)
    // serialized as actual container bytes (44-byte header + LE
    // raster via PackBytes), then decoded back by the pure-JVM
    // WavDecode expression (RIFF walk, fmt parse, channel-0 raster)
    // and screened: duration, peak, energy (Σs²), hard-clip count,
    // zero crossings — all array HOFs after the decode, zero shuffle.
    // The oracle replays the sample formula and every stat exactly, so
    // a decoder mis-parse of any byte or field breaks the match.
    Q(
      "q253_wav_stats",
      (s, dir) => {
        import s.implicits._
        graft.multimodal.Media.audioStats(mdWavMedia(s, dir), "media_id", "payload")
          .orderBy($"media_id")
      },
      Some(s"""
        WITH sm AS MATERIALIZED (
          SELECT doc_id AS media_id, i,
                 GREATEST(-32768, LEAST(32767,
                   ${hSql("CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")}
                     % 80001 - 40000)) AS s
          FROM documents CROSS JOIN (SELECT unnest(range(0, 256)) AS i)),
        lst AS (SELECT media_id, list(s ORDER BY i) AS ss FROM sm GROUP BY 1)
        SELECT media_id,
               8000 AS sample_rate, 1 AS channels, 16 AS bits,
               CAST(256 AS BIGINT) AS n_samples,
               CAST(32 AS BIGINT) AS duration_ms,
               CAST(list_max(list_transform(ss, x -> abs(x))) AS BIGINT) AS peak,
               CAST(list_sum(list_transform(ss, x -> CAST(x AS BIGINT) * x))
                 AS BIGINT) AS energy,
               CAST(len(list_filter(ss, x -> x >= 32767 OR x <= -32768))
                 AS BIGINT) AS clip_count,
               CAST(len(list_filter(range(1, 256),
                 i -> (ss[CAST(i AS INT)] < 0) <> (ss[CAST(i + 1 AS INT)] < 0)))
                 AS BIGINT) AS zero_crossings
        FROM lst ORDER BY media_id
      """)),
    // ----------------------------------------------------------------
    // Audio near-dup over REAL decoded samples: base clips as in q253
    // plus a planted variant with the first 8 samples offset +6000
    // (clamped) — a level bump on the first two envelope windows, the
    // audio analogue of q243's corner patch. Envelope cells 0-1 are
    // the only ones that can move, so only dHash bits {0, 1, 7} can
    // flip: every planted pair sits within Hamming 3 while unrelated
    // clips (independent hash noise) live near 32. The pipeline runs
    // WavDecode → 64-window amplitude envelope → dHash → pigeonhole
    // buckets; the oracle replays the formula, each envelope mean,
    // hash bit, and bucket in exact integer math.
    Q(
      "q254_audio_neardup",
      (s, dir) => {
        import s.implicits._
        import graft.functions.MediaFunctions.packBytes
        val docs = docIds(s, dir)
        val header = lit(graft.multimodal.Media.wavHeader(
          nSamples = 256, sampleRate = 8000, channels = 1, bits = 16))
        def samples(variant: Boolean) =
          transform(sequence(lit(0), lit(255)), { i =>
            val raw = (graft.ext.TextHash.hash64(
              concat($"doc_id".cast("string"), lit(":"), i.cast("string")))
              % 80001 - 40000).cast("int")
            val adj = if (variant) when(i < 8, raw + 6000).otherwise(raw) else raw
            greatest(lit(-32768), least(lit(32767), adj))
          })
        def payload(variant: Boolean) = concat(header, packBytes(
          flatten(transform(samples(variant), x => array(x, shiftright(x, 8))))))
        val media = docs
          .select(($"doc_id" * 2).as("media_id"), payload(variant = false).as("payload"))
          .unionAll(docs.select(($"doc_id" * 2 + 1).as("media_id"),
            payload(variant = true).as("payload")))
        graft.multimodal.Media.audioNeardupPairs(media, "media_id", "payload",
            maxHamming = 4)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""
        WITH basepx AS MATERIALIZED (
          SELECT doc_id, i,
                 ${hSql("CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")}
                   % 80001 - 40000 AS raw
          FROM documents CROSS JOIN (SELECT unnest(range(0, 256)) AS i)),
        px AS MATERIALIZED (
          SELECT doc_id*2 AS media_id, i,
                 GREATEST(-32768, LEAST(32767, raw)) AS s
          FROM basepx
          UNION ALL
          SELECT doc_id*2+1, i,
                 CASE WHEN i < 8
                   THEN GREATEST(-32768, LEAST(32767, raw + 6000))
                   ELSE GREATEST(-32768, LEAST(32767, raw)) END
          FROM basepx),
        env AS (
          SELECT media_id, (i * 64) // 256 AS c, SUM(abs(s)) // COUNT(*) AS lum
          FROM px GROUP BY 1, 2),
        g8 AS (SELECT media_id, list(lum ORDER BY c) AS g FROM env GROUP BY media_id),
        hash AS (
          SELECT media_id,
            CAST(SUM(CASE WHEN g[CAST((i//8)*8 + ((i%8)+1)%8 + 1 AS INT)] > g[CAST(i+1 AS INT)]
              THEN CASE WHEN i = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                   ELSE (CAST(1 AS BIGINT) << CAST(i AS INTEGER)) END
              ELSE 0 END) AS BIGINT) AS dh
          FROM g8 CROSS JOIN (SELECT unnest(range(0, 64)) AS i) GROUP BY 1),
        chunked AS (
          SELECT media_id, dh, c, (dh >> CAST(c*12 AS INTEGER)) & 4095 AS v
          FROM hash CROSS JOIN (SELECT unnest(range(0, 5)) AS c)),
        cand AS (
          SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b, a.dh AS ha, b.dh AS hb
          FROM chunked a JOIN chunked b
            ON a.c = b.c AND a.v = b.v AND a.media_id < b.media_id)
        SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(ha, hb)) <= 4
        ORDER BY id_a, id_b
      """)),
    // ----------------------------------------------------------------
    // Autocorrelation pitch over REAL decoded audio: each doc becomes
    // a sawtooth clip whose true period is 20 + (doc_id % 16) samples;
    // the pipeline decodes the WAV bytes (WavDecode) and picks the
    // arg-max integer autocorrelation lag in [16, 64] — which must
    // recover exactly that period. The oracle replays the sample
    // formula, every lag product, and the (r DESC, lag) arg-max.
    Q(
      "q262_audio_pitch",
      (s, dir) => {
        import s.implicits._
        import graft.functions.MediaFunctions.packBytes
        val docs = Tables.load(s, dir, "documents")
          .select($"doc_id").filter($"doc_id".isNotNull)
        val header = lit(graft.multimodal.Media.wavHeader(
          nSamples = 256, sampleRate = 8000, channels = 1, bits = 16))
        val samples = transform(sequence(lit(0), lit(255)), { i =>
          ((i % (lit(20) + ($"doc_id" % 16).cast("int"))) * 1200 - 9000).cast("int")
        })
        val payload = concat(header, packBytes(
          flatten(transform(samples, x => array(x, shiftright(x, 8))))))
        val media = docs.select($"doc_id".as("media_id"), payload.as("payload"))
        graft.multimodal.Media.audioPitch(media, "media_id", "payload",
            minLag = 16, maxLag = 64)
          .orderBy($"media_id")
      },
      Some("""
        WITH sm AS MATERIALIZED (
          SELECT doc_id AS media_id, i,
                 (i % (20 + doc_id % 16)) * 1200 - 9000 AS s
          FROM documents CROSS JOIN (SELECT unnest(range(0, 256)) AS i)
          WHERE doc_id IS NOT NULL),
        lst AS MATERIALIZED (
          SELECT media_id, list(s ORDER BY i) AS ss FROM sm GROUP BY 1),
        rr AS (SELECT media_id, lag,
                 list_sum(list_transform(range(1, 256 - lag + 1),
                   i -> CAST(ss[CAST(i AS INT)] AS BIGINT) *
                        ss[CAST(i + lag AS INT)])) AS r
               FROM lst CROSS JOIN (SELECT unnest(range(16, 65)) AS lag)),
        bst AS (SELECT media_id, lag, r,
                  ROW_NUMBER() OVER (PARTITION BY media_id
                    ORDER BY r DESC, lag) AS rn
                FROM rr)
        SELECT media_id, CAST(lag AS INT) AS period,
               CAST(8000 // lag AS BIGINT) AS f0_hz,
               CAST(r AS BIGINT) AS peak_corr
        FROM bst WHERE rn = 1 ORDER BY media_id
      """)),
    // ----------------------------------------------------------------
    // COMPRESSED-container near-dup over REAL codec round-trips: each
    // doc becomes a 16×16 RGB image (channels carved from one 60-bit
    // hash per pixel), ENCODED to actual PNG bytes by the JDK encoder
    // (PngEncode) and DECODED back by the JDK readers (ImageIoDecode,
    // Rec. 709 integer luma) — PNG is lossless, so the decoded gray
    // must equal the formula's gray exactly, and the oracle never
    // touches a codec: it replays pixel → luma → 2-D grid → dHash →
    // pigeonhole buckets in pure integer SQL. The planted variant adds
    // +40 (clamped) per channel on the top-left 2×4-pixel region (the
    // q243 corner patch), keeping planted pairs within Hamming 4. A
    // single mis-decoded byte anywhere in the zlib/filter/raster walk
    // breaks the hash match — this is the retirement proof for the
    // compressed-image stub.
    Q(
      "q263_png_phash_neardup",
      (s, dir) => {
        import s.implicits._
        import graft.functions.MediaFunctions.pngEncode
        val basePx = pngBasePx(s, dir)
        val media = basePx
          .select(($"doc_id" * 2).as("media_id"),
            pngEncode($"px", lit(16), lit(16)).as("payload"))
          .unionAll(basePx.select(($"doc_id" * 2 + 1).as("media_id"),
            pngEncode(transform($"px", (p, i) => bumpPx(p, i)), lit(16), lit(16))
              .as("payload")))
        Media.imagePhashPairs(media, "media_id", "payload", maxHamming = 4)
          .orderBy($"id_a", $"id_b")
      },
      Some(PhashPairsOracle)),
    // ----------------------------------------------------------------
    // REAL video-container decode: each doc synthesizes a 6-frame
    // 16×16 uncompressed AVI (cheap integer pixel formula — no md5 in
    // this fixture) whose bytes go through AviEncode → the AviFrames
    // RIFF walk samples every 2nd frame → per-frame integer luma
    // stats. The oracle re-derives the sampled frames from the SAME
    // formula and replays the Rec. 709 + mean/min/max math exactly —
    // any mis-parse of the container (stride, bottom-up rows, chunk
    // alignment, header fields) breaks the hash match.
    Q(
      "q269_avi_frame_stats",
      (s, dir) => {
        import s.implicits._
        import graft.functions.MediaFunctions.aviEncode
        val docs = docIds(s, dir)
        val frames = transform(sequence(lit(0), lit(5)), f =>
          transform(sequence(lit(0), lit(255)), { i =>
            def ch(a: Int, b: Int, c: Int): Column =
              (($"doc_id" * a + f * b + i * c) % 256).cast("int")
            (shiftleft(ch(3, 7, 11), 16) + shiftleft(ch(5, 11, 3), 8) +
              ch(7, 3, 5)).cast("int")
          }))
        val media = docs.select($"doc_id".as("media_id"),
          aviEncode(frames, lit(16), lit(16)).as("payload"))
        Media.videoFrameStats(media, "media_id", "payload", every = 2)
          .orderBy($"media_id", $"frame_idx")
      },
      Some("""
        WITH fx AS (
          SELECT doc_id, f, i,
                 (doc_id*3 + f*7 + i*11) % 256 AS r,
                 (doc_id*5 + f*11 + i*3) % 256 AS g,
                 (doc_id*7 + f*3 + i*5) % 256 AS bb
          FROM documents
          CROSS JOIN (SELECT unnest(range(0, 6)) AS f)
          CROSS JOIN (SELECT unnest(range(0, 256)) AS i)
          WHERE f % 2 = 0),
        lum AS (
          SELECT doc_id, f, (2126*r + 7152*g + 722*bb) // 10000 AS p
          FROM fx)
        SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
               CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
               CAST(6 AS INTEGER) AS n_frames,
               CAST(CAST(SUM(p) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_luma,
               CAST(MIN(p) AS BIGINT) AS min_luma,
               CAST(MAX(p) AS BIGINT) AS max_luma
        FROM lum GROUP BY doc_id, f
        ORDER BY media_id, frame_idx
      """)),
    // ----------------------------------------------------------------
    // Video key-frame near-dup, completing the family (image q243/q263,
    // audio q254): each doc becomes a 3-frame AVI whose key frame is
    // the SAME md5 image as q263 (base / bumped variant) with cheap
    // filler tails; every=2 samples frames {0, 2}; the first sampled
    // frame's grid dHash goes through the pigeonhole machinery. The
    // oracle is q263's VERBATIM (one shared definition) — the exact
    // same expected pairs must emerge from a completely different
    // container path (AviEncode bytes → RIFF walk → DIB rasters → key
    // frame), so any stride/row-order/chunk mis-parse breaks the match.
    Q(
      "q270_video_keyframe_neardup",
      (s, dir) => {
        import s.implicits._
        import graft.functions.MediaFunctions.aviEncode
        val basePx = pngBasePx(s, dir)
        def filler(k: Int): Column =
          transform(sequence(lit(0), lit(255)),
            i => (((i * 7 + k * 31) % 256) * lit(0x010101)).cast("int"))
        def clip(key: Column): Column =
          aviEncode(array(key, filler(1), filler(2)), lit(16), lit(16))
        val media = basePx
          .select(($"doc_id" * 2).as("media_id"), clip($"px").as("payload"))
          .unionAll(basePx.select(($"doc_id" * 2 + 1).as("media_id"),
            clip(transform($"px", (p, i) => bumpPx(p, i))).as("payload")))
        Media.videoKeyframeNeardupPairs(media, "media_id", "payload",
            every = 2, maxHamming = 4)
          .orderBy($"id_a", $"id_b")
      },
      Some(PhashPairsOracle)),
    // ----------------------------------------------------------------
    // REAL integer PCM resampling: the q253 WAV corpus is resampled
    // 8000 → 6000 Hz by linear interpolation on the exact rational
    // grid (idx/rem integer split, toward-zero lerp), previously a
    // documented stub. The oracle re-derives the source samples from
    // the shared md5 formula and replays every output sample's
    // interpolation — a one-sample drift anywhere in the grid breaks
    // the sum/min/max triple.
    Q(
      "q272_audio_resample",
      (s, dir) => {
        import s.implicits._
        Media.audioResample(mdWavMedia(s, dir), "media_id", "payload",
            dstRate = 6000)
          .orderBy($"media_id")
      },
      Some(s"""
        WITH sm AS MATERIALIZED (
          SELECT doc_id AS media_id, i,
                 GREATEST(-32768, LEAST(32767,
                   ${hSql("CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")}
                     % 80001 - 40000)) AS s
          FROM documents CROSS JOIN (SELECT unnest(range(0, 256)) AS i)),
        lst AS (SELECT media_id, list(s ORDER BY i) AS ss FROM sm GROUP BY 1),
        rs AS (
          SELECT media_id, j,
                 ss[CAST((j*8000)//6000 AS INT) + 1] +
                 CAST(((ss[LEAST(CAST((j*8000)//6000 AS INT) + 2, len(ss))] -
                        ss[CAST((j*8000)//6000 AS INT) + 1])
                       * ((j*8000) % 6000)) // 6000 AS INT) AS o
          FROM lst CROSS JOIN (SELECT unnest(range(0, 192)) AS j))
        SELECT media_id, 8000 AS src_rate, CAST(256 AS BIGINT) AS n_in,
               COUNT(*) AS n_out,
               CAST(CAST(SUM(o) AS BIGINT) AS BIGINT) AS sum_out,
               CAST(MIN(o) AS BIGINT) AS min_out,
               CAST(MAX(o) AS BIGINT) AS max_out
        FROM rs GROUP BY media_id ORDER BY media_id
      """)),
    // ----------------------------------------------------------------
    // Compressed-video container triage (no decode): each doc plants a
    // structurally-real AVI — codec fourcc cycling H264/MJPG/DIB,
    // formula-derived geometry, frame-size plan and keyframe cadence,
    // with a real idx1 index — through AviEncodeMeta; AviProbe walks
    // the RIFF structure and must recover every planted value; the
    // container fingerprint (codec:w:h:size-sequence, md5-60bit)
    // groups exact container dupes (doc_id % 50 shares a plan). The
    // oracle replays the plan arithmetic, the keyframe census, and the
    // fingerprint hash — any chunk/index mis-parse breaks the match.
    Q(
      "q276_video_container_triage",
      (s, dir) => {
        import s.implicits._
        import graft.functions.MediaFunctions.aviEncodeMeta
        val k = ($"doc_id" % 50).cast("int")
        val codec = when(k % 3 === 0, "H264")
          .when(k % 3 === 1, "MJPG").otherwise("DIB ")
        val sizes = transform(
          sequence(lit(0), (lit(1) + k % 4).cast("int")),
          i => (lit(64) + (k * 37 + i * 101) % 512).cast("int"))
        val media = Tables.load(s, dir, "documents")
          .select($"doc_id".as("media_id"),
            aviEncodeMeta(codec, (lit(16) + (k % 4) * 8).cast("int"),
              (lit(16) + (k % 3) * 8).cast("int"), sizes,
              (lit(1) + k % 3).cast("int")).as("payload"))
        val stats = Media.videoContainerStats(media, "media_id", "payload")
        stats.withColumn("dup_group",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy($"container_fp")))
          .orderBy($"media_id")
      },
      Some(s"""
        WITH p AS (
          SELECT doc_id, doc_id % 50 AS k FROM documents),
        plan AS (
          SELECT doc_id, k,
                 CASE k % 3 WHEN 0 THEN 'H264' WHEN 1 THEN 'MJPG'
                   ELSE 'DIB' END AS codec,
                 16 + (k % 4) * 8 AS w, 16 + (k % 3) * 8 AS h,
                 2 + k % 4 AS n, 1 + k % 3 AS ke,
                 list_transform(range(0, CAST(2 + k % 4 AS BIGINT)),
                   i -> 64 + (k * 37 + i * 101) % 512) AS sizes
          FROM p),
        s AS (
          SELECT doc_id AS media_id, codec,
                 CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
                 CAST(n AS INTEGER) AS n_frames,
                 CAST((n - 1) // ke + 1 AS INTEGER) AS n_keyframes,
                 CAST(list_sum(sizes) AS BIGINT) AS total_frame_bytes,
                 CAST(list_max(sizes) AS INTEGER) AS max_frame_bytes,
                 ${OracleSql.hash64(
      "codec || ':' || CAST(w AS VARCHAR) || ':' || CAST(h AS VARCHAR) || " +
        "':' || array_to_string(sizes, ',')")} AS container_fp
          FROM plan)
        SELECT *, COUNT(*) OVER (PARTITION BY container_fp) AS dup_group
        FROM s ORDER BY media_id
      """)),
    // ----------------------------------------------------------------
    // MP4/MOV + AVI mixed-corpus triage through ONE pass: even docs
    // plant a structurally-real ISO BMFF file (ftyp/mdat/moov with full
    // stsd/stsz/stss sample tables; codec cycling avc1/hvc1/mp4v) via
    // Mp4EncodeMeta, odd docs an AVI (H264/MJPG with idx1); the
    // container-independent videoContainerStats coalesces AviProbe and
    // Mp4Probe — each NULLs on the other's magic — and must recover
    // codec, geometry, per-frame sizes and the keyframe census (stss
    // entry count ≡ idx1 flag count ≡ ceil(n/ke)) from either box
    // grammar. The oracle replays the plan arithmetic per container
    // arm; a box-walk mis-parse of either format breaks the hash.
    Q(
      "q280_mp4_container_triage",
      (s, dir) => {
        import s.implicits._
        import graft.functions.MediaFunctions.aviEncodeMeta
        import graft.functions.Mp4Functions.mp4EncodeMeta
        val k = ($"doc_id" % 50).cast("int")
        val isMp4 = $"doc_id" % 2 === 0
        val mp4Codec = when(k % 3 === 0, "avc1")
          .when(k % 3 === 1, "hvc1").otherwise("mp4v")
        val aviCodec = when(k % 2 === 0, "H264").otherwise("MJPG")
        val w = (lit(16) + (k % 4) * 8).cast("int")
        val h = (lit(16) + (k % 3) * 8).cast("int")
        val ke = (lit(1) + k % 3).cast("int")
        val sizes = transform(
          sequence(lit(0), (lit(1) + k % 4).cast("int")),
          i => (lit(64) + (k * 37 + i * 101) % 512).cast("int"))
        val media = Tables.load(s, dir, "documents")
          .select($"doc_id".as("media_id"),
            when(isMp4, mp4EncodeMeta(mp4Codec, w, h, sizes, ke))
              .otherwise(aviEncodeMeta(aviCodec, w, h, sizes, ke))
              .as("payload"))
        val stats = Media.videoContainerStats(media, "media_id", "payload")
        stats.withColumn("dup_group",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy($"container_fp")))
          .orderBy($"media_id")
      },
      Some(s"""
        WITH p AS (
          SELECT doc_id, doc_id % 50 AS k FROM documents),
        plan AS (
          SELECT doc_id, k,
                 CASE WHEN doc_id % 2 = 0 THEN
                   CASE k % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'hvc1'
                     ELSE 'mp4v' END
                 ELSE
                   CASE k % 2 WHEN 0 THEN 'H264' ELSE 'MJPG' END
                 END AS codec,
                 16 + (k % 4) * 8 AS w, 16 + (k % 3) * 8 AS h,
                 2 + k % 4 AS n, 1 + k % 3 AS ke,
                 list_transform(range(0, CAST(2 + k % 4 AS BIGINT)),
                   i -> 64 + (k * 37 + i * 101) % 512) AS sizes
          FROM p),
        s AS (
          SELECT doc_id AS media_id, codec,
                 CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
                 CAST(n AS INTEGER) AS n_frames,
                 CAST((n - 1) // ke + 1 AS INTEGER) AS n_keyframes,
                 CAST(list_sum(sizes) AS BIGINT) AS total_frame_bytes,
                 CAST(list_max(sizes) AS INTEGER) AS max_frame_bytes,
                 ${OracleSql.hash64(
      "codec || ':' || CAST(w AS VARCHAR) || ':' || CAST(h AS VARCHAR) || " +
        "':' || array_to_string(sizes, ',')")} AS container_fp
          FROM plan)
        SELECT *, COUNT(*) OVER (PARTITION BY container_fp) AS dup_group
        FROM s ORDER BY media_id
      """))
  )
}
