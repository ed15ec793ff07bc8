package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.Merge
import graft.ext.{Dedup, Sampling, TextAnalysis}
import graft.functions.{TopK, VectorFunctions}
import Q._

/** Round-3 corpus-curation surface: dedup clustering (pairs → connected
  * components → canonical survivors), warehouse merge semantics
  * (upsert / SCD type-2), per-source caps, Gopher-style quality rules,
  * and embedding quantization. Oracles replicate each algorithm in
  * DuckDB (same hash formulas, same fold order) — they verify the
  * implementation, not plausibility.
  */
object Curation {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // Near-dup pairs → transitive closure → clusters with a canonical
    // survivor. The oracle computes the same pairs with the plain
    // inverted-index join, then closes them with a recursive CTE — an
    // independent formulation of connectivity (fixpoint recursion there,
    // label propagation + pointer jumping here).
    Q(
      "q74_dedup_clusters",
      (s, dir) => {
        import s.implicits._
        Dedup.nearDupClusters(t(s, dir, "documents"), "doc_id", "text",
          shingleSize = 3, threshold = 0.6)
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH RECURSIVE sh AS (
          SELECT doc_id, ${OracleSql.hashedShingles3("text")} AS shingles
          FROM documents),
        post AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
        sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT id_a, id_b
          FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
          WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.6),
        bidir AS (
          SELECT id_a AS s, id_b AS d FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(id, lab) AS (
          SELECT DISTINCT s, s FROM bidir
          UNION
          SELECT e.d, r.lab FROM reach r JOIN bidir e ON e.s = r.id),
        comp AS (SELECT id, MIN(lab) AS cluster_id FROM reach GROUP BY id),
        csz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY 1)
        SELECT id AS doc_id, cluster_id, cluster_size,
               (id = cluster_id) AS is_canonical
        FROM comp JOIN csz USING (cluster_id)
        ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Upsert merge: delta rows replace same-key base rows. The engine
    // runs the single-shuffle union + priority-pick plan; the oracle is
    // the INDEPENDENT formulation (full outer join + coalesce).
    Q(
      "q75_merge_upsert",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders").select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        val base = o.filter($"o_orderkey" % 2 === 0)
        val updates = o.filter($"o_orderkey" % 3 === 0)
          .withColumn("o_orderstatus", lit("U"))
          .withColumn("o_totalprice", $"o_totalprice" + 10.0d)
        Merge.upsert(base, updates, Seq("o_orderkey"))
          .orderBy($"o_orderkey")
      },
      Some("""
        WITH base AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey % 2 = 0),
        upd AS (
          SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 10.0 AS o_totalprice
          FROM orders WHERE o_orderkey % 3 = 0)
        SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
               COALESCE(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
               COALESCE(u.o_totalprice, b.o_totalprice) AS o_totalprice
        FROM upd u FULL OUTER JOIN base b ON u.o_orderkey = b.o_orderkey
        ORDER BY o_orderkey
      """)),
    // ----------------------------------------------------------------
    // SCD type-2 history from a change log: collapse consecutive no-op
    // events per user, interval-ize with lead(), version with
    // row_number — one shuffle, both window passes share the sort.
    Q(
      "q76_scd2_history",
      (s, dir) => {
        import s.implicits._
        Merge.scd2FromChangeLog(t(s, dir, "events"),
            $"user_id", $"ts", $"event_type", $"event_id")
          .select($"key".as("user_id"), $"attr".as("event_type"),
            tstr($"valid_from").as("valid_from"), tstr($"valid_to").as("valid_to"),
            $"version", $"is_current")
          .orderBy($"user_id", $"version")
      },
      Some(s"""
        WITH e AS (
          SELECT user_id, event_type, event_id,
                 make_timestamp(epoch_ns(ts) // 1000) AS us_ts
          FROM events),
        runs AS (
          SELECT *, LAG(event_type) OVER
                 (PARTITION BY user_id ORDER BY us_ts, event_id) AS prev
          FROM e),
        changes AS (SELECT * FROM runs WHERE prev IS NULL OR prev <> event_type),
        iv AS (
          SELECT user_id, event_type, us_ts AS vf,
                 LEAD(us_ts) OVER (PARTITION BY user_id ORDER BY us_ts, event_id) AS vt,
                 CAST(ROW_NUMBER() OVER
                   (PARTITION BY user_id ORDER BY us_ts, event_id) AS INTEGER) AS version
          FROM changes)
        SELECT user_id, event_type,
               strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
               strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
               version, (vt IS NULL) AS is_current
        FROM iv ORDER BY user_id, version
      """)),
    // ----------------------------------------------------------------
    // Per-source document cap via the bounded-heap grouped top-k (q70's
    // aggregate): map-side k-heaps ship <= cap ids per (source, task),
    // then the narrow survivors re-join their payload — the scale-safe
    // alternative to a full-shuffle row_number window.
    Q(
      "q77_cap_per_source",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        TopK.perKey(docs.select($"source", $"doc_id"), Seq("source"),
            -$"doc_id".cast("double"), $"doc_id", 10)
          .select($"source", $"rank", $"id".as("doc_id"))
          .join(docs.select($"doc_id", $"n_chars"), Seq("doc_id"))
          .select($"source", $"rank", $"doc_id", $"n_chars")
          .orderBy($"source", $"rank")
      },
      Some("""
        SELECT source, CAST(rn AS INTEGER) AS rank, doc_id, n_chars FROM (
          SELECT source, doc_id, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          FROM documents)
        WHERE rn <= 10
        ORDER BY source, rank
      """)),
    // ----------------------------------------------------------------
    // Gopher-style quality rules: every metric a regexp/length formula
    // with identical leftmost-first semantics in Java regex and RE2, so
    // the oracle re-derives the exact doubles (no tolerance compare).
    Q(
      "q78_gopher_quality",
      (s, dir) => {
        import s.implicits._
        import TextAnalysis.Gopher._
        val txt = $"text"
        t(s, dir, "documents").select(
          $"doc_id",
          wordCount(txt).cast("long").as("n_words"),
          meanWordLen(txt).as("mean_word_len"),
          symbolWordRatio(txt).as("symbol_word_ratio"),
          bulletLineRatio(txt).as("bullet_line_ratio"),
          ellipsisLineRatio(txt).as("ellipsis_line_ratio"),
          alphaWordRatio(txt).as("alpha_word_ratio"),
          stopwordHits(txt).cast("long").as("stopword_hits"))
          .withColumn("gopher_pass",
            $"n_words".between(20, 100000) &&
              $"mean_word_len".between(3.0, 10.0) &&
              $"symbol_word_ratio" < 0.1 &&
              $"bullet_line_ratio" < 0.9 &&
              $"ellipsis_line_ratio" < 0.3 &&
              $"alpha_word_ratio" > 0.8 &&
              $"stopword_hits" >= 2)
          .orderBy($"doc_id")
      },
      Some("""
        WITH m AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
                 CAST(GREATEST(len(regexp_extract_all(text, '\S+')), 1) AS DOUBLE) AS words,
                 CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) AS nonspace,
                 CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE) AS hashes,
                 CAST((length(text) - length(replace(text, '...', ''))) // 3 AS DOUBLE) AS ellipses,
                 CAST(length(text) - length(replace(text, chr(10), '')) + 1 AS DOUBLE) AS n_lines,
                 CAST(len(regexp_extract_all(text, '(?m)^\s*[-*' || chr(8226) || ']')) AS DOUBLE) AS bullet_lines,
                 CAST(len(regexp_extract_all(text, '(?m)\.\.\.$')) AS DOUBLE) AS ellipsis_lines,
                 CAST(len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS DOUBLE) AS alpha_words,
                 CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is)\b')) AS BIGINT) AS stopword_hits
          FROM documents)
        SELECT doc_id, n_words,
               nonspace / words AS mean_word_len,
               (hashes + ellipses) / words AS symbol_word_ratio,
               bullet_lines / n_lines AS bullet_line_ratio,
               ellipsis_lines / n_lines AS ellipsis_line_ratio,
               alpha_words / words AS alpha_word_ratio,
               stopword_hits,
               (n_words BETWEEN 20 AND 100000
                AND nonspace / words BETWEEN 3.0 AND 10.0
                AND (hashes + ellipses) / words < 0.1
                AND bullet_lines / n_lines < 0.9
                AND ellipsis_lines / n_lines < 0.3
                AND alpha_words / words > 0.8
                AND stopword_hits >= 2) AS gopher_pass
        FROM m ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Symmetric int8 embedding quantization stats via the codegen'd
    // Int8QuantStats expression; floor(x+0.5) rounding and left-fold
    // mae keep the doubles bit-identical across engines.
    Q(
      "q79_int8_quant",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "embeddings")
          .select($"vec_id", VectorFunctions.int8QuantStats($"embedding").as("q"))
          .select($"vec_id", $"q.scale".as("scale"),
            $"q.code_sum".as("code_sum"), $"q.mae".as("mae"))
          .orderBy($"vec_id")
      },
      Some("""
        WITH v AS (
          SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS vec
          FROM embeddings),
        m AS (
          SELECT vec_id, vec,
                 list_max(list_transform(vec, e -> abs(e))) AS maxabs
          FROM v)
        SELECT vec_id,
          CASE WHEN maxabs = 0 THEN 0.0 ELSE maxabs / 127.0 END AS scale,
          CAST(CASE WHEN maxabs = 0 THEN 0 ELSE
            list_sum(list_transform(vec, e ->
              LEAST(127.0, GREATEST(-127.0, floor(e / (maxabs / 127.0) + 0.5)))))
          END AS BIGINT) AS code_sum,
          CASE WHEN maxabs = 0 THEN 0.0 ELSE
            list_sum(list_transform(vec, e ->
              abs(e - LEAST(127.0, GREATEST(-127.0, floor(e / (maxabs / 127.0) + 0.5)))
                        * (maxabs / 127.0))))
            / CAST(len(vec) AS DOUBLE)
          END AS mae
        FROM m ORDER BY vec_id
      """)),
    // ----------------------------------------------------------------
    // Token-window chunk plan: Generate over a codegen'd sequence, no
    // shuffle; window 40 tokens, overlap 10 (stride 30).
    Q(
      "q80_chunk_plan",
      (s, dir) => {
        import s.implicits._
        TextAnalysis.chunkPlan(t(s, dir, "documents"), $"doc_id", $"text",
            window = 40, overlap = 10)
          .orderBy($"doc_id", $"chunk_id")
      },
      Some("""
        WITH w AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok
          FROM documents),
        c AS (
          SELECT doc_id, n_tok,
                 unnest(generate_series(0, GREATEST(n_tok - 1, 0), 30)) AS tok_start
          FROM w)
        SELECT doc_id, n_tok, CAST(tok_start // 30 AS INTEGER) AS chunk_id,
               tok_start, LEAST(tok_start + 40, n_tok) AS tok_end
        FROM c ORDER BY doc_id, chunk_id
      """)),
    // ----------------------------------------------------------------
    // Square-root temperature resampling over the skewed lang mix: the
    // rarest language survives whole, en is downsampled toward balance.
    // Membership is content-keyed, so the oracle reproduces the exact
    // sample (not just its size).
    Q(
      "q81_sqrt_resample",
      (s, dir) => {
        import s.implicits._
        Sampling.sqrtResample(
            t(s, dir, "documents").select($"doc_id", $"lang"),
            $"doc_id", $"lang")
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH c AS (SELECT lang AS st, COUNT(*) AS n FROM documents GROUP BY 1),
        mn AS (SELECT MIN(n) AS nmin FROM c),
        r AS (
          SELECT st, CAST(floor(sqrt(CAST(nmin AS DOUBLE) / CAST(n AS DOUBLE)) * 10000)
                          AS BIGINT) AS keep
          FROM c, mn)
        SELECT doc_id, lang
        FROM documents JOIN r ON lang = st
        WHERE ${OracleSql.hash64("CAST(doc_id AS VARCHAR)")} % 10000 < keep
        ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Corpus-statistical quality: mean corpus frequency of each doc's
    // tokens (the log-free unigram-LM score — exact arithmetic only, so
    // the oracle reproduces the doubles bit-for-bit).
    Q(
      "q82_unigram_score",
      (s, dir) => {
        import s.implicits._
        graft.ext.TextAnalysis.unigramScore(t(s, dir, "documents"), $"doc_id", $"text")
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH tok AS (
          SELECT doc_id, unnest(${OracleSql.tokens("lower(text)")}) AS tok
          FROM documents),
        cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY 1),
        tot AS (SELECT SUM(c) AS t FROM cnt),
        sc AS (
          SELECT doc_id, CAST(c AS DOUBLE) / CAST(t AS DOUBLE) AS f
          FROM tok JOIN cnt USING (tok) CROSS JOIN tot)
        SELECT doc_id, COUNT(*) AS n_toks,
               CAST(CAST(SUM(CAST(f AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS mean_tok_freq
        FROM sc GROUP BY 1 ORDER BY 1
      """)),
    // ----------------------------------------------------------------
    // Exact grouped percentiles (the exact twin of the q56 approx
    // sketch): Spark's percentile aggregate vs DuckDB quantile_cont —
    // both interpolate lower + (upper-lower)*frac at rank p*(n-1).
    // Exact percentile buffers per-group value counts, so it is for
    // bounded-domain columns; approx_percentile is the unbounded path.
    Q(
      "q83_exact_percentile",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").groupBy($"l_returnflag")
          .agg(
            percentile($"l_quantity", lit(0.25)).as("p25"),
            percentile($"l_quantity", lit(0.5)).as("p50"),
            percentile($"l_quantity", lit(0.95)).as("p95"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS p25,
               quantile_cont(l_quantity, 0.5) AS p50,
               quantile_cont(l_quantity, 0.95) AS p95
        FROM lineitem GROUP BY 1 ORDER BY 1
      """)),
    // ----------------------------------------------------------------
    // Deterministic batch assembly over the chunk plan: shard by
    // content hash, number within shard, pack 16 chunks per batch.
    // Batch membership is a pure function of (doc_id, chunk_id).
    Q(
      "q84_batch_pack",
      (s, dir) => {
        import s.implicits._
        graft.ext.Packing.shardedBatches(
            graft.ext.TextAnalysis.chunkPlan(
              t(s, dir, "documents"), $"doc_id", $"text", window = 40, overlap = 10),
            $"doc_id", Seq($"doc_id", $"chunk_id"), shards = 8, batchSize = 16)
          .select($"doc_id", $"chunk_id", $"shard", $"batch_id")
          .orderBy($"doc_id", $"chunk_id")
      },
      Some(s"""
        WITH w AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok
          FROM documents),
        ch AS (
          SELECT doc_id, n_tok,
                 unnest(generate_series(0, GREATEST(n_tok - 1, 0), 30)) AS tok_start
          FROM w),
        sh AS (
          SELECT doc_id, CAST(tok_start // 30 AS INTEGER) AS chunk_id,
                 ${OracleSql.hash64("CAST(doc_id AS VARCHAR)")} % 8 AS shard
          FROM ch),
        seq AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id, chunk_id) AS rn
          FROM sh)
        SELECT doc_id, chunk_id, shard,
               CAST(shard AS VARCHAR) || '-' ||
                 CAST(CAST((rn - 1) // 16 AS BIGINT) AS VARCHAR) AS batch_id
        FROM seq ORDER BY doc_id, chunk_id
      """)),
    // ----------------------------------------------------------------
    // Incremental near-dup: the daily-ingest shape — batch (doc_id % 4
    // == 0) against corpus (rest) plus batch-internal pairs, never
    // corpus × corpus. The oracle is the plain inverted-index join with
    // the same asymmetric pair predicate.
    Q(
      "q85_incremental_neardup",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        Dedup.incrementalNearDupPairs(
            docs.filter($"doc_id" % 4 =!= 0),
            docs.filter($"doc_id" % 4 === 0),
            "doc_id", "text", shingleSize = 3, threshold = 0.6)
          .orderBy($"id_new", $"id_b")
      },
      Some(s"""
        WITH d AS (SELECT doc_id, text, (doc_id % 4 = 0) AS is_new FROM documents),
        sh AS (SELECT doc_id, is_new, ${OracleSql.hashedShingles3("text")} AS shingles FROM d),
        post AS (SELECT doc_id, is_new, unnest(shingles) AS g FROM sh),
        sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
        inter AS (
          SELECT a.doc_id AS id_new, b.doc_id AS id_b, b.is_new AS in_batch,
                 COUNT(*) AS i
          FROM post a JOIN post b ON a.g = b.g
          WHERE a.is_new AND a.doc_id <> b.doc_id
            AND (NOT b.is_new OR a.doc_id < b.doc_id)
          GROUP BY 1, 2, 3)
        SELECT id_new, id_b, in_batch,
               CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
        FROM inter
        JOIN sz sa ON sa.doc_id = id_new
        JOIN sz sb ON sb.doc_id = id_b
        WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.6
        ORDER BY id_new, id_b
      """)),
    // ----------------------------------------------------------------
    // Snapshot diff: recover the row-level changelog between two table
    // versions (deterministically derived here: ~10% deleted, every
    // 7th key's price bumped, ~10% re-inserted under new keys). One
    // full-outer keyed join; null-safe column compare.
    Q(
      "q116_snapshot_diff",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey",
            $"o_totalprice".cast("double").as("o_totalprice"), $"o_orderstatus")
        val cur = o.filter($"o_orderkey" % 10 =!= 3)
          .withColumn("o_totalprice",
            when($"o_orderkey" % 7 === 0, $"o_totalprice" + 1.0)
              .otherwise($"o_totalprice"))
          .unionByName(o.filter($"o_orderkey" % 10 === 5)
            .withColumn("o_orderkey", $"o_orderkey" + 100000000L))
        graft.etl.Merge.snapshotDiff(o, cur, Seq("o_orderkey"))
          .orderBy($"o_orderkey")
      },
      Some("""
        WITH o AS (SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS p,
                          o_orderstatus FROM orders),
        cur AS (
          SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderkey % 7 = 0 THEN p + 1.0 ELSE p END AS p,
                 o_orderstatus
          FROM o WHERE o_orderkey % 10 <> 3
          UNION ALL
          SELECT o_orderkey + 100000000, o_custkey, p, o_orderstatus
          FROM o WHERE o_orderkey % 10 = 5),
        j AS (
          SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS k,
                 b.o_orderkey IS NULL AS ins, c.o_orderkey IS NULL AS del,
                 (CASE WHEN b.o_custkey IS DISTINCT FROM c.o_custkey THEN 1 ELSE 0 END
                  + CASE WHEN b.p IS DISTINCT FROM c.p THEN 1 ELSE 0 END
                  + CASE WHEN b.o_orderstatus IS DISTINCT FROM c.o_orderstatus
                    THEN 1 ELSE 0 END) AS nch
          FROM o b FULL OUTER JOIN cur c ON b.o_orderkey = c.o_orderkey)
        SELECT k AS o_orderkey,
               CASE WHEN ins THEN 'insert' WHEN del THEN 'delete'
                    WHEN nch > 0 THEN 'update' END AS change_type,
               CASE WHEN NOT ins AND NOT del AND nch > 0
                    THEN CAST(nch AS INTEGER) ELSE 0 END AS n_changed
        FROM j WHERE ins OR del OR nch > 0
        ORDER BY o_orderkey
      """)),
    // ----------------------------------------------------------------
    // Change feed over REAL committed snapshot versions: create →
    // append → full replace against a manifest store, then read the
    // version-range changelog back (insert/delete rows tagged with
    // their commit). The append segment is O(increment) by
    // construction — SnapshotSpec pins that it scans only the files
    // the commit added; the overwrite honestly pays delete(old) +
    // insert(new), the Delta-CDF replace semantics. The oracle replays
    // the same three derivations and the same feed algebra in SQL.
    Q(
      "q277_change_feed",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders").select($"o_orderkey")
        val root = java.nio.file.Files.createTempDirectory("graft-cdf").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o.filter($"o_orderkey" % 10 < 5)) // v0: create
        store.commitAppend(o.filter($"o_orderkey" % 10 === 7))  // v1: append
        store.commitOverwrite(o.filter($"o_orderkey" % 3 === 0)) // v2: replace
        store.readChanges(s, fromVersion = -1L)
          .groupBy($"_commit_version", $"_change_type")
          .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"))
          .orderBy($"_commit_version", $"_change_type")
      },
      Some("""
        WITH v0 AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 < 5),
        v1 AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 7),
        v2 AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0),
        feed AS (
          SELECT CAST(0 AS BIGINT) AS _commit_version, 'insert' AS _change_type,
                 o_orderkey FROM v0
          UNION ALL SELECT 1, 'insert', o_orderkey FROM v1
          UNION ALL SELECT 2, 'delete', o_orderkey FROM v0
          UNION ALL SELECT 2, 'delete', o_orderkey FROM v1
          UNION ALL SELECT 2, 'insert', o_orderkey FROM v2)
        SELECT _commit_version, _change_type, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM feed GROUP BY 1, 2
        ORDER BY _commit_version, _change_type
      """)),
    // ----------------------------------------------------------------
    // Registered-format read with planning-time file skipping: commit
    // orders range-clustered with id stats, read back through
    // spark.read.format("graft-snapshot"), and aggregate under an
    // ordinary .filter — the custom FileIndex prunes files from the
    // query's own predicate (SnapshotStreamSpec pins the observed
    // numFiles); the oracle replays the filter + aggregate directly,
    // so a pruning bug that dropped or double-read a file breaks the
    // hash. Buckets make the result multi-row and order-checkable.
    Q(
      "q278_format_pruned_read",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey")
        val root = java.nio.file.Files.createTempDirectory("graft-fmt").toString
        new graft.etl.SnapshotStore(root).commitOverwrite(
          o.repartitionByRange(8, $"o_orderkey"), statsColumn = Some("o_orderkey"))
        val lo = 1000L; val hi = 20000L
        s.read.format("graft-snapshot").option("path", root).load()
          .filter($"o_orderkey".between(lo, hi))
          .groupBy(($"o_orderkey" % 7L).as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum($"o_orderkey").as("key_sum"),
            sum($"o_custkey").as("cust_sum"))
          .orderBy($"bucket")
      },
      Some("""
        SELECT o_orderkey % 7 AS bucket, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
        FROM orders WHERE o_orderkey BETWEEN 1000 AND 20000
        GROUP BY 1 ORDER BY bucket
      """)),
    // ----------------------------------------------------------------
    // Compaction invariance of the change feed: three appends, then a
    // range-clustered compaction (dataChange=false). The feed must
    // contain EXACTLY the three appends' rows — a compaction that
    // leaked into the feed (the naive-CDC failure where maintenance
    // looks like an overwrite) adds delete+insert rows and breaks all
    // three gates. The oracle replays the appends and nothing else.
    Q(
      "q279_feed_compaction_invariance",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders").select($"o_orderkey")
        val root = java.nio.file.Files.createTempDirectory("graft-cmp").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitAppend(o.filter($"o_orderkey" % 3 === 0),
          statsColumn = Some("o_orderkey"))
        store.commitAppend(o.filter($"o_orderkey" % 3 === 1))
        store.commitAppend(o.filter($"o_orderkey" % 3 === 2))
        store.compactLatest(s, targetFiles = 4)
        store.readChanges(s, fromVersion = -1L)
          .groupBy($"_commit_version", $"_change_type")
          .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"))
          .orderBy($"_commit_version")
      },
      Some("""
        WITH feed AS (
          SELECT CAST(o_orderkey % 3 AS BIGINT) AS _commit_version,
                 'insert' AS _change_type, o_orderkey
          FROM orders)
        SELECT _commit_version, _change_type, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM feed GROUP BY 1, 2
        ORDER BY _commit_version
      """)),
    // ----------------------------------------------------------------
    // Copy-on-write MERGE on a real committed store: upsert a delta
    // (spread updates + brand-new keys) into the latest version via
    // SnapshotStore.mergeInto — candidate files pruned by manifest
    // stats against the delta's key range, ONLY those rewritten,
    // untouched files republished by identity (SnapshotSpec pins the
    // path identity and the touched-only change feed; this oracle pins
    // the RESULT ≡ a full-table upsert). Readback groups by row
    // provenance so a dropped update, resurrected old row, or lost
    // insert each breaks a different group.
    Q(
      "q281_snapshot_cow_merge",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey", lit("base").as("ver"))
        val root = java.nio.file.Files.createTempDirectory("graft-cow").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o.repartitionByRange(8, $"o_orderkey"),
          statsColumn = Some("o_orderkey"))
        val delta = o.filter($"o_orderkey" % 1000 < 20)
          .withColumn("ver", lit("upd"))
          .unionByName(o.filter($"o_orderkey" % 1000 >= 980)
            .select(($"o_orderkey" + 200000000L).as("o_orderkey"),
              $"o_custkey", lit("new").as("ver")))
        store.mergeInto(s, delta, Seq("o_orderkey"))
        store.read(s)
          .groupBy($"ver")
          .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"),
            sum($"o_custkey").as("cust_sum"))
          .orderBy($"ver")
      },
      Some("""
        WITH o AS (SELECT o_orderkey, o_custkey FROM orders),
        merged AS (
          SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderkey % 1000 < 20 THEN 'upd' ELSE 'base' END AS ver
          FROM o
          UNION ALL
          SELECT o_orderkey + 200000000, o_custkey, 'new'
          FROM o WHERE o_orderkey % 1000 >= 980)
        SELECT ver, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
        FROM merged GROUP BY 1 ORDER BY ver
      """)),
    // ----------------------------------------------------------------
    // Partitioned snapshot store: create hive-partitioned (values in
    // paths, not files), dynamic-partition REPLACE one day as one
    // atomic version, read back through the registered format — the
    // WHERE day IN (...) prunes whole partitions at planning time
    // (SnapshotStreamSpec pins the numFiles) and the replaced day's
    // rows must be the NEW generation while its neighbors are
    // untouched. The oracle replays the derivation + replace in SQL;
    // a partition-value mis-parse, a replace that leaked into other
    // days, or a pruning bug that dropped files all break the hash.
    Q(
      "q282_partitioned_store_read",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey",
            ($"o_orderkey" % 7).cast("int").as("day"))
        val root = java.nio.file.Files.createTempDirectory("graft-part").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o, statsColumn = Some("o_orderkey"),
          partitionBy = Seq("day"))
        store.commitReplacePartitions(
          o.filter($"day" === 3)
            .withColumn("o_custkey", $"o_custkey" + 1000000L))
        s.read.format("graft-snapshot").option("path", root).load()
          .filter($"day".isin(2, 3))
          .groupBy($"day")
          .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"),
            sum($"o_custkey").as("cust_sum"))
          .orderBy($"day")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, o_custkey,
                 CAST(o_orderkey % 7 AS INTEGER) AS day
          FROM orders),
        cur AS (
          SELECT o_orderkey,
                 CASE WHEN day = 3 THEN o_custkey + 1000000 ELSE o_custkey END
                   AS o_custkey,
                 day
          FROM o)
        SELECT day, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
        FROM cur WHERE day IN (2, 3) GROUP BY 1 ORDER BY day
      """)),
    // ----------------------------------------------------------------
    // SQL row-level DML lifecycle on a snapshot catalog table: DELETE,
    // UPDATE, and canonical-upsert MERGE each land as ONE copy-on-write
    // manifest version (V1 tables otherwise refuse all three); the
    // MERGE source reads the table's own post-UPDATE state, so the
    // oracle must replay the statements IN ORDER — any statement
    // applied to the wrong snapshot, leaked into untouched rows, or
    // lost breaks a provenance group.
    Q(
      "q283_sql_dml_lifecycle",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey", lit("base").as("ver"))
        val root = java.nio.file.Files.createTempDirectory("graft-dml").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o.repartitionByRange(8, $"o_orderkey"),
          statsColumn = Some("o_orderkey"))
        s.sql("DROP TABLE IF EXISTS g283_dml")
        s.sql(s"CREATE TABLE g283_dml USING `graft-snapshot` OPTIONS (path '$root')")
        try {
          s.sql("DELETE FROM g283_dml WHERE o_orderkey % 10 = 3")
          s.sql("UPDATE g283_dml SET ver = 'upd' WHERE o_orderkey % 7 = 0")
          s.sql("""
            MERGE INTO g283_dml USING
              (SELECT o_orderkey + 300000000 AS o_orderkey, o_custkey,
                      'new' AS ver
               FROM g283_dml WHERE o_orderkey % 100 = 5) s
            ON g283_dml.o_orderkey = s.o_orderkey
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""")
          store.read(s)
            .groupBy($"ver")
            .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"),
              sum($"o_custkey").as("cust_sum"))
            .orderBy($"ver")
        } finally s.sql("DROP TABLE IF EXISTS g283_dml")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, o_custkey, 'base' AS ver FROM orders),
        d AS (SELECT * FROM o WHERE o_orderkey % 10 <> 3),
        u AS (
          SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderkey % 7 = 0 THEN 'upd' ELSE ver END AS ver
          FROM d),
        m AS (
          SELECT * FROM u
          UNION ALL
          SELECT o_orderkey + 300000000, o_custkey, 'new'
          FROM u WHERE o_orderkey % 100 = 5)
        SELECT ver, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
        FROM m GROUP BY 1 ORDER BY ver
      """)),
    // ----------------------------------------------------------------
    // Z-order compaction (OPTIMIZE ZORDER BY): two overlapping appends,
    // then a zorder rewrite over (o_custkey, o_totalprice-bucket) —
    // dataChange=false, so rows must be bit-identical through the
    // morton re-layout AND the change feed must still contain exactly
    // the two appends. The multi-dimensional aggregate read afterwards
    // pays the rewritten layout; the oracle replays the append algebra
    // and the aggregate directly — a z-key that permuted, dropped or
    // duplicated rows breaks the hash.
    Q(
      "q284_zorder_compaction",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey",
            ($"o_orderkey" % 1000L).as("bucket1k"))
        val root = java.nio.file.Files.createTempDirectory("graft-zord").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitAppend(o.filter($"o_orderkey" % 2 === 0),
          statsColumn = Some("o_orderkey"))
        store.commitAppend(o.filter($"o_orderkey" % 2 === 1))
        store.compactLatest(s, targetFiles = 8,
          zorderBy = Seq("o_custkey", "bucket1k"))
        val feed = store.readChanges(s, -1L)
          .groupBy($"_commit_version")
          .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"))
        val slice = store.read(s)
          .filter($"o_custkey" <= 200L && $"bucket1k".between(100L, 300L))
          .agg(lit(-1L).as("_commit_version"), count(lit(1)).as("n"),
            sum($"o_orderkey").as("key_sum"))
        feed.unionByName(slice).orderBy($"_commit_version")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, o_custkey, o_orderkey % 1000 AS bucket1k
          FROM orders),
        feed AS (
          SELECT CAST(o_orderkey % 2 AS BIGINT) AS _commit_version,
                 o_orderkey FROM o),
        agg AS (
          SELECT _commit_version, COUNT(*) AS n,
                 CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
          FROM feed GROUP BY 1),
        slice AS (
          SELECT CAST(-1 AS BIGINT) AS _commit_version, COUNT(*) AS n,
                 CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
          FROM o WHERE o_custkey <= 200 AND bucket1k BETWEEN 100 AND 300)
        SELECT * FROM agg UNION ALL SELECT * FROM slice
        ORDER BY _commit_version
      """)),
    // ----------------------------------------------------------------
    // CONVERT-in-place: an UNMANAGED parquet lake (written by a plain
    // df.write under the store root) adopted into versioned management
    // with zero rewrite — footer stats collected at adoption, then a
    // managed append lands on top. The readback aggregates the adopted
    // generation AND the post-adoption increment per generation tag;
    // the oracle replays both. A mis-inventoried file (lost, doubled,
    // wrong stats) breaks rows/hash.
    Q(
      "q285_convert_in_place",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey", lit("legacy").as("gen"))
        val root = java.nio.file.Files.createTempDirectory("graft-adopt").toString
        o.repartitionByRange(6, $"o_orderkey")
          .write.parquet(s"$root/data/legacy")
        val store = new graft.etl.SnapshotStore(root)
        store.convertInPlace(s, statsColumn = Some("o_orderkey"))
        store.commitAppend(
          o.filter($"o_orderkey" % 100 === 0)
            .select(($"o_orderkey" + 500000000L).as("o_orderkey"),
              $"o_custkey", lit("managed").as("gen")))
        store.read(s)
          .groupBy($"gen")
          .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"),
            sum($"o_custkey").as("cust_sum"))
          .orderBy($"gen")
      },
      Some("""
        WITH o AS (SELECT o_orderkey, o_custkey FROM orders),
        uni AS (
          SELECT o_orderkey, o_custkey, 'legacy' AS gen FROM o
          UNION ALL
          SELECT o_orderkey + 500000000, o_custkey, 'managed'
          FROM o WHERE o_orderkey % 100 = 0)
        SELECT gen, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
        FROM uni GROUP BY 1 ORDER BY gen
      """)),
    // ----------------------------------------------------------------
    // RESTORE through the change feed: good deploy (v0), bad deploy
    // (v1 full replace), zero-copy rollback (v2 = restore(0)). The feed
    // must show v1 as delete(good)+insert(bad) and the restore as the
    // symmetric delete(bad)+insert(good) — restored rows re-enter the
    // feed from v0's ORIGINAL files (file identity, no copy; the spec
    // pins the identity, this oracle pins the row algebra). A restore
    // that leaked the wrong generation or double-counted shared files
    // breaks a group.
    Q(
      "q286_restore_feed",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders").select($"o_orderkey")
        val root = java.nio.file.Files.createTempDirectory("graft-rst").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o.filter($"o_orderkey" % 3 === 0)) // v0: good
        store.commitOverwrite(o.filter($"o_orderkey" % 5 === 0)) // v1: bad deploy
        store.restore(0L)                                        // v2: rollback
        store.readChanges(s, -1L)
          .groupBy($"_commit_version", $"_change_type")
          .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"))
          .orderBy($"_commit_version", $"_change_type")
      },
      Some("""
        WITH a AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0),
        b AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 5 = 0),
        feed AS (
          SELECT CAST(0 AS BIGINT) AS v, 'insert' AS t, o_orderkey FROM a
          UNION ALL SELECT 1, 'delete', o_orderkey FROM a
          UNION ALL SELECT 1, 'insert', o_orderkey FROM b
          UNION ALL SELECT 2, 'delete', o_orderkey FROM b
          UNION ALL SELECT 2, 'insert', o_orderkey FROM a)
        SELECT v AS _commit_version, t AS _change_type, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM feed GROUP BY 1, 2
        ORDER BY _commit_version, _change_type
      """)),
    // ----------------------------------------------------------------
    // MERGE-ON-READ delete: two scattered deletes (every 500th key —
    // hits most of the 8 range-clustered files, the worst case for
    // copy-on-write) land as position-list deletion vectors touching
    // ZERO data files (SnapshotSpec pins the file-set identity); the
    // read applies them via the scan-time anti-join and the change
    // feed emits each tombstoned row exactly once in its own commit.
    // The oracle replays both as plain SQL: a row the anti-join missed
    // (still visible), double-tombstoned (feed dup), or attributed to
    // the wrong commit each breaks a different group.
    Q(
      "q287_mor_delete",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", ($"o_orderkey" % 5).as("bucket"))
        val root = java.nio.file.Files.createTempDirectory("graft-mor").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o.repartitionByRange(8, $"o_orderkey"),
          statsColumn = Some("o_orderkey"))
        store.deleteWhere(s, $"o_orderkey" % 500 === 7, mergeOnRead = true) // v1
        store.deleteWhere(s, $"o_orderkey" % 500 === 8, mergeOnRead = true) // v2
        val live = store.read(s)
          .groupBy($"bucket".as("grp"))
          .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"))
          .withColumn("side", lit("live"))
        val dead = store.readChanges(s, 0L, Some(2L))
          .groupBy($"_commit_version".as("grp"))
          .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"))
          .withColumn("side", lit("deleted"))
        live.unionByName(dead)
          .select($"side", $"grp", $"n", $"key_sum")
          .orderBy($"side", $"grp")
      },
      Some("""
        WITH o AS (SELECT o_orderkey, o_orderkey % 5 AS bucket FROM orders),
        live AS (
          SELECT 'live' AS side, CAST(bucket AS BIGINT) AS grp,
                 COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
          FROM o WHERE o_orderkey % 500 NOT IN (7, 8) GROUP BY 2),
        dead AS (
          SELECT 'deleted' AS side,
                 CAST(CASE WHEN o_orderkey % 500 = 7 THEN 1 ELSE 2 END AS BIGINT) AS grp,
                 COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
          FROM o WHERE o_orderkey % 500 IN (7, 8) GROUP BY 2)
        SELECT * FROM live UNION ALL SELECT * FROM dead
        ORDER BY side, grp
      """)),
    // ----------------------------------------------------------------
    // General SQL MERGE — the op-coded CDC apply in ONE statement:
    // conditional DELETE arm (s.op='D'), conditional partial UPDATE
    // (two-sided clause order matters: D wins before the catch-all
    // update), and a gated INSERT arm (absent 'D' keys must NOT insert).
    // One copy-on-write commit; the oracle replays the clause algebra
    // as plain SQL — a delete leaking into the update arm, a ghost 'D'
    // inserting, or a clause applied out of order each breaks a group.
    Q(
      "q288_sql_merge_cdc",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey", lit("base").as("ver"))
        val root = java.nio.file.Files.createTempDirectory("graft-gmrg").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o.repartitionByRange(8, $"o_orderkey"),
          statsColumn = Some("o_orderkey"))
        s.sql("DROP TABLE IF EXISTS g288_cdc")
        s.sql(s"CREATE TABLE g288_cdc USING `graft-snapshot` OPTIONS (path '$root')")
        try {
          // one op-coded change batch derived from the table itself
          // (snapshot isolation pins the source to the pre-merge state):
          // %997==1 -> delete, %997==2 -> update, +300M new keys -> insert,
          // ghost deletes for absent keys -> no-op
          s.sql("""
            MERGE INTO g288_cdc USING (
              SELECT o_orderkey, o_custkey, 'D' AS op
              FROM g288_cdc WHERE o_orderkey % 997 = 1
              UNION ALL
              SELECT o_orderkey, o_custkey, 'U'
              FROM g288_cdc WHERE o_orderkey % 997 = 2
              UNION ALL
              SELECT o_orderkey + 300000000, o_custkey, 'U'
              FROM g288_cdc WHERE o_orderkey % 997 = 3
              UNION ALL
              SELECT o_orderkey + 600000000, o_custkey, 'D'
              FROM g288_cdc WHERE o_orderkey % 997 = 4
            ) s
            ON g288_cdc.o_orderkey = s.o_orderkey
            WHEN MATCHED AND s.op = 'D' THEN DELETE
            WHEN MATCHED THEN UPDATE SET ver = 'upd'
            WHEN NOT MATCHED AND s.op = 'U' THEN
              INSERT (o_orderkey, o_custkey, ver) VALUES (s.o_orderkey, s.o_custkey, 'new')""")
          store.read(s)
            .groupBy($"ver")
            .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"),
              sum($"o_custkey").as("cust_sum"))
            .orderBy($"ver")
        } finally s.sql("DROP TABLE IF EXISTS g288_cdc")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, o_custkey, 'base' AS ver FROM orders),
        applied AS (
          SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderkey % 997 = 2 THEN 'upd' ELSE ver END AS ver
          FROM o WHERE o_orderkey % 997 <> 1
          UNION ALL
          SELECT o_orderkey + 300000000, o_custkey, 'new'
          FROM o WHERE o_orderkey % 997 = 3)
        SELECT ver, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
        FROM applied GROUP BY 1 ORDER BY ver
      """)),
    // ----------------------------------------------------------------
    // MERGE-ON-READ upsert + update — the steady-CDC-stream physics:
    // one MoR MERGE (scattered updates + inserts, %997 buckets hit most
    // of the 8 range files) and one MoR UPDATE land as DV sidecars plus
    // appended delta files, touching ZERO base data files (SnapshotSpec
    // pins the file identity; this oracle pins the row algebra). The
    // live read applies the tombstones via the scan anti-join; the feed
    // must show each commit as honest delete(old image) + insert(new
    // image) rows. A tombstone the anti-join missed (stale image
    // visible), a double-applied delta, or a feed image attributed to
    // the wrong arm each breaks a different group.
    Q(
      "q289_mor_upsert",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey", lit("base").as("ver"))
        val root = java.nio.file.Files.createTempDirectory("graft-moru").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o.repartitionByRange(8, $"o_orderkey"),
          statsColumn = Some("o_orderkey"))
        val base = store.read(s) // snapshot-isolated source of the delta
        val delta = base.filter($"o_orderkey" % 997 === 2)
          .select($"o_orderkey", $"o_custkey", lit("upd").as("ver"))
          .unionByName(base.filter($"o_orderkey" % 997 === 3)
            .select(($"o_orderkey" + 300000000L).as("o_orderkey"),
              $"o_custkey", lit("new").as("ver")))
        store.mergeInto(s, delta, Seq("o_orderkey"), mergeOnRead = true) // v1
        // the update arm is disjoint from v1's inserts by construction:
        // (k + 300000000) % 997 == (3 + 706) == 709, never 5
        store.updateWhere(s, $"o_orderkey" % 997 === 5,
          Map("ver" -> lit("upd2")), mergeOnRead = true)                 // v2
        val live = store.read(s)
          .groupBy($"ver".as("grp"))
          .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"))
          .withColumn("side", lit("live"))
        val feed = store.readChanges(s, 0L)
          .groupBy(concat($"_commit_version", lit("_"), $"_change_type").as("grp"))
          .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"))
          .withColumn("side", lit("feed"))
        live.unionByName(feed)
          .select($"side", $"grp", $"n", $"key_sum")
          .orderBy($"side", $"grp")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, o_custkey, 'base' AS ver FROM orders),
        upd AS (SELECT o_orderkey FROM o WHERE o_orderkey % 997 = 2),
        nw AS (
          SELECT o_orderkey + 300000000 AS o_orderkey
          FROM o WHERE o_orderkey % 997 = 3),
        up2 AS (SELECT o_orderkey FROM o WHERE o_orderkey % 997 = 5),
        live AS (
          SELECT 'live' AS side,
                 CASE WHEN o_orderkey % 997 = 2 THEN 'upd'
                      WHEN o_orderkey % 997 = 5 THEN 'upd2'
                      ELSE 'base' END AS grp,
                 o_orderkey
          FROM o
          UNION ALL SELECT 'live', 'new', o_orderkey FROM nw),
        feed AS (
          SELECT 'feed' AS side, '1_delete' AS grp, o_orderkey FROM upd
          UNION ALL SELECT 'feed', '1_insert', o_orderkey FROM upd
          UNION ALL SELECT 'feed', '1_insert', o_orderkey FROM nw
          UNION ALL SELECT 'feed', '2_delete', o_orderkey FROM up2
          UNION ALL SELECT 'feed', '2_insert', o_orderkey FROM up2),
        uni AS (SELECT * FROM live UNION ALL SELECT * FROM feed)
        SELECT side, grp, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM uni GROUP BY 1, 2 ORDER BY side, grp
      """)),
    // ----------------------------------------------------------------
    // FULL-STATE SYNC — SQL MERGE with NOT MATCHED BY SOURCE: the
    // source IS the desired table (present keys updated or inserted);
    // target rows absent from it are deleted, except a conditional
    // orphan arm that flags instead. One copy-on-write commit; every
    // arm of the clause matrix (two matched orders, insert, two
    // by-source orders) lands in a distinct group, so a row falling
    // into the wrong arm — a matched row leaking into the by-source
    // arms, a ghost insert, first-match-wins violated — breaks the
    // hash. The oracle replays the set algebra as plain SQL.
    Q(
      "q290_merge_full_sync",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey", lit("base").as("ver"))
        val root = java.nio.file.Files.createTempDirectory("graft-fss").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o.repartitionByRange(8, $"o_orderkey"),
          statsColumn = Some("o_orderkey"))
        s.sql("DROP TABLE IF EXISTS g290_fss")
        s.sql(s"CREATE TABLE g290_fss USING `graft-snapshot` OPTIONS (path '$root')")
        try {
          s.sql("""
            MERGE INTO g290_fss USING (
              SELECT o_orderkey, o_custkey, 'kept' AS ver
              FROM g290_fss WHERE o_orderkey % 3 = 0
              UNION ALL
              SELECT o_orderkey + 300000000, o_custkey, 'new'
              FROM g290_fss WHERE o_orderkey % 997 = 3
            ) s
            ON g290_fss.o_orderkey = s.o_orderkey
            WHEN MATCHED AND g290_fss.o_custkey % 2 = 0 THEN UPDATE SET *
            WHEN MATCHED THEN UPDATE SET ver = 'kept_odd'
            WHEN NOT MATCHED THEN INSERT *
            WHEN NOT MATCHED BY SOURCE AND g290_fss.o_custkey % 10 = 7 THEN
              UPDATE SET ver = 'orphan'
            WHEN NOT MATCHED BY SOURCE THEN DELETE""")
          store.read(s)
            .groupBy($"ver")
            .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"),
              sum($"o_custkey").as("cust_sum"))
            .orderBy($"ver")
        } finally s.sql("DROP TABLE IF EXISTS g290_fss")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, o_custkey, 'base' AS ver FROM orders),
        synced AS (
          SELECT o_orderkey, o_custkey,
                 CASE WHEN o_custkey % 2 = 0 THEN 'kept'
                      ELSE 'kept_odd' END AS ver
          FROM o WHERE o_orderkey % 3 = 0),
        inserted AS (
          SELECT o_orderkey + 300000000, o_custkey, 'new'
          FROM o WHERE o_orderkey % 997 = 3),
        orphans AS (
          SELECT o_orderkey, o_custkey, 'orphan'
          FROM o WHERE o_orderkey % 3 <> 0 AND o_custkey % 10 = 7),
        res AS (
          SELECT * FROM synced
          UNION ALL SELECT * FROM inserted
          UNION ALL SELECT * FROM orphans)
        SELECT ver, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
        FROM res GROUP BY 1 ORDER BY ver
      """)),
    // ----------------------------------------------------------------
    // SQL OPS lifecycle — the maintenance statements Spark has no
    // grammar for, end to end through the injected parser: INSERT (v1),
    // OPTIMIZE ZORDER BY (v2, dataChange=false), ALTER TABLE ADD
    // COLUMNS (v3, O(manifest) evolution), UPDATE on the evolved column
    // (v4), RESTORE to the pre-optimize version (v5, narrow schema
    // back), VACUUM RETAIN 3 (history pruned to v3..v5). The live read
    // must be exactly v1's content; DESCRIBE HISTORY must show the
    // 3 surviving versions with zero rewrites (the zorder rewrite was
    // vacuumed). A restore that leaked the evolved rows, a vacuum that
    // kept or dropped the wrong manifests, or an OPTIMIZE that changed
    // rows each breaks a group.
    Q(
      "q291_sql_ops_lifecycle",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders").select($"o_orderkey")
        val root = java.nio.file.Files.createTempDirectory("graft-ops").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o.repartitionByRange(8, $"o_orderkey"),
          statsColumn = Some("o_orderkey"))
        s.sql("DROP TABLE IF EXISTS g291_ops")
        s.sql(s"CREATE TABLE g291_ops USING `graft-snapshot` OPTIONS (path '$root')")
        try {
          s.sql("""INSERT INTO g291_ops
            SELECT o_orderkey + 300000000 FROM g291_ops
            WHERE o_orderkey % 100 = 5""")                               // v1
          s.sql("OPTIMIZE g291_ops ZORDER BY (o_orderkey) TARGET 4 FILES") // v2
          s.sql("ALTER TABLE g291_ops ADD COLUMNS (flag STRING)")          // v3
          s.sql("UPDATE g291_ops SET flag = 'x' WHERE o_orderkey % 997 = 1") // v4
          s.sql("RESTORE TABLE g291_ops TO VERSION AS OF 1")                // v5
          s.sql("VACUUM g291_ops RETAIN 3 VERSIONS")
          val live = s.sql("""
            SELECT 'live' AS side, CAST(o_orderkey % 5 AS BIGINT) AS grp,
                   COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
            FROM g291_ops GROUP BY 2""")
          val hist = s.sql("DESCRIBE HISTORY g291_ops")
            .agg(lit("hist").as("side"), lit(-1L).as("grp"),
              count(lit(1)).as("n"),
              sum(when($"is_rewrite", 1L).otherwise(0L)).as("key_sum"))
          live.unionByName(hist).orderBy($"side", $"grp")
        } finally s.sql("DROP TABLE IF EXISTS g291_ops")
      },
      Some("""
        WITH o AS (SELECT o_orderkey FROM orders),
        uni AS (
          SELECT o_orderkey FROM o
          UNION ALL
          SELECT o_orderkey + 300000000 FROM o WHERE o_orderkey % 100 = 5),
        live AS (
          SELECT 'live' AS side, CAST(o_orderkey % 5 AS BIGINT) AS grp,
                 COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
          FROM uni GROUP BY 2),
        hist AS (
          SELECT 'hist', CAST(-1 AS BIGINT), CAST(3 AS BIGINT),
                 CAST(0 AS BIGINT))
        SELECT * FROM live UNION ALL SELECT * FROM hist
        ORDER BY side, grp
      """)),
    // ----------------------------------------------------------------
    // CDC primitives under oracle: ONE op-coded applyChanges commit
    // (the change-APPLY half of replication — deletes included, which
    // a plain upsert cannot do) in merge-on-read physics, then the
    // change feed read back through the SQL table-valued function
    // `table_changes('t', from)` by CATALOG NAME (the read half).
    // MoR renders row-exact deletes + appended images, so the feed
    // algebra is deterministic; a delete leaking into the insert arm,
    // a ghost 'D' materializing, or the TVF resolving the wrong store
    // each breaks a group.
    Q(
      "q292_apply_changes_tvf",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey", lit("base").as("ver"))
        val root = java.nio.file.Files.createTempDirectory("graft-tvf").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o.repartitionByRange(8, $"o_orderkey"),
          statsColumn = Some("o_orderkey"))
        val base = store.read(s)
        val changes = base.filter($"o_orderkey" % 997 === 1)
          .select($"o_orderkey", $"o_custkey", $"ver", lit("D").as("op"))
          .unionByName(base.filter($"o_orderkey" % 997 === 2)
            .select($"o_orderkey", $"o_custkey", lit("upd").as("ver"),
              lit("U").as("op")))
          .unionByName(base.filter($"o_orderkey" % 997 === 3)
            .select(($"o_orderkey" + 600000000L).as("o_orderkey"),
              $"o_custkey", $"ver", lit("D").as("op"))) // ghost deletes
        store.applyChanges(s, changes, Seq("o_orderkey"), opCol = "op",
          mergeOnRead = true) // v1
        // settle the tombstones so the plain format scan may read the
        // table (the FileIndex refuses live DVs); the rewrite version
        // is dataChange=false, so the feed below is unchanged by it
        store.compactLatest(s, targetFiles = 4) // v2
        s.sql("DROP TABLE IF EXISTS g292_tvf")
        s.sql(s"CREATE TABLE g292_tvf USING `graft-snapshot` OPTIONS (path '$root')")
        try {
          val feed = s.sql("""
            SELECT concat('feed_', _change_type) AS grp,
                   COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
            FROM table_changes('g292_tvf', 0) GROUP BY 1""")
          val live = s.sql("""
            SELECT concat('live_', ver) AS grp,
                   COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
            FROM g292_tvf GROUP BY 1""")
          feed.unionByName(live).orderBy($"grp")
        } finally s.sql("DROP TABLE IF EXISTS g292_tvf")
      },
      Some("""
        WITH o AS (SELECT o_orderkey FROM orders),
        del AS (SELECT o_orderkey FROM o WHERE o_orderkey % 997 = 1),
        upd AS (SELECT o_orderkey FROM o WHERE o_orderkey % 997 = 2),
        rows_all AS (
          SELECT 'feed_delete' AS grp, o_orderkey FROM del
          UNION ALL SELECT 'feed_delete', o_orderkey FROM upd
          UNION ALL SELECT 'feed_insert', o_orderkey FROM upd
          UNION ALL SELECT 'live_base', o_orderkey FROM o
            WHERE o_orderkey % 997 NOT IN (1, 2)
          UNION ALL SELECT 'live_upd', o_orderkey FROM upd)
        SELECT grp, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM rows_all GROUP BY 1 ORDER BY grp
      """)),
    // ----------------------------------------------------------------
    // MULTI-COLUMN manifest stats — statsColumn as a comma list: the
    // FIRST column is the clustering/merge authority, the rest collect
    // per-file min/max into the manifest too, so after OPTIMIZE ZORDER
    // every clustered dimension skips files at PLANNING time (one
    // dimension used to plan-prune; the others only row-group-pruned
    // inside already-opened files). The readback slices each dimension
    // separately plus a conjunction; the oracle replays them as plain
    // SQL — a slice that lost rows to over-pruning (the bug class this
    // feature risks) breaks its group.
    Q(
      "q293_multicol_stats",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey",
            ($"o_orderkey" % 1000L).as("bucket1k"))
        val root = java.nio.file.Files.createTempDirectory("graft-mstat").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o.repartitionByRange(8, $"o_orderkey"),
          statsColumn = Some("o_orderkey,bucket1k"))
        store.compactLatest(s, targetFiles = 16,
          zorderBy = Seq("o_orderkey", "bucket1k"))
        val t = s.read.format("graft-snapshot").option("path", root).load()
        val byKey = t.filter($"o_orderkey" <= 30000L)
          .select(lit("by_key").as("grp"), $"o_custkey")
        val byBucket = t.filter($"bucket1k".between(100L, 199L))
          .select(lit("by_bucket").as("grp"), $"o_custkey")
        val both = t.filter($"o_orderkey" > 30000L && $"bucket1k" < 50L)
          .select(lit("both").as("grp"), $"o_custkey")
        byKey.unionByName(byBucket).unionByName(both)
          .groupBy($"grp")
          .agg(count(lit(1)).as("n"), sum($"o_custkey").as("cust_sum"))
          .orderBy($"grp")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, o_custkey, o_orderkey % 1000 AS bucket1k
          FROM orders),
        slices AS (
          SELECT 'by_key' AS grp, o_custkey FROM o WHERE o_orderkey <= 30000
          UNION ALL
          SELECT 'by_bucket', o_custkey FROM o WHERE bucket1k BETWEEN 100 AND 199
          UNION ALL
          SELECT 'both', o_custkey FROM o
          WHERE o_orderkey > 30000 AND bucket1k < 50)
        SELECT grp, COUNT(*) AS n,
               CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
        FROM slices GROUP BY 1 ORDER BY grp
      """)),
    // ----------------------------------------------------------------
    // CHECK constraints — write-time data-quality enforcement as a
    // table property: after ADD CONSTRAINT, a valid insert lands, a
    // violating insert fails IN-PLAN and commits nothing (the caught
    // exception leaves the version count unchanged — a half-applied
    // batch would change the sums), and after DROP the same rows land.
    // The oracle replays the surviving set as plain SQL; an enforcement
    // leak in either direction (violating rows committed, or valid rows
    // blocked) breaks the groups.
    Q(
      "q294_check_constraints",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey", lit("base").as("ver"))
        val root = java.nio.file.Files.createTempDirectory("graft-ck").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o.repartitionByRange(8, $"o_orderkey"),
          statsColumn = Some("o_orderkey"))
        s.sql("DROP TABLE IF EXISTS g294_ck")
        s.sql(s"CREATE TABLE g294_ck USING `graft-snapshot` OPTIONS (path '$root')")
        try {
          s.sql("ALTER TABLE g294_ck ADD CONSTRAINT key_pos CHECK (o_orderkey >= 0)")
          s.sql("""INSERT INTO g294_ck
            SELECT o_orderkey + 300000000, o_custkey, 'ok'
            FROM g294_ck WHERE o_orderkey % 100 = 5""")
          val vOk = store.latestVersion.get
          try {
            s.sql("""INSERT INTO g294_ck
              SELECT -o_orderkey - 1, o_custkey, 'bad'
              FROM g294_ck WHERE o_orderkey % 100 = 7""")
          } catch { case _: Exception => () } // refused: commits nothing
          require(store.latestVersion.contains(vOk),
            "q294: a refused insert must not publish a version")
          s.sql("ALTER TABLE g294_ck DROP CONSTRAINT key_pos")
          s.sql("""INSERT INTO g294_ck
            SELECT -o_orderkey - 1, o_custkey, 'neg'
            FROM g294_ck WHERE o_orderkey % 100 = 7 AND o_orderkey >= 0""")
          store.read(s)
            .groupBy($"ver")
            .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"))
            .orderBy($"ver")
        } finally s.sql("DROP TABLE IF EXISTS g294_ck")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, o_custkey, 'base' AS ver FROM orders),
        ok AS (
          SELECT o_orderkey + 300000000 AS o_orderkey, 'ok' AS ver
          FROM o WHERE o_orderkey % 100 = 5),
        neg AS (
          -- 300000000 % 100 = 0, so the 'ok' keys stay = 5 mod 100 and
          -- only base keys land in the post-DROP negative insert
          SELECT -o_orderkey - 1 AS o_orderkey, 'neg' AS ver
          FROM o WHERE o_orderkey % 100 = 7),
        uni AS (
          SELECT o_orderkey, ver FROM o
          UNION ALL SELECT o_orderkey, ver FROM ok
          UNION ALL SELECT o_orderkey, ver FROM neg)
        SELECT ver, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM uni GROUP BY 1 ORDER BY ver
      """)),
    // ----------------------------------------------------------------
    // COLUMN MAPPING — ALTER TABLE RENAME/DROP COLUMN as O(manifest)
    // commits (Delta's 'name'-mode idea): a rename changes only the
    // logical name (zero file rewrites — writes keep storing the
    // physical name), a drop retires the physical column inside old
    // files, and RE-ADDING the dropped name maps to a FRESH physical so
    // the dropped values can never resurrect (they read back null →
    // the -1 bucket). Time travel keeps each version's own names. The
    // oracle replays the whole evolution as plain SQL; a mapping leak
    // in any direction (values lost on rename, resurrected on re-add,
    // wrong version's names) breaks a sum.
    Q(
      "q295_column_mapping",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey".as("cust"),
            ($"o_orderkey" % 7).as("flag"))
        val root = java.nio.file.Files.createTempDirectory("graft-cm").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o.repartitionByRange(4, $"o_orderkey"),
          statsColumn = Some("o_orderkey"))
        s.sql("DROP TABLE IF EXISTS g295_cm")
        s.sql(s"CREATE TABLE g295_cm USING `graft-snapshot` OPTIONS (path '$root')")
        try {
          s.sql("ALTER TABLE g295_cm RENAME COLUMN cust TO buyer")      // v1
          s.sql("""INSERT INTO g295_cm
            SELECT o_orderkey + 500000000, buyer + 1, flag
            FROM g295_cm WHERE o_orderkey % 100 = 3""")                 // v2
          s.sql("ALTER TABLE g295_cm DROP COLUMN flag")                 // v3
          s.sql("ALTER TABLE g295_cm ADD COLUMNS (flag BIGINT)")        // v4
          s.sql("""INSERT INTO g295_cm
            SELECT o_orderkey + 900000000, buyer, 99 FROM g295_cm
            WHERE o_orderkey % 100 = 9 AND o_orderkey < 500000000""")   // v5
          val live = s.table("g295_cm")
            .groupBy(lit("live").as("seg"))
            .agg(count(lit(1)).as("n"),
              sum($"buyer").as("buyer_sum"),
              sum(coalesce($"flag", lit(-1L))).as("flag_sum"))
          val v0 = s.sql("SELECT * FROM g295_cm VERSION AS OF 0")
            .groupBy(lit("v0").as("seg"))
            .agg(count(lit(1)).as("n"),
              sum($"cust").as("buyer_sum"),
              sum(coalesce($"flag", lit(-1L))).as("flag_sum"))
          // the CHANGE FEED spanning the whole evolution renders onto
          // the end-of-range shape by PHYSICAL identity: pre-rename
          // inserts surface under 'buyer' (a forked uid/buyer pair
          // would null them), and the dropped flag generation's values
          // never resurrect under the re-added column (NULL -> -1) —
          // so the insert-only feed aggregates EXACTLY like the live
          // table
          val feed = s.sql(s"SELECT * FROM table_changes('$root', -1)")
            .filter($"_change_type" === "insert")
            .groupBy(lit("feed_ins").as("seg"))
            .agg(count(lit(1)).as("n"),
              sum($"buyer").as("buyer_sum"),
              sum(coalesce($"flag", lit(-1L))).as("flag_sum"))
          feed.unionByName(live).unionByName(v0).orderBy("seg")
        } finally s.sql("DROP TABLE IF EXISTS g295_cm")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, o_custkey AS cust, o_orderkey % 7 AS flag
          FROM orders),
        ins1 AS (SELECT cust + 1 AS buyer
          FROM o WHERE o_orderkey % 100 = 3),
        ins2 AS (SELECT cust AS buyer
          FROM o WHERE o_orderkey % 100 = 9),
        live AS (
          -- base + ins1 rows: flag was dropped then re-added -> null -> -1
          SELECT cust AS buyer, -1 AS flag FROM o
          UNION ALL SELECT buyer, -1 FROM ins1
          UNION ALL SELECT buyer, 99 FROM ins2),
        agg AS (
          SELECT 'live' AS seg, COUNT(*) AS n,
                 CAST(SUM(buyer) AS BIGINT) AS buyer_sum,
                 CAST(SUM(flag) AS BIGINT) AS flag_sum
          FROM live
          UNION ALL
          SELECT 'feed_ins', COUNT(*), CAST(SUM(buyer) AS BIGINT),
                 CAST(SUM(flag) AS BIGINT)
          FROM live
          UNION ALL
          SELECT 'v0', COUNT(*), CAST(SUM(cust) AS BIGINT),
                 CAST(SUM(flag) AS BIGINT)
          FROM o)
        SELECT * FROM agg ORDER BY seg
      """)),
    // ----------------------------------------------------------------
    // SHALLOW CLONE — the zero-copy table fork (Delta's CREATE TABLE
    // SHALLOW CLONE): one manifest commit referencing the source's
    // files by absolute path, after which the two histories diverge
    // independently — the source's CoW delete rewrites ITS files while
    // the clone keeps reading the pinned originals (immutability), and
    // the clone's append never surfaces in the source. The oracle
    // replays the divergence as plain SQL; a leak in either direction
    // (shared mutation, missed fork pinning) breaks a group.
    Q(
      "q296_shallow_clone",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey")
        val rootA = java.nio.file.Files.createTempDirectory("graft-cla").toString
        val rootB = java.nio.file.Files.createTempDirectory("graft-clb").toString
        val a = new graft.etl.SnapshotStore(rootA)
        a.commitOverwrite(o.repartitionByRange(4, $"o_orderkey"),
          statsColumn = Some("o_orderkey"))
        val b = new graft.etl.SnapshotStore(rootB)
        b.cloneFrom(a) // zero-copy fork at a's latest
        // diverge: A deletes a third; B appends a shifted slice
        a.deleteWhere(s, $"o_orderkey" % 3 === 0)
        b.commitAppend(o.filter($"o_orderkey" % 100 === 7)
          .select(($"o_orderkey" + 700000000L).as("o_orderkey"), $"o_custkey"))
        def agg(df: org.apache.spark.sql.DataFrame, seg: String) =
          df.groupBy(lit(seg).as("seg"))
            .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"))
        agg(a.read(s), "a_live")
          .unionByName(agg(b.read(s), "b_live"))
          .unionByName(agg(b.read(s, Some(0L)), "b_v0"))
          .orderBy("seg")
      },
      Some("""
        WITH o AS (SELECT o_orderkey FROM orders),
        a_live AS (SELECT o_orderkey FROM o WHERE o_orderkey % 3 <> 0),
        b_live AS (
          SELECT o_orderkey FROM o
          UNION ALL
          SELECT o_orderkey + 700000000 FROM o WHERE o_orderkey % 100 = 7),
        agg AS (
          SELECT 'a_live' AS seg, COUNT(*) AS n,
                 CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM a_live
          UNION ALL
          SELECT 'b_live', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT) FROM b_live
          UNION ALL
          SELECT 'b_v0', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT) FROM o)
        SELECT * FROM agg ORDER BY seg
      """)),
    // ----------------------------------------------------------------
    // TYPE WIDENING — ALTER COLUMN TYPE as an O(manifest) commit: the
    // narrow-int generation of files upcasts at scan time (Spark's
    // parquet reader reads int32 under a BIGINT schema natively), the
    // post-widening insert carries values beyond int range, and the two
    // generations aggregate together under one logical schema. The
    // oracle replays the widened union as plain SQL; a lost upcast or a
    // truncated wide value breaks the sums.
    Q(
      "q297_type_widening",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey".cast("int").as("k"),
            $"o_custkey".cast("int").as("c"))
        val root = java.nio.file.Files.createTempDirectory("graft-tw").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o.repartitionByRange(4, $"k"),
          statsColumn = Some("k"))
        s.sql("DROP TABLE IF EXISTS g297_tw")
        s.sql(s"CREATE TABLE g297_tw USING `graft-snapshot` OPTIONS (path '$root')")
        try {
          s.sql("ALTER TABLE g297_tw ALTER COLUMN k TYPE BIGINT")
          s.sql("""INSERT INTO g297_tw
            SELECT CAST(k AS BIGINT) + 5000000000, c
            FROM g297_tw WHERE k % 100 = 3""")
          // DECIMAL widening: every file written so far stores c as
          // INT32 — the grouped sum below reads ALL pre-widening files
          // through the widened decimal column (reader upcast), plus
          // one post-widening decimal row carrying a fraction
          s.sql("ALTER TABLE g297_tw ALTER COLUMN c TYPE DECIMAL(14,2)")
          s.sql("""INSERT INTO g297_tw
            SELECT CAST(9000000001 AS BIGINT) AS k,
                   CAST(0.25 AS DECIMAL(14,2)) AS c""")
          s.table("g297_tw")
            .groupBy(when($"k" > 4000000000L, 1).otherwise(0).as("wide"))
            .agg(count(lit(1)).as("n"), sum($"k").as("key_sum"),
              sum($"c").cast("double").as("cust_sum"))
            .orderBy("wide")
        } finally s.sql("DROP TABLE IF EXISTS g297_tw")
      },
      Some("""
        WITH o AS (
          SELECT CAST(o_orderkey AS BIGINT) AS k,
                 CAST(o_custkey AS INT) AS c FROM orders),
        uni AS (
          SELECT k, CAST(c AS DECIMAL(14,2)) AS c, 0 AS wide FROM o
          UNION ALL
          SELECT k + 5000000000, CAST(c AS DECIMAL(14,2)), 1 FROM o
          WHERE k % 100 = 3
          UNION ALL
          SELECT 9000000001, CAST(0.25 AS DECIMAL(14,2)), 1)
        SELECT wide, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum,
               CAST(CAST(SUM(c) AS VARCHAR) AS DOUBLE) AS cust_sum
        FROM uni GROUP BY 1 ORDER BY wide
      """)),
    // ----------------------------------------------------------------
    // BLOOM FILE SKIPPING — point lookups and point DML on an
    // UNCLUSTERED column: uid = hash(o_orderkey) scatters across every
    // range-clustered file, so range stats can never prune it; the
    // per-file 512-byte bloom in the manifest can. The query sets the
    // property, restages via OPTIMIZE (files gain filters), runs a
    // bloom-pruned point DELETE and a point lookup, and aggregates the
    // survivors — the SPEC pins the numFiles drop, the oracle pins that
    // pruning never changed a ROW (a false-negative bloom would lose
    // the deleted row's siblings or skip a matching file).
    Q(
      "q298_bloom_skipping",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey",
            ($"o_orderkey" * 2654435761L % 1000003L).as("uid"),
            $"o_custkey")
        val root = java.nio.file.Files.createTempDirectory("graft-bl").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o.repartitionByRange(8, $"o_orderkey"),
          statsColumn = Some("o_orderkey"))
        store.setBloomFilter(Some("uid"))
        store.compactLatest(s, targetFiles = 8) // restage WITH filters
        // bloom-pruned point DML: delete one scattered uid, update another
        val del = 777L * 2654435761L % 1000003L
        val upd = 1234L * 2654435761L % 1000003L
        store.deleteWhere(s, $"uid" === del)
        store.updateWhere(s, $"uid" === upd,
          Map("o_custkey" -> lit(999999L)), mergeOnRead = true)
        val live = store.read(s)
        live.groupBy(($"o_custkey" === 999999L).cast("int").as("updated"))
          .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"))
          .orderBy("updated")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey,
                 o_orderkey * 2654435761 % 1000003 AS uid,
                 o_custkey
          FROM orders),
        del AS (SELECT 777 * 2654435761 % 1000003 AS u),
        upd AS (SELECT 1234 * 2654435761 % 1000003 AS u),
        live AS (
          SELECT o_orderkey,
                 CASE WHEN uid = (SELECT u FROM upd) THEN 1 ELSE 0 END AS updated
          FROM o WHERE uid <> (SELECT u FROM del))
        SELECT updated, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM live GROUP BY 1 ORDER BY updated
      """)),
    // ----------------------------------------------------------------
    // CONVERT FROM DELTA — the migration path off the reference's
    // actual at-rest format (its RAW zone is literal Delta Lake;
    // reference sync.py:112-114). The query fabricates a real Delta
    // table from the PUBLIC log protocol — parquet data files plus a
    // hand-written _delta_log with an add/add → add → remove history —
    // adopts it zero-copy via the read-only log replay
    // (DeltaConvert.replay → SnapshotStore.convertFromDelta), appends
    // through the adopted store, and aggregates. The oracle replays
    // the SAME reconciliation in SQL (live files = thirds 0 and 2 of
    // orders, the removed third absent, plus the post-adoption
    // append): a mis-replayed remove action, a resurrected tombstone,
    // or a mis-decoded path changes the sums.
    Q(
      "q299_delta_adoption",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey")
        val delta = java.nio.file.Files.createTempDirectory("graft-dl").toString
        def dataFile(name: String, df: org.apache.spark.sql.DataFrame): Long = {
          val stage = java.nio.file.Files.createTempDirectory("graft-dl-st")
          df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
          val ls = java.nio.file.Files.list(stage)
          val src = try {
            val it = ls.iterator()
            Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
              .find(_.getFileName.toString.endsWith(".parquet")).get
          } finally ls.close()
          val dst = java.nio.file.Paths.get(delta).resolve(name)
          java.nio.file.Files.move(src, dst)
          java.nio.file.Files.size(dst)
        }
        val s1 = dataFile("part-1.parquet", o.filter($"o_orderkey" % 3 === 0))
        val s2 = dataFile("part-2.parquet", o.filter($"o_orderkey" % 3 === 1))
        val s3 = dataFile("part-3.parquet", o.filter($"o_orderkey" % 3 === 2))
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper
        def q(x: String) = mapper.writeValueAsString(x)
        val schemaJson = s.read.parquet(s"$delta/part-1.parquet").schema.json
        def add(p: String, sz: Long) =
          s"""{"add":{"path":${q(p)},"partitionValues":{},"size":$sz,""" +
            s""""modificationTime":0,"dataChange":true}}"""
        def commit(v: Long, lines: Seq[String]): Unit = {
          val logDir = java.nio.file.Paths.get(delta).resolve("_delta_log")
          java.nio.file.Files.createDirectories(logDir)
          java.nio.file.Files.write(logDir.resolve(f"$v%020d.json"),
            lines.mkString("", "\n", "\n").getBytes("UTF-8"))
        }
        commit(0L, Seq(
          """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
          s"""{"metaData":{"id":"q299","format":{"provider":"parquet",""" +
            s""""options":{}},"schemaString":${q(schemaJson)},""" +
            s""""partitionColumns":[],"configuration":{},"createdTime":0}}""",
          add("part-1.parquet", s1), add("part-2.parquet", s2)))
        commit(1L, Seq(add("part-3.parquet", s3)))
        commit(2L, Seq(s"""{"remove":{"path":"part-2.parquet",""" +
          s""""deletionTimestamp":0,"dataChange":true}}"""))
        val store = new graft.etl.SnapshotStore(
          java.nio.file.Files.createTempDirectory("graft-dla").toString)
        store.convertFromDelta(s, delta, statsColumn = Some("o_orderkey"))
        // the adopted store is a full citizen: append lands atop v0
        store.commitAppend(o.filter($"o_orderkey" % 100 === 7)
          .select(($"o_orderkey" + 900000000L).as("o_orderkey"), $"o_custkey"))
        store.read(s)
          .groupBy(($"o_orderkey" % 3).cast("int").as("third"))
          .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"),
            sum($"o_custkey").as("cust_sum"))
          .orderBy("third")
      },
      Some("""
        WITH o AS (SELECT o_orderkey, o_custkey FROM orders),
        live AS (
          SELECT o_orderkey, o_custkey FROM o WHERE o_orderkey % 3 <> 1
          UNION ALL
          SELECT o_orderkey + 900000000, o_custkey FROM o
          WHERE o_orderkey % 100 = 7)
        SELECT CAST(o_orderkey % 3 AS INT) AS third, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
        FROM live GROUP BY 1 ORDER BY third
      """)),
    // ----------------------------------------------------------------
    // DELTA DELETION-VECTOR ADOPTION — the modern-default shape of the
    // reference's RAW zone (a Databricks DELETE/UPDATE writes DVs, not
    // rewritten files). The query fabricates a Delta table whose adds
    // carry REAL deletion vectors in both public storage forms —
    // u-storage (roaring bitmap framed in a versioned .bin with CRC)
    // and inline (Z85) — adopts it, and aggregates the LIVE rows. Row
    // order inside each data file is pinned by an explicit sort, so
    // the tombstoned POSITIONS (row indexes 0..k-1) are exactly the k
    // smallest keys of that file — which is what the oracle deletes
    // via row_number. A mis-decoded bitmap, a CRC skip, an offset
    // error, or a resurrection through the translated sidecar all
    // change the sums. Impl: etl/DeltaDv.scala + convertFromDelta's
    // sidecar translation.
    Q(
      "q300_delta_dv_adoption",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey")
        val delta = java.nio.file.Files.createTempDirectory("graft-dv").toString
        val deltaP = java.nio.file.Paths.get(delta)
        def dataFile(name: String, df: org.apache.spark.sql.DataFrame): Long = {
          val stage = java.nio.file.Files.createTempDirectory("graft-dv-st")
          // ONE partition, explicit in-file sort: row index i = the
          // i-th smallest o_orderkey — the positions the DVs tombstone
          df.repartition(1).sortWithinPartitions("o_orderkey")
            .write.mode("overwrite").parquet(stage.toString)
          val ls = java.nio.file.Files.list(stage)
          val src = try {
            val it = ls.iterator()
            Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
              .find(_.getFileName.toString.endsWith(".parquet")).get
          } finally ls.close()
          val dst = deltaP.resolve(name)
          java.nio.file.Files.move(src, dst)
          java.nio.file.Files.size(dst)
        }
        val sz1 = dataFile("even.parquet", o.filter($"o_orderkey" % 2 === 0))
        val sz2 = dataFile("odd.parquet", o.filter($"o_orderkey" % 2 === 1))
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper
        def jq(x: String) = mapper.writeValueAsString(x)
        val schemaJson = s.read.parquet(s"$delta/even.parquet").schema.json
        def add(p: String, sz: Long, dv: Option[String]) =
          s"""{"add":{"path":${jq(p)},"partitionValues":{},"size":$sz,""" +
            s""""modificationTime":0,"dataChange":true""" +
            dv.map(d => s""","deletionVector":$d""").getOrElse("") + "}}"
        def commit(v: Long, lines: Seq[String]): Unit = {
          val logDir = deltaP.resolve("_delta_log")
          java.nio.file.Files.createDirectories(logDir)
          java.nio.file.Files.write(logDir.resolve(f"$v%020d.json"),
            lines.mkString("", "\n", "\n").getBytes("UTF-8"))
        }
        commit(0L, Seq(
          """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
            """"readerFeatures":["deletionVectors"],""" +
            """"writerFeatures":["deletionVectors"]}}""",
          s"""{"metaData":{"id":"q300","format":{"provider":"parquet",""" +
            s""""options":{}},"schemaString":${jq(schemaJson)},""" +
            s""""partitionColumns":[],"configuration":{},"createdTime":0}}""",
          add("even.parquet", sz1, None), add("odd.parquet", sz2, None)))
        // the DELETE: u-storage DV kills the 7 smallest even keys,
        // inline DV kills the 5 smallest odd keys
        val (up, uo, us, uc) = graft.etl.DeltaDv.writeUuidFile(
          deltaP, (0L until 7L).toArray)
        val (ip, is, ic) = graft.etl.DeltaDv.inlineDescriptor(
          (0L until 5L).toArray)
        commit(1L, Seq(
          add("even.parquet", sz1, Some(
            s"""{"storageType":"u","pathOrInlineDv":"$up","offset":$uo,""" +
              s""""sizeInBytes":$us,"cardinality":$uc}""")),
          add("odd.parquet", sz2, Some(
            s"""{"storageType":"i","pathOrInlineDv":"$ip",""" +
              s""""sizeInBytes":$is,"cardinality":$ic}"""))))
        val store = new graft.etl.SnapshotStore(
          java.nio.file.Files.createTempDirectory("graft-dva").toString)
        store.convertFromDelta(s, delta, statsColumn = Some("o_orderkey"))
        store.read(s)
          .groupBy(($"o_orderkey" % 2).cast("int").as("parity"))
          .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"),
            min($"o_orderkey").as("key_min"))
          .orderBy("parity")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, o_custkey,
                 row_number() OVER (PARTITION BY o_orderkey % 2
                                    ORDER BY o_orderkey) AS rn
          FROM orders),
        live AS (
          SELECT * FROM o
          WHERE NOT (o_orderkey % 2 = 0 AND rn <= 7)
            AND NOT (o_orderkey % 2 = 1 AND rn <= 5))
        SELECT CAST(o_orderkey % 2 AS INT) AS parity, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               MIN(o_orderkey) AS key_min
        FROM live GROUP BY 1 ORDER BY parity
      """)),
    // ----------------------------------------------------------------
    // DELTA EXPORT ROUND TRIP — the write-side interop: the snapshot
    // store's history (overwrite → MoR DELETE with a native DV →
    // RENAME under column mapping) exports as a stock _delta_log
    // beside its own manifests (exportToDelta), and the exported table
    // is then re-adopted through the public-protocol replay into a
    // SECOND store that computes the answer. The chain proves the
    // exported log carries the DV (as a roaring descriptor), the
    // mapping (name-mode field metadata), and the live file set —
    // a drop anywhere (a tombstone lost in export, a physical name
    // misbound, a stale file left live) changes the result. Impl:
    // etl/DeltaExport.scala + SnapshotStore.exportToDelta.
    Q(
      "q301_delta_export_roundtrip",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey")
        val root = java.nio.file.Files.createTempDirectory("graft-dxp").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o.repartitionByRange(4, $"o_orderkey"),
          statsColumn = Some("o_orderkey"))
        store.deleteWhere(s, $"o_orderkey" % 7 === 3L, mergeOnRead = true)
        store.renameColumn(s, "o_custkey", "cust")
        store.exportToDelta(s)
        val adopted = new graft.etl.SnapshotStore(
          java.nio.file.Files.createTempDirectory("graft-dxa").toString)
        adopted.convertFromDelta(s, root, statsColumn = Some("o_orderkey"))
        adopted.read(s)
          .groupBy(($"o_orderkey" % 4).cast("int").as("q"))
          .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"),
            sum($"cust").as("cust_sum"))
          .orderBy("q")
      },
      Some("""
        SELECT CAST(o_orderkey % 4 AS INT) AS q, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
        FROM orders WHERE o_orderkey % 7 <> 3
        GROUP BY 1 ORDER BY q
      """)),
    // ----------------------------------------------------------------
    // DELTA ID-MODE ADOPTION — columnMapping.mode=id resolves parquet
    // columns by FIELD ID, not by name. The query fabricates an
    // id-mode table whose data file stores columns named like NEITHER
    // the logical nor the physical names (only the parquet field ids,
    // written by Spark's own fieldId.write path, identify them),
    // adopts it, and aggregates — a name-resolved scan would read
    // all-NULL columns and zero every sum. Impl: DeltaConvert.replay
    // (delta.columnMapping.id → parquet.field.id metadata) + Spark's
    // native spark.sql.parquet.fieldId.read path.
    Q(
      "q302_delta_idmode_adoption",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.types.MetadataBuilder
        val o = graft.Tables.load(s, dir, "orders")
        def fid(id: Long) =
          new MetadataBuilder().putLong("parquet.field.id", id).build()
        val delta = java.nio.file.Files.createTempDirectory("graft-idm").toString
        val deltaP = java.nio.file.Paths.get(delta)
        val stage = java.nio.file.Files.createTempDirectory("graft-idm-st")
        o.select($"o_orderkey".as("zz_key", fid(1L)),
            $"o_custkey".as("zz_cust", fid(2L)))
          .repartition(1).write.mode("overwrite").parquet(stage.toString)
        val ls = java.nio.file.Files.list(stage)
        val src = try {
          val it = ls.iterator()
          Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
            .find(_.getFileName.toString.endsWith(".parquet")).get
        } finally ls.close()
        java.nio.file.Files.move(src, deltaP.resolve("d0.parquet"))
        val sz = java.nio.file.Files.size(deltaP.resolve("d0.parquet"))
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper
        def jq(x: String) = mapper.writeValueAsString(x)
        def mappedField(name: String, phys: String, id: Long, dt: String) =
          org.apache.spark.sql.types.StructField(name,
            org.apache.spark.sql.types.DataType.fromDDL(dt),
            nullable = true, new MetadataBuilder()
              .putLong("delta.columnMapping.id", id)
              .putString("delta.columnMapping.physicalName", phys).build())
        val logical = org.apache.spark.sql.types.StructType(Seq(
          mappedField("o_orderkey", "col-k", 1L, "BIGINT"),
          mappedField("o_custkey", "col-c", 2L, "BIGINT")))
        val logDir = deltaP.resolve("_delta_log")
        java.nio.file.Files.createDirectories(logDir)
        java.nio.file.Files.write(logDir.resolve(f"${0L}%020d.json"), Seq(
          """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
          s"""{"metaData":{"id":"q302","format":{"provider":"parquet",""" +
            s""""options":{}},"schemaString":${jq(logical.json)},""" +
            s""""partitionColumns":[],"configuration":{""" +
            s""""delta.columnMapping.mode":"id",""" +
            s""""delta.columnMapping.maxColumnId":"2"},"createdTime":0}}""",
          s"""{"add":{"path":"d0.parquet","partitionValues":{},""" +
            s""""size":$sz,"modificationTime":0,"dataChange":true}}""")
          .mkString("", "\n", "\n").getBytes("UTF-8"))
        val store = new graft.etl.SnapshotStore(
          java.nio.file.Files.createTempDirectory("graft-idm-a").toString)
        store.convertFromDelta(s, delta)
        store.read(s)
          .groupBy(($"o_orderkey" % 5).cast("int").as("bucket"))
          .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"),
            sum($"o_custkey").as("cust_sum"))
          .orderBy("bucket")
      },
      Some("""
        SELECT CAST(o_orderkey % 5 AS INT) AS bucket, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
        FROM orders GROUP BY 1 ORDER BY bucket
      """)),
    // ----------------------------------------------------------------
    // DELTA CHANGE-DATA-FEED EXPORT — the store's feed as stock Delta
    // CDF: two successive MERGE-ON-READ deletes export `cdc` actions
    // whose `_change_data/` files a stock CDF reader would consume.
    // The second delete GROWS the same files' deletion vectors, so its
    // cdc file must hold ONLY the diff (the newly-dead rows), not the
    // whole vector — re-emitting already-dead rows doubles the first
    // bucket's sums. The query reads the exported cdc parquet straight
    // off disk (no store API in the read path) and aggregates per
    // commit. Impl: SnapshotStore.{exportToDelta,writeCdcFiles} +
    // DeltaExport.cdcLine.
    Q(
      "q303_delta_cdf_export",
      (s, dir) => {
        import s.implicits._
        val o = graft.Tables.load(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey")
        val root = java.nio.file.Files.createTempDirectory("graft-cdf").toString
        val store = new graft.etl.SnapshotStore(root)
        store.commitOverwrite(o.repartitionByRange(4, $"o_orderkey"),
          statsColumn = Some("o_orderkey"))                       // v0
        store.deleteWhere(s, $"o_orderkey" % 9 === 4L, mergeOnRead = true)
        store.deleteWhere(s, $"o_orderkey" % 9 === 7L, mergeOnRead = true)
        store.exportToDelta(s, changeDataFeed = true)
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper
        val logDir = java.nio.file.Paths.get(root).resolve("_delta_log")
        def cdcPaths(v: Long): Seq[String] = {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.readAllLines(logDir.resolve(f"$v%020d.json"))
            .asScala.toSeq
            .flatMap(l => Option(mapper.readTree(l).get("cdc"))
              .map(n => s"$root/${n.get("path").asText()}"))
        }
        Seq(1L, 2L).map { v =>
          s.read.parquet(cdcPaths(v): _*)
            .filter($"_change_type" === "delete")
            .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"))
            .select(lit(v).cast("int").as("commit_v"), $"n", $"key_sum",
              lit("delete").as("change_type"))
        }.reduce(_.unionByName(_)).orderBy("commit_v")
      },
      Some("""
        SELECT 1 AS commit_v, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               'delete' AS change_type
        FROM orders WHERE o_orderkey % 9 = 4
        UNION ALL
        SELECT 2, COUNT(*), CAST(SUM(o_orderkey) AS BIGINT), 'delete'
        FROM orders WHERE o_orderkey % 9 = 7
        ORDER BY commit_v
      """))
  )
}
