package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Dedup, Similarity, TextAnalysis, TextHash}
import Q._

/** Training-data pipeline operators as oracle-checked queries: dedup
  * (exact / latest / MinHash-LSH / SimHash / n-gram Jaccard / embedding
  * near-dup), similarity search, text analysis. The DuckDB oracles
  * REPLICATE each algorithm (same md5-derived hashes, same fold order),
  * so they verify the implementation itself, not just plausibility.
  */
object Ext {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // DuckDB formula fragments live ONCE in OracleSql; these are local names.
  private def hSql(seed: String, v: String): String = OracleSql.hash64(seed, v)
  private val toksSql = OracleSql.tokens("text")
  private val shinglesSql = OracleSql.wordShingles3("text")

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q33_dedup_exact",
      (s, dir) => {
        import s.implicits._
        Dedup.exact(t(s, dir, "documents"), $"text", $"doc_id")
          .orderBy($"keep_id")
      },
      Some("""
        SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        FROM documents GROUP BY 1 ORDER BY keep_id
      """)),
    // ----------------------------------------------------------------
    Q(
      "q34_dedup_latest",
      (s, dir) => {
        import s.implicits._
        Dedup.latestByKey(t(s, dir, "events"), $"user_id", $"ts", $"event_id")
          .select($"user_id", $"event_id", tstr($"ts").as("latest_ts"))
          .orderBy($"user_id")
      },
      Some("""
        SELECT user_id, event_id,
               strftime(us_ts, '%Y-%m-%d %H:%M:%S') AS latest_ts
        FROM (
          SELECT user_id, event_id, us_ts,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY us_ts DESC, event_id) AS rn
          -- truncate to microseconds: the engine reads parquet NANOS as µs
          FROM (SELECT *, make_timestamp(epoch_ns(ts) // 1000) AS us_ts FROM events)
        ) WHERE rn = 1
        ORDER BY user_id
      """)),
    // ----------------------------------------------------------------
    Q(
      "q35_dedup_minhash_lsh",
      (s, dir) => {
        import s.implicits._
        Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
          shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.5)
          .orderBy($"id_a", $"id_b")
      },
      Some {
        val params = TextHash.minhashParams(16)
        val seedRows = params.zipWithIndex
          .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
        s"""
        WITH sh AS (SELECT doc_id,
                      list_distinct(list_transform($shinglesSql,
                        g -> ${hSql("'0'", "g")} % 2147483647)) AS shingles
                    FROM documents),
        post AS (SELECT doc_id, unnest(shingles) AS h FROM sh),
        sig AS (
          SELECT doc_id, s.seed, MIN((h * s.a + s.b) % 2147483647) AS mh
          FROM post CROSS JOIN (VALUES $seedRows) s(seed, a, b)
          GROUP BY 1, 2),
        sigarr AS (SELECT doc_id, list(mh ORDER BY seed) AS sig FROM sig GROUP BY 1),
        bandkey AS (
          SELECT doc_id,
                 CAST(b AS VARCHAR) || '_' || CAST(sig[2*b+1] AS VARCHAR) || '_' ||
                 CAST(sig[2*b+2] AS VARCHAR) AS key
          FROM sigarr CROSS JOIN (SELECT unnest(range(0, 8)) AS b)),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bandkey a JOIN bandkey b ON a.key = b.key AND a.doc_id < b.doc_id)
        SELECT id_a, id_b,
               CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
               CAST(len(sa.shingles) + len(sb.shingles)
                    - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) AS jaccard
        FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
              CAST(len(sa.shingles) + len(sb.shingles)
                   - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) >= 0.5
        ORDER BY id_a, id_b
      """
      }),
    // ----------------------------------------------------------------
    Q(
      "q36_dedup_simhash",
      (s, dir) => {
        import s.implicits._
        Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""
        WITH tok AS (SELECT doc_id, unnest($toksSql) AS tk FROM documents),
        th AS (SELECT doc_id, ${hSql("'0'", "tk")} AS h FROM tok),
        bits AS (
          SELECT doc_id, j,
                 SUM(CASE WHEN (h >> CAST(j AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS wt
          FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS j)
          GROUP BY 1, 2),
        simh AS (
          SELECT doc_id,
                 SUM(CASE WHEN wt > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER))
                          ELSE 0 END) AS sim
          FROM bits GROUP BY 1),
        chunked AS (
          SELECT doc_id, sim, c,
                 (sim >> CAST(c * 16 AS INTEGER)) & 65535 AS v
          FROM simh CROSS JOIN (SELECT unnest(range(0, 4)) AS c)),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                          a.sim AS sim_a, b.sim AS sim_b
          FROM chunked a JOIN chunked b
            ON a.c = b.c AND a.v = b.v AND a.doc_id < b.doc_id)
        SELECT id_a, id_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
        ORDER BY id_a, id_b
      """)),
    // ----------------------------------------------------------------
    Q(
      "q37_dedup_ngram_jaccard",
      (s, dir) => {
        import s.implicits._
        Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
          shingleSize = 3, threshold = 0.6)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""
        WITH sh AS (SELECT doc_id,
                      list_distinct(list_transform($shinglesSql,
                        g -> ${hSql("'0'", "g")} % 2147483647)) AS shingles
                    FROM documents),
        post AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
        sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
               CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
        FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.6
        ORDER BY id_a, id_b
      """)),
    // ----------------------------------------------------------------
    // The production composition (BASELINE.md scale-up table): exact
    // dedup collapses identical docs BEFORE the quadratic Jaccard pass.
    Q(
      "q64_dedup_canonical_neardup",
      (s, dir) => {
        import s.implicits._
        Dedup.nearDupCanonical(t(s, dir, "documents"), "doc_id", "text",
          shingleSize = 3, threshold = 0.6)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""
        WITH canon AS (
          SELECT MIN(doc_id) AS doc_id, MIN(text) AS text, COUNT(*) AS n_copies
          FROM documents GROUP BY md5(text)),
        sh AS (SELECT doc_id,
                 list_distinct(list_transform($shinglesSql,
                   g -> ${hSql("'0'", "g")} % 2147483647)) AS shingles
               FROM canon),
        post AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
        sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT id_a, id_b,
                 CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
          FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
          WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.6)
        SELECT id_a, id_b, jaccard, ca.n_copies AS copies_a, cb.n_copies AS copies_b
        FROM pairs JOIN canon ca ON ca.doc_id = id_a JOIN canon cb ON cb.doc_id = id_b
        ORDER BY id_a, id_b
      """)),
    // ----------------------------------------------------------------
    Q(
      "q38_embedding_neardup",
      (s, dir) => {
        import s.implicits._
        Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.4, tables = 4, planes = 6)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""
        WITH ${OracleSql.embeddingBuckets(4, 6)},
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
                          a.vec AS vec_a, b.vec AS vec_b
          FROM buck a JOIN buck b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
        SELECT id_a, id_b, ${OracleSql.cosine("vec_a", "vec_b")} AS cos
        FROM cand
        WHERE ${OracleSql.cosine("vec_a", "vec_b")} >= 0.4
        ORDER BY id_a, id_b
      """)),
    // ----------------------------------------------------------------
    Q(
      "q39_ann_topk",
      (s, dir) => {
        import s.implicits._
        Similarity.bruteForceTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
          queryId = 0L, k = 10)
      },
      Some(s"""
        WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                   FROM embeddings),
        q AS (SELECT vec AS q_vec FROM v WHERE vec_id = 0)
        SELECT vec_id AS neighbor_id, ${OracleSql.cosine("vec", "q_vec")} AS cos
        FROM v CROSS JOIN q
        WHERE vec_id <> 0
        ORDER BY cos DESC, neighbor_id
        LIMIT 10
      """)),
    // ----------------------------------------------------------------
    Q(
      "q40_lang_id",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"lang", TextAnalysis.langId($"text").as("predicted"))
          .groupBy($"lang", $"predicted")
          .agg(count(lit(1)).as("n"))
          .orderBy($"lang", $"predicted")
      },
      Some {
        val langs = TextAnalysis.stopwords.keys.toSeq.sorted
        val ratios = langs.map { l =>
          val words = TextAnalysis.stopwords(l).map(w => s"'$w'").mkString(",")
          s"CAST(len(list_filter($toksSql, x -> lower(x) IN ($words))) AS DOUBLE) / " +
            s"CAST(greatest(len($toksSql), 1) AS DOUBLE) AS r_$l"
        }.mkString(", ")
        // argmax with max-struct semantics: ties go to the LAST lang in
        // lexicographic order (matches array_max over (ratio, lang) structs)
        val revLangs = langs.reverse
        val caseChain = revLangs.map(l => s"WHEN r_$l = best THEN '$l'").mkString(" ")
        s"""
        SELECT lang, predicted, COUNT(*) AS n FROM (
          SELECT lang,
                 CASE WHEN best = 0.0 THEN 'und' $caseChain END AS predicted
          FROM (SELECT lang, ${langs.map(l => s"r_$l").mkString(", ")},
                       greatest(${langs.map(l => s"r_$l").mkString(", ")}) AS best
                FROM (SELECT lang, $ratios FROM documents)))
        GROUP BY lang, predicted
        ORDER BY lang, predicted
        """
      }),
    // ----------------------------------------------------------------
    Q(
      "q41_text_quality",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select(
            $"doc_id",
            TextAnalysis.tokenCount($"text").as("n_tokens"),
            TextAnalysis.subwordCountEstimate($"text").as("n_subwords"),
            TextAnalysis.qualityScore($"text").as("quality"))
          .orderBy($"doc_id")
      },
      Some(s"""
        SELECT doc_id,
               CAST(len($toksSql) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(string_split_regex(text, '[^A-Za-z0-9]+'), x -> x <> '')) AS BIGINT)
                 + CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT)
                 + CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform($toksSql,
                       t -> CASE WHEN length(t) > 4
                                 THEN CAST(floor((length(t) - 1) / 4.0) AS BIGINT)
                                 ELSE 0 END)), (a, x) -> a + x) AS BIGINT) AS n_subwords,
               -- every literal CAST to DOUBLE: DuckDB otherwise computes
               -- 0.4/0.2/... in exact DECIMAL and the ulps diverge
               CAST(CASE WHEN length(text) >= 200 AND length(text) <= 20000 THEN 1.0
                     WHEN length(text) >= 50 THEN 0.5 ELSE 0.0 END AS DOUBLE) * CAST(0.4 AS DOUBLE)
               + CAST(CASE WHEN CAST(length(text) AS DOUBLE) / CAST(greatest(len($toksSql), 1) AS DOUBLE)
                            BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END AS DOUBLE) * CAST(0.2 AS DOUBLE)
               + (CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
                  / greatest(CAST(length(text) AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.3 AS DOUBLE)
               + (CAST(1.0 AS DOUBLE) - CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                  / greatest(CAST(length(text) AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.1 AS DOUBLE) AS quality
        FROM documents
        ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    Q(
      "q42_fingerprint",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
          .orderBy($"doc_id")
      },
      Some(s"""
        SELECT doc_id,
               (SELECT MIN(${hSql("'0'", "g")})
                FROM (SELECT unnest(CASE WHEN length(text) >= 8 THEN
                        list_distinct(list_transform(range(1, length(text) - 6),
                          i -> substr(text, CAST(i AS INTEGER), 8)))
                      ELSE [] END) AS g)) AS fp
        FROM documents
        ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Redaction scrub: URL/email/phone → typed placeholders, whitespace
    // collapsed. Pure regexp chain in the scan stage; the patterns are
    // constructs Java regex and DuckDB's RE2 evaluate identically.
    Q(
      "q65_scrub_redact",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select($"doc_id", TextAnalysis.scrub($"text").as("clean"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               trim(regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
                   '\+?[0-9][0-9() .-]{7,}[0-9]', '<PHONE>', 'g'),
                 '\s+', ' ', 'g')) AS clean
        FROM documents
        ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // As-of join via the union-window algorithm (AsOf.join): one shuffle
    // on the key, no range join, no pair explosion. The oracle uses
    // DuckDB's NATIVE `ASOF LEFT JOIN` — an independent implementation
    // of the same point-in-time semantics, not a replica of ours.
    Q(
      "q66_asof_join",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val clicks = ev.filter($"event_type" === "click")
          .select($"event_id", $"user_id", $"ts")
        // one row per (user_id, ts): AsOf.join's determinism precondition
        val views = ev.filter($"event_type" === "view")
          .groupBy($"user_id", $"ts").agg(max($"value").as("view_value"))
        graft.ext.AsOf.join(clicks, views, Seq("user_id"), "ts", "ts", Seq("view_value"))
          .select($"event_id", $"user_id", tstr($"ts").as("click_ts"),
            $"view_value_asof".as("last_view_value"))
          .orderBy($"event_id")
      },
      Some("""
        WITH e AS (SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
                          event_type, value FROM events),
        clicks AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'),
        views AS (SELECT user_id, ts, MAX(value) AS view_value FROM e
                  WHERE event_type = 'view' GROUP BY 1, 2)
        SELECT c.event_id, c.user_id, strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
               v.view_value AS last_view_value
        FROM clicks c ASOF LEFT JOIN views v
          ON c.user_id = v.user_id AND c.ts >= v.ts
        ORDER BY c.event_id
      """)),
    // ----------------------------------------------------------------
    // Forward as-of: the NEXT view at-or-after each click (follow-up
    // attribution). Same union-window plan walking time backwards;
    // DuckDB's native ASOF with <= is the independent oracle.
    Q(
      "q113_asof_forward",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val clicks = ev.filter($"event_type" === "click")
          .select($"event_id", $"user_id", $"ts")
        val views = ev.filter($"event_type" === "view")
          .groupBy($"user_id", $"ts").agg(max($"value").as("view_value"))
        graft.ext.AsOf.join(clicks, views, Seq("user_id"), "ts", "ts",
            Seq("view_value"), direction = "forward")
          .select($"event_id", $"user_id", tstr($"ts").as("click_ts"),
            $"view_value_asof".as("next_view_value"))
          .orderBy($"event_id")
      },
      Some("""
        WITH e AS (SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
                          event_type, value FROM events),
        clicks AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'),
        views AS (SELECT user_id, ts, MAX(value) AS view_value FROM e
                  WHERE event_type = 'view' GROUP BY 1, 2)
        SELECT c.event_id, c.user_id, strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
               v.view_value AS next_view_value
        FROM clicks c ASOF LEFT JOIN views v
          ON c.user_id = v.user_id AND c.ts <= v.ts
        ORDER BY c.event_id
      """)),
    // ----------------------------------------------------------------
    // Column profiler: one scan, one aggregation (multi-distinct via a
    // single Expand) — the per-load data-quality snapshot. Exact
    // distincts here (oracle-checkable); approxDistinct=true is the
    // 100 TB mode.
    Q(
      "q67_column_profile",
      (s, dir) => {
        import s.implicits._
        graft.ext.Profile.profile(t(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
          .orderBy($"col_name")
      },
      Some {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
        cols.map { c =>
          s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows, COUNT($c) AS n_nonnull,
             |       COUNT(DISTINCT $c) AS n_distinct,
             |       CAST(MIN($c) AS VARCHAR) AS min_val, CAST(MAX($c) AS VARCHAR) AS max_val
             |FROM orders""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      }),
    // ----------------------------------------------------------------
    // Deterministic stratified sampling: membership is a pure function
    // of the key (md5 bucket), so the training mix reproduces exactly
    // across runs/engines — df.sample()'s per-partition RNG does not.
    Q(
      "q68_hash_sample",
      (s, dir) => {
        import s.implicits._
        graft.ext.Sampling.hashSampleBy(t(s, dir, "documents"),
          $"doc_id", $"lang", Map("en" -> 0.5), default = 0.1)
          .select($"doc_id", $"lang")
          .orderBy($"doc_id")
      },
      Some(s"""
        SELECT doc_id, lang FROM documents
        WHERE ${hSql("'0'", "CAST(doc_id AS VARCHAR)")} % 10000
              < CASE WHEN lang = 'en' THEN 5000 ELSE 1000 END
        ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Within-doc repetition fractions (template/spam signal): pure
    // codegen collection ops in the scan stage, no shuffle.
    Q(
      "q69_repetition",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents").select(
          $"doc_id",
          TextAnalysis.dupTokenFraction($"text").as("dup_token_frac"),
          TextAnalysis.dupBigramFraction($"text").as("dup_bigram_frac"))
          .orderBy($"doc_id")
      },
      Some(s"""
        SELECT doc_id,
          CASE WHEN len(toks) > 0 THEN CAST(1.0 AS DOUBLE)
                 - CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
               ELSE CAST(0.0 AS DOUBLE) END AS dup_token_frac,
          CASE WHEN len(bi) > 0 THEN CAST(1.0 AS DOUBLE)
                 - CAST(len(list_distinct(bi)) AS DOUBLE) / CAST(len(bi) AS DOUBLE)
               ELSE CAST(0.0 AS DOUBLE) END AS dup_bigram_frac
        FROM (
          SELECT doc_id, toks,
                 CASE WHEN len(toks) >= 2 THEN
                   list_transform(range(1, len(toks)),
                     i -> ${hSql("'0'", "array_to_string(list_slice(toks, i, i + 1), ' ')")})
                 ELSE [] END AS bi
          FROM (SELECT doc_id, $toksSql AS toks FROM documents))
        ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Grouped top-k as a bounded-heap AGGREGATE (TopKPairs): map-side
    // partial k-heaps mean the shuffle carries <=k pairs per (key,
    // task), where the window formulation shuffles every row. The
    // oracle is the window formulation — same semantics, different
    // physical plan.
    Q(
      "q70_grouped_topk",
      (s, dir) => {
        import s.implicits._
        graft.functions.TopK.perKey(
          t(s, dir, "orders"), Seq("o_orderpriority"),
          $"o_totalprice", $"o_orderkey", k = 3)
          .select($"o_orderpriority", $"rank",
            $"id".as("o_orderkey"), $"score".as("o_totalprice"))
          .orderBy($"o_orderpriority", $"rank")
      },
      Some("""
        SELECT o_orderpriority, rank, o_orderkey, o_totalprice FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank
          FROM orders)
        WHERE rank <= 3
        ORDER BY o_orderpriority, rank
      """)),
    // ----------------------------------------------------------------
    // Decontamination: overlap of each training doc's shingles with the
    // "benchmark" split (doc_id % 50 == 0 here) — inverted-index
    // semi-join, no doc-pair space.
    Q(
      "q71_decontamination",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        Dedup.contamination(
          docs.filter($"doc_id" % 50 =!= 0), docs.filter($"doc_id" % 50 === 0),
          "doc_id", "text", shingleSize = 3)
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH sh AS (SELECT doc_id,
                      list_distinct(list_transform($shinglesSql,
                        g -> ${hSql("'0'", "g")} % 2147483647)) AS sh
                    FROM documents),
        tr AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
        bench AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 50 = 0),
        ov AS (
          SELECT doc_id, COUNT(*) AS n_overlap
          FROM (SELECT doc_id, unnest(sh) AS g FROM tr) p JOIN bench USING (g)
          GROUP BY 1)
        SELECT tr.doc_id, len(sh) AS n_shingles,
               COALESCE(n_overlap, 0) AS n_overlap,
               CASE WHEN len(sh) > 0
                    THEN CAST(COALESCE(n_overlap, 0) AS DOUBLE) / CAST(len(sh) AS DOUBLE)
                    ELSE CAST(0.0 AS DOUBLE) END AS overlap_frac
        FROM tr LEFT JOIN ov USING (doc_id)
        ORDER BY tr.doc_id
      """)),
    // ----------------------------------------------------------------
    // Disjoint deterministic train/val/test split: consecutive bucket
    // ranges guarantee every row lands in exactly one split.
    Q(
      "q72_hash_split",
      (s, dir) => {
        import s.implicits._
        graft.ext.Sampling.hashSplit(t(s, dir, "documents"), $"doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .groupBy($"split").agg(count(lit(1)).as("n"))
          .orderBy($"split")
      },
      Some(s"""
        SELECT CASE WHEN bkt < 8000 THEN 'train'
                    WHEN bkt < 9000 THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS n
        FROM (SELECT ${hSql("'0'", "CAST(doc_id AS VARCHAR)")} % 10000 AS bkt
              FROM documents)
        GROUP BY 1 ORDER BY split
      """)),
    // ----------------------------------------------------------------
    // Large×large interval join via bucketing (Ranges.pointInInterval):
    // the oracle is the PLAIN theta join — bucketing must be invisible.
    Q(
      "q73_interval_join",
      (s, dir) => {
        import s.implicits._
        val pts = t(s, dir, "orders").select($"o_orderkey", $"o_totalprice")
        val iv = t(s, dir, "lineitem")
          .select($"l_extendedprice".as("lo"), ($"l_extendedprice" + 10.0).as("hi"))
        // width ≈ 2× the interval span (10): ≤2 buckets per interval,
        // and each point's bucket holds ~30/100000 of the intervals
        graft.ext.Ranges.pointInInterval(pts, "o_totalprice", iv, "lo", "hi",
          bucketWidth = 20.0)
          .groupBy($"o_orderkey").agg(count(lit(1)).as("n_containing"))
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey, COUNT(*) AS n_containing
        FROM orders JOIN lineitem
          ON o_totalprice >= l_extendedprice AND o_totalprice <= l_extendedprice + 10.0
        GROUP BY o_orderkey
        ORDER BY o_orderkey
      """))
  )
}
