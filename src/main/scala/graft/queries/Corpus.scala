package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Dedup, Dsir, LangModel, Linkage, TextAnalysis}
import graft.functions.LinkageFunctions
import Q._

/** Round-11 corpus-curation surface: the two classic web-corpus
  * stages the catalog lacked — corpus-frequency boilerplate removal
  * (RefinedWeb/C4 "repeated line" filtering) and CCNet-style
  * per-language LM quality bucketing.
  */
object Corpus {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** DuckDB replica of TextHash.tokens. */
  private def toksSql(c: String) = OracleSql.tokens(c)

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // Corpus-frequent chunk removal: segment every document into
    // 8-token chunks, count each chunk's document frequency across the
    // whole corpus, drop chunks appearing in >= 3 distinct documents,
    // recompose. The Spark plan keys the df aggregate + join by the
    // 60-bit chunk hash (8-byte shuffle keys); the oracle groups by
    // the chunk STRING itself — identical semantics (the hash is
    // injective on this corpus; production keeps the hash because text
    // must not ride the df shuffle at 100 TB).
    Q(
      "q265_chunk_boilerplate",
      (s, dir) => {
        import s.implicits._
        Dedup.frequentChunkFilter(
            t(s, dir, "documents"), "doc_id", "text",
            chunkTokens = 8, maxDf = 3)
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH tok AS (
          SELECT doc_id, w, i FROM (
            SELECT doc_id, unnest(toks) AS w,
                   unnest(range(1, len(toks) + 1)) AS i
            FROM (SELECT doc_id, ${toksSql("text")} AS toks FROM documents))),
        ch AS (
          SELECT doc_id, (i - 1) // 8 AS cidx,
                 string_agg(w, ' ' ORDER BY i) AS chunk
          FROM tok GROUP BY doc_id, (i - 1) // 8),
        d AS (SELECT chunk, COUNT(DISTINCT doc_id) AS df FROM ch GROUP BY chunk)
        SELECT ch.doc_id, COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN d.df >= 3 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dropped,
               COALESCE(string_agg(CASE WHEN d.df < 3 THEN ch.chunk END,
                                   ' ' ORDER BY ch.cidx), '') AS kept_text
        FROM ch JOIN d USING (chunk)
        GROUP BY ch.doc_id ORDER BY ch.doc_id
      """)),
    // ----------------------------------------------------------------
    // CCNet-style per-language quality terciles: an add-one-smoothed
    // unigram LM is trained per language on the trusted slice (sources
    // src0-src4, the "Wikipedia" proxy), every document is scored by
    // its mean token probability in exact integer ppb, and each
    // language's docs are ntile(3)-bucketed — bucket 1 is the "head"
    // CCNet keeps. Ties (same mean) break by doc_id in both engines.
    Q(
      "q266_lm_quality_buckets",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val train = docs.filter(
          $"source".isin("src0", "src1", "src2", "src3", "src4"))
        LangModel.unigramQualityBuckets(
            train, docs, $"doc_id", $"text", $"lang", nBuckets = 3)
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH tr AS (
          SELECT lang, unnest(${toksSql("text")}) AS w FROM documents
          WHERE source IN ('src0','src1','src2','src3','src4')),
        c AS (SELECT lang, w, COUNT(*) AS c FROM tr GROUP BY lang, w),
        nv AS (SELECT lang, COUNT(*) AS n, COUNT(DISTINCT w) AS v
               FROM tr GROUP BY lang),
        tok AS (SELECT doc_id, lang, unnest(${toksSql("text")}) AS w
                FROM documents),
        p AS (
          SELECT tok.doc_id, tok.lang,
                 (COALESCE(c.c, 0) + 1) * 1000000000 // (nv.n + nv.v) AS ppb
          FROM tok JOIN nv USING (lang)
          LEFT JOIN c ON tok.lang = c.lang AND tok.w = c.w),
        sc AS (
          SELECT doc_id, lang, COUNT(*) AS n_tokens,
                 CAST(CAST(SUM(ppb) AS BIGINT) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE) AS mean_p_ppb
          FROM p GROUP BY doc_id, lang)
        SELECT doc_id, lang, n_tokens, mean_p_ppb,
               CAST(NTILE(3) OVER (PARTITION BY lang
                 ORDER BY mean_p_ppb DESC, doc_id) AS INTEGER) AS bucket
        FROM sc ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Fellegi-Sunter probabilistic record linkage: candidate pairs
    // come from COMPOSITE blocking (nation x name 2-char suffix) via
    // Linkage.blockedPairs, whose preflight require()s the largest
    // block under the cap so the pair space can never silently go
    // quadratic on a hub key (nation-only blocking measured 43x at
    // 10x entities). Three agreement fields (market segment equality,
    // account balance within 100, name Jaro-Winkler >= 0.98 in exact
    // micro units) feed data-estimated u-probabilities + a fixed
    // documented m = 0.95, and each pair's likelihood-ratio product
    // classifies it match/possible/nonmatch. Output is the per-class
    // census with the score envelope. The score is a product of three
    // < 2^53 exact integers taken as doubles in declaration order —
    // bit-identical on both engines.
    Q(
      "q267_fs_linkage",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
          .select($"c_custkey", $"c_name", $"c_nationkey",
            $"c_acctbal", $"c_mktsegment")
        val ids = Linkage.blockedPairs(c, $"c_custkey",
          Seq($"c_nationkey", right($"c_name", lit(2))), maxBlockRows = 4096L)
        val pairs = ids
          .join(c.select($"c_custkey".as("id_l"), $"c_mktsegment".as("seg_l"),
            $"c_acctbal".as("bal_l"), $"c_name".as("name_l")), Seq("id_l"))
          .join(c.select($"c_custkey".as("id_r"), $"c_mktsegment".as("seg_r"),
            $"c_acctbal".as("bal_r"), $"c_name".as("name_r")), Seq("id_r"))
          .select(
            col("id_l"), col("id_r"),
            (col("seg_l") === col("seg_r")).as("f_seg"),
            (abs(col("bal_l") - col("bal_r")) < 100.0).as("f_bal"),
            (floor(LinkageFunctions.jaroWinkler(col("name_l"), col("name_r")) *
              lit(1000000.0) + lit(0.5)).cast("long") >= 980000L).as("f_name"))
        Linkage.fellegiSunterScores(pairs, Seq("f_seg", "f_bal", "f_name"),
            mPpm = 950000L, matchMin = 1e21, nonmatchMax = 1e18)
          .groupBy($"cls")
          .agg(count(lit(1)).as("n_pairs"),
            min($"score").as("min_score"), max($"score").as("max_score"))
          .orderBy($"cls")
      },
      Some("""
        WITH p AS (
          SELECT a.c_custkey AS id_l, b.c_custkey AS id_r,
                 (a.c_mktsegment = b.c_mktsegment) AS f_seg,
                 (abs(a.c_acctbal - b.c_acctbal) < 100.0) AS f_bal,
                 (CAST(FLOOR(jaro_winkler_similarity(a.c_name, b.c_name)
                    * 1000000.0 + 0.5) AS BIGINT) >= 980000) AS f_name
          FROM customer a JOIN customer b
            ON a.c_nationkey = b.c_nationkey
           AND right(a.c_name, 2) = right(b.c_name, 2)
           AND a.c_custkey < b.c_custkey),
        u AS (
          SELECT
            GREATEST(1, LEAST(999999,
              CAST(SUM(CASE WHEN f_seg THEN 1 ELSE 0 END) AS BIGINT)
                * 1000000 // COUNT(*))) AS u_seg,
            GREATEST(1, LEAST(999999,
              CAST(SUM(CASE WHEN f_bal THEN 1 ELSE 0 END) AS BIGINT)
                * 1000000 // COUNT(*))) AS u_bal,
            GREATEST(1, LEAST(999999,
              CAST(SUM(CASE WHEN f_name THEN 1 ELSE 0 END) AS BIGINT)
                * 1000000 // COUNT(*))) AS u_name
          FROM p),
        s AS (
          SELECT
            CAST(CASE WHEN f_seg THEN 950000000000 // u_seg
                 ELSE 50000000000 // (1000000 - u_seg) END AS DOUBLE)
            * CAST(CASE WHEN f_bal THEN 950000000000 // u_bal
                 ELSE 50000000000 // (1000000 - u_bal) END AS DOUBLE)
            * CAST(CASE WHEN f_name THEN 950000000000 // u_name
                 ELSE 50000000000 // (1000000 - u_name) END AS DOUBLE) AS score
          FROM p, u),
        cl AS (
          SELECT CASE WHEN score >= 1e21 THEN 'match'
                      WHEN score <= 1e18 THEN 'nonmatch'
                      ELSE 'possible' END AS cls, score
          FROM s)
        SELECT cls, COUNT(*) AS n_pairs,
               MIN(score) AS min_score, MAX(score) AS max_score
        FROM cl GROUP BY cls ORDER BY cls
      """)),
    // ----------------------------------------------------------------
    // Within-document repeated-span removal: the corpus plants
    // repetition (every 3rd doc echoes its first 8 tokens; every
    // doc_id%3==2 doc doubles itself), then every token covered by a
    // duplicate 3-gram window is cut, keeping first occurrences — the
    // intra-doc half of exact-substring dedup. The oracle replays the
    // gram/first-occurrence/coverage machinery position-for-position.
    Q(
      "q271_dedup_within_doc",
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents")
        val echo = array_join(
          slice(graft.ext.TextHash.tokens($"text"), 1, 8), " ")
        val aug = d.select($"doc_id",
          when($"doc_id" % 3 === 0, concat_ws(" ", $"text", echo))
            .when($"doc_id" % 3 === 2, concat_ws(" ", $"text", $"text"))
            .otherwise($"text").as("text"))
        Dedup.dedupSpansWithinDoc(aug, "doc_id", "text", n = 3)
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH aug AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0 THEN text || ' ' ||
                        array_to_string(list_slice(${toksSql("text")}, 1, 8), ' ')
                      WHEN doc_id % 3 = 2 THEN text || ' ' || text
                      ELSE text END AS text
          FROM documents),
        tok AS (
          SELECT doc_id, w, i FROM (
            SELECT doc_id, unnest(toks) AS w,
                   unnest(range(1, len(toks) + 1)) AS i
            FROM (SELECT doc_id, ${toksSql("text")} AS toks FROM aug))),
        tc AS (SELECT doc_id, COUNT(*) AS t FROM tok GROUP BY doc_id),
        gram AS (
          SELECT doc_id, i,
                 w || chr(1) || LEAD(w, 1) OVER win
                   || chr(1) || LEAD(w, 2) OVER win AS g
          FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
        winr AS (
          SELECT gram.doc_id, i, g FROM gram JOIN tc USING (doc_id)
          WHERE i <= t - 2),
        dup AS (
          SELECT doc_id, i FROM (
            SELECT doc_id, i, ROW_NUMBER() OVER (
              PARTITION BY doc_id, g ORDER BY i) AS rk FROM winr)
          WHERE rk > 1),
        rm AS (
          SELECT DISTINCT doc_id, i + o AS i
          FROM dup CROSS JOIN (SELECT unnest(range(0, 3)) AS o)),
        j AS (
          SELECT tok.doc_id, tok.i, tok.w, rm.i IS NOT NULL AS rmv
          FROM tok LEFT JOIN rm ON tok.doc_id = rm.doc_id AND tok.i = rm.i)
        SELECT doc_id, COUNT(*) AS n_tokens,
               CAST(SUM(CASE WHEN rmv THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
               COALESCE(string_agg(CASE WHEN NOT rmv THEN w END,
                                   ' ' ORDER BY i), '') AS kept_text
        FROM j GROUP BY doc_id ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Unicode-script census: zh docs get planted CJK, a slice of en
    // docs planted Cyrillic, then per-doc codepoint-range counts and
    // the dominant script — the multilingual complement to q40's
    // stopword lang-id (which only sees space-delimited languages).
    // Ranges, not named script classes: Java regex and RE2 spell those
    // differently, but [A-Za-z] / [U+4E00-9FFF] / [U+0400-04FF] replay
    // identically on both engines.
    Q(
      "q273_script_census",
      (s, dir) => {
        import s.implicits._
        val aug = t(s, dir, "documents").select($"doc_id", $"lang",
          when($"lang" === "zh", concat($"text", lit(" 数据处理系统核心")))
            .when($"lang" === "en" && $"doc_id" % 7 === 0,
              concat($"text", lit(" Привет мир")))
            .otherwise($"text").as("text"))
        aug.select($"doc_id", $"lang",
            TextAnalysis.scriptCensus($"text").as("__c"))
          .select($"doc_id", $"lang",
            $"__c.n_chars".as("n_chars"), $"__c.n_latin".as("n_latin"),
            $"__c.n_han".as("n_han"), $"__c.n_cyrillic".as("n_cyrillic"),
            $"__c.dominant".as("dominant"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH aug AS (
          SELECT doc_id, lang,
                 CASE WHEN lang = 'zh' THEN text || ' 数据处理系统核心'
                      WHEN lang = 'en' AND doc_id % 7 = 0
                        THEN text || ' Привет мир'
                      ELSE text END AS text
          FROM documents),
        c AS (
          SELECT doc_id, lang,
                 CAST(length(text) AS BIGINT) AS n_chars,
                 CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                   AS BIGINT) AS n_latin,
                 CAST(length(regexp_replace(text, '[^一-鿿]', '', 'g'))
                   AS BIGINT) AS n_han,
                 CAST(length(regexp_replace(text, '[^Ѐ-ӿ]', '', 'g'))
                   AS BIGINT) AS n_cyrillic
          FROM aug),
        d AS (
          SELECT *, n_chars - n_latin - n_han - n_cyrillic AS n_other,
                 GREATEST(n_latin, n_han, n_cyrillic,
                          n_chars - n_latin - n_han - n_cyrillic) AS m
          FROM c)
        SELECT doc_id, lang, n_chars, n_latin, n_han, n_cyrillic,
               CASE WHEN n_latin = m THEN 'latin'
                    WHEN n_han = m THEN 'han'
                    WHEN n_cyrillic = m THEN 'cyrillic'
                    ELSE 'other' END AS dominant
        FROM d ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Dedup-then-reweight sampling: exact-duplicate clusters (planted:
    // every 10th doc gains one copy, every 20th two) collapse to their
    // canonical doc, admitted with probability min(1, base·⌊√m⌋) via
    // the deterministic hash threshold — duplication mass upweights
    // SUBLINEARLY instead of the linear oversampling kept copies
    // would give. The oracle replays hash, grouping, √ floor, and the
    // threshold bit for every cluster.
    Q(
      "q274_dedup_weighted_sample",
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents").select($"doc_id", $"text")
        val aug = d
          .unionAll(d.filter($"doc_id" % 10 === 0)
            .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
          .unionAll(d.filter($"doc_id" % 20 === 0)
            .select(($"doc_id" + 2000000L).as("doc_id"), $"text"))
        Dedup.weightedCanonicalSample(aug, "doc_id", "text", basePpm = 200000L)
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH aug AS (
          SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + 1000000, text FROM documents
            WHERE doc_id % 10 = 0
          UNION ALL SELECT doc_id + 2000000, text FROM documents
            WHERE doc_id % 20 = 0),
        keyed AS (
          SELECT doc_id, ${OracleSql.hash64(OracleSql.canonical("text"))} AS k
          FROM aug WHERE text IS NOT NULL),
        g AS (
          SELECT k, MIN(doc_id) AS doc_id, COUNT(*) AS cluster_size
          FROM keyed GROUP BY k),
        th AS (
          SELECT *, LEAST(1000000,
            CAST(FLOOR(SQRT(CAST(cluster_size AS DOUBLE))) AS BIGINT) * 200000)
            AS threshold_ppm
          FROM g)
        SELECT doc_id, cluster_size, threshold_ppm,
               (${OracleSql.hash64("'ws:' || CAST(k AS VARCHAR)")} % 1000000)
                 < threshold_ppm AS sampled
        FROM th ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // DSIR importance resampling (Xie et al. '23): hashed-bigram
    // censuses of a target domain (source src0) vs the raw remainder,
    // Laplace-smoothed per-feature probability ratios as exact integer
    // ppm (decimal triple product + truncating integral division —
    // HUGEINT // on the oracle side), per-doc score = integer mean of
    // occurrence ratios, admission via the deterministic weighted hash
    // threshold. The oracle replays censuses, ratios, means, and the
    // threshold bit for every row.
    Q(
      "q275_dsir_resample",
      (s, dir) => {
        import s.implicits._
        val d = t(s, dir, "documents")
        Dsir.resample(
            d.filter($"source" =!= "src0").select($"doc_id", $"source", $"text"),
            $"doc_id", $"text",
            d.filter($"source" === "src0"), $"text",
            targetRate = 0.3, n = 2, buckets = 4096L)
          .select($"doc_id", $"source", $"n_feats", $"dsir_ppm")
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH raw AS (
          SELECT doc_id, source, text FROM documents WHERE source <> 'src0'),
        rocc AS (
          SELECT doc_id, unnest(${OracleSql.hashedShingleOccurrences("text", 2, 4096L)}) AS feat
          FROM raw),
        tocc AS (
          SELECT unnest(${OracleSql.hashedShingleOccurrences("text", 2, 4096L)}) AS feat
          FROM documents WHERE source = 'src0'),
        rc AS (SELECT feat, CAST(COUNT(*) AS BIGINT) AS rc FROM rocc GROUP BY 1),
        tc AS (SELECT feat, CAST(COUNT(*) AS BIGINT) AS tc FROM tocc GROUP BY 1),
        tot AS (SELECT (SELECT COUNT(*) FROM rocc) AS rtot,
                       (SELECT COUNT(*) FROM tocc) AS ttot),
        ratio AS (
          SELECT rc.feat,
                 CAST((CAST(COALESCE(tc.tc, 0) + 1 AS HUGEINT)
                        * (rtot + 4096) * 1000000)
                      // (CAST(rc.rc + 1 AS HUGEINT) * (ttot + 4096))
                   AS BIGINT) AS ratio_ppm
          FROM rc LEFT JOIN tc USING (feat) CROSS JOIN tot),
        perdoc AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
                 CAST(SUM(ratio_ppm) // COUNT(*) AS BIGINT) AS dsir_ppm
          FROM rocc JOIN ratio USING (feat) GROUP BY 1),
        scored AS (
          SELECT r.doc_id, r.source,
                 COALESCE(p.n_feats, 0) AS n_feats,
                 COALESCE(p.dsir_ppm, 0) AS dsir_ppm
          FROM raw r LEFT JOIN perdoc p USING (doc_id)),
        w AS (
          SELECT *, GREATEST(COALESCE(CAST(dsir_ppm AS DOUBLE), 0.0), 0.0) AS wt
          FROM scored),
        m AS (
          SELECT ${OracleSql.dsum("wt")} / CAST(COUNT(*) AS DOUBLE) AS meanw
          FROM w)
        SELECT doc_id, source, n_feats, dsir_ppm
        FROM w, m
        WHERE ${OracleSql.hash64("CAST(doc_id AS VARCHAR)")} % 10000 <
              CAST(floor(LEAST(1.0, 0.3 * wt / meanw) * 10000) AS BIGINT)
        ORDER BY doc_id
      """))
  )
}
