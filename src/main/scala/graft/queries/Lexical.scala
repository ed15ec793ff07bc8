package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{LangModel, Linkage, Profile, TextAnalysis}
import Q._

/** Round-5 lexical/statistical surface: fuzzy entity linkage,
  * blocklist gating, vocabulary building, equal-frequency binning, and
  * bigram-LM quality scoring.
  */
object Lexical {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** DuckDB replica of TextHash.tokens. */
  private def toksSql(c: String) = graft.queries.OracleSql.tokens(c)

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // Fuzzy entity linkage over the distinct part-name vocabulary:
    // q-gram blocking (Gravano VLDB'01) + levenshtein verify, never a
    // cartesian product. Recall is EXACT here by the positive-count
    // bound (min name length 7, q=3, maxDist=1 ⇒ every true pair
    // shares ≥ 2 grams), which is what lets a brute-force cross-join
    // oracle hash-match the blocked plan.
    Q(
      "q100_fuzzy_join",
      (s, dir) => {
        import s.implicits._
        val names = t(s, dir, "part")
          .groupBy($"p_name").agg(min($"p_partkey").as("id"))
        Linkage.fuzzyPairs(
            names, col("id"), col("p_name"),
            names, col("id"), col("p_name"),
            maxDist = 1, q = 3)
          .filter($"id_l" < $"id_r")
          .orderBy($"id_l", $"id_r")
      },
      Some("""
        WITH n AS (SELECT p_name, MIN(p_partkey) AS id FROM part GROUP BY p_name)
        SELECT a.id AS id_l, b.id AS id_r,
               CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        FROM n a JOIN n b ON a.id < b.id
        WHERE levenshtein(a.p_name, b.p_name) <= 1
        ORDER BY id_l, id_r
      """)),
    // ----------------------------------------------------------------
    // Token-exact blocklist gate: occurrences + distinct matched terms
    // per document, docs with no hits absent. "legacy" never occurs —
    // a dead blocklist entry must not perturb the result.
    Q(
      "q104_blocklist_hits",
      (s, dir) => {
        import s.implicits._
        TextAnalysis.blocklistHits(
            t(s, dir, "documents"), $"doc_id", $"text",
            terms = Seq("slow", "dup", "legacy"))
          .orderBy($"doc_id")
      },
      Some(s"""
        SELECT doc_id, COUNT(*) AS hits, COUNT(DISTINCT tok) AS n_terms
        FROM (
          SELECT doc_id,
                 regexp_replace(raw, '^[^\\p{L}\\p{N}]+|[^\\p{L}\\p{N}]+$$', '', 'g')
                   AS tok
          FROM (SELECT doc_id, unnest(${toksSql(OracleSql.canonical("text"))}) AS raw
                FROM documents))
        WHERE tok <> '' AND tok IN ('slow', 'dup', 'legacy')
        GROUP BY doc_id ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Frequency-ranked vocabulary with stable 0-based ids — the
    // tokenizer-training precursor. Rank = (occurrences desc, token):
    // total order, so ids reproduce on any engine.
    Q(
      "q105_vocab_build",
      (s, dir) => {
        import s.implicits._
        TextAnalysis.buildVocab(t(s, dir, "documents"), $"doc_id", $"text", vocabSize = 50)
          .orderBy($"vocab_id")
      },
      Some(s"""
        WITH pd AS (
          SELECT doc_id, tok, COUNT(*) AS n
          FROM (SELECT doc_id, unnest(${toksSql("text")}) AS tok FROM documents)
          GROUP BY doc_id, tok),
        r AS (
          SELECT tok AS token, CAST(SUM(n) AS BIGINT) AS n_occ,
                 COUNT(*) AS n_docs
          FROM pd GROUP BY tok)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, token) - 1 AS BIGINT)
                 AS vocab_id,
               token, n_occ, n_docs
        FROM r ORDER BY vocab_id LIMIT 50
      """)),
    // ----------------------------------------------------------------
    // Equal-frequency binning of lineitem prices: exact percentile
    // edges (q83's interpolation contract), values equal to an edge
    // land in the lower bin. Per-bin count + exact-decimal sum.
    Q(
      "q106_quantile_binning",
      (s, dir) => {
        import s.implicits._
        Profile.quantileBins(
            t(s, dir, "lineitem").select($"l_extendedprice".cast("double").as("price")),
            $"price", nBins = 4)
          .groupBy($"bin")
          .agg(count(lit(1)).as("n"), dsum($"price").as("sum_price"),
            min($"price").as("min_price"), max($"price").as("max_price"))
          .orderBy($"bin")
      },
      Some(s"""
        WITH e AS (
          SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE), [0.25, 0.5, 0.75]) AS ed
          FROM lineitem),
        b AS (
          SELECT p, CAST(1 + (CASE WHEN p > ed[1] THEN 1 ELSE 0 END)
                       + (CASE WHEN p > ed[2] THEN 1 ELSE 0 END)
                       + (CASE WHEN p > ed[3] THEN 1 ELSE 0 END) AS INTEGER) AS bin
          FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS p FROM lineitem), e)
        SELECT bin, COUNT(*) AS n, ${OracleSql.dsum("p")} AS sum_price,
               MIN(p) AS min_price, MAX(p) AS max_price
        FROM b GROUP BY bin ORDER BY bin
      """)),
    // ----------------------------------------------------------------
    // Distribution drift monitor: price distribution of late shipments
    // against equal-frequency bins derived from the pre-1997 base —
    // the PSI shape with an oracle-matchable |p−q| statistic.
    Q(
      "q112_bin_drift",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val pivot = to_timestamp(lit("1997-01-01 00:00:00"))
        Profile.binDrift(
            li.filter($"l_shipdate" < pivot),
            li.filter($"l_shipdate" >= pivot),
            $"l_extendedprice", nBins = 4)
          .orderBy($"bin")
      },
      Some(s"""
        WITH base AS (SELECT CAST(l_extendedprice AS DOUBLE) AS p FROM lineitem
                      WHERE l_shipdate < TIMESTAMP '1997-01-01'),
        cur AS (SELECT CAST(l_extendedprice AS DOUBLE) AS p FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01'),
        e AS (SELECT quantile_cont(p, [0.25, 0.5, 0.75]) AS ed FROM base),
        nb AS (SELECT bin, COUNT(*) AS n_base FROM (
                 SELECT CAST(1 + (CASE WHEN p > ed[1] THEN 1 ELSE 0 END)
                          + (CASE WHEN p > ed[2] THEN 1 ELSE 0 END)
                          + (CASE WHEN p > ed[3] THEN 1 ELSE 0 END) AS INTEGER) AS bin
                 FROM base, e WHERE p IS NOT NULL) GROUP BY bin),
        nc AS (SELECT bin, COUNT(*) AS n_cur FROM (
                 SELECT CAST(1 + (CASE WHEN p > ed[1] THEN 1 ELSE 0 END)
                          + (CASE WHEN p > ed[2] THEN 1 ELSE 0 END)
                          + (CASE WHEN p > ed[3] THEN 1 ELSE 0 END) AS INTEGER) AS bin
                 FROM cur, e WHERE p IS NOT NULL) GROUP BY bin),
        j AS (SELECT b.bin,
                     CAST(COALESCE(nb.n_base, 0) AS BIGINT) AS n_base,
                     CAST(COALESCE(nc.n_cur, 0) AS BIGINT) AS n_cur
              FROM (SELECT unnest(range(1, 5)) AS bin) b
              LEFT JOIN nb ON b.bin = nb.bin LEFT JOIN nc ON b.bin = nc.bin),
        f AS (SELECT bin, n_base, n_cur,
                     CAST(n_base AS DOUBLE) / CAST(SUM(n_base) OVER () AS DOUBLE)
                       AS frac_base,
                     CAST(n_cur AS DOUBLE) / CAST(SUM(n_cur) OVER () AS DOUBLE)
                       AS frac_cur
              FROM j)
        SELECT bin, n_base, n_cur, frac_base, frac_cur,
               abs(frac_base - frac_cur) AS l1
        FROM f ORDER BY bin
      """)),
    // ----------------------------------------------------------------
    // Bigram-LM quality score: mean MLE conditional probability of the
    // doc's token transitions, in exact integer parts-per-billion
    // (see LangModel scaladoc for why not double→decimal).
    Q(
      "q107_bigram_lm_score",
      (s, dir) => {
        import s.implicits._
        LangModel.bigramCondProbScore(t(s, dir, "documents"), $"doc_id", $"text")
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH tok AS (
          SELECT doc_id, t, i FROM (
            SELECT doc_id, unnest(toks) AS t,
                   unnest(range(1, len(toks) + 1)) AS i
            FROM (SELECT doc_id, ${toksSql("text")} AS toks FROM documents))),
        bg AS (
          SELECT doc_id, t AS w,
                 LEAD(t) OVER (PARTITION BY doc_id ORDER BY i) AS w2
          FROM tok QUALIFY w2 IS NOT NULL),
        c1 AS (SELECT w, COUNT(*) AS c1 FROM bg GROUP BY w),
        cb AS (SELECT w, w2, COUNT(*) AS cb FROM bg GROUP BY w, w2)
        SELECT bg.doc_id, COUNT(*) AS n_bigrams,
               CAST(SUM((cb.cb * 1000000000) // c1.c1) AS DOUBLE) / COUNT(*)
                 AS mean_p_ppb
        FROM bg JOIN cb USING (w, w2) JOIN c1 USING (w)
        GROUP BY bg.doc_id ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // HTML main-content extraction — the FIRST stage of web-corpus
    // curation: each doc's text is wrapped in a realistic page (title,
    // style block, script block containing a '<' that must NOT open a
    // tag, header with entities, comment, nbsp padding), then
    // HtmlExtract strips tags, drops script/style/comment blocks,
    // decodes the core entities, and collapses whitespace in one
    // scan-stage codegen pass. The expression is DEFINED as equal to
    // an RE2 regex pipeline, which the oracle replays verbatim
    // (DuckDB regexp_replace is RE2) — tag-clean input text by
    // fixture, so every byte of the extraction is checked.
    Q(
      "q264_html_extract",
      (s, dir) => {
        import s.implicits._
        import graft.functions.HtmlFunctions.htmlExtract
        val html = concat(
          lit("<html><head><title>T"), $"doc_id".cast("string"),
          lit("</title><STYLE>p { color: red; }</STYLE>" +
            "<script>if (a < b) { go(); }</script></head>" +
            "<body><h1 class=\"x\">H &amp; &lt;tag&gt; &#65;</h1>" +
            "<!-- hidden chrome -->\n<p>"),
          $"text",
          lit("</p>&nbsp;<br/></body></html>"))
        t(s, dir, "documents")
          .select($"doc_id", htmlExtract(html).as("extracted"))
          .withColumn("n_words", size(split($"extracted", " ")).cast("long"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH page AS (
          SELECT doc_id,
                 '<html><head><title>T' || CAST(doc_id AS VARCHAR) ||
                 '</title><STYLE>p { color: red; }</STYLE>' ||
                 '<script>if (a < b) { go(); }</script></head>' ||
                 '<body><h1 class="x">H &amp; &lt;tag&gt; &#65;</h1>' ||
                 '<!-- hidden chrome -->' || chr(10) || '<p>' ||
                 text || '</p>&nbsp;<br/></body></html>' AS html
          FROM documents),
        ext AS (
          SELECT doc_id,
                 trim(regexp_replace(
                   replace(replace(replace(replace(replace(replace(replace(
                     regexp_replace(
                     regexp_replace(
                     regexp_replace(
                     regexp_replace(html,
                       '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                       '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                       '(?s)<!--.*?-->', ' ', 'g'),
                       '<[^>]*>', ' ', 'g'),
                     '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                     '&#39;', ''''), '&#65;', 'A'), '&nbsp;', ' '),
                     '&amp;', '&'),
                   '\s+', ' ', 'g')) AS extracted
          FROM page)
        SELECT doc_id, extracted,
               CAST(len(string_split(extracted, ' ')) AS BIGINT) AS n_words
        FROM ext ORDER BY doc_id
      """))
  )
}
