package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.TextAnalysis
import Q._

/** Round-8 batch: trainable-pipeline operators — the BPE tokenizer
  * merge loop and its companions. Each oracle replays the exact
  * integer/string semantics in DuckDB (no floats anywhere in this
  * family, so parity is structural, not numeric).
  */
object Training {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Rounds the catalog entry trains; the oracle unrolls the same
    * number of CTE rounds. Small enough to keep the oracle SQL
    * readable, large enough that ties and merged-token re-merges
    * (round N consuming round M<N's output) are exercised.
    */
  private val BpeRounds = 8

  /** One DuckDB merge round: pair counts from the delimited corpus
    * string, argmax with the (n desc, a, b) tie-break, greedy
    * left-to-right merge via non-overlapping `replace`. MATERIALIZED
    * is load-bearing twice over: `d{r}` and `b{r}` are each referenced
    * more than once, and DuckDB inlines plain CTEs — un-materialized,
    * the doc-state chain re-expands every upstream round per reference
    * (exponential scans of the base table).
    */
  private def bpeRoundSql(r: Int): String = {
    val prev = s"d${r - 1}"
    s"""t$r AS (SELECT string_split(trim(s, chr(1)), chr(1)||chr(1)) AS t FROM $prev),
       |p$r AS (SELECT unnest(t[1:len(t)-1]) AS a, unnest(t[2:len(t)]) AS b
       |        FROM t$r WHERE len(t) >= 2),
       |b$r AS MATERIALIZED (
       |  SELECT a, b, COUNT(*) AS n FROM p$r GROUP BY a, b
       |  ORDER BY n DESC, a, b LIMIT 1),
       |d$r AS MATERIALIZED (SELECT replace(s,
       |    chr(1)||(SELECT a FROM b$r)||chr(1)||chr(1)||(SELECT b FROM b$r)||chr(1),
       |    chr(1)||(SELECT a FROM b$r)||' '||(SELECT b FROM b$r)||chr(1)) AS s
       |  FROM $prev)""".stripMargin
  }

  /** DuckDB replica of [[graft.functions.LuhnValid]] over a candidate
    * expression: strip separators, 13–19 digits, doubled-every-second-
    * from-the-right sum mod 10. Pure integer SQL.
    */
  private def luhnSql(c: String): String = {
    val d = s"replace(replace($c,' ',''),'-','')"
    s"""(len($d) BETWEEN 13 AND 19 AND
       | list_sum(list_transform(range(1, len($d)+1), i ->
       |   CASE WHEN (len($d) - i) % 2 = 0 THEN CAST($d[i] AS INTEGER)
       |        ELSE CASE WHEN CAST($d[i] AS INTEGER)*2 > 9
       |                  THEN CAST($d[i] AS INTEGER)*2 - 9
       |                  ELSE CAST($d[i] AS INTEGER)*2 END END)) % 10 = 0)"""
      .stripMargin.linesIterator.mkString(" ")
  }

  /** DuckDB replica of [[graft.functions.IbanValid]]: rotate the first
    * four chars to the end, map letters A=10..Z=35 via 26 nested
    * replaces, left-pad the digit string to 70 (mod-97-invariant) and
    * fold ten unrolled 7-digit chunks through `% 97`. BIGINT-bounded
    * at every step — the same incremental-mod argument the compiled
    * expression uses.
    */
  private def ibanSql(c: String): String = {
    val rotated = s"(substr($c,5) || substr($c,1,4))"
    val digits = ('A' to 'Z').foldLeft(rotated) { (acc, ch) =>
      s"replace($acc,'$ch','${ch - 'A' + 10}')"
    }
    val padded = s"lpad($digits, 70, '0')"
    val acc = (0 until 10).foldLeft("0") { (acc, k) =>
      s"(($acc)*10000000 + CAST(substr($padded,${1 + 7 * k},7) AS BIGINT)) % 97"
    }
    s"(len($c) BETWEEN 15 AND 34 AND ($acc) = 1)"
  }

  /** DuckDB replica of Similarity's micro-quantized squared L2: the
    * identical left-fold shape, then one floor-quantization to BIGINT.
    */
  private def l2micro(a: String, b: String): String =
    s"""CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(range(1, len($a) + 1), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))),
       |  (x, y) -> x + y) * 1000000.0 + 0.5) AS BIGINT)"""
      .stripMargin.linesIterator.mkString(" ")

  /** DuckDB replica of [[graft.ext.Similarity.pqTopK]]'s training +
    * encode + ADC chain (assumes CTE `v(vec_id, vec)`): per subspace,
    * seeded L2 Lloyd's unrolled `iters` times (exact-decimal means,
    * micro-L2 assignment, lowest-id ties), stacked into a MATERIALIZED
    * `cb(subspace, cent_id, cent_vec)` (referenced twice — encode and
    * query tables — and the training chain must not re-expand), then
    * `codes` and `qt` with dynamic subvector slices.
    */
  private def pqChainSql(m: Int, subDim: Int, ksub: Int, iters: Int, nQueries: Int): String = {
    val perSubspace = (0 until m).map { j =>
      val lo = j * subDim + 1
      val hi = (j + 1) * subDim
      val sub = s"sub$j AS (SELECT vec_id AS vid, vec[$lo:$hi] AS svec FROM v)"
      val init = s"cb${j}_0 AS (SELECT vid AS cent_id, svec AS cent_vec FROM sub$j WHERE vid < $ksub)"
      val steps = (1 to iters).map { i =>
        s"""as$j$i AS (
           |  SELECT vid, svec, cell FROM (
           |    SELECT s.vid, s.svec, c.cent_id AS cell,
           |           ROW_NUMBER() OVER (PARTITION BY s.vid
           |             ORDER BY ${l2micro("s.svec", "c.cent_vec")}, c.cent_id) AS rn
           |    FROM sub$j s CROSS JOIN cb${j}_${i - 1} c)
           |  WHERE rn = 1),
           |mn$j$i AS (
           |  SELECT cell, pos,
           |         CAST(CAST(SUM(CAST(val AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
           |           / COUNT(*) AS m
           |  FROM (SELECT cell, unnest(svec) AS val,
           |               unnest(range(1, len(svec) + 1)) AS pos
           |        FROM as$j$i)
           |  GROUP BY cell, pos),
           |cb${j}_$i AS (
           |  SELECT cell AS cent_id, list(m ORDER BY pos) AS cent_vec
           |  FROM mn$j$i GROUP BY cell)""".stripMargin
      }
      (sub +: init +: steps).mkString(",\n")
    }
    val stack = (0 until m)
      .map(j => s"SELECT $j AS subspace, cent_id, cent_vec FROM cb${j}_$iters")
      .mkString(" UNION ALL ")
    val dynSlice = s"s.vec[(c.subspace*$subDim+1):((c.subspace+1)*$subDim)]"
    val dynSliceQ = s"q.vec[(c.subspace*$subDim+1):((c.subspace+1)*$subDim)]"
    s"""${perSubspace.mkString(",\n")},
       |cb AS MATERIALIZED ($stack),
       |codes AS (
       |  SELECT cid, subspace, code FROM (
       |    SELECT s.vec_id AS cid, c.subspace, c.cent_id AS code,
       |           ROW_NUMBER() OVER (PARTITION BY s.vec_id, c.subspace
       |             ORDER BY ${l2micro(dynSlice, "c.cent_vec")}, c.cent_id) AS rn
       |    FROM v s CROSS JOIN cb c)
       |  WHERE rn = 1),
       |qt AS (
       |  SELECT q.vec_id AS qid, c.subspace, c.cent_id AS code,
       |         ${l2micro(dynSliceQ, "c.cent_vec")} AS dmicro
       |  FROM v q CROSS JOIN cb c WHERE q.vec_id < $nQueries)""".stripMargin
  }

  /** DuckDB replica of [[graft.ext.LangModel.naiveBayesClassify]]'s
    * train+score chain, ending in CTE `percls$sfx(doc_id, y,
    * n_tokens, score_ppb)`. Parameterized by the TRAINING predicate
    * and a CTE-name suffix so several chains (q223's learning curve
    * trains three nested subsets) can coexist in one query;
    * [[NbChainSql]] is the unsuffixed even/odd instance shared by
    * q201/q204/q215/q218.
    */
  private def nbChainSql(sfx: String, trainPred: String): String = s"""tr$sfx AS (
          SELECT lang AS y, text FROM documents
          WHERE ($trainPred) AND lang IS NOT NULL AND text IS NOT NULL),
        sc$sfx AS (
          SELECT doc_id, text FROM documents
          WHERE doc_id % 2 = 1 AND text IS NOT NULL),
        trtok$sfx AS (SELECT y, unnest(${OracleSql.tokens("text")}) AS w FROM tr$sfx),
        cwy$sfx AS (SELECT w, y, COUNT(*) AS cwy FROM trtok$sfx GROUP BY 1, 2),
        ny$sfx AS (SELECT y, COUNT(*) AS ny FROM trtok$sfx GROUP BY 1),
        vv$sfx AS (SELECT COUNT(DISTINCT w) AS v FROM trtok$sfx),
        pri$sfx AS (SELECT y, COUNT(*) AS dy FROM tr$sfx GROUP BY 1),
        dd$sfx AS (SELECT COUNT(*) AS d FROM tr$sfx),
        cls$sfx AS (
          SELECT y, ny, v, dy * 1000000000 // d AS prior_ppb
          FROM pri$sfx JOIN ny$sfx USING (y) CROSS JOIN vv$sfx CROSS JOIN dd$sfx),
        sctok$sfx AS (SELECT doc_id, unnest(${OracleSql.tokens("text")}) AS w FROM sc$sfx),
        pertok$sfx AS (
          SELECT s.doc_id, c.y,
                 (coalesce(k.cwy, 0) + 1) * 1000000000 // (c.ny + c.v) AS ppb
          FROM sctok$sfx s CROSS JOIN cls$sfx c
          LEFT JOIN cwy$sfx k ON k.w = s.w AND k.y = c.y),
        agg0$sfx AS (
          SELECT doc_id, y, SUM(ppb) AS s, COUNT(*) AS n
          FROM pertok$sfx GROUP BY 1, 2),
        percls$sfx AS (
          SELECT dc.doc_id, dc.y,
                 coalesce(a.n, 0) AS n_tokens,
                 (dc.prior_ppb + coalesce(a.s, 0)) // (coalesce(a.n, 0) + 1) AS score_ppb
          FROM (SELECT doc_id, y, prior_ppb FROM sc$sfx CROSS JOIN cls$sfx) dc
          LEFT JOIN agg0$sfx a ON a.doc_id = dc.doc_id AND a.y = dc.y)"""

  /** The unsuffixed even/odd instance (q201/q204/q215/q218). */
  private val NbChainSql: String = nbChainSql("", "doc_id % 2 = 0")

  /** One synchronous label-propagation round in DuckDB: neighbor
    * labels from the previous round, (node, label) counts, per-node
    * argmax with the (count desc, label asc) tie-break.
    */
  private def lpRoundSql(t: Int): String =
    s"""n$t AS (
       |  SELECT b.s AS id, l.lbl, COUNT(*) AS c
       |  FROM bid b JOIN l${t - 1} l ON l.id = b.d
       |  GROUP BY 1, 2),
       |l$t AS MATERIALIZED (
       |  SELECT id, lbl FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY id
       |      ORDER BY c DESC, lbl) AS rn FROM n$t)
       |  WHERE rn = 1)""".stripMargin

  /** Shared label-propagation CTE chain (brand-filtered bipartite
    * projection → 4 LP rounds) — q205 consumes l4 directly, q268
    * computes modularity over the same partition; one definition so
    * the two oracles cannot drift.
    */
  private val LpChainSql: String =
    s"""ip AS (
       |  SELECT DISTINCT l_orderkey, l_partkey
       |  FROM lineitem JOIN part ON p_partkey = l_partkey
       |  WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')),
       |deg0 AS (SELECT l_orderkey FROM ip GROUP BY l_orderkey
       |         HAVING COUNT(*) <= 64),
       |kept AS (SELECT ip.* FROM ip JOIN deg0 USING (l_orderkey)),
       |edges AS MATERIALIZED (
       |  SELECT a.l_partkey AS u, b.l_partkey AS v
       |  FROM kept a JOIN kept b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2),
       |bid AS MATERIALIZED (
       |  SELECT u AS s, v AS d FROM edges
       |  UNION SELECT v AS s, u AS d FROM edges),
       |l0 AS (SELECT id, id AS lbl FROM (SELECT DISTINCT s AS id FROM bid)),
       |${(1 to 4).map(lpRoundSql).mkString(",\n")}""".stripMargin

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // BPE tokenizer-training merge loop: 8 rounds of count-argmax-
    // merge over the documents corpus, integer counts end-to-end,
    // per-round checkpoint+free. The oracle unrolls all 8 rounds as
    // materialized CTEs over the same ␁-delimited string encoding, so
    // the greedy-merge semantics (non-overlapping left-to-right
    // replace) are replayed mechanically, not re-derived.
    Q(
      "q197_bpe_train",
      (s, dir) => {
        import s.implicits._
        TextAnalysis.bpeTrain(t(s, dir, "documents"), $"text", rounds = BpeRounds)
          .orderBy($"round")
      },
      Some(s"""
        WITH d0 AS MATERIALIZED (
          SELECT chr(1) || array_to_string(${OracleSql.tokens("text")},
                   chr(1)||chr(1)) || chr(1) AS s
          FROM documents
          WHERE text IS NOT NULL AND len(${OracleSql.tokens("text")}) >= 2),
        ${(1 to BpeRounds).map(bpeRoundSql).mkString(",\n")}
        SELECT * FROM (
          ${(1 to BpeRounds).map(r =>
            s"SELECT CAST($r AS BIGINT) AS round, a, b, a||' '||b AS merged, " +
            s"CAST(n AS BIGINT) AS n FROM b$r").mkString(" UNION ALL ")})
        ORDER BY round
      """)),
    // ----------------------------------------------------------------
    // UTF-8 / encoding-sanity screen over documents with PLANTED
    // defects: a deterministic subset of docs gets a mojibake burst, a
    // replacement-char run, or a control byte appended (same CASE
    // chain in both engines), and the screen must count and flag
    // exactly those. n_invalid/n_replacement/n_ctl flow through the
    // compiled Utf8Stats byte-level state machine on the Spark side
    // and are re-derived with regexp counts in DuckDB (valid text
    // makes the two definitions coincide; the invalid-byte path is
    // spec-covered with raw byte arrays — a SQL engine cannot even
    // hold invalid UTF-8 in a VARCHAR).
    Q(
      "q198_utf8_screen",
      (s, dir) => {
        import s.implicits._
        val planted = when($"doc_id" % 7 === 0,
            concat($"text", lit(" Ã©Ã¨â€™Â° Ã¼Ã± â€œquotedâ€ Ã¤")))
          .when($"doc_id" % 11 === 3,
            concat($"text", lit(" \uFFFD\uFFFD\uFFFD\uFFFD\uFFFD")))
          .when($"doc_id" % 13 === 5, concat($"text", lit("\u0007")))
          .otherwise($"text")
        val src = t(s, dir, "documents").filter($"text".isNotNull)
          .select($"doc_id", planted.as("text"))
        TextAnalysis.utf8Screen(src, $"doc_id", $"text")
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH src AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0 THEN text || ' Ã©Ã¨â€™Â° Ã¼Ã± â€œquotedâ€ Ã¤'
                      WHEN doc_id % 11 = 3 THEN text || ' ' || repeat(chr(65533), 5)
                      WHEN doc_id % 13 = 5 THEN text || chr(7)
                      ELSE text END AS t
          FROM documents WHERE text IS NOT NULL),
        m AS (
          SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
                 CAST(0 AS BIGINT) AS n_invalid,
                 CAST(len(regexp_extract_all(t, chr(65533))) AS BIGINT) AS n_replacement,
                 CAST(len(regexp_extract_all(t, '[\\x01-\\x08\\x0B\\x0C\\x0E-\\x1F]')) AS BIGINT) AS n_ctl,
                 CAST(len(regexp_extract_all(t, '${TextAnalysis.MojibakePattern}')) AS BIGINT) AS n_moji
          FROM src)
        SELECT doc_id, n_chars, n_invalid, n_replacement, n_ctl, n_moji,
               (n_invalid > 0 OR n_ctl > 0 OR n_replacement * 1000 > n_chars
                OR n_moji * 200 > n_chars) AS suspect
        FROM m ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Checksum-validated PII screen with PLANTED identifiers: a
    // deterministic doc subset gets a Luhn-valid card, a corrupted
    // card (last digit bumped — regex still matches, checksum must
    // reject), a valid IBAN, or a corrupted IBAN. Regexes propose,
    // integer checksums confirm — both replayed exactly in DuckDB
    // (Luhn as a list_transform sum, mod-97 as unrolled chunk
    // arithmetic), so every count and flag is hash-checked.
    Q(
      "q199_pii_checksum",
      (s, dir) => {
        import s.implicits._
        val planted = when($"doc_id" % 7 === 0,
            concat($"text", lit(" card 4532 0151 1283 0366 on file")))
          .when($"doc_id" % 7 === 1,
            concat($"text", lit(" card 4532 0151 1283 0367 on file")))
          .when($"doc_id" % 7 === 2,
            concat($"text", lit(" iban DE89370400440532013000 ok")))
          .when($"doc_id" % 7 === 3,
            concat($"text", lit(" iban DE89370400440532013001 bad")))
          .otherwise($"text")
        val src = t(s, dir, "documents").filter($"text".isNotNull)
          .select($"doc_id", planted.as("text"))
        TextAnalysis.piiScreen(src, $"doc_id", $"text")
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH src AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0 THEN text || ' card 4532 0151 1283 0366 on file'
                      WHEN doc_id % 7 = 1 THEN text || ' card 4532 0151 1283 0367 on file'
                      WHEN doc_id % 7 = 2 THEN text || ' iban DE89370400440532013000 ok'
                      WHEN doc_id % 7 = 3 THEN text || ' iban DE89370400440532013001 bad'
                      ELSE text END AS t
          FROM documents WHERE text IS NOT NULL),
        m AS (
          SELECT doc_id,
                 regexp_extract_all(t, '${TextAnalysis.CardCandidatePattern}') AS cc,
                 regexp_extract_all(t, '${TextAnalysis.IbanCandidatePattern}') AS ic
          FROM src)
        SELECT doc_id,
               CAST(len(cc) AS BIGINT) AS n_card_cand,
               CAST(len(list_filter(cc, c -> ${luhnSql("c")})) AS BIGINT) AS n_card_valid,
               CAST(len(ic) AS BIGINT) AS n_iban_cand,
               CAST(len(list_filter(ic, c -> ${ibanSql("c")})) AS BIGINT) AS n_iban_valid,
               (len(list_filter(cc, c -> ${luhnSql("c")})) > 0 OR
                len(list_filter(ic, c -> ${ibanSql("c")})) > 0) AS has_pii
        FROM m ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Product-quantization ANN with ADC scoring: 64 dims → 4 subspaces
    // × 16 dims, 8 codewords each (seeded L2 Lloyd's, 2 iterations),
    // queries = the 5 lowest ids, k = 5 — the same shape as q55's IVF
    // so the two index families stay comparable. Every distance is a
    // micro-quantized integer, so training, encoding and the ADC sums
    // replay exactly in DuckDB (the full chain is generated CTEs).
    Q(
      "q200_ann_pq_adc",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        graft.ext.Similarity.pqTopK(
          emb, emb.filter($"vec_id" < 5), "vec_id", "embedding",
          k = 5, m = 4, subDim = 16, ksub = 8, kmeansIters = 2)
          .orderBy($"query_id", $"neighbor_id")
      },
      Some(s"""
        WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                   FROM embeddings),
        ${pqChainSql(m = 4, subDim = 16, ksub = 8, iters = 2, nQueries = 5)},
        scored AS (
          SELECT qid AS query_id, cid AS neighbor_id, CAST(SUM(dmicro) AS BIGINT) AS am
          FROM codes JOIN qt USING (subspace, code)
          GROUP BY 1, 2)
        SELECT query_id, neighbor_id, am / 1000000.0 AS adc FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY am, neighbor_id) AS rn
          FROM scored WHERE query_id <> neighbor_id)
        WHERE rn <= 5
        ORDER BY query_id, neighbor_id
      """)),
    // ----------------------------------------------------------------
    // Composed IVF+PQ (IVFADC, direct coding): q55's trained coarse
    // quantizer prunes each query to its 4 nearest of 16 cells, q200's
    // PQ codebooks rank ONLY those survivors by integer ADC sums — the
    // billion-vector production configuration, assembled from the two
    // separately-proven index halves. The oracle stacks both trained
    // chains (coarse Lloyd's CTEs + per-subspace codebook CTEs) and
    // replays cell probing, candidate pruning, and every ADC lookup.
    Q(
      "q244_ann_ivf_pq",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        graft.ext.Similarity.ivfPqTopK(
          emb, emb.filter($"vec_id" < 5), "vec_id", "embedding",
          k = 5, nCells = 16, nProbe = 4, m = 4, subDim = 16, ksub = 8,
          kmeansIters = 2)
          .orderBy($"query_id", $"neighbor_id")
      },
      Some(s"""
        WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                   FROM embeddings),
        ${OracleSql.kmeansCents(16, 2)},
        assigned AS (
          SELECT cid, cell FROM (
            SELECT c.vec_id AS cid, ct.cent_id AS cell,
                   ROW_NUMBER() OVER (PARTITION BY c.vec_id
                     ORDER BY ${OracleSql.cosine("c.vec", "ct.cent_vec")} DESC, ct.cent_id) AS rn
            FROM v c CROSS JOIN cents ct)
          WHERE rn = 1),
        probes AS (
          SELECT qid, cell FROM (
            SELECT q.vec_id AS qid, ct.cent_id AS cell,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                     ORDER BY ${OracleSql.cosine("q.vec", "ct.cent_vec")} DESC, ct.cent_id) AS rn
            FROM v q CROSS JOIN cents ct WHERE q.vec_id < 5)
          WHERE rn <= 4),
        ${pqChainSql(m = 4, subDim = 16, ksub = 8, iters = 2, nQueries = 5)},
        cand AS (
          SELECT p.qid, a.cid FROM probes p JOIN assigned a ON p.cell = a.cell
          WHERE p.qid <> a.cid),
        scored AS (
          SELECT cn.qid AS query_id, cn.cid AS neighbor_id,
                 CAST(SUM(q.dmicro) AS BIGINT) AS am
          FROM cand cn
          JOIN codes co ON co.cid = cn.cid
          JOIN qt q ON q.qid = cn.qid AND q.subspace = co.subspace AND q.code = co.code
          GROUP BY 1, 2)
        SELECT query_id, neighbor_id, am / 1000000.0 AS adc FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY am, neighbor_id) AS rn
          FROM scored)
        WHERE rn <= 5
        ORDER BY query_id, neighbor_id
      """)),
    // ----------------------------------------------------------------
    // Multinomial Naive Bayes over the documents table: train on the
    // even doc_ids (labels = lang), classify the held-out odd ids.
    // All-integer Laplace ppb arithmetic (the q107 machinery), prior
    // folded in as one pseudo-token, argmax with lexicographic ties —
    // every score and decision replays exactly in DuckDB.
    Q(
      "q201_naive_bayes",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        graft.ext.LangModel.naiveBayesClassify(
            docs.filter($"doc_id" % 2 === 0),
            docs.filter($"doc_id" % 2 === 1),
            $"lang", $"doc_id", $"text")
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH $NbChainSql
        SELECT doc_id, y AS predicted,
               CAST(score_ppb AS BIGINT) AS score_ppb,
               CAST(n_tokens AS BIGINT) AS n_tokens
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY score_ppb DESC, y) AS rn FROM percls)
        WHERE rn = 1
        ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // BPE ENCODE — the inference half of q197, and the operator that
    // actually runs corpus-wide at scale: train 8 merges on the even
    // doc_ids, apply them in learned order to the held-out odd ids.
    // The Spark side folds the collected merge table into R chained
    // replaces (one codegen stage); the oracle re-derives the same
    // merges (the q197 CTE chain over the training half) and replays
    // the replace chain with scalar subqueries. Outputs are integer
    // counts + a '|'-joined token sample (the array-stringify rule).
    Q(
      "q202_bpe_encode",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val merges = graft.ext.TextAnalysis
          .bpeTrain(docs.filter($"doc_id" % 2 === 0), $"text", rounds = BpeRounds)
          .orderBy($"round").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        graft.ext.TextAnalysis.bpeEncode(
            docs.filter($"doc_id" % 2 === 1), $"doc_id", $"text", merges)
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH d0 AS MATERIALIZED (
          SELECT chr(1) || array_to_string(${OracleSql.tokens("text")},
                   chr(1)||chr(1)) || chr(1) AS s
          FROM documents
          WHERE text IS NOT NULL AND len(${OracleSql.tokens("text")}) >= 2
            AND doc_id % 2 = 0),
        ${(1 to BpeRounds).map(bpeRoundSql).mkString(",\n")},
        a0 AS (
          SELECT doc_id, ${OracleSql.tokens("text")} AS toks,
                 chr(1) || array_to_string(${OracleSql.tokens("text")},
                   chr(1)||chr(1)) || chr(1) AS s
          FROM documents
          WHERE text IS NOT NULL AND len(${OracleSql.tokens("text")}) >= 1
            AND doc_id % 2 = 1),
        ${(1 to BpeRounds).map { r =>
          s"""a$r AS (SELECT doc_id, toks, replace(s,
             |    chr(1)||(SELECT a FROM b$r)||chr(1)||chr(1)||(SELECT b FROM b$r)||chr(1),
             |    chr(1)||(SELECT a FROM b$r)||' '||(SELECT b FROM b$r)||chr(1)) AS s
             |  FROM a${r - 1})""".stripMargin
        }.mkString(",\n")},
        enc AS (
          SELECT doc_id, toks,
                 string_split(trim(s, chr(1)), chr(1)||chr(1)) AS e
          FROM a$BpeRounds)
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_raw,
               CAST(len(e) AS BIGINT) AS n_enc,
               CAST(len(e) * 1000000 // len(toks) AS BIGINT) AS ratio_ppm,
               array_to_string(e[1:5], '|') AS head_tokens
        FROM enc ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Count-min sketch heavy hitters with the q56 self-verifying
    // envelope: a 4×1024 sketch over the token stream, the top-20
    // exact terms estimated from it, est>=exact (structural CMS
    // guarantee) and overcount <= 3N/w checked as a deterministic
    // column both engines compute identically. Seeded md5 buckets, so
    // DuckDB rebuilds the identical sketch cell for cell.
    Q(
      "q203_countmin_topterms",
      (s, dir) => {
        import s.implicits._
        graft.ext.Retrieval.countMinTopTerms(
            t(s, dir, "documents"), $"text", depth = 4, width = 1024, topK = 20)
          .orderBy($"term")
      },
      Some(s"""
        WITH toks AS (
          SELECT unnest(${OracleSql.tokens("text")}) AS w
          FROM documents WHERE text IS NOT NULL),
        nn AS (SELECT COUNT(*) AS n FROM toks),
        ex AS (
          SELECT w, COUNT(*) AS exact FROM toks
          GROUP BY w ORDER BY exact DESC, w LIMIT 20),
        sk AS (
          SELECT u.r AS r,
                 ${OracleSql.hash64("CAST(u.r AS VARCHAR)", "w")} % 1024 AS bucket,
                 COUNT(*) AS cnt
          FROM toks CROSS JOIN range(0, 4) u(r)
          GROUP BY 1, 2),
        est AS (
          SELECT e.w AS term, e.exact, MIN(s.cnt) AS est
          FROM ex e CROSS JOIN range(0, 4) u(r)
          JOIN sk s ON s.r = u.r
            AND s.bucket = ${OracleSql.hash64("CAST(u.r AS VARCHAR)", "e.w")} % 1024
          GROUP BY 1, 2)
        SELECT term, CAST(exact AS BIGINT) AS exact, CAST(est AS BIGINT) AS est,
               (est >= exact AND (est - exact) * 1024 <= 3 * n) AS within_bound
        FROM est CROSS JOIN nn ORDER BY term
      """)),
    // ----------------------------------------------------------------
    // Classifier evaluation closing the q201 loop: the NB predictions
    // on the held-out half joined back to the true lang labels, per-
    // class confusion counts with integer ppm precision/recall/F1.
    // The oracle reuses the shared NB CTE chain and stacks the same
    // full-outer class stitch on top — every number is an integer or
    // an integer floor-division.
    Q(
      "q204_nb_confusion",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val pred = graft.ext.LangModel.naiveBayesClassify(
          docs.filter($"doc_id" % 2 === 0),
          docs.filter($"doc_id" % 2 === 1),
          $"lang", $"doc_id", $"text")
        val joined = pred.join(
          docs.filter($"doc_id" % 2 === 1).select($"doc_id", $"lang"),
          Seq("doc_id"))
        graft.ext.Profile.confusionStats(joined, $"lang", $"predicted")
          .orderBy($"cls")
      },
      Some(s"""
        WITH $NbChainSql,
        nbpred AS (
          SELECT doc_id, y AS predicted
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY score_ppb DESC, y) AS rn FROM percls)
          WHERE rn = 1),
        pairs AS (
          SELECT d.lang AS a, p.predicted AS p
          FROM nbpred p JOIN documents d USING (doc_id)
          WHERE d.lang IS NOT NULL),
        na AS (SELECT a AS cls, COUNT(*) AS n_actual FROM pairs GROUP BY 1),
        np AS (SELECT p AS cls, COUNT(*) AS n_predicted FROM pairs GROUP BY 1),
        tpc AS (SELECT a AS cls, COUNT(*) AS tp FROM pairs WHERE a = p GROUP BY 1),
        st AS (
          SELECT cls,
                 coalesce(n_actual, 0) AS n_actual,
                 coalesce(n_predicted, 0) AS n_predicted,
                 coalesce(tp, 0) AS tp
          FROM na FULL OUTER JOIN np USING (cls)
          LEFT JOIN tpc USING (cls)),
        pr AS (
          SELECT cls, n_actual, n_predicted, tp,
                 CASE WHEN n_predicted > 0 THEN tp * 1000000 // n_predicted END
                   AS precision_ppm,
                 CASE WHEN n_actual > 0 THEN tp * 1000000 // n_actual END
                   AS recall_ppm
          FROM st)
        SELECT cls, CAST(n_actual AS BIGINT) AS n_actual,
               CAST(n_predicted AS BIGINT) AS n_predicted,
               CAST(tp AS BIGINT) AS tp,
               CAST(precision_ppm AS BIGINT) AS precision_ppm,
               CAST(recall_ppm AS BIGINT) AS recall_ppm,
               CAST(CASE WHEN precision_ppm IS NOT NULL AND recall_ppm IS NOT NULL
                         AND precision_ppm + recall_ppm > 0
                    THEN 2 * precision_ppm * recall_ppm // (precision_ppm + recall_ppm)
                    END AS BIGINT) AS f1_ppm
        FROM pr ORDER BY cls
      """)),
    // ----------------------------------------------------------------
    // Label-propagation communities (Raghavan '07) over the q147
    // co-purchase graph: 4 synchronous rounds, ties to the smallest
    // label — fully deterministic, so the oracle unrolls the rounds
    // and must land on the identical community assignment node for
    // node. Complements q74's connected components (finer partition).
    Q(
      "q205_label_prop",
      (s, dir) => {
        import s.implicits._
        val pk = t(s, dir, "part")
          .filter($"p_brand".isin("Brand#1", "Brand#2", "Brand#3"))
          .select($"p_partkey")
        val ip = t(s, dir, "lineitem")
          .join(pk, $"l_partkey" === $"p_partkey")
          .select($"l_orderkey", $"l_partkey")
        val edges = graft.ext.Graph.bipartiteProject(ip, "l_orderkey", "l_partkey",
          maxDegree = 64)
        graft.ext.Graph.labelPropagation(edges, "a", "b", rounds = 4)
          .orderBy($"node")
      },
      Some(s"""
        WITH $LpChainSql
        SELECT id AS node, lbl AS community FROM l4 ORDER BY node
      """)),
    // ----------------------------------------------------------------
    // Newman modularity of the q205 label-propagation partition over
    // the same co-purchase graph: per community, internal-edge count,
    // degree sum, and the exact-ppm contribution
    // (4·m·e_c − d_c²)·1e6 div 4m² — integer end-to-end (Spark
    // DECIMAL(38,0) div ↔ DuckDB HUGEINT //, both truncating toward
    // zero). The community-quality gauge that tells you whether the
    // partition is worth acting on.
    Q(
      "q268_modularity",
      (s, dir) => {
        import s.implicits._
        val pk = t(s, dir, "part")
          .filter($"p_brand".isin("Brand#1", "Brand#2", "Brand#3"))
          .select($"p_partkey")
        val ip = t(s, dir, "lineitem")
          .join(pk, $"l_partkey" === $"p_partkey")
          .select($"l_orderkey", $"l_partkey")
        // the projected edge relation feeds TWO operators (label
        // propagation's internal pin + modularity's) — unpinned, the
        // whole bipartite-projection chain re-executed per consumer
        val edges = graft.ext.Graph.bipartiteProject(ip, "l_orderkey", "l_partkey",
          maxDegree = 64).localCheckpoint(false)
        val labels = graft.ext.Graph.labelPropagation(edges, "a", "b", rounds = 4)
        graft.ext.Graph.modularity(edges, "a", "b", labels, "node", "community")
          .orderBy($"community")
      },
      Some(s"""
        WITH $LpChainSql,
        lab AS MATERIALIZED (SELECT id AS node, lbl AS community FROM l4),
        mm AS (SELECT COUNT(*) AS m FROM edges),
        ecc AS (
          SELECT la.community, COUNT(*) AS e_c
          FROM edges e
          JOIN lab la ON la.node = e.u
          JOIN lab lb ON lb.node = e.v
          WHERE la.community = lb.community
          GROUP BY la.community),
        degs AS (
          SELECT node, COUNT(*) AS deg FROM (
            SELECT u AS node FROM edges
            UNION ALL SELECT v AS node FROM edges)
          GROUP BY node),
        dcs AS (
          SELECT lab.community, CAST(SUM(degs.deg) AS BIGINT) AS d_c
          FROM degs JOIN lab USING (node) GROUP BY lab.community)
        SELECT dcs.community,
               CAST(COALESCE(ecc.e_c, 0) AS BIGINT) AS e_c, dcs.d_c,
               CAST((CAST(4 AS HUGEINT) * mm.m * COALESCE(ecc.e_c, 0) -
                     CAST(dcs.d_c AS HUGEINT) * dcs.d_c) * 1000000 //
                    (CAST(4 AS HUGEINT) * mm.m * mm.m) AS BIGINT) AS q_ppm
        FROM dcs LEFT JOIN ecc USING (community) CROSS JOIN mm
        ORDER BY community
      """)),
    // ----------------------------------------------------------------
    // Calibration curve for the q201 Naive Bayes scores: held-out
    // predictions joined to truth, ranked by winning score, cut into
    // 10 equal-depth bins — per bin the support, empirical accuracy
    // (ppm) and score stats, all integer floor-divisions. The oracle
    // shares the NB CTE chain and replays the rank/bin arithmetic.
    Q(
      "q215_nb_calibration",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val pred = graft.ext.LangModel.naiveBayesClassify(
          docs.filter($"doc_id" % 2 === 0),
          docs.filter($"doc_id" % 2 === 1),
          $"lang", $"doc_id", $"text")
        val joined = pred.join(
            docs.filter($"doc_id" % 2 === 1).select($"doc_id", $"lang"),
            Seq("doc_id"))
          .filter($"lang".isNotNull)
        graft.ext.Profile.calibrationCurve(joined,
            $"score_ppb", $"predicted" === $"lang", $"doc_id", buckets = 10)
          .orderBy($"bucket")
      },
      Some(s"""
        WITH $NbChainSql,
        nbsc AS (
          SELECT doc_id, y AS predicted, score_ppb
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY score_ppb DESC, y) AS rn FROM percls)
          WHERE rn = 1),
        pairs AS (
          SELECT p.doc_id, p.score_ppb AS sc, (p.predicted = d.lang) AS ok
          FROM nbsc p JOIN documents d USING (doc_id)
          WHERE d.lang IS NOT NULL),
        tot AS (SELECT COUNT(*) AS sz FROM pairs),
        rk AS (
          SELECT sc, ok,
                 (ROW_NUMBER() OVER (ORDER BY sc, doc_id) - 1) * 10 // sz AS bucket
          FROM pairs CROSS JOIN tot)
        SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n,
               CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               CAST(MIN(sc) AS BIGINT) AS min_score,
               CAST(MAX(sc) AS BIGINT) AS max_score,
               CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
                 AS BIGINT) AS accuracy_ppm,
               CAST(CAST(SUM(sc) AS HUGEINT) // COUNT(*) AS BIGINT) AS mean_score
        FROM rk GROUP BY 1 ORDER BY bucket
      """)),
    // ----------------------------------------------------------------
    // Exact tie-aware one-vs-rest AUC for the q201 scores: "is this
    // doc English", scored by the NB en-class ppb score. Mann–Whitney
    // rank identity over distinct-score groups — ×2 integers so ties
    // stay exact; the oracle replays the identical cumulative window.
    Q(
      "q218_nb_auc",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        // localCheckpoint (lazy): pin the full NB train+score chain to
        // storage before the docs join + AUC window so a pressure-evicted
        // shuffle block spills instead of re-running the chain (the
        // round-8/9 bimodal bench signature on this query).
        val scores = graft.ext.LangModel.naiveBayesScores(
            docs.filter($"doc_id" % 2 === 0),
            docs.filter($"doc_id" % 2 === 1),
            $"lang", $"doc_id", $"text")
          .filter($"y" === "en")
          .localCheckpoint(false)
        val joined = scores.join(
            docs.filter($"doc_id" % 2 === 1).select($"doc_id", $"lang"),
            Seq("doc_id"))
          .filter($"lang".isNotNull)
        graft.ext.Profile.aucExact(joined, $"score_ppb", $"lang" === "en")
      },
      Some(s"""
        WITH $NbChainSql,
        en AS (SELECT doc_id, score_ppb FROM percls WHERE y = 'en'),
        pairs AS (
          SELECT e.score_ppb AS s, (d.lang = 'en') AS y
          FROM en e JOIN documents d USING (doc_id)
          WHERE d.lang IS NOT NULL),
        g AS (
          SELECT s, SUM(CASE WHEN y THEN 1 ELSE 0 END) AS np,
                 SUM(CASE WHEN y THEN 0 ELSE 1 END) AS nn
          FROM pairs GROUP BY s),
        c AS (
          SELECT *, SUM(nn) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cumn
          FROM g)
        SELECT CAST(SUM(np) AS BIGINT) AS n_pos, CAST(SUM(nn) AS BIGINT) AS n_neg,
               CAST(SUM(np * (2 * (cumn - nn) + nn)) AS BIGINT) AS auc_x2,
               CAST(CASE WHEN SUM(np) > 0 AND SUM(nn) > 0
                    THEN SUM(np * (2 * (cumn - nn) + nn)) * 1000000
                         // (2 * SUM(np) * SUM(nn)) END AS BIGINT) AS auc_ppm
        FROM c
      """)),
    // ----------------------------------------------------------------
    // Sample-efficiency learning curve: NB trained on three NESTED
    // subsets of the training half (doc_id % 8 / % 4 / % 2 = 0 — each
    // a superset of the last), scored on the same held-out odd half —
    // accuracy vs training size, the table that says whether more
    // curated data is still buying model quality. The oracle
    // instantiates the suffixed NB chain three times.
    Q(
      "q223_nb_learning_curve",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val test = docs.filter($"doc_id" % 2 === 1)
        val truth = test.select($"doc_id", $"lang")
        Seq(8, 4, 2).map { m =>
          val train = docs.filter($"doc_id" % m === 0)
          val nTrain = train.filter($"lang".isNotNull && $"text".isNotNull)
            .agg(count(lit(1)).as("n_train"))
          graft.ext.LangModel.naiveBayesClassify(train, test,
              $"lang", $"doc_id", $"text")
            .join(truth, Seq("doc_id")).filter($"lang".isNotNull)
            .agg(count(lit(1)).as("n_scored"),
              sum(when($"predicted" === $"lang", 1L).otherwise(0L)).as("n_correct"))
            .crossJoin(broadcast(nTrain))
            .select(lit(m.toLong).as("modulus"), col("n_train"), col("n_scored"),
              col("n_correct"),
              expr("n_correct * 1000000L div n_scored").as("accuracy_ppm"))
        }.reduce(_ unionAll _).orderBy($"modulus")
      },
      Some {
        def arm(m: Int) = s"""
          pred$m AS (
            SELECT doc_id, y FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY score_ppb DESC, y) AS rn FROM percls$m)
            WHERE rn = 1),
          acc$m AS (
            SELECT COUNT(*) AS n_scored,
                   SUM(CASE WHEN p.y = d.lang THEN 1 ELSE 0 END) AS n_correct
            FROM pred$m p JOIN documents d USING (doc_id)
            WHERE d.lang IS NOT NULL),
          tn$m AS (
            SELECT COUNT(*) AS n_train FROM documents
            WHERE doc_id % $m = 0 AND lang IS NOT NULL AND text IS NOT NULL)"""
        def row(m: Int) =
          s"""SELECT CAST($m AS BIGINT) AS modulus, n_train, n_scored,
                     CAST(n_correct AS BIGINT) AS n_correct,
                     CAST(n_correct * 1000000 // n_scored AS BIGINT) AS accuracy_ppm
              FROM acc$m CROSS JOIN tn$m"""
        s"""
        WITH ${nbChainSql("8", "doc_id % 8 = 0")},
        ${nbChainSql("4", "doc_id % 4 = 0")},
        ${nbChainSql("2", "doc_id % 2 = 0")},
        ${arm(8)},
        ${arm(4)},
        ${arm(2)}
        ${Seq(8, 4, 2).map(row).mkString(" UNION ALL ")}
        ORDER BY modulus
        """
      })
  )
}
