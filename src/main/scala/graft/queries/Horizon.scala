package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.Retrieval
import Q._

/** Round-9 expansion batch: the persisted quantile-sketch algebra
  * (the q229 KMV pattern applied to rank queries), tokenizer-trainer
  * completion, and the prescriptive half of the LSH blocking family.
  */
object Horizon {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** q232 sketch budget: small enough that sf0.1's ~200k-row groups
    * compact through several levels (t=8), large enough for a ~3.6%
    * 1σ rank envelope.
    */
  private val QsK = 1024

  /** q234/q235 unigram-LM trainer configuration. */
  private val UniV = 24          // multi-char vocab slots
  private val UniRounds = 2      // hard-EM rounds
  private val UniLam = 10000000000L

  /** One prune+rescore step: every single char survives; top-V
    * multi-char pieces by (usage desc, piece asc); ppb scores over
    * the KEPT total — the exact `rescoreAndPrune` floor math.
    */
  private def uniPruneSql(src: String, kept: String, scored: String): String =
    s"""$kept AS (
       |  SELECT piece, usage FROM $src WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, usage FROM (
       |    SELECT piece, usage, ROW_NUMBER() OVER (ORDER BY usage DESC, piece) AS rk
       |    FROM $src WHERE length(piece) > 1 AND usage > 0)
       |  WHERE rk <= $UniV),
       |$scored AS (SELECT piece,
       |  usage * 1000000000 // (SELECT SUM(usage) FROM $kept) AS score FROM $kept)"""
      .stripMargin

  /** One hard-EM round: score every segmentation of every distinct
    * word (mask-enumerated over the shared `um` relation) under the
    * previous round's scores with the additive Σ(score − λ) objective,
    * pick the canonical argmax — (value DESC, boundaries-from-right
    * ASC), the enumeration twin of the Spark Viterbi backtrace — and
    * re-count piece usage word-frequency-weighted.
    */
  /** Canonical segmentation of every distinct word under `prevScores`:
    * score every cut-mask of the shared `um` relation with the
    * additive Σ(score − λ) objective and keep the (value DESC,
    * boundaries-from-right ASC) argmax — the enumeration twin of the
    * Spark Viterbi backtrace.
    */
  private def uniSegSql(r: Int, prevScores: String): String =
    s"""ue$r AS (
       |  SELECT p0.w, p0.cnt, p0.mask,
       |         BOOL_AND(length(p0.piece) <= 4 AND
       |                  (v.score IS NOT NULL OR length(p0.piece) = 1)) AS valid,
       |         SUM(COALESCE(v.score, 0) - $UniLam) AS val
       |  FROM (SELECT w, cnt, mask, unnest(pieces) AS piece FROM um) p0
       |  LEFT JOIN $prevScores v ON v.piece = p0.piece
       |  GROUP BY 1, 2, 3),
       |useg$r AS (
       |  SELECT w, cnt, pieces FROM (
       |    SELECT e.w, e.cnt, m.pieces,
       |           ROW_NUMBER() OVER (PARTITION BY e.w
       |             ORDER BY e.val DESC, m.btkey) AS rn
       |    FROM ue$r e JOIN um m ON m.w = e.w AND m.mask = e.mask
       |    WHERE e.valid) WHERE rn = 1)""".stripMargin

  private def uniRoundSql(r: Int, prevScores: String): String =
    s"""${uniSegSql(r, prevScores)},
       |uu$r AS (SELECT piece, SUM(cnt) AS usage FROM (
       |          SELECT w, cnt, unnest(pieces) AS piece FROM useg$r) GROUP BY 1),
       |${uniPruneSql(s"uu$r", s"uv$r", s"us$r")}""".stripMargin

  /** The full trainer chain: distinct-word counts → substring seed →
    * prune/rescore → `UniRounds` hard-EM rounds. `um` enumerates every
    * cut-mask segmentation ONCE (words here are ≤ 8 chars → ≤ 128
    * masks); both EM rounds and the encode twin reuse it.
    */
  private val UniChainSql: String = {
    val rounds = (1 to UniRounds)
      .map(r => uniRoundSql(r, if (r == 1) "us0" else s"us${r - 1}"))
      .mkString(",\n")
    s"""uwords AS MATERIALIZED (
       |  -- LOUD bound check: the seed range(1,9) and 128-mask cut
       |  -- enumeration below cover words up to 8 chars only (the Spark
       |  -- trainer handles any length); a longer token must fail fast
       |  -- here, not silently shrink the segmentation space.
       |  SELECT CASE WHEN length(w0) <= 8 THEN w0
       |              ELSE error('unigram oracle: word exceeds the 8-char '
       |                         || 'enumeration bound: ' || w0) END AS w,
       |         cnt FROM (
       |    SELECT t AS w0, COUNT(*) AS cnt FROM (
       |      SELECT unnest(${OracleSql.tokens("text")}) AS t
       |      FROM documents WHERE text IS NOT NULL)
       |    GROUP BY 1)),
       |useed AS (
       |  SELECT piece, SUM(cnt) AS usage FROM (
       |    SELECT w, cnt, substring(w, CAST(i AS INT), CAST(d AS INT)) AS piece
       |    FROM uwords,
       |         (SELECT unnest(range(1, 9)) AS i),
       |         (SELECT unnest(range(1, 5)) AS d)
       |    WHERE i + d - 1 <= length(w))
       |  GROUP BY 1),
       |${uniPruneSql("useed", "uv0", "us0")},
       |um AS MATERIALIZED (
       |  SELECT w, cnt, mask,
       |         [substring(w, CAST(bounds[i]+1 AS INT), CAST(bounds[i+1]-bounds[i] AS INT))
       |          FOR i IN range(1, len(bounds))] AS pieces,
       |         list_append(list_reverse(list_sort([p FOR p IN range(1, length(w))
       |            IF (mask >> CAST(p-1 AS INT)) & 1 = 1])), 0) AS btkey
       |  FROM (SELECT w, cnt, mask,
       |           list_prepend(0, list_append([p FOR p IN range(1, length(w))
       |              IF (mask >> CAST(p-1 AS INT)) & 1 = 1], length(w))) AS bounds
       |        FROM uwords, (SELECT unnest(range(0, 128)) AS mask)
       |        WHERE mask < (1 << CAST(length(w)-1 AS INT)))),
       |$rounds""".stripMargin
  }

  /** One IRLS round in DuckDB — the exact twin of groupedLogit2's
    * `step`: integer ppm link math (`//` truncates toward zero, the
    * same semantics as Spark's `div`; the sigmoid numerator is
    * non-negative by construction), HUGEINT-exact weighted moments
    * cast to double, the 5%-ridged Cramer 3×3, β back to clamped ppm
    * longs.
    */
  private def irlsRoundSql(r: Int): String =
    s"""lit$r AS (
       |  SELECT w.grp, w.x1, w.x2, w.y,
       |         b.b0 + b.b1 * w.x1 + b.b2 * w.x2 AS eta
       |  FROM lrows w JOIN lb${r - 1} b USING (grp)),
       |lmu$r AS (
       |  SELECT *, (500000 * (1000000 + abs(eta) + eta)) // (1000000 + abs(eta)) AS mu
       |  FROM lit$r),
       |lwz$r AS (
       |  SELECT grp, x1, x2, w,
       |         eta + ((y - mu) * 1000000 // w) AS z
       |  FROM (SELECT *, GREATEST(mu * (1000000 - mu) // 1000000, 1) AS w FROM lmu$r)),
       |lagg$r AS (
       |  SELECT grp,
       |    CAST(SUM(CAST(w AS HUGEINT)) AS DOUBLE) * 1.05 AS sw,
       |    CAST(SUM(CAST(w AS HUGEINT) * x1) AS DOUBLE) AS s1,
       |    CAST(SUM(CAST(w AS HUGEINT) * x2) AS DOUBLE) AS s2,
       |    CAST(SUM(CAST(w AS HUGEINT) * x1 * x1) AS DOUBLE) * 1.05 AS s11,
       |    CAST(SUM(CAST(w AS HUGEINT) * x1 * x2) AS DOUBLE) AS s12,
       |    CAST(SUM(CAST(w AS HUGEINT) * x2 * x2) AS DOUBLE) * 1.05 AS s22,
       |    CAST(SUM(CAST(w AS HUGEINT) * z) AS DOUBLE) AS sz,
       |    CAST(SUM(CAST(w AS HUGEINT) * x1 * z) AS DOUBLE) AS s1z,
       |    CAST(SUM(CAST(w AS HUGEINT) * x2 * z) AS DOUBLE) AS s2z
       |  FROM lwz$r GROUP BY 1),
       |lb$r AS (
       |  SELECT grp,
       |    CASE WHEN det <> 0 THEN GREATEST(LEAST(
       |        CAST(floor(d0 / det + 0.5) AS BIGINT),
       |        1000000000), -1000000000) ELSE 0 END AS b0,
       |    CASE WHEN det <> 0 THEN GREATEST(LEAST(
       |        CAST(floor(d1 / det + 0.5) AS BIGINT),
       |        1000000000), -1000000000) ELSE 0 END AS b1,
       |    CASE WHEN det <> 0 THEN GREATEST(LEAST(
       |        CAST(floor(d2 / det + 0.5) AS BIGINT),
       |        1000000000), -1000000000) ELSE 0 END AS b2
       |  FROM (
       |    SELECT grp,
       |      sw * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
       |        + s2 * (s1 * s12 - s11 * s2) AS det,
       |      sz * (s11 * s22 - s12 * s12) - s1z * (s1 * s22 - s12 * s2)
       |        + s2z * (s1 * s12 - s11 * s2) AS d0,
       |      sw * (s1z * s22 - s2z * s12) - s1 * (sz * s22 - s2z * s2)
       |        + s2 * (sz * s12 - s1z * s2) AS d1,
       |      sw * (s11 * s2z - s12 * s1z) - s1 * (s1 * s2z - s12 * sz)
       |        + s2 * (s1 * s1z - s11 * sz) AS d2
       |    FROM lagg$r))""".stripMargin

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // Persisted mergeable quantile sketch + merge identity + rank
    // envelope: the q229 closer for rank queries. Per l_returnflag,
    // sketch the price distribution (hash-leveled deterministic
    // sample, threshold t auto-picked to fit k=1024); prove
    // sketch(whole) == merge(sketch(even orders), sketch(odd orders))
    // cell-for-cell; estimate q25/q50/q90 from the sketch alone and
    // check the EXACT rank of each estimate against its target within
    // the 3σ bound ⌊3·√(n·2ᵗ)⌋ + 2ᵗ. Everything is integer floor
    // math over md5-derived levels, so DuckDB replays every cell,
    // threshold, index, and verdict.
    Q(
      "q232_quantile_sketch_merge",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
          .filter($"l_returnflag".isNotNull && $"l_extendedprice".isNotNull)
          .select($"l_returnflag".as("grp"),
            concat($"l_orderkey".cast("string"), lit("-"),
              $"l_linenumber".cast("string")).as("id"),
            floor($"l_extendedprice").cast("long").as("v"),
            $"l_orderkey".as("ok"))
        val whole = Retrieval.quantileSketch(li, $"grp", $"v", $"id", QsK)
        val even = Retrieval.quantileSketch(
          li.filter($"ok" % 2 === 0), $"grp", $"v", $"id", QsK)
        val odd = Retrieval.quantileSketch(
          li.filter($"ok" % 2 === 1), $"grp", $"v", $"id", QsK)
        val merged = Retrieval.quantileSketchMerge(even, odd, QsK)
        val est = Retrieval.quantileSketchQuantiles(
          whole, Seq(250000L, 500000L, 900000L))
        val trueRank = li
          .join(broadcast(est.select($"grp", $"q_ppm", $"est_v")), Seq("grp"))
          .groupBy($"grp", $"q_ppm")
          .agg(sum(when($"v" <= $"est_v", 1L).otherwise(0L)).as("true_rank"))
        val p2t = expr("shiftleft(CAST(1 AS BIGINT), t)")
        est.join(trueRank, Seq("grp", "q_ppm"))
          .join(whole.select($"grp", $"t".as("__tw"), $"n".as("__nw"),
            $"items".as("__iw")), Seq("grp"))
          .join(merged.select($"grp", $"t".as("__tm"), $"n".as("__nm"),
            $"items".as("__im")), Seq("grp"))
          .select($"grp", $"q_ppm", $"t".cast("long").as("t"), $"n", $"n_sketch", $"est_v",
            $"target_rank", $"true_rank",
            (abs($"true_rank" - $"target_rank") <=
              floor(lit(3.0) * sqrt($"n".cast("double") * p2t.cast("double")))
                .cast("long") + p2t).as("within_bound"),
            ($"__tw" === $"__tm" && $"__nw" === $"__nm" && $"__iw" === $"__im")
              .as("sketch_equal"))
          .orderBy($"grp", $"q_ppm")
      },
      Some(s"""
        WITH raw AS (
          SELECT l_returnflag AS grp,
                 CAST(l_orderkey AS VARCHAR)||'-'||CAST(l_linenumber AS VARCHAR) AS id,
                 CAST(floor(l_extendedprice) AS BIGINT) AS v, l_orderkey AS ok
          FROM lineitem
          WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
        base AS (
          SELECT grp, v, ok, ${OracleSql.hash64("id")} AS h FROM raw),
        lvl AS (SELECT *, CASE WHEN h = 0 OR h = -9223372036854775808 THEN 40
                               ELSE LEAST(40, CAST(bit_count((h & (-h)) - 1) AS INT)) END AS l
                FROM base),
        cgw AS (SELECT grp, T, COUNT(*) FILTER (l >= T) AS cnt
                FROM lvl CROSS JOIN (SELECT unnest(range(0,41)) AS T) GROUP BY 1,2),
        tw AS (SELECT grp, MIN(T) FILTER (cnt <= $QsK) AS t FROM cgw GROUP BY 1),
        nw AS (SELECT grp, COUNT(*) AS n FROM lvl GROUP BY 1),
        skw AS (SELECT s.grp, t, n,
                       list(struct_pack(v := s.v, h := s.h, l := s.l)
                            ORDER BY s.v, s.h) AS items
                FROM lvl s JOIN tw USING (grp) JOIN nw USING (grp)
                WHERE l >= t GROUP BY 1, t, n),
        cge AS (SELECT grp, T, COUNT(*) FILTER (l >= T) AS cnt
                FROM lvl CROSS JOIN (SELECT unnest(range(0,41)) AS T)
                WHERE ok % 2 = 0 GROUP BY 1,2),
        te AS (SELECT grp, MIN(T) FILTER (cnt <= $QsK) AS t FROM cge GROUP BY 1),
        ne AS (SELECT grp, COUNT(*) AS n FROM lvl WHERE ok % 2 = 0 GROUP BY 1),
        ske AS (SELECT s.grp, t, n,
                       list(struct_pack(v := s.v, h := s.h, l := s.l)
                            ORDER BY s.v, s.h) AS items
                FROM lvl s JOIN te USING (grp) JOIN ne USING (grp)
                WHERE ok % 2 = 0 AND l >= t GROUP BY 1, t, n),
        cgo AS (SELECT grp, T, COUNT(*) FILTER (l >= T) AS cnt
                FROM lvl CROSS JOIN (SELECT unnest(range(0,41)) AS T)
                WHERE ok % 2 = 1 GROUP BY 1,2),
        to_ AS (SELECT grp, MIN(T) FILTER (cnt <= $QsK) AS t FROM cgo GROUP BY 1),
        no_ AS (SELECT grp, COUNT(*) AS n FROM lvl WHERE ok % 2 = 1 GROUP BY 1),
        sko AS (SELECT s.grp, t, n,
                       list(struct_pack(v := s.v, h := s.h, l := s.l)
                            ORDER BY s.v, s.h) AS items
                FROM lvl s JOIN to_ USING (grp) JOIN no_ USING (grp)
                WHERE ok % 2 = 1 AND l >= t GROUP BY 1, t, n),
        mu AS (
          SELECT grp, tmin, nm, x.v AS v, x.h AS h, x.l AS l
          FROM (SELECT e.grp, GREATEST(e.t, o.t) AS tmin, e.n + o.n AS nm,
                       unnest(list_concat(e.items, o.items)) AS x
                FROM ske e JOIN sko o USING (grp))),
        cgm AS (SELECT grp, T, COUNT(*) FILTER (l >= T) AS cnt,
                       MAX(tmin) AS tmin, MAX(nm) AS nm
                FROM mu CROSS JOIN (SELECT unnest(range(0,41)) AS T)
                WHERE T >= tmin GROUP BY 1,2),
        tm AS (SELECT grp, MIN(T) FILTER (cnt <= $QsK) AS t, MAX(nm) AS nm
               FROM cgm GROUP BY 1),
        skm AS (SELECT m.grp, tm.t, tm.nm,
                       list(struct_pack(v := m.v, h := m.h, l := m.l)
                            ORDER BY m.v, m.h) AS items
                FROM mu m JOIN tm USING (grp)
                WHERE m.l >= tm.t GROUP BY 1, tm.t, tm.nm),
        est AS (
          SELECT w.grp, q.q_ppm, w.t, w.n, len(w.items) AS n_sketch,
                 GREATEST(1, (q.q_ppm * w.n + 999999) // 1000000) AS target_rank,
                 w.items[CAST(LEAST(len(w.items),
                    (GREATEST(1, (q.q_ppm * w.n + 999999) // 1000000)
                     + (CAST(1 AS BIGINT) << CAST(t AS INT)) - 1) // (CAST(1 AS BIGINT) << CAST(t AS INT))) AS INT)].v AS est_v
          FROM skw w CROSS JOIN
               (SELECT unnest([250000, 500000, 900000]) AS q_ppm) q),
        tr AS (
          SELECT e.grp, e.q_ppm, COUNT(*) FILTER (b.v <= e.est_v) AS true_rank
          FROM est e JOIN base b USING (grp) GROUP BY 1, 2)
        SELECT e.grp, CAST(e.q_ppm AS BIGINT) AS q_ppm, e.t, e.n,
               CAST(e.n_sketch AS BIGINT) AS n_sketch, e.est_v,
               CAST(e.target_rank AS BIGINT) AS target_rank, t2.true_rank,
               abs(t2.true_rank - e.target_rank) <=
                 CAST(floor(3*sqrt(CAST(e.n AS DOUBLE) * (CAST(1 AS BIGINT) << CAST(e.t AS INT)))) AS BIGINT)
                 + (CAST(1 AS BIGINT) << CAST(e.t AS INT)) AS within_bound,
               (w.t = m.t AND w.items = m.items AND w.n = m.nm) AS sketch_equal
        FROM est e JOIN tr t2 USING (grp, q_ppm)
             JOIN skw w ON w.grp = e.grp JOIN skm m ON m.grp = e.grp
        ORDER BY grp, q_ppm
      """)),
    // ----------------------------------------------------------------
    // MinHash band auto-tuner: the prescriptive closer of the blocking
    // family (q224 scores after the fact, q230 prescribes salts) — for
    // a 16-hash signature budget and a 0.5 Jaccard target, the full
    // (bands, rows) S-curve in exact ppm folds and the chosen
    // operating point (max catch-vs-fp gap, fewest bands on ties).
    // The result certifies the q35 default: 8 bands × 2 rows wins with
    // a 0.497 gap. Wired into Dedup.minhashLshPairsAuto.
    Q(
      "q233_lsh_band_plan",
      (s, dir) => {
        import s.implicits._
        graft.ext.Dedup.lshBandPlan(s, sigLen = 16,
            targetPpm = 500000L, fpPpm = 250000L)
          .select($"bands".cast("long").as("bands"),
            $"rows_per_band".cast("long").as("rows_per_band"),
            $"p_catch_ppm", $"p_fp_ppm", $"gap_ppm", $"chosen")
          .orderBy($"bands")
      },
      Some("""
        WITH pairs AS (
          SELECT b AS bands, 16//b AS rows_per_band
          FROM (SELECT unnest(range(1, 17)) AS b) WHERE 16 % b = 0),
        p AS (
          SELECT bands, rows_per_band,
            list_reduce(list_prepend(CAST(1000000 AS BIGINT),
              list_transform(range(CAST(rows_per_band AS INT)),
                i -> CAST(500000 AS BIGINT))),
              (a, x) -> a * x // 1000000) AS pr_t,
            list_reduce(list_prepend(CAST(1000000 AS BIGINT),
              list_transform(range(CAST(rows_per_band AS INT)),
                i -> CAST(250000 AS BIGINT))),
              (a, x) -> a * x // 1000000) AS pr_f
          FROM pairs),
        pc AS (
          SELECT bands, rows_per_band,
            1000000 - list_reduce(list_prepend(CAST(1000000 AS BIGINT),
              list_transform(range(CAST(bands AS INT)), i -> 1000000 - pr_t)),
              (a, x) -> a * x // 1000000) AS p_catch_ppm,
            1000000 - list_reduce(list_prepend(CAST(1000000 AS BIGINT),
              list_transform(range(CAST(bands AS INT)), i -> 1000000 - pr_f)),
              (a, x) -> a * x // 1000000) AS p_fp_ppm
          FROM p)
        SELECT CAST(bands AS BIGINT) AS bands,
               CAST(rows_per_band AS BIGINT) AS rows_per_band,
               p_catch_ppm, p_fp_ppm, p_catch_ppm - p_fp_ppm AS gap_ppm,
               ROW_NUMBER() OVER (ORDER BY p_catch_ppm - p_fp_ppm DESC, bands ASC) = 1
                 AS chosen
        FROM pc ORDER BY bands
      """)),
    // ----------------------------------------------------------------
    // Unigram-LM (SentencePiece-style) tokenizer TRAINER: substring
    // seed inventory → 2 hard-EM rounds (integer Viterbi E-step under
    // the additive Σ(score_ppb − λ) objective, usage-recount M-step,
    // prune to every-char + top-24 multi pieces). The oracle replays
    // the EM by enumerating every cut-mask segmentation per distinct
    // word and applying the canonical (value DESC, boundaries-from-
    // right ASC) argmax — provably the same segmentation the Spark
    // backtrace picks. Output: the final model relation.
    Q(
      "q234_unigram_lm_train",
      (s, dir) => {
        import s.implicits._
        graft.ext.TextAnalysis.unigramLmTrain(
            t(s, dir, "documents"), $"text",
            vocabSize = UniV, rounds = UniRounds, maxPieceLen = 4,
            lambdaPpb = UniLam)
          .orderBy($"piece")
      },
      Some(s"""
        WITH $UniChainSql
        SELECT v.piece, CAST(v.usage AS BIGINT) AS usage,
               CAST(s.score AS BIGINT) AS score_ppb,
               length(v.piece) = 1 AS is_char
        FROM uv$UniRounds v JOIN us$UniRounds s USING (piece)
        ORDER BY piece
      """)),
    // ----------------------------------------------------------------
    // Unigram-LM ENCODE — the inference twin (the q202 pattern):
    // train on the corpus, then Viterbi-encode the corpus under the
    // learned piece table. The heavy DP runs once per DISTINCT word
    // and broadcast-joins back to the token stream; per doc the raw
    // token count, total piece count, ppm expansion and the first
    // word's pieces.
    Q(
      "q235_unigram_lm_encode",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val model = graft.ext.TextAnalysis.unigramLmTrain(
            docs, $"text", vocabSize = UniV, rounds = UniRounds,
            maxPieceLen = 4, lambdaPpb = UniLam)
          .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
        graft.ext.TextAnalysis.unigramLmEncode(
            docs, $"doc_id", $"text", model, maxPieceLen = 4,
            lambdaPpb = UniLam)
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH $UniChainSql,
        ${uniSegSql(UniRounds + 1, s"us$UniRounds")},
        toks AS (
          SELECT doc_id, generate_subscripts(ts, 1) - 1 AS pos, unnest(ts) AS w
          FROM (SELECT doc_id, ${OracleSql.tokens("text")} AS ts
                FROM documents WHERE text IS NOT NULL
                  AND len(${OracleSql.tokens("text")}) >= 1))
        SELECT t.doc_id, COUNT(*) AS n_raw,
               CAST(SUM(len(g.pieces)) AS BIGINT) AS n_pieces,
               CAST(SUM(len(g.pieces)) * 1000000 // COUNT(*) AS BIGINT) AS ratio_ppm,
               MAX(CASE WHEN t.pos = 0
                   THEN array_to_string(g.pieces, '|') END) AS head_pieces
        FROM toks t JOIN useg${UniRounds + 1} g ON g.w = t.w
        GROUP BY 1 ORDER BY doc_id
      """)),
    // ----------------------------------------------------------------
    // Grouped logistic regression via IRLS — the trainable classifier
    // beyond Naive Bayes (q201): per source, 3 IRLS rounds fitting
    // P(lang = en) from (n_chars/10, token count), every round one
    // weighted-moment aggregate + the 5%-ridged q226 Cramer solve.
    // Integer-ppm
    // algebraic-sigmoid link + floor divisions + HUGEINT/decimal
    // moments make all three rounds AND the final accuracy replay
    // bit-for-bit in DuckDB (the unrolled lb1..lb3 CTEs).
    Q(
      "q236_grouped_logit",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .filter($"text".isNotNull && $"lang".isNotNull && $"source".isNotNull)
          .withColumn("grp", $"source")
        graft.ext.Profile.groupedLogit2(
            docs, Seq("grp"),
            expr("n_chars div 10"),
            size(graft.ext.TextHash.tokens($"text")),
            $"lang" === "en", iters = 3)
          .orderBy($"grp")
      },
      Some(s"""
        WITH lrows AS MATERIALIZED (
          -- mirror groupedLogit2's ±1e6 feature clamp (clampX) so a
          -- corpus with n_chars >= 1e7 keeps bit-parity of every round
          SELECT source AS grp,
                 GREATEST(LEAST(n_chars // 10, 1000000), -1000000) AS x1,
                 GREATEST(LEAST(CAST(len(${OracleSql.tokens("text")}) AS BIGINT),
                   1000000), -1000000) AS x2,
                 CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS y
          FROM documents
          WHERE text IS NOT NULL AND lang IS NOT NULL AND source IS NOT NULL),
        lb0 AS (SELECT DISTINCT grp, 0 AS b0, 0 AS b1, 0 AS b2 FROM lrows),
        ${(1 to 3).map(irlsRoundSql).mkString(",\n")}
        SELECT w.grp, COUNT(*) AS n,
               CAST(SUM(CASE WHEN w.y = 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
               CAST(MAX(b.b0) AS BIGINT) AS b0_ppm,
               CAST(MAX(b.b1) AS BIGINT) AS b1_ppm,
               CAST(MAX(b.b2) AS BIGINT) AS b2_ppm,
               CAST(SUM(CASE WHEN (b.b0 + b.b1 * w.x1 + b.b2 * w.x2 >= 0)
                                = (w.y = 1000000) THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT) AS acc_ppm
        FROM lrows w JOIN lb3 b USING (grp)
        GROUP BY 1 ORDER BY grp
      """)),
    // ----------------------------------------------------------------
    // Kaplan–Meier survival per user segment: cohort = per-user
    // (activity span in hours, churn = silent > 1 day before the
    // observation end), then the product-limit estimator with
    // right-censoring — at-risk counts from ONE descending window,
    // survival as an exact integer ppm fold. The oracle replays the
    // fold with a recursive CTE; every at-risk/event/censor count and
    // every floor product matches bit-for-bit.
    Q(
      "q237_kaplan_meier",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
          .filter($"ts".isNotNull && $"user_id".isNotNull)
        val per = ev.groupBy($"user_id")
          .agg(min(unix_timestamp($"ts")).as("f"), max(unix_timestamp($"ts")).as("l"))
        val cohort = per.crossJoin(broadcast(per.agg(max($"l").as("obs_end"))))
          .select(($"user_id" % 3).as("seg"),
            expr("(l - f) div 3600").as("dur"),
            ($"l" < $"obs_end" - 86400L).as("churned"))
        graft.ext.Profile.kaplanMeier(cohort, $"seg", $"dur", $"churned",
            maxSteps = 100000)
          .select($"grp".as("seg"), $"t", $"n_risk", $"d_events",
            $"c_censored", $"surv_ppm")
          .orderBy($"seg", $"t")
      },
      Some("""
        WITH RECURSIVE pu AS (
          SELECT user_id, CAST(floor(MIN(epoch(ts))) AS BIGINT) AS f,
                 CAST(floor(MAX(epoch(ts))) AS BIGINT) AS l
          FROM events
          WHERE ts IS NOT NULL AND user_id IS NOT NULL GROUP BY 1),
        oe AS (SELECT MAX(l) AS obs_end FROM pu),
        cohort AS (
          SELECT user_id % 3 AS seg, (l - f) // 3600 AS dur,
                 (l < obs_end - 86400) AS churned
          FROM pu CROSS JOIN oe),
        st AS (SELECT seg, dur AS t,
                      SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS d,
                      SUM(CASE WHEN churned THEN 0 ELSE 1 END) AS c
               FROM cohort GROUP BY 1, 2),
        sn AS (SELECT *, SUM(d + c) OVER (PARTITION BY seg ORDER BY t DESC
                 ROWS UNBOUNDED PRECEDING) AS n FROM st),
        sr AS (SELECT seg, t, n, d, c,
                      ROW_NUMBER() OVER (PARTITION BY seg ORDER BY t) AS rn
               FROM sn),
        rec AS (
          SELECT seg, t, n, d, c, rn, 1000000 * (n - d) // n AS surv
          FROM sr WHERE rn = 1
          UNION ALL
          SELECT s.seg, s.t, s.n, s.d, s.c, s.rn, r.surv * (s.n - s.d) // s.n
          FROM sr s JOIN rec r ON s.seg = r.seg AND s.rn = r.rn + 1)
        SELECT seg, t, CAST(n AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS d_events,
               CAST(c AS BIGINT) AS c_censored, CAST(surv AS BIGINT) AS surv_ppm
        FROM rec ORDER BY seg, t
      """)),
    // ----------------------------------------------------------------
    // Train/val/test near-dup leakage audit: hash split (q72) ×
    // verified MinHash-LSH pairs (q35) → per unordered split
    // combination the pair count, cross-boundary flag, and ppm share.
    // Every cross row is evaluation contamination the split shipped.
    Q(
      "q238_split_leakage",
      (s, dir) => {
        import s.implicits._
        graft.ext.Dedup.splitLeakage(t(s, dir, "documents"), "doc_id", "text",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .orderBy($"split_a", $"split_b")
      },
      Some {
        val params = graft.ext.TextHash.minhashParams(16)
        val seedRows = params.zipWithIndex
          .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
        val h = (v: String) => OracleSql.hash64("'0'", v)
        s"""
        WITH sh AS (SELECT doc_id,
                      list_distinct(list_transform(${OracleSql.wordShingles3("text")},
                        g -> ${h("g")} % 2147483647)) AS shingles
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
          FROM bandkey a JOIN bandkey b ON a.key = b.key AND a.doc_id < b.doc_id),
        verified AS (
          SELECT id_a, id_b
          FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
          WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
                CAST(len(sa.shingles) + len(sb.shingles)
                     - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) >= 0.5),
        lbl AS (
          SELECT doc_id,
                 CASE WHEN bkt < 8000 THEN 'train'
                      WHEN bkt < 9000 THEN 'val'
                      ELSE 'test' END AS split
          FROM (SELECT doc_id, ${h("CAST(doc_id AS VARCHAR)")} % 10000 AS bkt
                FROM documents)),
        tagged AS (
          SELECT LEAST(la.split, lb.split) AS split_a,
                 GREATEST(la.split, lb.split) AS split_b
          FROM verified v JOIN lbl la ON la.doc_id = v.id_a
                          JOIN lbl lb ON lb.doc_id = v.id_b),
        counts AS (
          SELECT split_a, split_b, COUNT(*) AS n_pairs FROM tagged GROUP BY 1, 2),
        tot AS (SELECT SUM(n_pairs) AS t FROM counts)
        SELECT split_a, split_b, n_pairs, split_a <> split_b AS cross,
               CAST(n_pairs * 1000000 // t AS BIGINT) AS share_ppm
        FROM counts CROSS JOIN tot
        ORDER BY split_a, split_b
      """
      }),
    // ----------------------------------------------------------------
    // Log-rank (Mantel–Cox) test between the q237 segments' churn
    // curves, every unordered pair: observed vs hypergeometric-expected
    // events at pooled event times, χ² as an exact integral division
    // over ppm/pp12 decimal sums. At-risk counts at the other group's
    // times fill via the q137 LOCF idiom over descending t.
    Q(
      "q239_log_rank",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
          .filter($"ts".isNotNull && $"user_id".isNotNull)
        val per = ev.groupBy($"user_id")
          .agg(min(unix_timestamp($"ts")).as("f"), max(unix_timestamp($"ts")).as("l"))
        val cohort = per.crossJoin(broadcast(per.agg(max($"l").as("obs_end"))))
          .select(($"user_id" % 3).cast("string").as("seg"),
            expr("(l - f) div 3600").as("dur"),
            ($"l" < $"obs_end" - 86400L).as("churned"))
        graft.ext.Profile.logRankTest(cohort, $"seg", $"dur", $"churned")
          .orderBy($"group_a", $"group_b")
      },
      Some("""
        WITH pu AS (
          SELECT user_id, CAST(floor(MIN(epoch(ts))) AS BIGINT) AS f,
                 CAST(floor(MAX(epoch(ts))) AS BIGINT) AS l
          FROM events
          WHERE ts IS NOT NULL AND user_id IS NOT NULL GROUP BY 1),
        oe AS (SELECT MAX(l) AS obs_end FROM pu),
        cohort AS (
          SELECT CAST(user_id % 3 AS VARCHAR) AS g, (l - f) // 3600 AS t,
                 (l < obs_end - 86400) AS e
          FROM pu CROSS JOIN oe),
        st AS (SELECT g, t, SUM(CASE WHEN e THEN 1 ELSE 0 END) AS d,
                      COUNT(*) AS tot
               FROM cohort GROUP BY 1, 2),
        sn AS (SELECT g, t, d, SUM(tot) OVER (PARTITION BY g ORDER BY t DESC
                 ROWS UNBOUNDED PRECEDING) AS n FROM st),
        gs AS (SELECT DISTINCT g FROM sn),
        prs AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g),
        tagged AS (
          SELECT ga, gb, t,
                 MAX(CASE WHEN g = ga THEN n END) AS rn1,
                 SUM(CASE WHEN g = ga THEN d ELSE 0 END) AS d1,
                 MAX(CASE WHEN g = gb THEN n END) AS rn2,
                 SUM(CASE WHEN g = gb THEN d ELSE 0 END) AS d2
          FROM sn JOIN prs ON g = ga OR g = gb
          GROUP BY 1, 2, 3),
        filled AS (
          SELECT ga, gb, t, d1, d2,
                 COALESCE(LAST_VALUE(rn1 IGNORE NULLS) OVER (
                   PARTITION BY ga, gb ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS n1,
                 COALESCE(LAST_VALUE(rn2 IGNORE NULLS) OVER (
                   PARTITION BY ga, gb ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS n2
          FROM tagged),
        terms AS (
          SELECT ga, gb, d1, d2, n1, n2, d1 + d2 AS d, n1 + n2 AS n
          FROM filled WHERE d1 + d2 > 0),
        agg AS (
          SELECT ga, gb, SUM(d1) AS o1, SUM(d2) AS o2,
                 SUM(CAST(d AS HUGEINT) * n1 * 1000000 // n) AS e1,
                 SUM(CASE WHEN n > 1 THEN
                     CAST(d AS HUGEINT) * n1 * n2 * (n - d) * 1000000000000
                       // (CAST(n AS HUGEINT) * n * (n - 1))
                     ELSE 0 END) AS v
          FROM terms GROUP BY 1, 2)
        SELECT ga AS group_a, gb AS group_b,
               CAST(o1 AS BIGINT) AS o1, CAST(o2 AS BIGINT) AS o2,
               CAST(e1 AS BIGINT) AS e1_ppm,
               CASE WHEN v > 0 THEN CAST(
                 (CAST(o1 AS HUGEINT) * 1000000 - e1) *
                 (CAST(o1 AS HUGEINT) * 1000000 - e1) * 1000 // v AS BIGINT)
               END AS chi2_milli
        FROM agg ORDER BY group_a, group_b
      """)),
    // ----------------------------------------------------------------
    // nDCG@10 per source: a deterministic retrieval run (docs ranked
    // by n_chars within each source) scored against graded language
    // relevance (en=3, de=2, fr=1, else 0). The log2 discounts are
    // micro-fixed-point literals shared verbatim by both engines, so
    // the whole metric — gains, DCG, IDCG, the ppm ratio — is integer
    // arithmetic with zero libm exposure.
    Q(
      "q240_ndcg_at_k",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .filter($"source".isNotNull && $"doc_id".isNotNull &&
            $"n_chars".isNotNull && $"lang".isNotNull)
        graft.ext.Retrieval.ndcgAtK(docs, $"source", $"doc_id", $"n_chars",
            when($"lang" === "en", 3L).when($"lang" === "de", 2L)
              .when($"lang" === "fr", 1L).otherwise(0L), k = 10)
          .orderBy($"query")
      },
      Some {
        val discs = (1 to 10).map(r =>
          math.floor(1e6 / (math.log(r + 1) / math.log(2)) + 0.5).toLong)
        val discRows = discs.zipWithIndex
          .map { case (d, i) => s"(${i + 1}, ${d})" }.mkString(", ")
        s"""
        WITH base AS (
          SELECT source AS q, doc_id AS i, n_chars AS s,
                 CASE lang WHEN 'en' THEN 3 WHEN 'de' THEN 2
                           WHEN 'fr' THEN 1 ELSE 0 END AS r
          FROM documents
          WHERE source IS NOT NULL AND doc_id IS NOT NULL
            AND n_chars IS NOT NULL AND lang IS NOT NULL),
        rk AS (
          SELECT q, i,
                 (CAST(1 AS BIGINT) << CAST(LEAST(GREATEST(r, 0), 30) AS INT)) - 1 AS g,
                 ROW_NUMBER() OVER (PARTITION BY q ORDER BY s DESC, i) AS rr,
                 ROW_NUMBER() OVER (PARTITION BY q ORDER BY r DESC, i) AS ri
          FROM base),
        dt AS (SELECT * FROM (VALUES $discRows) d(rnk, disc)),
        agg AS (
          SELECT q, COUNT(*) AS n_ranked,
                 SUM(COALESCE(g * da.disc, 0)) AS dcg,
                 SUM(COALESCE(g * di.disc, 0)) AS idcg
          FROM rk LEFT JOIN dt da ON da.rnk = rk.rr
                  LEFT JOIN dt di ON di.rnk = rk.ri
          GROUP BY 1)
        SELECT q AS query, n_ranked, CAST(dcg AS BIGINT) AS dcg_micro,
               CAST(idcg AS BIGINT) AS idcg_micro,
               CASE WHEN idcg > 0
                 THEN CAST(dcg * 1000000 // idcg AS BIGINT) END AS ndcg_ppm
        FROM agg ORDER BY query
      """
      }),
    // ----------------------------------------------------------------
    // Brier score + Expected Calibration Error for the q236 logistic
    // model, per source: train (3 ridged IRLS rounds), score every doc
    // with the integer sigmoid, then decile-bin calibration — the
    // probabilistic twin of q215's NB reliability diagram, integer
    // end-to-end (ppm probabilities, ppb Brier, ppm ECE).
    Q(
      "q241_logit_calibration",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .filter($"text".isNotNull && $"lang".isNotNull && $"source".isNotNull)
          .select($"source".as("grp"),
            expr("n_chars div 10").as("x1"),
            size(graft.ext.TextHash.tokens($"text")).cast("long").as("x2"),
            ($"lang" === "en").as("y"))
        val model = graft.ext.Profile.groupedLogit2(
          docs, Seq("grp"), $"x1", $"x2", $"y", iters = 3)
        val scored = docs
          .join(broadcast(model.select($"grp", $"b0_ppm", $"b1_ppm", $"b2_ppm")),
            Seq("grp"))
          .withColumn("__eta",
            $"b0_ppm" + $"b1_ppm" * $"x1" + $"b2_ppm" * $"x2")
          .withColumn("mu", expr(
            "(500000L * (1000000L + abs(__eta) + __eta)) div (1000000L + abs(__eta))"))
        graft.ext.Profile.probCalibration(scored, $"grp", $"mu", $"y")
          .select($"grp".as("source"), $"n", $"n_pos", $"brier_ppb", $"ece_ppm")
          .orderBy($"source")
      },
      Some(s"""
        WITH lrows AS MATERIALIZED (
          -- mirror groupedLogit2's ±1e6 feature clamp (clampX) so a
          -- corpus with n_chars >= 1e7 keeps bit-parity of every round
          SELECT source AS grp,
                 GREATEST(LEAST(n_chars // 10, 1000000), -1000000) AS x1,
                 GREATEST(LEAST(CAST(len(${OracleSql.tokens("text")}) AS BIGINT),
                   1000000), -1000000) AS x2,
                 CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS y
          FROM documents
          WHERE text IS NOT NULL AND lang IS NOT NULL AND source IS NOT NULL),
        lb0 AS (SELECT DISTINCT grp, 0 AS b0, 0 AS b1, 0 AS b2 FROM lrows),
        ${(1 to 3).map(irlsRoundSql).mkString(",\n")},
        scored AS (
          SELECT w.grp, w.y,
                 b.b0 + b.b1 * w.x1 + b.b2 * w.x2 AS eta
          FROM lrows w JOIN lb3 b USING (grp)),
        mus AS (
          SELECT grp, y,
                 GREATEST(LEAST(
                   (500000 * (1000000 + abs(eta) + eta)) // (1000000 + abs(eta)),
                   1000000), 0) AS mu
          FROM scored),
        binned AS (
          SELECT grp, LEAST(9, mu // 100000) AS bin, COUNT(*) AS nb,
                 SUM(CAST(mu AS HUGEINT)) AS smu,
                 SUM(CASE WHEN y = 1000000 THEN 1 ELSE 0 END) AS sy,
                 SUM(CAST(mu - y AS HUGEINT) * (mu - y)) AS sq
          FROM mus GROUP BY 1, 2)
        SELECT grp AS source, CAST(SUM(nb) AS BIGINT) AS n,
               CAST(SUM(sy) AS BIGINT) AS n_pos,
               CAST(SUM(sq) // (SUM(nb) * 1000) AS BIGINT) AS brier_ppb,
               CAST(SUM(abs(smu - CAST(sy AS HUGEINT) * 1000000)) // SUM(nb) AS BIGINT)
                 AS ece_ppm
        FROM binned GROUP BY 1 ORDER BY source
      """)),
    // ----------------------------------------------------------------
    // Two-proportion z-test: variants = user_id parity, conversion =
    // "heavy purchaser" (>= 14 purchase events); per variant pair the
    // counts, ppm rates, and
    // the pooled z² in milli (z² ≥ 3.841 ⇔ p < .05) — the A/B readout,
    // exact decimal factors with one deterministic double ratio.
    Q(
      "q242_ab_proportion_test",
      (s, dir) => {
        import s.implicits._
        val perUser = t(s, dir, "events")
          .filter($"user_id".isNotNull)
          .groupBy($"user_id")
          .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("__p"))
          .select(($"user_id" % 2).cast("string").as("variant"),
            ($"__p" >= 14L).as("conv"))
        graft.ext.Profile.proportionTest(perUser, $"variant", $"conv")
          .orderBy($"variant_a", $"variant_b")
      },
      Some("""
        WITH pu AS (
          SELECT user_id, CAST(user_id % 2 AS VARCHAR) AS v,
                 SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14 AS conv
          FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        agg AS (SELECT v, COUNT(*) AS n,
                       SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS c
                FROM pu GROUP BY 1),
        pr AS (
          SELECT a.v AS variant_a, b.v AS variant_b,
                 a.n AS n_a, a.c AS conv_a, b.n AS n_b, b.c AS conv_b,
                 a.c + b.c AS cc, a.n + b.n AS nn
          FROM agg a JOIN agg b ON a.v < b.v),
        z AS (
          SELECT *,
                 CAST(CAST(conv_a AS HUGEINT) * n_b
                      - CAST(conv_b AS HUGEINT) * n_a AS DOUBLE) AS dd,
                 CAST(CAST(n_a AS HUGEINT) * n_b * cc * (nn - cc) AS DOUBLE) AS den
          FROM pr)
        SELECT variant_a, variant_b,
               CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
               CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
               CAST(conv_a * 1000000 // n_a AS BIGINT) AS rate_a_ppm,
               CAST(conv_b * 1000000 // n_b AS BIGINT) AS rate_b_ppm,
               CASE WHEN cc > 0 AND cc < nn THEN
                 CAST(floor(dd * dd * CAST(nn AS DOUBLE) / den * 1000.0 + 0.5) AS BIGINT)
               END AS z2_milli,
               (cc > 0 AND cc < nn AND
                floor(dd * dd * CAST(nn AS DOUBLE) / den * 1000.0 + 0.5) >= 3841)
                 AS significant_95
        FROM z ORDER BY variant_a, variant_b
      """))
  )
}
