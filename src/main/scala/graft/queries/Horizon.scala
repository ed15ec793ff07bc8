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
        lvl AS (SELECT *, CASE WHEN h = 0 THEN 40
                               ELSE LEAST(40, CAST(log2(h & (-h)) AS INT)) END AS l
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
      """))
  )
}
