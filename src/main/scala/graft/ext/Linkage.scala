package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy record linkage: edit-distance joins without the cross join.
  *
  * A raw `levenshtein(a, b) <= k` theta-join is a cartesian product —
  * O(|L|·|R|) distance evaluations, a non-starter at corpus scale. The
  * standard blocking scheme (Gravano et al., "Approximate String Joins
  * in a Database (Almost) for Free", VLDB'01) generates candidates by
  * positional q-gram overlap: an edit touches at most q grams, so two
  * strings within distance k share at least
  * `max(|a|,|b|) - q + 1 - k*q` q-grams. When that bound is positive
  * the gram equi-join has PERFECT recall and the expensive verify runs
  * only on candidates.
  *
  * Plan shape: explode distinct q-grams on both sides (scan-stage
  * Generate), equi-join on the gram (shuffle carries (id, gram) pairs
  * only), `distinct` collapses multi-gram collisions, strings re-join
  * narrowly for the levenshtein verify. The gram key is skew-prone
  * (common substrings) — AQE skew-join covers it, and the distinct
  * before the re-join bounds the verify at one evaluation per pair.
  */
object Linkage {

  /** Distinct character q-grams of a string, as an array column. */
  def qgramArr(s: Column, q: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(s) - (q - 1), lit(1))),
      i => s.substr(i, lit(q))))

  /** Pairs (id_l, id_r, dist) with levenshtein(strL, strR) <= maxDist.
    *
    * Recall contract: exact whenever
    * `min(|a|,|b|) - q + 1 - maxDist*q > 0` for every true pair (short
    * strings below that bound can evade blocking — pre-filter or lower
    * q for them). With q=3, maxDist=1, names of length >= 7 are covered.
    */
  def fuzzyPairs(
      left: DataFrame, idL: Column, strL: Column,
      right: DataFrame, idR: Column, strR: Column,
      maxDist: Int, q: Int = 3): DataFrame = {
    val l = left.select(idL.as("id_l"), strL.as("s_l"))
    val r = right.select(idR.as("id_r"), strR.as("s_r"))
    val lg = l.select(col("id_l"), explode(qgramArr(col("s_l"), q)).as("g"))
    val rg = r.select(col("id_r"), explode(qgramArr(col("s_r"), q)).as("g"))
    val cand = lg.join(rg, Seq("g"))
      .select(col("id_l"), col("id_r"))
      .distinct()
    cand
      .join(l, Seq("id_l"))
      .join(r, Seq("id_r"))
      .select(col("id_l"), col("id_r"), levenshtein(col("s_l"), col("s_r")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Blocking-quality scorecard (Christen's record-linkage metrics):
    * given a TRUTH pair set and the CANDIDATE pairs a blocking scheme
    * generated, report
    *
    *   - `pair_completeness_ppm` = |truth ∩ candidates| / |truth| —
    *     the recall a downstream matcher can at best achieve;
    *   - `reduction_ratio_ppm` = 1 − |candidates| / C(n,2) — how much
    *     of the quadratic comparison space the blocking eliminated.
    *
    * The two numbers ARE the blocking trade-off: a scheme is only as
    * good as its position on this frontier, and tuning window/prefix
    * parameters (q172) without this scorecard is guesswork. Both
    * pair frames are taken positionally as (a, b) canonical pairs and
    * deduplicated defensively; counts go through DECIMAL(38,0) before
    * the ppm divisions so the C(n,2) denominator can't overflow at
    * any corpus size.
    *
    * Scale: two pair-keyed distincts, one semi-join, four 1-row
    * aggregates cross-joined — cost is pair-space-bound, never n².
    */
  def blockingQuality(
      truthPairs: DataFrame,
      candidatePairs: DataFrame,
      records: DataFrame): DataFrame = {
    def pairs(df: DataFrame): DataFrame = {
      require(df.columns.length == 2,
        s"blockingQuality: pair frame must be (a, b), got ${df.columns.mkString(",")}")
      df.select(col(df.columns(0)).as("a"), col(df.columns(1)).as("b")).distinct()
    }
    val t = pairs(truthPairs)
    val c = pairs(candidatePairs)
    records.agg(count(lit(1)).as("n_records"))
      .crossJoin(t.agg(count(lit(1)).as("n_truth")))
      .crossJoin(c.agg(count(lit(1)).as("n_cand")))
      .crossJoin(t.join(c, Seq("a", "b"), "left_semi")
        .agg(count(lit(1)).as("n_hit")))
      .select(col("n_records"), col("n_truth"), col("n_cand"), col("n_hit"),
        when(col("n_truth") > 0, expr("n_hit * 1000000L div n_truth"))
          .as("pair_completeness_ppm"),
        when(col("n_records") >= 2,
          lit(1000000L) - expr("CAST(n_cand AS DECIMAL(38,0)) * 2000000 div " +
            "(CAST(n_records AS DECIMAL(38,0)) * (n_records - 1))"))
          .as("reduction_ratio_ppm"))
  }

  /** Composite-blocked candidate pairs with a block-size preflight.
    *
    * Blocking is the ONLY thing standing between record linkage and a
    * quadratic pair space: candidates within a block of size n cost
    * C(n,2), so one hub block (a whole nation, an empty-string name)
    * silently turns a "blocked" join back into a cartesian product —
    * measured at 43× runtime for 10× entities under nation-only
    * blocking. This helper makes that failure LOUD instead of silent:
    * before generating a single pair it aggregates per-block row
    * counts (one cheap key-keyed count on the narrow key projection,
    * the [[Skew.saltAdvisor]] shape) and `require`s the largest block
    * under `maxBlockRows`. Callers refine the key (add a name
    * prefix/suffix/q-gram component — the q100 gram machinery) until
    * the preflight passes; they never discover the quadratic from a
    * straggling stage.
    *
    * The pair relation itself carries only (id, key) through the
    * self-join shuffle — attributes re-join narrowly downstream (the
    * [[fuzzyPairs]] plan shape), so the shuffle payload is bounded by
    * the id width no matter how wide the records are.
    */
  def blockedPairs(
      records: DataFrame,
      id: Column,
      blockKey: Seq[Column],
      maxBlockRows: Long = 10000L): DataFrame = {
    require(blockKey.nonEmpty, "blockedPairs: at least one blocking column")
    require(maxBlockRows >= 2L,
      s"blockedPairs: maxBlockRows must be >= 2, got $maxBlockRows")
    val keyNames = blockKey.indices.map(i => s"__bk$i")
    val keyed = records.select(
      id.as("__id") +: blockKey.zip(keyNames).map { case (c, n) => c.as(n) }: _*)
    val worst = keyed.groupBy(keyNames.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(coalesce(max(col("n")), lit(0L)))
      .head().getLong(0)
    require(worst <= maxBlockRows,
      s"blockedPairs: largest block holds $worst rows (cap $maxBlockRows); " +
        s"candidate pairs grow quadratically inside a block — refine the " +
        s"blocking key (add a name prefix/suffix/q-gram component) before " +
        s"paying ~${worst * (worst - 1) / 2} comparisons on one key")
    keyed.as("a").join(keyed.as("b"),
        keyNames.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_l"), col("b.__id").as("id_r"))
  }

  /** Fellegi–Sunter probabilistic linkage scoring (Fellegi & Sunter,
    * JASA 1969) over a blocked candidate-pair relation that already
    * carries one BOOLEAN agreement column per comparison field.
    *
    * u-probabilities (chance agreement among non-matches) are
    * estimated from the candidate pairs themselves — the standard
    * random-pair estimate, exact integer ppm, clamped to [1, 999999]
    * so no ratio divides by zero; the m-probability (agreement among
    * true matches) is the caller's documented parameter (FS practice
    * when no labelled matches exist — CCNet-style fixed prior). Each
    * field contributes the likelihood ratio m/u on agreement and
    * (1−m)/(1−u) on disagreement, carried in exact integer units of
    * 1e6; the pair score is the product of the per-field ratios taken
    * as doubles in declaration order (identical expression trees on
    * any engine), so score = Π(ratios)·1e6^|fields|. Classification:
    * match ≥ matchMin, nonmatch ≤ nonmatchMax, else possible.
    *
    * Plan shape: the pair relation is lazily pinned (it feeds the
    * 1-row u aggregate AND the scoring pass — the q147 multi-consumer
    * shape); the u row broadcasts into the scoring scan; everything
    * else is scan-stage codegen. Cost is linear in candidate pairs —
    * blocking bounds the pair space upstream, this stage never
    * enlarges it.
    */
  def fellegiSunterScores(
      pairs: DataFrame,
      fields: Seq[String],
      mPpm: Long = 950000L,
      matchMin: Double = 1e21,
      nonmatchMax: Double = 1e18): DataFrame = {
    require(fields.nonEmpty, "fellegiSunterScores: at least one field")
    require(mPpm >= 1L && mPpm <= 999999L,
      s"fellegiSunterScores: mPpm in [1, 999999], got $mPpm")
    val pinned = pairs.localCheckpoint(false)
    val uRow = pinned.agg(
      expr(s"greatest(1L, least(999999L, " +
        s"sum(cast(${fields.head} as long)) * 1000000L div count(1)))")
        .as(s"__u_${fields.head}"),
      fields.tail.map(f =>
        expr(s"greatest(1L, least(999999L, " +
          s"sum(cast($f as long)) * 1000000L div count(1)))").as(s"__u_$f")): _*)
    val withU = pinned.crossJoin(broadcast(uRow))
    val ratios = fields.map { f =>
      expr(s"CASE WHEN $f THEN ${mPpm * 1000000L} div __u_$f " +
        s"ELSE ${(1000000L - mPpm) * 1000000L} div (1000000 - __u_$f) END")
        .cast("double")
    }
    val score = ratios.reduceLeft(_ * _)
    withU
      .withColumn("score", score)
      .withColumn("cls",
        when(col("score") >= matchMin, "match")
          .when(col("score") <= nonmatchMax, "nonmatch")
          .otherwise("possible"))
      .drop(fields.map(f => s"__u_$f"): _*)
  }
}
