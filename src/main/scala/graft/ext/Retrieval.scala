package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sparse lexical retrieval over a document corpus: BM25-family
  * scoring for a fixed term set, top-k by score. In a training-data
  * pipeline this is the data-selection primitive — "rank the corpus by
  * relevance to this probe set" (targeted subset mining, contamination
  * triage, domain weighting all reduce to it).
  *
  * Scoring is the BM25 shape (Robertson/Sparck Jones): per term,
  * idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)). One deliberate
  * deviation, shared with [[TextAnalysis.unigramScore]]: the idf factor
  * is the RATIONAL odds (N − df + 0.5)/(df + 0.5), not its log —
  * `ln` differs across libm builds, so a log-scored operator could
  * never hash-match an external oracle. The ranking this produces is
  * monotone in the same per-term statistics; swap in `log(...)` when
  * bit-reproducibility across engines doesn't matter.
  *
  * Plan shape: tokenize+explode (scan stage) → filter to the probe
  * terms BEFORE any shuffle (the postings relation carries only probe
  * terms, a ~|terms|/|vocab| reduction) → (doc, term) tf aggregate →
  * broadcast term stats (|terms| rows) → per-doc decimal-exact sum →
  * TakeOrderedAndProject for the top-k. Document length and avgdl come
  * from one corpus-level aggregate; nothing ever shuffles the corpus
  * by anything but doc id.
  */
object Retrieval {

  def bm25TopK(
      docs: DataFrame,
      id: Column,
      text: Column,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK: empty term set")
    val lowered = terms.map(_.toLowerCase)
    // Null-text docs are not in the index: they can never be scored, and
    // counting them would bias N up and avgdl down (size(null) is -1
    // under the legacy sizeOfNull default). Empty-but-non-null docs stay
    // — they are real corpus members with dl = 0.
    val base = docs.filter(text.isNotNull)
      .select(id.as("doc_id"), TextHash.tokens(lower(text)).as("__toks"))
      .select(col("doc_id"), col("__toks"), size(col("__toks")).cast("long").as("dl"))
    // corpus stats: N and exact-decimal avgdl in one tiny aggregate
    val stats = base.agg(
      count(lit(1)).as("__n"),
      (sum(col("dl").cast(DecimalType(38, 10))).cast("double") /
        count(lit(1)).cast("double")).as("__avgdl"))
    // postings restricted to probe terms before the (doc, term) shuffle
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(lowered: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        // rational idf (see scaladoc) × the standard tf saturation
        (((col("__n").cast("double") - col("df").cast("double") + 0.5) /
          (col("df").cast("double") + 0.5)) *
          (col("tf").cast("double") * (k1 + 1.0) /
            (col("tf").cast("double") +
              lit(k1) * (lit(1.0 - b) +
                col("dl").cast("double") / col("__avgdl") * b)))).as("__s"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_terms"),
        sum(col("__s").cast(DecimalType(38, 10))).cast("double").as("score"))
    scored.orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  /** Reciprocal-rank fusion (Cormack & Clarke, SIGIR'09): merge N
    * rankings of the same id space into one by Σᵢ 1/(c + rankᵢ),
    * summing only over the lists that contain the id. The standard
    * way to combine lexical and vector retrieval (BM25 list + ANN
    * list) without score calibration — only ranks matter.
    *
    * Each input is (id, score); ranks come from RANK() over
    * (score DESC, id) — the id tiebreak makes ranking total, and
    * ranking on an exact (decimal/long) score column is engine-
    * independent by construction. The per-list terms 1/(c+rank) are
    * single IEEE divisions; their cross-list SUM — the one
    * order-dependent step — accumulates via DECIMAL(38,10), the
    * repo's reproducible-sum contract. Output: (id, n_lists,
    * best_rank, rrf).
    *
    * Scale posture: RRF inputs are top-N retrieval LISTS, not corpora
    * — each window ranks one bounded list (the global window's single
    * partition is list-sized by contract, enforced by `maxListSize`);
    * the fuse itself is one keyed aggregate over Σ|list| rows.
    */
  def rrfFuse(lists: Seq[DataFrame], c: Int = 60, maxListSize: Long = 10000000L): DataFrame = {
    require(lists.size >= 2, s"rrfFuse: >= 2 lists required, got ${lists.size}")
    require(c >= 1, s"rrfFuse: c >= 1 required, got $c")
    import org.apache.spark.sql.expressions.Window
    val ranked = lists.map { df =>
      require(df.columns.length == 2,
        s"rrfFuse: each list must be (id, score), got ${df.columns.mkString(", ")}")
      val Array(idName, scoreName) = df.columns
      val guarded = df.crossJoin(
        df.agg(count(lit(1)).as("__sz"))
          .select(when(col("__sz") <= maxListSize, lit(1))
            .otherwise(raise_error(concat(lit(
              s"rrfFuse: list exceeds maxListSize=$maxListSize — RRF ranks " +
                "a single partition; fuse top-N lists, not corpora (size="),
              col("__sz"), lit(")")))).as("__ok")))
      guarded
        .select(col(idName).as("id"),
          // ×1 keeps the guard in the plan: an unused guard column
          // would be pruned and the raise_error never evaluated
          (rank().over(Window.orderBy(col(scoreName).desc, col(idName))) *
            col("__ok")).as("__rank"))
    }
    ranked.reduce(_ unionAll _)
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_lists"),
        min(col("__rank")).as("best_rank"),
        sum((lit(1.0) / (lit(c.toDouble) + col("__rank").cast("double")))
          .cast(DecimalType(38, 10))).cast("double").as("rrf"))
  }

  /** Positional inverted index for a probe term set: per (term, doc)
    * the 1-based token positions and term frequency — the structure
    * phrase/proximity retrieval queries, and the complement of
    * [[bm25TopK]]'s frequency-only scoring (BM25 can't see that
    * "machine learning" is adjacent; positions can).
    *
    * Postings are restricted to `terms` — an index build is per-probe
    * /per-vocabulary-shard by contract, so output is bounded by the
    * probe's posting lists, not the corpus token count (full-vocab
    * builds shard the term space and loop). Positions are
    * posexplode-derived and sorted, so the list is deterministic
    * regardless of partitioning.
    *
    * Scale: scan-stage tokenize+posexplode with an IN-set filter that
    * drops every non-probe token BEFORE the shuffle; one
    * (term, doc)-keyed aggregate whose state is the posting length.
    */
  def positionalIndex(
      df: DataFrame,
      id: Column,
      text: Column,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "positionalIndex: at least one probe term required")
    df.filter(text.isNotNull)
      .select(id.as("doc_id"), posexplode(TextHash.tokens(text)).as(Seq("__p", "__tok")))
      .filter(col("__tok").isin(terms: _*))
      .groupBy(col("__tok").as("term"), col("doc_id"))
      .agg(
        array_sort(collect_list((col("__p") + 1).cast("long"))).as("positions"),
        count(lit(1)).as("tf"))
  }

  /** All-pairs sparse cosine similarity over a document-frequency-
    * pruned inverted index — the classic "similar documents without a
    * quadratic corpus join" (Bayardo et al., WWW'07 family). Terms are
    * word 3-gram shingles with multiplicity (tf); any term whose
    * posting list exceeds `maxDf` is dropped from the VECTOR SPACE
    * ENTIRELY (norms included — similarity is defined over the pruned
    * space, the standard stopword-analogue cut), and candidate pairs
    * come from a self-join of the surviving postings on the term.
    *
    * Scale contract: the joined pair space is Σ_term df² ≤ maxDf ·
    * Σ_term df = maxDf · |postings| — LINEAR in the corpus for a fixed
    * cap, against the |docs|² of a naive corpus self-join. The cap is
    * the knob: it bounds both the pair space and each join task's
    * in-bucket fan-out (AQE splits any residual hot term).
    *
    * Determinism: tf products and squared norms are exact integer
    * sums; the only float ops are one sqrt (IEEE-exact everywhere) per
    * doc and one division per pair, micro-quantized before the
    * threshold compare so a last-ulp divergence can't flip membership.
    *
    * Output: (id_a, id_b, cos) with id_a < id_b, cos ≥ minCos,
    * millionth-quantized.
    */
  def sparseCosinePairs(
      docs: DataFrame,
      id: Column,
      text: Column,
      maxDf: Int,
      minCos: Double): DataFrame = {
    require(maxDf >= 1, s"sparseCosinePairs: maxDf >= 1 required, got $maxDf")
    require(minCos > 0.0 && minCos <= 1.0,
      s"sparseCosinePairs: minCos in (0, 1] required, got $minCos")
    // shingles WITH multiplicity (unlike TextHash.wordShingles) — tf matters
    def grams2(t: Column): Column = {
      val toks = TextHash.tokens(t)
      when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", slice(toks, i, lit(3)))))
        .otherwise(array().cast("array<string>"))
    }
    // ONE aggregation builds each gram's posting list AND its df, so
    // the df gate is a size() filter and the Σdf² candidate space is
    // generated IN-ROW from the ≤maxDf-entry array instead of by the
    // former gram-keyed SMJ self-join (which sorted the full posting
    // relation twice and joined it against itself — the round-17
    // verdict's #3 cost). array_sort orders postings by id (ids are
    // unique within a gram), so i<j enumeration yields id_a < id_b
    // directly; the per-gram pair multiset and every integer tf
    // product are identical to the join formulation, and longs sum
    // order-independently. byGram is pinned once for its two consumers
    // (pair generation + norms); everything downstream of the tokenize
    // →3-gram-explode chain reads (id, tf) longs, never text.
    // spread the doc rows BEFORE the tokenize→shingle explode: the
    // documents fixture is one small file = one scan partition, which
    // ran the whole chain single-threaded (ProbeJobs: a 2 s one-task
    // stage); at real scale the scan is already wide and this shuffles
    // (id, text) rows once. byGram is likewise re-spread before the
    // pin so the pair-explode and norm stages read wide blocks.
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val tf = docs.filter(text.isNotNull)
      .select(id.as("__id"), text.as("__text"))
      .repartition(par)
      .select(col("__id"), explode(grams2(col("__text"))).as("__g"))
      .groupBy(col("__id"), col("__g"))
      .agg(count(lit(1)).as("__tf"))
    val byGram = tf
      .groupBy(col("__g"))
      .agg(collect_list(struct(col("__id"), col("__tf"))).as("__ps"))
      .filter(size(col("__ps")) <= maxDf)
      .select(array_sort(col("__ps")).as("__ps"))
      .repartition(par)
      .localCheckpoint(false)
    val norms = byGram
      .select(explode(col("__ps")).as("__p"))
      .select(col("__p.__id").as("__id"), col("__p.__tf").as("__tf"))
      .groupBy(col("__id"))
      .agg(sqrt(sum(col("__tf") * col("__tf")).cast("double")).as("__n"))
    val dots = byGram
      .select(explode(flatten(transform(col("__ps"), (a, i) =>
        transform(slice(col("__ps"), i + lit(2), size(col("__ps"))), b =>
          struct(a.getField("__id").as("id_a"), b.getField("__id").as("id_b"),
            (a.getField("__tf") * b.getField("__tf")).as("__prod"))))))
        .as("__pair"))
      .select(col("__pair.*"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("__prod")).as("__dot"))
    dots
      .join(norms.select(col("__id").as("id_a"), col("__n").as("__na")), Seq("id_a"))
      .join(norms.select(col("__id").as("id_b"), col("__n").as("__nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (floor(col("__dot").cast("double") / (col("__na") * col("__nb"))
          * 1000000.0 + 0.5) / 1000000.0).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Count–min sketch term-frequency estimation (Cormode & Muthu-
    * krishnan, J. Algorithms 2005) with a SELF-VERIFYING envelope —
    * the q56 sketch pattern applied to token counts: build a d×w
    * sketch over the token stream, estimate the top-`topK` exact
    * terms from it, and emit the deterministic envelope verdict next
    * to both numbers. `est ≥ exact` is the CMS structural guarantee
    * (hash collisions only ever ADD); the width bound checks the
    * overcount stays within `3N/w` — generous vs the e/w expectation,
    * and computed identically by any engine, so the row hash-matches
    * while the sketch is genuinely exercised every round.
    *
    * Everything is integer: buckets come from the md5-derived
    * [[TextHash.hash64]] (seeded per row r — the d pairwise-
    * independent-ish hash family), counts are plain longs.
    *
    * Scale: the sketch is a (d·w)-bounded aggregate (map-side combine
    * absorbs the token volume — THE point of a sketch: d·w cells
    * summarize any stream); the estimate join touches topK·d rows.
    * At 100 TB the sketch relation is mergeable across partitions/
    * days by cell-wise addition, which is what makes it the
    * streaming/windowed heavy-hitter primitive.
    */
  def countMinTopTerms(
      df: DataFrame,
      text: Column,
      depth: Int,
      width: Int,
      topK: Int): DataFrame = {
    require(depth >= 1 && width >= 2 && topK >= 1, "degenerate CMS shape")
    val toks = df.filter(text.isNotNull)
      .select(explode(TextHash.tokens(text)).as("w"))
    val n = toks.agg(count(lit(1)).as("__n"))
    val exact = toks.groupBy(col("w")).agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("w")).limit(topK)
    def buckets(c: Column): Column =
      array((0 until depth).map(r =>
        pmod(TextHash.hash64(c, r), lit(width.toLong))): _*)
    val sketch = toks
      .select(posexplode(buckets(col("w"))).as(Seq("r", "bucket")))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    exact
      .select(col("w"), col("exact"),
        posexplode(buckets(col("w"))).as(Seq("r", "bucket")))
      .join(sketch, Seq("r", "bucket"))
      .groupBy(col("w").as("term"), col("exact"))
      .agg(min(col("cnt")).as("est"))
      .crossJoin(broadcast(n))
      .select(col("term"), col("exact"), col("est"),
        (col("est") >= col("exact") &&
          (col("est") - col("exact")) * width <= lit(3L) * col("__n"))
          .as("within_bound"))
  }

  /** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
    * RANDOM'02; Beyer et al., SIGMOD'07) per group, with the q56/q203
    * self-verifying envelope: hash every value into a 2⁴⁰-point space,
    * keep the k smallest DISTINCT hashes per group, estimate
    * |distinct| as (k-1)·2⁴⁰ / h₍k₎ (the unbiased KMV estimator), and
    * emit the exact count next to a deterministic relative-error
    * verdict (3/√(k-2) ≈ 3σ) that both engines compute identically —
    * the sketch is genuinely exercised while the row still hashes.
    * Groups with fewer than k distinct hashes report exactly (the KMV
    * degenerate case — the sketch IS the value set).
    *
    * "Exact" here means distinct HASHES — at 2⁴⁰ points a collision
    * needs ~10⁶ distinct values per group to reach p≈10⁻³, and using
    * the same definition on both sides keeps parity unconditional.
    * All arithmetic is 64-bit integral ((k-1)·2⁴⁰ < 2⁶³ for k ≤ 2²²;
    * the division is `div`, floor semantics, = DuckDB's `//`).
    *
    * Scale: one distinct aggregate keyed on (group, hash) — map-side
    * combine absorbs value multiplicity — then one per-group window
    * for the k smallest (WindowGroupLimit prunes per partition before
    * the shuffle) and a group-count aggregate. The sketch itself is
    * what you'd persist at 100 TB: per-partition k-min sets merge by
    * "union then re-take k smallest", the classic mergeable-summary
    * property, so per-day/per-shard sketches compose without rescans.
    */
  /** The k-minimum-values SET itself, per group — the mergeable form
    * of [[kmvDistinct]]'s summary: a sorted array of the ≤k smallest
    * distinct hashes. This is what you PERSIST per shard/day at
    * 100 TB; [[kmvMergeEstimate]] composes two of them.
    */
  def kmvSketch(
      df: DataFrame,
      group: Column,
      value: Column,
      k: Int): DataFrame = {
    require(k >= 8 && k <= 65536, s"kmvSketch: k in [8, 65536] required, got $k")
    import org.apache.spark.sql.expressions.Window
    val Space = 1L << 40
    df.filter(group.isNotNull && value.isNotNull)
      .select(group.as("grp"), pmod(TextHash.hash64(value), lit(Space)).as("__h"))
      .distinct()
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("grp")).orderBy(col("__h"))))
      .filter(col("__rn") <= k)
      .groupBy(col("grp"))
      .agg(array_sort(collect_list(col("__h"))).as("hashes"))
  }

  /** Merge two [[kmvSketch]] relations and estimate: union the hash
    * sets, re-take the k smallest — the KMV merge rule, which makes
    * per-shard sketches compose into EXACTLY the sketch of the union
    * (min-of-mins commutes with union). Output per group:
    * (grp, hashes, est) with the [[kmvDistinct]] estimator; groups
    * present on one side only pass through.
    */
  def kmvMergeEstimate(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 8 && k <= 65536, s"kmvMergeEstimate: k in [8, 65536], got $k")
    val Space = 1L << 40
    val empty = array().cast("array<long>")
    a.select(col("grp"), col("hashes").as("__ha"))
      .join(b.select(col("grp"), col("hashes").as("__hb")), Seq("grp"), "full")
      .withColumn("hashes",
        slice(array_sort(array_distinct(
          concat(coalesce(col("__ha"), empty), coalesce(col("__hb"), empty)))), 1, k))
      .withColumn("est",
        when(size(col("hashes")) < k, size(col("hashes")).cast("long"))
          .otherwise(expr(s"${(k - 1) * Space}L div element_at(hashes, $k)")))
      .select(col("grp"), col("hashes"), col("est"))
  }

  /** Persisted mergeable quantile sketch ("KLL-lite"): each row draws a
    * deterministic geometric LEVEL from its id hash — l = trailing zero
    * bits of the 60-bit md5 hash, so P(l ≥ j) = 2⁻ʲ over the hash
    * randomness — and the sketch keeps, per group, every row at level
    * ≥ t for the smallest threshold t that fits the `k`-item budget.
    * Kept items therefore form a deterministic 2⁻ᵗ row sample
    * (coordinated/bottom-sampling lineage — Cohen–Kaplan; the level
    * trick is the same geometric coin KLL compaction flips, decided
    * per-item by hash so the sketch is ORDER-INSENSITIVE), and
    * est_rank(v) = 2ᵗ · |{items ≤ v}| with rank error O(√(n·2ᵗ)).
    *
    * The mergeable-summary property is EXACT, like [[kmvSketch]]:
    * levels are per-item constants, so sketch(A ∪ B) =
    * re-threshold(sketch(A) ∪ sketch(B)) cell-for-cell — per-shard /
    * per-day sketches compose without rescans ([[quantileSketchMerge]];
    * q232 proves the identity against the whole-data sketch).
    *
    * Output: (grp, n, t, items) with items = array<struct<v,h,l>>
    * sorted by (v, h); n is the exact row count (mergeable by sum).
    * Values are longs by contract (pre-quantize doubles, q79-style).
    *
    * Scale: one scan + one level-count aggregate (41 rows per group)
    * + one filtered collect of ≤ k items per group — the sketch, not
    * the data, crosses the wire.
    */
  def quantileSketch(
      df: DataFrame,
      group: Column,
      value: Column,
      id: Column,
      k: Int): DataFrame = {
    require(k >= 16 && k <= 65536, s"quantileSketch: k in [16, 65536] required, got $k")
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(group.isNotNull && value.isNotNull && id.isNotNull)
      .select(group.as("grp"), value.cast("long").as("v"),
        TextHash.hash64(id.cast("string")).as("h"))
      .withColumn("l",
        // trailing-zero count as pure integer math: ntz(h) =
        // bit_count((h & -h) - 1) — no libm log2, whose last-ulp
        // behavior could differ between engines (parity rule); matches
        // the streaming twin's Long.numberOfTrailingZeros. h = 0 and
        // h = Long.MinValue (where -h overflows) pin to the 40 cap.
        when(col("h") === 0L || col("h") === Long.MinValue, lit(40))
          .otherwise(least(lit(40),
            bit_count(col("h").bitwiseAND(-col("h")) - 1L))))
    val counts = base.groupBy(col("grp"), col("l")).agg(count(lit(1)).as("__c"))
    val cum = counts.withColumn("__ge",
      sum(col("__c")).over(Window.partitionBy(col("grp"))
        .orderBy(col("l").desc).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // t = (max level whose ≥-count still exceeds k) + 1; 0 when none
    val ts = cum.groupBy(col("grp")).agg(
      (coalesce(max(when(col("__ge") > k, col("l"))), lit(-1)) + 1).as("t"),
      sum(col("__c")).as("n"))
    base.join(ts, Seq("grp"))
      .filter(col("l") >= col("t"))
      .groupBy(col("grp"), col("n"), col("t"))
      .agg(array_sort(collect_list(struct(col("v"), col("h"), col("l")))).as("items"))
      .select(col("grp"), col("n"), col("t"), col("items"))
  }

  /** Merge two [[quantileSketch]] relations: union the item buffers,
    * re-pick the smallest threshold t ≥ max(tₐ, t_b) whose filtered
    * buffer fits `k`, and sum the counts — which reconstructs EXACTLY
    * the sketch the whole data would produce (levels are per-item
    * constants, so the union at threshold t contains precisely the
    * whole-data items at level ≥ t). Groups on one side pass through.
    */
  def quantileSketchMerge(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 16 && k <= 65536, s"quantileSketchMerge: k in [16, 65536], got $k")
    val empty = expr("CAST(array() AS array<struct<v: bigint, h: bigint, l: int>>)")
    a.select(col("grp"), col("n").as("__na"), col("t").as("__ta"), col("items").as("__ia"))
      .join(b.select(col("grp"), col("n").as("__nb"), col("t").as("__tb"),
        col("items").as("__ib")), Seq("grp"), "full")
      .withColumn("__u", concat(coalesce(col("__ia"), empty), coalesce(col("__ib"), empty)))
      .withColumn("__tmin", greatest(coalesce(col("__ta"), lit(0)), coalesce(col("__tb"), lit(0))))
      .withColumn("t", expr(
        s"element_at(filter(sequence(__tmin, 40), T -> size(filter(__u, x -> x.l >= T)) <= $k), 1)"))
      .select(col("grp"),
        (coalesce(col("__na"), lit(0L)) + coalesce(col("__nb"), lit(0L))).as("n"),
        col("t"),
        array_sort(expr("filter(__u, x -> x.l >= t)")).as("items"))
  }

  /** Quantile estimates from a [[quantileSketch]]: for each requested
    * q (ppm), target rank r = ⌈q·n⌉ (floored at 1), estimate = the
    * item at sketch position ⌈r / 2ᵗ⌉ (each kept item stands for 2ᵗ
    * rows). Integer floor arithmetic throughout.
    */
  def quantileSketchQuantiles(sketch: DataFrame, qsPpm: Seq[Long]): DataFrame = {
    require(qsPpm.nonEmpty && qsPpm.forall(q => q >= 0L && q <= 1000000L),
      s"quantileSketchQuantiles: q_ppm values in [0, 1e6] required, got $qsPpm")
    sketch
      .withColumn("q_ppm", explode(array(qsPpm.map(lit): _*)))
      .withColumn("__p2t", expr("shiftleft(CAST(1 AS BIGINT), t)"))
      .withColumn("target_rank",
        greatest(lit(1L), expr("(q_ppm * n + 999999) div 1000000")))
      .withColumn("__idx",
        least(size(col("items")).cast("long"),
          expr("(target_rank + __p2t - 1) div __p2t")).cast("int"))
      .select(col("grp"), col("q_ppm"), col("n"), col("t"),
        size(col("items")).cast("long").as("n_sketch"),
        col("target_rank"),
        expr("element_at(items, __idx).v").as("est_v"))
  }

  /** nDCG@k per query — the graded-relevance quality metric for the
    * retrieval family (BM25/RRF produce runs; this scores them):
    * DCG@k = Σ_{r≤k} (2^rel − 1)·disc(r) against the ideal ordering's
    * IDCG. The log₂ discounts are pre-computed MICRO-FIXED-POINT
    * constants (⌊10⁶/log₂(r+1)+½⌋ for r = 1..k) folded into the plan
    * as literals, so the whole metric is integer arithmetic — exact,
    * order-free sums, no libm in any engine. Ranking ties break on
    * the item id (deterministic run), ideal ties on id as well.
    *
    * Scale: two row_number windows per query (run order, ideal order)
    * over the top-k-bounded result relation + one query-keyed
    * aggregate. Output: (query, n_ranked, dcg_micro, idcg_micro,
    * ndcg_ppm — null for queries with zero total gain).
    */
  def ndcgAtK(
      df: DataFrame,
      query: Column,
      item: Column,
      score: Column,
      rel: Column,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"ndcgAtK: k in [1, 1000], got $k")
    import org.apache.spark.sql.expressions.Window
    val discs = (1 to k).map(r =>
      math.floor(1e6 / (math.log(r + 1) / math.log(2)) + 0.5).toLong)
    val discArr = array(discs.map(lit): _*)
    val base = df.filter(query.isNotNull && item.isNotNull &&
        score.isNotNull && rel.isNotNull)
      .select(query.as("q"), item.as("i"), score.as("s"),
        rel.cast("long").as("r"))
    val gain = expr("shiftleft(CAST(1 AS BIGINT), CAST(least(greatest(r, 0), 30) AS INT)) - 1")
    val wRun = Window.partitionBy(col("q")).orderBy(col("s").desc, col("i"))
    val wIdeal = Window.partitionBy(col("q")).orderBy(col("r").desc, col("i"))
    val ranked = base
      .withColumn("__g", gain)
      .withColumn("__rr", row_number().over(wRun))
      .withColumn("__ri", row_number().over(wIdeal))
      .withColumn("__dcg",
        when(col("__rr") <= k, col("__g") * element_at(discArr, col("__rr")))
          .otherwise(lit(0L)))
      .withColumn("__idcg",
        when(col("__ri") <= k, col("__g") * element_at(discArr, col("__ri")))
          .otherwise(lit(0L)))
    ranked.groupBy(col("q").as("query"))
      .agg(count(lit(1)).as("n_ranked"),
        sum(col("__dcg")).as("dcg_micro"),
        sum(col("__idcg")).as("idcg_micro"))
      .select(col("query"), col("n_ranked"), col("dcg_micro"), col("idcg_micro"),
        when(col("idcg_micro") > 0L,
          expr("dcg_micro * 1000000L div idcg_micro")).as("ndcg_ppm"))
  }

  /** MAP@k and MRR@k per query — the binary-relevance complements to
    * [[ndcgAtK]] (one retrieval run is scored by all three in
    * practice; TREC lineage). For each query's ranking (score desc,
    * item asc tiebreak, the q240 convention):
    *
    *   - AP@k  = Σ_{hits i ≤ k} P@i / min(n_rel, k), with each
    *     precision term floored to micro units FIRST
    *     (⌊10⁶·cumRel_i/i⌋) and the final division an integer div —
    *     term-wise fixed-point, so both engines replay the identical
    *     integer fold with zero float exposure;
    *   - RR@k  = ⌊10⁶ / firstHitRank⌋, 0 when no hit lands in the
    *     top k (the MRR@k convention).
    *
    * Output one row per query (n_ranked, n_rel, ap_micro, rr_micro);
    * the corpus MAP/MRR is the caller's one further average.
    *
    * Scale: one query-keyed window (rank + running hit count share a
    * single sort) and one aggregate — shuffle is ranked-pair-bound.
    */
  def mapMrrAtK(
      df: DataFrame,
      query: Column,
      item: Column,
      score: Column,
      rel: Column,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"mapMrrAtK: k in [1, 1000], got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("q")).orderBy(col("s").desc, col("i"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = df.filter(query.isNotNull && item.isNotNull &&
        score.isNotNull && rel.isNotNull)
      .select(query.as("q"), item.as("i"), score.as("s"),
        rel.cast("boolean").as("r"))
      .withColumn("__rk", row_number().over(w))
      .withColumn("__cum", sum(when(col("r"), 1L).otherwise(0L)).over(wRun))
    ranked.groupBy(col("q").as("query"))
      .agg(count(lit(1)).as("n_ranked"),
        sum(when(col("r"), 1L).otherwise(0L)).as("n_rel"),
        sum(when(col("r") && col("__rk") <= k,
          expr("__cum * 1000000L div __rk")).otherwise(0L)).as("__apnum"),
        min(when(col("r") && col("__rk") <= k, col("__rk"))).as("__first"))
      .select(col("query"), col("n_ranked"), col("n_rel"),
        when(col("n_rel") > 0L,
          expr(s"__apnum div least(n_rel, ${k}L)")).as("ap_micro"),
        coalesce(expr("1000000L div __first"), lit(0L)).as("rr_micro"))
  }

  def kmvDistinct(
      df: DataFrame,
      group: Column,
      value: Column,
      k: Int): DataFrame = {
    require(k >= 8 && k <= 4194304, s"kmvDistinct: k in [8, 2^22] required, got $k")
    import org.apache.spark.sql.expressions.Window
    val Space = 1L << 40
    val h = df.filter(group.isNotNull && value.isNotNull)
      .select(group.as("grp"), pmod(TextHash.hash64(value), lit(Space)).as("__h"))
      .distinct()
    val n = h.groupBy(col("grp")).agg(count(lit(1)).as("exact"))
    val kth = h
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col("grp")).orderBy(col("__h"))))
      .filter(col("__rn") === k)
      .select(col("grp"), col("__h").as("kth_hash"))
    val boundPpm = (3.0e6 / math.sqrt((k - 2).toDouble)).toLong
    n.join(kth, Seq("grp"), "left")
      .select(col("grp"), col("exact"), col("kth_hash"),
        when(col("exact") <= k || col("kth_hash").isNull, col("exact"))
          .otherwise(expr(s"${(k - 1) * Space}L div kth_hash")).as("est"))
      .withColumn("within_bound",
        abs(col("est") - col("exact")) * lit(1000000L) <= lit(boundPpm) * col("exact"))
  }
}
