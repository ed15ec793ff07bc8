package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-statistical language-model scoring: the log-free skeleton of
  * perplexity filtering (the classic data-quality gate — score each
  * document by how probable its token sequence is under a model trained
  * on the corpus itself, drop the tails). A full KenLM-style n-gram LM
  * needs smoothing and log-space products; what a Spark-native filter
  * needs is the same RANKING signal from exact, engine-portable
  * arithmetic, so — like [[TextAnalysis.unigramScore]] and
  * [[Retrieval.bm25TopK]] — this avoids float transcendentals entirely.
  *
  * Model: maximum-likelihood bigram conditionals,
  * p(w2|w1) = c(w1 w2) / c(w1 ·), estimated from the scored corpus in
  * the same pass. Every observed bigram has p > 0 by construction, so
  * no smoothing is needed for the mean to be defined; a doc full of
  * boilerplate (high-frequency transitions) scores near the top of the
  * scale, free-form prose scores low — the ranking perplexity filtering
  * wants.
  *
  * Determinism note: each conditional is materialized as an INTEGER —
  * parts-per-billion, `c(w1 w2)·10⁹ div c(w1 ·)` — not a double cast
  * to decimal. A double→decimal cast rounds ties differently across
  * engines (Spark HALF_UP vs half-even), and p = 1/2^11-style rationals
  * land exactly on such ties; integer floor-division is bit-identical
  * everywhere. The bound this buys costs: a single bigram TYPE may
  * occur at most ~9.2e9 times (long overflow on the ·10⁹ scale-up) —
  * at corpus sizes beyond that, drop the scale literal to 10⁶.
  *
  * Plan shape: one posexplode (scan stage) → one `lead` window per
  * doc_id (the only full-corpus shuffle) → two cardinality-bounded
  * count aggregates (bigram types, unigram heads) → keyed joins back
  * on the bigram → per-doc exact integer mean. No pair space, no
  * self-joins; the `w1` join key is Zipf-skewed (stopword heads), which
  * AQE skew-join splits — same posture as the q63 term join.
  */
object LangModel {

  /** Per-doc mean bigram conditional probability, in parts-per-billion.
    *
    * Output: (doc_id, n_bigrams, mean_p_ppb) — one row per document
    * with at least one bigram (docs with fewer than two tokens have no
    * defined score and are absent). `mean_p_ppb / 1e9` is the mean
    * conditional probability; keep it scaled when only the ranking
    * matters.
    */
  def bigramCondProbScore(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = docs
      .select(id.as("doc_id"), posexplode(TextHash.tokens(text)).as(Seq("pos", "w")))
    val perDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bg = toks
      .withColumn("w2", lead(col("w"), 1).over(perDoc))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("w"), col("w2"))
    // c(w1 ·): bigram tokens grouped by head — the MLE denominator
    val c1 = bg.groupBy(col("w")).agg(count(lit(1)).as("__c1"))
    val cb = bg.groupBy(col("w"), col("w2")).agg(count(lit(1)).as("__cb"))
    bg
      .join(cb, Seq("w", "w2"))
      .join(c1, Seq("w"))
      // integer floor-division: exact and engine-portable (see scaladoc)
      .select(col("doc_id"), expr("__cb * 1000000000L div __c1").as("__ppb"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        (sum(col("__ppb")).cast("double") /
          count(lit(1)).cast("double")).as("mean_p_ppb"))
  }

  /** Trigram LM score with Stupid Backoff (Brants et al., EMNLP'07):
    * each scored trigram takes p(w3|w1w2) = c(w1w2w3)/c(w1w2·) when the
    * trigram was seen in TRAINING, else backs off to 0.4·c(w2w3)/c(w2·),
    * else to 0.4²·c(w3)/N — the web-scale recipe that skips normalized
    * smoothing because the fixed backoff factor preserves the ranking.
    * Train and score are SEPARATE relations (held-out scoring is what
    * makes backoff fire at all; scoring a corpus on itself never leaves
    * the top level).
    *
    * Integer-portable like [[bigramCondProbScore]]: every conditional
    * is parts-per-billion floor-division and the 0.4 factors are ·2 div
    * 5 — no double→decimal casts anywhere. Unigrams unseen even at the
    * bottom level score 0 ppb (no normalization debt).
    *
    * Plan: two lead windows (train + score token streams, the only
    * event-scale shuffles), five cardinality-bounded count aggregates
    * off the train stream, five LEFT equi-joins keyed by the n-gram
    * (Zipf-skewed heads → AQE skew-join, the q63/q107 posture), a
    * 1-row broadcast for N, one per-doc aggregate.
    *
    * Output: (doc_id, n_trigrams, n_tri_hits, n_bi_backoff,
    * n_uni_backoff, mean_p_ppb); scored docs with < 3 tokens are
    * absent.
    */
  def trigramBackoffScore(
      train: DataFrame, score: DataFrame,
      id: Column, text: Column): DataFrame = {
    def tokStream(df: DataFrame) = df
      .select(id.as("doc_id"), posexplode(TextHash.tokens(text)).as(Seq("pos", "w")))
    def triStream(df: DataFrame) = {
      val perDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      tokStream(df)
        .withColumn("w2", lead(col("w"), 1).over(perDoc))
        .withColumn("w3", lead(col("w"), 2).over(perDoc))
        .filter(col("w3").isNotNull)
        .select(col("doc_id"), col("w").as("w1"), col("w2"), col("w3"))
    }
    val trainToks = tokStream(train)
    val triTr = triStream(train)
    val perDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bgTr = trainToks
      .withColumn("b", lead(col("w"), 1).over(perDoc))
      .filter(col("b").isNotNull)
      .select(col("w").as("a"), col("b"))
    val ct3 = triTr.groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("__c3"))
    val ct2 = triTr.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c2"))
    val cb2 = bgTr.groupBy(col("a"), col("b")).agg(count(lit(1)).as("__cb"))
    val cb1 = bgTr.groupBy(col("a")).agg(count(lit(1)).as("__cb1"))
    val cu = trainToks.groupBy(col("w")).agg(count(lit(1)).as("__cu"))
    val n = trainToks.agg(count(lit(1)).as("__nt"))
    val scored = triStream(score)
      .join(ct3, Seq("w1", "w2", "w3"), "left")
      .join(ct2, Seq("w1", "w2"), "left")
      .join(cb2.withColumnRenamed("a", "w2").withColumnRenamed("b", "w3"),
        Seq("w2", "w3"), "left")
      .join(cb1.withColumnRenamed("a", "w2"), Seq("w2"), "left")
      .join(cu.withColumnRenamed("w", "w3"), Seq("w3"), "left")
      .crossJoin(broadcast(n))
      .select(col("doc_id"),
        when(col("__c3").isNotNull, lit(0))
          .when(col("__cb").isNotNull, lit(1))
          .otherwise(lit(2)).as("__lvl"),
        when(col("__c3").isNotNull, expr("__c3 * 1000000000L div __c2"))
          .when(col("__cb").isNotNull, expr("(__cb * 1000000000L div __cb1) * 2 div 5"))
          .otherwise(expr("((coalesce(__cu, 0L) * 1000000000L div __nt) * 2 div 5) * 2 div 5"))
          .as("__ppb"))
    scored.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_trigrams"),
        sum(when(col("__lvl") === 0, 1L).otherwise(0L)).as("n_tri_hits"),
        sum(when(col("__lvl") === 1, 1L).otherwise(0L)).as("n_bi_backoff"),
        sum(when(col("__lvl") === 2, 1L).otherwise(0L)).as("n_uni_backoff"),
        (sum(col("__ppb")).cast("double") /
          count(lit(1)).cast("double")).as("mean_p_ppb"))
  }

  /** Multinomial Naive Bayes text classifier, trained and scored in
    * ONE all-integer pipeline — the trainable gate a curation pipeline
    * puts next to the Gopher heuristics (train on a labeled slice,
    * e.g. curated-vs-rejected or per-domain, score the rest).
    *
    * TRAIN (per class y): token counts c(w,y), class token totals
    * N_y, vocabulary size V (distinct training tokens), doc priors
    * docs_y/D. SCORE: each token contributes the Laplace-smoothed
    * conditional as parts-per-billion floor-division
    * `(c(w,y)+1)·10⁹ div (N_y+V)`; the class prior joins as ONE
    * pseudo-token (`docs_y·10⁹ div D`), and a doc's class score is the
    * integer mean over (n_tokens + 1) contributions. Decision =
    * argmax score, ties to the lexicographically smallest label.
    *
    * This is deliberately the ARITHMETIC-mean-likelihood variant, not
    * the log-sum posterior: logs are libm territory (the catalog's
    * log-free discipline — an oracle on another engine could diverge
    * in the last ulp and flip an argmax), while floor-division ppb
    * arithmetic is bit-identical everywhere. The ranking it induces
    * favors the class whose unigram distribution overlaps the doc
    * most, which is exactly the gate semantics; the spec pins the
    * decision boundary on a hand corpus.
    *
    * Plan shape: two explodes (train/score token streams); the count
    * aggregates are vocabulary- or class-bounded after map-side
    * partials; scoring joins are token-keyed equi-joins (Zipf-skewed
    * heads → AQE skew-join, the q63/q107 posture) with the per-class
    * fanout a broadcast of the tiny class relation; one per-(doc,
    * class) aggregate and one per-doc argmax window.
    *
    * Output: [[naiveBayesScores]] is the full per-class table
    * (doc_id, y, n_tokens, score_ppb) — one row per (scored doc with
    * non-null text, class) — for score-consuming evaluations
    * (one-vs-rest AUC, per-class calibration); [[naiveBayesClassify]]
    * reduces it to the per-doc argmax row
    * (doc_id, predicted, score_ppb, n_tokens).
    */
  /** CCNet-style per-language quality bucketing (Wenzek et al.,
    * LREC'20): train an add-one-smoothed unigram LM per language on a
    * trusted slice, score every document by its mean token probability,
    * and split each language's documents into `nBuckets` quality
    * terciles (bucket 1 = head = most LM-like, the slice CCNet keeps
    * for pretraining). Scoring by mean probability rather than mean
    * log-probability keeps the whole pipeline in exact integer
    * parts-per-billion (no libm) — a monotone-enough surrogate for the
    * bucketing use and bit-replayable by any engine.
    *
    * Output: (doc_id, lang, n_tokens, mean_p_ppb, bucket), one row per
    * scored doc whose language has training data; ties broken by
    * doc_id so the tercile assignment is deterministic.
    *
    * Plan shape: one explode per stream; the (lang, token) count table
    * is vocabulary-bounded after map-side partials; the per-lang
    * (N, V) table is |langs| rows and broadcasts; scoring is a
    * token-keyed LEFT equi-join (Zipf heads → AQE skew-join, the
    * q63/q107 posture); one per-doc aggregate; the final ntile is a
    * per-language window — the only full-sort, keyed by lang, over the
    * doc-level (not token-level) relation.
    */
  def unigramQualityBuckets(
      train: DataFrame, score: DataFrame,
      id: Column, text: Column, lang: Column,
      nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"unigramQualityBuckets: nBuckets >= 2, got $nBuckets")
    val trainToks = train
      .filter(text.isNotNull && lang.isNotNull)
      .select(lang.as("lang"), explode(TextHash.tokens(text)).as("w"))
    val cnt = trainToks.groupBy(col("lang"), col("w")).agg(count(lit(1)).as("__c"))
    val nv = trainToks.groupBy(col("lang"))
      .agg(count(lit(1)).as("__n"), countDistinct(col("w")).as("__v"))
    val toks = score
      .filter(text.isNotNull && lang.isNotNull)
      .select(id.as("doc_id"), lang.as("lang"), explode(TextHash.tokens(text)).as("w"))
    val scored = toks
      .join(broadcast(nv), Seq("lang"))
      .join(cnt, Seq("lang", "w"), "left")
      .select(col("doc_id"), col("lang"),
        // add-one smoothing: unseen tokens get 1/(N+V)
        expr("(coalesce(__c, 0L) + 1L) * 1000000000L div (__n + __v)").as("__ppb"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(
        count(lit(1)).as("n_tokens"),
        (sum(col("__ppb")).cast("double") /
          count(lit(1)).cast("double")).as("mean_p_ppb"))
    val terciles = Window.partitionBy(col("lang"))
      .orderBy(col("mean_p_ppb").desc, col("doc_id"))
    scored.withColumn("bucket", ntile(nBuckets).over(terciles))
  }

  def naiveBayesScores(
      train: DataFrame, score: DataFrame,
      label: Column, id: Column, text: Column): DataFrame = {
    val trainToks = train
      .filter(label.isNotNull && text.isNotNull)
      .select(label.as("y"), explode(TextHash.tokens(text)).as("w"))
    val cwy = trainToks.groupBy(col("w"), col("y")).agg(count(lit(1)).as("__cwy"))
    val ny = trainToks.groupBy(col("y")).agg(count(lit(1)).as("__ny"))
    val vocab = trainToks.agg(countDistinct(col("w")).as("__v"))
    val priors = train.filter(label.isNotNull && text.isNotNull)
      .groupBy(label.as("y")).agg(count(lit(1)).as("__dy"))
    val total = train.filter(label.isNotNull && text.isNotNull)
      .agg(count(lit(1)).as("__d"))
    // every (class) row, with its denominator and prior pre-joined —
    // a tiny relation (|classes| rows), broadcast into the token scan
    val classes = priors
      .join(ny, Seq("y"))
      .crossJoin(vocab)
      .crossJoin(total)
      .select(col("y"), col("__ny"), col("__v"),
        expr("__dy * 1000000000L div __d").as("__prior_ppb"))
    val scoreToks = score.filter(text.isNotNull)
      .select(id.as("doc_id"), explode(TextHash.tokens(text)).as("w"))
    val perTok = scoreToks
      .crossJoin(broadcast(classes))
      .join(cwy, Seq("w", "y"), "left")
      .select(col("doc_id"), col("y"), col("__prior_ppb"),
        expr("(coalesce(__cwy, 0L) + 1L) * 1000000000L div (__ny + __v)").as("__ppb"))
    // zero-token docs still classify (by prior alone): re-attach every
    // scored doc × class so the aggregate never loses them
    val docClass = score.filter(text.isNotNull).select(id.as("doc_id"))
      .crossJoin(broadcast(classes.select(col("y"), col("__prior_ppb"))))
    val perClass = docClass
      .join(perTok.groupBy(col("doc_id"), col("y"))
          .agg(sum(col("__ppb")).as("__sum"), count(lit(1)).as("__n")),
        Seq("doc_id", "y"), "left")
      .select(col("doc_id"), col("y"),
        coalesce(col("__n"), lit(0L)).as("n_tokens"),
        expr("(__prior_ppb + coalesce(__sum, 0L)) div (coalesce(__n, 0L) + 1L)")
          .as("score_ppb"))
    perClass
      .select(col("doc_id"), col("y"), col("n_tokens"), col("score_ppb"))
  }

  def naiveBayesClassify(
      train: DataFrame, score: DataFrame,
      label: Column, id: Column, text: Column): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_ppb").desc, col("y"))
    naiveBayesScores(train, score, label, id, text)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("y").as("predicted"),
        col("score_ppb"), col("n_tokens"))
  }
}
