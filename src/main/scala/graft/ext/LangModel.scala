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
}
