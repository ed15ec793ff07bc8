package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable text hashing primitives.
  *
  * Everything is built on md5 so the DuckDB oracle can reproduce results
  * bit-for-bit (`conv(substr(md5(x),1,15),16,10)` here ==
  * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)` there). 15 hex chars =
  * 60 bits, always positive in a long.
  *
  * All functions are pure Column expressions — codegen-friendly, no UDFs,
  * safe in the hot path of a 100 TB dedup sweep.
  */
object TextHash {

  /** 60-bit seeded hash of a string column. */
  def hash64(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"$seed:"), c)), 1, 15), 16, 10).cast("long")

  /** Unseeded variant (seed 0). */
  def hash64(c: Column): Column = hash64(c, 0)

  /** Whitespace tokens with empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Distinct word n-gram shingles of a text column. Note the explicit
    * short-text guard: Spark's `sequence(1, 0)` yields a DESCENDING
    * [1,0], not an empty array.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct character n-gram shingles (same short-input guard). */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) >= n,
      array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** MinHash signature: k independent min-hashes over a shingle array.
    * O(k·|shingles|) per row, embarrassingly parallel, no shuffle.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map(seed =>
      array_min(transform(shingles, s => hash64(s, seed)))): _*)

  /** LSH band keys from a minhash signature: `bands` groups of
    * `rowsPerBand` signature entries, each rendered as one joinable
    * string key. Two docs sharing ANY band key are near-dup candidates.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val lo = b * rowsPerBand + 1
      concat_ws("_", lit(b.toString) +: (lo until lo + rowsPerBand)
        .map(i => element_at(sig, i).cast("string")): _*)
    }: _*)

  /** 64-bit SimHash of a token array: per-bit majority vote of token
    * hashes, folded with higher-order functions (no explode, no shuffle).
    */
  def simhash64(toks: Column): Column = {
    val counts = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = hash64(t)
        array((0 until 64).map(j =>
          element_at(acc, j + 1) +
            when(shiftright(h, j) % 2 === 1, lit(1L)).otherwise(lit(-1L))): _*)
      })
    (0 until 64).map(j =>
      when(element_at(counts, j + 1) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")

  /** Exact Jaccard similarity of two shingle arrays (intersection over
    * union of distinct elements).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b))).cast("double")
  }
}
