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

  /** Driver-side twin of [[hash64]] — same md5-derived 60-bit value,
    * computed in plain JVM code. Used to pre-compute data-independent
    * constants (minhash seeds, LSH hyperplanes) ONCE at plan time
    * instead of per row at execution time.
    */
  def hash64Local(s: String, seed: Int = 0): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$s".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

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

  /** Mersenne prime 2^31 - 1: minhash values live in [0, P); affine
    * products stay < 2^62 so the arithmetic is overflow-free in any
    * engine with 64-bit ints (the DuckDB oracle replicates it exactly).
    */
  val MinhashPrime: Long = 2147483647L

  /** Per-seed affine parameters (a, b), a in [1, P), b in [0, P),
    * derived deterministically from md5 so the oracle can inline the
    * same literals.
    */
  def minhashParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      (hash64Local(s"a:$i") % (MinhashPrime - 1) + 1, hash64Local(s"b:$i") % MinhashPrime)
    }

  /** One md5 per shingle, reduced into the minhash domain [0, P).
    * Materialize this ONCE as its own column; the k signature entries
    * then reuse it via cheap affine arithmetic. (The naive
    * per-seed-md5 formulation costs k md5s per shingle inside
    * interpreted HOF lambdas — 16× the work for no statistical gain.)
    */
  def hashedShingles(shingles: Column): Column =
    transform(shingles, s => hash64(s) % MinhashPrime)

  /** MinHash signature from a pre-hashed shingle array ([[hashedShingles]]):
    * k universal-family min-hashes h_i(x) = (a_i·x + b_i) mod P, as a
    * compiled loop (graft.functions.MinhashSig). O(k·|shingles|) per row,
    * embarrassingly parallel, no shuffle.
    */
  def minhashSignature(hashed: Column, k: Int): Column =
    graft.functions.TextFunctions.minhashSig(hashed, k)

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

  /** 64-bit SimHash of a token array: one md5 per token (transform),
    * then a compiled per-bit majority vote (graft.functions.Simhash64).
    * No explode, no shuffle.
    */
  def simhash64(toks: Column): Column =
    graft.functions.TextFunctions.simhash64(transform(toks, t => hash64(t)))

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")
}
