package graft.etl

/** Capacity-adaptive bloom filter over 64-bit `xxhash64` hashes — the
  * manifest-resident file-skipping index for POINT lookups on a column
  * the table is NOT clustered by (Delta's bloom-filter-index idea on
  * the manifest's terms). Range stats prune `WHERE k BETWEEN ...` on
  * the clustered column; they are useless for `WHERE user_id = x` on a
  * column whose values scatter uniformly across every file — exactly
  * the needle-in-haystack shape of scattered CDC deletes and
  * entity-lookup queries at 100 TB. Each file's filter is SIZED to its
  * observed distinct count (512 B … 128 KB, m = 12n bits, k=6 →
  * ~0.35% false positives at every scale); files beyond [[MaxDistinct]]
  * publish no filter at all rather than a saturated one that prunes
  * nothing while still costing probes. Degradation is GRACEFUL either
  * way: a missing filter means "always scan" — pruning weakens,
  * correctness never depends on it.
  *
  * Double hashing (Kirsch–Mitzenmacher): bit_i = h1 + i·h2 over the
  * single xxhash64 value — the same hash Spark's `xxhash64` SQL
  * function computes distributed at stage time, re-derived on the
  * driver for query literals via the Catalyst expression, so the two
  * sides agree by construction.
  */
object Bloom {
  /** The floor size (512 bytes — the original fixed size; every legacy
    * filter decodes as exactly this).
    */
  val Bits: Int = 4096
  private val K = 6

  /** CAPACITY-ADAPTIVE sizing: a filter's size is chosen from the
    * file's OBSERVED distinct count at build time — m = 12·n bits
    * rounded up to a power of two, clamped to [4096, 2²⁰] (512 B …
    * 128 KB). At m = 12n the fill is 1 − e^(−6n/12n) ≈ 0.39 and the
    * false-positive rate 0.39⁶ ≈ 0.35%, independent of n — a 1 GB
    * file with 40k distinct keys prunes exactly as well as a 16 MB
    * file with 400. The filter is self-describing (its length IS the
    * recorded distinct-scale), probes stay K regardless of size, and
    * the double-hash indices take the modulus from the array length,
    * so one codec serves every generation.
    */
  val MaxBits: Int = 1 << 20

  /** Files with more distinct values than this publish NO filter —
    * the saturation honesty: past the cap a filter either saturates
    * (prunes nothing, costs probes) or outgrows the manifest. A
    * filterless entry is conservatively always scanned.
    */
  val MaxDistinct: Int = MaxBits / 12

  /** Fill fraction past which a LEGACY fixed-size filter stops earning
    * its probes: at 0.75 the false-positive rate is 0.75⁶ ≈ 18% —
    * nearly every file "might contain" every value. Adaptive filters
    * never reach it (their fill is ~0.39 by construction); readers use
    * this to skip probing saturated filters from manifests written
    * before adaptive sizing existed.
    */
  val SaturationFill: Double = 0.75

  def saturated(bits: Array[Long]): Boolean = {
    var pop = 0
    var i = 0
    while (i < bits.length) { pop += java.lang.Long.bitCount(bits(i)); i += 1 }
    pop > (bits.length * 64 * SaturationFill).toInt
  }

  /** An empty filter sized for `n` observed distinct values. */
  def sized(n: Int): Array[Long] = {
    require(n <= MaxDistinct, s"Bloom.sized: $n > MaxDistinct $MaxDistinct")
    val wanted = math.max(Bits.toLong, 12L * math.max(1, n))
    val m = java.lang.Long.highestOneBit(wanted) match {
      case p if p == wanted => p
      case p => p << 1
    }
    new Array[Long]((math.min(m, MaxBits.toLong) / 64).toInt)
  }

  def empty(): Array[Long] = new Array[Long](Bits / 64)

  def add(bits: Array[Long], h: Long): Unit = {
    val m = bits.length.toLong * 64L
    val h1 = h
    val h2 = java.lang.Long.rotateLeft(h, 32) | 1L // odd -> full period
    var i = 0
    while (i < K) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, m).toInt
      bits(bit >> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  def mightContain(bits: Array[Long], h: Long): Boolean = {
    val m = bits.length.toLong * 64L
    val h1 = h
    val h2 = java.lang.Long.rotateLeft(h, 32) | 1L
    var i = 0
    while (i < K) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, m).toInt
      if ((bits(bit >> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** FOLD a power-of-two filter down to half its size by OR-ing the
    * two halves. Because every probe index is `(h1 + i·h2) mod m` with
    * m a power of two, `x mod m mod (m/2) = x mod (m/2)` — so the fold
    * is BIT-IDENTICAL to having built the filter at m/2 from the same
    * values. This is what lets a build pass size filters down (or a
    * merge pass reconcile differently-sized filters) without re-reading
    * any data: fold(sized(m)) ≡ sized(m/2), exactly.
    */
  def fold(bits: Array[Long]): Array[Long] = {
    require(bits.length > 1 && Integer.bitCount(bits.length) == 1,
      s"Bloom.fold: need a power-of-two filter above the floor, got " +
        s"${bits.length} words")
    val half = bits.length / 2
    val out = new Array[Long](half)
    var i = 0
    while (i < half) { out(i) = bits(i) | bits(i + half); i += 1 }
    out
  }

  /** Fold `bits` down until it matches `words` (a smaller or equal
    * power-of-two word count).
    */
  def foldTo(bits: Array[Long], words: Int): Array[Long] = {
    require(words >= Bits / 64 && words <= bits.length &&
      Integer.bitCount(words) == 1,
      s"Bloom.foldTo: cannot fold ${bits.length} words to $words")
    var cur = bits
    while (cur.length > words) cur = fold(cur)
    cur
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length,
      s"Bloom.merge: differently-sized filters (${a.length} vs ${b.length} " +
        "words) — merge is only defined within one build pass")
    val out = a.clone()
    var i = 0
    while (i < a.length) { out(i) |= b(i); i += 1 }
    out
  }

  /** Manifest-field codec: base64 of the raw little-endian words. The
    * length self-describes the filter size (power-of-two words).
    */
  def encode(bits: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bits.foreach(bb.putLong)
    java.util.Base64.getEncoder.withoutPadding.encodeToString(bb.array())
  }

  def decode(s: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(s)
    require(bytes.length >= 8 && bytes.length % 8 == 0 &&
      bytes.length <= MaxBits / 8,
      s"Bloom.decode: malformed filter of ${bytes.length} bytes")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  /** Spark's `xxhash64(value)` for a DRIVER-side literal — one Catalyst
    * expression eval, so query-time membership tests hash exactly like
    * the stage-time distributed pass. NULLs return None: a bloom never
    * indexes nulls (SQL equality never matches them anyway).
    */
  def hashLiteral(value: Any,
      dt: org.apache.spark.sql.types.DataType): Option[Long] = {
    if (value == null) return None
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    // Literal(v, dt) takes the INTERNAL representation — what analyzed
    // predicates and InSet hash sets carry (UTF8String for strings)
    Option(new XxHash64(Seq(Literal(value, dt))).eval(null))
      .map(_.asInstanceOf[Long])
  }

  /** The finite point set a predicate pins on `column` (equality / IN
    * conjuncts with foldable operands), as xxhash64 values — None when
    * the predicate doesn't constrain the column to points. Plain `=`
    * never matches NULL rows, so dropping nulls is sound. Used by the
    * DML candidate split AND the format FileIndex's planning-time
    * skipping.
    */
  private[graft] def pointHashes(column: String,
      preds: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Option[Set[Long]] = {
    import org.apache.spark.sql.catalyst.expressions._
    def isCol(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == column
      case _ => false
    }
    def hashes(e: Expression): Option[Set[Long]] = e match {
      case And(l, r) => hashes(l).orElse(hashes(r))
      case EqualTo(a, v) if isCol(a) && v.foldable =>
        hashLiteral(v.eval(null), v.dataType).map(Set(_))
      case EqualTo(v, a) if isCol(a) && v.foldable =>
        hashLiteral(v.eval(null), v.dataType).map(Set(_))
      case In(a, vs) if isCol(a) && vs.nonEmpty && vs.forall(_.foldable) =>
        val hs = vs.flatMap(v => hashLiteral(v.eval(null), v.dataType))
        if (hs.length == vs.length) Some(hs.toSet) else None
      case InSet(a, hset) if isCol(a) && hset.nonEmpty =>
        val hs = hset.toSeq.flatMap(v => hashLiteral(v, a.dataType))
        if (hs.length == hset.size) Some(hs.toSet) else None
      case _ => None
    }
    preds.map(SnapshotStore.inlineReplaceable).flatMap(e => hashes(e))
      .headOption
  }
}
