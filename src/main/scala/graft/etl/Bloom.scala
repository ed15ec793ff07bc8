package graft.etl

/** Fixed-size bloom filter over 64-bit `xxhash64` hashes — the
  * manifest-resident file-skipping index for POINT lookups on a column
  * the table is NOT clustered by (Delta's bloom-filter-index idea on
  * the manifest's terms). Range stats prune `WHERE k BETWEEN ...` on
  * the clustered column; they are useless for `WHERE user_id = x` on a
  * column whose values scatter uniformly across every file — exactly
  * the needle-in-haystack shape of scattered CDC deletes and
  * entity-lookup queries at 100 TB. A 512-byte filter per ~1 GB file
  * (4096 bits, k=6) holds ~400 distinct values at <1% false positives
  * and degrades GRACEFULLY: a saturated filter returns "maybe" for
  * everything — pruning weakens, correctness never depends on it.
  *
  * Double hashing (Kirsch–Mitzenmacher): bit_i = h1 + i·h2 over the
  * single xxhash64 value — the same hash Spark's `xxhash64` SQL
  * function computes distributed at stage time, re-derived on the
  * driver for query literals via the Catalyst expression, so the two
  * sides agree by construction.
  */
object Bloom {
  val Bits: Int = 4096
  private val Words = Bits / 64
  private val K = 6

  def empty(): Array[Long] = new Array[Long](Words)

  def add(bits: Array[Long], h: Long): Unit = {
    val h1 = h
    val h2 = java.lang.Long.rotateLeft(h, 32) | 1L // odd -> full period
    var i = 0
    while (i < K) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, Bits.toLong).toInt
      bits(bit >> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  def mightContain(bits: Array[Long], h: Long): Boolean = {
    val h1 = h
    val h2 = java.lang.Long.rotateLeft(h, 32) | 1L
    var i = 0
    while (i < K) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, Bits.toLong).toInt
      if ((bits(bit >> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = a.clone()
    var i = 0
    while (i < Words) { out(i) |= b(i); i += 1 }
    out
  }

  /** Manifest-field codec: base64 of the raw little-endian words. */
  def encode(bits: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(Words * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bits.foreach(bb.putLong)
    java.util.Base64.getEncoder.withoutPadding.encodeToString(bb.array())
  }

  def decode(s: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(s)
    require(bytes.length == Words * 8,
      s"Bloom.decode: expected ${Words * 8} bytes, got ${bytes.length}")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(Words)(bb.getLong)
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
