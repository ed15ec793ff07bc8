package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.ext.TextHash

/** Native Catalyst expressions for the text-dedup hot paths — same
  * motivation as [[VectorExprs]]: the per-element math is trivial, so
  * interpreted HOF lambda dispatch dominates; a compiled loop removes it
  * while the DuckDB oracle keeps reproducing every value from the md5
  * formulas in [[TextHash]].
  */

/** array<long> (md5-derived shingle hashes in [0, P)) → array<long>
  * minhash signature of length k: entry i = min over shingles of
  * (a_i·h + b_i) mod P, with (a_i, b_i) = [[TextHash.minhashParams]].
  * Empty input (or all-null elements per position) yields null entries —
  * matching array_min over an empty/null transform.
  */
case class MinhashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  @transient private lazy val params: Array[(Long, Long)] =
    TextHash.minhashParams(k).toArray
  @transient private lazy val as: Array[Long] = params.map(_._1)
  @transient private lazy val bs: Array[Long] = params.map(_._2)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"minhash_sig requires array<bigint>, got $other")
  }

  private val P = TextHash.MinhashPrime

  override protected def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    val n = ad.numElements()
    val mins = new Array[Any](k)
    var i = 0
    while (i < k) {
      val (a, b) = (as(i), bs(i))
      var min = Long.MaxValue
      var seen = false
      var j = 0
      while (j < n) {
        if (!ad.isNullAt(j)) {
          val v = (ad.getLong(j) * a + b) % P
          if (v < min) min = v
          seen = true
        }
        j += 1
      }
      mins(i) = if (seen) java.lang.Long.valueOf(min) else null
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
      // every local through freshName: this snippet inlines into the
      // enclosing generated method, where bare names collide
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val min = ctx.freshName("min")
      val seen = ctx.freshName("seen")
      val v = ctx.freshName("v")
      s"""
        int $n = $c.numElements();
        Object[] $mins = new Object[$k];
        for (int $i = 0; $i < $k; $i++) {
          long $a = $aRef[$i]; long $b = $bRef[$i];
          long $min = Long.MAX_VALUE; boolean $seen = false;
          for (int $j = 0; $j < $n; $j++) {
            if (!$c.isNullAt($j)) {
              long $v = ($c.getLong($j) * $a + $b) % ${P}L;
              if ($v < $min) { $min = $v; }
              $seen = true;
            }
          }
          $mins[$i] = $seen ? (Object) Long.valueOf($min) : null;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** array<long> (token hashes) → 64-bit SimHash: bit j of the result is
  * set when Σ over tokens of (hash bit j ? +1 : -1) is positive. A null
  * element contributes -1 to every bit (the exact fold semantics of the
  * HOF formulation it replaces). Empty array → 0.
  */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"simhash64 requires array<bigint>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val ad = input.asInstanceOf[ArrayData]
    val n = ad.numElements()
    val counts = new Array[Long](64)
    var j = 0
    while (j < n) {
      if (ad.isNullAt(j)) {
        var p = 0
        while (p < 64) { counts(p) -= 1; p += 1 }
      } else {
        val h = ad.getLong(j)
        var p = 0
        while (p < 64) {
          counts(p) += (if (((h >> p) & 1L) == 1L) 1L else -1L)
          p += 1
        }
      }
      j += 1
    }
    var sim = 0L
    var p = 0
    while (p < 64) { if (counts(p) > 0) sim |= (1L << p); p += 1 }
    java.lang.Long.valueOf(sim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val h = ctx.freshName("h")
      val sim = ctx.freshName("sim")
      s"""
        int $n = $c.numElements();
        long[] $counts = new long[64];
        for (int $j = 0; $j < $n; $j++) {
          if ($c.isNullAt($j)) {
            for (int $p = 0; $p < 64; $p++) { $counts[$p] -= 1L; }
          } else {
            long $h = $c.getLong($j);
            for (int $p = 0; $p < 64; $p++) {
              $counts[$p] += ((($h >> $p) & 1L) == 1L) ? 1L : -1L;
            }
          }
        }
        long $sim = 0L;
        for (int $p = 0; $p < 64; $p++) { if ($counts[$p] > 0L) { $sim |= (1L << $p); } }
        ${ev.value} = $sim;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

/** string → array<long>: whitespace-tokenize, build word n-gram
  * shingles, md5-hash each ([[TextHash.hash64Local]] semantics, optional
  * mod), distinct (post-mod, first-occurrence order). One compiled pass —
  * replaces a wordShingles→md5-transform chain whose interpreted lambdas
  * dominate the dedup pipelines. Null text → empty array (the HOF
  * formulation's CASE/otherwise([]) behavior), so nullable = false.
  */
case class WordShingleHashes(child: Expression, n: Int, mod: Long, distinct: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"word_shingle_hashes requires string, got $other")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) WordShingleHashes.Empty
    else WordShingleHashes.compute(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, mod, distinct)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val resultCode =
      s"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${childGen.isNull}
          ? graft.functions.WordShingleHashes.Empty()
          : graft.functions.WordShingleHashes.compute(${childGen.value}, $n, ${mod}L, $distinct);
      """
    ev.copy(code = code"$resultCode", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object WordShingleHashes {
  import org.apache.spark.unsafe.types.UTF8String

  // Java-friendly accessor for generated code
  def Empty(): GenericArrayData = EmptyArray
  private val EmptyArray = new GenericArrayData(Array.empty[Any])

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  /** md5-derived 60-bit hash of "0:" + s — identical to
    * [[TextHash.hash64Local]] / the Column-level md5 formula.
    */
  def hashOf(s: String): Long = hash64(s)

  private def hash64(s: String): Long = {
    val d = digest.get().digest(s"0:$s".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = upper 60 bits of the first 8 bytes except
    // the low nibble of byte 7
    var acc = 0L
    var i = 0
    while (i < 8) {
      val hi = (d(i) >> 4) & 0xf
      val lo = d(i) & 0xf
      if (i < 7) acc = (acc << 8) | (hi << 4) | lo
      else acc = (acc << 4) | hi
      i += 1
    }
    acc
  }

  def compute(text: UTF8String, n: Int, mod: Long, distinct: Boolean): GenericArrayData = {
    val toks0 = text.toString.split(" ")
    var nt = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) nt += 1; i += 1 }
    if (nt < n) return EmptyArray
    val toks = new Array[String](nt)
    var j = 0
    i = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) { toks(j) = toks0(i); j += 1 }
      i += 1
    }
    // distinct=true: first-occurrence-ordered set (dedup semantics);
    // distinct=false: every occurrence kept (SimHash votes)
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val all = if (distinct) null else new Array[Any](nt - n + 1)
    val sb = new java.lang.StringBuilder
    i = 0
    while (i <= nt - n) {
      sb.setLength(0)
      var w = 0
      while (w < n) {
        if (w > 0) sb.append(' ')
        sb.append(toks(i + w))
        w += 1
      }
      val h0 = hash64(sb.toString)
      val h = if (mod > 0) h0 % mod else h0
      if (distinct) out.add(h) else all(i) = h
      i += 1
    }
    if (!distinct) return new GenericArrayData(all)
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next().longValue(); p += 1 }
    new GenericArrayData(arr)
  }
}

/** string → language code: whitespace-tokenize, lowercase, count
  * stopword hits per language in one compiled pass, return the argmax
  * ratio's language — ties to the lexicographically LAST language (the
  * max-by-(ratio, lang)-struct semantics of the declarative
  * formulation), "und" when every ratio is zero.
  */
case class LangIdExpr(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  @transient private lazy val names: Array[String] =
    langs.map(_._1).sorted.toArray
  @transient private lazy val sets: Array[java.util.HashSet[String]] = {
    val byName = langs.toMap
    names.map { l =>
      val s = new java.util.HashSet[String]()
      byName(l).foreach(w => s.add(w))
      s
    }
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"lang_id requires string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    LangIdExpr.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], names, sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val namesRef = ctx.addReferenceObj("langNames", names, "java.lang.String[]")
      val setsRef = ctx.addReferenceObj("langSets", sets, "java.util.HashSet[]")
      s"${ev.value} = graft.functions.LangIdExpr.compute($c, $namesRef, $setsRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangIdExpr {
  import org.apache.spark.unsafe.types.UTF8String

  def compute(text: UTF8String, names: Array[String],
      sets: Array[java.util.HashSet[String]]): UTF8String = {
    val toks0 = text.toString.split(" ")
    val k = names.length
    val hits = new Array[Int](k)
    var nToks = 0
    var i = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) {
        nToks += 1
        val low = toks0(i).toLowerCase(java.util.Locale.ROOT)
        var l = 0
        while (l < k) { if (sets(l).contains(low)) hits(l) += 1; l += 1 }
      }
      i += 1
    }
    val denom = math.max(nToks, 1).toDouble
    // max by (ratio, lang): ascending scan keeps later (greater) lang on ties
    var bestR = -1.0
    var bestL = ""
    var l = 0
    while (l < k) {
      val r = hits(l) / denom
      if (r > bestR || (r == bestR && names(l) > bestL)) { bestR = r; bestL = names(l) }
      l += 1
    }
    UTF8String.fromString(if (bestR > 0.0) bestL else "und")
  }
}

/** string → nullable long: MIN over all char n-gram substrings of the
  * md5-derived 60-bit hash — the rolling document fingerprint, one
  * compiled pass with no array materialization (min over the multiset
  * equals min over the distinct set). Code-point stepping matches
  * substr()/DuckDB char semantics beyond ASCII. Shorter-than-n or null
  * text → null (the array_min-over-empty behavior).
  */
case class Fingerprint64(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"fingerprint64 requires string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    Fingerprint64.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("res")
      s"""
        Long $res = graft.functions.Fingerprint64.compute($c, $n);
        if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.longValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

object Fingerprint64 {
  def compute(text: org.apache.spark.unsafe.types.UTF8String, n: Int): java.lang.Long = {
    val s = text.toString
    val cps = s.codePoints().toArray
    if (cps.length < n) return null
    var min = Long.MaxValue
    var i = 0
    while (i <= cps.length - n) {
      val gram = new String(cps, i, n)
      val h = WordShingleHashes.hashOf(gram)
      if (h < min) min = h
      i += 1
    }
    java.lang.Long.valueOf(min)
  }
}

/** Unicode NFC normalization (UAX #15 canonical composition): "é" as
  * e+combining-acute and "é" as the precomposed code point are the SAME
  * text to a human and to a search index, but different bytes to every
  * hash-based dedup operator. Normalizing before fingerprint/minhash
  * keeps encoding-variant duplicates from escaping dedup. Spark has no
  * builtin for this; the JDK's `java.text.Normalizer` implements the
  * same Unicode standard DuckDB's `nfc_normalize` does. Fast path:
  * `Normalizer.isNormalized` is O(n) with no allocation and almost all
  * real text (all ASCII) is already NFC.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    NfcNormalize.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** string → struct of character-class counts in ONE compiled pass:
  * total code points, ASCII count, whitespace/digit/alpha/upper counts
  * (explicit ASCII classes — ' ', TAB, LF, CR; 0-9; A-Za-z; A-Z — so
  * every engine agrees; Java's `\s` and RE2's `\s` do NOT), distinct
  * ASCII code points, and the max occurrence count of any single ASCII
  * code point. The log-free entropy proxy for quality filtering: a
  * doc whose top character dominates, or whose distinct-character set
  * is tiny, is keyboard-mash or padding — and none of it needs a
  * per-character explode (which would shuffle 100 TB of text by
  * individual characters) or a `log` call (whose libm variance breaks
  * cross-engine hashing).
  */
case class CharClassStats(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType => L}
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", L, nullable = false),
    StructField("n_ascii", L, nullable = false),
    StructField("n_ws", L, nullable = false),
    StructField("n_digit", L, nullable = false),
    StructField("n_alpha", L, nullable = false),
    StructField("n_upper", L, nullable = false),
    StructField("n_distinct_ascii", L, nullable = false),
    StructField("top_ascii_count", L, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"char_class_stats requires string, got $other")
  }
  override def nullSafeEval(v: Any): Any =
    CharClassStats.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharClassStats.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): CharClassStats =
    copy(child = newChild)
  override def prettyName: String = "char_class_stats"
}

object CharClassStats {
  def compute(text: UTF8String): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val s = text.toString
    val hist = new Array[Int](128)
    var nChars = 0L; var nAscii = 0L; var nWs = 0L
    var nDigit = 0L; var nAlpha = 0L; var nUpper = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (cp < 128) {
        nAscii += 1
        hist(cp) += 1
        if (cp == 32 || cp == 9 || cp == 10 || cp == 13) nWs += 1
        else if (cp >= 48 && cp <= 57) nDigit += 1
        else if (cp >= 65 && cp <= 90) { nAlpha += 1; nUpper += 1 }
        else if (cp >= 97 && cp <= 122) nAlpha += 1
      }
      i += Character.charCount(cp)
    }
    var distinct = 0L; var top = 0L
    var c = 0
    while (c < 128) {
      if (hist(c) > 0) {
        distinct += 1
        if (hist(c) > top) top = hist(c)
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nChars, nAscii, nWs, nDigit, nAlpha, nUpper, distinct, top))
  }
}

/** |distinct(a) ∩ distinct(b)| over two array<long> columns — the exact
  * integer `size(array_intersect(a, b))` (the dedup verify kernel), as a
  * primitive open-addressing probe instead of the generic builtin, which
  * materializes the intersection ARRAY (boxed element writes) when only
  * its size is ever consumed. One linear pass per side, zero boxing, no
  * output array: the verify stage of the AllPairs family runs this once
  * per candidate pair, so the constant factor is the stage.
  * Input arrays must be containsNull=false (checked) — shingle/hash
  * relations are; null ARRAYS propagate null like the builtin chain.
  */
case class LongSetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, false), ArrayType(LongType, false)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"long_set_intersect_count requires two array<long> (containsNull=false), got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    LongSetIntersectCount.compute(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LongSetIntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongSetIntersectCount =
    copy(left = l, right = r)
}

object LongSetIntersectCount {
  /** Open-addressed probe: table the SMALLER side (dedup on insert),
    * probe the larger, tombstone each hit so duplicate probes can't
    * double-count. Exactly |distinct(a) ∩ distinct(b)|.
    */
  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val (s, p) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = s.numElements()
    if (n == 0 || p.numElements() == 0) return 0
    // n << 1 would wrap negative past 2^30 elements and the sizing loop
    // would never grow cap; unreachable under the 2 GB array limit but
    // guard it rather than hang
    require(n <= (1 << 29), s"LongSetIntersectCount: array too large ($n elements)")
    var cap = 4
    while (cap < (n << 1)) cap <<= 1
    val mask = cap - 1
    val table = new Array[Long](cap)
    // state: 0 = empty, 1 = present, 2 = already counted
    val state = new Array[Byte](cap)
    var i = 0
    while (i < n) {
      val v = s.getLong(i)
      var idx = (java.lang.Long.hashCode(v) * 0x9e3775cd) & mask
      while (state(idx) != 0 && table(idx) != v) idx = (idx + 1) & mask
      if (state(idx) == 0) { table(idx) = v; state(idx) = 1 }
      i += 1
    }
    var count = 0
    val m = p.numElements()
    i = 0
    while (i < m) {
      val v = p.getLong(i)
      var idx = (java.lang.Long.hashCode(v) * 0x9e3775cd) & mask
      while (state(idx) != 0 && table(idx) != v) idx = (idx + 1) & mask
      if (state(idx) == 1) { state(idx) = 2; count += 1 }
      i += 1
    }
    count
  }
}

object TextFunctions {
  def minhashSig(hashed: Column, k: Int): Column =
    GraftExprBridge.column(MinhashSig(GraftExprBridge.expression(hashed), k))

  def nfcNormalize(text: Column): Column =
    GraftExprBridge.column(NfcNormalize(GraftExprBridge.expression(text)))

  def simhash64(hashes: Column): Column =
    GraftExprBridge.column(Simhash64(GraftExprBridge.expression(hashes)))

  def wordShingleHashes(text: Column, n: Int, mod: Long = 0L, distinct: Boolean = true): Column =
    GraftExprBridge.column(WordShingleHashes(GraftExprBridge.expression(text), n, mod, distinct))

  def langId(text: Column, langs: Map[String, Seq[String]]): Column =
    GraftExprBridge.column(LangIdExpr(GraftExprBridge.expression(text), langs.toSeq))

  def fingerprint64(text: Column, n: Int): Column =
    GraftExprBridge.column(Fingerprint64(GraftExprBridge.expression(text), n))

  def charClassStats(text: Column): Column =
    GraftExprBridge.column(CharClassStats(GraftExprBridge.expression(text)))

  def longSetIntersectCount(a: Column, b: Column): Column =
    GraftExprBridge.column(LongSetIntersectCount(
      GraftExprBridge.expression(a), GraftExprBridge.expression(b)))
}
