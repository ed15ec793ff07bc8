package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM Viterbi segmentation (the inference core of a
  * SentencePiece-style tokenizer, Kudo ACL'18): split a word into the
  * vocabulary pieces maximizing Σ(score_ppb(piece) − λ) — the additive
  * integer surrogate for unigram log-likelihood (λ plays −log of the
  * uniform base probability; with λ above every score, piece count
  * dominates and learned scores break ties, all in exact longs — no
  * logs, no float products that floor to zero).
  *
  * Canonical tie-break: backtrace from the end picks, at every
  * position, the smallest predecessor among optimal transitions
  * (longest-last-piece) — the lexicographically minimal optimal
  * boundary sequence, so any engine enumerating segmentations with
  * (value DESC, boundaries-from-right ASC) reproduces the exact same
  * pieces. Out-of-vocabulary single characters are always admissible
  * at score 0 (the UNK floor), so every word segments.
  *
  * The piece table is the MODEL — plan-time constant, bounded by the
  * trainer's vocab cap — never a per-row relation. Codegen calls a
  * referenced model object; no UDF, no serialization per batch.
  */
case class UnigramSegment(
    child: Expression,
    pieces: Seq[(String, Long)],
    lambdaPpb: Long,
    maxPieceLen: Int) extends UnaryExpression {

  require(maxPieceLen >= 1 && maxPieceLen <= 16,
    s"unigram_segment: maxPieceLen in [1, 16], got $maxPieceLen")
  require(lambdaPpb > 0L, s"unigram_segment: lambdaPpb > 0 required")
  require(pieces.size <= (1 << 20), "unigram_segment: model too large")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"unigram_segment requires string, got $other")
  }

  @transient private lazy val scoreMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
    pieces.foreach { case (p, s) => m.put(p, java.lang.Long.valueOf(s)) }
    m
  }

  /** Viterbi + canonical backtrace; public so codegen can call it. */
  def segment(wordU: UTF8String): GenericArrayData = {
    val w = wordU.toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val NEG = java.lang.Long.MIN_VALUE / 4
    val dp = new Array[Long](n + 1)
    var j = 1
    while (j <= n) { dp(j) = NEG; j += 1 }
    j = 1
    while (j <= n) {
      var d = 1
      val dMax = math.min(maxPieceLen, j)
      while (d <= dMax) {
        val i = j - d
        if (dp(i) != NEG) {
          val sc = pieceScore(w, i, j, d)
          if (sc != NEG) {
            val v = dp(i) + sc - lambdaPpb
            if (v > dp(j)) dp(j) = v
          }
        }
        d += 1
      }
      j += 1
    }
    // backtrace: smallest predecessor among optimal transitions
    val out = new java.util.ArrayList[UTF8String](n)
    var pos = n
    while (pos > 0) {
      var chosen = -1
      var i = math.max(0, pos - maxPieceLen)
      while (i < pos && chosen < 0) {
        if (dp(i) != NEG) {
          val sc = pieceScore(w, i, pos, pos - i)
          if (sc != NEG && dp(i) + sc - lambdaPpb == dp(pos)) chosen = i
        }
        i += 1
      }
      // chosen >= 0 always: single chars are admissible, so dp is total
      out.add(UTF8String.fromString(w.substring(chosen, pos)))
      pos = chosen
    }
    val arr = new Array[Any](out.size)
    var k = 0
    while (k < out.size) { arr(k) = out.get(out.size - 1 - k); k += 1 }
    new GenericArrayData(arr)
  }

  private def pieceScore(w: String, i: Int, j: Int, d: Int): Long = {
    val s = scoreMap.get(w.substring(i, j))
    if (s != null) s.longValue()
    else if (d == 1) 0L
    else java.lang.Long.MIN_VALUE / 4
  }

  override protected def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModel", this, classOf[UnigramSegment].getName)
    defineCodeGen(ctx, ev, c => s"$ref.segment($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

object TokenizerFunctions {
  def unigramSegment(
      word: Column,
      pieces: Seq[(String, Long)],
      lambdaPpb: Long,
      maxPieceLen: Int): Column =
    GraftExprBridge.column(UnigramSegment(
      GraftExprBridge.expression(word), pieces, lambdaPpb, maxPieceLen))
}
