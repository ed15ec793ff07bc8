package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML/markup main-content extraction — the FIRST stage of every
  * web-corpus curation pipeline (CommonCrawl-style), run before any
  * quality gate can meaningfully measure text: strip tags, drop
  * script/style/comment blocks wholesale, decode the core entity set,
  * and normalize whitespace, in ONE linear pass per document.
  *
  * The transformation is defined as EXACTLY equivalent to this
  * RE2-safe regex pipeline (so a SQL oracle replays it verbatim on
  * tag-clean planted text):
  *
  *   1. `(?is)<script[^>]*>.*?</script>` → `' '`  (unclosed → to EOF)
  *   2. `(?is)<style[^>]*>.*?</style>`   → `' '`  (unclosed → to EOF)
  *   3. `(?s)<!--.*?-->`                 → `' '`  (unclosed → to EOF)
  *   4. `<[^>]*>`                        → `' '`  (every other tag;
  *                                         an unclosed `<...` → to EOF)
  *   5. entity decode in TEXT runs only: `&lt;` `&gt;` `&quot;`
  *      `&apos;`/`&#39;` `&nbsp;`(→ space) first, numeric `&#NNN;` /
  *      `&#xHH;` (valid Unicode scalar) next, `&amp;` LAST (so
  *      `&amp;lt;` decodes to the literal `&lt;`, never to `<`);
  *      anything unrecognized stays verbatim;
  *   6. collapse `\s+` → one space, trim both ends.
  *
  * The single-pass state machine implements those semantics without
  * materializing five intermediate strings — the difference between
  * one scan and six at 100 TB. Entities decoded to `<` do NOT open
  * tags (decode happens logically after tag stripping, the HTML5
  * text-content rule). Null input → null; non-HTML text passes
  * through with only whitespace normalization, so the stage is safe
  * to run unconditionally.
  */
case class HtmlExtract(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"html_extract requires string, got $other")
  }

  /** Linear scan; public so codegen can call it. */
  def extract(in: UTF8String): UTF8String = {
    val s = in.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false

    // EXACTLY RE2's \s class — measured against DuckDB regexp_replace:
    // {\t \n \f \r space}, NOT \x0B and NOT Character.isWhitespace
    // (a strict superset: U+3000, U+2028/29, U+001C-1F) and NOT
    // U+00A0 — any wider set breaks oracle parity on CJK web text.
    def isWsRe2(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'
    def emit(c: Char): Unit = {
      if (isWsRe2(c)) pendingSpace = true
      else {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(c)
      }
    }
    def emitCodePoint(cp: Int): Unit = {
      if (Character.isBmpCodePoint(cp)) emit(cp.toChar)
      else {
        // astral plane: the pair is non-whitespace by construction
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.appendCodePoint(cp)
      }
    }
    // true iff s[i..] starts the (ASCII, case-insensitive) word and the
    // next char ends a tag name (whitespace, '>', '/', or EOF)
    def tagAt(i: Int, word: String): Boolean = {
      if (i + word.length > n) return false
      var k = 0
      while (k < word.length) {
        val c = s.charAt(i + k)
        val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        if (lc != word.charAt(k)) return false
        k += 1
      }
      val j = i + word.length
      j >= n || s.charAt(j) == '>' || s.charAt(j) == '/' ||
        Character.isWhitespace(s.charAt(j))
    }
    def indexOfCi(from: Int, word: String): Int = {
      var i = from
      while (i + word.length <= n) {
        if (tagAt(i + 2, word) && s.charAt(i) == '<' && s.charAt(i + 1) == '/')
          return i
        i += 1
      }
      -1
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        pendingSpace = true // every dropped block reads as ' '
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (tagAt(i + 1, "script")) {
          val close = indexOfCi(i + 1, "script")
          if (close < 0) i = n
          else {
            val gt = s.indexOf('>', close)
            i = if (gt < 0) n else gt + 1
          }
        } else if (tagAt(i + 1, "style")) {
          val close = indexOfCi(i + 1, "style")
          if (close < 0) i = n
          else {
            val gt = s.indexOf('>', close)
            i = if (gt < 0) n else gt + 1
          }
        } else {
          val gt = s.indexOf('>', i + 1)
          i = if (gt < 0) n else gt + 1
        }
      } else if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        // entity names are short; anything over 12 chars is literal text
        if (semi < 0 || semi - i > 12) { emit(c); i += 1 }
        else {
          val name = s.substring(i + 1, semi)
          val decoded: Int = name match {
            case "amp" => '&'.toInt
            case "lt" => '<'.toInt
            case "gt" => '>'.toInt
            case "quot" => '"'.toInt
            case "apos" => '\''.toInt
            case "nbsp" => ' '.toInt
            case _ if name.length >= 2 && name.charAt(0) == '#' =>
              val (digits, radix) =
                if (name.charAt(1) == 'x' || name.charAt(1) == 'X')
                  (name.substring(2), 16)
                else (name.substring(1), 10)
              try {
                val cp = Integer.parseInt(digits, radix)
                // isValidCodePoint accepts U+D800-DFFF; a decoded lone
                // surrogate would be ill-formed after UTF8String
                // conversion — leave such references verbatim instead
                if (Character.isValidCodePoint(cp) && cp > 0 &&
                  (cp < 0xD800 || cp > 0xDFFF)) cp
                else -1
              } catch { case _: NumberFormatException => -1 }
            case _ => -1
          }
          if (decoded >= 0) { emitCodePoint(decoded); i = semi + 1 }
          else { emit(c); i += 1 } // unrecognized: '&' verbatim, rescan rest
        }
      } else { emit(c); i += 1 }
    }
    UTF8String.fromString(out.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("htmlExtract", this, classOf[HtmlExtract].getName)
    defineCodeGen(ctx, ev, c => s"$ref.extract($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlExtract =
    copy(child = newChild)
}

/** Column-API wrapper for [[HtmlExtract]]. */
object HtmlFunctions {
  def htmlExtract(html: Column): Column =
    GraftExprBridge.column(HtmlExtract(GraftExprBridge.expression(html)))
}
