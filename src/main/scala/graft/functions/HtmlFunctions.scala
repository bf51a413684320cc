package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Boilerplate-stripping HTML → text extraction (the jusText /
  * trafilatura block-scoring family, Pomikálek 2011): strip comments and
  * raw script/style content, segment the tag stream into BLOCKS at
  * block-level tags, decode the standard character entities, and keep a
  * block when it reads like content rather than chrome:
  *
  *   kept :=  n_chars >= minChars
  *        AND link_chars * 1000 <= maxLinkPm * n_chars
  *        AND (n_stop * 1000 >= minStopPm * n_words OR n_chars >= longChars)
  *
  * where n_chars is the trimmed block length, link_chars counts
  * NON-WHITESPACE characters rendered inside <a> elements (navigation
  * chrome is link-saturated), words split on the pinned explicit
  * whitespace class (TextAnalysis.wsClass semantics, incl. U+000B), and
  * n_stop counts lowercase membership in a per-language high-frequency
  * function-word list ([[StopwordProfiles]] — "en" for the unary
  * `html_extract`; dispatched on a lang column for `html_extract_lang`,
  * unknown languages falling back to "en") — content prose carries
  * stopwords, keyword chrome does not; the longChars escape keeps long
  * technical / unprofiled-language blocks.
  *
  * Deterministic scanner contract (what the DuckDB oracle mirrors via
  * the fixture-generator arithmetic, and HtmlExtractPropSpec re-derives
  * with an independent regex-based reference):
  *  - `<!-- ... -->` skipped; an unterminated comment runs to EOF;
  *  - `<script ...>` / `<style ...>` raw content skipped to the matching
  *    case-insensitive close tag (to EOF when unclosed); the close-tag
  *    NAME must end at a non-letter/digit (`</scripts>` does NOT close a
  *    `<script>` — r15, was a prefix match);
  *  - a tag is `<` to the next `>` OUTSIDE single/double-quoted
  *    attribute values (r15 — `<a href="x>y">` is ONE tag; a quote left
  *    open makes the tag unterminated); an unterminated tag is junk to
  *    EOF; the tag NAME is the leading letter/digit run after an
  *    optional `/`;
  *  - block boundaries: p div h1-h6 li ul ol br table tr td th section
  *    article header footer nav blockquote pre title body html head
  *    form hr — open OR close flushes the current text buffer;
  *  - `<a>` nesting is tracked by depth (a close below zero clamps); a
  *    tag whose body ends with `/` outside quotes is SELF-CLOSING and
  *    leaves anchor depth unchanged (r15 — XHTML `<a ... />` no longer
  *    leaks link saturation over the rest of the document);
  *  - entities: &amp; &lt; &gt; &quot; &apos; &#39; &nbsp; (nbsp → one
  *    space); an unrecognized `&` is a literal ampersand;
  *  - blocks are trimmed of the explicit 6-char whitespace set;
  *    whitespace-only buffers produce no block.
  *
  * Emits (text_extracted = kept blocks joined by LF, n_blocks, n_kept,
  * chars_raw, chars_kept, link_chars) — exact integers end to end.
  *
  * Scale posture: a pure row-local scanner inside a codegen projection —
  * ZERO shuffles over 100 TB of crawl HTML; the single highest-traffic
  * operator in a real pipeline runs at scan speed, and every downstream
  * text gate (Gopher, C4, FineWeb, dedup) consumes its output column.
  */
object HtmlExtractImpl {

  val schema: StructType = StructType(Seq(
    StructField("text_extracted", StringType, nullable = false),
    StructField("n_blocks", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("chars_raw", LongType, nullable = false),
    StructField("chars_kept", LongType, nullable = false),
    StructField("link_chars", LongType, nullable = false)))

  /** lang → profile word set, built from the ONE canonical table
    * ([[StopwordProfiles]] — TextAnalysis.profiles is the same object).
    */
  val profileSets: java.util.HashMap[String, java.util.HashSet[String]] = {
    val m = new java.util.HashMap[String, java.util.HashSet[String]]()
    StopwordProfiles.table.foreach { case (lang, words) =>
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      m.put(lang, s)
    }
    m
  }

  /** The "en" profile — the unary `html_extract` stopword list and the
    * unknown-language fallback of `html_extract_lang`.
    */
  val stopwords: java.util.HashSet[String] = profileSets.get("en")

  private val blockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
      "br", "table", "tr", "td", "th", "section", "article", "header",
      "footer", "nav", "blockquote", "pre", "title", "body", "html",
      "head", "form", "hr").foreach(s.add)
    s
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** First occurrence of `</name` at/after `from` where the character
    * after the name is NOT a letter/digit (or the string ends) — the
    * r15 boundary rule: `</scripts>` must not close a `<script>`.
    */
  private def closeTagIndex(s: String, name: String, from: Int): Int = {
    val target = "</" + name
    var i = math.max(from, 0)
    val max = s.length - target.length
    while (i <= max) {
      if (s.regionMatches(true, i, target, 0, target.length)) {
        val after = i + target.length
        if (after >= s.length || !Character.isLetterOrDigit(s.charAt(after)))
          return i
      }
      i += 1
    }
    -1
  }

  /** Index of the tag-closing `>` at/after `from`, skipping `>` inside
    * single/double-quoted attribute values; −1 when the tag (or an open
    * quote) runs to EOF.
    */
  private def tagEnd(s: String, from: Int): Int = {
    var j = from
    var quote: Char = 0
    while (j < s.length) {
      val c = s.charAt(j)
      if (quote == 0) {
        if (c == '>') return j
        if (c == '"' || c == '\'') quote = c
      } else if (c == quote) quote = 0
      j += 1
    }
    -1
  }

  def extract(html: UTF8String, minChars: Int, maxLinkPm: Int,
      minStopPm: Int, longChars: Int): InternalRow =
    extractWith(html, stopwords, minChars, maxLinkPm, minStopPm, longChars)

  /** Profile-dispatched variant: a null/unprofiled lang falls back to
    * "en" (the fallback is part of the pinned contract — a crawl's lang
    * column routinely carries 'unknown').
    */
  def extractLang(html: UTF8String, lang: UTF8String, minChars: Int,
      maxLinkPm: Int, minStopPm: Int, longChars: Int): InternalRow = {
    val set =
      if (lang == null) stopwords
      else {
        val p = profileSets.get(lang.toString)
        if (p == null) stopwords else p
      }
    extractWith(html, set, minChars, maxLinkPm, minStopPm, longChars)
  }

  def extractWith(html: UTF8String, stops: java.util.HashSet[String],
      minChars: Int, maxLinkPm: Int, minStopPm: Int, longChars: Int): InternalRow = {
    val s = html.toString
    val n = s.length
    val kept = new java.lang.StringBuilder()
    var nBlocks = 0; var nKept = 0
    var charsRaw = 0L; var charsKept = 0L; var linkTotal = 0L
    val buf = new java.lang.StringBuilder()
    var bufLink = 0L
    var aDepth = 0

    def flush(): Unit = {
      var st = 0; var en = buf.length
      while (st < en && isWs(buf.charAt(st))) st += 1
      while (en > st && isWs(buf.charAt(en - 1))) en -= 1
      if (en > st) {
        val text = buf.substring(st, en)
        val nChars = text.length.toLong
        var words = 0L; var nStop = 0L
        var i = 0
        while (i < text.length) {
          if (!isWs(text.charAt(i))) {
            var j = i
            while (j < text.length && !isWs(text.charAt(j))) j += 1
            words += 1
            if (stops.contains(
              text.substring(i, j).toLowerCase(java.util.Locale.ROOT))) nStop += 1
            i = j
          } else i += 1
        }
        nBlocks += 1; charsRaw += nChars; linkTotal += bufLink
        val keep = nChars >= minChars &&
          bufLink * 1000L <= maxLinkPm.toLong * nChars &&
          (nStop * 1000L >= minStopPm.toLong * words || nChars >= longChars)
        if (keep) {
          if (kept.length > 0) kept.append('\n')
          kept.append(text)
          nKept += 1; charsKept += nChars
        }
      }
      buf.setLength(0); bufLink = 0L
    }

    def append(c: Char): Unit = {
      buf.append(c)
      if (aDepth > 0 && !isWs(c)) bufLink += 1
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val gt = tagEnd(s, i + 1)
          if (gt < 0) i = n // unterminated tag (or open quote): junk to EOF
          else {
            val body = s.substring(i + 1, gt)
            val closing = body.startsWith("/")
            val selfClosing = !closing && body.nonEmpty &&
              body.charAt(body.length - 1) == '/'
            val st = if (closing) 1 else 0
            var k = st
            while (k < body.length && Character.isLetterOrDigit(body.charAt(k))) k += 1
            val name = body.substring(st, k).toLowerCase(java.util.Locale.ROOT)
            i = gt + 1
            if (!closing && !selfClosing && (name == "script" || name == "style")) {
              val e = closeTagIndex(s, name, i)
              if (e < 0) i = n
              else {
                val g2 = s.indexOf('>', e)
                i = if (g2 < 0) n else g2 + 1
              }
            }
            if (blockTags.contains(name)) flush()
            if (name == "a") {
              if (closing) aDepth = math.max(0, aDepth - 1)
              else if (!selfClosing) aDepth += 1
            }
          }
        }
      } else if (c == '&') {
        if (s.startsWith("&amp;", i)) { append('&'); i += 5 }
        else if (s.startsWith("&lt;", i)) { append('<'); i += 4 }
        else if (s.startsWith("&gt;", i)) { append('>'); i += 4 }
        else if (s.startsWith("&quot;", i)) { append('"'); i += 6 }
        else if (s.startsWith("&apos;", i)) { append('\''); i += 6 }
        else if (s.startsWith("&#39;", i)) { append('\''); i += 5 }
        else if (s.startsWith("&nbsp;", i)) { append(' '); i += 6 }
        else { append('&'); i += 1 }
      } else {
        append(c)
        i += 1
      }
    }
    flush()
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(kept.toString), nBlocks, nKept,
      charsRaw, charsKept, linkTotal))
  }
}

/** `html_extract(html, minChars, maxLinkPm, minStopPm, longChars)` —
  * [[HtmlExtractImpl]] as a codegen expression returning the extraction
  * struct. Thresholds are structural int literals (jusText-style
  * configuration, the text_winnow k/w pattern).
  */
case class HtmlExtract(child: Expression, minChars: Int, maxLinkPm: Int,
    minStopPm: Int, longChars: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"html_extract expects STRING, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = HtmlExtractImpl.schema
  override def prettyName: String = "html_extract"

  override def nullSafeEval(a: Any): Any =
    HtmlExtractImpl.extract(a.asInstanceOf[UTF8String],
      minChars, maxLinkPm, minStopPm, longChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HtmlExtractImpl$$.MODULE$$.extract(" +
        s"$a, $minChars, $maxLinkPm, $minStopPm, $longChars);")

  override protected def withNewChildInternal(newChild: Expression): HtmlExtract =
    copy(child = newChild)
}

/** `html_extract_lang(html, lang, minChars, maxLinkPm, minStopPm,
  * longChars)` — [[HtmlExtract]] with the stopword rule dispatched on a
  * per-row language column ([[StopwordProfiles]]; unprofiled/null lang
  * values fall back to the "en" list). A real crawl is majority
  * non-English — the stopword-density keep rule only works when the
  * function words it counts are the document's own.
  */
case class HtmlExtractLang(left: Expression, right: Expression,
    minChars: Int, maxLinkPm: Int, minStopPm: Int, longChars: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"html_extract_lang expects (STRING html, STRING lang), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = HtmlExtractImpl.schema
  override def prettyName: String = "html_extract_lang"

  // NULL contract: only a null html yields NULL. A null lang is a
  // routine crawl value and must dispatch to the "en" fallback profile
  // (extractLang's lang==null branch), so the expression cannot use the
  // BinaryExpression null-intolerant path — that would null the whole
  // struct whenever the lang column is null and silently drop the row.
  override def nullable: Boolean = left.nullable

  override def eval(input: InternalRow): Any = {
    val html = left.eval(input)
    if (html == null) null
    else HtmlExtractImpl.extractLang(html.asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String],
      minChars, maxLinkPm, minStopPm, longChars)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = left.genCode(ctx)
    val l = right.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${h.code}
      boolean ${ev.isNull} = ${h.isNull};
      $javaType ${ev.value} = null;
      if (!${ev.isNull}) {
        ${l.code}
        ${ev.value} = graft.functions.HtmlExtractImpl$$.MODULE$$.extractLang(
          ${h.value}, ${l.isNull} ? null : ${l.value},
          $minChars, $maxLinkPm, $minStopPm, $longChars);
      }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HtmlExtractLang =
    copy(left = newLeft, right = newRight)
}
