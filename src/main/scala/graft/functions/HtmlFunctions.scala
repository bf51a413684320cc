package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  * n_stop counts lowercase membership in the standard English
  * high-frequency function-word list (TextAnalysis.profiles "en") —
  * content prose carries stopwords, keyword chrome does not; the
  * longChars escape keeps long non-English/technical blocks.
  *
  * Deterministic scanner contract (what the DuckDB oracle mirrors via
  * the fixture-generator arithmetic, and HtmlExtractPropSpec re-derives
  * with an independent regex-based reference):
  *  - `<!-- ... -->` skipped; an unterminated comment runs to EOF;
  *  - `<script ...>` / `<style ...>` raw content skipped to the matching
  *    case-insensitive close tag (to EOF when unclosed);
  *  - a tag is `<` to the next `>`; an unterminated tag is junk to EOF;
  *    the tag NAME is the leading letter/digit run after an optional `/`;
  *  - block boundaries: p div h1-h6 li ul ol br table tr td th section
  *    article header footer nav blockquote pre title body html head
  *    form hr — open OR close flushes the current text buffer;
  *  - `<a>` nesting is tracked by depth (a close below zero clamps);
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

  /** The "en" profile of TextAnalysis.profiles (duplicated literally to
    * keep this file free of an operators-package dependency;
    * HtmlExtractPropSpec pins the two lists equal).
    */
  val stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "was")
      .foreach(s.add)
    s
  }

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

  private def indexOfIgnoreCase(s: String, target: String, from: Int): Int = {
    var i = math.max(from, 0)
    val max = s.length - target.length
    while (i <= max) {
      if (s.regionMatches(true, i, target, 0, target.length)) return i
      i += 1
    }
    -1
  }

  def extract(html: UTF8String, minChars: Int, maxLinkPm: Int,
      minStopPm: Int, longChars: Int): InternalRow = {
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
        var words = 0L; var stops = 0L
        var i = 0
        while (i < text.length) {
          if (!isWs(text.charAt(i))) {
            var j = i
            while (j < text.length && !isWs(text.charAt(j))) j += 1
            words += 1
            if (stopwords.contains(
              text.substring(i, j).toLowerCase(java.util.Locale.ROOT))) stops += 1
            i = j
          } else i += 1
        }
        nBlocks += 1; charsRaw += nChars; linkTotal += bufLink
        val keep = nChars >= minChars &&
          bufLink * 1000L <= maxLinkPm.toLong * nChars &&
          (stops * 1000L >= minStopPm.toLong * words || nChars >= longChars)
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
          val gt = s.indexOf('>', i + 1)
          if (gt < 0) i = n // unterminated tag: junk to EOF
          else {
            val body = s.substring(i + 1, gt)
            val closing = body.startsWith("/")
            val st = if (closing) 1 else 0
            var k = st
            while (k < body.length && Character.isLetterOrDigit(body.charAt(k))) k += 1
            val name = body.substring(st, k).toLowerCase(java.util.Locale.ROOT)
            i = gt + 1
            if (!closing && (name == "script" || name == "style")) {
              val e = indexOfIgnoreCase(s, "</" + name, i)
              if (e < 0) i = n
              else {
                val g2 = s.indexOf('>', e)
                i = if (g2 < 0) n else g2 + 1
              }
            }
            if (blockTags.contains(name)) flush()
            if (name == "a") {
              if (closing) aDepth = math.max(0, aDepth - 1) else aDepth += 1
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
