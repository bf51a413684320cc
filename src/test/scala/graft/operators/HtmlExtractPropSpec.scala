package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import scala.util.matching.Regex

/** Property test: TextAnalysis.htmlExtract must agree with an INDEPENDENT
  * regex-based reference (the engine is a single-pass character scanner;
  * this reference is a staged regex pipeline — different algorithm, same
  * contract) on random pages mixing block tags, inline tags, anchors
  * (incl. self-closing ones), quoted attribute values containing `>`,
  * entities (incl. unknown ones), comments, script/style payloads with
  * raw `<` and decoy similarly-named close tags, and stray inter-tag
  * whitespace — across random thresholds. The profile-dispatched
  * htmlExtractLang must agree with the same reference run against the
  * per-language stopword set (fallback "en"). Engine-only edge semantics
  * (unterminated comment/tag/quote/script, anchor depth leaking across
  * blocks) are pinned by deterministic cases below.
  */
object HtmlExtractPropSpec extends Properties("TextAnalysis.htmlExtract") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12) // each case runs a Spark job

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-htmlextract-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ------------------------------------------------------ the reference

  private val wsSet = Set(' ', '\t', '\n', '\u000B', '\f', '\r')
  // the engine's default profile IS StopwordProfiles' en list (r16:
  // production-depth lists; a hard-coded 10-word head here drifted when
  // the table deepened) — the reference derives it from the same table
  private val stops: Set[String] =
    graft.functions.StopwordProfiles.table.toMap.apply("en").toSet
  // the derived set alone would be tautological wrt the table's CONTENT
  // (ADVICE r16): pin a few known members and the list's size so an
  // accidentally dropped/misspelled word in the en profile fails here
  require(Set("the", "and", "of", "to", "with").subsetOf(stops),
    s"en stopword profile lost a core member: $stops")
  require(stops.size == 99,
    s"en stopword profile size drifted: ${stops.size} (expected 99)")
  // a tag body: anything but an unquoted `>`; quoted attribute values may
  // contain `>` (r15 contract)
  private val tagBody = """(?:[^>"']|"[^"]*"|'[^']*')*"""
  // a tag body that does NOT end with an unquoted `/` (an open —
  // not self-closing — tag)
  private val tagBodyNoSlash =
    """(?:(?:[^>"']|"[^"]*"|'[^']*')*(?:[^>/"']|"[^"]*"|'[^']*'))?"""
  private val blockTagRe: Regex =
    ("(?i)</?(p|div|h[1-6]|li|ul|ol|br|table|tr|td|th|section|article|" +
      "header|footer|nav|blockquote|pre|title|body|html|head|form|hr)" +
      "(?![a-zA-Z0-9])" + tagBody + ">").r
  private val anyTagRe: Regex = ("<" + tagBody + ">").r
  private val commentRe: Regex = "(?s)<!--.*?-->".r
  // close tags need the same name boundary as the engine (r15:
  // `</scripts>` does not close a `<script>`); close-tag bodies are
  // scanned to a PLAIN `>` in the engine, hence [^>]* on the close side
  private val scriptRe: Regex =
    ("(?is)<script(?![a-zA-Z0-9])" + tagBodyNoSlash +
      ">.*?</script(?![a-zA-Z0-9])[^>]*>").r
  private val styleRe: Regex =
    ("(?is)<style(?![a-zA-Z0-9])" + tagBodyNoSlash +
      ">.*?</style(?![a-zA-Z0-9])[^>]*>").r
  // anchor OPEN must not be self-closing (r15: `<a .../>` leaves depth
  // unchanged); the close side is a full quote-aware tag
  private val anchorRe: Regex =
    ("(?is)<a(?![a-zA-Z0-9])" + tagBodyNoSlash + ">(.*?)" +
      "</a(?![a-zA-Z0-9])" + tagBody + ">").r
  private val entityRe: Regex = "&(amp|lt|gt|quot|apos|#39|nbsp);".r

  private def decode(s: String): String =
    entityRe.replaceAllIn(s, m => Regex.quoteReplacement(m.group(1) match {
      case "amp" => "&"; case "lt" => "<"; case "gt" => ">"
      case "quot" => "\""; case "apos" | "#39" => "'"; case "nbsp" => " "
    }))

  private def trimWs(s: String): String =
    s.dropWhile(wsSet).reverse.dropWhile(wsSet).reverse

  private def ref(html: String, minChars: Int, maxLinkPm: Int,
      minStopPm: Int, longChars: Int, stopSet: Set[String] = stops)
      : (String, Int, Int, Long, Long, Long) = {
    val noJunk = styleRe.replaceAllIn(
      scriptRe.replaceAllIn(commentRe.replaceAllIn(html, ""), ""), "")
    val blocks = blockTagRe.replaceAllIn(noJunk, "\u0000").split('\u0000')
    var nBlocks = 0; var nKept = 0
    var charsRaw = 0L; var charsKept = 0L; var linkTotal = 0L
    val kept = new StringBuilder()
    blocks.foreach { b =>
      val link = anchorRe.findAllMatchIn(b).map { m =>
        decode(anyTagRe.replaceAllIn(m.group(1), ""))
          .count(c => !wsSet(c)).toLong
      }.sum
      val text = trimWs(decode(anyTagRe.replaceAllIn(b, "")))
      if (text.nonEmpty) {
        val nChars = text.length.toLong
        val words = text.split("[ \t\n\u000B\f\r]+").filter(_.nonEmpty)
        val nStop = words.count(w => stopSet(w.toLowerCase)).toLong
        nBlocks += 1; charsRaw += nChars; linkTotal += link
        val keep = nChars >= minChars &&
          link * 1000L <= maxLinkPm.toLong * nChars &&
          (nStop * 1000L >= minStopPm.toLong * words.length || nChars >= longChars)
        if (keep) {
          if (kept.nonEmpty) kept.append('\n')
          kept.append(text)
          nKept += 1; charsKept += nChars
        }
      }
    }
    (kept.toString, nBlocks, nKept, charsRaw, charsKept, linkTotal)
  }

  // ------------------------------------------------------ the generators

  private val word: Gen[String] = Gen.oneOf(
    "the", "and", "of", "quick", "brown", "fox", "data", "lorem", "ipsum",
    "x1", "menu", "click", "here", "team", "support", "was", "it", "IN", "The")
  private val wordsG: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val entityText: Gen[String] = Gen.oneOf(
    "a &amp; b", "1 &lt; 2", "x &gt; y", "q&quot;z", "&copy; five",
    "pad&nbsp;ding", "it&#39;s", "&amp;amp;", "&unknown; thing")
  private val inline: Gen[String] = for {
    w <- wordsG; t <- Gen.oneOf("b", "i", "span", "em", "strong")
  } yield s"<$t>$w</$t>"
  private val anchor: Gen[String] = for {
    w <- Gen.oneOf(wordsG, entityText)
    href <- Gen.oneOf("/x?q=1&amp;r=2", "a>b", "it's", "plain")
  } yield s"""<a href="$href">$w</a>"""
  private val selfClosedAnchor: Gen[String] =
    Gen.oneOf("""<a href="#"/>""", """<a href="x>y" />""", "<a/>")
  private val piece: Gen[String] =
    Gen.oneOf(wordsG, entityText, inline, anchor, selfClosedAnchor)
  private val blockContent: Gen[String] =
    Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, piece)).map(_.mkString(" "))
  private val block: Gen[String] = for {
    t <- Gen.oneOf("p", "div", "li", "h2", "td", "blockquote", "title")
    attrs <- Gen.oneOf("", """ class="x>y"""", " id='a>b'", " data-k=\"v\"")
    c <- blockContent
  } yield s"<$t$attrs>$c</$t>"
  private val junk: Gen[String] = Gen.oneOf(
    "<!-- a comment with <p>markup</p> inside -->",
    "<script>var a = 1 < 2; if (a) { b(); }</script>",
    "<SCRIPT type=\"x\">raw < text</SCRIPT>",
    "<script>var s = '</scripts>';</script>",
    "<style>p { color: red; }</style>",
    "\n   ", "\t", "", "<hr/>", "<br>",
    "<img src=\"x>y\" alt='p>q'>")
  private val page: Gen[String] = for {
    n <- Gen.chooseNum(0, 7)
    bs <- Gen.listOfN(n, Gen.frequency(3 -> block, 2 -> junk))
  } yield "<html><head></head><body>" + bs.mkString("") + "</body></html>"

  private def run(pages: Seq[String], minChars: Int, maxLinkPm: Int,
      minStopPm: Int, longChars: Int): Map[Long, (String, Int, Int, Long, Long, Long)] = {
    import spark.implicits._
    val df = spark.createDataset(pages.zipWithIndex
      .map { case (h, i) => (i.toLong, h) }).toDF("doc_id", "html")
    TextAnalysis.htmlExtract(df, "html", minChars, maxLinkPm, minStopPm, longChars)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text_extracted"), r.getAs[Int]("n_blocks"),
          r.getAs[Int]("n_kept"), r.getAs[Long]("chars_raw"),
          r.getAs[Long]("chars_kept"), r.getAs[Long]("link_chars")))).toMap
  }

  property("matches the independent regex reference on every column") =
    forAll(
      Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, page)),
      Gen.chooseNum(0, 60), Gen.chooseNum(0, 1000),
      Gen.chooseNum(0, 300), Gen.chooseNum(0, 300)) {
      (pages, minChars, maxLinkPm, minStopPm, longChars) =>
        val got = run(pages, minChars, maxLinkPm, minStopPm, longChars)
        pages.zipWithIndex.forall { case (h, i) =>
          val want = ref(h, minChars, maxLinkPm, minStopPm, longChars)
          val ok = got(i.toLong) == want
          if (!ok) println(s"MISMATCH th=($minChars,$maxLinkPm,$minStopPm," +
            s"$longChars)\n html=$h\n engine=${got(i.toLong)}\n ref=$want")
          ok
        }
    }

  property("profile dispatch matches the reference under every profile") =
    forAll(
      Gen.listOfN(4, page),
      Gen.oneOf(graft.functions.StopwordProfiles.langs ++ Seq("unknown", "zz")),
      Gen.chooseNum(0, 60), Gen.chooseNum(0, 300)) {
      (pages, lang, minChars, minStopPm) =>
        import spark.implicits._
        val profile = graft.functions.StopwordProfiles.table.toMap
          .get(lang).map(_.toSet).getOrElse(stops) // fallback contract: en
        val df = spark.createDataset(pages.zipWithIndex
          .map { case (h, i) => (i.toLong, lang, h) })
          .toDF("doc_id", "lang", "html")
        val got = TextAnalysis.htmlExtractLang(
            df, "html", "lang", minChars, 1000, minStopPm, 200)
          .collect()
          .map(r => r.getAs[Long]("doc_id") ->
            ((r.getAs[String]("text_extracted"), r.getAs[Int]("n_blocks"),
              r.getAs[Int]("n_kept"), r.getAs[Long]("chars_raw"),
              r.getAs[Long]("chars_kept"), r.getAs[Long]("link_chars")))).toMap
        pages.zipWithIndex.forall { case (h, i) =>
          val want = ref(h, minChars, 1000, minStopPm, 200, profile)
          val ok = got(i.toLong) == want
          if (!ok) println(s"DISPATCH MISMATCH lang=$lang " +
            s"th=($minChars,$minStopPm)\n html=$h\n engine=${got(i.toLong)}" +
            s"\n ref=$want")
          ok
        }
    }

  property("a NULL lang dispatches to the en fallback profile (the " +
      "documented contract), a NULL html yields a NULL struct") = {
    import spark.implicits._
    val html = "<p>the cat and the dog of the house sat in it</p>"
    val df = Seq(
      (0L, Option("en"), Option(html)),
      (1L, Option.empty[String], Option(html)), // null lang == en dispatch
      (2L, Option("en"), Option.empty[String])) // null html == null struct
      .toDF("doc_id", "lang", "html")
    val got = TextAnalysis.htmlExtractLang(df, "html", "lang", 10, 1000, 100, 200)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    got(1L).getAs[String]("text_extracted") ==
      got(0L).getAs[String]("text_extracted") &&
      got(0L).getAs[Int]("n_kept") == 1 &&
      got(2L).getAs[String]("text_extracted") == null &&
      got(2L).isNullAt(got(2L).fieldIndex("n_blocks"))
  }

  property("engine stopword profiles are StopwordProfiles (en = unary list)") = {
    val en = TextAnalysis.profiles.toMap.apply("en").toSet
    def toSet(hs: java.util.HashSet[String]): Set[String] = {
      val it = hs.iterator()
      val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    val impl = toSet(graft.functions.HtmlExtractImpl.stopwords)
    val allMatch = graft.functions.StopwordProfiles.table.forall {
      case (l, words) =>
        toSet(graft.functions.HtmlExtractImpl.profileSets.get(l)) == words.toSet
    }
    en == impl && stops == impl && allMatch &&
      (TextAnalysis.profiles eq graft.functions.StopwordProfiles.table)
  }

  property("edge semantics: unterminated constructs and anchor-depth leak") = {
    // hand-computed against the documented scanner contract
    val cases = Seq(
      // unterminated comment swallows the rest
      "<p>kept text here</p><!-- open comment <p>gone</p>" ->
        ((1, "kept text here")),
      // unterminated script swallows the rest
      "<p>first</p><script>var x = '<p>never</p>'" -> ((1, "first")),
      // unterminated tag is junk to EOF
      "<p>alpha</p><img src=\"x" -> ((1, "alpha")),
      // a quote left OPEN inside a tag makes it unterminated (r15)
      "<p>alpha</p><img src=\"x>y<p>beta</p>" -> ((1, "alpha")),
      // a quoted '>' does NOT end the tag (r15)
      "<p>alpha</p><img src=\"x>y\" alt='a>b'>tail<p>beta</p>" ->
        ((3, "alpha\ntail\nbeta")),
      // a decoy similarly-named close tag does NOT end the raw skip (r15)
      "<p>first</p><script>var s = '</scripts>';</script><p>second</p>" ->
        ((2, "first\nsecond")),
      // an unclosed <a> leaks link depth into the NEXT block (documented:
      // depth is global, blocks are text segmentation only)
      "<p><a href=\"#\">linked</a> plain</p><p><a>open anchor</p><p>still inside</p>" ->
        ((3, "linked plain\nopen anchor\nstill inside")),
      // stray close </a> clamps at zero, no effect
      "</a><p>fine text</p>" -> ((1, "fine text")))
    cases.forall { case (html, (nb, text)) =>
      val got = run(Seq(html), 0, 1000, 0, 0)(0L)
      val ok = got._2 == nb && got._1 == text
      if (!ok) println(s"EDGE MISMATCH html=$html got=$got want=($nb, $text)")
      ok
    }
  }

  property("link-density accounting: unclosed anchor counts later blocks") = {
    // depth leak: with maxLinkPm = 0 every block after the unclosed <a>
    // is link-saturated and dropped; before it, kept
    val html = "<p>plain text block</p><p><a>opened</p><p>later block</p>"
    val got = run(Seq(html), 0, 0, 0, 0)(0L)
    val ok = got._2 == 3 && got._3 == 1 && got._1 == "plain text block" &&
      got._6 == ("opened".length + "laterblock".length).toLong
    if (!ok) println(s"LEAK MISMATCH got=$got")
    ok
  }

  property("self-closing anchor does NOT leak link depth (r15)") = {
    // with maxLinkPm = 0 any leaked depth would drop every later block
    val html = "<p><a href=\"#\"/>free text</p><p>later block</p>"
    val got = run(Seq(html), 0, 0, 0, 0)(0L)
    val ok = got._2 == 2 && got._3 == 2 && got._6 == 0L &&
      got._1 == "free text\nlater block"
    if (!ok) println(s"SELFCLOSE MISMATCH got=$got")
    ok
  }
}
