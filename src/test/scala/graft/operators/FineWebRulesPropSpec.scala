package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: TextAnalysis.fineWebRules must agree with an
  * independent plain-Scala reference on random documents mixing repeated
  * lines (the dup-char rule), short lines, terminal punctuation
  * (incl. apostrophe and double quote — the FineWeb stop chars), bare
  * newline runs, multi-space runs, lead/trail spaces, and empty docs —
  * across random thresholds. The reference re-derives every measurement
  * from the documented primitives (trimmed non-empty chr(10) lines,
  * whitespace words on the raw text, duplicate chars = len × (count−1)
  * per exact line value, per-mille integer cross-multiplication), so a
  * drift in any engine expression fails here, not just the booleans.
  */
object FineWebRulesPropSpec extends Properties("TextAnalysis.fineWebRules") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12) // each case runs a Spark job

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-fineweb-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // a SMALL line pool so duplicate lines actually occur
  private val lineBody: Gen[String] = Gen.oneOf(
    "the cat sat", "a", "short", "this line is rather longer than thirty chars",
    "data pipeline quality", "x y z", "repeated boilerplate footer",
    "menu", "home | about | contact", "click here")
  private val terminator: Gen[String] =
    Gen.oneOf(".", "!", "?", "\"", "'", "", "", ",", ":")
  private val line: Gen[String] = for {
    body <- lineBody
    // includes U+000B (vertical tab) and U+000C (form feed): the word
    // split is pinned to the explicit [ \t\n\x0B\f\r] class on both
    // engines (ADVICE r13), so the generator must exercise them
    lead <- Gen.oneOf("", " ", "  ", "\u000B", "\f\t")
    trail <- Gen.oneOf("", " ", "\u000B")
    term <- terminator
  } yield lead + body + term + trail
  private val doc: Gen[String] = for {
    n <- Gen.chooseNum(0, 10)
    ls <- Gen.listOfN(n, line)
    extraNl <- Gen.oneOf("", "\n", "\n\n")
  } yield ls.mkString("\n") + extraNl

  private def trimSp(s: String): String =
    s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
  private val stops = Set('.', '\'', '"', '!', '?')

  private def ref(text: String, punctPm: Long, shortLen: Int,
      shortPm: Long, dupPm: Long, nlPm: Long) = {
    val lines = text.split("\n", -1).toVector.map(trimSp).filter(_.nonEmpty)
    val nLines = lines.size.toLong
    val punct = lines.count(l => stops.contains(l.last)).toLong
    val short = lines.count(_.length < shortLen).toLong
    val chars = lines.map(_.length.toLong).sum
    val dup = lines.groupBy(identity).valuesIterator
      .collect { case g if g.size > 1 => g.head.length.toLong * (g.size - 1) }
      .sum
    // the pinned explicit whitespace class, NOT \s — an independent
    // spelling of TextAnalysis.wsClass semantics
    val words = text.split("[ \t\n\u000B\f\r]+", -1).count(_.nonEmpty).toLong
    val nl = text.count(_ == '\n').toLong
    val rPunct = punct * 1000 >= punctPm * nLines
    val rShort = short * 1000 < shortPm * nLines
    val rDup = dup * 1000 < dupPm * chars || chars == 0
    val rNl = !(nl * 1000 > nlPm * words)
    (nLines, punct, short, chars, dup, words, nl,
      rPunct, rShort, rDup, rNl, rPunct && rShort && rDup && rNl)
  }

  property("matches the plain-Scala reference on every column") =
    forAll(
      Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, doc)),
      Gen.chooseNum(0, 500), Gen.chooseNum(0, 60),
      Gen.chooseNum(0, 1000), Gen.chooseNum(0, 50),
      Gen.chooseNum(0, 800)) { (texts, punctPm, shortLen, shortPm, dupPm, nlPm) =>
      import spark.implicits._
      val docsDf = spark.createDataset(texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }).toDF("doc_id", "text")
      val got = TextAnalysis.fineWebRules(docsDf,
          minPunctRatio = punctPm / 1000.0, shortLineLen = shortLen,
          maxShortRatio = shortPm / 1000.0, maxDupCharRatio = dupPm / 1000.0,
          maxNewlineWordRatio = nlPm / 1000.0)
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      texts.zipWithIndex.forall { case (t, i) =>
        val row = got(i.toLong)
        val (nl, pu, sh, ch, du, wo, nn, rP, rS, rD, rN, keep) =
          ref(t, punctPm, shortLen, shortPm, dupPm, nlPm)
        val ok =
          row.getAs[Long]("n_lines") == nl &&
          row.getAs[Long]("punct_lines") == pu &&
          row.getAs[Long]("short_lines") == sh &&
          row.getAs[Long]("line_chars") == ch &&
          row.getAs[Long]("dup_line_chars") == du &&
          row.getAs[Long]("n_words") == wo &&
          row.getAs[Long]("n_newlines") == nn &&
          row.getAs[Boolean]("r_punct") == rP &&
          row.getAs[Boolean]("r_short") == rS &&
          row.getAs[Boolean]("r_dup_lines") == rD &&
          row.getAs[Boolean]("r_newline") == rN &&
          row.getAs[Boolean]("fineweb_keep") == keep
        if (!ok) println(s"MISMATCH doc=$i pm=($punctPm,$shortLen,$shortPm," +
          s"$dupPm,$nlPm) text=${t.take(120)}\n engine=$row\n " +
          s"ref=($nl,$pu,$sh,$ch,$du,$wo,$nn,$rP,$rS,$rD,$rN,$keep)")
        ok
      }
    }
}
