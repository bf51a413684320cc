package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: TextAnalysis.gopherRules must agree with an independent
  * plain-Scala reference on random documents mixing bullets, ellipses,
  * hash symbols, digit tokens, stop words, multi-space runs, empty lines,
  * and empty/short docs — the layouts where the fixture corpus (single
  * line, no symbols) exercises nothing. The reference re-derives every
  * measurement from the operator's documented primitives (split-on-' +'
  * tokens, chr(10) lines with space-only trim, non-overlapping '...'
  * counting, HALF_UP 6-digit rounding), so a drift in any engine
  * expression — not just the rule booleans — fails here.
  */
object GopherRulesPropSpec extends Properties("TextAnalysis.gopherRules") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12) // each case runs a Spark job

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-gopher-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val word: Gen[String] = Gen.oneOf(
    "the", "of", "and", "with", "be", "that", "have", "to", // stop words
    "cat", "sat", "fine", "house", "a", "zz",
    "123", "4567", "#", "##", "...", "…", "•", "-", "*",
    "end...", "tail…", "•lead", "-dash")
  private val line: Gen[String] = for {
    n <- Gen.chooseNum(0, 8)
    ws <- Gen.listOfN(n, word)
    sep <- Gen.oneOf(" ", "  ", "   ")
    lead <- Gen.oneOf("", " ", "  ")
  } yield lead + ws.mkString(sep)
  private val doc: Gen[String] = for {
    n <- Gen.chooseNum(0, 6)
    ls <- Gen.listOfN(n, line)
  } yield ls.mkString("\n")

  private val stops =
    Set("the", "be", "to", "of", "and", "that", "have", "with")
  private val bullets = Set('•', '‣', '▪', '-', '*')

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def ltrimSp(s: String): String = s.dropWhile(_ == ' ')
  private def rtrimSp(s: String): String =
    s.reverse.dropWhile(_ == ' ').reverse
  private def countNonOverlap(s: String, sub: String): Int = {
    var i = 0; var c = 0
    while ({ i = s.indexOf(sub, i); i >= 0 }) { c += 1; i += sub.length }
    c
  }

  /** (n_words, mean, hashR, ellR, bulR, elrR, alphaR, stops, 7 rules, keep)
    * — ratios already HALF_UP-rounded to 6, None where the engine emits
    * NULL; rule booleans computed on the UNROUNDED ratios.
    */
  private def ref(text: String, minWords: Int) = {
    val toks = Option(text).toSeq
      .flatMap(_.toLowerCase.split(" +", -1)).filter(_.nonEmpty).toVector
    val lines = Option(text).toSeq
      .flatMap(_.split("\n", -1))
      .filter(l => l.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').nonEmpty)
      .toVector
    val nw = toks.size.toLong
    val nl = lines.size.toLong
    def overWords(cnt: => Long): Option[Double] =
      if (nw == 0) None else Some(cnt.toDouble / nw)
    def overLines(cnt: => Long): Option[Double] =
      if (nl == 0) None else Some(cnt.toDouble / nl)
    val mwl = overWords(toks.map(_.length.toLong).sum)
    val hr = overWords(text.count(_ == '#').toLong)
    val er = overWords(
      countNonOverlap(text, "...").toLong + text.count(_ == '…'))
    val br = overLines(
      lines.count(l => ltrimSp(l).headOption.exists(bullets)).toLong)
    val elr = overLines(lines.count { l =>
      val t = rtrimSp(l); t.endsWith("...") || t.endsWith("…")
    }.toLong)
    val ar = overWords(
      toks.count(_.exists(c => c >= 'a' && c <= 'z')).toLong)
    val sh = stops.count(toks.contains).toLong
    val rules = Seq(
      nw >= minWords && nw <= 100000L,
      mwl.exists(v => v >= 3.0 && v <= 10.0),
      hr.exists(_ <= 0.1) && er.exists(_ <= 0.1),
      br.exists(_ <= 0.9),
      elr.exists(_ <= 0.3),
      ar.exists(_ >= 0.8),
      sh >= 2L)
    (nw, mwl.map(r6), hr.map(r6), er.map(r6), br.map(r6), elr.map(r6),
      ar.map(r6), sh, rules, rules.forall(identity))
  }

  property("matches the plain-Scala reference on every column") =
    forAll(Gen.chooseNum(1L, 6L).flatMap(n =>
      Gen.listOfN(n.toInt, doc)), Gen.chooseNum(0, 12)) { (texts, minWords) =>
      import spark.implicits._
      val docs = spark.createDataset(texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }).toDF("doc_id", "text")
      val got = TextAnalysis.gopherRules(docs, minWords = minWords)
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      texts.zipWithIndex.forall { case (t, i) =>
        val row = got(i.toLong)
        val (nw, mwl, hr, er, br, elr, ar, sh, rules, keep) = ref(t, minWords)
        def d(name: String): Option[Double] =
          if (row.isNullAt(row.fieldIndex(name))) None
          else Some(row.getAs[Double](name))
        val ok =
          row.getAs[Long]("n_words") == nw &&
          d("mean_word_len") == mwl &&
          d("hash_word_ratio") == hr &&
          d("ellipsis_word_ratio") == er &&
          d("bullet_line_ratio") == br &&
          d("ellipsis_line_ratio") == elr &&
          d("alpha_word_ratio") == ar &&
          row.getAs[Long]("n_stop_hits") == sh &&
          Seq("r_word_count", "r_word_len", "r_symbol", "r_bullet",
            "r_ellipsis", "r_alpha", "r_stop")
            .map(row.getAs[Boolean](_)) == rules &&
          row.getAs[Boolean]("gopher_keep") == keep
        if (!ok) println(s"MISMATCH doc=$i minWords=$minWords text=${t.take(120)}\n" +
          s" engine=$row\n ref=($nw,$mwl,$hr,$er,$br,$elr,$ar,$sh,$rules,$keep)")
        ok
      }
    }
}
