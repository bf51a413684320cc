package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: TextAnalysis.c4Rules must agree with an independent
  * plain-Scala reference on random documents mixing terminal punctuation
  * (period/!/?/ASCII and typographic quotes), short lines, unpunctuated
  * lines, javascript and policy-phrase lines, lorem-ipsum fragments,
  * curly braces, multi-space runs, lead/trail spaces, and empty docs.
  * The reference re-derives every column from the operator's documented
  * primitives (chr(10) lines with space-only trim, line keep on the
  * ' +' word split, sentence count = terminal-punct characters in the
  * kept text), so a drift in any engine expression — including the
  * text_clean rewrite itself — fails here, not just the booleans.
  */
object C4RulesPropSpec extends Properties("TextAnalysis.c4Rules") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12) // each case runs a Spark job

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-c4-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val word: Gen[String] = Gen.oneOf(
    "the", "cat", "sat", "fine", "house", "data", "a", "zz", "123",
    "javascript", "Javascript", "lorem", "ipsum", "Lorem", "{", "}",
    "privacy", "policy", "cookies", "uses")
  private val terminator: Gen[String] =
    Gen.oneOf(".", "!", "?", "\"", "”", "", "", ",", ";", "…")
  private val line: Gen[String] = for {
    n <- Gen.chooseNum(0, 9)
    ws <- Gen.listOfN(n, word)
    sep <- Gen.oneOf(" ", "  ", "   ")
    lead <- Gen.oneOf("", " ", "  ")
    trail <- Gen.oneOf("", " ")
    term <- terminator
  } yield lead + ws.mkString(sep) + term + trail
  private val doc: Gen[String] = for {
    n <- Gen.chooseNum(0, 7)
    ls <- Gen.listOfN(n, line)
  } yield ls.mkString("\n")

  private def ltrimSp(s: String): String = s.dropWhile(_ == ' ')
  private def rtrimSp(s: String): String =
    s.reverse.dropWhile(_ == ' ').reverse
  private val terminals = Set('.', '!', '?', '"', '”')

  /** (n_lines, n_kept, n_sentences, text_clean, r_sent, r_lorem,
    * r_brace, keep)
    */
  private def ref(text: String, minLineWords: Int, minSentences: Int) = {
    val lines = text.split("\n", -1).toVector
      .map(l => rtrimSp(ltrimSp(l))).filter(_.nonEmpty)
    val kept = lines.filter { l =>
      val lo = l.toLowerCase
      terminals.contains(l.last) &&
        lo.split(" +", -1).count(_.nonEmpty) >= minLineWords &&
        !lo.contains("javascript") &&
        !TextAnalysis.c4PolicyPhrases.exists(lo.contains)
    }
    val tc = kept.mkString("\n")
    val ns = tc.count(c => c == '.' || c == '!' || c == '?').toLong
    val rSent = ns >= minSentences
    val rLorem = !text.toLowerCase.contains("lorem ipsum")
    val rBrace = !text.contains('{')
    (lines.size.toLong, kept.size.toLong, ns, tc,
      rSent, rLorem, rBrace, rSent && rLorem && rBrace)
  }

  property("matches the plain-Scala reference on every column") =
    forAll(
      Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, doc)),
      Gen.chooseNum(0, 7), Gen.chooseNum(0, 5)) { (texts, minW, minS) =>
      import spark.implicits._
      val docs = spark.createDataset(texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }).toDF("doc_id", "text")
      val got = TextAnalysis
        .c4Rules(docs, minLineWords = minW, minSentences = minS)
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      texts.zipWithIndex.forall { case (t, i) =>
        val row = got(i.toLong)
        val (nl, nk, ns, tc, rS, rL, rB, keep) = ref(t, minW, minS)
        val ok =
          row.getAs[Long]("n_lines") == nl &&
          row.getAs[Long]("n_kept_lines") == nk &&
          row.getAs[Long]("n_sentences") == ns &&
          row.getAs[String]("text_clean") == tc &&
          row.getAs[Boolean]("r_sentences") == rS &&
          row.getAs[Boolean]("r_lorem") == rL &&
          row.getAs[Boolean]("r_brace") == rB &&
          row.getAs[Boolean]("c4_keep") == keep
        if (!ok) println(s"MISMATCH doc=$i minW=$minW minS=$minS " +
          s"text=${t.take(120)}\n engine=$row\n " +
          s"ref=($nl,$nk,$ns,${tc.take(80)},$rS,$rL,$rB,$keep)")
        ok
      }
    }
}
