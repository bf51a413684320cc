package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: jaccardPrefixPairs must equal the brute-force
  * quadratic Jaccard on random corpora — the prefix filter's
  * losslessness claim, exercised beyond the fixture. Small vocabularies
  * force heavy shingle sharing (the regime where a buggy prefix bound
  * would silently drop qualifying pairs), and duplicated docs in the
  * generator guarantee pairs AT the threshold boundary (J = 1) appear.
  */
object JaccardPrefixPropSpec extends Properties("Dedup.jaccardPrefixPairs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12) // each case runs several Spark jobs

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-jprefix-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
  private val docGen: Gen[String] =
    Gen.chooseNum(3, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
  // up to 12 base docs, a few duplicated verbatim (J=1 boundary pairs)
  private val corpusGen: Gen[List[String]] = for {
    base <- Gen.nonEmptyListOf(docGen).map(_.take(12))
    dups <- Gen.someOf(base)
  } yield base ++ dups

  private def brute(
      corpus: Seq[(Long, String)], t: Double): Set[(Long, Long, Double)] = {
    def sh(s: String): Set[String] = {
      val tk = s.toLowerCase.split(" +").filter(_.nonEmpty)
      if (tk.length < 3) { if (tk.isEmpty) Set.empty else Set(tk.mkString(" ")) }
      else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = corpus.map { case (id, s) => id -> sh(s) }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      j = BigDecimal(inter.toDouble / (sa.size + sb.size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= t
    } yield (a, b, j)).toSet
  }

  property("equals brute force at thresholds 0.5, 0.8, 1.0") =
    forAll(corpusGen, Gen.oneOf(0.5, 0.8, 1.0)) { (texts, t) =>
      import spark.implicits._
      val corpus = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val out = Dedup.jaccardPrefixPairs(corpus.toDF("doc_id", "text"),
          threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      out == brute(corpus, t)
    }
}
