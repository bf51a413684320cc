package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: TextAnalysis.fuzzyVocabMap must agree with an
  * all-pairs brute force on random corpora. The brute force re-derives
  * the full contract independently — tokenization (lower, ' +' split),
  * vocabulary totals, the alpha/minLen filters, the rare/canonical
  * frequency classes, EVERY pair within Levenshtein distance 1 (a plain
  * O(|rare|·|canon|) scan with an independent DP levenshtein), and the
  * (max frequency, then min word) tie-break. Passing proves the
  * SymSpell deletion-neighborhood join is LOSSLESS for k = 1 (every
  * true pair shares a deletion variant) and that the distance-2
  * share-a-variant false candidates are all killed by the exact verify.
  * The generator draws words from a 3-letter alphabet at lengths 3–6,
  * which makes both accidental near-matches and distance-2
  * shared-variant pairs common.
  */
object FuzzyVocabPropSpec extends Properties("TextAnalysis.fuzzyVocabMap") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10) // each case runs a multi-join Spark job

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-fuzzy-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val word: Gen[String] = for {
    n <- Gen.chooseNum(3, 6)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val doc: Gen[String] = for {
    base <- Gen.listOfN(6, word) // shared pool => repeated words
    n <- Gen.chooseNum(1, 12)
    ws <- Gen.listOfN(n, Gen.oneOf(base))
  } yield ws.mkString(" ")

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Brute-force reference: rare word -> (freq, canon, canon_freq). */
  private def ref(texts: Seq[String], rareMax: Long, canonMin: Long,
      minLen: Int): Map[String, (Long, String, Long)] = {
    val vocab = texts.flatMap(_.toLowerCase.split(" +").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      .filter { case (w, _) =>
        w.length >= minLen && w.forall(c => c >= 'a' && c <= 'z') }
    val rare = vocab.filter(_._2 <= rareMax)
    val canon = vocab.filter(_._2 >= canonMin)
    rare.flatMap { case (r, rf) =>
      val hits = canon.toSeq
        .filter { case (c, _) => c != r && lev(r, c) <= 1 }
      if (hits.isEmpty) None
      else {
        val mf = hits.map(_._2).max
        val best = hits.filter(_._2 == mf).map(_._1).min
        Some(r -> ((rf, best, mf)))
      }
    }
  }

  property("matches an all-pairs levenshtein brute force") =
    forAll(
      Gen.chooseNum(2, 10).flatMap(n => Gen.listOfN(n, doc)),
      Gen.chooseNum(1L, 2L), Gen.chooseNum(3L, 5L)) {
      (texts, rareMax, canonMin) =>
        import spark.implicits._
        val docs = spark.createDataset(texts.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }).toDF("doc_id", "text")
        val got = TextAnalysis
          .fuzzyVocabMap(docs, rareMax = rareMax, canonMin = canonMin,
            minLen = 3)
          .collect()
          .map(r => r.getAs[String]("word") ->
            ((r.getAs[Long]("freq"), r.getAs[String]("canon"),
              r.getAs[Long]("canon_freq"))))
          .toMap
        val want = ref(texts, rareMax, canonMin, minLen = 3)
        val ok = got == want
        if (!ok) println(s"MISMATCH rareMax=$rareMax canonMin=$canonMin\n" +
          s" engine=$got\n ref=$want\n texts=$texts")
        ok
    }
}
