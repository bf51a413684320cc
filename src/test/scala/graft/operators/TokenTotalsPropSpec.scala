package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property tests for the frequency-routed token-total operators
  * (VERDICT r6's token-window replacement): topTerms and unigramSurprise
  * must agree with brute-force references on random corpora at EVERY
  * routing threshold — the broadcast-head/shuffled-tail split is a plan
  * decision, never an answer decision. Random Zipf-ish corpora (a few
  * tokens drawn heavily, many rarely) land tokens on both sides of the
  * split, including exactly AT the threshold.
  */
object TokenTotalsPropSpec extends Properties("TextAnalysis.tokenTotals") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12) // each case runs Spark jobs

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tokentotals-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // Zipf-ish pool: "the" drawn often, tail tokens rarely
  private val token: Gen[String] = Gen.frequency(
    6 -> Gen.const("the"), 3 -> Gen.const("of"),
    2 -> Gen.oneOf("alpha", "beta", "gamma"),
    1 -> Gen.oneOf("rare1", "rare2", "rare3", "rare4"))
  private val corpusGen: Gen[List[(Long, List[String])]] =
    Gen.chooseNum(1, 6).flatMap(nDocs =>
      Gen.sequence[List[List[String]], List[String]](
        List.fill(nDocs)(Gen.chooseNum(1, 10).flatMap(n =>
          Gen.listOfN(n, token)))))
      .map(_.zipWithIndex.map { case (ts, i) => (i.toLong, ts) })

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  property("unigramSurprise matches brute force at every routing threshold") =
    forAll(corpusGen, Gen.oneOf(1L, 2L, 4L, Long.MaxValue)) { (docs, headMin) =>
      import spark.implicits._
      val n = docs.map(_._2.size.toLong).sum
      val tf = docs.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val expected = docs.map { case (id, ts) =>
        val perTok = ts.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
        val ipMicro = perTok.keys.map(t =>
          t -> BigInt(math.round(1e6 * n.toDouble / tf(t).toDouble))).toMap
        val s = perTok.map { case (t, c) => BigInt(c) * ipMicro(t) }.sum
        id -> (ts.size.toLong,
          round6(s.toDouble / (1e6 * ts.size.toDouble)))
      }.toMap
      val in = docs.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.unigramSurprise(in, headMinTf = headMin)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_tokens"), r.getAs[Double]("surprise"))).toMap
      got == expected
    }

  property("topTerms matches brute force at every routing threshold") =
    forAll(corpusGen, Gen.oneOf(1L, 2L, 4L, Long.MaxValue)) { (docs, headMin) =>
      import spark.implicits._
      val nDocs = docs.size.toLong
      val dfm = docs.flatMap(_._2.distinct).groupBy(identity)
        .map { case (t, xs) => t -> xs.size.toLong }
      val expected = docs.flatMap { case (id, ts) =>
        val perTok = ts.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
        perTok.toSeq
          .map { case (t, c) =>
            (t, round6(c.toDouble * nDocs.toDouble / dfm(t).toDouble)) }
          .sortBy { case (t, score) => (-score, t) }
          .take(3).zipWithIndex
          .map { case ((t, score), i) => (id, t, score, i + 1) }
      }.toSet
      val in = docs.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.topTerms(in, k = 3, headMinDf = headMin)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token"),
          r.getAs[Double]("score"), r.getAs[Int]("rank"))).toSet
      got == expected
    }

  property("bigramSurprise matches brute force at every routing threshold") =
    forAll(corpusGen, Gen.oneOf(1L, 2L, 4L, Long.MaxValue)) { (docs, headMin) =>
      import spark.implicits._
      val bigramsOf = (ts: List[String]) => ts.zip(ts.drop(1)).map { case (a, b) => s"$a $b" }
      val tfBig = docs.flatMap(d => bigramsOf(d._2)).groupBy(identity)
        .map { case (g, xs) => g -> xs.size.toLong }
      val tfPrefix = tfBig.groupBy(_._1.split(' ').head)
        .map { case (w1, gs) => w1 -> gs.values.sum }
      val expected = docs.flatMap { case (id, ts) =>
        val bgs = bigramsOf(ts)
        if (bgs.isEmpty) None
        else {
          val perBg = bgs.groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
          val s = perBg.map { case (g, c) =>
            BigInt(c) * BigInt(math.round(
              1e6 * tfPrefix(g.split(' ').head).toDouble / tfBig(g).toDouble))
          }.sum
          Some(id -> (bgs.size.toLong,
            round6(s.toDouble / (1e6 * bgs.size.toDouble))))
        }
      }.toMap
      val in = docs.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.bigramSurprise(in, headMin = headMin)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_bigrams"), r.getAs[Double]("surprise2"))).toMap
      got == expected
    }
}
