package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: Dedup.lineDedup must agree with a brute-force reference
  * on random corpora — a line is stripped iff it appears in at least
  * `minDocFreq` DISTINCT documents, survivors keep their original order,
  * and every input document yields exactly one output row (empty text
  * when everything was boilerplate). Random line pools with heavy reuse
  * exercise what example tests under-sample: lines repeated WITHIN one
  * document (df counts distinct docs, not occurrences), documents made
  * entirely of boilerplate, and the routing threshold landing mid-pool.
  */
object LineDedupPropSpec extends Properties("Dedup.lineDedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15) // each case runs a Spark job

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-linededup-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // small line pool → heavy cross-document reuse
  private val pool: Vector[String] =
    Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
  private val corpusGen: Gen[List[(Long, List[String])]] =
    Gen.chooseNum(1, 8).flatMap(nDocs =>
      Gen.sequence[List[List[String]], List[String]](
        List.fill(nDocs)(Gen.chooseNum(1, 6).flatMap(n =>
          Gen.listOfN(n, Gen.oneOf(pool))))))
      .map(_.zipWithIndex.map { case (ls, i) => (i.toLong, ls) })

  property("matches brute force; order kept; one row per doc") =
    forAll(corpusGen, Gen.chooseNum(2, 4), Gen.oneOf(1L, 3L, Long.MaxValue)) {
      (docs, minDf, headMin) =>
        import spark.implicits._
        val expected = {
          val df = docs.flatMap { case (id, ls) => ls.distinct.map(_ -> id) }
            .groupBy(_._1).map { case (l, xs) => l -> xs.size }
          docs.map { case (id, ls) =>
            val kept = ls.filter(l => df(l) < minDf)
            id -> (ls.size.toLong, kept.size.toLong, kept.mkString("\n"))
          }.toMap
        }
        val in = docs.map { case (id, ls) => (id, ls.mkString("\n")) }
          .toDF("doc_id", "text")
        val got = Dedup.lineDedup(in, minDocFreq = minDf, headMinDf = headMin)
          .collect().map(r => r.getAs[Long]("doc_id") ->
            (r.getAs[Long]("n_lines"), r.getAs[Long]("n_lines_kept"),
              r.getAs[String]("text_deduped"))).toMap
        got == expected
    }
}
