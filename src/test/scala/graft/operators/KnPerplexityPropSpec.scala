package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: TextAnalysis.knPerplexity must agree bit-for-bit with
  * an independent plain-Scala interpolated-Kneser-Ney reference on
  * random corpora — small vocabulary (dense trigram repeats), random
  * target slices (including the empty-target and all-target corners),
  * empty/1-token documents, multi-space runs. The reference re-derives
  * the padded trigram events, every continuation-count table, the KN
  * probability with the operator's exact IEEE operation order, the
  * per-type 1e-6 micro-quantization (HALF_UP, the Spark round), the
  * exact integer per-document sums, and the two emitting divisions —
  * so a drift in any count, any backoff branch, or any rounding step
  * fails on exact Double equality, not a tolerance.
  */
object KnPerplexityPropSpec extends Properties("TextAnalysis.knPerplexity") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10) // each case runs a multi-join Spark job

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-kn-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val word: Gen[String] =
    Gen.oneOf("a", "b", "c", "dd", "eee", "the", "of")
  private val doc: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    ws <- Gen.listOfN(n, word)
    sep <- Gen.oneOf(" ", "  ")
  } yield ws.mkString(sep)

  private val D = 0.75

  private def r0(x: Double): BigInt =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt

  /** doc_id -> (n_events, logprob, xent_nats), engine-identical
    * arithmetic.
    */
  private def ref(corpus: Seq[(Long, String, Boolean)])
      : Map[Long, (Long, Double, Double)] = {
    def toks(t: String): Vector[String] =
      t.toLowerCase.split(" +", -1).filter(_.nonEmpty).toVector
    def tris(t: String): Vector[(String, String, String)] = {
      val pd = Vector("<s>", "<s>") ++ toks(t) :+ "</s>"
      pd.sliding(3).map(v => (v(0), v(1), v(2))).toVector
    }
    val perDoc: Map[(Long, (String, String, String)), Long] = corpus
      .flatMap { case (id, t, _) => tris(t).map(g => (id, g)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tgtIds = corpus.collect { case (id, _, true) => id }.toSet
    val c3t: Map[(String, String, String), Long] = perDoc.toSeq
      .collect { case ((id, g), n) if tgtIds(id) => (g, n) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val tt = c3t.keySet
    val ctxCnt = tt.groupBy(g => (g._1, g._2)).view
      .mapValues(gs => (gs.toSeq.map(c3t).sum, gs.size.toLong)).toMap
    val tailTypes = tt.groupBy(g => (g._2, g._3)).view
      .mapValues(_.size.toLong).toMap
    val midCnt = tt.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val folCnt = tailTypes.keySet.groupBy(_._1).view
      .mapValues(_.size.toLong).toMap
    val unigCnt = tailTypes.keySet.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    val n1pAll = tailTypes.size.toDouble
    val v1 = unigCnt.size.toDouble
    def lpMicro(g: (String, String, String)): BigInt = {
      val (w1, w2, w3) = g
      val p1 = (unigCnt.getOrElse(w3, 0L).toDouble + 1.0) /
        (n1pAll + v1 + 1.0)
      val p2 = midCnt.get(w2) match {
        case None => p1
        case Some(mid) =>
          val cont2 = tailTypes.getOrElse((w2, w3), 0L).toDouble
          math.max(cont2 - D, 0.0) / mid.toDouble +
            ((D * folCnt(w2).toDouble / mid.toDouble) * p1)
      }
      val p3 = ctxCnt.get((w1, w2)) match {
        case None => p2
        case Some((c2ctx, n1p2)) =>
          math.max(c3t.getOrElse(g, 0L).toDouble - D, 0.0) / c2ctx.toDouble +
            ((D * n1p2.toDouble / c2ctx.toDouble) * p2)
      }
      r0(1e6 * math.log(p3))
    }
    val lp = perDoc.keySet.map(_._2).map(g => g -> lpMicro(g)).toMap
    corpus.map { case (id, t, _) =>
      val events = tris(t).groupBy(identity).view.mapValues(_.size.toLong)
      val n = events.values.sum
      val sm = events.map { case (g, tf) => lp(g) * tf }.sum
      val logprob = BigDecimal(sm).toDouble / 1e6
      // unrounded since r13 (the sf10-caught round-at-boundary fix):
      // one IEEE division over exact integers, bit-identical everywhere
      val xent = -(BigDecimal(sm).toDouble) / (1e6 * n.toDouble)
      id -> ((n, logprob, xent))
    }.toMap
  }

  property("matches the plain-Scala interpolated-KN reference exactly") =
    forAll(
      Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, doc)),
      Gen.listOfN(6, Gen.oneOf(true, false))) { (texts, flags) =>
      import spark.implicits._
      val corpus = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, flags(i % flags.size)) }
      val docs = spark.createDataset(corpus).toDF("doc_id", "text", "tgt")
      val got = TextAnalysis.knPerplexity(docs, col("tgt"))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_events"), r.getAs[Double]("logprob"),
            r.getAs[Double]("xent_nats")))).toMap
      val want = ref(corpus)
      val ok = got == want
      if (!ok) println(s"MISMATCH corpus=$corpus\n engine=$got\n ref=$want")
      ok
    }
}
