package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: Selection.nbQuality must agree bit-for-bit with an
  * independent plain-Scala multinomial Naive Bayes on random corpora —
  * random target slices (including empty-target and all-target corners),
  * empty / null-text / 1-token documents, multi-space runs, and a small
  * bucket count (64) so hash collisions merge grams inside buckets. The
  * reference re-derives the unigram+bigram bag, the bucket counts, the
  * class-conditional add-λ llr with the operator's exact IEEE operation
  * order, the per-bucket 1e-6 micro-quantization (HALF_UP), the
  * whole-corpus class doc-count prior, and the exact integer per-document
  * sums — so a drift in any count, smoothing term, or rounding step
  * fails on exact Double equality, not a tolerance. (The shared
  * primitive is the token hash itself — xxhash64 seed 42 — which is
  * cross-engine-gated separately through the DuckDB HUGEINT mirror.)
  */
object NbQualityPropSpec extends Properties("Selection.nbQuality") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10) // each case runs a multi-agg Spark job

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-nb-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val B = 64
  private val Lambda = 1.0

  private val word: Gen[String] =
    Gen.oneOf("a", "b", "c", "dd", "eee", "the", "of", "quality")
  private val doc: Gen[Option[String]] = Gen.frequency(
    19 -> (for {
      n <- Gen.chooseNum(0, 10)
      ws <- Gen.listOfN(n, word)
      sep <- Gen.oneOf(" ", "  ")
    } yield Some(ws.mkString(sep))),
    1 -> Gen.const(None)) // null text: zero grams, prior-only score

  private def r0(x: Double): BigInt =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt

  /** doc_id -> (n_grams, log_odds, pred_target), engine-identical
    * arithmetic from first principles.
    */
  private def ref(corpus: Seq[(Long, Option[String], Boolean)])
      : Map[Long, (Long, Double, Boolean)] = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    def toks(t: String): Vector[String] =
      t.toLowerCase.split(" +", -1).filter(_.nonEmpty).toVector
    def grams(t: String): Vector[String] = {
      val ts = toks(t)
      ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    def bucket(g: String): Long =
      XxHash64Function.hash(UTF8String.fromString(g), StringType, 42L) & (B - 1)
    // (doc, bucket) -> n  — the shared count relation
    val bc: Map[(Long, Long), Long] = corpus
      .flatMap { case (id, t, _) => t.toSeq.flatMap(grams).map(g => (id, bucket(g))) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tgt = corpus.collect { case (id, _, flag) => id -> flag }.toMap
    val ct = bc.toSeq.collect { case ((id, b), n) if tgt(id) => (b, n) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val cf = bc.toSeq.collect { case ((id, b), n) if !tgt(id) => (b, n) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val nt = ct.values.sum.toDouble
    val nf = cf.values.sum.toDouble
    val llr: Map[Long, BigInt] = bc.keySet.map(_._2).map { b =>
      // exact engine operation order: ln(ct+λ) − ln(nt+λB) − ln(cf+λ) + ln(nf+λB)
      b -> r0(1e6 * (math.log(ct.getOrElse(b, 0L) + Lambda)
        - math.log(nt + Lambda * B)
        - math.log(cf.getOrElse(b, 0L) + Lambda)
        + math.log(nf + Lambda * B)))
    }.toMap
    // prior: class DOCUMENT counts over the whole corpus (add-1 smoothed)
    val td = corpus.count(_._3)
    val fd = corpus.size - td
    val prior = r0(1e6 * (math.log(td + 1.0) - math.log(fd + 1.0)))
    corpus.map { case (id, _, _) =>
      val mine = bc.collect { case ((d, b), n) if d == id => (b, n) }
      val sm = mine.map { case (b, n) => BigInt(n) * llr(b) }.sum
      val odds = sm + prior
      id -> (mine.values.sum, odds.toDouble / 1e6, odds > 0)
    }.toMap
  }

  property("matches an independent Scala NB bit-for-bit") =
    forAll(Gen.chooseNum(1, 14).flatMap { n =>
      Gen.listOfN(n, Gen.zip(doc, Gen.oneOf(true, false)))
    }) { rows =>
      val corpus = rows.zipWithIndex.map { case ((t, flag), i) =>
        (i.toLong, t, flag)
      }
      val expected = ref(corpus)
      import spark.implicits._
      val df = corpus.map { case (id, t, flag) => (id, t.orNull, flag) }
        .toDF("doc_id", "text", "is_tgt")
      val got = Selection.nbQuality(df, col("is_tgt"), buckets = B,
          lambda = Lambda)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
        .toMap
      got.keySet == expected.keySet && got.keySet.forall { id =>
        val (gn, go, gp) = got(id)
        val (en, eo, ep) = expected(id)
        gn == en && go == eo && gp == ep
      }
    }
}
