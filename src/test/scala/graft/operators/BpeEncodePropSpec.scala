package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: the array-speed `bpe_encode` expression must be
  * value-identical to the ORIGINAL generated replace chain
  * (TextAnalysis.bpeChainApplied — the form the DuckDB oracles are
  * generated from) on random words under random merge tables. The
  * generator leans into the semantic corners: repeated-letter runs (the
  * alternate-pair replace artifact), rules whose LHS references symbols
  * only PRODUCED by earlier rules (multi-char symbol matching), rules
  * that can never fire, duplicate rules, and single-char words. Both
  * sides run in one Spark job per case; equality is on the exact piece
  * arrays, not counts.
  */
object BpeEncodePropSpec extends Properties("functions.BpeEncode") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bpe-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // tiny alphabet ⇒ dense rule hits and repeated-pair runs
  private val letter: Gen[String] = Gen.oneOf("t", "h", "e", "a")
  private val word: Gen[String] = for {
    n <- Gen.chooseNum(1, 12)
    cs <- Gen.listOfN(n, letter)
  } yield cs.mkString

  /** A rank-ordered merge table: each rule pairs two symbols drawn from
    * the alphabet PLUS the outputs of earlier rules, so later rules can
    * only fire after earlier merges — the chain-order dependence that a
    * wrong skip-optimization would break.
    */
  private val mergeTable: Gen[Seq[(String, String)]] =
    Gen.chooseNum(0, 8).flatMap { n =>
      (0 until n).foldLeft(Gen.const(Seq.empty[(String, String)])) {
        case (acc, _) => acc.flatMap { rules =>
          val symbols = Seq("t", "h", "e", "a") ++ rules.map(_._2)
          for {
            a <- Gen.oneOf(symbols)
            b <- Gen.oneOf(symbols)
          } yield rules :+ (s"$a $b" -> (a + b))
        }
      }
    }

  property("equals the generated replace chain on exact piece arrays") =
    forAll(mergeTable, Gen.chooseNum(1, 10).flatMap(Gen.listOfN(_, word))) {
      (merges, words) =>
        import spark.implicits._
        graft.functions.GraftFunctions.register(spark)
        val table = merges.map { case (f, t) => s"$f>$t" }.mkString(";")
        val chain = TextAnalysis.bpeChainApplied(merges)
        val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
          .toDF("id", "w")
          .selectExpr("id",
            s"bpe_encode(w, '$table') AS fast",
            s"split(trim($chain), ' ') AS slow")
        df.collect().forall { r =>
          r.getSeq[String](1) == r.getSeq[String](2)
        }
    }
}
