package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: Selection.tokenBudgetSelect must agree with a plain
  * in-memory reference — sort ALL rows by (score DESC, md5('tb'||id)
  * ASC), walk the inclusive prefix sum, keep while ≤ budget — on random
  * corpora with duplicate scores, zero-token rows, and budgets from 0
  * to beyond the total. The input is also re-partitioned arbitrarily
  * before the call: the kept set and every emitted cum_tokens value
  * must be a pure function of the data (the distributed two-pass
  * prefix sum may not leak partition boundaries into the result).
  */
object TokenBudgetPropSpec extends Properties("Selection.tokenBudgetSelect") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-token-budget-prop")
    .config("spark.sql.shuffle.partitions", "5")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def ref(rows: Seq[(Long, Long, Long)], budget: Long)
      : Map[Long, (Long, Long, Long)] = {
    var cum = 0L
    rows.sortBy { case (id, s, _) => (-s, md5hex("tb" + id)) }
      .iterator.map { case (id, s, t) => cum += t; (id, s, t, cum) }
      .takeWhile(_._4 <= budget)
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  private val row: Gen[(Long, Long)] = for {
    s <- Gen.chooseNum(0L, 5L) // few distinct scores => heavy ties
    t <- Gen.frequency(3 -> Gen.chooseNum(0L, 20L), 1 -> Gen.const(0L))
  } yield (s, t)

  property("matches the sequential prefix walk under any partitioning") =
    forAll(
      Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, row)),
      Gen.chooseNum(0L, 400L), Gen.chooseNum(1, 8)) { (rows, budget, nPart) =>
      import spark.implicits._
      val data = rows.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
      val df = spark.createDataset(data).toDF("doc_id", "score", "n_tokens")
        .repartition(nPart)
      val got = Selection
        .tokenBudgetSelect(df, "score", "n_tokens", budget)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("score"), r.getAs[Long]("n_tokens"),
            r.getAs[Long]("cum_tokens")))).toMap
      val want = ref(data, budget)
      val ok = got == want
      if (!ok) println(s"MISMATCH budget=$budget nPart=$nPart\n" +
        s" engine=$got\n ref=$want\n data=$data")
      ok
    }

  property("reliable-checkpoint knob leaves the result identical") = {
    import spark.implicits._
    val data = (0L until 50L).map(i => (i, i % 7, i % 11))
    val df = spark.createDataset(data).toDF("doc_id", "score", "n_tokens")
      .repartition(5)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tb-ckpt").toString
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val base = rows(Selection.tokenBudgetSelect(df, "score", "n_tokens", 120L))
    val rel = rows(Selection.tokenBudgetSelect(df, "score", "n_tokens", 120L,
      checkpointDir = Some(dir)))
    base == rel && base.nonEmpty
  }
}
