package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class RankingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ranking-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def df(rows: Seq[(Long, String, Int)]): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).toDF("doc_id", "grp", "score")
  }

  /** Single-window textbook form — the correctness reference. */
  private def bruteTopK(d: DataFrame, k: Int): Set[(String, Long, Int)] = {
    val w = Window.partitionBy("grp")
      .orderBy(col("score").cast("long").desc, col("doc_id").asc)
    d.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .collect().map(r =>
        (r.getAs[String]("grp"), r.getAs[Long]("doc_id"), r.getAs[Int]("score")))
      .toSet
  }

  test("topKPerGroup equals the single-window form on random data, any salts") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 2000).map(i =>
      (i.toLong, s"g${rnd.nextInt(7)}", rnd.nextInt(40)))
    val d = df(rows)
    val expected = bruteTopK(d, 5)
    for (salts <- Seq(1, 3, 16, 64)) {
      val got = Ranking.topKPerGroup(d, Seq("grp"), "score", "doc_id", 5, salts)
        .collect().map(r =>
          (r.getAs[String]("grp"), r.getAs[Long]("doc_id"), r.getAs[Int]("score")))
        .toSet
      assert(got == expected, s"salts=$salts")
    }
  }

  test("topKPerGroup ranks are dense 1..k with doc_id tie-break") {
    // all-tied scores: rank order must be doc_id order
    val d = df((1 to 10).map(i => (i.toLong, "g", 7)))
    val r = Ranking.topKPerGroup(d, Seq("grp"), "score", "doc_id", 3, salts = 4)
      .orderBy("rank").collect()
    assert(r.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    assert(r.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L))
  }

  test("hashSamplePerGroup equals the unsalted window form and ignores partitioning") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 1500).map(i => (i.toLong, s"g${rnd.nextInt(5)}", 0))
    val d = df(rows)
    // reference: explicit md5-bucket window, no salting
    val staged = d
      .withColumn("__h", expr("md5(CAST(doc_id AS STRING))"))
      .withColumn("__b", expr(TextAnalysis.md5Bucket16Expr))
    val w = Window.partitionBy("grp").orderBy(col("__b").asc, col("doc_id").asc)
    val expected = staged.withColumn("r", row_number().over(w))
      .filter(col("r") <= 4)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("doc_id"))).toSet
    for (parts <- Seq(1, 13)) {
      val got = Ranking.hashSamplePerGroup(
        d.repartition(parts), Seq("grp"), "doc_id", 4, salts = 3)
        .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("doc_id"))).toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("topKPerGroup: groups smaller than k return whole group") {
    val d = df(Seq((1L, "a", 5), (2L, "a", 3), (3L, "b", 1)))
    val r = Ranking.topKPerGroup(d, Seq("grp"), "score", "doc_id", 10, salts = 4)
    assert(r.count() == 3)
  }

  test("topKPerGroup rejects bad k/salts") {
    val d = df(Seq((1L, "a", 1)))
    intercept[IllegalArgumentException] {
      Ranking.topKPerGroup(d, Seq("grp"), "score", "doc_id", 0)
    }
    intercept[IllegalArgumentException] {
      Ranking.topKPerGroup(d, Seq("grp"), "score", "doc_id", 1, salts = 0)
    }
  }
}
