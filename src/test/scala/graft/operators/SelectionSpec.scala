package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SelectionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-selection-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // target docs speak "alpha/beta"; raw background speaks "gamma/delta";
  // a few raw docs share the target vocabulary and should score high
  private def corpus(): DataFrame = {
    import spark.implicits._
    val tgt = (1L to 20L).map(i => (i, "alpha beta alpha gamma", "en"))
    val bg = (21L to 60L).map(i => (i, "gamma delta delta epsilon", "de"))
    val mixed = (61L to 65L).map(i => (i, "alpha beta alpha beta", "de"))
    val empty = Seq((66L, "", "de"), (67L, null.asInstanceOf[String], "de"))
    spark.createDataset(tgt ++ bg ++ mixed ++ empty)
      .toDF("doc_id", "text", "lang")
  }

  private def weights(): Map[Long, (Long, Double)] =
    Selection.dsirWeights(corpus(), col("lang") === "en")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Double]("log_weight")))
      .toMap

  test("target-vocabulary docs outscore background; zero-gram docs keep weight 0") {
    val w = weights()
    assert(w.size == 67)
    // every doc sharing the target's vocabulary beats every background doc
    val targetLike = (1L to 20L) ++ (61L to 65L)
    val background = 21L to 60L
    val minTarget = targetLike.map(w(_)._2).min
    val maxBackground = background.map(w(_)._2).max
    assert(minTarget > maxBackground,
      s"target-like min $minTarget !> background max $maxBackground")
    // 4 tokens -> 4 unigrams + 3 bigrams
    assert(w(1L)._1 == 7)
    // empty and NULL text: no grams, empty-product weight exactly 0
    assert(w(66L) == ((0L, 0.0)))
    assert(w(67L) == ((0L, 0.0)))
  }

  test("weights are partitioning- and order-independent (exact fixed-point)") {
    val base = weights()
    val shuffled = Selection
      .dsirWeights(corpus().repartition(7, col("text")).sortWithinPartitions("text"),
        col("lang") === "en")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Double]("log_weight")))
      .toMap
    assert(shuffled == base)
  }

  test("sample returns exactly k rows, favors high-weight docs, and is deterministic") {
    val s1 = Selection.dsirSample(corpus(), col("lang") === "en", k = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("key"))).toSet
    assert(s1.size == 10)
    val s2 = Selection.dsirSample(corpus().repartition(5), col("lang") === "en", k = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("key"))).toSet
    assert(s2 == s1)
    // the weight gap between target-like and background (~ multiple nats)
    // dominates the Gumbel noise for most picks: a majority of the k=10
    // must be target-like
    val targetLike = ((1L to 20L) ++ (61L to 65L)).toSet
    assert(s1.count(p => targetLike(p._1)) > 5)
    // k larger than the corpus degrades to "all docs"
    val all = Selection.dsirSample(corpus(), col("lang") === "en", k = 1000)
    assert(all.count() == 67)
  }

  test("non-power-of-two bucket count is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      Selection.dsirWeights(corpus(), col("lang") === "en", buckets = 1000)
        .collect()
    }
    assert(e.getMessage.contains("power of two"))
  }
}
