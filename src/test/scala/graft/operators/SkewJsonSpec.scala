package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SkewJsonSpec extends AnyFunSuite with BeforeAndAfterAll {

  test("Json.flatten infers schema from a sample and types the columns") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 5, "tag": "a"}"""),
      (2L, """{"k": 7}"""),
      (3L, null.asInstanceOf[String]))
      .toDF("id", "js")
    val flat = graft.operators.Json.flatten(df, "js")
    assert(flat.columns.toSeq == Seq("id", "js", "k", "tag"))
    val m = flat.collect().map(r => r.getLong(0) ->
      (Option(r.get(r.fieldIndex("k"))), Option(r.get(r.fieldIndex("tag"))))).toMap
    assert(m(1L) == ((Some(5L), Some("a"))))
    assert(m(2L) == ((Some(7L), None))) // field absent in row → NULL
    assert(m(3L) == ((None, None)))     // null payload → all NULL
  }

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-skewjson-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("json extracted fields parse and cast") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 87, "s": "x"}"""),
      (2L, """{"s": "y"}"""),
      (3L, "not json at all"))
      .toDF("id", "props")
    val e = Json.extracted(df, "props", Map(
      "k" -> ("$.k", "bigint"), "s" -> ("$.s", "string")))
    val m = e.collect().map(r => r.getAs[Long]("id") ->
      (Option(r.get(r.fieldIndex("k"))), Option(r.get(r.fieldIndex("s"))))).toMap
    assert(m(1L) == ((Some(87L), Some("x"))))
    assert(m(2L) == ((None, Some("y"))))
    assert(m(3L) == ((None, None)))
  }

  test("json parsed with explicit schema") {
    import spark.implicits._
    val df = Seq((1L, """{"k": 5}""")).toDF("id", "props")
    val p = Json.parsed(df, "props",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
    assert(p.select("parsed.k").collect()(0).getLong(0) == 5L)
  }

  test("twoPhaseAgg equals direct aggregation on skewed keys") {
    import spark.implicits._
    // 10k rows, 90% on one hot key
    val rows = (1 to 10000).map(i => (if (i % 10 == 0) s"key${i % 7}" else "hot", i.toLong))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"), max("v").as("mx"))
    val salted = Skew.twoPhaseAgg(df, Seq("k"), saltFactor = 8,
      partial = Seq(count(lit(1)).as("__n"), sum("v").as("__s"), max("v").as("__mx")),
      merge = Seq(sum("__n").as("n"), sum("__s").as("s"), max("__mx").as("mx")))
    assert(salted.exceptAll(direct).count() == 0 && direct.exceptAll(salted).count() == 0)
  }

  test("saltedLeftJoin equals plain left join") {
    import spark.implicits._
    val left = (1 to 5000).map(i => (if (i % 5 == 0) 2L else 1L, i.toLong)).toDF("k", "v")
    val right = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("rk", "label")
    val plain = left.join(right, left("k") === right("rk"), "left")
      .select("k", "v", "label")
    val salted = Skew.saltedLeftJoin(left, right, "k", "rk", saltFactor = 4)
      .select("k", "v", "label")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }
}
