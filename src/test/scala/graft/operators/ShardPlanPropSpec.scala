package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: Packing.shardPlan must agree with a plain in-memory
  * reference — sort ALL ids by (md5('sh'||id) ASC, id ASC), assign
  * ordinals 0..n−1, shard = ordinal / shardSize, pos = ordinal %
  * shardSize — on random id sets (sparse, duplicate-free longs) across
  * random shard sizes, with the input re-partitioned arbitrarily before
  * the call: the full plan must be a pure function of the data (the
  * distributed two-pass ordinal may not leak partition or range-bound
  * placement into the result).
  */
object ShardPlanPropSpec extends Properties("Packing.shardPlan") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-shard-plan-prop")
    .config("spark.sql.shuffle.partitions", "5")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def ref(ids: Seq[Long], shardSize: Long)
      : Map[Long, (String, Long, Long, Long)] =
    ids.map(id => (id, md5hex("sh" + id)))
      .sortBy { case (id, h) => (h, id) }
      .zipWithIndex
      .map { case ((id, h), o) =>
        id -> ((h, o.toLong, o / shardSize, o % shardSize))
      }.toMap

  property("matches the sequential shuffle-sort under any partitioning") =
    forAll(
      Gen.chooseNum(1, 60).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-100000L, 100000L)).map(_.distinct)),
      Gen.chooseNum(1L, 25L), Gen.chooseNum(1, 8)) { (ids, shardSize, nPart) =>
      import spark.implicits._
      val df = spark.createDataset(ids).toDF("doc_id").repartition(nPart)
      val got = Packing.shardPlan(df, shardSize)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("shuffle_key"), r.getAs[Long]("ordinal"),
            r.getAs[Long]("shard"), r.getAs[Long]("pos_in_shard")))).toMap
      val want = ref(ids, shardSize)
      val ok = got == want
      if (!ok) println(s"MISMATCH shardSize=$shardSize nPart=$nPart\n" +
        s" engine=$got\n ref=$want\n ids=$ids")
      ok
    }

  property("reliable-checkpoint knob leaves the plan identical") = {
    import spark.implicits._
    val df = spark.createDataset((0L until 60L).toSeq).toDF("doc_id")
      .repartition(4)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sp-ckpt").toString
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val base = rows(Packing.shardPlan(df, 7L))
    val rel = rows(Packing.shardPlan(df, 7L, checkpointDir = Some(dir)))
    base == rel && base.size == 60
  }
}
