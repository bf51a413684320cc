package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import java.sql.Timestamp

/** Property test: AsOf.asOfJoin must agree with a brute-force reference
  * on random instances — for every left row, the matched payload is the
  * right row with equal key and the LARGEST rightTs <= leftTs, or null.
  * Random data exercises the boundary cases example tests under-sample:
  * equal timestamps across sides, keys present on only one side, dense
  * ties in the left, and empty-right keys. Right rows are generated
  * unique per (key, ts) — the documented as-of precondition.
  */
object AsOfPropSpec extends Properties("AsOf.asOfJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20) // each case runs a Spark job

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-asof-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: Int) = new Timestamp(s * 1000L)

  private val keys = Gen.oneOf("a", "b", "c")
  private val rightSide: Gen[List[(String, Int, Long)]] =
    Gen.listOf(Gen.zip(keys, Gen.choose(0, 40))).map(
      _.distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) })
  private val leftSide: Gen[List[(String, Int, Long)]] =
    Gen.listOf(Gen.zip(keys, Gen.choose(0, 40))).map(
      _.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) })

  property("matches the brute-force latest-at-or-before reference") =
    forAll(leftSide, rightSide) { (lrows, rrows) =>
      import spark.implicits._
      val expected = lrows.map { case (k, lt, id) =>
        val m = rrows.filter(r => r._1 == k && r._2 <= lt)
        id -> (if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
      }.toMap
      val left = lrows.map { case (k, t, id) => (k, ts(t), id) }
        .toDF("k", "ts", "id")
      val right = rrows.map { case (k, t, v) => (k, ts(t), v) }
        .toDF("k", "ts", "v")
      val got =
        if (rrows.isEmpty) lrows.map(l => l._3 -> None).toMap // payload-less right
        else AsOf.asOfJoin(left, right, on = Seq("k"))
          .collect()
          .map(r => r.getAs[Long]("id") ->
            Option(r.getAs[java.lang.Long]("v")).map(_.toLong)).toMap
      got == expected
    }

  // intervals as (key, start, start+len, iid); points must collect every
  // containing interval's id — brute-force containment is the reference
  private val intervalSide: Gen[List[(String, Int, Int, Long)]] =
    Gen.listOf(Gen.zip(keys, Gen.choose(0, 40), Gen.choose(0, 15))).map(
      _.zipWithIndex.map { case ((k, s, len), i) => (k, s, s + len, i.toLong) })

  property("rangeJoin matches brute-force interval containment at any bucket width") =
    forAll(leftSide, intervalSide, Gen.oneOf(1L, 7L, 3600L)) { (prows, irows, width) =>
      import spark.implicits._
      val expected = (for {
        (k, t, id) <- prows
        (ik, s, e, iid) <- irows
        if ik == k && t >= s && t <= e
      } yield (id, iid)).toSet
      val points = prows.map { case (k, t, id) => (k, ts(t), id) }
        .toDF("k", "ts", "id")
      val intervals = irows.map { case (k, s, e, iid) => (k, ts(s), ts(e), iid) }
        .toDF("k", "start", "end", "iid")
      val got =
        if (irows.isEmpty) Set.empty[(Long, Long)]
        else AsOf.rangeJoin(points, intervals, on = Seq("k"),
            bucketWidthSec = width)
          .collect()
          .map(r => (r.getAs[Long]("id"), r.getAs[Long]("iid"))).toSet
      got == expected
    }

  property("forward matches the brute-force earliest-at-or-after reference") =
    forAll(leftSide, rightSide) { (lrows, rrows) =>
      import spark.implicits._
      val expected = lrows.map { case (k, lt, id) =>
        val m = rrows.filter(r => r._1 == k && r._2 >= lt)
        id -> (if (m.isEmpty) None else Some(m.minBy(_._2)._3))
      }.toMap
      val left = lrows.map { case (k, t, id) => (k, ts(t), id) }
        .toDF("k", "ts", "id")
      val right = rrows.map { case (k, t, v) => (k, ts(t), v) }
        .toDF("k", "ts", "v")
      val got =
        if (rrows.isEmpty) lrows.map(l => l._3 -> None).toMap
        else AsOf.asOfJoin(left, right, on = Seq("k"), direction = "forward")
          .collect()
          .map(r => r.getAs[Long]("id") ->
            Option(r.getAs[java.lang.Long]("v")).map(_.toLong)).toMap
      got == expected
    }

  property("nearest matches brute force with backward tie-break") =
    forAll(leftSide, rightSide) { (lrows, rrows) =>
      import spark.implicits._
      val expected = lrows.map { case (k, lt, id) =>
        val m = rrows.filter(_._1 == k)
        id -> (if (m.isEmpty) None
               else {
                 // min |delta|; ties prefer the backward (<= lt) match
                 val best = m.minBy(r => (math.abs(r._2 - lt), r._2 > lt))
                 Some(best._3)
               })
      }.toMap
      val left = lrows.map { case (k, t, id) => (k, ts(t), id) }
        .toDF("k", "ts", "id")
      val right = rrows.map { case (k, t, v) => (k, ts(t), v) }
        .toDF("k", "ts", "v")
      val got =
        if (rrows.isEmpty) lrows.map(l => l._3 -> None).toMap
        else AsOf.asOfJoin(left, right, on = Seq("k"), direction = "nearest")
          .collect()
          .map(r => r.getAs[Long]("id") ->
            Option(r.getAs[java.lang.Long]("v")).map(_.toLong)).toMap
      got == expected
    }
}
