package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.sql.Timestamp

class AsOfSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-asof-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("asOfJoin attaches the latest right row at or before each left ts") {
    import spark.implicits._
    val quotes = Seq( // (key, ts, px)
      ("a", ts(100), 1.0), ("a", ts(200), 2.0), ("a", ts(300), 3.0),
      ("b", ts(150), 9.0)).toDF("sym", "ts", "px")
    val trades = Seq( // (key, ts, qty)
      ("a", ts(99), 10L),   // before any quote -> null
      ("a", ts(100), 11L),  // equal ts -> INCLUSIVE match px=1.0
      ("a", ts(250), 12L),  // between -> px=2.0
      ("a", ts(999), 13L),  // after all -> px=3.0
      ("b", ts(151), 14L),  // other key -> own quote
      ("c", ts(500), 15L)). // key with no quotes -> null
      toDF("sym", "ts", "qty")
    val out = AsOf.asOfJoin(trades, quotes, on = Seq("sym"))
      .collect().map(r => r.getAs[Long]("qty") ->
        Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)).toMap
    assert(out(10L).isEmpty, "left row before any right row gets null")
    assert(out(11L).contains(1.0), "equal ts matches (inclusive backward)")
    assert(out(12L).contains(2.0))
    assert(out(13L).contains(3.0))
    assert(out(14L).contains(9.0))
    assert(out(15L).isEmpty, "unseen key gets null")
  }

  test("asOfJoin tolerance nulls out stale matches") {
    import spark.implicits._
    val dim = Seq(("a", ts(100), "fresh")).toDF("k", "ts", "v")
    val fact = Seq(("a", ts(130), 1L), ("a", ts(5000), 2L)).toDF("k", "ts", "id")
    val out = AsOf.asOfJoin(fact, dim, on = Seq("k"),
      toleranceMs = Some(60_000L))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[String]("v"))).toMap
    assert(out(1L).contains("fresh"), "30s-old match inside 60s tolerance")
    assert(out(2L).isEmpty, "4900s-old match nulled by tolerance")
  }

  test("rangeJoin: containment incl. boundaries, overlap fan-out, key isolation") {
    import spark.implicits._
    val intervals = Seq(
      ("a", ts(100), ts(200), "i1"),
      ("a", ts(150), ts(300), "i2"), // overlaps i1 on [150,200]
      ("b", ts(100), ts(200), "i3")).toDF("k", "start", "end", "tag")
    val points = Seq(
      ("a", ts(100), 1L), // at start boundary -> i1
      ("a", ts(175), 2L), // inside both -> i1 AND i2
      ("a", ts(200), 3L), // at i1 end boundary, inside i2
      ("a", ts(301), 4L), // outside all -> dropped (inner)
      ("b", ts(175), 5L)).toDF("k", "ts", "id")
    val out = AsOf.rangeJoin(points, intervals, on = Seq("k"),
      bucketWidthSec = 60)
      .collect().groupBy(_.getAs[Long]("id"))
      .map { case (id, rs) => id -> rs.map(_.getAs[String]("tag")).sorted.toSeq }
    assert(out(1L) == Seq("i1"), "start boundary is inclusive")
    assert(out(2L) == Seq("i1", "i2"), "overlapping intervals fan out")
    assert(out(3L) == Seq("i1", "i2"), "end boundary is inclusive")
    assert(!out.contains(4L), "unmatched points drop (inner join)")
    assert(out(5L) == Seq("i3"), "keys isolate intervals")
  }

  test("rangeJoin result is bucket-width invariant") {
    import spark.implicits._
    val intervals = Seq(("a", ts(0), ts(10000), 1L)).toDF("k", "start", "end", "iid")
    val points = (0L to 50L).map(i => ("a", ts(i * 250), i)).toDF("k", "ts", "id")
    val counts = Seq(1L, 60L, 86400L).map { w =>
      AsOf.rangeJoin(points, intervals, on = Seq("k"), bucketWidthSec = w).count()
    }
    assert(counts.distinct.size == 1,
      s"bucket width must not change semantics: $counts")
    assert(counts.head == 41, "points 0..10000s inclusive at 250s spacing")
  }

  test("asOfJoin forward attaches the earliest right row at or after left ts") {
    import spark.implicits._
    val quotes = Seq(
      ("a", ts(100), 1.0), ("a", ts(200), 2.0), ("b", ts(150), 9.0))
      .toDF("sym", "ts", "px")
    val trades = Seq(
      ("a", ts(99), 10L),   // next quote at 100 -> 1.0
      ("a", ts(100), 11L),  // equal ts -> INCLUSIVE 1.0
      ("a", ts(101), 12L),  // next at 200 -> 2.0
      ("a", ts(999), 13L),  // nothing after -> null
      ("b", ts(150), 14L)).toDF("sym", "ts", "qty")
    val out = AsOf.asOfJoin(trades, quotes, on = Seq("sym"),
      direction = "forward")
      .collect().map(r => r.getAs[Long]("qty") ->
        Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)).toMap
    assert(out(10L).contains(1.0))
    assert(out(11L).contains(1.0), "equal ts matches (inclusive forward)")
    assert(out(12L).contains(2.0))
    assert(out(13L).isEmpty, "no right row at or after -> null")
    assert(out(14L).contains(9.0))
  }

  test("asOfJoin nearest picks the closer side; ties break backward") {
    import spark.implicits._
    val dim = Seq(
      ("a", ts(100), "early"), ("a", ts(200), "late")).toDF("k", "ts", "v")
    val fact = Seq(
      ("a", ts(140), 1L),  // 40 back vs 60 fwd -> early
      ("a", ts(160), 2L),  // 60 back vs 40 fwd -> late
      ("a", ts(150), 3L),  // exact tie -> backward (early)
      ("a", ts(50), 4L),   // only forward exists -> early
      ("a", ts(900), 5L)). // only backward exists -> late
      toDF("k", "ts", "id")
    val out = AsOf.asOfJoin(fact, dim, on = Seq("k"), direction = "nearest")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
    assert(out(1L) == "early" && out(2L) == "late")
    assert(out(3L) == "early", "equidistant tie must break backward")
    assert(out(4L) == "early" && out(5L) == "late")
    // tolerance applies per direction before the nearest choice
    val tol = AsOf.asOfJoin(fact, dim, on = Seq("k"), direction = "nearest",
      toleranceMs = Some(45_000L))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[String]("v"))).toMap
    assert(tol(1L).contains("early") && tol(2L).contains("late"))
    assert(tol(5L).isEmpty, "700s-stale backward match nulled by tolerance")
  }

  test("asOfJoin NULL keys follow SQL semantics: never match, keep null payload") {
    import spark.implicits._
    // equal timestamps: inclusive match in ALL three directions
    val dim = Seq((Some("a"), ts(10), 1L), (None, ts(10), 99L))
      .toDF("k", "ts", "v")
    val fact = Seq((Some("a"), ts(10), "ok"), (None, ts(10), "nullkey"))
      .toDF("k", "ts", "name")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val out = AsOf.asOfJoin(fact, dim, on = Seq("k"),
        direction = dir, leftTs = "ts", rightTs = "ts")
        .collect().map(r => r.getAs[String]("name") ->
          Option(r.getAs[java.lang.Long]("v"))).toMap
      assert(out("ok").contains(1L))
      assert(out("nullkey").isEmpty,
        s"direction=$dir: NULL key must not match the NULL-keyed right row")
    }
  }

  test("asOfJoin NULL timestamps never match in any direction") {
    import spark.implicits._
    // a null-rightTs row would sort first under asc (backward pass) and
    // a null-leftTs row would sort last under desc (forward pass) — both
    // must be unmatched, like DuckDB ASOF's NULL comparison
    val dim = Seq((Some("a"), Option(ts(10)), 1L),
      (Some("a"), Option.empty[java.sql.Timestamp], 99L))
      .toDF("k", "ts", "v")
    val fact = Seq((Some("a"), Option(ts(10)), "ok"),
      (Some("a"), Option.empty[java.sql.Timestamp], "nullts"))
      .toDF("k", "ts", "name")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val out = AsOf.asOfJoin(fact, dim, on = Seq("k"),
        direction = dir)
        .collect().map(r => r.getAs[String]("name") ->
          Option(r.getAs[java.lang.Long]("v"))).toMap
      assert(out("ok").contains(1L),
        s"direction=$dir: the valid row must still match the valid right row")
      assert(out("nullts").isEmpty,
        s"direction=$dir: a null-leftTs row must come back unmatched")
    }
  }

  test("rangeJoin guards the explode factor with a named error") {
    import spark.implicits._
    // a year-long interval at 1-second buckets = ~31.5M bucket rows from
    // ONE input row — the guard must fail loudly before the explode
    val intervals = Seq(("a", ts(0), ts(365L * 86400L), 1L))
      .toDF("k", "start", "end", "iid")
    val points = Seq(("a", ts(10), 1L)).toDF("k", "ts", "id")
    val e = intercept[Exception] {
      AsOf.rangeJoin(points, intervals, on = Seq("k"),
        bucketWidthSec = 1L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m =>
      m != null && m.contains("maxBucketsPerInterval")),
      s"expected the named guard error, got: $e")
    // the same data passes with a sane width; a raised budget passes a
    // day-long interval at 1s buckets (86400 > the tightened 10k budget)
    assert(AsOf.rangeJoin(points, intervals, on = Seq("k"),
      bucketWidthSec = 86400L).count() == 1L)
    val day = Seq(("a", ts(0), ts(86400L), 1L)).toDF("k", "start", "end", "iid")
    assert(AsOf.rangeJoin(points, day, on = Seq("k"),
      bucketWidthSec = 1L, maxBucketsPerInterval = 100_000L).count() == 1L)
  }

  test("asOfJoin multi-key + payload prefix keeps left schema intact") {
    import spark.implicits._
    val dim = Seq((1L, "x", ts(10), 7L)).toDF("uid", "seg", "ts", "score")
    val fact = Seq((1L, "x", ts(20), "e1"), (1L, "y", ts(20), "e2"))
      .toDF("uid", "seg", "ts", "name")
    val out = AsOf.asOfJoin(fact, dim, on = Seq("uid", "seg"),
      payload = Seq("score"), prefix = "dim_")
    assert(out.columns.toSeq == Seq("uid", "seg", "ts", "name", "dim_score"))
    val m = out.collect().map(r => r.getAs[String]("name") ->
      Option(r.getAs[java.lang.Long]("dim_score"))).toMap
    assert(m("e1").contains(7L) && m("e2").isEmpty,
      "both equality keys must match, not just the first")
  }
}
