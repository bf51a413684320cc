package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.sql.Timestamp

class FeaturesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-features-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ev(rows: Seq[(Long, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows.map { case (id, us, _, v) =>
      (id, new Timestamp(us / 1000), us, v)
    }).toDF("event_id", "ts", "__ignore", "value")
      .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts",
        "CAST(1 AS BIGINT) AS user_id", "value")
  }

  test("rollingEventFeatures: trailing window, lag, and gap are exact") {
    import spark.implicits._
    // one user; events at t=0s, 10s, 3610s (first falls out of the 1h
    // window for the third), values 1.00, 2.50, 4.00
    val df = spark.createDataset(Seq(
      (1L, 0L, 1.00), (2L, 10L, 2.50), (3L, 3610L, 4.00)))
      .toDF("event_id", "sec", "value")
      .selectExpr("event_id", "timestamp_seconds(sec) AS ts",
        "CAST(7 AS BIGINT) AS user_id", "value")
    val r = Features.rollingEventFeatures(df, windowSecs = 3600L)
      .orderBy("event_id").collect()
    // t=0: window [−3600s, 0] → itself
    assert(r(0).getAs[Long]("roll_n") == 1L)
    assert(r(0).getAs[Long]("roll_cents") == 100L)
    assert(r(0).isNullAt(r(0).fieldIndex("prev_cents")))
    assert(r(0).isNullAt(r(0).fieldIndex("gap_us")))
    // t=10s: both events in window
    assert(r(1).getAs[Long]("roll_n") == 2L)
    assert(r(1).getAs[Long]("roll_cents") == 350L)
    assert(r(1).getAs[Long]("prev_cents") == 100L)
    assert(r(1).getAs[Long]("gap_us") == 10000000L)
    // t=3610s: only t=10s still inside [10s, 3610s]
    assert(r(2).getAs[Long]("roll_n") == 2L)
    assert(r(2).getAs[Long]("roll_cents") == 650L)
    assert(r(2).getAs[Long]("prev_cents") == 250L)
    assert(r(2).getAs[Long]("gap_us") == 3600000000L)
  }

  test("rollingEventFeatures: tied timestamps get identical rolling values") {
    import spark.implicits._
    // two events at the SAME instant: RANGE peers — both see both
    val df = spark.createDataset(Seq(
      (1L, 100L, 1.00), (2L, 100L, 2.00)))
      .toDF("event_id", "sec", "value")
      .selectExpr("event_id", "timestamp_seconds(sec) AS ts",
        "CAST(7 AS BIGINT) AS user_id", "value")
    val r = Features.rollingEventFeatures(df, windowSecs = 60L)
      .orderBy("event_id").collect()
    assert(r(0).getAs[Long]("roll_n") == 2L && r(1).getAs[Long]("roll_n") == 2L)
    assert(r(0).getAs[Long]("roll_cents") == 300L)
    assert(r(1).getAs[Long]("roll_cents") == 300L)
    // lag is tie-broken by event_id: event 2 sees event 1, gap 0
    assert(r(0).isNullAt(r(0).fieldIndex("prev_cents")))
    assert(r(1).getAs[Long]("prev_cents") == 100L)
    assert(r(1).getAs[Long]("gap_us") == 0L)
  }

  test("rollingEventFeatures: users are independent") {
    import spark.implicits._
    val df = spark.createDataset(Seq(
      (1L, 5L, 0L, 1.00), (2L, 5L, 10L, 1.00), (3L, 9L, 10L, 1.00)))
      .toDF("event_id", "user_id", "sec", "value")
      .selectExpr("event_id", "user_id",
        "timestamp_seconds(sec) AS ts", "value")
    val r = Features.rollingEventFeatures(df, windowSecs = 3600L)
      .orderBy("event_id").collect()
    assert(r(2).getAs[Long]("roll_n") == 1L)   // user 9 sees only itself
    assert(r(2).isNullAt(r(2).fieldIndex("prev_cents")))
  }

  test("funnel: strict ordering, greedy-earliest chain") {
    import spark.implicits._
    // u1: view@10 click@20 purchase@30 — completes all three
    // u2: click@5 view@10 click@10 — click at the SAME instant as view
    //     must NOT advance (strict >); the earlier click is before view
    // u3: view@10 click@20 — no purchase
    // u4: purchase@5 — never viewed
    val df = spark.createDataset(Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 10L), (2L, "click", 10L),
      (3L, "view", 10L), (3L, "click", 20L),
      (4L, "purchase", 5L)))
      .toDF("user_id", "event_type", "sec")
      .selectExpr("user_id", "event_type", "timestamp_seconds(sec) AS ts")
    val r = Features.funnel(df, Seq("view", "click", "purchase"))
      .orderBy("stage_idx").collect()
    assert(r.map(x => (x.getInt(0), x.getString(1), x.getLong(2))).toSeq ==
      Seq((0, "view", 3L), (1, "click", 2L), (2, "purchase", 1L)))
  }

  test("funnel: later qualifying events still complete the greedy chain") {
    import spark.implicits._
    // u1 views twice; the chain anchors on the FIRST view (t=10) and the
    // click@15 (after first view, before second) must count
    val df = spark.createDataset(Seq(
      (1L, "view", 10L), (1L, "view", 20L), (1L, "click", 15L)))
      .toDF("user_id", "event_type", "sec")
      .selectExpr("user_id", "event_type", "timestamp_seconds(sec) AS ts")
    val r = Features.funnel(df, Seq("view", "click")).orderBy("stage_idx")
      .collect().map(_.getLong(2)).toSeq
    assert(r == Seq(1L, 1L))
  }

  test("funnel rejects duplicate or empty stages") {
    import spark.implicits._
    val df = spark.createDataset(Seq((1L, "view", 1L)))
      .toDF("user_id", "event_type", "sec")
      .selectExpr("user_id", "event_type", "timestamp_seconds(sec) AS ts")
    intercept[IllegalArgumentException] { Features.funnel(df, Seq.empty) }
    intercept[IllegalArgumentException] {
      Features.funnel(df, Seq("view", "view"))
    }
  }

  test("retentionCohorts counts distinct users per (cohort, offset)") {
    import spark.implicits._
    val wk = 604800L // seconds per week
    // users 1,2 first active week 0; user 1 returns weeks 1 and 3 (twice
    // in week 1 — must count once); user 3 starts week 1
    val df = spark.createDataset(Seq(
      (1L, 0L), (2L, wk - 1), (1L, wk), (1L, wk + 5), (1L, 3 * wk),
      (3L, wk + 2))).toDF("user_id", "sec")
      .selectExpr("user_id", "timestamp_seconds(sec) AS ts")
    val m = Features.retentionCohorts(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L))
  }

  test("retentionCohorts offset 0 equals total distinct users") {
    import spark.implicits._
    val df = spark.createDataset(
      (1 to 100).map(i => (i.toLong % 17, i.toLong * 3600)))
      .toDF("user_id", "sec")
      .selectExpr("user_id", "timestamp_seconds(sec) AS ts")
    val r = Features.retentionCohorts(df)
      .filter("week_offset = 0").agg(sum("n_users")).collect()(0).getLong(0)
    assert(r == 17L)
  }

  test("rollingEventFeatures rejects non-positive windows") {
    intercept[IllegalArgumentException] {
      Features.rollingEventFeatures(ev(Seq((1L, 0L, "", 1.0))), windowSecs = 0L)
    }
  }

  test("eventTransitions counts consecutive pairs per user, null rows drop") {
    import spark.implicits._
    // user 1: a→b→a (a,b at t0,t1; a at t2); user 2: b→b; plus a
    // null-user and a null-ts row that must not create transitions
    val df = spark.createDataset(Seq(
      (1L, Option(1L), Option(0L), "a"),
      (2L, Option(1L), Option(10L), "b"),
      (3L, Option(1L), Option(20L), "a"),
      (4L, Option(2L), Option(0L), "b"),
      (5L, Option(2L), Option(5L), "b"),
      (6L, Option.empty[Long], Option(7L), "a"),
      (7L, Option(1L), Option.empty[Long], "b")))
      .toDF("event_id", "user_id", "sec", "event_type")
      .selectExpr("event_id", "user_id", "timestamp_seconds(sec) AS ts", "event_type")
    val got = Features.eventTransitions(df)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 1L, ("b", "a") -> 1L, ("b", "b") -> 1L))
  }

  test("eventTransitions ties at equal ts break by event_id") {
    import spark.implicits._
    val df = spark.createDataset(Seq(
      (10L, 1L, 0L, "x"), (11L, 1L, 0L, "y"), (12L, 1L, 0L, "z")))
      .toDF("event_id", "user_id", "sec", "event_type")
      .selectExpr("event_id", "user_id", "timestamp_seconds(sec) AS ts", "event_type")
    val got = Features.eventTransitions(df)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("x", "y"), ("y", "z")))
  }
}
