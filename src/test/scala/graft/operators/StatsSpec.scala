package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.math.{BigDecimal => JBigDecimal}

/** Stats family: heavy hitters (exact set + sketch coverage), exact
  * fixed-point embedding moments, grouped Pearson from DECIMAL moments.
  */
class StatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-stats-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def pairsDf(rows: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).toDF("k")
  }

  // ------------------------------------------------------------ cmsBounds

  test("cmsBounds: exact hitters carried, every CMS estimate inside the envelope") {
    // same data shape as the heavyHitters spec: a(40) b(25) clear the
    // invSupport=5 cut, c(20) exactly at 20% does not
    val rows = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(20)("c") ++
      (1 to 15).map(i => s"s$i")
    val out = Stats.cmsBounds(pairsDf(rows), "k", invSupport = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(out.map(t => (t._1, t._2)).toSeq == Seq(("a", 40L), ("b", 25L)))
    assert(out.forall(_._3), "CMS must not leave its one-sided error bound")
  }

  test("cmsBounds: numeric key columns keep insert/probe type parity") {
    // regression (ADVICE r9): the sketch used to build over the raw LONG
    // column (long hash path) but probe with the key cast to string
    // (UTF-8 hash path) — estimates were garbage for any non-string key.
    import spark.implicits._
    val rows: Seq[Long] = Seq.fill(40)(1000000007L) ++ Seq.fill(25)(42L) ++
      (1 to 15).map(i => 100L + i)
    val out = Stats.cmsBounds(spark.createDataset(rows).toDF("k"), "k",
        invSupport = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq(("1000000007", 40L), ("42", 25L)))
    assert(out.forall(_._3),
      "one-sided envelope must hold for numeric keys too")
  }

  // --------------------------------------------------------- labelOutliers

  test("labelOutliers flags the vector pointing away from its label centroid") {
    import spark.implicits._
    // label 0: three vectors near +x, one at -x (the mislabel); label 1:
    // two near +y — nothing flagged there
    val emb = Seq(
      (1L, Array(1.0f, 0.1f), 0), (2L, Array(0.9f, 0.0f), 0),
      (3L, Array(1.0f, -0.1f), 0), (4L, Array(-1.0f, 0.0f), 0),
      (10L, Array(0.0f, 1.0f), 1), (11L, Array(0.1f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Stats.labelOutliers(emb)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSeq == Seq((4L, 0)))
  }

  test("labelOutliers: threshold is exclusive and respects minCos") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    // centroid = (0.5, 0.5): both vectors sit at cos ≈ 0.707 — nothing
    // below 0, everything below 0.8
    assert(Stats.labelOutliers(emb).count() == 0)
    assert(Stats.labelOutliers(emb, minCos = 0.8).count() == 2)
  }

  // ---------------------------------------------------------- heavyHitters

  test("heavyHitters emits exactly the above-threshold keys, all covered") {
    // 100 rows: "a"×40, "b"×25, "c"×20, 15 singletons. invSupport=5
    // (support 20%) → threshold cnt*5 > 100 ⇒ cnt > 20: a and b qualify,
    // c (exactly 20% — strict inequality) does not.
    val rows = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(20)("c") ++
      (1 to 15).map(i => s"s$i")
    val out = Stats.heavyHitters(pairsDf(rows), "k", invSupport = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(out.map(t => (t._1, t._2)).toSeq == Seq(("a", 40L), ("b", 25L)))
    // freqItems' no-false-negative guarantee: every exact hitter is covered
    assert(out.forall(_._3))
  }

  test("heavyHitters threshold is integer-exact (no float boundary)") {
    // 6 rows, invSupport=3: threshold cnt*3 > 6 ⇒ cnt >= 3. "x"×3 is
    // above (9 > 6); "y"×2 (6 > 6 false) is not.
    val out = Stats.heavyHitters(
      pairsDf(Seq("x", "x", "x", "y", "y", "z")), "k", invSupport = 3L)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("x"))
  }

  test("heavyHitters rejects invSupport < 2") {
    intercept[IllegalArgumentException] {
      Stats.heavyHitters(pairsDf(Seq("a")), "k", invSupport = 1L)
    }
  }

  // ------------------------------------------------------ embeddingDimStats

  test("embeddingDimStats computes exact micro-unit moments per dim") {
    import spark.implicits._
    val emb = spark.createDataset(Seq(
      (1L, Seq(1.0f, -0.5f)),
      (2L, Seq(3.0f, 0.25f)),
      (3L, Seq(-2.0f, 0.75f)))).toDF("id", "embedding")
    val r = Stats.embeddingDimStats(emb).orderBy("dim").collect()
    assert(r.length == 2)
    // dim 0: micro units 1e6, 3e6, -2e6 → sum 2e6, sumsq 14e12
    assert(r(0).getAs[Long]("n") == 3L)
    assert(r(0).getAs[JBigDecimal]("sum_micro").longValueExact == 2000000L)
    assert(r(0).getAs[JBigDecimal]("sumsq_micro").longValueExact == 14000000000000L)
    assert(r(0).getAs[Long]("min_micro") == -2000000L)
    assert(r(0).getAs[Long]("max_micro") == 3000000L)
    assert(math.abs(r(0).getAs[Double]("mean") - 0.666667) < 1e-9)
    // dim 1: -0.5, 0.25, 0.75 → sum 0.5e6
    assert(r(1).getAs[JBigDecimal]("sum_micro").longValueExact == 500000L)
  }

  test("embeddingDimStats moments are partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (i.toLong, Seq(i * 0.001f, -i * 0.002f)))
    val emb1 = spark.createDataset(rows).toDF("id", "embedding").repartition(1)
    val emb7 = spark.createDataset(rows).toDF("id", "embedding").repartition(7)
    val a = Stats.embeddingDimStats(emb1).orderBy("dim")
      .collect().map(_.toString).toSeq
    val b = Stats.embeddingDimStats(emb7).orderBy("dim")
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  // ------------------------------------------------------ groupedCorrelation

  test("groupedCorrelation matches closed-form r on exact integers") {
    import spark.implicits._
    // group g: y = 2x exactly → r = 1; group h: y = -x → r = -1
    val df = spark.createDataset(Seq(
      ("g", 1L, 2L), ("g", 2L, 4L), ("g", 3L, 6L),
      ("h", 1L, -1L), ("h", 2L, -2L), ("h", 5L, -5L))).toDF("grp", "x", "y")
    val r = Stats.groupedCorrelation(df, Seq("grp"), "x", "y")
      .orderBy("grp").collect()
    assert(r(0).getAs[Double]("corr") == 1.0)
    assert(r(1).getAs[Double]("corr") == -1.0)
    // exact moments for g: Σx=6, Σy=12, Σxx=14, Σyy=56, Σxy=28
    assert(r(0).getAs[JBigDecimal]("sum_xy").longValueExact == 28L)
    assert(r(0).getAs[JBigDecimal]("sum_yy").longValueExact == 56L)
  }

  // -------------------------------------------------------- labelCentroids

  test("labelCentroids computes exact per-label micro sums") {
    import spark.implicits._
    val emb = spark.createDataset(Seq(
      (0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, -1.0f)), (1, Seq(0.5f, 0.5f))))
      .toDF("label", "embedding")
    val r = Stats.labelCentroids(emb).orderBy("label", "dim").collect()
    assert(r.length == 4)
    // label 0 dim 0: 1e6 + 3e6 = 4e6, centroid 2.0
    assert(r(0).getAs[JBigDecimal]("sum_micro").longValueExact == 4000000L)
    assert(r(0).getAs[Double]("centroid") == 2.0)
    // label 0 dim 1: 2e6 - 1e6 = 1e6, centroid 0.5
    assert(r(1).getAs[JBigDecimal]("sum_micro").longValueExact == 1000000L)
    assert(r(1).getAs[Double]("centroid") == 0.5)
    // label 1: single vector — centroid equals the vector
    assert(r(2).getAs[Double]("centroid") == 0.5)
    assert(r(2).getAs[Long]("n") == 1L)
  }

  // ------------------------------------------------------ categoricalDrift

  test("categoricalDrift zero-fills one-sided keys and sums to chi2") {
    import spark.implicits._
    val a = spark.createDataset(
      Seq.fill(30)("x") ++ Seq.fill(10)("y")).toDF("k")
    val b = spark.createDataset(
      Seq.fill(10)("x") ++ Seq.fill(30)("y") ++ Seq.fill(10)("z")).toDF("k")
    val r = Stats.categoricalDrift(a, b, "k").orderBy("k").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("x", "y", "z"))
    // z only in b: zero-filled on a's side
    assert(r(2).getAs[Long]("n_a") == 0L && r(2).getAs[Long]("n_b") == 10L)
    // hand-computed 2x3 chi-square: totals a=40, b=50, grand=90
    // x: row 40, e_a=40*40/90, e_b=40*50/90; etc.
    def term(na: Double, nb: Double): Double = {
      val (ta, tb, g) = (40.0, 50.0, 90.0)
      val (ea, eb) = ((na + nb) * ta / g, (na + nb) * tb / g)
      math.pow(na - ea, 2) / ea + math.pow(nb - eb, 2) / eb
    }
    assert(math.abs(r(0).getAs[Double]("chi2_term") - term(30, 10)) < 1e-5)
    assert(math.abs(r(2).getAs[Double]("chi2_term") - term(0, 10)) < 1e-5)
  }

  test("categoricalDrift on identical slices gives chi2 ~ 0") {
    import spark.implicits._
    val a = spark.createDataset(Seq("p", "p", "q", "r")).toDF("k")
    val r = Stats.categoricalDrift(a, a, "k").collect()
    assert(r.forall(_.getAs[Double]("chi2_term") == 0.0))
  }

  // ------------------------------------------------------------ topFraction

  test("topFraction keeps ceil(frac*n) rows plus cutoff ties") {
    import spark.implicits._
    // scores: 10 docs — 9,8,7,7,7,5,4,3,2,1. frac=0.3 → target 3; the
    // cutoff score is 7 (cum at 7 is 5 ≥ 3), ties included → 5 kept.
    val df = spark.createDataset(
      Seq(9, 8, 7, 7, 7, 5, 4, 3, 2, 1).zipWithIndex.map {
        case (s, i) => (i.toLong, s)
      }).toDF("doc_id", "score")
    val kept = Stats.topFraction(df, "score", 0.3)
      .select("doc_id", "score").collect().map(_.getInt(1)).sorted.toSeq
    assert(kept == Seq(7, 7, 7, 8, 9))
  }

  test("topFraction frac=1 keeps everything; invalid frac rejected") {
    import spark.implicits._
    val df = spark.createDataset((1 to 20).map(i => (i.toLong, i % 5)))
      .toDF("doc_id", "score")
    assert(Stats.topFraction(df, "score", 1.0).count() == 20L)
    intercept[IllegalArgumentException] { Stats.topFraction(df, "score", 0.0) }
    intercept[IllegalArgumentException] { Stats.topFraction(df, "score", 1.1) }
  }

  test("quantileBins matches the closed-form cumBefore formula") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 997).map(i => (i.toLong, rnd.nextInt(37)))
    val df = spark.createDataset(rows).toDF("doc_id", "score")
    val got = Stats.quantileBins(df, "score", 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("bin")).toMap
    val n = rows.size
    def bin(s: Int): Int =
      math.min(9, 10 * rows.count(_._2 < s) / n)
    rows.foreach { case (id, s) =>
      assert(got(id) == bin(s), s"doc $id score $s")
    }
    assert(got.size == n)
    // monotone in score: a higher score never lands in a lower bin
    val byScore = rows.map { case (id, s) => s -> got(id) }.distinct.sortBy(_._1)
    assert(byScore.map(_._2) == byScore.map(_._2).sorted)
  }

  test("quantileBins drops null scores and keeps ties in one bin") {
    import spark.implicits._
    val df = Seq((1L, Some(5)), (2L, Some(5)), (3L, None), (4L, Some(9)))
      .toDF("doc_id", "score")
    val got = Stats.quantileBins(df, "score", 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("bin")).toMap
    assert(got.keySet == Set(1L, 2L, 4L), "null-score row dropped")
    assert(got(1L) == got(2L), "tied scores share a bin")
    assert(got(4L) > got(1L))
    intercept[IllegalArgumentException] { Stats.quantileBins(df, "score", 1) }
  }

  test("groupedMedian computes the exact lower median per group") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (1 to 900).map(i => (s"g${i % 4}", rnd.nextInt(25)))
    val df = spark.createDataset(rows).toDF("grp", "score")
    val got = Stats.groupedMedian(df, Seq("grp"), "score")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_._1).foreach { case (g, members) =>
      val sorted = members.map(_._2.toLong).sorted
      // lower median: smallest score s with 2*|{x <= s}| >= n
      val lower = sorted((sorted.size - 1) / 2)
      assert(got(g) == (lower, sorted.size.toLong), s"group $g")
    }
  }

  test("groupedMedian: even-sized group takes the lower middle, nulls drop") {
    import spark.implicits._
    val df = Seq(("a", Some(1)), ("a", Some(2)), ("a", Some(3)), ("a", Some(4)),
      ("a", None)).toDF("grp", "score")
    val r = Stats.groupedMedian(df, Seq("grp"), "score").collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 4L)
  }

  test("topFraction matches a brute-force sort baseline on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 1000).map(i => (i.toLong, rnd.nextInt(50)))
    val df = spark.createDataset(rows).toDF("doc_id", "score")
    val kept = Stats.topFraction(df, "score", 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // brute force: sort desc, take ceil(0.25*1000)=250, extend through ties
    val sorted = rows.sortBy(-_._2)
    val cutoff = sorted(249)._2
    val expected = rows.filter(_._2 >= cutoff).map(_._1).toSet
    assert(kept == expected)
  }

  test("groupedCorrelation agrees with Spark's corr() to float tolerance") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 2000).map { i =>
      val x = rnd.nextInt(1000).toLong
      ("g", x, x * 3 + rnd.nextInt(200).toLong)
    }
    val df = spark.createDataset(rows).toDF("grp", "x", "y")
    val exact = Stats.groupedCorrelation(df, Seq("grp"), "x", "y")
      .collect()(0).getAs[Double]("corr")
    val builtin = df.agg(corr(col("x").cast("double"), col("y").cast("double")))
      .collect()(0).getDouble(0)
    assert(math.abs(exact - builtin) < 1e-6)
  }

  // ---------------------------------------------------------- numericDrift

  private def scoresDf(vs: Seq[Long]) = {
    import spark.implicits._
    vs.toDF("score")
  }

  test("numericDrift: identical slices are zero-drift in equi-depth bins") {
    val a = scoresDf(1L to 100L)
    val out = Stats.numericDrift(a, scoresDf(1L to 100L), "score", 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(0, 1, 2, 3))
    assert(out.forall(t => t._2 == 25L && t._3 == 25L && t._4 == 0.0))
  }

  test("numericDrift: baseline edges cover unseen current scores at both ends") {
    val a = scoresDf(1L to 100L)
    val b = scoresDf(Seq(-50L, -1L, 1000L, 2000L, 3000L))
    val out = Stats.numericDrift(a, b, "score", 4)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    // below-baseline-min lands in bin 0, above-max in the top bin
    assert(out(0) == 2L && out(3) == 3L)
  }

  test("numericDrift: a mega-tie skips bins but ids stay contiguous on both sides") {
    // 90 copies of 5 jump the cumulative count past several boundaries:
    // fewer edges, contiguous ids, both slices binned identically
    val a = scoresDf(Seq.fill(90)(5L) ++ (6L to 15L))
    val out = Stats.numericDrift(a, a, "score", 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    assert(out.map(_._1) == out.indices.map(identity).toSeq,
      s"bin ids must be contiguous, got ${out.map(_._1)}")
    assert(out.map(_._2).sum == 100L)
    assert(out.forall(t => t._2 == t._3 && t._4 == 0.0))
  }

  // ----------------------------------------------------------- madOutliers

  test("madOutliers flags planted spikes; medians stay anchored by clean mass") {
    import spark.implicits._
    // clean mass 1..100 (median 50, MAD 25), two planted spikes
    val df = ((1L to 100L).map(i => (i, "g", i)) ++
      Seq((900L, "g", 10000L), (901L, "g", -10000L)))
      .toDF("id", "grp", "v")
    val out = Stats.madOutliers(df, Seq("grp"), "v", "id", k = 5L)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    // lower median of 102 values stays 50; MAD stays 25; only the spikes
    // clear 5*25
    assert(out.map(_._1) == Seq(900L, 901L))
    assert(out.forall(_._3 == 25L))
  }

  test("madOutliers: degenerate MAD=0 flags any nonzero deviation; nulls drop") {
    import spark.implicits._
    val df = (Seq.fill(10)(7L).zipWithIndex.map { case (v, i) => (i.toLong, "g", Some(v)) } ++
      Seq((100L, "g", Some(8L)), (101L, "g", Option.empty[Long])))
      .toDF("id", "grp", "v")
    val out = Stats.madOutliers(df, Seq("grp"), "v", "id", k = 5L)
      .collect().map(_.getLong(1)).toSeq
    assert(out == Seq(100L))
  }

  // --------------------------------------------------------------- profile

  private def profileDf = {
    import spark.implicits._
    spark.createDataset(Seq(
      (1L, Some("a")), (2L, Some("a")), (3L, Some("b")),
      (4L, None), (5L, None), (6L, Some("c")))).toDF("id", "cat")
  }

  test("profile: exact row/null/ndv/min/max per column from one scan") {
    val out = Stats.profile(profileDf, Seq("id", "cat"), "t")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getString(6)))
      .sortBy(_._1).toSeq
    assert(out == Seq(
      ("cat", 6L, 2L, 3L, "a", "c"),
      ("id", 6L, 0L, 6L, "1", "6")))
  }

  test("profile: approx mode plans no Expand and stays inside HLL rsd") {
    val exactPlan = Stats.profile(profileDf, Seq("id", "cat"), "t")
      .queryExecution.executedPlan.toString
    val approxDf = Stats.profile(profileDf, Seq("id", "cat"), "t",
      exact = false)
    val approxPlan = approxDf.queryExecution.executedPlan.toString
    // exact multi-distinct pays Expand (row duplication x cols) — the
    // documented trade; the scale path must NOT
    assert(exactPlan.contains("Expand"))
    assert(!approxPlan.contains("Expand"))
    val nd = approxDf.collect()
      .map(r => r.getString(1) -> r.getLong(4)).toMap
    // default rsd 0.05; tiny cardinalities are exact in practice — allow
    // a generous envelope so the assertion pins sanity, not sketch noise
    assert(math.abs(nd("id") - 6L) <= 2 && math.abs(nd("cat") - 3L) <= 2)
  }
}
