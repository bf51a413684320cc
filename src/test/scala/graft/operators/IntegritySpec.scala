package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Referential-integrity audit, CDC apply, and prefix-filtered exact
  * Jaccard — the round-9 additions. Each test pins the semantics the
  * driver oracle cannot exercise on the (consistent, null-free) fixtures:
  * real orphans and null fks for the audit, tie-resolution and
  * delete-of-nonexistent for the CDC fold, and losslessness against an
  * in-process brute force for the prefix filter.
  */
class IntegritySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-integrity-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // ------------------------------------------------------------- fkAudit

  private def auditRow(child: Seq[Option[Long]], parent: Seq[Long]) = {
    import spark.implicits._
    val c = spark.createDataset(child).toDF("fk")
    val p = spark.createDataset(parent).toDF("pk")
    Integrity.fkAudit(c, "fk", p, "pk", "t").collect().head
  }

  test("fkAudit counts orphans, nulls, and unreferenced parents") {
    // child rows: 1,1,2,99,99,99,null — parent keys 1,2,3,4
    // orphans: key 99 (3 rows); nulls: 1 row; unreferenced: 3 and 4
    val r = auditRow(
      Seq(Some(1L), Some(1L), Some(2L), Some(99L), Some(99L), Some(99L), None),
      Seq(1L, 2L, 3L, 4L))
    assert(r.getAs[Long]("child_rows") == 7L)
    assert(r.getAs[Long]("null_fk_rows") == 1L)
    assert(r.getAs[Long]("orphan_rows") == 3L)
    assert(r.getAs[Long]("orphan_keys") == 1L)
    assert(r.getAs[Long]("parent_keys") == 4L)
    assert(r.getAs[Long]("unreferenced_parent_keys") == 2L)
  }

  test("fkAudit: null fk is counted, never misreported as an orphan") {
    val r = auditRow(Seq(None, None), Seq(1L))
    assert(r.getAs[Long]("child_rows") == 2L)
    assert(r.getAs[Long]("null_fk_rows") == 2L)
    assert(r.getAs[Long]("orphan_rows") == 0L)
    assert(r.getAs[Long]("orphan_keys") == 0L)
    assert(r.getAs[Long]("unreferenced_parent_keys") == 1L)
  }

  test("fkAudit on an empty child is all-zero except parent coverage") {
    val r = auditRow(Seq.empty, Seq(1L, 2L))
    assert(r.getAs[Long]("child_rows") == 0L)
    assert(r.getAs[Long]("orphan_rows") == 0L)
    assert(r.getAs[Long]("unreferenced_parent_keys") == 2L)
  }

  // ------------------------------------------------------------- pkAudit

  test("pkAudit: dup keys, worst multiplicity, and null key parts") {
    import spark.implicits._
    // key "a"×3, "b"×1, null×2 → 3 groups (nulls group together),
    // 2 dup keys (a and the null group), 5 dup rows, worst 3
    val df = Seq(Some("a"), Some("a"), Some("a"), Some("b"), None, None)
      .toDF("k")
    val r = Integrity.pkAudit(df, Seq("k"), "t").collect().head
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("dup_keys") == 2L)
    assert(r.getAs[Long]("dup_rows") == 5L)
    assert(r.getAs[Long]("max_multiplicity") == 3L)
    assert(r.getAs[Long]("null_key_rows") == 2L)
  }

  test("pkAudit: composite key — partial nulls are distinct groups") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("x")), (Some(1L), Some("x")),
      (Some(1L), None), (None, Some("x"))).toDF("k1", "k2")
    val r = Integrity.pkAudit(df, Seq("k1", "k2"), "t").collect().head
    assert(r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("dup_keys") == 1L)
    assert(r.getAs[Long]("max_multiplicity") == 2L)
    assert(r.getAs[Long]("null_key_rows") == 2L)
  }

  // -------------------------------------------------------- applyChanges

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def changesDf(rows: Seq[(Long, Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "seq", "op", "text")
  }

  test("applyChanges: kept / updated / inserted / deleted, all four") {
    val base = docsDf(Seq(1L -> "one", 2L -> "two", 3L -> "three"))
    val ch = changesDf(Seq(
      (2L, 1L, "upsert", "two-v2"),
      (3L, 1L, "delete", null),
      (4L, 1L, "upsert", "four")))
    val out = CorpusPipeline.applyChanges(base, ch)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "one", "kept"), (2L, "two-v2", "updated"), (4L, "four", "inserted")))
  }

  test("applyChanges: greatest (seq, op) wins within an id") {
    val base = docsDf(Seq(1L -> "one", 2L -> "two"))
    val ch = changesDf(Seq(
      // id 1: upsert at seq 2, delete at seq 3 → deleted
      (1L, 2L, "upsert", "one-v2"), (1L, 3L, "delete", null),
      // id 2: delete at seq 2, upsert at seq 3 → the later upsert wins
      (2L, 2L, "delete", null), (2L, 3L, "upsert", "two-v3")))
    val out = CorpusPipeline.applyChanges(base, ch)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq.sortBy(_._1) == Seq((2L, "two-v3", "updated")))
  }

  test("applyChanges: same-seq tie resolves upsert over delete") {
    val base = docsDf(Seq(1L -> "one"))
    val ch = changesDf(Seq(
      (1L, 5L, "delete", null), (1L, 5L, "upsert", "one-v5")))
    val out = CorpusPipeline.applyChanges(base, ch).collect()
    assert(out.length == 1 && out.head.getString(1) == "one-v5")
  }

  test("applyChanges: delete of a nonexistent id is a no-op, not an insert") {
    val base = docsDf(Seq(1L -> "one"))
    val ch = changesDf(Seq((9L, 1L, "delete", null)))
    val out = CorpusPipeline.applyChanges(base, ch)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq == Seq((1L, "kept")))
  }

  // ----------------------------------------------------------- skewAudit

  private def keyedDf(keys: Seq[Long]): DataFrame = {
    import spark.implicits._
    keys.toDF("k")
  }

  test("skewAudit: uniform keys are gini 0; a hot key moves every statistic") {
    // uniform: 5 keys x2 rows
    val uni = Integrity.skewAudit(
      keyedDf((1L to 5L).flatMap(i => Seq(i, i))), Seq("k"), "u").head()
    assert(uni.getAs[Long]("n_rows") == 10L && uni.getAs[Long]("n_keys") == 5L)
    assert(uni.getAs[Long]("max_freq") == 2L &&
      uni.getAs[Long]("p99_freq") == 2L)
    assert(uni.getAs[Double]("gini") == 0.0)
    // hot: freqs [1,1,1,7] => S = 1*(1+2+3) + 7*4 = 34, K=4, N=10,
    // gini = (68-50)/40 = 0.45; top1 = 700000
    val hot = Integrity.skewAudit(
      keyedDf(Seq(1L, 2L, 3L) ++ Seq.fill(7)(9L)), Seq("k"), "h").head()
    assert(hot.getAs[Long]("max_freq") == 7L)
    assert(hot.getAs[Long]("top1_share_micro") == 700000L)
    assert(hot.getAs[Long]("p99_freq") == 7L)
    assert(hot.getAs[Double]("gini") == 0.45)
  }

  // --------------------------------------------------------- scd2History

  private def scd2Rows(ch: DataFrame) =
    CorpusPipeline.scd2History(ch)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .sortBy(t => (t._1, t._3)).toSeq

  test("scd2History: versions chain, delete closes, re-insert opens a new current") {
    val ch = changesDf(Seq(
      (1L, 1L, "upsert", "a1"), (1L, 2L, "upsert", "a2"),
      (2L, 1L, "upsert", "b1"), (2L, 2L, "delete", null),
      (3L, 1L, "upsert", "c1"), (3L, 2L, "delete", null),
      (3L, 3L, "upsert", "c3")))
    assert(scd2Rows(ch) == Seq(
      (1L, "a1", 1L, 2L, false), (1L, "a2", 2L, -1L, true),
      (2L, "b1", 1L, 2L, false),
      (3L, "c1", 1L, 2L, false), (3L, "c3", 3L, -1L, true)))
  }

  test("scd2History: a delete-only id emits nothing; intervals never overlap") {
    val ch = changesDf(Seq(
      (9L, 1L, "delete", null),
      (1L, 1L, "upsert", "a1"), (1L, 3L, "upsert", "a3"),
      (1L, 2L, "upsert", "a2")))
    val rows = scd2Rows(ch)
    assert(rows == Seq(
      (1L, "a1", 1L, 2L, false), (1L, "a2", 2L, 3L, false),
      (1L, "a3", 3L, -1L, true)))
    // interval chain: each valid_to equals the next valid_from
    rows.sliding(2).foreach {
      case Seq((_, _, _, to, _), (_, _, from, _, _)) => assert(to == from)
      case _ =>
    }
  }

  // -------------------------------------------------- jaccardPrefixPairs

  /** Brute-force distinct-3-gram Jaccard over a tiny corpus, in-process —
    * the reference the prefix filter must reproduce EXACTLY (losslessness
    * is the operator's whole contract).
    */
  private def bruteJaccard(
      corpus: Seq[(Long, String)], t: Double): Set[(Long, Long, Double)] = {
    def sh(s: String): Set[String] = {
      val tk = s.toLowerCase.split(" +").filter(_.nonEmpty)
      if (tk.length < 3) {
        if (tk.isEmpty) Set.empty else Set(tk.mkString(" "))
      } else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = corpus.map { case (id, s) => id -> sh(s) }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      j = BigDecimal(inter.toDouble / (sa.size + sb.size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= t
    } yield (a, b, j)).toSet
  }

  test("jaccardPrefixPairs equals brute force on a boilerplate-heavy corpus") {
    // 8 docs share a hot boilerplate sentence (its shingles are frequent →
    // pushed OUT of prefixes); two near-dup pairs and one exact-dup pair
    // must still surface via their RARE shingles.
    val boiler = "terms of service apply to all users of this site"
    val corpus: Seq[(Long, String)] =
      (0L until 8L).map(i => i -> s"$boiler unique tail number $i marker") ++
      Seq(
        10L -> "the quick brown fox jumps over the lazy dog tonight",
        11L -> "the quick brown fox jumps over the lazy dog today",
        12L -> "an entirely different document about spark physical plans",
        13L -> "an entirely different document about spark physical plans",
        14L -> "short text")
    val expected = bruteJaccard(corpus, 0.7)
    import spark.implicits._
    val out = Dedup.jaccardPrefixPairs(corpus.toDF("doc_id", "text"),
        threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == expected)
    // the designed positives actually exist — the test isn't vacuous
    assert(expected.exists(p => p._1 == 10L && p._2 == 11L))
    assert(expected.contains((12L, 13L, 1.0)))
  }

  test("jaccardPrefixPairs at threshold 1.0 finds exactly the exact dups") {
    val corpus: Seq[(Long, String)] = Seq(
      1L -> "alpha beta gamma delta epsilon", 2L -> "alpha beta gamma delta epsilon",
      3L -> "alpha beta gamma delta zeta")
    import spark.implicits._
    val out = Dedup.jaccardPrefixPairs(corpus.toDF("doc_id", "text"),
        threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)))
  }
}
