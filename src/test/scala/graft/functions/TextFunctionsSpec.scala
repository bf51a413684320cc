package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class TextFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-textfunctions-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Straight-line reference implementation of the documented contract. */
  private def refWinnow(s: String, k: Int, w: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    if (cps.length < k) return Seq.empty
    val hs = cps.sliding(k).map(gram =>
      gram.drop(1).foldLeft(gram.head.toLong)((acc, c) =>
        (acc * 257L + c) % 2147483647L)).toArray
    val nW = math.max(1, hs.length - w + 1)
    (0 until nW).map(j => hs.slice(j, j + w).min).distinct.sorted
  }

  private def winnowOf(text: String, k: Int, w: Int): Seq[Long] = {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(text).toDF("t")
      .selectExpr(s"text_winnow(t, $k, $w) AS fps")
      .collect().head.getSeq[Long](0)
  }

  test("gram_hashes: rolling hash equals direct per-gram hash; equal grams collide") {
    GraftFunctions.register(spark)
    import spark.implicits._
    def direct(s: String, k: Int): Seq[Long] = {
      val cps = s.codePoints().toArray
      if (cps.length < k) Seq.empty
      else cps.sliding(k).map(_.foldLeft(0L)((acc, c) => acc * 1000003L + c)).toSeq
    }
    val texts = Seq("abcdefghij", "shared-block-xyz and shared-block-xyz again",
      "aaaaaaaaaa", "sh", "", "unicode: éé café café!")
    for (t <- texts; k <- Seq(2, 4, 7)) {
      val got = Seq(t).toDF("text")
        .select(expr(s"gram_hashes(text, $k)")).collect()(0)
        .getSeq[Long](0)
      assert(got == direct(t, k), s"k=$k text='$t'")
    }
    // identical grams at different offsets hash identically (the
    // prefilter property repeatedSubstringSpans relies on)
    val hs = direct("shared-block-xyz and shared-block-xyz again", 16)
    assert(hs(0) == hs(21))
  }

  test("text_winnow matches the reference fold on assorted inputs") {
    for (s <- Seq(
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaa",
        "ab",
        "",
        "exactly-k-chars!!",
        "unicode: 你好世界 mixed ascii and cjk text here")) {
      assert(winnowOf(s, 5, 4) == refWinnow(s, 5, 4), s"mismatch for '$s'")
      assert(winnowOf(s, 3, 8) == refWinnow(s, 3, 8), s"mismatch for '$s' k=3 w=8")
    }
  }

  test("text_winnow edge contract: short texts") {
    // under k codepoints -> empty; k <= len < k+w-1 -> one window over all
    assert(winnowOf("abcd", 5, 4).isEmpty)
    val one = winnowOf("abcdef", 5, 4) // 2 hashes, 1 window
    assert(one.size == 1 && one == refWinnow("abcdef", 5, 4))
  }

  test("shared substring of length >= k+w-1 implies a shared fingerprint") {
    // the MOSS guarantee the dedup operator relies on
    val shared = "this exact boilerplate sentence is long enough to matter"
    val a = s"prefix junk one $shared suffix A"
    val b = s"completely different lead-in $shared other tail"
    val fa = winnowOf(a, 20, 16).toSet
    val fb = winnowOf(b, 20, 16).toSet
    assert(shared.length >= 20 + 16 - 1)
    assert((fa & fb).nonEmpty, "shared substring must produce a shared fingerprint")
    // disjoint texts share nothing at this k
    val fc = winnowOf("zq " * 30, 20, 16).toSet
    assert((fa & fc).isEmpty)
  }
}
