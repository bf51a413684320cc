package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: Dedup.repeatedSubstringSpans must equal an O(n²)
  * brute-force reference of the Lee et al. 2022 definition — a char is
  * duplicated iff some corpus `minLen`-gram covering it occurs ≥ 2 times
  * (other document OR another offset of the same document), and the
  * emitted spans are the maximal contiguous runs of duplicated chars
  * (1-based, inclusive). A tiny alphabet plus planted cross-doc and
  * within-doc repeats makes overlap merging, island splitting, and
  * same-doc repetition dense; the brute force recomputes the covered-char
  * set by literal substring counting, so a rolling-hash defect, a
  * confirm-join defect, or a gaps-and-islands off-by-one all fail here.
  */
object ExactSubstrPropSpec extends Properties("Dedup.repeatedSubstringSpans") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10) // each case runs a multi-stage Spark job

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-exactsubstr-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // small alphabet → repeats arise naturally; chunks + planted motifs →
  // long shared runs that must merge into single spans
  private val motif: Gen[String] =
    Gen.oneOf("abcabc", "xyzxyzxyz", "aaaa", "abab")
  private val chunk: Gen[String] = for {
    n <- Gen.chooseNum(0, 10)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'x'))
  } yield cs.mkString
  private val doc: Gen[String] = for {
    parts <- Gen.chooseNum(1, 4)
    ps <- Gen.listOfN(parts, Gen.frequency(3 -> chunk, 2 -> motif))
  } yield ps.mkString

  /** Maximal 1-based inclusive spans of the duplicated-window char union. */
  private def ref(texts: Seq[(Long, String)], minLen: Int)
      : Set[(Long, Long, Long, Long)] = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    for ((_, t) <- texts; i <- 0 to t.length - minLen)
      counts.updateWith(t.substring(i, i + minLen))(c => Some(c.getOrElse(0) + 1))
    texts.flatMap { case (id, t) =>
      val covered = Array.fill(t.length)(false)
      for (i <- 0 to t.length - minLen
           if counts(t.substring(i, i + minLen)) > 1;
           j <- i until i + minLen) covered(j) = true
      val spans = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
      var i = 0
      while (i < t.length) {
        if (covered(i)) {
          var j = i
          while (j < t.length && covered(j)) j += 1
          spans += ((id, (i + 1).toLong, j.toLong, (j - i).toLong))
          i = j
        } else i += 1
      }
      spans
    }.toSet
  }

  property("equals the O(n^2) brute-force duplicated-window union") =
    forAll(
      Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, doc)),
      Gen.chooseNum(2, 5)) { (texts, minLen) =>
      import spark.implicits._
      val ids = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val docs = spark.createDataset(ids).toDF("doc_id", "text")
      val got = Dedup.repeatedSubstringSpans(docs, minLen = minLen)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
          r.getAs[Long]("span_end"), r.getAs[Long]("span_len")))
        .toSet
      val want = ref(ids, minLen)
      val ok = got == want
      if (!ok) println(s"MISMATCH minLen=$minLen texts=$ids\n" +
        s" engine=${got.toSeq.sorted}\n ref=${want.toSeq.sorted}")
      ok
    }
}
