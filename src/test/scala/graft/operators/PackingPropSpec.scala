package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property tests for document chunking: for ANY document length and any
  * (maxTokens, overlap) the emitted windows must tile the token stream
  * exactly — full coverage in order, `overlap` shared tokens between
  * neighbors, no window past the end, and a last window that still
  * contributes new tokens. These are the invariants sequence packing and
  * context-window assembly rely on downstream.
  */
object PackingPropSpec extends Properties("Packing.chunkDocuments") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12) // each case runs Spark jobs

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-packing-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val params: Gen[(Int, Int, Int)] = for {
    max <- Gen.chooseNum(1, 12)
    overlap <- Gen.chooseNum(0, max - 1)
    nTokens <- Gen.chooseNum(0, 40)
  } yield (max, overlap, nTokens)

  property("chunks tile the token stream for any (maxTokens, overlap, len)") =
    forAll(params) { case (max, overlap, n) =>
      import spark.implicits._
      val tokens = (1 to n).map(i => s"w$i")
      val in = Seq((1L, tokens.mkString(" "))).toDF("doc_id", "text")
      val chunks = Packing.chunkDocuments(in, max, overlap)
        .collect().sortBy(_.getAs[Int]("chunk_id"))
        .map(r => (r.getAs[String]("chunk_text"), r.getAs[Int]("n_tokens")))
      val texts = chunks.map(_._1.split(" ").toSeq)
      if (n == 0) chunks.isEmpty
      else {
        val stride = max - overlap
        val starts = texts.indices.map(_ * stride)
        // declared n_tokens is the real window length; windows never
        // exceed maxTokens or run past the end
        chunks.forall { case (t, len) => t.split(" ").length == len } &&
        texts.forall(_.size <= max) &&
        // exact expected windows: slice(start, start+max) of the stream
        texts.zip(starts).forall { case (t, s0) =>
          t == tokens.slice(s0, s0 + max) } &&
        // in-order full coverage, nothing skipped between neighbors
        texts.flatten.distinct.toSeq == tokens.take(
          starts.last + texts.last.size) &&
        texts.flatten.distinct.length == n &&
        // the final window contributes at least one new token
        (texts.size == 1 || starts.last + overlap < n)
      }
    }
}
