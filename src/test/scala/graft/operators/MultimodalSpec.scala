package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Multimodal plumbing: stub-decode contract (header fields, rolling
  * checksum), frame sampling bounds. The decode oracle in SparkEntry covers
  * the SQL-derivable features; the checksum — the one engine-side value —
  * is pinned here.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-multimodal-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("decodeBytesStub parses the fake header and rolls a stable checksum") {
    // header: 'F','!', width=258 (0x02,0x01), height=64, frames=3
    val bytes = Array[Byte]('F', '!', 2, 1, 64, 0, 3, 0, 'p', 'a', 'y')
    val (n, sum, (mime, w, h, f)) = Multimodal.decodeBytesStub(bytes)
    assert(n == 11 && mime == "image/fake" && w == 258 && h == 64 && f == 3)
    val expected = bytes.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
    assert(sum == expected)
    // headerless bytes: octet-stream, zero dims, frames floor to 1
    val (_, _, (m2, w2, _, f2)) = Multimodal.decodeBytesStub(Array[Byte](1, 2))
    assert(m2 == "application/octet-stream" && w2 == 0 && f2 == 1)
  }

  test("decode runs partition-wise and matches the per-byte checksum") {
    import spark.implicits._
    val docs = Seq((1L, "hello media"), (2L, "x")).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val decoded = Multimodal.decode(Multimodal.fakeMediaFromDocs(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    // recompute expected checksum from the same fake-header contract
    def fake(nChars: Int, text: String): Array[Byte] =
      Array[Byte]('F', '!', (nChars % 256).toByte, ((nChars / 256) % 256).toByte,
        64, 0, (nChars % 7 + 1).toByte, 0) ++ text.getBytes("UTF-8")
    val b1 = fake(11, "hello media")
    assert(decoded(1L).getAs[Int]("n_bytes") == b1.length)
    assert(decoded(1L).getAs[Long]("checksum") ==
      b1.foldLeft(0L)((a, b) => a * 31 + (b & 0xff)))
    assert(decoded(1L).getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width") == 11)
  }

  test("sampleFrames emits at most maxFrames evenly spaced indexes") {
    import spark.implicits._
    val docs = Seq((1L, "a" * 20)).toDF("doc_id", "text") // n_frames = 20%7+1 = 7
      .withColumn("n_chars", length(col("text")).cast("long"))
    val frames = Multimodal.sampleFrames(
      Multimodal.decode(Multimodal.fakeMediaFromDocs(docs)), maxFrames = 4)
      .select("frame_index").collect().map(_.getInt(0)).toSeq
    assert(frames == Seq(0, 1, 3, 5)) // i * 7/4 truncated, 4 frames
  }
}
