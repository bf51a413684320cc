package graft.operators

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: Audio.wavStats must agree with an independent
  * plain-Scala reference on random PCM16 clips across channel counts,
  * sample rates, window sizes, silence floors, planted silent spans and
  * full-scale samples, and junk LIST chunks between `fmt ` and `data`.
  * The WAV bytes here are built by an INDEPENDENT writer (not
  * [[Audio.syntheticWavFromDocs]]), so an encode-side bug cannot cancel
  * a decode-side one. Malformed inputs (garbage, truncation mid-header,
  * non-PCM format, float bits, hostile chunk sizes) must degrade to
  * decode_ok = false — never throw, never loop.
  */
object AudioPropSpec extends Properties("Audio.wavStats") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12) // each case runs a Spark job

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-audio-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Little-endian WAV writer, independent of the fixture generator. */
  private def buildWav(samples: Array[Short], nCh: Int, rate: Int,
      junkChunk: Boolean): Array[Byte] = {
    val junkLen = if (junkChunk) 12 else 0
    val bos = new java.io.ByteArrayOutputStream()
    def w(v: Int): Unit = bos.write(v & 0xff)
    def u16(v: Int): Unit = { w(v); w(v >> 8) }
    def u32(v: Long): Unit = {
      w(v.toInt); w((v >> 8).toInt); w((v >> 16).toInt); w((v >> 24).toInt)
    }
    def tag(s: String): Unit = s.foreach(c => w(c.toInt))
    tag("RIFF"); u32(36L + junkLen + 2L * samples.length); tag("WAVE")
    tag("fmt "); u32(16L); u16(1); u16(nCh); u32(rate.toLong)
    u32(rate.toLong * 2 * nCh); u16(2 * nCh); u16(16)
    if (junkChunk) { tag("LIST"); u32(4L); tag("INFO") }
    tag("data"); u32(2L * samples.length)
    samples.foreach(s => u16(s & 0xffff))
    bos.toByteArray
  }

  /** Plain-Scala stats reference over the raw samples. */
  private def ref(samples: Array[Short], nCh: Int, rate: Int,
      winFrames: Int, floor: Int) = {
    val nFrames = samples.length / nCh
    val used = samples.take(nFrames * nCh).map(_.toLong)
    val peak = if (used.isEmpty) 0L else used.map(math.abs).max
    val sAbs = used.map(math.abs).sum
    val sSq = used.map(v => v * v).sum
    val clip = used.count(v => v == 32767L || v == -32768L).toLong
    val wins = (0 until nFrames).grouped(winFrames).toVector
    val silent = wins.count { fs =>
      fs.flatMap(f => (0 until nCh).map(c => math.abs(used(f * nCh + c)))).
        foldLeft(0L)(math.max) < floor
    }.toLong
    (nFrames.toLong, nFrames.toLong * 1000L / rate, peak, sAbs, sSq, clip,
      wins.size.toLong, silent)
  }

  private val sampleGen: Gen[Short] = Gen.frequency(
    6 -> Gen.chooseNum(-32768, 32767).map(_.toShort),
    2 -> Gen.chooseNum(-400, 400).map(_.toShort), // near-silence
    1 -> Gen.const(32767.toShort), 1 -> Gen.const((-32768).toShort))

  private val mediaSchema = StructType(Seq(
    StructField("media_id", LongType), StructField("bytes", BinaryType)))

  private def stats(rows: Seq[(Long, Array[Byte])], winFrames: Int,
      floor: Int): Map[Long, Row] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, b) => Row(i, b) }, 2),
      mediaSchema)
    Audio.wavStats(df, windowFrames = winFrames, silenceFloor = floor)
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
  }

  property("matches the plain-Scala reference on every column") =
    forAll(
      Gen.chooseNum(1, 4).flatMap(k => Gen.listOfN(k, for {
        n <- Gen.chooseNum(0, 300)
        ss <- Gen.listOfN(n, sampleGen)
        ch <- Gen.chooseNum(1, 3)
        rate <- Gen.oneOf(8000, 16000, 44100)
        junk <- Gen.oneOf(true, false)
      } yield (ss.toArray, ch, rate, junk))),
      Gen.chooseNum(1, 90), Gen.chooseNum(0, 40000)) { (clips, win, floor) =>
      val rows = clips.zipWithIndex.map { case ((ss, ch, rate, junk), i) =>
        (i.toLong, buildWav(ss, ch, rate, junk))
      }
      val got = stats(rows, win, floor)
      clips.zipWithIndex.forall { case ((ss, ch, rate, _), i) =>
        val row = got(i.toLong)
        val (nf, dur, peak, sAbs, sSq, clip, nw, sil) =
          ref(ss, ch, rate, win, floor)
        val ok = row.getAs[Boolean]("decode_ok") &&
          row.getAs[Int]("sample_rate") == rate &&
          row.getAs[Int]("n_channels") == ch &&
          row.getAs[Long]("n_samples") == nf &&
          row.getAs[Long]("duration_ms") == dur &&
          row.getAs[Long]("peak_abs") == peak &&
          row.getAs[Long]("sum_abs") == sAbs &&
          row.getAs[Long]("sum_sq") == sSq &&
          row.getAs[Long]("clip_count") == clip &&
          row.getAs[Long]("n_windows") == nw &&
          row.getAs[Long]("silent_windows") == sil
        if (!ok) println(s"MISMATCH clip=$i ch=$ch rate=$rate win=$win " +
          s"floor=$floor n=${ss.length}\n engine=$row\n " +
          s"ref=($nf,$dur,$peak,$sAbs,$sSq,$clip,$nw,$sil)")
        ok
      }
    }

  property("malformed bytes degrade to decode_ok=false, never throw") = {
    val good = buildWav(Array[Short](1, 2, 3, 4), 1, 8000, junkChunk = false)
    val cases: Seq[(Long, Array[Byte])] = Seq(
      1L -> Array[Byte](),                          // empty
      2L -> "not a wav at all".getBytes("UTF-8"),   // garbage
      3L -> good.take(10),                          // truncated header
      4L -> good.take(30),                          // truncated fmt
      5L -> { val b = good.clone(); b(20) = 3; b }, // format=3 (float)
      6L -> { val b = good.clone(); b(34) = 8; b }, // 8-bit
      7L -> { // hostile chunk size (u32 max) between fmt and data
        val b = buildWav(Array[Short](1, 2), 1, 8000, junkChunk = true)
        b(40) = -1; b(41) = -1; b(42) = -1; b(43) = -1; b
      },
      8L -> good,
      9L -> { // fmt chunk DECLARING size 0: the 16 header bytes at fmtAt
        // belong to the NEXT chunk, crafted here so they parse as
        // plausible PCM (fmt=1, ch=1, rate=16, bits=16) — without the
        // fmtLen >= 16 guard this decodes to garbage with decode_ok=true
        val bb = java.nio.ByteBuffer.allocate(56)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(48)
          .put("WAVE".getBytes("US-ASCII"))
        bb.put("fmt ".getBytes("US-ASCII")).putInt(0) // declared size 0
        bb.put(Array[Byte](1, 0, 1, 0)).putInt(16)    // fake tag + size
        val payload = new Array[Byte](16)
        payload(6) = 16 // lands at offset 34 = the "bits" field
        bb.put(payload)
        bb.put("data".getBytes("US-ASCII")).putInt(4)
          .putShort(100.toShort).putShort(-200.toShort)
        bb.array()
      })
    val got = stats(cases, 64, 512)
    (1L to 7L).forall(i => !got(i).getAs[Boolean]("decode_ok")) &&
      !got(9L).getAs[Boolean]("decode_ok") &&
      got(8L).getAs[Boolean]("decode_ok") &&
      got(8L).getAs[Long]("n_samples") == 4L
  }

  property("truncated data payload uses only the available samples") = {
    val full = buildWav(Array[Short](100, -200, 300, -400, 500, -600),
      1, 8000, junkChunk = false)
    val cut = full.take(full.length - 5) // drop last 2.5 samples
    val got = stats(Seq(1L -> cut), 2, 512)(1L)
    got.getAs[Boolean]("decode_ok") &&
      got.getAs[Long]("n_samples") == 3L &&
      got.getAs[Long]("peak_abs") == 300L &&
      got.getAs[Long]("n_windows") == 2L
  }
}
