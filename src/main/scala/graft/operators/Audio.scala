package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Audio-column handling: PCM WAV as an opaque `BINARY` column decoded to
  * per-clip features — the audio leg of the multimodal pipeline
  * ([[Multimodal]] covers images/containers; this covers waveforms).
  *
  * [[wavStats]] is a REAL RIFF/WAVE parser from the published byte layout
  * (RIFF header, chunk walk with even padding, `fmt ` PCM fields, `data`
  * payload as little-endian int16 frames) — no codec library needed for
  * uncompressed PCM, so unlike compressed audio this path ships fully
  * real in this container. The features are the standard audio-curation
  * gate inputs: duration, peak/energy, clipping, and windowed
  * silence — what a speech-data pipeline filters on before expensive
  * transcription (cf. whisper-style pipelines dropping silent/clipped
  * clips).
  *
  * Scale posture: decode runs per-partition via mapPartitions; audio
  * bytes never shuffle (only the fixed-width stats row survives the
  * projection); per-row memory is O(1) — samples are STREAMED out of the
  * byte array (running max/sum/window accumulators), never materialized
  * as an array. Malformed/truncated/non-PCM bytes degrade to
  * `decode_ok = false` with null stats, never a partition failure.
  *
  * All emitted statistics are exact integers (sums/counts/integer-floor
  * duration), so results hash-gate cross-engine with no float rendering
  * hazard.
  */
object Audio {

  /** Schema of [[wavStats]] output. */
  def wavStatsSchema(idType: DataType): StructType = StructType(Seq(
    StructField("media_id", idType),
    StructField("decode_ok", BooleanType),
    StructField("sample_rate", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("n_samples", LongType),   // frames per channel
    StructField("duration_ms", LongType), // floor(frames*1000/rate)
    StructField("peak_abs", LongType),
    StructField("sum_abs", LongType),
    StructField("sum_sq", LongType),
    StructField("clip_count", LongType),  // samples at int16 full scale
    StructField("n_windows", LongType),
    StructField("silent_windows", LongType)))

  /** Decode PCM16 WAV bytes to per-clip stats.
    *
    * Chunk walk per the RIFF spec: `RIFF <u32le size> WAVE`, then
    * `<id:4><u32le size><payload, padded to even>` chunks in ANY order —
    * real files carry `LIST`/`INFO`/`fact` chunks between `fmt ` and
    * `data`, so a fixed-44-byte-header reader is wrong; this walks.
    * Requires `fmt ` audio_format = 1 (PCM) and bits_per_sample = 16;
    * anything else (compressed, float, 8/24-bit) → `decode_ok = false`.
    *
    * Windowed silence: frames are grouped into consecutive windows of
    * `windowFrames` (the last window may be partial); a window is silent
    * when max(|sample|) over ALL channels in the window < `silenceFloor`.
    * `clip_count` counts samples at int16 full scale (32767 / -32768).
    *
    * Multi-channel: `n_samples`/windows count FRAMES;
    * peak/sum/clip stats run over all interleaved samples.
    */
  def wavStats(media: DataFrame, idCol: String = "media_id",
      bytesCol: String = "bytes", windowFrames: Int = 64,
      silenceFloor: Int = 512): DataFrame = {
    require(windowFrames > 0, "need windowFrames > 0")
    val idType = media.schema(idCol).dataType
    val out = wavStatsSchema(idType)
    val idIdx = media.schema.fieldIndex(idCol)
    val bIdx = media.schema.fieldIndex(bytesCol)
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.get(idIdx)
        val b = r.getAs[Array[Byte]](bIdx)
        val bad = Row(id, false, null, null, null, null, null, null, null,
          null, null, null)
        def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
        def u32(i: Int): Long =
          (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
          ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
        def tag(i: Int, s: String): Boolean =
          i + 4 <= b.length &&
            (0 until 4).forall(k => b(i + k) == s.charAt(k).toByte)
        try {
          if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) bad
          else {
            // chunk walk: find fmt and data
            var pos = 12
            var fmtAt = -1; var fmtLen = 0L; var dataAt = -1; var dataLen = 0L
            var walking = true
            while (walking && pos + 8 <= b.length && (fmtAt < 0 || dataAt < 0)) {
              val sz = u32(pos + 4)
              if (tag(pos, "fmt ")) { fmtAt = pos + 8; fmtLen = sz }
              else if (tag(pos, "data")) { dataAt = pos + 8; dataLen = sz }
              // chunks pad to even length per the RIFF spec; a declared
              // size past the buffer is a corrupt/hostile header — stop
              // walking rather than wrap the Int and loop
              if (sz > b.length.toLong) walking = false
              else pos += 8 + sz.toInt + (sz.toInt & 1)
            }
            // the fmt chunk must DECLARE >= 16 bytes (PCM header size):
            // a malformed size < 16 would otherwise read rate/bits from
            // the following chunk's bytes — plausible garbage with
            // decode_ok = true instead of the documented degrade
            if (fmtAt < 0 || dataAt < 0 || fmtLen < 16 ||
              fmtAt + 16 > b.length) bad
            else {
              val fmt = u16(fmtAt); val nCh = u16(fmtAt + 2)
              val rate = u32(fmtAt + 4).toInt; val bits = u16(fmtAt + 14)
              val avail = math.min(dataLen, (b.length - dataAt).toLong)
              if (fmt != 1 || bits != 16 || nCh < 1 || rate <= 0) bad
              else {
                val nSamp = (avail / 2L).toInt        // int16 samples
                val nFrames = nSamp / nCh
                var peak = 0L; var sAbs = 0L; var sSq = 0L; var clip = 0L
                var nWin = 0L; var silent = 0L
                var winMax = 0L; var inWin = 0
                var f = 0
                while (f < nFrames) {
                  var c = 0
                  while (c < nCh) {
                    val i = dataAt + 2 * (f * nCh + c)
                    val v = ((b(i) & 0xff) | (b(i + 1) << 8)).toShort.toLong
                    val a = math.abs(v)
                    if (a > peak) peak = a
                    sAbs += a; sSq += v * v
                    if (v == 32767L || v == -32768L) clip += 1
                    if (a > winMax) winMax = a
                    c += 1
                  }
                  inWin += 1
                  if (inWin == windowFrames) {
                    nWin += 1; if (winMax < silenceFloor) silent += 1
                    winMax = 0L; inWin = 0
                  }
                  f += 1
                }
                if (inWin > 0) {
                  nWin += 1; if (winMax < silenceFloor) silent += 1
                }
                Row(id, true, rate, nCh, nFrames.toLong,
                  nFrames.toLong * 1000L / rate, peak, sAbs, sSq, clip,
                  nWin, silent)
              }
            }
          }
        } catch { case _: Exception => bad } // truncated mid-field
      }
    }(RowEncoder.encoderFor(out))
  }

  /** Synthetic REAL-WAV media from the documents fixture: each doc_id
    * becomes a mono PCM16 WAV whose samples are md5-derivable from the
    * id (digest bytes of `"id:block"` read as little-endian int16, 8
    * samples per block — the [[Multimodal.syntheticGridImagesFromDocs]]
    * discipline applied to waveforms), so DuckDB can recompute every
    * statistic without parsing a byte and the driver hash-gates a
    * genuine WAV encode → chunk-walk → decode cycle.
    *
    * Planted structure the gate pins:
    *   - length:      `doc_id % 120 + 40` frames (partial last window)
    *   - sample rate: 8 kHz / 16 kHz by id parity (duration math)
    *   - silence:     ids ≡ 3 (mod 23) get frames 0..63 zeroed (one
    *     fully silent window); clipping is planted AFTER silence, so
    *     clip wins where both land
    *   - clipping:    ids ≡ 2 (mod 37) get 32767 at every 50th frame
    *   - chunk walk:  ids ≡ 0 (mod 5) carry a LIST/INFO junk chunk
    *     between `fmt ` and `data` — a fixed-offset reader fails here
    */
  def syntheticWavFromDocs(docs: DataFrame): DataFrame = {
    val idIdx = docs.schema.fieldIndex("doc_id")
    val out = StructType(Seq(
      StructField("media_id", docs.schema("doc_id").dataType),
      StructField("bytes", BinaryType)))
    docs.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(idIdx)
        val n = (id % 120 + 40).toInt
        val rate = if (id % 2 == 0) 8000 else 16000
        val samples = new Array[Short](n)
        var blk = 0
        while (blk * 8 < n) {
          md.reset()
          val d = md.digest(s"$id:$blk".getBytes("UTF-8"))
          var o = 0
          while (o < 8 && blk * 8 + o < n) {
            samples(blk * 8 + o) =
              ((d(2 * o) & 0xff) | ((d(2 * o + 1) & 0xff) << 8)).toShort
            o += 1
          }
          blk += 1
        }
        // planted silence FIRST, clip SECOND (clip wins on overlap) —
        // the oracle CASE mirrors this precedence
        if (id % 23 == 3) {
          var i = 0
          while (i < n && i < 64) { samples(i) = 0; i += 1 }
        }
        if (id % 37 == 2) {
          var i = 0
          while (i < n) { samples(i) = 32767; i += 50 }
        }
        val junk = id % 5 == 0
        val junkLen = if (junk) 12 else 0 // LIST chunk: hdr 8 + "INFO"
        val bos = new java.io.ByteArrayOutputStream(44 + junkLen + 2 * n)
        val o = new java.io.DataOutputStream(bos)
        def u16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
        def u32(v: Long): Unit = {
          o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
          o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
        }
        o.writeBytes("RIFF"); u32(36L + junkLen + 2L * n); o.writeBytes("WAVE")
        o.writeBytes("fmt "); u32(16L)
        u16(1); u16(1); u32(rate.toLong); u32(rate.toLong * 2); u16(2); u16(16)
        if (junk) { o.writeBytes("LIST"); u32(4L); o.writeBytes("INFO") }
        o.writeBytes("data"); u32(2L * n)
        var i = 0
        while (i < n) { u16(samples(i) & 0xffff); i += 1 }
        Row(r.get(idIdx), bos.toByteArray)
      }
    }(RowEncoder.encoderFor(out))
  }
}
