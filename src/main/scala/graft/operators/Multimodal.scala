package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video as opaque `BINARY`
  * columns with typed metadata structs.
  *
  * The decode step is a clearly-marked deterministic STUB (the real codecs
  * are not in this container); everything around it — the schema contract,
  * the mapPartitions batch shape, partition preservation, and the
  * explode-style frame sampling — is the real Spark plumbing a production
  * decode would use. Swap [[decodeBytesStub]] for a JNI/codec call and the
  * pipeline is unchanged.
  *
  * Scale notes: decode runs per-partition with no shuffle; metadata
  * extraction keeps binary columns out of the shuffle path (only small
  * structs survive projection); frame sampling multiplies rows by
  * `maxFrames` at most, declared up front.
  */
object Multimodal {

  /** Typed metadata carried alongside media bytes. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Schema of a decoded-features row. */
  def decodedSchema(idType: DataType): StructType = StructType(Seq(
    StructField("media_id", idType),
    StructField("n_bytes", IntegerType),
    StructField("checksum", LongType),
    StructField("meta", mediaMetaSchema)))

  /** STUB decode ??? — deterministic fake standing in for an image/audio
    * codec: derives metadata from a fake 8-byte header (w, h, frames as
    * 16-bit LE ints) and a rolling checksum of the payload. Replace with a
    * real decoder; the signature (bytes → features) is the contract.
    */
  def decodeBytesStub(bytes: Array[Byte]): (Int, Long, (String, Int, Int, Int)) = {
    def u16(i: Int): Int =
      if (bytes.length >= i + 2) ((bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)) else 0
    var checksum = 0L
    var i = 0
    while (i < bytes.length) { checksum = checksum * 31 + (bytes(i) & 0xff); i += 1 }
    val mime = if (bytes.length >= 2 && bytes(0) == 'F'.toByte) "image/fake" else "application/octet-stream"
    (bytes.length, checksum, (mime, u16(2), u16(4), math.max(u16(6), 1)))
  }

  /** Decode a binary column partition-wise (no shuffle, no Python): the
    * Scala analog of a pandas-UDF `mapInPandas` decode stage.
    */
  def decode(media: DataFrame, idCol: String = "media_id", bytesCol: String = "bytes"): DataFrame = {
    val idType = media.schema(idCol).dataType
    val out = decodedSchema(idType)
    val idIdx = media.schema.fieldIndex(idCol)
    val bIdx = media.schema.fieldIndex(bytesCol)
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](bIdx)
        val (n, sum, (mime, w, h, f)) = decodeBytesStub(bytes)
        Row(r.get(idIdx), n, sum, Row(mime, w, h, f))
      }
    }(RowEncoder.encoderFor(out))
  }

  /** Frame sampling for "video" media: emit up to `maxFrames` evenly-spaced
    * frame indexes per media row (explode — the only row-multiplying step,
    * bounded by construction). The frame decode itself is the same stub.
    */
  def sampleFrames(decoded: DataFrame, maxFrames: Int = 4): DataFrame =
    decoded.select(
      col("media_id"), col("meta"),
      explode(expr(
        s"""transform(
           |  sequence(0, least(meta.n_frames - 1, ${maxFrames - 1})),
           |  i -> CAST(i * greatest(meta.n_frames / $maxFrames, 1) AS INT))""".stripMargin))
        .as("frame_index"))

  /** Build a fake media table from the documents fixture: text bytes with a
    * fake header prepended. Deterministic; exists so the multimodal
    * plumbing has data to run against in this container.
    */
  def fakeMediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      // header: 'F','!', width(LE16)=n_chars, height(LE16)=64, frames(LE16)
      expr(
        """concat(
          |  unhex('4621'),
          |  unhex(lpad(hex(n_chars % 256), 2, '0')),
          |  unhex(lpad(hex(CAST(n_chars / 256 AS INT) % 256), 2, '0')),
          |  unhex('4000'),
          |  unhex(lpad(hex(n_chars % 7 + 1), 2, '0')),
          |  unhex('00'),
          |  encode(text, 'utf-8'))""".stripMargin).as("bytes"))
}
