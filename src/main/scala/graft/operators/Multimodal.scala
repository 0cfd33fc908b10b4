package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (extension scope): media as opaque `binary`
  * columns with typed metadata, processed per-partition in batches — the
  * Scala-native equivalent of a Pandas-UDF/`mapInPandas` stage.
  *
  * The actual media decode is STUBBED (this container ships no image/audio
  * codecs — see the brief): [[decodeStub]] derives deterministic fake
  * dimensions/features from the bytes. Everything around it — the schema, the
  * binary column, the batch shape, the partition-parallel execution path — is
  * real, so swapping in a codec is a one-function change.
  */
object Multimodal {

  /** Typed metadata carried next to every blob. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("kind", StringType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  case class Decoded(media_id: Long, kind: String, n_bytes: Long,
                     width: Int, height: Int, checksum: String)

  /** Wrap a text corpus as a fake media table: bytes = UTF-8 content, kind
    * assigned deterministically. Stands in for `spark.read.format("binaryFile")`.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      when(col("doc_id") % 3 === 0, "image").when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"))

  /** Real header parse where the format allows it without a codec: BMP
    * stores int32-LE width/height at offsets 18/22 behind the "BM" magic.
    */
  private[operators] def parseBmpDims(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes != null && bytes.length >= 26 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) {
      def i32le(o: Int): Int =
        (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
          ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      Some((i32le(18), math.abs(i32le(22)))) // height may be negative (top-down)
    } else None

  /** Decode: parses real BMP headers; other formats fall to the ??? stub —
    * a real implementation would call an image/audio codec on `bytes` (none
    * ships in this container). The stub derives deterministic
    * pseudo-dimensions so the downstream plumbing stays fully exercisable.
    */
  def decodeStub(id: Long, kind: String, bytes: Array[Byte]): Decoded = {
    val n = if (bytes == null) 0L else bytes.length.toLong
    val h = java.util.Arrays.hashCode(bytes)
    val (w, ht) = parseBmpDims(bytes).getOrElse(
      (64 + math.floorMod(h, 1024), 64 + math.floorMod(h >> 10, 1024)))
    Decoded(id, kind, n, width = w, height = ht, checksum = f"${h}%08x")
  }

  /** Batch decode: per-partition iteration (the `mapInPandas` analogue) —
    * codec state could be initialized once per partition here.
    */
  def decodeAll(media: DataFrame): Dataset[Decoded] = {
    val enc = Encoders.product[Decoded]
    media.select("media_id", "kind", "content")
      .mapPartitions { rows =>
        // per-partition codec init would go here
        rows.map(r => decodeStub(r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)))
      }(enc)
  }

  /** Frame-sampling stub: emit every k-th "frame" (chunk) of a blob as its own
    * row — the explode-shaped stage a video pipeline needs; chunking is real,
    * frame decode is the stub.
    */
  def sampleFrames(media: DataFrame, chunkBytes: Int, everyK: Int): DataFrame =
    media.select(col("media_id"), col("kind"),
      posexplode(split(base64(col("content")), s"(?<=\\G.{${chunkBytes * 4 / 3}})"))
        .as(Seq("frame_no", "frame_b64")))
      .filter(col("frame_no") % everyK === 0)
}
