package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (extension scope): media as opaque `binary`
  * columns with typed metadata, processed per-partition in batches — the
  * Scala-native equivalent of a Pandas-UDF/`mapInPandas` stage.
  *
  * Image decode is REAL: `javax.imageio` ships with this JRE's
  * `java.desktop` module (PNG/JPEG/GIF/BMP/TIFF readers), so
  * [[decode]] reads true dimensions from any supported format —
  * header-only via `ImageReader` (no pixel decode in the metadata path),
  * with a hand-rolled BMP header parse as the zero-codec fast path.
  * Full pixel decode backs [[imageFeatures]] (mean channel stats) and
  * [[resizeImages]]. Blobs no reader recognizes (audio/video codecs do NOT
  * ship in this container, and the harness media table wraps UTF-8 text)
  * fall back to deterministic pseudo-dimensions so the downstream plumbing
  * stays fully exercisable on the synthetic tables.
  */
object Multimodal {

  /** Typed metadata carried next to every blob. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("kind", StringType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  case class Decoded(media_id: Long, kind: String, format: String, n_bytes: Long,
                     width: Int, height: Int, checksum: String)

  case class ImageFeatures(media_id: Long, format: String, width: Int, height: Int,
                           mean_r: Double, mean_g: Double, mean_b: Double,
                           mean_luma: Double)

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

  /** Real header parse with zero codec machinery: BMP stores int32-LE
    * width/height at offsets 18/22 behind the "BM" magic.
    */
  private[operators] def parseBmpDims(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes != null && bytes.length >= 26 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) {
      def i32le(o: Int): Int =
        (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
          ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      Some((i32le(18), math.abs(i32le(22)))) // height may be negative (top-down)
    } else None

  /** Header-only dimension read via `javax.imageio` — finds a reader by
    * magic bytes and asks for width/height WITHOUT decoding pixels (codecs
    * read just the header for `getWidth`/`getHeight`). Returns
    * (width, height, formatName) or None for unrecognized blobs.
    */
  private[operators] def parseImageDims(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    if (bytes == null || bytes.length < 8) return None
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
    val iis = javax.imageio.ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          Some((r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase))
        } finally r.dispose()
      }
    } catch { case _: Exception => None } finally iis.close()
  }

  /** Decode one blob's metadata. Real path first (ImageIO header read, then
    * the codec-free BMP parse); unrecognized bytes (no audio/video codec in
    * this container; harness blobs are UTF-8 text) get deterministic
    * pseudo-dimensions so the plumbing stays exercisable.
    */
  def decode(id: Long, kind: String, bytes: Array[Byte]): Decoded = {
    val n = if (bytes == null) 0L else bytes.length.toLong
    val h = java.util.Arrays.hashCode(bytes)
    val (w, ht, fmt) = parseImageDims(bytes)
      .orElse(parseBmpDims(bytes).map { case (a, b) => (a, b, "bmp") })
      .getOrElse((64 + math.floorMod(h, 1024), 64 + math.floorMod(h >> 10, 1024), "opaque"))
    Decoded(id, kind, fmt, n, width = w, height = ht, checksum = f"${h}%08x")
  }

  /** Back-compat alias for the round-1 name (the stub is now only the
    * unrecognized-format fallback inside [[decode]]).
    */
  def decodeStub(id: Long, kind: String, bytes: Array[Byte]): Decoded = decode(id, kind, bytes)

  /** Batch metadata decode: per-partition iteration (the `mapInPandas`
    * analogue); header-only reads, so cost is O(rows), not O(pixels).
    */
  def decodeAll(media: DataFrame): Dataset[Decoded] = {
    val enc = Encoders.product[Decoded]
    media.select("media_id", "kind", "content")
      .mapPartitions { rows =>
        rows.map(r => decode(r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)))
      }(enc)
  }

  /** Full pixel decode + feature extraction (mean RGB / luminance) for blobs
    * ImageIO can read; unrecognized blobs are DROPPED (this is the
    * image-only feature stage). Per-partition batch shape — one
    * `BufferedImage` at a time, nothing driver-side.
    */
  def imageFeatures(media: DataFrame): Dataset[ImageFeatures] = {
    val enc = Encoders.product[ImageFeatures]
    media.select("media_id", "content")
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          if (r.isNullAt(1)) Iterator.empty
          else {
            val bytes = r.getAs[Array[Byte]](1)
            val img =
              try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
              catch { case _: Exception => null }
            if (img == null) Iterator.empty
            else {
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val p = img.getRGB(x, y)
                  sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                  x += 1
                }
                y += 1
              }
              val npx = img.getWidth.toLong * img.getHeight
              val (mr, mg, mb) = (sr.toDouble / npx, sg.toDouble / npx, sb.toDouble / npx)
              val fmt = parseImageDims(bytes).map(_._3).getOrElse("unknown")
              Iterator.single(ImageFeatures(r.getLong(0), fmt, img.getWidth, img.getHeight,
                mr, mg, mb, 0.2126 * mr + 0.7152 * mg + 0.0722 * mb))
            }
          }
        }
      }(enc)
  }

  /** Real resize: decode → bilinear scale to (w, h) → re-encode PNG.
    * Returns (media_id, content=resized PNG bytes); unreadable blobs are
    * dropped. Narrow, per-partition, codegen-adjacent — the standard
    * image-normalization stage of a multimodal training pipeline.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content")
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          if (r.isNullAt(1)) Iterator.empty
          else {
            val img =
              try javax.imageio.ImageIO.read(new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
              catch { case _: Exception => null }
            if (img == null) Iterator.empty
            else {
              val out = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              Iterator.single((r.getLong(0), bos.toByteArray))
            }
          }
        }
      }.toDF("media_id", "content")
  }

  /** Frame-sampling stub: emit every k-th "frame" (chunk) of a blob as its own
    * row — the explode-shaped stage a video pipeline needs; chunking is real,
    * frame decode is the stub (no video codec ships in this container).
    */
  def sampleFrames(media: DataFrame, chunkBytes: Int, everyK: Int): DataFrame =
    media.select(col("media_id"), col("kind"),
      posexplode(split(base64(col("content")), s"(?<=\\G.{${chunkBytes * 4 / 3}})"))
        .as(Seq("frame_no", "frame_b64")))
      .filter(col("frame_no") % everyK === 0)

  // ------------------------------------------------------------ audio (WAV)
  //
  // RIFF/WAVE is a public container (Microsoft/IBM 1991 spec): little-endian
  // chunks, a `fmt ` chunk carrying rate/channels/bits and a `data` chunk
  // whose size over block-align is the sample count. Header-only metadata —
  // the audio analogue of the PNG/BMP dimension reads: real parse, O(bytes
  // scanned) per blob, no codec library needed for PCM headers.

  final case class WavMeta(media_id: Long, sample_rate: Int, channels: Int,
                           bits: Int, n_samples: Long, duration_ms: Double)

  /** A real minimal PCM WAV file: RIFF header + `fmt ` + zero-filled `data`.
    * Used by specs/fixtures to exercise [[parseWavMeta]] with genuine bytes.
    */
  def wavBytes(sampleRate: Int, channels: Int, bits: Int,
               nSamples: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataSize = nSamples * blockAlign
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    buf.array()
  }

  /** Header-only WAV metadata: (sampleRate, channels, bits, nSamples), or
    * None for non-RIFF/truncated bytes. Walks the chunk list, so extra
    * chunks (LIST/INFO) before `data` parse fine; a missing `fmt ` or
    * `data` chunk is malformed.
    */
  private[operators] def parseWavMeta(bytes: Array[Byte])
      : Option[(Int, Int, Int, Long)] = {
    if (bytes == null || bytes.length < 44) return None
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
    }
    if (fourcc() != "RIFF") return None
    b.getInt // riff size
    if (fourcc() != "WAVE") return None
    var fmt: Option[(Int, Int, Int, Int)] = None // rate, ch, bits, blockAlign
    var nSamples: Option[Long] = None
    while ((fmt.isEmpty || nSamples.isEmpty) && b.remaining() >= 8) {
      val id = fourcc(); val size = b.getInt
      if (size < 0 || size > b.remaining()) return None
      val next = b.position() + size + (size & 1) // chunks are word-aligned
      if (id == "fmt " && size >= 16) {
        b.getShort // audio format
        val ch = b.getShort.toInt
        val rate = b.getInt
        b.getInt // byte rate
        val blockAlign = b.getShort.toInt
        val bits = b.getShort.toInt
        fmt = Some((rate, ch, bits, blockAlign))
      } else if (id == "data") {
        fmt.foreach { case (_, _, _, ba) =>
          if (ba > 0) nSamples = Some(size.toLong / ba)
        }
        if (fmt.isEmpty) return None // data before fmt: malformed for PCM
      }
      b.position(math.min(next, b.limit()))
    }
    for ((rate, ch, bits, _) <- fmt; n <- nSamples) yield (rate, ch, bits, n)
  }

  /** Batch audio-metadata decode — the per-partition codec stage for
    * `(media_id, content: binary)` frames; unparseable blobs are dropped
    * (this is the audio-only stage, like [[imageFeatures]] for images).
    */
  def audioMeta(media: DataFrame): Dataset[WavMeta] = {
    val enc = Encoders.product[WavMeta]
    media.select("media_id", "content")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          parseWavMeta(bytes).map { case (rate, ch, bits, n) =>
            WavMeta(r.getLong(0), rate, ch, bits, n,
              n.toDouble * 1000.0 / rate)
          }
        }
      }(enc)
  }
}
