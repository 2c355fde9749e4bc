package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: treat image/audio/video payloads as
 * opaque `binary` columns with typed metadata, and run
 * decode/feature-extract/frame-sample stages as batch-shaped
 * partition-local transforms.
 *
 * The IMAGE modality is decoded for real: `asMediaWithImages`
 * generates genuine PNG payloads (javax.imageio, in the JVM — no
 * native deps) and `decodeReal` parses them back with the actual
 * codec, reporting decoder-read dimensions and a decoded-raster
 * checksum. The container has no audio/video codecs, so those
 * modalities run `decodeStub`, a clearly-marked DETERMINISTIC FAKE
 * deriving "decoded" metadata arithmetically from the payload
 * bytes. Everything around both (the binary schema, fixed-size
 * chunking for shuffle-friendly payload movement, the mapPartitions
 * batch shape, partitioning) is real and tested; swapping the
 * remaining stub for a codec binding changes one function.
 *
 * Scale: payloads never pass through a groupBy — chunking is a
 * map-side explode with arithmetic bounds, and decode is
 * partition-local. Binary columns are opaque to the optimizer, so
 * metadata lives in separate columns where pruning/pushdown work.
 */
object Multimodal {

  val ChunkBytes = 4096

  /** Fake media record derived from the documents table: payload =
   * utf-8 bytes of the text (stands in for image/audio bytes),
   * media_type cycles deterministically. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"))

  /** Typed metadata without touching payload content downstream. */
  def withMeta(media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", octet_length(col("payload")))
      .withColumn("n_chunks", ceil(col("n_bytes") / lit(ChunkBytes.toDouble)).cast("long"))

  /** Fixed-size chunk rows (media_id, chunk_idx, chunk_len) — the
   * shuffle-safe representation for moving large payloads. */
  def chunks(media: DataFrame): DataFrame =
    withMeta(media)
      .select(col("media_id"), col("n_bytes"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("media_id"), col("chunk_idx"),
        least(lit(ChunkBytes.toLong),
          col("n_bytes") - col("chunk_idx") * ChunkBytes).as("chunk_len"))

  final case class MediaRow(media_id: Long, payload: Array[Byte], media_type: String)
  final case class DecodedRow(media_id: Long, media_type: String,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** asMedia's media_type cycle, as a plain function: doc_id % 3 ->
   * image / audio / video. */
  def mediaTypeOf(id: Long): String = (id % 3) match {
    case 0 => "image"
    case 1 => "audio"
    case _ => "video"
  }

  /** A real `w` x `h` PNG, every pixel the gray level `c` — encoded
   * by the JVM's own codec (javax.imageio), so downstream decode
   * exercises a genuine image parser, not arithmetic. The in-memory
   * cache flag avoids ImageIO's temp-file spill on executors. */
  def pngBytes(w: Int, h: Int, c: Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (c << 16) | (c << 8) | c
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos), "no PNG writer")
    bos.toByteArray
  }

  /** Media ingest with REAL image assets: image-typed rows carry an
   * actual PNG payload, generated deterministically per record
   * (width = 1 + n % 64, height = 1 + n % 48, gray level
   * media_id % 256, with n the utf-8 byte length of the source
   * text), while audio/video rows keep the opaque text-derived
   * payload. Per-record generation is partition-local batch work —
   * the shape a real asset fetch/transcode stage runs in. */
  def asMediaWithImages(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val mt = mediaTypeOf(id)
        val bytes = text.getBytes("UTF-8")
        val payload =
          if (mt == "image")
            pngBytes(1 + bytes.length % 64, 1 + bytes.length % 48, (id % 256).toInt)
          else bytes
        MediaRow(id, payload, mt)
      })
  }

  /** REAL decode for the image modality: javax.imageio parses the
   * PNG payload — width/height come from the decoder and the
   * checksum is the sum of decoded R+G+B over the raster, so a
   * corrupt payload or broken codec path fails loud (null decode
   * throws) or hash-mismatches (wrong pixels). audio/video rows run
   * the documented [[decodeStub]]. */
  def decodeReal(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      if (r.media_type == "image") {
        javax.imageio.ImageIO.setUseCache(false)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        if (img == null)
          throw new IllegalArgumentException(
            s"media ${r.media_id}: payload is not a decodable image")
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            x += 1
          }
          y += 1
        }
        DecodedRow(r.media_id, r.media_type, img.getWidth, img.getHeight, 1, sum)
      } else decodeStub(r)
    })
  }

  /** DETERMINISTIC FAKE decode — replace with a real codec binding in
   * production. Partition-local batch shape: one pass over the
   * payload bytes per record, no data movement. */
  def decodeStub(r: MediaRow): DecodedRow = {
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum += (r.payload(i) & 0xff).toLong; i += 1 }
    val n = r.payload.length
    DecodedRow(r.media_id, r.media_type,
      width = 64 + n % 577, height = 64 + n % 433,
      n_frames = if (r.media_type == "video") 1 + n % 25 else 1,
      checksum = sum)
  }

  /** The decode stage: typed mapPartitions over binary payloads (the
   * batch shape a pandas/Arrow UDF would have on the Python side). */
  def decodeAll(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("media_type"))
      .as[MediaRow]
      .mapPartitions(_.map(decodeStub))
  }

  /** Resize planning on decoded dimensions: scale to fit a target
   * square preserving aspect ratio — pure integer arithmetic
   * (floor(dim * target / max(w,h))), so the oracle reproduces it
   * exactly. The stub plans the geometry; a real codec binding would
   * consume (out_w, out_h) per payload. */
  def resizePlan(decoded: DataFrame, target: Int = 224): DataFrame =
    decoded
      .withColumn("m", greatest(col("width"), col("height")))
      .select(col("media_id"), col("width"), col("height"),
        floor(col("width") * target / col("m")).cast("long").as("out_w"),
        floor(col("height") * target / col("m")).cast("long").as("out_h"))

  final case class FeatureRow(media_id: Long, b0: Long, b1: Long, b2: Long,
      b3: Long, b4: Long, b5: Long, b6: Long, b7: Long)

  /** DETERMINISTIC FAKE feature extraction — an 8-bucket byte
   * histogram per payload (bucket = byte >> 5), the partition-local
   * batch shape a real embedding/feature model would run in. Integer
   * counts, so the oracle reproduces it from the payload's hex dump. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[FeatureRow] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("media_type"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val h = new Array[Long](8)
        var i = 0
        while (i < r.payload.length) {
          h((r.payload(i) & 0xff) >>> 5) += 1; i += 1
        }
        FeatureRow(r.media_id, h(0), h(1), h(2), h(3), h(4), h(5), h(6), h(7))
      })
  }

  /** Frame sampling on the fake-decoded stream: every 5th frame. */
  def sampleFrames(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    decodeAll(spark, media)
      .where(col("media_type") === "video")
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(5))).as("frame_idx"))
  }
}
