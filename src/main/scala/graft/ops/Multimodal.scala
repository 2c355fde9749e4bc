package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: treat image/audio/video payloads as
 * opaque `binary` columns with typed metadata, and run
 * decode/feature-extract/frame-sample stages as batch-shaped
 * partition-local transforms.
 *
 * All THREE modalities are decoded for real: `asMediaWithImages`
 * generates genuine PNG payloads (javax.imageio), genuine WAV
 * payloads (javax.sound.sampled — the JVM's own RIFF/WAVE codec,
 * used for BOTH encode and decode), and genuine Y4M video payloads
 * (the plain YUV4MPEG2 container: text header + FRAME-delimited raw
 * 4:2:0 planes, parsed back by a real header/frame walker).
 * `decodeReal` reports decoder-read dimensions/sample counts and a
 * decoded-content checksum, so a corrupt payload or a broken codec
 * path fails loud or hash-mismatches. `decodeStub` remains only as
 * the documented arithmetic fake for the text-payload pipelines
 * (resize planning / feature extraction), where the payload is an
 * opaque stand-in by design. Everything around the codecs (the
 * binary schema, fixed-size chunking for shuffle-friendly payload
 * movement, the mapPartitions batch shape, partitioning) is real
 * and tested.
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

  val WavSampleRate = 8000

  /** A real mono 16-bit PCM WAV of `n` samples, samples
   * s_i = (seed + i) % 256 - 128 — encoded by the JVM's own
   * RIFF/WAVE codec (javax.sound.sampled), so downstream decode
   * exercises the genuine audio container parser. */
  def wavBytes(n: Int, seed: Long): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      WavSampleRate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (((seed + i) % 256) - 128).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** A real YUV4MPEG2 (y4m) clip: plain-text stream header
   * (`YUV4MPEG2 W.. H.. F25:1 Ip A1:1 C420jpeg`), then per frame a
   * `FRAME` marker line followed by raw 4:2:0 planes
   * (w*h + 2*(w/2)*(h/2) bytes). Every plane byte of frame f is
   * (seed + f) % 256 — the decoder reads the actual bytes; the
   * oracle predicts the sum arithmetically. */
  def y4mBytes(w: Int, h: Int, frames: Int, seed: Long): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, "4:2:0 needs even dimensions")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII"))
    val planeBytes = w * h + 2 * (w / 2) * (h / 2)
    var f = 0
    while (f < frames) {
      bos.write("FRAME\n".getBytes("US-ASCII"))
      val b = ((seed + f) % 256).toInt
      val plane = new Array[Byte](planeBytes)
      java.util.Arrays.fill(plane, b.toByte)
      bos.write(plane)
      f += 1
    }
    bos.toByteArray
  }

  /** Media ingest with REAL assets in all three modalities,
   * generated deterministically per record from (media_id, n) with
   * n the utf-8 byte length of the source text — so the DuckDB
   * oracle predicts every decoder-read value arithmetically:
   *  - image: PNG, width 1 + n % 64, height 1 + n % 48, gray level
   *    media_id % 256;
   *  - audio: WAV (PCM mono 16-bit, 8 kHz), 1 + n % 960 samples,
   *    sample_i = (media_id + i) % 256 - 128;
   *  - video: y4m, width 2*(1 + n % 16), height 2*(1 + n % 12),
   *    1 + n % 25 frames, frame-f planes filled with
   *    (media_id + f) % 256.
   * Per-record generation is partition-local batch work — the shape
   * a real asset fetch/transcode stage runs in. */
  def asMediaWithImages(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val mt = mediaTypeOf(id)
        val n = text.getBytes("UTF-8").length
        val payload = mt match {
          case "image" => pngBytes(1 + n % 64, 1 + n % 48, (id % 256).toInt)
          case "audio" => wavBytes(1 + n % 960, id)
          case _       => y4mBytes(2 * (1 + n % 16), 2 * (1 + n % 12), 1 + n % 25, id)
        }
        MediaRow(id, payload, mt)
      })
  }

  /** REAL WAV decode via the JVM's audio codec: the container is
   * parsed by javax.sound.sampled (format, sample rate, frame
   * count), the PCM payload is read back and reassembled into
   * 16-bit samples, and the checksum is Σ (sample + 128) over the
   * DECODED samples. Returns (n_samples, sample_rate, checksum). */
  def decodeWav(payload: Array[Byte]): (Int, Int, Long) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    require(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16 &&
      !fmt.isBigEndian, s"unexpected WAV format: $fmt")
    val nSamples = ais.getFrameLength.toInt
    val pcm = ais.readAllBytes()
    require(pcm.length == nSamples * 2,
      s"WAV data length ${pcm.length} != 2 * $nSamples")
    var sum = 0L
    var i = 0
    while (i < nSamples) {
      val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort
      sum += s.toLong + 128L
      i += 1
    }
    (nSamples, fmt.getSampleRate.toInt, sum)
  }

  /** REAL y4m decode: walks the actual container — verifies the
   * YUV4MPEG2 magic, reads W/H from the stream header, then
   * consumes FRAME-marker lines and the raw 4:2:0 planes they
   * delimit, summing every decoded plane byte. Returns
   * (width, height, n_frames, checksum of all plane bytes). */
  def decodeY4m(payload: Array[Byte]): (Int, Int, Int, Long) = {
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < payload.length && payload(i) != '\n') i += 1
      require(i < payload.length, "y4m: unterminated header line")
      i
    }
    val he = lineEnd(0)
    val header = new String(payload, 0, he, "US-ASCII")
    val toks = header.split(" ")
    require(toks(0) == "YUV4MPEG2", s"y4m: bad magic '${toks(0)}'")
    def param(p: Char): Int = toks.find(_.headOption.contains(p)) match {
      case Some(t) => t.drop(1).toInt
      case None => throw new IllegalArgumentException(s"y4m: missing $p param")
    }
    val w = param('W'); val h = param('H')
    require(toks.exists(_.startsWith("C420")) || !toks.exists(_.startsWith("C")),
      "y4m: only 4:2:0 supported")
    val planeBytes = w * h + 2 * (w / 2) * (h / 2)
    var pos = he + 1
    var frames = 0
    var sum = 0L
    while (pos < payload.length) {
      val fe = lineEnd(pos)
      val marker = new String(payload, pos, fe - pos, "US-ASCII")
      require(marker == "FRAME" || marker.startsWith("FRAME "),
        s"y4m: expected FRAME marker at $pos, got '$marker'")
      pos = fe + 1
      require(pos + planeBytes <= payload.length, "y4m: truncated frame")
      var i = 0
      while (i < planeBytes) { sum += (payload(pos + i) & 0xff).toLong; i += 1 }
      pos += planeBytes
      frames += 1
    }
    // a header-only payload (truncated right after the stream header)
    // must fail loud here, not as a downstream sequence() error on
    // n_frames = 0 — every valid clip this library writes has >= 1
    // frame
    require(frames >= 1, "y4m: no frames after stream header")
    (w, h, frames, sum)
  }

  /** REAL decode for ALL modalities: javax.imageio parses PNG
   * payloads (decoder-read dims, decoded-raster R+G+B checksum),
   * javax.sound.sampled parses WAV payloads ([[decodeWav]]:
   * width = decoded sample count, height = decoded sample rate,
   * checksum over decoded samples), and [[decodeY4m]] walks the
   * y4m container (decoder-read dims + frame count, checksum over
   * decoded plane bytes). A corrupt payload or broken codec path
   * fails loud (decode throws) or hash-mismatches (wrong
   * content). */
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
      } else if (r.media_type == "audio") {
        val (nSamples, rate, sum) = decodeWav(r.payload)
        DecodedRow(r.media_id, r.media_type, nSamples, rate, 1, sum)
      } else {
        val (w, h, frames, sum) = decodeY4m(r.payload)
        DecodedRow(r.media_id, r.media_type, w, h, frames, sum)
      }
    })
  }

  /** DETERMINISTIC FAKE decode for the text-payload pipelines
   * (resize planning / feature extraction run on opaque text-derived
   * payloads by design; real-codec decode of real assets is
   * [[decodeReal]]). Partition-local batch shape: one pass over the
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

  /** Frame sampling (every 5th frame) over a decoded table — fed by
   * [[decodeReal]], so n_frames is the count the y4m walker actually
   * read out of the container. */
  def sampleFramesDecoded(decoded: DataFrame): DataFrame =
    decoded
      .where(col("media_type") === "video")
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(5))).as("frame_idx"))
}
