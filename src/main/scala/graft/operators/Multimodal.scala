package graft.operators

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travel as opaque `binary` columns with typed
  * metadata; decode / feature-extract / resize / frame-sample run as
  * partition-local batch transforms.
  *
  * Codec status (r3 — real where the JDK ships one):
  *  - IMAGES are REALLY decoded: `javax.imageio` (JDK built-in, no
  *    external libs) reads PNG/JPEG/BMP/GIF/WBMP; features are 4x4
  *    grayscale thumbnails (area-averaged luma), resize is a true
  *    bilinear Graphics2D rescale re-encoded as PNG. Headless-safe.
  *  - AUDIO (WAV/RIFF PCM 8/16-bit) is REALLY decoded by a hand-written
  *    RIFF chunk parser (the format is a public spec and ~40 lines);
  *    features are a 12-slice RMS energy envelope + global RMS,
  *    zero-crossing rate, peak, and duration.
  *  - VIDEO decode needs a codec stack the JDK does not ship — that path
  *    remains a documented fallback (L1-normalized 16-bin byte
  *    histogram), as does any image/audio payload the parsers reject.
  *    Swapping the fallback for a JNI/ffmpeg decoder changes ONE
  *    function; the Spark-side contract (schema, binary batching,
  *    partitioning, `mapPartitions`-over-typed-rows — Scala's analogue
  *    of an Arrow `mapInPandas` batch UDF) is unchanged.
  *
  * Scale notes: media bytes dominate row size, so ops here avoid shuffles
  * entirely (pure per-partition transforms); `repartitionForDecode` sizes
  * partitions by row count (decode is CPU-bound per item, not per byte,
  * so count-balanced beats byte-balanced for thumbnails; flip to byte
  * budget for video).
  */
object Multimodal {

  /** Typed media row — the envelope a real pipeline would carry. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      format: String)

  final case class MediaFeature(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      feature: Array[Float])

  final case class MediaFrame(
      media_id: Long,
      frame_idx: Int,
      bytes: Array[Byte])

  // ---------------------------------------------------------- images
  /** Real image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF/WBMP).
    * None when the payload is not a readable image. */
  private[operators] def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException => None }

  /** 4x4 grayscale thumbnail (16 dims in [0,1]): per grid cell, the mean
    * Rec.601 luma of its pixel block — deterministic area averaging. */
  private[operators] def imageFeature(img: BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](16)
    val counts = new Array[Long](16)
    var y = 0
    while (y < h) {
      val gy = math.min(y * 4 / h, 3)
      var x = 0
      while (x < w) {
        val gx = math.min(x * 4 / w, 3)
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xff) * 0.299 + ((rgb >> 8) & 0xff) * 0.587 +
          ((rgb & 0xff) * 0.114)) / 255.0
        val g = gy * 4 + gx
        sums(g) += luma
        counts(g) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(16)(i => if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat)
  }

  // ----------------------------------------------------------- audio
  /** Decoded PCM: channel-averaged samples in [-1, 1]. */
  private[operators] final case class WavPcm(
      sampleRate: Int, channels: Int, bitsPerSample: Int, samples: Array[Double])

  /** Hand-written RIFF/WAVE parser (public spec): walks chunks, reads
    * `fmt ` (PCM only) and `data` (8-bit unsigned / 16-bit LE signed),
    * averaging channels. None for anything else. */
  private[operators] def decodeWav(bytes: Array[Byte]): Option[WavPcm] = {
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    if (bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bits)
    var data: Option[(Int, Int)] = None // (offset, length)
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = u32(off + 4).toInt
      if (id == "fmt " && off + 24 <= bytes.length) {
        val audioFormat = u16(off + 8)
        if (audioFormat != 1) return None // PCM only
        fmt = Some((u16(off + 10), u32(off + 12).toInt, u16(off + 22)))
      } else if (id == "data") {
        data = Some((off + 8, math.min(len, bytes.length - off - 8)))
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    for ((channels, rate, bits) <- fmt; (dOff, dLen) <- data;
         if channels > 0 && (bits == 8 || bits == 16)) yield {
      val bytesPerFrame = channels * bits / 8
      val n = dLen / bytesPerFrame
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        var acc = 0.0
        var c = 0
        while (c < channels) {
          val o = dOff + i * bytesPerFrame + c * bits / 8
          acc += (if (bits == 8) ((bytes(o) & 0xff) - 128) / 128.0
          else ((bytes(o) & 0xff) | (bytes(o + 1).toInt << 8)).toShort / 32768.0)
          c += 1
        }
        out(i) = acc / channels
        i += 1
      }
      WavPcm(rate, channels, bits, out)
    }
  }

  /** 16-dim audio feature: 12-slice RMS energy envelope + [global RMS,
    * zero-crossing rate, peak, duration(s)]. */
  private[operators] def audioFeature(wav: WavPcm): Array[Float] = {
    val s = wav.samples
    val n = math.max(s.length, 1)
    val out = new Array[Float](16)
    var slice = 0
    while (slice < 12) {
      val from = slice * n / 12
      val until = math.max((slice + 1) * n / 12, from + 1).min(n)
      var acc = 0.0
      var i = from
      while (i < until) { acc += s(i) * s(i); i += 1 }
      out(slice) = math.sqrt(acc / (until - from)).toFloat
      slice += 1
    }
    var sq = 0.0; var zc = 0L; var peak = 0.0
    var i = 0
    while (i < s.length) {
      sq += s(i) * s(i)
      if (i > 0 && (s(i) >= 0) != (s(i - 1) >= 0)) zc += 1
      peak = math.max(peak, math.abs(s(i)))
      i += 1
    }
    out(12) = math.sqrt(sq / n).toFloat
    out(13) = zc.toFloat / n
    out(14) = peak.toFloat
    out(15) = s.length.toFloat / math.max(wav.sampleRate, 1)
    out
  }

  // -------------------------------------------------------- fallback
  /** Opaque-format fallback (and the video path until a codec stack is
    * plugged in): 16-bin byte histogram, L1-normalized — deterministic,
    * content-sensitive, feature-shaped. */
  private[operators] def byteHistogram(bytes: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { bins((bytes(i) & 0xFF) >> 4) += 1f; i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    bins.map(_ / n)
  }

  /** Count-balanced repartition ahead of CPU-bound decode. */
  def repartitionForDecode(media: Dataset[MediaRecord], partitions: Int): Dataset[MediaRecord] =
    media.repartition(partitions, col("media_id"))

  /** Batch feature extraction: partition-local, zero-shuffle, real codecs
    * per kind (see object scaladoc). The iterator-in/iterator-out shape
    * processes rows streaming-wise without materializing a partition. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeature] = {
    implicit val enc = Encoders.product[MediaFeature]
    media.mapPartitions(_.map { m =>
      val feature = m.kind match {
        case "image" => decodeImage(m.bytes).map(imageFeature).getOrElse(byteHistogram(m.bytes))
        case "audio" => decodeWav(m.bytes).map(audioFeature).getOrElse(byteHistogram(m.bytes))
        case _ => byteHistogram(m.bytes)
      }
      MediaFeature(m.media_id, m.kind, m.bytes.length.toLong, feature)
    })
  }

  /** Resize: REAL bilinear rescale + PNG re-encode for decodable images;
    * deterministic truncate/pad for everything else (metadata-correct
    * either way). */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    media.mapPartitions(_.map { m =>
      val decoded = if (m.kind == "image") decodeImage(m.bytes) else None
      decoded match {
        case Some(img) =>
          val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
            RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val baos = new ByteArrayOutputStream()
          ImageIO.write(out, "png", baos)
          m.copy(bytes = baos.toByteArray, width = w, height = h, format = "png")
        case None =>
          val target = math.max(w * h, 1)
          m.copy(bytes = java.util.Arrays.copyOf(m.bytes, target), width = w, height = h)
      }
    })
  }

  /** FRAME-SAMPLE (video fallback): split the payload into n equal chunks
    * ("frames"); a real impl seeks keyframes. Explodes rows — still
    * shuffle-free. */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): Dataset[MediaFrame] = {
    implicit val enc = Encoders.product[MediaFrame]
    media.flatMap { m =>
      val chunk = math.max(m.bytes.length / math.max(n, 1), 1)
      (0 until n).iterator.map { i =>
        val from = math.min(i * chunk, m.bytes.length)
        val until = if (i == n - 1) m.bytes.length else math.min((i + 1) * chunk, m.bytes.length)
        MediaFrame(m.media_id, i, java.util.Arrays.copyOfRange(m.bytes, from, until))
      }
    }
  }

  /** Media features → the Similarity/Dedup embedding surface: a DataFrame
    * with (vec_id, embedding) compatible with Similarity.cosineTopK and
    * Dedup.embeddingNearDupPairs. */
  def asEmbeddings(features: Dataset[MediaFeature]): DataFrame =
    features.toDF().select(col("media_id").as("vec_id"), col("feature").as("embedding"))

  /** Deterministic synthetic media for tests/demos — REAL payloads where
    * the codec is real: images are encoded PNGs (per-id seeded RGB
    * noise over a gradient), audio rows are RIFF/WAVE 16-bit PCM sine
    * tones (frequency varies by id), video rows remain opaque bytes. */
  def syntheticMedia(spark: SparkSession, n: Int, seedBytes: Int = 256): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    import spark.implicits._
    spark.range(n).map { id =>
      (id % 3).toInt match {
        case 0 =>
          val bytes = syntheticPng(id, 32, 32)
          MediaRecord(id, "image", bytes, 32, 32, 0, "png")
        case 1 =>
          val bytes = syntheticWav(id, 16000, 1600)
          MediaRecord(id, "audio", bytes, 0, 0, 16000, "wav")
        case _ =>
          val rnd = new scala.util.Random(id)
          val bytes = Array.fill(seedBytes + (id % 7).toInt * 32)(rnd.nextInt(256).toByte)
          MediaRecord(id, "video", bytes, 32, 32, 0, "raw")
      }
    }
  }

  /** Seeded 32x32 PNG: horizontal luma gradient + per-pixel noise. */
  private[operators] def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = 255 * x / math.max(w - 1, 1)
        def ch = math.min(255, math.max(0, base + rnd.nextInt(33) - 16))
        img.setRGB(x, y, (ch << 16) | (ch << 8) | ch)
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** 16-bit mono PCM sine tone at 220*(1+id%5) Hz, amplitude 0.5. */
  private[operators] def syntheticWav(seed: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val freq = 220.0 * (1 + (seed % 5))
    val dataLen = nSamples * 2
    val out = new ByteArrayOutputStream(44 + dataLen)
    def w32(v: Long): Unit = (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("RIFF".getBytes); w32(36L + dataLen); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16L); w16(1); w16(1); w32(sampleRate.toLong)
    w32(sampleRate.toLong * 2); w16(2); w16(16)
    out.write("data".getBytes); w32(dataLen.toLong)
    var i = 0
    while (i < nSamples) {
      val s = (0.5 * math.sin(2 * math.Pi * freq * i / sampleRate) * 32767).toInt
      w16(s & 0xffff)
      i += 1
    }
    out.toByteArray
  }
}
