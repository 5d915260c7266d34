package graft.operators

import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal.MediaRecord

/** Image dHash near-dup detection and audio spectral features — the
  * multimodal signature layer over real JDK codecs/DSP. */
class MediaSignatureSpec extends SparkSpec {
  import spark.implicits._

  private def png(seed: Long): Array[Byte] = Multimodal.syntheticPng(seed, 32, 32)

  /** Structurally distinct perceptual fixtures (the seeded-noise PNGs
    * share one gradient structure, so dHash — correctly — cannot tell
    * them apart): an ascending luma gradient vs 8px vertical stripes. */
  private def patternPng(kind: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val v = kind match {
        case "asc" => x * 8
        case "stripes" => if ((x / 8) % 2 == 0) 230 else 20
        case _ => 0
      }
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def reencodeJpeg(pngBytes: Array[Byte]): Array[Byte] = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(pngBytes))
    // drop to RGB (jpeg writer rejects ARGB) and re-encode lossy
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  private def rescale(pngBytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(pngBytes))
    val s = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = s.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    val out = new ByteArrayOutputStream()
    ImageIO.write(s, "png", out)
    out.toByteArray
  }

  test("dHash survives re-encoding and rescaling; separates distinct images") {
    def h(b: Array[Byte]): Long =
      Multimodal.dHash(ImageIO.read(new java.io.ByteArrayInputStream(b)))
    val a = patternPng("stripes")
    val dJpeg = java.lang.Long.bitCount(h(a) ^ h(reencodeJpeg(a)))
    val dScale = java.lang.Long.bitCount(h(a) ^ h(rescale(a, 16, 16)))
    val dOther = java.lang.Long.bitCount(h(a) ^ h(patternPng("asc")))
    assert(dJpeg <= 3, s"jpeg re-encode moved $dJpeg bits")
    assert(dScale <= 3, s"rescale moved $dScale bits")
    assert(dOther > 10, s"distinct images only $dOther bits apart")
  }

  test("imageNearDupPairs finds planted re-encoded/rescaled variants only") {
    val media = Seq(
      MediaRecord(1L, "image", patternPng("stripes"), 32, 32, 0, "png"),
      MediaRecord(2L, "image", reencodeJpeg(patternPng("stripes")), 32, 32, 0, "jpg"),
      MediaRecord(3L, "image", rescale(patternPng("stripes"), 16, 16), 16, 16, 0, "png"),
      MediaRecord(4L, "image", patternPng("asc"), 32, 32, 0, "png"),
      MediaRecord(5L, "audio", Multimodal.syntheticWav(1L, 8000, 800), 0, 0, 8000, "wav"))
      .toDS()
    val pairs = Multimodal.imageNearDupPairs(media)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)), s"got $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"got $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), "audio row must not hash")
  }

  test("spectral feature: the peak bin tracks the tone frequency") {
    // bin k targets 100*(80)^(k/15) Hz at 8 kHz rate (fMax = 4000 with
    // Nyquist 4000): a pure tone at bin-k's center must peak at bin k
    def bin(freqBin: Int): Int = {
      val f = 100.0 * math.pow(4000.0 / 100.0, freqBin / 15.0)
      val wav = Multimodal.decodeWav(
        Multimodal.syntheticWavAt(seed = 3L, sampleRate = 8000, nSamples = 4096, freqHz = f)).get
      val sp = Multimodal.spectralFeature(wav)
      sp.indexOf(sp.max)
    }
    assert(bin(2) === 2)
    assert(bin(7) === 7)
    assert(bin(13) === 13)
  }

  test("spectralFeatures: audio rows only, zero undecodable leakage") {
    val media = Seq(
      MediaRecord(1L, "audio", Multimodal.syntheticWav(1L, 8000, 2048), 0, 0, 8000, "wav"),
      MediaRecord(2L, "audio", Array[Byte](1, 2, 3), 0, 0, 0, "bin"),
      MediaRecord(3L, "image", png(1L), 32, 32, 0, "png")).toDS()
    val rows = Multimodal.spectralFeatures(media).select("media_id").as[Long].collect().toSeq
    assert(rows === Seq(1L))
  }

  /** WAV with explicit amplitude and deterministic noise — the planted
    * "same recording, different mastering" variants for the audio
    * near-dup test (level shift = uniform gain; noise = re-encode
    * quantization proxy). Same RIFF layout as syntheticWavAt. */
  private def toneWav(freqHz: Double, amp: Double, noise: Double,
                      sampleRate: Int = 8000, nSamples: Int = 8192): Array[Byte] = {
    val dataLen = nSamples * 2
    val out = new ByteArrayOutputStream(44 + dataLen)
    def w32(v: Long): Unit = (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("RIFF".getBytes); w32(36L + dataLen); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); w32(16L); w16(1); w16(1); w32(sampleRate.toLong)
    w32(sampleRate.toLong * 2); w16(2); w16(16)
    out.write("data".getBytes); w32(dataLen.toLong)
    val rnd = new scala.util.Random(42L)
    var i = 0
    while (i < nSamples) {
      val clean = amp * math.sin(2 * math.Pi * freqHz * i / sampleRate)
      val s = ((clean + noise * (rnd.nextDouble() - 0.5)) * 32767).toInt
      w16(s & 0xffff)
      i += 1
    }
    out.toByteArray
  }

  test("audio near-dup pairs: re-encoded/level-shifted variants found, distinct tones not") {
    // 1 = master, 2 = level-shifted (gain 0.3x), 3 = re-encode proxy
    // (1% quantization noise), 4/5 = genuinely different tones
    val media = Seq(
      MediaRecord(1L, "audio", toneWav(500.0, 0.5, 0.0), 0, 0, 8000, "wav"),
      MediaRecord(2L, "audio", toneWav(500.0, 0.15, 0.0), 0, 0, 8000, "wav"),
      MediaRecord(3L, "audio", toneWav(500.0, 0.5, 0.01), 0, 0, 8000, "wav"),
      MediaRecord(4L, "audio", toneWav(2000.0, 0.5, 0.0), 0, 0, 8000, "wav"),
      MediaRecord(5L, "audio", toneWav(3100.0, 0.5, 0.0), 0, 0, 8000, "wav"),
      MediaRecord(6L, "audio", Array[Byte](9, 9), 0, 0, 0, "bin"), // undecodable
      MediaRecord(7L, "image", png(1L), 32, 32, 0, "png")) // non-audio
      .toDS()
    val pairs = Multimodal.audioNearDupPairs(media)
      .select("da", "db").as[(Long, Long)].collect().toSet
    // the variant family pairs up completely
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairs")
    // gain invariance is exact: scaling preserves the bin ORDER, so
    // the level-shifted signature is bit-identical
    val h1 = Multimodal.audioHash(
      Multimodal.decodeWav(toneWav(500.0, 0.5, 0.0)).get)
    val h2 = Multimodal.audioHash(
      Multimodal.decodeWav(toneWav(500.0, 0.15, 0.0)).get)
    assert(h1 === h2)
    // distinct tones sit well past the pairing threshold in every
    // window (a 2-bit flip per window = 8 total; threshold is 3)
    val h4 = Multimodal.audioHash(
      Multimodal.decodeWav(toneWav(2000.0, 0.5, 0.0)).get)
    assert(java.lang.Long.bitCount(h1 ^ h4) > 3 + 2)
  }
}
