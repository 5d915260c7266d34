package graft.operators

import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpec

/** Multimodal plumbing with REAL JDK codecs (r3): ImageIO decode/resize
  * for images, hand-written RIFF/WAVE PCM parsing for audio; the byte-
  * histogram fallback only remains for video/opaque payloads. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark, 50)

  private def solidPng(rgb: Int, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("image decode is real: solid-color PNG yields its exact luma in every grid cell") {
    // pure green: Rec.601 luma = 0.587
    val feat = Multimodal.imageFeature(Multimodal.decodeImage(solidPng(0x00ff00)).get)
    assert(feat.length === 16)
    feat.foreach(v => assert(math.abs(v - 0.587f) < 1e-3, s"cell $v != green luma"))
    // the synthetic gradient brightens left to right in every grid row
    val grad = Multimodal.imageFeature(Multimodal.decodeImage(
      Multimodal.syntheticPng(7L, 32, 32)).get)
    for (gy <- 0 until 4) assert(grad(gy * 4) < grad(gy * 4 + 3),
      s"row $gy not a left-to-right gradient: ${grad.toSeq}")
  }

  test("wav decode is real: sample count, rate, RMS, ZCR, peak and duration of a sine tone") {
    val wav = Multimodal.decodeWav(Multimodal.syntheticWav(0L, 16000, 1600)).get
    assert(wav.sampleRate === 16000 && wav.channels === 1 && wav.bitsPerSample === 16)
    assert(wav.samples.length === 1600)
    val feat = Multimodal.audioFeature(wav)
    // amplitude 0.5 sine: RMS = 0.5/sqrt(2) ~ 0.3536, peak ~ 0.5,
    // ZCR ~ 2*f/rate = 2*220/16000 = 0.0275, duration = 0.1 s
    assert(math.abs(feat(12) - 0.3536f) < 0.005, s"rms=${feat(12)}")
    assert(math.abs(feat(14) - 0.5f) < 0.01, s"peak=${feat(14)}")
    assert(math.abs(feat(13) - 0.0275f) < 0.005, s"zcr=${feat(13)}")
    assert(math.abs(feat(15) - 0.1f) < 1e-4, s"duration=${feat(15)}")
    // energy envelope slices of a steady tone are near-uniform (each
    // 133-sample slice holds ~1.8 cycles, so partial cycles wobble RMS
    // by a few percent)
    for (i <- 0 until 12) assert(math.abs(feat(i) - feat(0)) < 0.05)
  }

  test("malformed payloads fall back to the byte histogram instead of failing") {
    val junk = Array.tabulate[Byte](100)(i => (i * 37).toByte)
    assert(Multimodal.decodeImage(junk).isEmpty)
    assert(Multimodal.decodeWav(junk).isEmpty)
    val hist = Multimodal.byteHistogram(junk)
    assert(math.abs(hist.sum - 1.0f) < 1e-3)
  }

  test("feature extraction dispatches per kind, is deterministic and shuffle-free") {
    val feats = Multimodal.extractFeatures(Multimodal.repartitionForDecode(media, 4))
    val rows = feats.collect()
    assert(rows.length === 50)
    rows.foreach(f => assert(f.feature.length === 16))
    // video rows use the L1-normalized histogram fallback
    rows.filter(_.kind == "video").foreach { f =>
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3, "video fallback must be L1-normalized")
    }
    // audio rows carry the sine's RMS in the global slot
    rows.filter(_.kind == "audio").foreach(f => assert(math.abs(f.feature(12) - 0.3536f) < 0.01))
    // determinism across runs
    val again = Multimodal.extractFeatures(media).collect()
    assert(rows.sortBy(_.media_id).map(_.feature.toSeq) ===
      again.sortBy(_.media_id).map(_.feature.toSeq))
  }

  test("resize really rescales decodable images and re-encodes as PNG") {
    import spark.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]
    val one = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "image", solidPng(0x3366cc, 32, 32), 32, 32, 0, "png"),
      Multimodal.MediaRecord(2L, "video", Array.fill[Byte](64)(9), 32, 32, 0, "raw")))
    val out = Multimodal.resize(one, 16, 16).collect().sortBy(_.media_id)
    assert(out.forall(m => m.width == 16 && m.height == 16))
    // the image row: actually 16x16 when re-decoded, still solid color
    val img = Multimodal.decodeImage(out(0).bytes).get
    assert(img.getWidth === 16 && img.getHeight === 16)
    assert((img.getRGB(8, 8) & 0xffffff) === 0x3366cc)
    assert(out(0).format === "png")
    // the opaque row: deterministic truncate/pad fallback
    assert(out(1).bytes.length === 256)
  }

  test("frame sampling splits payload without losing bytes") {
    val frames = Multimodal.sampleFrames(media, 4).collect()
    assert(frames.length === 200)
    val byId = frames.groupBy(_.media_id)
    val orig = media.collect().map(m => m.media_id -> m.bytes.length).toMap
    byId.foreach { case (id, fs) =>
      assert(fs.map(_.bytes.length).sum === orig(id), s"media $id lost bytes")
    }
  }

  test("media features flow into the similarity surface") {
    val emb = Multimodal.asEmbeddings(Multimodal.extractFeatures(media))
    val top = Similarity.cosineTopK(emb, 0L, 5).collect()
    assert(top.length === 5)
    assert(top.forall(_.getAs[Double]("cos_sim") <= 1.0001))
  }
}
