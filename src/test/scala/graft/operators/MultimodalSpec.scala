package graft.operators

import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpec

/** Multimodal plumbing with REAL JDK codecs: ImageIO decode/resize for
  * images, hand-written RIFF/WAVE PCM parsing for audio, ISO-BMFF
  * container parsing + ImageIO entropy decode for Motion-JPEG video;
  * the byte-histogram fallback only remains for codecs the JDK lacks
  * (H.264 etc.) and opaque payloads. */
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
    // video rows carry REAL decoded-pixel features, not the byte
    // histogram: every cell is a luma mean, and the synthetic frames'
    // gradient + bright moving block put the temporal-pooled middle
    // rows well above a histogram bin's mass
    rows.filter(_.kind == "video").foreach { f =>
      assert(f.feature.forall(v => v >= 0f && v <= 1f))
      assert(f.feature.sum > 2f,
        s"video feature looks like an L1 histogram, not pooled luma: ${f.feature.toSeq}")
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

  test("frame sampling: chunk fallback conserves bytes; MP4 rows yield coded samples") {
    val frames = Multimodal.sampleFrames(media, 4).collect()
    assert(frames.length === 200)
    val byId = frames.groupBy(_.media_id)
    val orig: Map[Long, (String, Int)] =
      media.collect().map(m => m.media_id -> (m.kind, m.bytes.length)).toMap
    byId.foreach { case (id: Long, fs) =>
      orig(id) match {
        case ("video", _) =>
          // MJPEG rows: 4 frames = the 4 coded samples, each a complete
          // JPEG (SOI marker) that really decodes at the track's dims
          assert(fs.length === 4)
          fs.foreach { f =>
            assert((f.bytes(0) & 0xff) === 0xff && (f.bytes(1) & 0xff) === 0xd8,
              s"media $id frame ${f.frame_idx} is not a JPEG access unit")
            val img = Multimodal.decodeImage(f.bytes).get
            assert(img.getWidth === 64 && img.getHeight === 48)
          }
        case (_, len) =>
          assert(fs.map(_.bytes.length).sum === len, s"media $id lost bytes")
      }
    }
  }

  test("avc1 sample extraction is byte-exact through stsz/stsc/stco") {
    // codec the JDK cannot decode: extraction still works and is
    // content-verified against the deterministic sample formula
    val bytes = Multimodal.syntheticMp4(5L)
    val ranges = Multimodal.mp4SampleRanges(bytes).get
    assert(ranges.length === 4)
    ranges.zipWithIndex.foreach { case ((off, len), i) =>
      val want = Array.tabulate(Multimodal.syntheticMp4SampleLen(5L, i))(
        j => Multimodal.syntheticMp4SampleByte(5L, i, j))
      assert(len === want.length)
      assert(bytes.slice(off.toInt, off.toInt + len).toSeq === want.toSeq,
        s"sample $i content mismatch")
    }
    // and its features fall back to the histogram (no JDK H.264 codec)
    assert(Multimodal.videoFeature(bytes).isEmpty)
  }

  test("MJPEG video decode is real: container through pixels, no external libs") {
    val bytes = Multimodal.syntheticMjpegMp4(9L)
    assert(Multimodal.decodeMp4Meta(bytes).get.codec === "jpeg")
    val frames = Multimodal.decodedFrames(bytes, 4)
    assert(frames.length === 4)
    frames.foreach(f => assert(f.getWidth === 64 && f.getHeight === 48))
    // the bright block moves across frames: the brightest grid column
    // tracks the block position (seed+i mod 4) in the middle rows
    val cols = frames.map { f =>
      val ft = Multimodal.imageFeature(f)
      (0 until 4).maxBy(c => ft(4 + c) + ft(8 + c)) // rows 1-2 = block band
    }
    assert(cols.toSeq === Seq(1, 2, 3, 0), s"block positions $cols")
    // temporal pooling = mean of the per-frame thumbnails
    val pooled = Multimodal.videoFeature(bytes).get
    val want = Array.tabulate(16)(i => frames.map(f => Multimodal.imageFeature(f)(i)).sum / 4)
    pooled.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-5) }
  }

  test("MP4 container metadata parses without a codec") {
    val bytes = Multimodal.syntheticMp4(7L)
    val meta = Multimodal.decodeMp4Meta(bytes).get
    assert(meta.timescale === 600L)
    assert(meta.durationSec === 2.0)
    assert(meta.width === 64 && meta.height === 48)
    assert(meta.codec === "avc1")
    assert(meta.sampleCount === 4L && meta.syncSampleCount === 2L)
    // non-container payloads parse to None, never throw
    assert(Multimodal.decodeMp4Meta(Array.fill[Byte](64)(9)).isEmpty)
    assert(Multimodal.decodeMp4Meta(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeMp4Meta(Multimodal.syntheticPng(1L, 8, 8)).isEmpty)
  }

  test("videoMetadata surfaces typed container facts per media row") {
    import org.apache.spark.sql.functions.col
    val rows = Multimodal.videoMetadata(media).collect()
    assert(rows.length === 50)
    val vids = rows.filter(_.getAs[Boolean]("parseable"))
    assert(vids.nonEmpty)
    vids.foreach { r =>
      assert(r.getAs[Double]("duration_sec") === 2.0)
      assert(r.getAs[Int]("width") === 64 && r.getAs[Int]("height") === 48)
      assert(r.getAs[String]("codec") === "jpeg")
      assert(r.getAs[Long]("sample_count") === 4L)
      assert(r.getAs[Long]("sync_sample_count") === 2L)
    }
    // only video rows parse as containers
    val parseableIds = vids.map(_.getAs[Long]("media_id")).toSet
    val videoIds = media.collect().filter(_.kind == "video").map(_.media_id).toSet
    assert(parseableIds === videoIds)
  }

  test("MP4 parsing never throws on malformed input (crawl data is untrusted)") {
    val valid = Multimodal.syntheticMjpegMp4(3L)
    def exercise(bytes: Array[Byte]): Unit = {
      Multimodal.decodeMp4Meta(bytes) // must not throw
      Multimodal.mp4SampleRanges(bytes).foreach { rs =>
        rs.foreach(r => assert(r != null, "sample ranges must never contain null slots"))
      }
      Multimodal.videoFeature(bytes) // decode path end-to-end
    }
    // random garbage at several sizes
    val rnd = new scala.util.Random(42)
    for (len <- Seq(0, 7, 8, 64, 1024)) exercise(Array.fill[Byte](len)(rnd.nextInt.toByte))
    // truncations of a valid container at every box-ish boundary
    for (cut <- 0 until valid.length by 13) exercise(valid.take(cut))
    // single-byte corruptions sweeping the whole container (hits box
    // sizes, entry counts, offsets — the adversarial-count clamps)
    for (pos <- valid.indices by 3; flip <- Seq(0x80.toByte, 0x7f.toByte)) {
      val mutated = valid.clone()
      mutated(pos) = (mutated(pos) ^ flip).toByte
      exercise(mutated)
    }
    // a lying stsz: patch the declared sample count to Int.MaxValue —
    // must clamp, not allocate 2^31 entries (would OOM before throwing)
    val stszAt = {
      var i = valid.indexOfSlice("stsz".getBytes)
      i
    }
    assert(stszAt > 0)
    val lying = valid.clone()
    // payload: ver+flags(4) + fixedSize(4) + nSamples(4) — patch nSamples
    val nsOff = stszAt + 4 + 8
    lying(nsOff) = 0x7f.toByte; lying(nsOff + 1) = 0xff.toByte
    lying(nsOff + 2) = 0xff.toByte; lying(nsOff + 3) = 0xff.toByte
    exercise(lying)
    // and the clamped parse still extracts the 4 REAL samples
    assert(Multimodal.mp4SampleRanges(lying).get.length === 4)
  }

  test("media features flow into the similarity surface") {
    val emb = Multimodal.asEmbeddings(Multimodal.extractFeatures(media))
    val top = Similarity.cosineTopK(emb, 0L, 5).collect()
    assert(top.length === 5)
    assert(top.forall(_.getAs[Double]("cos_sim") <= 1.0001))
  }
}
