package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal.MediaRecord

/** Animated-GIF video pipeline: the second container format the JDK
  * decodes END-TO-END (container byte-walk + full GIF codec). Mirrors
  * the MJPEG suite: metadata, composited pixel decode with the moving
  * block tracked frame-by-frame, coded-segment extraction, and
  * malformed-input hardening. */
class GifVideoSpec extends SparkSpec {
  import spark.implicits._

  test("GIF container metadata byte-walks without ImageIO") {
    val bytes = Multimodal.syntheticGif(9L)
    val meta = Multimodal.decodeGifMeta(bytes).get
    assert(meta.width === 64 && meta.height === 48)
    assert(meta.frames.length === 4)
    meta.frames.foreach { f =>
      assert(f.delayCs === 5 && f.disposal <= 1)
      assert(f.left === 0 && f.top === 0 && f.w === 64 && f.h === 48)
    }
    assert(meta.durationSec === 0.2)
    assert(meta.syncFrameCount === 4L)
  }

  test("GIF decode is real: container through pixels, moving block tracked") {
    val bytes = Multimodal.syntheticGif(9L)
    val frames = Multimodal.decodedFrames(bytes, 4)
    assert(frames.length === 4)
    frames.foreach(f => assert(f.getWidth === 64 && f.getHeight === 48))
    val cols = frames.map { f =>
      val ft = Multimodal.imageFeature(f)
      (0 until 4).maxBy(c => ft(4 + c) + ft(8 + c))
    }
    // block position = (seed + i) mod 4 with seed 9 -> 1,2,3,0
    assert(cols.toSeq === Seq(1, 2, 3, 0), s"block positions $cols")
    val pooled = Multimodal.videoFeature(bytes).get
    val want = Array.tabulate(16)(i => frames.map(f => Multimodal.imageFeature(f)(i)).sum / 4)
    pooled.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-5) }
  }

  test("videoMetadata reports GIF rows as parseable with gif codec") {
    val media = Seq(
      MediaRecord(1L, "video", Multimodal.syntheticGif(3L), 64, 48, 0, "gif"),
      MediaRecord(2L, "video", Multimodal.syntheticMjpegMp4(3L), 64, 48, 0, "mp4"),
      MediaRecord(3L, "video", Array[Byte](1, 2, 3), 0, 0, 0, "bin")).toDS()
    val rows = Multimodal.videoMetadata(media).orderBy("media_id").collect()
    assert(rows(0).getBoolean(1) && rows(0).getString(6) === "gif")
    assert(rows(0).getLong(2) === 100L && rows(0).getDouble(3) === 0.2)
    assert(rows(0).getInt(4) === 64 && rows(0).getInt(5) === 48)
    assert(rows(0).getLong(7) === 4L && rows(0).getLong(8) === 4L)
    assert(rows(1).getBoolean(1) && rows(1).getString(6) === "jpeg")
    assert(!rows(2).getBoolean(1))
  }

  test("sampleFrames ships real GIF coded segments (image separator first)") {
    val media = Seq(MediaRecord(7L, "video", Multimodal.syntheticGif(5L), 64, 48, 0, "gif")).toDS()
    val frames = Multimodal.sampleFrames(media, 4).collect()
    assert(frames.length === 4)
    frames.foreach { f =>
      assert((f.bytes(0) & 0xff) === 0x2c, "coded segment must start at the image descriptor")
      assert(f.bytes.length > 10)
    }
    // segments are distinct coded payloads (the block moves)
    assert(frames.map(_.bytes.toSeq).distinct.length === 4)
  }

  test("feature extraction uses real GIF pixels, not the byte histogram") {
    val gif = Multimodal.syntheticGif(11L)
    val media = Seq(MediaRecord(1L, "video", gif, 64, 48, 0, "gif")).toDS()
    val ft = Multimodal.extractFeatures(media).collect().head.feature
    assert(ft.toSeq !== Multimodal.byteHistogram(gif).toSeq)
    // gradient background: right columns brighter than left in every band
    assert(ft(3) > ft(0))
  }

  test("malformed GIFs degrade to None/empty, never throw") {
    val good = Multimodal.syntheticGif(2L)
    Seq(
      good.take(5), // truncated header
      good.take(20), // truncated mid-structure
      "GIF89a".getBytes ++ Array.fill[Byte](20)(0x7f), // bogus blocks
      Array[Byte]()).foreach { b =>
      assert(Multimodal.decodeGifMeta(b) === None)
      assert(Multimodal.gifDecodedFrames(b, 2).isEmpty)
    }
    // corrupting LZW data must not throw; output stays frame-bounded
    val corrupt = good.clone()
    var i = good.length / 2
    while (i < good.length / 2 + 16 && i < corrupt.length) { corrupt(i) = 0x55; i += 1 }
    assert(Multimodal.gifDecodedFrames(corrupt, 4).length <= 4)
  }
}
