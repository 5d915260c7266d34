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
  *  - VIDEO containers (MP4/ISO-BMFF, a public spec) are REALLY parsed:
  *    `decodeMp4Meta` reads duration/timescale (mvhd), track dimensions
  *    (tkhd 16.16 fixed), codec fourcc (stsd) and sample/sync counts
  *    (stts/stss) by walking boxes, and `sampleFrames` extracts the
  *    actual CODED SAMPLES through the stsz/stsc/stco tables — the
  *    pre-decode pipeline stages (duration gates, resolution buckets,
  *    codec allow-lists, keyframe budgets, frame shipping) all run for
  *    real. For Motion-JPEG tracks (sample-entry `jpeg`/`mjpa`/`mjpb` —
  *    every coded sample is a complete JPEG image) the entropy decode
  *    is ALSO real: sampled frames go through the JDK's ImageIO JPEG
  *    codec and video features are temporal-pooled PIXEL features
  *    (mean per-frame 4x4 luma thumbnail), end-to-end with zero
  *    external libraries. Only inter-frame codecs the JDK does not
  *    ship (H.264/VP9/AV1) — and any payload the parsers reject — keep
  *    the L1-normalized 16-bin byte-histogram fallback. Swapping that
  *    for a JNI/ffmpeg decoder changes ONE function
  *    (`decodeSampleImage`); the Spark-side contract (schema, binary
  *    batching, partitioning, `mapPartitions`-over-typed-rows —
  *    Scala's analogue of an Arrow `mapInPandas` batch UDF) is
  *    unchanged.
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
    catch { case scala.util.control.NonFatal(_) => None } // corrupt crawl
  // payloads surface as undecodable, never as an executor crash

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

  /** 16-bin log-spaced power spectrum of a PCM clip — REAL frequency-
    * domain DSP with no external libs: Goertzel filters (the single-
    * frequency DFT, O(n) per bin) over up to `window` centered
    * samples, Hann-windowed, power in dB-ish log scale, L∞-normalized.
    * Bin k targets frequency fMin·(fMax/fMin)^(k/15) with fMin=100 Hz,
    * fMax=min(8000, Nyquist) — the layout a cheap audio-content filter
    * (speech/music/tone discrimination) reads. */
  /** 16-bin RAW-power Goertzel envelope of samples[from, from+n) —
    * log-spaced bins 100 Hz..Nyquist(≤8 kHz), Hann-windowed. Shared by
    * [[spectralFeature]] (log1p + max-normalize) and [[audioHash]]
    * (log + mean-threshold bits). */
  private def goertzel16(s: Array[Double], from: Int, n: Int,
                         sampleRate: Int): Array[Double] = {
    val out = new Array[Double](16)
    if (n < 16 || sampleRate <= 0) return out
    val fMin = 100.0
    val fMax = math.min(8000.0, sampleRate / 2.0)
    var k = 0
    while (k < 16) {
      val f = fMin * math.pow(fMax / fMin, k / 15.0)
      val w = 2.0 * math.Pi * f / sampleRate
      val coeff = 2.0 * math.cos(w)
      var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
      var i = 0
      while (i < n) {
        // Hann window keeps spectral leakage from smearing tones
        val hann = 0.5 * (1 - math.cos(2.0 * math.Pi * i / (n - 1)))
        s0 = s(from + i) * hann + coeff * s1 - s2
        s2 = s1; s1 = s0
        i += 1
      }
      out(k) = math.max(s1 * s1 + s2 * s2 - coeff * s1 * s2, 0.0)
      k += 1
    }
    out
  }

  private[operators] def spectralFeature(wav: WavPcm, window: Int = 4096): Array[Float] = {
    val s = wav.samples
    val n = math.min(s.length, window)
    if (n < 16 || wav.sampleRate <= 0) return new Array[Float](16)
    val from = (s.length - n) / 2
    val out = goertzel16(s, from, n, wav.sampleRate).map(p => math.log1p(p).toFloat)
    val mx = out.max
    if (mx > 0f) { var i = 0; while (i < 16) { out(i) /= mx; i += 1 } }
    out
  }

  /** Spectral features of the decodable audio rows: (media_id,
    * spectrum: 16 floats). Partition-local Goertzel DSP — zero
    * shuffle; undecodable rows are absent. Compose with
    * `asEmbeddings`-style selects for audio-content dedup/search. */
  def spectralFeatures(media: Dataset[MediaRecord]): DataFrame = {
    implicit val enc = Encoders.product[(Long, Array[Float])]
    media.mapPartitions(_.flatMap { m =>
      if (m.kind == "audio") decodeWav(m.bytes).map(w => (m.media_id, spectralFeature(w)))
      else None
    }).toDF("media_id", "spectrum")
  }

  // -------------------------------------------------- audio near-dup
  /** 64-bit perceptual audio signature (r15 — closes the multimodal
    * dedup asymmetry: images had dHash + hamming64Pairs, audio had
    * spectral features but no pairing kernel): 4 time windows (clip
    * quarters, ≤4096 samples each) × the 16-bin Goertzel power
    * envelope, bit (w·16+k) set iff bin k's power is within 12 dB of
    * the WINDOW MAX — a spectral peak mask (the band-energy
    * thresholding of classic audio fingerprints, Haitsma & Kalker
    * 2002, with the threshold anchored at the peak instead of the
    * mean). Uniform gain scales every power by the same g², so the
    * power/max ratio — and every bit — is invariant by construction;
    * re-encode noise lives ≥30 dB below the content peaks and cannot
    * cross a −12 dB mask, while a different tone/chord moves the
    * peak set itself. (Mean- or median-anchored thresholds fail on
    * SPARSE spectra: a pure tone leaves the threshold sitting in the
    * noise floor, where bits are coin flips — measured before this
    * form was chosen.) */
  /** 16 log-band ENERGIES of samples[from, from+n): power summed over
    * every exact-DFT-bin frequency falling in the band (Goertzel per
    * DFT bin — O(n · nBins), partition-local). Unlike the 16
    * point-filters of [[goertzel16]] (near-delta responses a tone
    * between centers falls through — measured before this form), a
    * band INTEGRATES, so content lands in its band wherever it sits
    * and broadband noise stays spread thin. */
  private def bandEnergies16(s: Array[Double], from: Int, n: Int,
                             sampleRate: Int): Array[Double] = {
    val out = new Array[Double](16)
    if (n < 32 || sampleRate <= 0) return out
    val fMin = 100.0
    val fMax = math.min(8000.0, sampleRate / 2.0)
    val df = sampleRate.toDouble / n
    val lr = math.log(fMax / fMin)
    var j = math.max(1, math.ceil(fMin / df).toInt)
    val jMax = math.min(math.floor(fMax / df).toInt, n / 2)
    while (j <= jMax) {
      val w = 2.0 * math.Pi * j / n
      val coeff = 2.0 * math.cos(w)
      var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
      var i = 0
      while (i < n) { s0 = s(from + i) + coeff * s1 - s2; s2 = s1; s1 = s0; i += 1 }
      val p = s1 * s1 + s2 * s2 - coeff * s1 * s2
      var k = ((math.log(j * df / fMin) / lr) * 16).toInt
      if (k >= 16) k = 15
      if (k >= 0) out(k) += math.max(p, 0.0)
      j += 1
    }
    out
  }

  private[operators] def audioHash(wav: WavPcm): Long = {
    val s = wav.samples
    if (s.length < 128 || wav.sampleRate <= 0) return 0L
    val q = s.length / 4
    var h = 0L
    var w = 0
    while (w < 4) {
      val n = math.min(q, 2048)
      val env = bandEnergies16(s, w * q, n, wav.sampleRate)
      val mx = env.max
      val thresh = mx / math.pow(10.0, 1.2) // -12 dB of the window max
      var k = 0
      while (k < 16) {
        if (mx > 0.0 && env(k) > thresh) h |= 1L << (w * 16 + k)
        k += 1
      }
      w += 1
    }
    h
  }

  /** Perceptual signatures of the decodable audio rows: (media_id,
    * ahash). Partition-local decode + hash — zero shuffle; rows that
    * do not decode are absent. Feed `Dedup.hamming64Pairs` for the
    * audio near-duplicate pairs. */
  def audioHashes(media: Dataset[MediaRecord]): DataFrame = {
    implicit val enc = Encoders.product[(Long, Long)]
    media.mapPartitions(_.flatMap { m =>
      if (m.kind == "audio") decodeWav(m.bytes).map(w => (m.media_id, audioHash(w)))
      else None
    }).toDF("media_id", "ahash")
  }

  /** Audio near-duplicate pairs end-to-end: decode → audioHash →
    * banded Hamming pairing (the image pipeline's exact shape —
    * `Dedup.hamming64Pairs` reused unchanged). */
  def audioNearDupPairs(media: Dataset[MediaRecord], maxHamming: Int = 3): DataFrame =
    graft.operators.Dedup.hamming64Pairs(
      audioHashes(media), idCol = "media_id", hashCol = "ahash", maxHamming = maxHamming)

  // ------------------------------------------------- video (ISO-BMFF)
  /** Parsed MP4/ISO-BMFF container metadata — everything a pipeline's
    * video pre-filter reads (duration gates, resolution buckets, codec
    * allow-lists, frame budgets) WITHOUT any codec: the container layout
    * is a public spec (ISO/IEC 14496-12) of length-prefixed boxes, so
    * duration (mvhd), track dimensions (tkhd, 16.16 fixed point), codec
    * fourcc (stsd) and sample/sync-sample counts (stts/stss) are plain
    * byte walking. Only the entropy DECODE of coded samples needs a
    * codec stack the JDK does not ship — that single step remains the
    * documented fallback. */
  final case class Mp4Meta(timescale: Long, durationSec: Double,
                           width: Int, height: Int, codec: String,
                           sampleCount: Long, syncSampleCount: Long)

  /** Iterate the top-level boxes of `bytes` in [from, until): yields
    * (type, payloadFrom, payloadUntil). Handles 64-bit largesize and
    * size==0 (box extends to the end). Malformed sizes end iteration. */
  private def boxes(bytes: Array[Byte], from: Int, until: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var pos = from
      def hasNext: Boolean = pos + 8 <= until
      def next(): (String, Int, Int) = {
        val b = java.nio.ByteBuffer.wrap(bytes, pos, until - pos)
        val size32 = b.getInt().toLong & 0xffffffffL
        val tpe = new String(bytes, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val (payloadFrom, boxEnd) =
          if (size32 == 1L) { // 64-bit largesize follows the type
            val large = java.nio.ByteBuffer.wrap(bytes, pos + 8, 8).getLong()
            (pos + 16, pos + large)
          } else if (size32 == 0L) (pos + 8, until.toLong) // to end of file
          else (pos + 8, pos + size32)
        val end = math.min(boxEnd, until.toLong).toInt
        val out = (tpe, math.min(payloadFrom.toLong, end.toLong).toInt, end)
        pos = if (end < pos + 8) until else end // size < 8 is malformed: stop
        out
      }
    }

  private def findBox(bytes: Array[Byte], from: Int, until: Int, tpe: String): Option[(Int, Int)] =
    boxes(bytes, from, until).collectFirst { case (`tpe`, f, u) => (f, u) }

  /** Container-level metadata of an MP4/ISO-BMFF payload; None when the
    * bytes are not a parseable container (no moov) — INCLUDING
    * malformed/truncated/adversarial containers (crawl data is
    * untrusted: every structural read is clamped to the payload and any
    * residual parse explosion degrades to None, never an executor
    * crash). See [[Mp4Meta]]. */
  private[operators] def decodeMp4Meta(bytes: Array[Byte]): Option[Mp4Meta] =
    try decodeMp4Meta0(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeMp4Meta0(bytes: Array[Byte]): Option[Mp4Meta] = {
    val moov = findBox(bytes, 0, bytes.length, "moov")
    moov.map { case (mf, mu) =>
      val (timescale, duration) = findBox(bytes, mf, mu, "mvhd").map { case (f, _) =>
        val b = java.nio.ByteBuffer.wrap(bytes, f, mu - f)
        val version = b.get()
        b.position(b.position() + 3) // flags
        if (version == 1) {
          b.position(b.position() + 16) // creation + modification (u64 x2)
          val ts = b.getInt().toLong & 0xffffffffL
          (ts, b.getLong())
        } else {
          b.position(b.position() + 8) // creation + modification (u32 x2)
          val ts = b.getInt().toLong & 0xffffffffL
          (ts, b.getInt().toLong & 0xffffffffL)
        }
      }.getOrElse((0L, 0L))
      // first video track: tkhd carries 16.16 fixed-point w/h as the
      // LAST 8 payload bytes in both versions
      val trak = findBox(bytes, mf, mu, "trak")
      val (w, h) = trak.flatMap { case (tf, tu) => findBox(bytes, tf, tu, "tkhd") }
        .map { case (f, u) =>
          val b = java.nio.ByteBuffer.wrap(bytes, u - 8, 8)
          (b.getInt() >>> 16, b.getInt() >>> 16)
        }.getOrElse((0, 0))
      val stbl = for {
        (tf, tu) <- trak
        (df, du) <- findBox(bytes, tf, tu, "mdia")
        (nf, nu) <- findBox(bytes, df, du, "minf")
        s <- findBox(bytes, nf, nu, "stbl")
      } yield s
      val codec = stbl.flatMap { case (f, u) => findBox(bytes, f, u, "stsd") }
        .filter { case (f, u) => u - f >= 16 }
        .map { case (f, _) =>
          new String(bytes, f + 12, 4, java.nio.charset.StandardCharsets.US_ASCII)
        }.getOrElse("")
      val samples = stbl.flatMap { case (f, u) => findBox(bytes, f, u, "stts") }
        .map { case (f, u) =>
          val b = java.nio.ByteBuffer.wrap(bytes, f + 4, 4) // skip ver+flags
          // a lying entry count can't walk past the box payload
          val n = math.min(b.getInt().toLong, ((u - f - 8) / 8).toLong).toInt
          var total = 0L
          var i = 0
          while (i < n) {
            total += java.nio.ByteBuffer.wrap(bytes, f + 8 + i * 8, 4).getInt().toLong
            i += 1
          }
          total
        }.getOrElse(0L)
      // stss lists sync samples (keyframes); absent = every sample syncs
      val sync = stbl.flatMap { case (f, u) => findBox(bytes, f, u, "stss") }
        .map { case (f, _) => java.nio.ByteBuffer.wrap(bytes, f + 4, 4).getInt().toLong }
        .getOrElse(samples)
      Mp4Meta(timescale,
        if (timescale > 0) duration.toDouble / timescale else 0.0,
        w, h, codec, samples, sync)
    }
  }

  /** Per-sample byte ranges of an MP4's (single-track) media data, from
    * the sample tables alone: stsz sizes, stsc sample→chunk runs, stco/
    * co64 chunk offsets. This is real frame EXTRACTION — each returned
    * range is one coded sample (e.g. an H.264 access unit), which is
    * exactly what a pre-decode pipeline stage ships to the decoder.
    * Untrusted-input hardened like [[decodeMp4Meta]]: declared entry
    * counts clamp to the box payload actually present (a corrupt stsz
    * claiming 2^31 samples must not allocate a 2^31 array), and any
    * residual parse explosion returns None. */
  private[operators] def mp4SampleRanges(bytes: Array[Byte]): Option[Array[(Long, Int)]] =
    try mp4SampleRanges0(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def mp4SampleRanges0(bytes: Array[Byte]): Option[Array[(Long, Int)]] = {
    val stbl = for {
      (mf, mu) <- findBox(bytes, 0, bytes.length, "moov")
      (tf, tu) <- findBox(bytes, mf, mu, "trak")
      (df, du) <- findBox(bytes, tf, tu, "mdia")
      (nf, nu) <- findBox(bytes, df, du, "minf")
      s <- findBox(bytes, nf, nu, "stbl")
    } yield s
    stbl.flatMap { case (sf, su) =>
      for {
        (zf, zu) <- findBox(bytes, sf, su, "stsz")
        (cf, cu) <- findBox(bytes, sf, su, "stsc")
        (of, ou) <- findBox(bytes, sf, su, "stco")
          .orElse(findBox(bytes, sf, su, "co64"))
      } yield {
        val co64 = findBox(bytes, sf, su, "stco").isEmpty
        val zb = java.nio.ByteBuffer.wrap(bytes, zf, su - zf)
        zb.position(zb.position() + 4) // ver+flags
        val fixedSize = math.max(zb.getInt(), 0)
        // declared counts clamp to what the payload can actually hold:
        // per-sample sizes to the stsz entries present, fixed-size
        // samples to the whole payload's capacity at that size
        val declared = zb.getInt().toLong
        val nSamples = math.max(0L, math.min(declared,
          if (fixedSize != 0) bytes.length.toLong / fixedSize + 1
          else (zu - zf - 12).toLong / 4)).toInt
        val sizes = Array.tabulate(nSamples)(i =>
          if (fixedSize != 0) fixedSize
          else math.max(java.nio.ByteBuffer.wrap(bytes, zf + 12 + i * 4, 4).getInt(), 0))
        val cb = java.nio.ByteBuffer.wrap(bytes, cf, su - cf)
        cb.position(cb.position() + 4)
        val nRuns = math.max(0L, math.min(cb.getInt().toLong, (cu - cf - 8).toLong / 12)).toInt
        val runs = Array.tabulate(nRuns) { i =>
          val b = java.nio.ByteBuffer.wrap(bytes, cf + 8 + i * 12, 12)
          (b.getInt(), b.getInt()) // (first_chunk 1-based, samples_per_chunk)
        }
        val ob = java.nio.ByteBuffer.wrap(bytes, of, ou - of)
        ob.position(ob.position() + 4)
        val entryW = if (co64) 8 else 4
        val nChunks = math.max(0L,
          math.min(ob.getInt().toLong, (ou - of - 8).toLong / entryW)).toInt
        val chunkOffsets = Array.tabulate(nChunks)(i =>
          if (co64) java.nio.ByteBuffer.wrap(bytes, of + 8 + i * 8, 8).getLong()
          else java.nio.ByteBuffer.wrap(bytes, of + 8 + i * 4, 4).getInt().toLong & 0xffffffffL)
        // walk chunks in order, expanding each stsc run until the next
        val out = new Array[(Long, Int)](nSamples)
        var sample = 0
        var chunk = 0
        while (chunk < nChunks && sample < nSamples && runs.nonEmpty) {
          var run = 0
          while (run + 1 < runs.length && runs(run + 1)._1 <= chunk + 1) run += 1
          val perChunk = runs(run)._2
          var off = chunkOffsets(chunk)
          var i = 0
          while (i < perChunk && sample < nSamples) {
            out(sample) = (off, sizes(sample))
            off += sizes(sample)
            sample += 1
            i += 1
          }
          chunk += 1
        }
        // a truncated walk (fewer chunks than declared samples) must not
        // leak null slots to callers
        if (sample < nSamples) out.take(sample) else out
      }
    }
  }

  /** Indices of up to n evenly spaced picks over `total` samples. */
  private def spacedIdx(total: Int, n: Int): Array[Int] = {
    val take = math.min(math.max(n, 1), total)
    Array.tabulate(take)(i => if (take == 1) 0 else (i.toLong * (total - 1) / (take - 1)).toInt)
  }

  /** Entropy decode of ONE coded sample. Real for intra-coded tracks the
    * JDK ships a codec for — Motion-JPEG (`jpeg`/`mjpa`/`mjpb` sample
    * entries), where every coded sample is a complete JPEG image — and
    * None for inter-frame codecs (H.264/VP9/AV1). This is the single
    * function a JNI/ffmpeg decoder would replace. */
  private[operators] def decodeSampleImage(sample: Array[Byte]): Option[BufferedImage] =
    decodeImage(sample)

  /** Up to n evenly spaced REALLY-DECODED frames of an MP4 payload:
    * container sample ranges → coded samples → ImageIO decode. Empty
    * when the container is unparseable or the codec undecodable. */
  private[operators] def decodedFrames(bytes: Array[Byte], n: Int): Array[BufferedImage] =
    mp4SampleRanges(bytes) match {
      case Some(ranges) if ranges.nonEmpty =>
        spacedIdx(ranges.length, n).iterator.flatMap { idx =>
          val (off, len) = ranges(idx)
          val from = math.min(math.max(off, 0L), bytes.length.toLong).toInt
          val until = math.min(off + len, bytes.length.toLong).toInt
          decodeSampleImage(java.util.Arrays.copyOfRange(bytes, from, until))
        }.toArray
      case _ => gifDecodedFrames(bytes, n) // animated GIF: the other fully-decodable container
    }

  /** Temporal-pooled PIXEL feature of a video payload: the mean 4x4 luma
    * thumbnail over up to 4 sampled, really-decoded frames. None when no
    * frame decodes (unparseable container or codec the JDK lacks). */
  private[operators] def videoFeature(bytes: Array[Byte]): Option[Array[Float]] = {
    val frames = decodedFrames(bytes, 4)
    if (frames.isEmpty) None
    else {
      val acc = new Array[Float](16)
      frames.foreach { f =>
        val ft = imageFeature(f)
        var i = 0
        while (i < 16) { acc(i) += ft(i); i += 1 }
      }
      Some(acc.map(_ / frames.length))
    }
  }

  /** Typed container metadata for the video rows of a media set —
    * (media_id, parseable, timescale, duration_sec, width, height,
    * codec, sample_count, sync_sample_count). Zero-shuffle projection;
    * non-video or unparseable rows report parseable = false. */
  def videoMetadata(media: Dataset[MediaRecord]): DataFrame = {
    implicit val enc = Encoders.product[(Long, Boolean, Long, Double, Int, Int, String, Long, Long)]
    media.mapPartitions(_.map { m =>
      decodeMp4Meta(m.bytes) match {
        case Some(x) if m.kind == "video" =>
          (m.media_id, true, x.timescale, x.durationSec, x.width, x.height,
            x.codec, x.sampleCount, x.syncSampleCount)
        case _ =>
          decodeGifMeta(m.bytes) match {
            // GIF delays tick in centiseconds -> timescale 100
            case Some(gf) if m.kind == "video" =>
              (m.media_id, true, 100L, gf.durationSec, gf.width, gf.height,
                "gif", gf.frames.length.toLong, gf.syncFrameCount)
            case _ => (m.media_id, false, 0L, 0.0, 0, 0, "", 0L, 0L)
          }
      }
    }).toDF("media_id", "parseable", "timescale", "duration_sec", "width", "height",
      "codec", "sample_count", "sync_sample_count")
  }

  // -------------------------------------------------- image near-dup
  /** 64-bit difference hash (dHash) of an image: bilinear downscale to
    * 9x8 grayscale, bit (y*8+x) set iff luma(x+1,y) > luma(x,y).
    * Robust to re-encoding, rescaling and mild noise — the standard
    * perceptual signature for image near-duplicate detection; pair via
    * `Dedup.hamming64Pairs` (4 x 16-bit pigeonhole). */
  private[operators] def dHash(img: BufferedImage): Long = {
    val small = new BufferedImage(9, 8, BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
      RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, 9, 8, null)
    g.dispose()
    def luma(x: Int, y: Int): Int = {
      val rgb = small.getRGB(x, y)
      (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
    }
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (luma(x + 1, y) > luma(x, y)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Perceptual signatures of the decodable image rows: (media_id,
    * dhash). Partition-local decode + hash — zero shuffle; rows that
    * do not decode are absent. Feed `Dedup.hamming64Pairs` for the
    * image near-duplicate pairs. */
  def imageHashes(media: Dataset[MediaRecord]): DataFrame = {
    implicit val enc = Encoders.product[(Long, Long)]
    media.mapPartitions(_.flatMap { m =>
      if (m.kind == "image") decodeImage(m.bytes).map(img => (m.media_id, dHash(img)))
      else None
    }).toDF("media_id", "dhash")
  }

  /** Image near-duplicate pairs end-to-end: decode → dHash → banded
    * Hamming pairing. */
  def imageNearDupPairs(media: Dataset[MediaRecord], maxHamming: Int = 3): DataFrame =
    graft.operators.Dedup.hamming64Pairs(
      imageHashes(media), idCol = "media_id", hashCol = "dhash", maxHamming = maxHamming)

  // -------------------------------------------------------- GIF video
  /** One GIF frame's container record: byte range of the coded image
    * segment (image separator through the last data sub-block), its
    * placement rectangle on the logical screen, its display delay
    * (centiseconds, from the preceding Graphic Control Extension) and
    * its disposal method (0/1 leave, 2 restore-to-background,
    * 3 restore-to-previous). */
  final case class GifFrame(rangeFrom: Int, rangeUntil: Int,
                            left: Int, top: Int, w: Int, h: Int,
                            delayCs: Int, disposal: Int)

  /** Animated-GIF container metadata (GIF87a/89a, a public spec like
    * ISO-BMFF): logical screen dims + the per-frame table. */
  final case class GifMeta(width: Int, height: Int, frames: Array[GifFrame]) {
    def durationSec: Double = frames.map(_.delayCs.toLong).sum / 100.0
    /** Frames that repaint the full logical screen and leave it in
      * place — independently renderable, the GIF notion of a sync
      * sample. */
    def syncFrameCount: Long = frames.count(f =>
      f.left == 0 && f.top == 0 && f.w == width && f.h == height && f.disposal <= 1).toLong
  }

  private def u16le(bytes: Array[Byte], o: Int): Int =
    (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)

  private[operators] def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 13 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  /** Byte-walk the GIF block structure (same philosophy as the MP4
    * parser: typed metadata and REAL coded-segment ranges from a
    * length-prefixed public container format, untrusted input degrades
    * to None — never an executor crash). */
  private[operators] def decodeGifMeta(bytes: Array[Byte]): Option[GifMeta] =
    try decodeGifMeta0(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeGifMeta0(bytes: Array[Byte]): Option[GifMeta] = {
    if (!isGif(bytes)) return None
    val w = u16le(bytes, 6)
    val h = u16le(bytes, 8)
    val packed = bytes(10) & 0xff
    var pos = 13 + (if ((packed & 0x80) != 0) 3 * (1 << ((packed & 7) + 1)) else 0)
    // skip length-prefixed sub-blocks from p0 through the 0 terminator
    def skipSubBlocks(p0: Int): Int = {
      var p = p0
      while (p < bytes.length && bytes(p) != 0) p += 1 + (bytes(p) & 0xff)
      p + 1
    }
    val frames = Array.newBuilder[GifFrame]
    var delay = 0
    var disposal = 0
    var done = false
    while (!done && pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          if (pos + 2 >= bytes.length) done = true
          else {
            if ((bytes(pos + 1) & 0xff) == 0xf9 && pos + 6 < bytes.length &&
              (bytes(pos + 2) & 0xff) >= 4) { // Graphic Control Extension
              disposal = ((bytes(pos + 3) & 0xff) >> 2) & 7
              delay = u16le(bytes, pos + 4)
            }
            pos = skipSubBlocks(pos + 2)
          }
        case 0x2c => // image descriptor
          if (pos + 10 > bytes.length) done = true
          else {
            val left = u16le(bytes, pos + 1)
            val top = u16le(bytes, pos + 3)
            val fw = u16le(bytes, pos + 5)
            val fh = u16le(bytes, pos + 7)
            val fpacked = bytes(pos + 9) & 0xff
            var p = pos + 10 +
              (if ((fpacked & 0x80) != 0) 3 * (1 << ((fpacked & 7) + 1)) else 0)
            p += 1 // LZW minimum code size
            val end = math.min(skipSubBlocks(p), bytes.length)
            frames += GifFrame(pos, end, left, top, fw, fh, delay, disposal)
            delay = 0
            disposal = 0
            pos = end
          }
        case 0x3b => done = true // trailer
        case _ => done = true // unknown block type: malformed, stop
      }
    }
    val fr = frames.result()
    if (fr.isEmpty) None else Some(GifMeta(w, h, fr))
  }

  /** Up to n evenly spaced COMPOSITED frames of an animated GIF:
    * ImageIO decodes each frame patch (the JDK ships a full GIF
    * codec), and the logical-screen canvas honors per-frame placement
    * and disposal (leave / restore-to-background / restore-to-
    * previous) — so sampled frames are what a viewer would show, not
    * raw patches. GIF is the inter-frame format the JDK CAN fully
    * decode end-to-end. */
  private[operators] def gifDecodedFrames(bytes: Array[Byte], n: Int): Array[BufferedImage] =
    try {
      decodeGifMeta(bytes) match {
        case Some(meta) if meta.frames.nonEmpty && meta.width > 0 && meta.height > 0 =>
          val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return Array.empty
          val reader = readers.next()
          reader.setInput(iis, false, true)
          val wanted = spacedIdx(meta.frames.length, n)
          val wantSet = wanted.toSet
          val canvas = new BufferedImage(meta.width, meta.height, BufferedImage.TYPE_INT_RGB)
          val g = canvas.createGraphics()
          def snapshot(): BufferedImage = {
            val c = new BufferedImage(meta.width, meta.height, BufferedImage.TYPE_INT_RGB)
            val cg = c.createGraphics(); cg.drawImage(canvas, 0, 0, null); cg.dispose()
            c
          }
          val out = Array.newBuilder[BufferedImage]
          try {
            var i = 0
            val last = wanted.max
            while (i <= last && i < meta.frames.length) {
              val f = meta.frames(i)
              val saved = if (f.disposal == 3) snapshot() else null
              g.drawImage(reader.read(i), f.left, f.top, null)
              if (wantSet(i)) out += snapshot()
              f.disposal match {
                case 2 => // restore to background: clear the frame rect
                  g.setColor(java.awt.Color.BLACK)
                  g.fillRect(f.left, f.top, f.w, f.h)
                case 3 => if (saved != null) g.drawImage(saved, 0, 0, null)
                case _ => ()
              }
              i += 1
            }
          } finally { g.dispose(); reader.dispose() }
          out.result()
        case _ => Array.empty
      }
    } catch { case scala.util.control.NonFatal(_) => Array.empty }

  // -------------------------------------------------------- fallback
  /** Opaque-format fallback (for payloads no parser recognizes): 16-bin
    * byte histogram, L1-normalized — deterministic, content-sensitive,
    * feature-shaped. */
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
        case "video" => videoFeature(m.bytes).getOrElse(byteHistogram(m.bytes))
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

  /** FRAME-SAMPLE: a parseable MP4 container yields n CODED SAMPLES,
    * evenly spaced across its sample table — REAL extraction through
    * stsz/stsc/stco byte ranges (each emitted frame is one coded access
    * unit, exactly what a pre-decode pipeline stage ships onward); any
    * other payload falls back to n equal byte chunks. Explodes rows —
    * still shuffle-free. */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): Dataset[MediaFrame] = {
    implicit val enc = Encoders.product[MediaFrame]
    media.flatMap { m =>
      mp4SampleRanges(m.bytes) match {
        case Some(ranges) if ranges.nonEmpty =>
          spacedIdx(ranges.length, n).iterator.zipWithIndex.map { case (idx, i) =>
            val (off, len) = ranges(idx)
            val from = math.min(math.max(off, 0L), m.bytes.length.toLong).toInt
            val until = math.min(off + len, m.bytes.length.toLong).toInt
            MediaFrame(m.media_id, i, java.util.Arrays.copyOfRange(m.bytes, from, until))
          }
        case _ if decodeGifMeta(m.bytes).isDefined =>
          // GIF coded segments: image separator through last data sub-block
          val frames = decodeGifMeta(m.bytes).get.frames
          spacedIdx(frames.length, n).iterator.zipWithIndex.map { case (idx, i) =>
            val f = frames(idx)
            MediaFrame(m.media_id, i,
              java.util.Arrays.copyOfRange(m.bytes, f.rangeFrom, f.rangeUntil))
          }
        case _ =>
          val chunk = math.max(m.bytes.length / math.max(n, 1), 1)
          (0 until n).iterator.map { i =>
            val from = math.min(i * chunk, m.bytes.length)
            val until = if (i == n - 1) m.bytes.length else math.min((i + 1) * chunk, m.bytes.length)
            MediaFrame(m.media_id, i, java.util.Arrays.copyOfRange(m.bytes, from, until))
          }
      }
    }
  }

  /** Media features → the Similarity/Dedup embedding surface: a DataFrame
    * with (vec_id, embedding) compatible with Similarity.cosineTopK and
    * Dedup.embeddingNearDupPairs. */
  def asEmbeddings(features: Dataset[MediaFeature]): DataFrame =
    features.toDF().select(col("media_id").as("vec_id"), col("feature").as("embedding"))

  /** Deterministic synthetic media for tests/demos — ALL payloads real:
    * images are encoded PNGs (per-id seeded RGB noise over a gradient),
    * audio rows are RIFF/WAVE 16-bit PCM sine tones (frequency varies
    * by id), video rows are Motion-JPEG MP4s (4 JPEG-coded frames in a
    * spec-correct ISO-BMFF container). */
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
          val bytes = syntheticMjpegMp4(id)
          MediaRecord(id, "video", bytes, 64, 48, 0, "mp4")
      }
    }
  }

  // ------------------------------------- synthetic ISO-BMFF container
  private def u32be(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(v).array()

  private def bmffBox(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.toArray.flatten
    u32be(body.length + 8) ++
      tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body
  }

  /** Deterministic byte j of synthetic sample i for `seed` — shared with
    * the spec so frame extraction can be verified content-for-content. */
  private[operators] def syntheticMp4SampleByte(seed: Long, i: Int, j: Int): Byte =
    ((seed * 7 + i * 31 + j) & 0xff).toByte

  private[operators] def syntheticMp4SampleLen(seed: Long, i: Int): Int =
    24 + (((seed + i) % 13L).toInt + 13) % 13

  /** Minimal but SPEC-CORRECT ISO-BMFF container around `samples`: ftyp
    * + mdat + moov(mvhd, trak(tkhd, mdia(minf(stbl(stsd `codec`, stts,
    * stss, stsz, stsc, stco))))). timescale 600, duration 1200 (2 s),
    * 2 sync samples. Built box-by-box from ISO/IEC 14496-12 like the
    * golden pgoutput frames — the parser and this builder share only
    * the published layout. */
  private def buildMp4(samples: Array[Array[Byte]], codec: String, w: Int, h: Int): Array[Byte] = {
    val ftyp = bmffBox("ftyp",
      "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII), u32be(0))
    val mdat = bmffBox("mdat", samples.flatten)
    val mdatPayloadOffset = ftyp.length + 8
    val mvhd = bmffBox("mvhd", u32be(0) /* v0 + flags */,
      u32be(0), u32be(0) /* creation, modification */,
      u32be(600) /* timescale */, u32be(1200) /* duration */,
      new Array[Byte](80) /* rate..next_track_ID */)
    val tkhd = bmffBox("tkhd", u32be(0), u32be(0), u32be(0),
      u32be(1) /* track id */, u32be(0), u32be(1200) /* duration */,
      new Array[Byte](52) /* reserved..matrix */,
      u32be(w << 16), u32be(h << 16) /* 16.16 fixed */)
    val stsd = bmffBox("stsd", u32be(0), u32be(1) /* entries */,
      u32be(16), codec.getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      new Array[Byte](8))
    val stts = bmffBox("stts", u32be(0), u32be(1), u32be(samples.length), u32be(300))
    val stss = bmffBox("stss", u32be(0), u32be(2), u32be(1), u32be(3))
    val stsz = bmffBox("stsz", u32be(0), u32be(0) /* per-sample */,
      u32be(samples.length), samples.flatMap(s => u32be(s.length)))
    val stsc = bmffBox("stsc", u32be(0), u32be(1),
      u32be(1), u32be(samples.length), u32be(1))
    val stco = bmffBox("stco", u32be(0), u32be(1), u32be(mdatPayloadOffset))
    val stbl = bmffBox("stbl", stsd, stts, stss, stsz, stsc, stco)
    val moov = bmffBox("moov", mvhd,
      bmffBox("trak", tkhd, bmffBox("mdia", bmffBox("minf", stbl))))
    ftyp ++ mdat ++ moov
  }

  /** avc1-tagged container with 4 deterministic OPAQUE coded samples
    * (the formula above) — exercises container parsing and byte-exact
    * sample extraction for a codec the JDK cannot decode. */
  private[operators] def syntheticMp4(seed: Long, w: Int = 64, h: Int = 48): Array[Byte] =
    buildMp4(
      Array.tabulate(4)(i =>
        Array.tabulate(syntheticMp4SampleLen(seed, i))(j => syntheticMp4SampleByte(seed, i, j))),
      "avc1", w, h)

  /** Seeded frame i: horizontal luma gradient plus a bright block that
    * moves with the frame index, so decoded-pixel features vary across
    * frames and seeds. */
  private[operators] def syntheticVideoFrame(seed: Long, i: Int, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val blockW = w / 4
    val blockX = ((seed + i) % 4).toInt * blockW
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = 160 * x / math.max(w - 1, 1)
        val v = if (x >= blockX && x < blockX + blockW && y >= h / 4 && y < 3 * h / 4) 255
        else base
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Motion-JPEG container: every coded sample is a complete JPEG image
    * (ImageIO-encoded), sample entry `jpeg` — the video fixture the
    * WHOLE pipeline really decodes, container through pixels. */
  private[operators] def syntheticMjpegMp4(seed: Long, w: Int = 64, h: Int = 48): Array[Byte] =
    buildMp4(
      Array.tabulate(4) { i =>
        val baos = new ByteArrayOutputStream()
        ImageIO.write(syntheticVideoFrame(seed, i, w, h), "jpg", baos)
        baos.toByteArray
      },
      "jpeg", w, h)

  /** Seeded animated GIF (same moving-block frames as the MJPEG
    * fixture): written with the JDK's own GIF sequence writer —
    * full-screen frames, disposal none, 5 cs delay each. */
  private[operators] def syntheticGif(seed: Long, w: Int = 64, h: Int = 48,
                                      nFrames: Int = 4): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nFrames).foreach { i =>
      val img = syntheticVideoFrame(seed, i, w, h)
      val meta = writer.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromRenderedImage(img), writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val gce = new IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", "5")
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence()
    ios.close()
    baos.toByteArray
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
  private[operators] def syntheticWav(seed: Long, sampleRate: Int, nSamples: Int): Array[Byte] =
    syntheticWavAt(seed, sampleRate, nSamples, 220.0 * (1 + (seed % 5)))

  /** Sine tone at an explicit frequency (Hz) — for spectral tests. */
  private[operators] def syntheticWavAt(seed: Long, sampleRate: Int, nSamples: Int,
                                        freqHz: Double): Array[Byte] = {
    val freq = freqHz
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
