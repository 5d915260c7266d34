package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travel as opaque `binary` columns with typed
  * metadata; decode / feature-extract / resize / frame-sample run as
  * partition-local batch transforms.
  *
  * The actual codec work is STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives a deterministic per-byte-histogram
  * "feature" so tests can assert exact values end-to-end. The Spark-side
  * contract — schema, binary batching, partitioning, the
  * `mapPartitions`-over-typed-rows shape (Scala's analogue of an Arrow
  * `mapInPandas` batch UDF) — is real and is what survives swapping the
  * stub for a JNI/ffmpeg/turbo-jpeg decoder on a cluster.
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

  /** DECODE STUB — deterministic stand-in for an image/audio codec.
    * Real implementation would hand `bytes` to a native decoder here;
    * everything around this call is production-shaped. */
  private[operators] def decodeStub(bytes: Array[Byte]): Array[Float] = {
    // 16-bin byte histogram, L1-normalized: deterministic, content-
    // sensitive, cheap — a fake "embedding" with a real feature's shape.
    val bins = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { bins((bytes(i) & 0xFF) >> 4) += 1f; i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    bins.map(_ / n)
  }

  /** Count-balanced repartition ahead of CPU-bound decode. */
  def repartitionForDecode(media: Dataset[MediaRecord], partitions: Int): Dataset[MediaRecord] =
    media.repartition(partitions, col("media_id"))

  /** Batch feature extraction: partition-local, zero-shuffle. The
    * iterator-in/iterator-out shape processes rows streaming-wise without
    * materializing a partition in memory. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeature] = {
    implicit val enc = Encoders.product[MediaFeature]
    media.mapPartitions(_.map { m =>
      MediaFeature(m.media_id, m.kind, m.bytes.length.toLong, decodeStub(m.bytes))
    })
  }

  /** RESIZE STUB: metadata-correct resize; byte payload is deterministic
    * truncate/pad to the implied size (real impl: decoder + scaler). */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    media.mapPartitions(_.map { m =>
      val target = math.max(w * h, 1)
      val out = java.util.Arrays.copyOf(m.bytes, target)
      m.copy(bytes = out, width = w, height = h)
    })
  }

  /** FRAME-SAMPLE STUB: split the payload into n equal chunks ("frames");
    * real impl seeks keyframes. Explodes rows — still shuffle-free. */
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

  /** Deterministic synthetic media generator for tests/demos (the sandbox
    * has no real media files). */
  def syntheticMedia(spark: SparkSession, n: Int, seedBytes: Int = 256): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    import spark.implicits._
    spark.range(n).map { id =>
      val rnd = new scala.util.Random(id) // per-id seed: deterministic
      val bytes = Array.fill(seedBytes + (id % 7).toInt * 32)(rnd.nextInt(256).toByte)
      MediaRecord(id, if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video",
        bytes, 32, 32, 16000, "raw")
    }
  }
}
