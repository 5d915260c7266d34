package graft.operators

import graft.SparkSpec

/** Multimodal plumbing: schema/partitioning/batch shape are real; the
  * codec is a deterministic stub (no media libs in the container). */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark, 50)

  test("feature extraction is deterministic, normalized, and shuffle-free") {
    val feats = Multimodal.extractFeatures(Multimodal.repartitionForDecode(media, 4))
    val rows = feats.collect()
    assert(rows.length === 50)
    rows.foreach { f =>
      assert(f.feature.length === 16)
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3, "histogram must be L1-normalized")
    }
    // determinism across runs
    val again = Multimodal.extractFeatures(media).collect()
    assert(rows.sortBy(_.media_id).map(_.feature.toSeq) ===
      again.sortBy(_.media_id).map(_.feature.toSeq))
  }

  test("resize updates metadata and byte payload size") {
    val out = Multimodal.resize(media, 16, 16).collect()
    assert(out.forall(m => m.width == 16 && m.height == 16 && m.bytes.length == 256))
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
