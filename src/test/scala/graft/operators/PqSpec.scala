package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF-PQ product quantization (r15, VERDICT r14 missing #3; Jégou et
  * al. 2011): per-subspace codebooks, one-byte codes, ADC scoring, and
  * the persisted-index integration (codebook sidecar, append encode,
  * rebuild carry). The mathematical identity under test: the ADC score
  * IS cosine(probe, reconstruction), so the scan's value is exactly
  * re-derivable from the stored codes + codebook. */
class PqSpec extends SparkSpec {
  import graft.operators.Quantize._

  private lazy val emb = spark.read.parquet(s"$sfDirDocs/embeddings.parquet")

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private lazy val vecs: Array[Array[Double]] =
    emb.select(col("embedding").cast("array<double>"))
      .limit(300).collect().map(_.getSeq[Double](0).toArray)

  test("train/encode: deterministic, m bytes, dim divisibility enforced") {
    val cb = pqTrainLocal(vecs, m = 8, nCentroids = 64)
    assert(cb.m === 8 && cb.dsub === 8 && cb.nCentroids <= 64)
    val c1 = pqEncodeLocal(cb, vecs(0))
    val c2 = pqEncodeLocal(cb, vecs(0))
    assert(c1.toSeq === c2.toSeq && c1.length === 8)
    val cb2 = pqTrainLocal(vecs, m = 8, nCentroids = 64)
    assert(cb.codebooks.flatten.flatten.toSeq === cb2.codebooks.flatten.flatten.toSeq)
    intercept[IllegalArgumentException](pqTrainLocal(vecs, m = 7))
  }

  test("ADC score == cosine(probe, reconstruction) — the exact identity") {
    val cb = pqTrainLocal(vecs, m = 8, nCentroids = 64)
    val probe = vecs(17)
    val (dots, sq) = pqAdcLut(cb, probe)
    val pn = math.sqrt(probe.map(x => x * x).sum)
    vecs.take(50).foreach { v =>
      val codes = pqEncodeLocal(cb, v)
      val adc = pqAdcScoreLocal(dots, sq, pn, codes)
      val direct = cos(probe, pqDecodeLocal(cb, codes))
      assert(math.abs(adc - direct) < 1e-9, s"adc=$adc direct=$direct")
    }
  }

  test("reconstruction is usable: ADC ranks true neighbors ahead of strangers") {
    val cb = pqTrainLocal(vecs, m = 8, nCentroids = 256)
    val probe = vecs(3)
    val (dots, sq) = pqAdcLut(cb, probe)
    val pn = math.sqrt(probe.map(x => x * x).sum)
    val scored = vecs.zipWithIndex.map { case (v, i) =>
      (i, pqAdcScoreLocal(dots, sq, pn, pqEncodeLocal(cb, v)), cos(probe, v))
    }
    val adcTop = scored.sortBy(-_._2).take(20).map(_._1).toSet
    val trueTop = scored.sortBy(-_._3).take(10).map(_._1).toSet
    // the 2x ADC shortlist covers >= 80% of the true top-10 (the
    // clustered synthetic corpus; the q135 contract gates the
    // end-to-end index at >= 0.9 with the standard 4x shortlist)
    assert(trueTop.count(adcTop) >= 8, s"covered ${trueTop.count(adcTop)}/10")
  }

  test("persisted IVF-PQ: codebook roundtrip, probe recall, append encodes, rebuild carries") {
    val path = tmpDir("pq-idx")
    val idx = Similarity.buildIvfIndex(emb, nLists = 8)
    Similarity.writeIvfIndexPq(idx, path, m = 8, nCentroids = 256)
    // codebook roundtrip
    val cb = Similarity.readPqCodebook(spark, path).get
    assert(cb.m === 8 && cb.dsub === 8)
    // stored codes: BINARY, exactly m bytes, re-derivable from e
    val reRead = Similarity.readIvfIndex(spark, path)
    assert(reRead.pq.isDefined)
    val rows = reRead.assigned.select("vec_id", "e", "pq").limit(50).collect()
    rows.foreach { r =>
      val stored = r.getAs[Array[Byte]]("pq")
      assert(stored.length === 8)
      assert(stored.toSeq === pqEncodeLocal(cb, r.getSeq[Double](1).toArray).toSeq)
    }
    // probe: exact rerank contract + recall vs brute force
    val probeVec = emb.filter(col("vec_id") === 5L)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val got = Similarity.probeIvfPq(spark, path, probeVec, k = 10,
        nProbe = 8, excludeId = Some(5L))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Similarity.cosineTopK(emb, 5L, 10)
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).count(exact) >= 9, s"recall ${got.map(_._1).count(exact)}/10")
    // returned scores are EXACT float cosines (round-4), not ADC values
    val byId = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .filter(col("vec_id").isin(got.map(_._1).toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (id, s) => assert(s === r4(cos(byId(id), probeVec))) }
    // append encodes against the same codebooks
    import spark.implicits._
    val extra = Seq((9001L, probeVec.toSeq)).toDF("vec_id", "embedding")
    Similarity.appendIvfBatch(reRead, extra, path, batchId = 1L)
    val appended = Similarity.readIvfIndex(spark, path).assigned
      .filter(col("vec_id") === 9001L).select("pq").head().getAs[Array[Byte]](0)
    assert(appended.toSeq === pqEncodeLocal(cb, probeVec).toSeq)
    // the appended self-duplicate is now the probe's top hit
    val got2 = Similarity.probeIvfPq(spark, path, probeVec, k = 1, nProbe = 8,
      excludeId = Some(5L)).head()
    assert(got2.getLong(0) === 9001L && got2.getDouble(1) === 1.0)
    // rebuild carries codes and codebooks into the new generation
    Similarity.rebuildIvfIndex(spark, path)
    val gen = Similarity.readIvfIndex(spark, path)
    assert(gen.pq.isDefined)
    assert(gen.assigned.filter(col("pq").isNull).count() === 0L)
    val got3 = Similarity.probeIvfPq(spark, path, probeVec, k = 1, nProbe = 8,
      excludeId = Some(5L)).head()
    assert(got3.getLong(0) === 9001L)
    Storage.releaseAll(true)
  }
}
