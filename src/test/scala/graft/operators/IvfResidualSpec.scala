package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVFADC residual encoding (Jégou et al. 2011 §IV.B): codes encode
  * rot(v − c_list), so the same m bytes must reconstruct the full
  * vector strictly better than raw-vector PQ on clustered data, the
  * residual marker must survive the sidecar round-trip, and every
  * lifecycle verb (append, compact, delete) must compose unchanged. */
class IvfResidualSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  private def clustered(nClusters: Int, perCluster: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = for {
      c <- 0 until nClusters
      m <- 0 until perCluster
    } yield ((c * perCluster + m).toLong,
      centers(c).map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    rows.toDF("vec_id", "embedding")
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("ivfadc").toString

  private def fullRecon(cb: Quantize.PqCodebook,
                        centroids: Array[Array[Double]],
                        v: Array[Double], list: Int): Array[Double] = {
    val input =
      if (cb.residual) Array.tabulate(v.length)(i => v(i) - centroids(list)(i))
      else v
    val dec = Quantize.pqDecodeLocal(cb, Quantize.pqEncodeLocal(cb, input))
    if (cb.residual) Array.tabulate(v.length)(i => centroids(list)(i) + dec(i))
    else dec
  }

  private def mseOver(cb: Quantize.PqCodebook, centroids: Array[Array[Double]],
                      rows: Array[(Array[Double], Int)]): Double =
    rows.map { case (v, l) =>
      val r = fullRecon(cb, centroids, v, l)
      v.zip(r).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum / rows.length

  test("residual marker survives the sidecar; raw index stays unmarked") {
    val df = clustered(8, 16, seed = 7L)
    val idx = Similarity.buildIvfIndex(df, nLists = 8)
    val (pRaw, pRes) = (tmp(), tmp())
    Similarity.writeIvfIndexPq(idx, pRaw, m = 4, nCentroids = 16)
    Similarity.writeIvfIndexPqResidual(idx, pRes, m = 4, nCentroids = 16)
    assert(!Similarity.readPqCodebook(spark, pRaw).get.residual)
    assert(Similarity.readPqCodebook(spark, pRes).get.residual)
    Storage.releaseAll()
    Seq(pRaw, pRes).foreach(Manifests.rmTree)
  }

  test("same m bytes, strictly lower full-vector reconstruction error") {
    // the published IVFADC regime: coarse structure (32 cluster modes)
    // exceeds what 8 centroids per subspace can carve up raw, while the
    // residual codebook only has to model the noise blob around zero
    val df = clustered(32, 8, seed = 21L)
    val idx = Similarity.buildIvfIndex(df, nLists = 32)
    val (pRaw, pRes) = (tmp(), tmp())
    Similarity.writeIvfIndexPq(idx, pRaw, m = 4, nCentroids = 8)
    Similarity.writeIvfIndexPqResidual(idx, pRes, m = 4, nCentroids = 8)
    val cbRaw = Similarity.readPqCodebook(spark, pRaw).get
    val cbRes = Similarity.readPqCodebook(spark, pRes).get
    val rows = idx.assigned.select(col("vec_id"), col("e"), col("list"))
      .collect().map(r => (r.getSeq[Double](1).toArray, r.getInt(2)))
    val (mseRaw, mseRes) =
      (mseOver(cbRaw, idx.centroids, rows), mseOver(cbRes, idx.centroids, rows))
    assert(mseRes < mseRaw,
      s"residual MSE $mseRes not below raw MSE $mseRaw")
    Storage.releaseAll()
    Seq(pRaw, pRes).foreach(Manifests.rmTree)
  }

  test("residual ADC: UDF scores equal the driver re-derivation; probe exact") {
    val df = clustered(8, 16, seed = 33L)
    val idx = Similarity.buildIvfIndex(df, nLists = 8)
    val p = tmp()
    Similarity.writeIvfIndexPqResidual(idx, p, m = 4, nCentroids = 16)
    val cb = Similarity.readPqCodebook(spark, p).get
    val re = Similarity.readIvfIndex(spark, p)
    val probe = df.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val lut = Quantize.pqAdcLutResidual(cb, probe,
      idx.centroids.indices.map(l => l -> idx.centroids(l)).toMap)
    val adc = Quantize.pqAdcScoreResidualUdf(lut)
    val sample = re.assigned.orderBy("vec_id").limit(30)
      .select(col("vec_id"), col("list").cast("int").as("list"), col("pq"),
        adc(col("list").cast("int"), col("pq")).as("adc")).collect()
    assert(sample.forall { r =>
      r.getDouble(3) == Quantize.pqAdcScoreResidualLocal(lut, r.getInt(1),
        r.getAs[Array[Byte]]("pq"))
    })
    // the probe through the residual index recovers the probe's cluster
    // with EXACT reranked scores (cluster-mates of 0 are 0..15)
    val got = Similarity.probeIvfPq(spark, p, probe, k = 10, nProbe = 8,
      shortlist = 8, excludeId = Some(0L)).collect()
    assert(got.map(_.getLong(0)).forall(id => id >= 1L && id <= 15L))
    Storage.releaseAll()
    Manifests.rmTree(p)
  }

  test("OPQ composes with residual encoding: rotation trains on residuals, MSE still wins") {
    val df = clustered(32, 8, seed = 77L)
    val idx = Similarity.buildIvfIndex(df, nLists = 32)
    val (pRaw, pRes) = (tmp(), tmp())
    Similarity.writeIvfIndexPq(idx, pRaw, m = 4, nCentroids = 8)
    Similarity.writeIvfIndexPqResidual(idx, pRes, m = 4, nCentroids = 8, opq = true)
    val cbRes = Similarity.readPqCodebook(spark, pRes).get
    assert(cbRes.residual && cbRes.rot.isDefined) // both tiers marked
    val cbRaw = Similarity.readPqCodebook(spark, pRaw).get
    val rows = idx.assigned.select(col("vec_id"), col("e"), col("list"))
      .collect().map(r => (r.getSeq[Double](1).toArray, r.getInt(2)))
    assert(mseOver(cbRes, idx.centroids, rows) < mseOver(cbRaw, idx.centroids, rows))
    // the probe path serves through rotation + residual together
    val probe = df.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val got = Similarity.probeIvfPq(spark, pRes, probe, k = 5, nProbe = 8,
      shortlist = 8, excludeId = Some(0L)).collect()
    assert(got.map(_.getLong(0)).forall(id => id >= 1L && id <= 7L))
    Storage.releaseAll()
    Seq(pRaw, pRes).foreach(Manifests.rmTree)
  }

  test("lifecycle composes: append encodes residuals; compact + delete keep probes exact") {
    val df = clustered(8, 16, seed = 55L)
    val idx = Similarity.buildIvfIndex(df, nLists = 8)
    val p = tmp()
    Similarity.writeIvfIndexPqResidual(idx, p, m = 4, nCentroids = 16)
    val re = Similarity.readIvfIndex(spark, p)
    val probe = df.filter(col("vec_id") === 1L)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    // planted duplicate arrives through a streaming-style append
    val planted = Seq((90001L, probe.map(_.toFloat).toSeq)).toDF("vec_id", "embedding")
    Similarity.appendIvfBatch(re, planted, p, batchId = 1L)
    val top = Similarity.probeIvfPq(spark, p, probe, k = 1, nProbe = 8,
      excludeId = Some(1L)).head()
    assert(top.getLong(0) === 90001L && top.getDouble(1) === 1.0)
    // compaction is transparent
    val before = Similarity.probeIvfPq(spark, p, probe, k = 10, nProbe = 8,
      excludeId = Some(1L)).collect().toSeq
    Similarity.compactIvfIndex(spark, p, uptoBatch = 1L)
    val after = Similarity.probeIvfPq(spark, p, probe, k = 10, nProbe = 8,
      excludeId = Some(1L)).collect().toSeq
    assert(before === after)
    // takedown forgets the planted duplicate
    Similarity.deleteFromIvfIndex(spark, p, Seq(90001L))
    val post = Similarity.probeIvfPq(spark, p, probe, k = 10, nProbe = 8,
      excludeId = Some(1L)).collect().map(_.getLong(0))
    assert(!post.contains(90001L))
    Storage.releaseAll()
    Manifests.rmTree(p)
  }
}
