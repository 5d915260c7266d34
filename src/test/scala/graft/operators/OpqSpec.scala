package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** OPQ rotation tier for the IVF-PQ index (r15; Gong, Lazebnik, Gordo,
  * Perronnin 2013 — the parametric OPQ-P variant: PCA basis +
  * eigenvalue-balanced allocation of principal directions to the m
  * subspaces). Under test: the Jacobi eigensolver on closed-form
  * matrices, rotation orthonormality and cosine invariance, the
  * balanced allocation actually balancing, the MSE win over plain PQ
  * on correlated data, and the full persisted-index composition
  * (sidecar roundtrip, probe, append, rebuild carry). */
class OpqSpec extends SparkSpec {
  import graft.operators.Quantize._

  private lazy val emb = spark.read.parquet(s"$sfDirDocs/embeddings.parquet")

  private lazy val vecs: Array[Array[Double]] =
    emb.select(col("embedding").cast("array<double>"))
      .limit(400).collect().map(_.getSeq[Double](0).toArray)

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  // deterministic LCG so synthetic samples need no Random
  private def lcg(seed: Long): Iterator[Double] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)
      .drop(1).map(s => ((s >>> 11).toDouble / (1L << 53).toDouble) - 0.5)

  test("jacobiEigenSym: closed-form 2x2 and 3x3, descending order, orthonormal") {
    val (ev, evec) = jacobiEigenSym(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(ev(0) - 3.0) < 1e-12 && math.abs(ev(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2.0)
    // eigenvector of 3 is (1,1)/sqrt2 up to sign
    assert(math.abs(math.abs(evec(0)(0)) - s) < 1e-12 &&
      math.abs(evec(0)(0) - evec(0)(1)) < 1e-12)
    // diag matrix: eigenvalues sort, vectors are (signed) unit axes
    val (ev3, evec3) = jacobiEigenSym(Array(
      Array(1.0, 0.0, 0.0), Array(0.0, 5.0, 0.0), Array(0.0, 0.0, 3.0)))
    assert(ev3.toSeq === Seq(5.0, 3.0, 1.0))
    assert(math.abs(math.abs(evec3(0)(1)) - 1.0) < 1e-12)
    // reconstruction: A == V^T diag(ev) V with rows as eigenvectors
    val a = Array(Array(4.0, 1.0, 0.5), Array(1.0, 3.0, 0.2), Array(0.5, 0.2, 2.0))
    val (l, v) = jacobiEigenSym(a)
    for (i <- 0 until 3; j <- 0 until 3) {
      val aij = (0 until 3).map(k => v(k)(i) * l(k) * v(k)(j)).sum
      assert(math.abs(aij - a(i)(j)) < 1e-9, s"A($i)($j)")
    }
  }

  test("pcaRotation: orthonormal, deterministic, cosine-invariant") {
    val r = pcaRotation(vecs, m = 8)
    val d = r.length
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => r(i)(k) * r(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"RR^T($i)($j)=$dot")
    }
    val r2 = pcaRotation(vecs, m = 8)
    assert(r.flatten.toSeq === r2.flatten.toSeq)
    // rotation preserves cosine exactly up to float error
    val (a, b) = (vecs(5), vecs(9))
    assert(math.abs(cos(rotateLocal(r, a), rotateLocal(r, b)) - cos(a, b)) < 1e-12)
    // rotateT inverts rotate
    val rt = rotateTLocal(r, rotateLocal(r, a))
    a.indices.foreach(i => assert(math.abs(rt(i) - a(i)) < 1e-9))
  }

  test("eigenvalue-balanced allocation: high-variance directions spread across subspaces") {
    // diagonal covariance with two dominant dims: plain contiguous
    // slicing puts both in subspace 0; the balanced allocation must
    // separate them (bucket products balance in log space)
    val it = lcg(42L)
    val sample = Array.fill(600) {
      val g = Array.fill(4)(it.next())
      Array(g(0) * 100.0, g(1) * 90.0, g(2) * 1.0, g(3) * 1.0)
    }
    val r = pcaRotation(sample, m = 2)
    // row 0 (subspace 0, first direction) aligns with raw dim 0; row 2
    // (subspace 1, first direction) aligns with raw dim 1 — argmax by
    // |component| (sample covariance noise keeps the alignment a bit
    // under 1.0; the PROPERTY is that the two dominant raw dims land
    // in DIFFERENT subspaces, where contiguous slicing packs both
    // into subspace 0)
    def argmaxAbs(row: Array[Double]): Int =
      row.indices.maxBy(i => math.abs(row(i)))
    assert(argmaxAbs(r(0)) === 0 && math.abs(r(0)(0)) > 0.95, s"r0=${r(0).toSeq}")
    assert(argmaxAbs(r(2)) === 1 && math.abs(r(2)(1)) > 0.95, s"r2=${r(2).toSeq}")
  }

  test("OPQ beats plain PQ on correlated data; never worse on the real sample") {
    // strongly correlated synthetic: x_i = base + small noise, so raw
    // contiguous subspaces each see the full shared variance
    val it = lcg(7L)
    val corr = Array.fill(500) {
      val base = it.next() * 10.0
      Array.fill(16)(base + it.next())
    }
    val plainC = pqTrainLocal(corr, m = 4, nCentroids = 8)
    val opqC = opqTrainLocal(corr, m = 4, nCentroids = 8)
    val (mp, mo) = (pqMseLocal(plainC, corr), pqMseLocal(opqC, corr))
    assert(mo < mp * 0.9, s"opq=$mo plain=$mp — expected a clear win on correlated data")
    // real embedding sample at a code budget where error is substantive
    val plainE = pqTrainLocal(vecs, m = 8, nCentroids = 16)
    val opqE = opqTrainLocal(vecs, m = 8, nCentroids = 16)
    val (ep, eo) = (pqMseLocal(plainE, vecs), pqMseLocal(opqE, vecs))
    assert(eo <= ep, s"opq=$eo plain=$ep")
  }

  test("ADC identity holds under rotation: score == cosine(probe, reconstruction)") {
    val cb = opqTrainLocal(vecs, m = 8, nCentroids = 64)
    assert(cb.rot.isDefined)
    val probe = vecs(11)
    val (dots, sq) = pqAdcLut(cb, probe)
    val pn = math.sqrt(probe.map(x => x * x).sum)
    vecs.take(50).foreach { v =>
      val codes = pqEncodeLocal(cb, v)
      val adc = pqAdcScoreLocal(dots, sq, pn, codes)
      val direct = cos(probe, pqDecodeLocal(cb, codes))
      assert(math.abs(adc - direct) < 1e-9, s"adc=$adc direct=$direct")
    }
  }

  test("persisted OPQ index: rotation roundtrips, probe works, append + rebuild carry it") {
    val path = java.nio.file.Files.createTempDirectory("opq-idx").toString
    val idx = Similarity.buildIvfIndex(emb, nLists = 8)
    Similarity.writeIvfIndexOpq(idx, path, m = 8, nCentroids = 64)
    val cb = Similarity.readPqCodebook(spark, path).get
    assert(cb.rot.isDefined && cb.rot.get.length === 64)
    // the read-back rotation is exactly the trained one
    val sample = idx.assigned.select(col("vec_id"), col("e"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(4096)
      .collect().map(_.getSeq[Double](1).toArray)
    val trained = opqTrainLocal(sample, m = 8, nCentroids = 64)
    assert(cb.rot.get.flatten.toSeq === trained.rot.get.flatten.toSeq)
    assert(cb.codebooks.flatten.flatten.toSeq === trained.codebooks.flatten.flatten.toSeq)
    // probe returns exact float scores and finds the self-vector
    val pv = vecs(0)
    val got = Similarity.probeIvfPq(spark, path, pv, k = 5, nProbe = 8,
      shortlist = 16).collect()
    assert(got.nonEmpty && got.head.getDouble(1) === 1.0) // vec 0 itself
    // append encodes through the SAME rotation: planted duplicate wins
    import spark.implicits._
    val re = Similarity.readIvfIndex(spark, path)
    Similarity.appendIvfBatch(re, Seq((70001L, pv.toSeq)).toDF("vec_id", "embedding"),
      path, batchId = 1L)
    val top = Similarity.probeIvfPq(spark, path, pv, k = 1, nProbe = 8,
      excludeId = Some(0L)).head()
    assert(top.getLong(0) === 70001L && top.getDouble(1) === 1.0)
    // rebuild carries codes + codebooks + rotation into the new generation
    Similarity.rebuildIvfIndex(spark, path, nLists = 8)
    val cb2 = Similarity.readPqCodebook(spark, path).get
    assert(cb2.rot.get.flatten.toSeq === cb.rot.get.flatten.toSeq)
    val top2 = Similarity.probeIvfPq(spark, path, pv, k = 1, nProbe = 8,
      excludeId = Some(0L)).head()
    assert(top2.getLong(0) === 70001L)
    Manifests.rmTree(path)
  }
}
