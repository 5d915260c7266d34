package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Two tiers:
  *  - `cosineTopK`: brute-force exact scan — the correctness baseline.
  *    One pass, codegen'd higher-order functions, broadcast probe; at
  *    100 TB this is a full scan (fine for one-off probes, wrong for
  *    high-QPS serving).
  *  - `lshTopK`: random-hyperplane LSH. Vectors are bucketed by a b-bit
  *    sign signature; a probe searches only its own bucket plus all
  *    Hamming<=1 neighbor buckets (multiprobe). The bucket join is a hash
  *    join on a short int key — candidate count ~ N * (b+1) / 2^b, which
  *    at b=8 touches ~3.5% of the data, and the signature computation is
  *    a shuffle-free projection. Recall is probabilistic; the ScalaTest
  *    suite measures it against `cosineTopK` (IVF with learned centroids
  *    is the next step up and shares this bucket-join shape).
  *
  * (No similarity surface exists in the reference; north-star addition
  * per BASELINE.json.)
  */
object Similarity {

  // vec_id casts to long so every tier (row-form BNLJ vs packed blocks,
  // whose Dataset encoder pins BIGINT) emits the SAME output schema
  // regardless of the size dispatch (ADVICE r18)
  private def asDouble(emb: DataFrame): DataFrame =
    emb.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<double>").as("e"))

  /** Codegen'd native expressions (graft.functions.VectorExpressions):
    * same left-to-right accumulation as the HOF fold they replaced —
    * bit-equal results, ~10x faster (no per-element lambda dispatch). */
  private def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.vec_dot(a, b)

  private def norm(a: Column): Column = graft.functions.VectorExpressions.vec_norm(a)

  /** Exact cosine top-k against the probe vector `probeId` (excluded from
    * results). TakeOrderedAndProject keeps the top-k per partition — no
    * global sort materialization. */
  def cosineTopK(emb: DataFrame, probeId: Long, k: Int): DataFrame = {
    val v = asDouble(emb)
    // probe norm hoisted into the broadcast row (once, not per corpus
    // row — see knnJoinExact); the corpus-side norm is inherently
    // once-per-row here (single probe), so it stays inline
    val probe = broadcast(v.filter(col("vec_id") === probeId)
      .select(col("e").as("pe"), norm(col("e")).as("pn")))
    v.filter(col("vec_id") =!= probeId)
      .crossJoin(probe)
      .select(col("vec_id"),
        round(dot(col("e"), col("pe")) / (norm(col("e")) * col("pn")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Fixed-seed random hyperplanes (unit-free gaussians are fine for sign
    * tests). Deterministic across runs and executors. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 7L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** b-bit sign signature of the embedding under the given hyperplanes —
    * a pure projection (no shuffle, no UDF). */
  def signature(e: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val d = dot(e, typedLit(p.toSeq))
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Spherical k-means centroids over a bounded sample (VERDICT r2 #5 —
    * replaces the first-N-by-id placeholder, whose quality depended on
    * id order happening to cover the corpus's clusters).
    *
    * Scale contract: ONE distributed pass takes a deterministic,
    * id-order-independent sample (top `sampleSize` by `xxhash64(vec_id)`
    * — a TakeOrdered, no sort materialization, unbiased w.r.t. both id
    * assignment and physical row order); Lloyd then iterates on the
    * driver over that bounded sample (`sampleSize`×dim doubles, ~2 MB at
    * the defaults — NOT the corpus). Assignments use cosine, means are
    * renormalized each step (spherical k-means), empty clusters keep
    * their previous centroid, and seeds are the sample's hash-order head
    * — fully deterministic for a given corpus. */
  def kmeansCentroids(emb: DataFrame, nLists: Int, iters: Int = 5,
                      sampleSize: Int = 4096): Array[Array[Double]] = {
    val sample: Array[Array[Double]] = asDouble(emb)
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(sampleSize)
      .collect().map(r => r.getSeq[Double](1).toArray)
    require(sample.length >= nLists, s"need >= $nLists vectors, got ${sample.length}")
    def unit(a: Array[Double]): Array[Double] = {
      val n = math.sqrt(a.map(x => x * x).sum)
      if (n == 0) a else a.map(_ / n)
    }
    val points = sample.map(unit)
    // farthest-point seeding (deterministic k-means++ analogue): each
    // seed is the point least similar to its nearest existing seed, so
    // seeds spread across the corpus's clusters instead of landing
    // wherever the sample head happens to sit (a head of near-duplicate
    // points would otherwise spawn duplicate centroids and halve the
    // effective list count)
    val seedIdx = scala.collection.mutable.ArrayBuffer(0)
    val nearestSeedDot = points.map(p => p.zip(points(0)).map { case (a, b) => a * b }.sum)
    while (seedIdx.length < nLists) {
      var far = 0; var farDot = Double.MaxValue
      var i = 0
      while (i < points.length) {
        if (nearestSeedDot(i) < farDot) { farDot = nearestSeedDot(i); far = i }
        i += 1
      }
      seedIdx += far
      val s = points(far)
      i = 0
      while (i < points.length) {
        var d = 0.0; var j = 0
        while (j < s.length) { d += points(i)(j) * s(j); j += 1 }
        if (d > nearestSeedDot(i)) nearestSeedDot(i) = d
        i += 1
      }
    }
    var centroids = seedIdx.toArray.map(points(_).clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(nLists)(new Array[Double](points(0).length))
      val counts = new Array[Long](nLists)
      points.foreach { p =>
        var best = 0; var bestDot = Double.MinValue
        var c = 0
        while (c < nLists) {
          var d = 0.0; var i = 0
          while (i < p.length) { d += p(i) * centroids(c)(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        var i = 0
        while (i < p.length) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else unit(sums(c))
      }
    }
    centroids
  }

  /** Semantic topic assignment — the curation op behind "balance the
    * mixture by topic, not just by source": spherical k-means topics
    * over the embedding column, each vector labeled with its
    * nearest-centroid topic and the cosine to it (cohesion).
    *
    * Scale shape: centroids come from [[kmeansCentroids]] (one bounded
    * deterministic sample + driver Lloyd — ~2 MB, never the corpus);
    * assignment is then a PURE PROJECTION — argmax over k codegen'd
    * vec_dot calls against literal centroid arrays, zero shuffle, zero
    * joins — so topic labeling streams at scan speed over 100 TB
    * exactly like the IVF list assignment it shares machinery with.
    * Centroids are unit-norm, so cos(e, c) = dot(e, c)/|e|. */
  def assignTopics(emb: DataFrame, k: Int, iters: Int = 5,
                   sampleSize: Int = 4096): DataFrame = {
    import graft.functions.VectorExpressions.{vec_dot, vec_norm}
    val centroids = kmeansCentroids(emb, k, iters, sampleSize)
    val best = array_max(array(centroids.zipWithIndex.map { case (c, i) =>
      struct((vec_dot(col("e"), typedLit(c.toSeq)) / vec_norm(col("e"))).as("cos"),
        lit(i).as("topic"))
    }: _*))
    asDouble(emb).select(col("vec_id"),
      best.getField("topic").as("topic"), best.getField("cos").as("cohesion"))
  }

  /** SemDeDup — semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", PAPERS.md): cluster the embeddings with spherical
    * k-means ([[assignTopics]]' bounded-sample centroids), find
    * near-duplicate pairs ONLY WITHIN each cluster (cos >= threshold —
    * `Dedup.embeddingNearDupPairsByCluster`, the ~k-fold candidate
    * pruning that makes the method web-scale), and keep ONE member per
    * duplicate family: the paper's rule — the member with the LOWEST
    * cosine to its centroid (maximum diversity), ties to lowest
    * vec_id. Returns the survivors as (vec_id, topic, cohesion).
    *
    * Scale shape: centroids are a bounded driver sample; assignment is
    * a zero-shuffle projection; the pair kernel never leaves a
    * cluster; survivor selection is `Dedup.keepCanonical`'s
    * size-dispatched label machinery with quality = −cohesion. One
    * assignment pin feeds both the pair kernel and the keep rule. */
  def semDedup(emb: DataFrame, k: Int = 8, threshold: Double = 0.95,
               iters: Int = 5, sampleSize: Int = 4096): DataFrame =
    semDedupWithAssignment(emb, k, threshold, iters, sampleSize)._1

  /** [[semDedup]] that also RETURNS the pinned assignment it pruned
    * against, so a caller needing per-topic totals (q82's summary)
    * reuses the one k-means fit + assignment scan instead of running
    * a second — which would also silently couple correctness to the
    * fit's determinism (review r11 finding). The returned assignment
    * is (vec_id, topic, cohesion), already materialized. */
  def semDedupWithAssignment(emb: DataFrame, k: Int = 8,
                             threshold: Double = 0.95, iters: Int = 5,
                             sampleSize: Int = 4096): (DataFrame, DataFrame) = {
    import graft.functions.VectorExpressions.{vec_dot, vec_norm}
    val centroids = kmeansCentroids(emb, k, iters, sampleSize)
    val best = array_max(array(centroids.zipWithIndex.map { case (c, i) =>
      struct((vec_dot(col("e"), typedLit(c.toSeq)) / vec_norm(col("e"))).as("cos"),
        lit(i).as("topic"))
    }: _*))
    val assigned = Storage.track(asDouble(emb).select(col("vec_id"), col("e"),
      best.getField("topic").as("topic"), best.getField("cos").as("cohesion"))
      .localCheckpoint(true))
    val pairs = Dedup.embeddingNearDupPairsByCluster(
      assigned.select(col("vec_id"), col("e").as("embedding"),
        col("topic").as("cluster")), threshold)
      .select(col("va").as("da"), col("vb").as("db"))
    (Dedup.keepCanonical(assigned.drop("e"), pairs, quality = -col("cohesion"),
      id = "vec_id"), assigned.drop("e"))
  }

  /** A built IVF index: unit-norm centroids + the assigned corpus. Build
    * once (one assignment scan — the expensive pass), probe many: every
    * `probeIvf` call reads `assigned` without re-running centroid
    * sampling or assignment — the serving/batch contract VERDICT r3-r6
    * asked for. Two lifecycles:
    *  - `buildIvfIndex`: `assigned` is an eager local checkpoint (`Scan
    *    ExistingRDD` in probe plans), registered with [[Storage]] — after
    *    `Storage.releaseAll()` the index is UNUSABLE (lineage truncated);
    *    session-scoped, for build-and-probe-now batches.
    *  - `writeIvfIndex`/`readIvfIndex`: `assigned` is parquet PARTITIONED
    *    BY `list` — probes prune to the probed lists' partitions
    *    (`PartitionFilters` in the scan), the index outlives the session,
    *    and the rows carry the int8 packed codes as the STORED layout so
    *    quantized probes scan codes without re-quantizing (VERDICT r7
    *    #1/#8). The written-once-probed-many cluster deployment. */
  final case class IvfIndex(centroids: Array[Array[Double]], assigned: DataFrame,
                            nLists: Int,
                            pq: Option[graft.operators.Quantize.PqCodebook] = None)

  /** One assignment pass: vectors are assigned to their nearest of
    * `nLists` centroids (argmax over vec_dot with literal centroid
    * arrays — codegen'd, zero shuffle) and pinned. Centroids come from
    * `kmeansCentroids` (spherical k-means over a bounded deterministic
    * sample; unit-norm, so cos(e, c) = dot(e, c)/|e|). Assignment uses
    * cosine so lists reflect angular proximity — the metric probes rank
    * by. */
  /** Best centroid per row as a pure projection — argmax via struct
    * ordering (array_max compares (cos, idx) lexicographically).
    * `.getField("i")` is the assignment, `.getField("d")` the cosine to
    * the assigned centroid (the row's COHESION). Shared by the index
    * build, incremental appends, and the staleness gauge so all three
    * agree bit-for-bit. */
  private def bestCentroid(centroids: Array[Array[Double]]): Column = {
    import graft.functions.VectorExpressions.{vec_dot, vec_norm}
    array_max(array(centroids.zipWithIndex.map { case (c, i) =>
      struct((vec_dot(col("e"), typedLit(c.toSeq)) / vec_norm(col("e"))).as("d"),
        lit(i).as("i"))
    }: _*))
  }

  private def assignExpr(centroids: Array[Array[Double]]): Column =
    bestCentroid(centroids).getField("i")

  def buildIvfIndex(emb: DataFrame, nLists: Int = 16): IvfIndex = {
    val centroids = kmeansCentroids(emb, nLists)
    val assigned = Storage.track(
      asDouble(emb).withColumn("list", assignExpr(centroids)).localCheckpoint(eager = true))
    IvfIndex(centroids, assigned, nLists)
  }

  /** Probe a built index with an explicit query vector: rank the
    * centroids driver-side (nLists dot products), scan only the `nProbe`
    * nearest lists from the pinned assignment. No job other than the
    * candidate scan itself runs — candidate fraction ~ nProbe/nLists. */
  def probeIvf(index: IvfIndex, probeVec: Array[Double], k: Int,
               nProbe: Int = 4, excludeId: Option[Long] = None): DataFrame = {
    import graft.functions.VectorExpressions.{vec_dot, vec_norm}
    val probeNorm = math.sqrt(probeVec.map(x => x * x).sum)
    val probeLists = index.centroids.zipWithIndex.map { case (c, i) =>
      (c.zip(probeVec).map { case (x, y) => x * y }.sum / probeNorm, i)
    }.sortBy(-_._1).take(nProbe).map(_._2)
    excludeId.map(id => index.assigned.filter(col("vec_id") =!= id))
      .getOrElse(index.assigned)
      .filter(col("list").isin(probeLists.toSeq: _*))
      .select(col("vec_id"),
        round(vec_dot(col("e"), typedLit(probeVec.toSeq)) /
          (vec_norm(col("e")) * lit(probeNorm)), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Persist a built IVF index: assignments as parquet PARTITIONED BY
    * `list` (so `probeIvf` over the read-back index scans ONLY the
    * probed lists' partition directories — `PartitionFilters` pruning,
    * the disk analogue of the inverted file) plus a tiny centroids
    * sidecar. Every row also stores its int8 packed codes
    * (`Quantize.int8`) — the 4×-smaller scanned layout for the quantized
    * probe tier, written once here so `probeIvfQuantized` plans carry no
    * quantize expressions. At 100 TB each list partition splits into
    * many parquet files; probes read nProbe/nLists of the data and the
    * planner never lists the rest. */
  /** Partition column recording which ingest batch added a row to a
    * persisted index: the base build writes batch -1; streaming appends
    * ([[appendIvfBatch]]) write their micro-batch id. Same name and
    * crash-replay role as the text corpus store's
    * `StreamingOps.IngestBatchCol`. */
  val IngestBatchCol = "__ingest_batch"

  def writeIvfIndex(index: IvfIndex, path: String): Unit =
    writeIvfBase(index, path, None)

  private def writeIvfBase(index: IvfIndex, path: String,
                           pq: Option[graft.operators.Quantize.PqCodebook]): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("i", "c").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    // two partition levels: __ingest_batch (base = -1; incremental
    // appends use their batch id — the idempotent-replay key) then list
    // (the probe-pruning key). Probes filter `list` only, which prunes
    // at the second level just the same.
    // the build's mean cohesion rides the write as an observe() metric
    // (no second pass): the baseline the append-staleness gauge
    // compares against. The PQ codes (when configured) ride the SAME
    // single pass.
    val obs = org.apache.spark.sql.Observation()
    val base = index.assigned
      .observe(obs, avg(bestCentroid(index.centroids).getField("d")).as("coh"),
        count(lit(1)).as("n"))
      .withColumn("p", graft.operators.Quantize.int8(col("e")))
    pq.fold(base)(cb =>
        base.withColumn("pq",
          graft.operators.Quantize.pqEncodeUdf(cb)(
            pqInput(cb, index.centroids, col("e"), col("list")))))
      .withColumn(IngestBatchCol, lit(-1L))
      .write.mode("overwrite").partitionBy(IngestBatchCol, "list").parquet(s"$path/assigned")
    val m = scala.concurrent.Await.result(obs.future,
      scala.concurrent.duration.Duration(120, "s"))
    Seq((m.getAs[Double]("coh"), m.getAs[Long]("n")))
      .toDF("build_mean_cohesion", "n_base").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
    pq.foreach(cb => writePqCodebook(spark, s"$path/pq_codebook", cb))
  }

  // ---------------------------------------- IVF-PQ tier (r15)
  /** [[writeIvfIndex]] plus PRODUCT QUANTIZATION (VERDICT r14 missing
    * #3; Jégou et al. 2011): every stored row additionally carries an
    * m-BYTE `pq` code column (BINARY — 32× smaller than the float32
    * vector at m=8/dim=64, vs scalar int8's 4×), and the per-subspace
    * codebooks land in a `pq_codebook` sidecar beside `centroids`/
    * `meta`. Codebooks train on the kmeansCentroids bounded
    * deterministic sample (driver metadata, one TakeOrdered — never a
    * corpus pass); encoding rides the same single write pass as the
    * int8 codes. At 100 TB of embeddings this is the difference
    * between an ADC scan that reads ~1/32 of the float bytes and one
    * that cannot fit: the serving path is [[probeIvfPq]] (list-pruned
    * ADC shortlist → exact float rerank — the published IVF-PQ +
    * re-scoring pattern q126's scaladoc names). Incremental appends
    * ([[appendIvfBatch]]) encode against the SAME fixed codebooks, so
    * the layout survives streaming growth; [[rebuildIvfIndex]] carries
    * codes and codebooks into the new generation (they are
    * list-independent). */
  def writeIvfIndexPq(index: IvfIndex, path: String, m: Int = 8,
                      nCentroids: Int = 256, sampleSize: Int = 4096): Unit = {
    val sample = pqTrainingSample(index, sampleSize)
    val cb = graft.operators.Quantize.pqTrainLocal(sample, m, nCentroids)
    writeIvfBase(index, path, Some(cb))
  }

  /** [[writeIvfIndexPq]] with the OPQ rotation tier (r15; Gong et al.
    * 2013): the PQ codebooks train in a PCA-rotated, eigenvalue-
    * balanced basis ([[graft.operators.Quantize.opqTrainLocal]]), so
    * correlated raw dimensions stop concentrating the variance in a
    * few subspaces and the SAME m bytes carry measurably less
    * reconstruction error (the q142 contract asserts MSE(OPQ) ≤
    * MSE(plain PQ) on the shared training sample). The rotation is a
    * d×d orthonormal matrix riding the `pq_codebook` sidecar (rows
    * with `sub = -1`); cosine is rotation-invariant, so [[probeIvfPq]],
    * [[appendIvfBatch]] and [[rebuildIvfIndex]] compose UNCHANGED —
    * encode rotates in, the ADC LUT rotates the probe, the exact
    * rerank never sees the rotation at all. */
  def writeIvfIndexOpq(index: IvfIndex, path: String, m: Int = 8,
                       nCentroids: Int = 256, sampleSize: Int = 4096): Unit = {
    val sample = pqTrainingSample(index, sampleSize)
    val cb = graft.operators.Quantize.opqTrainLocal(sample, m, nCentroids)
    writeIvfBase(index, path, Some(cb))
  }

  /** The bounded deterministic PQ/OPQ training sample — the
    * kmeansCentroids contract (driver metadata via one TakeOrdered in
    * xxhash64 order; never a corpus pass). */
  private def pqTrainingSample(index: IvfIndex, sampleSize: Int): Array[Array[Double]] =
    index.assigned
      .select(col("vec_id"), col("e"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(sampleSize)
      .collect().map(_.getSeq[Double](1).toArray)

  /** The same bounded sample as RESIDUALS against each vector's
    * assigned coarse centroid — what an IVFADC codebook trains on. */
  private def pqResidualSample(index: IvfIndex, sampleSize: Int): Array[Array[Double]] =
    index.assigned
      .select(col("vec_id"), col("e"), col("list"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(sampleSize)
      .collect().map { r =>
        val v = r.getSeq[Double](1).toArray
        val c = index.centroids(r.getInt(2))
        Array.tabulate(v.length)(i => v(i) - c(i))
      }

  /** The column the PQ encoder sees: the raw vector, or — for a
    * residual codebook — `e − c_list` built columnarly from the
    * broadcast centroid bank (nLists × d literal; no UDF, no join). */
  private def pqInput(cb: graft.operators.Quantize.PqCodebook,
                      centroids: Array[Array[Double]],
                      e: Column, list: Column): Column =
    if (!cb.residual) e
    else zip_with(e,
      element_at(typedLit(centroids.map(_.toSeq).toSeq), list.cast("int") + 1),
      (a, b) => a - b)

  /** [[writeIvfIndexPq]] with IVFADC RESIDUAL encoding (r16; VERDICT
    * r15 missing #2 / next #2 — Jégou et al. 2011 §IV.B): the codebooks
    * train on, and the codes encode, `rot(v − c_list)` — each vector's
    * residual against its coarse IVF centroid — instead of the (rotated)
    * raw vector. Residuals concentrate near zero, so the SAME m bytes
    * carry materially less reconstruction error and the ADC shortlist
    * ranks closer to the exact order (the q151 contract measures both).
    * With `opq = true` the rotation trains on the residual sample too
    * (the OPQ alternation composes — rotation and residual are
    * orthogonal upgrades). Serving flows through [[probeIvfPq]]
    * unchanged: the codebook sidecar carries the residual marker and
    * the probe builds per-(probe, list) tables — bounded at
    * nProbe × m × 256 doubles. Appends encode residuals against the
    * SAME fixed centroids+codebooks; compaction and takedown never
    * look inside the codes. */
  def writeIvfIndexPqResidual(index: IvfIndex, path: String, m: Int = 8,
                              nCentroids: Int = 256, sampleSize: Int = 4096,
                              opq: Boolean = false): Unit = {
    val sample = pqResidualSample(index, sampleSize)
    val cb0 =
      if (opq) graft.operators.Quantize.opqTrainLocal(sample, m, nCentroids)
      else graft.operators.Quantize.pqTrainLocal(sample, m, nCentroids)
    writeIvfBase(index, path, Some(cb0.copy(residual = true)))
  }

  private def writePqCodebook(spark: org.apache.spark.sql.SparkSession,
                              dir: String,
                              cb: graft.operators.Quantize.PqCodebook): Unit = {
    import spark.implicits._
    val rotRows = cb.rot.toSeq.flatMap(_.zipWithIndex.map {
      case (row, i) => (-1, i, row.toSeq) // sub = -1: the OPQ rotation bank
    })
    // sub = -2: the IVFADC residual marker (codes encode rot(v − c_list))
    val resRows = if (cb.residual) Seq((-2, 0, Seq(1.0))) else Nil
    (cb.codebooks.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, i) => (s, i, c.toSeq) }
    }.toSeq ++ rotRows ++ resRows).toDF("sub", "idx", "c").coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  /** The PQ codebook sidecar of a persisted index (committed
    * generation), if the index was written with the PQ tier. Rows with
    * `sub = -1` are the OPQ rotation (absent on a plain-PQ index —
    * legacy sidecars read back unchanged). */
  def readPqCodebook(spark: org.apache.spark.sql.SparkSession,
                     path: String): Option[graft.operators.Quantize.PqCodebook] = {
    val dir = s"${indexRoot(path)}/pq_codebook"
    if (!Fs.isDir(Fs.path(dir))) None
    else {
      val rows = spark.read.parquet(dir)
        .orderBy("sub", "idx")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      val residual = rows.exists(_._1 == -2)
      val (rotRows, bookRows) = rows.filter(_._1 >= -1).partition(_._1 == -1)
      val rot = if (rotRows.isEmpty) None else Some(rotRows.sortBy(_._2).map(_._3))
      val m = bookRows.map(_._1).max + 1
      val books = Array.tabulate(m)(s => bookRows.filter(_._1 == s).sortBy(_._2).map(_._3))
      Some(graft.operators.Quantize.PqCodebook(m, books(0)(0).length, books, rot,
        residual))
    }
  }

  /** IVF-PQ serving probe — the two-stage scan every web-scale vector
    * deployment runs (coarse ADC over the m-byte codes in the probed
    * lists only, exact float rerank of the `shortlist`·k survivors):
    *
    *  1. rank centroids driver-side, select `nProbe` lists (partition
    *     pruning — the scan lists only those directories);
    *  2. ADC pass reading (vec_id, pq) ONLY — the probe's m×256 lookup
    *     tables are driver metadata riding the UDF closure; per row the
    *     score is m byte-lookups and adds;
    *  3. exact cosine rerank of the shortlist ids against the same
    *     pruned lists' float vectors (broadcast semi join — the corpus
    *     never shuffles), emitting the [[probeIvf]] contract
    *     (vec_id, cos_sim round-4, desc, ties to low id).
    *
    * Quantization error can only cost membership at the shortlist
    * boundary (the q126 argument); returned SCORES are exact floats. */
  def probeIvfPq(spark: org.apache.spark.sql.SparkSession, path: String,
                 probeVec: Array[Double], k: Int, nProbe: Int = 4,
                 shortlist: Int = 4, excludeId: Option[Long] = None): DataFrame = {
    import graft.functions.VectorExpressions.{vec_dot, vec_norm}
    val cb = readPqCodebook(spark, path).getOrElse(throw new IllegalStateException(
      s"probeIvfPq: no pq_codebook at $path — write the index with writeIvfIndexPq"))
    val idx = readIvfIndex(spark, path)
    val probeNorm = math.sqrt(probeVec.map(x => x * x).sum)
    val probeLists = idx.centroids.zipWithIndex.map { case (c, i) =>
      (c.zip(probeVec).map { case (x, y) => x * y }.sum / probeNorm, i)
    }.sortBy(-_._1).take(nProbe).map(_._2).toSeq
    val pruned0 = idx.assigned.filter(col("list").isin(probeLists: _*))
    val pruned = excludeId.map(id => pruned0.filter(col("vec_id") =!= id))
      .getOrElse(pruned0)
    // residual codebook (IVFADC): per-(probe, list) tables over exactly
    // the probed lists — nProbe × m × 256 doubles of driver metadata
    val adcCol =
      if (cb.residual) {
        val lut = graft.operators.Quantize.pqAdcLutResidual(cb, probeVec,
          probeLists.map(l => l -> idx.centroids(l)).toMap)
        graft.operators.Quantize.pqAdcScoreResidualUdf(lut)(
          col("list").cast("int"), col("pq"))
      } else graft.operators.Quantize.pqAdcScoreUdf(cb, probeVec)(col("pq"))
    val cand = pruned
      .select(col("vec_id"), adcCol.as("adc"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(k * shortlist)
      .select("vec_id")
    pruned.join(broadcast(cand), "vec_id")
      .select(col("vec_id"),
        round(vec_dot(col("e"), typedLit(probeVec.toSeq)) /
          (vec_norm(col("e")) * lit(probeNorm)), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Staleness report from one incremental append: how well the FIXED
    * centroids still describe the arriving data. `staleness` is the
    * build-vs-append mean-cohesion gap — near 0 while the increment
    * distribution matches the build; growing positive values mean the
    * centroids have drifted off the data and the recall gate will
    * degrade → schedule an offline rebuild. `buildMeanCohesion` is None
    * for indexes persisted before the meta sidecar existed. */
  final case class IvfAppendReport(nAppended: Long, meanCohesion: Option[Double],
                                   buildMeanCohesion: Option[Double]) {
    // None when the batch was empty (no cohesion observed) or the index
    // predates the meta sidecar — an empty increment is NOT a drift
    // signal (ADVICE r12: Option over an unboxed null double read 0.0,
    // a spurious maximum-staleness report on all-rejected micro-batches)
    def staleness: Option[Double] =
      for { b <- buildMeanCohesion; m <- meanCohesion } yield b - m
  }

  /** Incrementally add vectors to a PERSISTED index (standard IVF
    * insert: centroids stay fixed, lists grow): assign each vector to
    * its nearest centroid with the same projection the build uses,
    * store the int8 packed codes alongside (the quantized-probe layout),
    * and OVERWRITE the batch's own `__ingest_batch=<id>` partition — so
    * an at-least-once replay of the same batch id is idempotent, the
    * contract [[graft.streaming.StreamingOps]]'s vector ingest sink
    * builds on. The write touches only the new batch's files; existing
    * partitions are never rewritten.
    *
    * Returns the [[IvfAppendReport]] staleness gauge — the increment's
    * mean cohesion rides the append write as an observe() metric (no
    * second pass over the batch) and compares against the build-time
    * baseline in the `meta` sidecar. */
  def appendIvfBatch(index: IvfIndex, vectors: DataFrame, path: String,
                     batchId: Long): IvfAppendReport = {
    val spark = vectors.sparkSession
    val root = indexRoot(path)
    val obs = org.apache.spark.sql.Observation()
    val best = bestCentroid(index.centroids)
    val staged = asDouble(vectors)
      .withColumn("list", best.getField("i"))
      .observe(obs, avg(best.getField("d")).as("coh"), count(lit(1)).as("n"))
      .withColumn("p", graft.operators.Quantize.int8(col("e")))
    // a PQ-tier index encodes the increment against the SAME fixed
    // codebooks (codes are list-independent — centroid drift is the
    // staleness gauge's business, not the codes'); a residual codebook
    // subtracts the SAME fixed coarse centroid the row assigns to
    index.pq.fold(staged)(cb =>
        staged.withColumn("pq", graft.operators.Quantize.pqEncodeUdf(cb)(
          pqInput(cb, index.centroids, col("e"), col("list")))))
      .write.mode("overwrite").partitionBy("list")
      .parquet(s"$root/assigned/$IngestBatchCol=$batchId")
    val m = scala.concurrent.Await.result(obs.future,
      scala.concurrent.duration.Duration(120, "s"))
    // absent sidecar (pre-r12 index) -> None; anything else (corrupt
    // meta, transient IO) must SURFACE — it is the drift gauge's input
    val base =
      if (!Fs.isDir(Fs.path(root, "meta"))) None
      else Some(spark.read.parquet(s"$root/meta").head()
        .getAs[Double]("build_mean_cohesion"))
    val n = m.getAs[Long]("n")
    // getAs[Double] on the empty batch's null avg would UNBOX to 0.0
    // before Option could see it — test the count, not the value
    IvfAppendReport(n, if (n == 0L) None else Some(m.getAs[Double]("coh")), base)
  }

  /** Re-open a persisted index. The centroids sidecar is metadata-sized
    * (nLists rows); assignments stay a lazy partitioned scan — nothing
    * is loaded until a probe selects its lists. With a committed
    * compaction ([[compactIvfIndex]]) the assignment view is the
    * consolidated epoch (list-partitioned, batch id as a LONG data
    * column) unioned with live batch partitions above the watermark —
    * probes prune `list` partitions on BOTH sides, and every as-of
    * `__ingest_batch < id` filter keeps working on the carried column. */
  /** Resolve a persisted index path to its COMMITTED generation root:
    * [[rebuildIvfIndex]] commits whole-index generations through the
    * same Manifests protocol one level up — `path/_compaction/
    * manifest.json` names the live generation, whose full index
    * (centroids + assigned + meta) lives at `path/_compaction/
    * epoch-<g>`. Without one, the original top-level layout IS the
    * index. Reads, appends, and assigned-level compaction all resolve
    * through here, so a committed rebuild atomically redirects every
    * consumer while pre-flip readers keep their (retained) files. */
  private def indexRoot(path: String): String =
    Manifests.read(path) match {
      case Some((g, _)) => Manifests.epochPath(path, g)
      case None => path
    }

  def readIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val root = indexRoot(path)
    val centroids = spark.read.parquet(s"$root/centroids")
      .orderBy("i").select("c")
      .collect().map(_.getSeq[Double](0).toArray)
    require(centroids.nonEmpty, s"no centroids at $root/centroids")
    val aDir = s"$root/assigned"
    val live =
      try Some(spark.read.parquet(aDir))
      catch {
        // all batch dirs compacted + GC'd -> only the (invisible)
        // _compaction dir remains and the live read has no files
        case _: org.apache.spark.sql.AnalysisException => None
      }
    val assigned = Manifests.readView(spark, aDir, IngestBatchCol, live)
      .getOrElse(throw new IllegalStateException(s"no assignments at $aDir"))
    IvfIndex(centroids, assigned, centroids.length, readPqCodebook(spark, path))
  }

  /** Fold committed index batches (the base `-1` and appends ≤
    * `uptoBatch`) into one consolidated, LIST-PARTITIONED epoch — the
    * index-side small-files answer: a year of daily [[appendIvfBatch]]
    * partitions is ~365 × nLists tiny files, and the file listing
    * starts to dominate pruned probes. Same [[Manifests]] commit
    * protocol as the text store (atomic manifest flip; half-written
    * epochs invisible; best-effort GC readers never depend on), and
    * the same caller contract: run while ingest is stopped, or with
    * `uptoBatch` ≤ the last COMMITTED batch. Probe plans stay
    * partition-pruned on `list` over the epoch, and the batch id
    * survives as a LONG column so index-as-of filtering is unchanged.
    * Returns (epoch, coversUpTo). */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      uptoBatch: Long, targetFileRows: Long = 5000000L,
                      checkpoint: Option[String] = None): (Long, Long) = {
    checkpoint.foreach { cp =>
      val last = graft.streaming.StreamingOps.lastCommittedBatch(cp)
        .getOrElse(throw new IllegalStateException(
          s"compactIvfIndex: checkpoint $cp has no committed batch"))
      require(uptoBatch <= last,
        s"compactIvfIndex: uptoBatch=$uptoBatch exceeds the checkpoint's last " +
          s"committed batch $last — a crash-replayed append must keep its own " +
          "partition to overwrite")
    }
    val aDir = s"${indexRoot(path)}/assigned"
    // hash-clustered on list so each list's rows land in few tasks; the
    // dynamic partitionBy writes one file per (task, list). Under a
    // live stream (checkpoint given) GC is deferred like compactStore's
    // — reclaim later via Manifests.gcSuperseded(aDir, IngestBatchCol).
    Manifests.compactView(readIvfIndex(spark, path).assigned, aDir,
      IngestBatchCol, uptoBatch, targetFileRows, partitionCols = Seq("list"),
      gc = checkpoint.isEmpty)
  }

  /** IVF probe-recall sweep — the (nProbe → recall, scanned fraction)
    * tuning table every ANN deployment publishes before picking its
    * operating point (recall@k tracks the probed fraction on
    * noise-similarity corpora — q36's measured lesson — so the knob is
    * a cost/recall trade someone must SEE to set): for `nQueries`
    * deterministically-sampled query vectors (top by xxhash64(vec_id),
    * the centroid-sample convention), compare the exact top-k against
    * the IVF top-k at each probe width.
    *
    * Scale shape — ONE corpus pass for the WHOLE sweep: the bounded
    * query set explodes against the assigned table (corpus × Q rows,
    * map-side), ONE window pass keeps the per-(query, list) top-k, and
    * everything after — exact top-k (merge of all lists), per-width
    * top-k (merge of the probed lists), recalls, scanned fractions —
    * is driver arithmetic over the collected Q × nLists × k rows plus
    * the nLists-row list-size table. No per-width job, no second scan.
    * Monotonicity is structural: candidates(p) ⊆ candidates(p+1) and
    * both sides break ties (cos desc, vec_id), so recall never
    * decreases and reaches EXACTLY 1.0 at full probe.
    * Output: (n_probe, mean_recall DECIMAL(14,4) as double,
    * scanned_frac likewise), ordered by n_probe. */
  def probeRecallSweep(emb: DataFrame, nLists: Int = 16, k: Int = 10,
                       probes: Seq[Int] = Seq(1, 2, 4, 8, 16),
                       nQueries: Int = 8): DataFrame = {
    require(probes.nonEmpty && probes.forall(p => p >= 1 && p <= nLists),
      s"probeRecallSweep: probes $probes out of [1, $nLists]")
    val spark = emb.sparkSession
    import spark.implicits._
    val idx = buildIvfIndex(emb, nLists)
    val qRows = asDouble(emb)
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(nQueries)
      .select(col("vec_id"), col("e")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // per-query centroid ranking (driver-side: nLists dot products each)
    val listRank: Map[Long, Array[Int]] = qRows.map { case (qid, qv) =>
      val qn = math.sqrt(qv.map(x => x * x).sum)
      qid -> idx.centroids.zipWithIndex.map { case (c, i) =>
        (c.zip(qv).map { case (x, y) => x * y }.sum / qn, i)
      }.sortBy(t => (-t._1, t._2)).map(_._2)
    }.toMap
    val listSizes = idx.assigned.groupBy("list").count().collect()
      .map(r => r.get(0).asInstanceOf[Number].intValue -> r.getLong(1)).toMap
    val total = listSizes.values.sum.toDouble
    import graft.functions.VectorExpressions.{vec_dot, vec_norm}
    // norm hoist (r18, see knnJoinExact): query norms are computed on
    // the driver in vec_norm's exact accumulation order (left-to-right
    // sum of squares, then sqrt — bit-identical) and ride the literal;
    // the corpus norm is computed once per row BEFORE the Q-way explode
    val qArr = typedLit(qRows.map { case (qid, qv) =>
      (qid, qv.toSeq, {
        var s = 0.0; var i = 0
        while (i < qv.length) { s += qv(i) * qv(i); i += 1 }
        math.sqrt(s)
      })
    }.toSeq)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid", "list").orderBy(col("cos").desc, col("vec_id"))
    // corpus × Q scoring pass; per-(query, list) top-k keeps the
    // collected table at Q × nLists × k rows no matter the corpus size
    val perList = idx.assigned
      .withColumn("en", vec_norm(col("e")))
      .select(col("vec_id"), col("e"), col("en"), col("list"), explode(qArr).as("q"))
      .filter(col("vec_id") =!= col("q._1"))
      .select(col("q._1").as("qid"), col("vec_id"), col("list"),
        round(vec_dot(col("e"), col("q._2")) /
          (col("en") * col("q._3")), 4).as("cos"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("qid", "list", "vec_id", "cos").collect()
      .map(r => (r.getLong(0), r.get(1).asInstanceOf[Number].intValue,
        r.getLong(2), r.getDouble(3)))
    def topK(qid: Long, lists: Set[Int]): Seq[Long] =
      perList.filter(r => r._1 == qid && lists.contains(r._2))
        .sortBy(r => (-r._4, r._3)).take(k).map(_._3).toSeq
    val allLists = (0 until idx.nLists).toSet
    val exact = qRows.map { case (qid, _) => qid -> topK(qid, allLists).toSet }.toMap
    val out = probes.distinct.sorted.map { p =>
      val recalls = qRows.map { case (qid, _) =>
        val got = topK(qid, listRank(qid).take(p).toSet).toSet
        got.intersect(exact(qid)).size.toDouble / exact(qid).size
      }
      val scanned = qRows.map { case (qid, _) =>
        listRank(qid).take(p).map(l => listSizes.getOrElse(l, 0L)).sum / total
      }
      (p, recalls.sum / recalls.length, scanned.sum / scanned.length)
    }
    out.toDF("n_probe", "r", "s")
      .select(col("n_probe"),
        col("r").cast(org.apache.spark.sql.types.DecimalType(14, 4))
          .cast("double").as("mean_recall"),
        col("s").cast(org.apache.spark.sql.types.DecimalType(14, 4))
          .cast("double").as("scanned_frac"))
      .orderBy("n_probe")
  }

  /** Delete vectors by id from a persisted IVF index WITHOUT a rebuild
    * (the takedown verb — opt-out/DMCA/GDPR removals must reach the
    * index too, or a kNN probe keeps serving the deleted content):
    * only the (batch, list) leaf partitions that actually contain a
    * deleted id are rewritten via [[Takedown.replaceLeaf]]'s crash-safe
    * two-phase swap; every other partition stays byte-identical, the
    * centroids/meta sidecars and any committed manifest are untouched.
    * Resolves through the committed generation root like every other
    * index verb, and handles both live `__ingest_batch=<b>/list=<l>`
    * leaves and the assigned-compaction epoch's `list=<l>` leaves (the
    * epoch carries the batch id as a data column, preserved by the
    * rewrite). The id list is bounded driver metadata by the takedown
    * contract. Returns rows deleted. Run at a quiet moment (the
    * [[compactIvfIndex]] GC convention); [[Takedown.recover]] runs
    * first, so a crash mid-delete heals on the next call. */
  def deleteFromIvfIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String, vecIds: Seq[Long]): Long = {
    require(vecIds.nonEmpty, "deleteFromIvfIndex: empty id list")
    val aDir = s"${indexRoot(path)}/assigned"
    Takedown.recover(aDir)
    val idx = readIvfIndex(spark, path)
    val del = col("vec_id").isin(vecIds: _*)
    // partition discovery types the batch col INT on a manifest-less
    // assigned dir (readView only normalizes past a compaction) — cast
    val touched = idx.assigned.filter(del)
      .groupBy(col(IngestBatchCol).cast("long").as(IngestBatchCol), col("list"))
      .agg(count(lit(1)).as("n")).collect()
    if (touched.isEmpty) return 0L
    val manifest = Manifests.read(aDir)
    val covers = manifest.map(_._2).getOrElse(Long.MinValue)
    val units = touched.map { r =>
      val b = r.getLong(0)
      if (b <= covers)
        s"${Manifests.CompactDir}/epoch-${manifest.get._1}/list=${r.get(1)}"
      else s"$IngestBatchCol=$b/list=${r.get(1)}"
    }.distinct.sorted
    units.foreach { unit =>
      // NULL-safe negation (ADVICE r14): !isin is NULL for a NULL id
      // and would silently drop null-id rows from the rewrite
      val kept = spark.read.parquet(s"$aDir/$unit")
        .filter(!coalesce(del, lit(false)))
      Takedown.replaceLeaf(aDir, unit, kept)
    }
    touched.map(_.getLong(2)).sum
  }

  /** Offline FULL rebuild of a persisted index — the action the
    * [[appendIvfBatch]] staleness gauge calls for once the fixed
    * centroids have drifted off the arriving data: fresh spherical
    * k-means centroids over the index's CURRENT view, every row
    * re-assigned, committed as a new whole-index GENERATION through
    * the Manifests atomic flip (`path/_compaction/manifest.json` one
    * level above the assigned-dir compaction's). Probes are never
    * interrupted: a reader holding the pre-flip index keeps its
    * retained files; every read/append/compact after the flip resolves
    * to the new generation via [[indexRoot]]; the staleness baseline
    * resets to the new build's cohesion.
    *
    * The rebuilt assigned keeps `(__ingest_batch, list)` PARTITION
    * layout, so a crash-replayed append (its batch folded in but its
    * stream commit lost) still overwrites its own partition in the new
    * generation — idempotent replay survives the swap, which is what
    * makes the rebuild safe to trigger from the ingest sink's own
    * batch boundary (`curatedIngestToStore(rebuildStaleness=...)`).
    * CONTRACT otherwise: run while ingest is stopped — a rebuild
    * racing a concurrent append could strand that append's rows in
    * the superseded generation.
    *
    * Old-generation files are retained (in-flight probes); reclaim
    * with [[gcIndexGenerations]] once no pre-flip reader remains.
    * Returns (generation, coversUpToBatch). */
  def rebuildIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      nLists: Int = 0): (Long, Long) = {
    val cur = readIvfIndex(spark, path)
    val lists = if (nLists > 0) nLists else cur.nLists
    // the PQ tier (codes + codebooks) is list-independent — carried
    // through the rebuild unchanged, like the int8 codes
    val carried = Seq(col("vec_id"), col("e"), col("p")) ++
      (if (cur.pq.isDefined) Seq(col("pq")) else Nil)
    val view = cur.assigned.select(carried :+
      col(IngestBatchCol).cast("long").as(IngestBatchCol): _*)
    // fresh centroids over the current distribution (bounded
    // deterministic sample — driver metadata, like the original build)
    val centroids = kmeansCentroids(
      view.select(col("vec_id"), col("e").as("embedding")), lists)
    val gen = Manifests.read(path).map(_._1 + 1).getOrElse(0L)
    val genDir = Manifests.epochPath(path, gen)
    import spark.implicits._
    centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("i", "c").coalesce(1)
      .write.mode("overwrite").parquet(s"$genDir/centroids")
    // ONE pass re-assigns and rewrites; the new cohesion baseline and
    // the covered-batch watermark ride it as observe() metrics. The
    // stored packed codes are layout, not a function of the centroids
    // — carried through unchanged.
    val best = bestCentroid(centroids)
    val obs = org.apache.spark.sql.Observation()
    view.withColumn("list", best.getField("i"))
      .observe(obs, avg(best.getField("d")).as("coh"), count(lit(1)).as("n"),
        max(col(IngestBatchCol)).as("upto"))
      .write.mode("overwrite").partitionBy(IngestBatchCol, "list")
      .parquet(s"$genDir/assigned")
    val m = scala.concurrent.Await.result(obs.future,
      scala.concurrent.duration.Duration(120, "s"))
    require(m.getAs[Long]("n") > 0, s"nothing to rebuild at $path")
    Seq((m.getAs[Double]("coh"), m.getAs[Long]("n")))
      .toDF("build_mean_cohesion", "n_base").coalesce(1)
      .write.mode("overwrite").parquet(s"$genDir/meta")
    cur.pq.foreach(cb => writePqCodebook(spark, s"$genDir/pq_codebook", cb))
    val covers = m.getAs[Long]("upto")
    Manifests.flip(path, gen, covers)
    (gen, covers)
  }

  /** Reclaim index generations superseded by the committed rebuild
    * manifest: the original top-level layout and any non-committed
    * epoch dirs. Safe once no reader still holds a pre-flip index
    * (readers opened after the flip resolve to the committed
    * generation and never touch these). Returns dirs removed. */
  def gcIndexGenerations(path: String): Int =
    Manifests.read(path) match {
      case None => 0
      case Some((g, _)) =>
        val topLevel = Seq("centroids", "assigned", "meta")
          .map(d => Fs.path(path, d)).filter(Fs.isDir)
        val oldGens = Fs.list(Fs.path(path, Manifests.CompactDir))
          .filter(f => f.isDirectory && f.getPath.getName.startsWith("epoch-") &&
            f.getPath.getName.stripPrefix("epoch-").toLong != g)
          .map(_.getPath)
        (topLevel ++ oldGens).foreach(Fs.rmTree)
        topLevel.size + oldGens.length
    }

  /** Quantized probe over a PERSISTED index: same list routing as
    * `probeIvf`, but candidates are ranked by the integer-dot cosine
    * identity over the STORED packed codes — the probe vector is
    * quantized once on the driver (`Quantize.int8Local`) and the scan
    * reads `p` only, so the plan contains no quantize expressions and
    * moves 4× less data than the float tier (VERDICT r7 what's-wrong
    * #2). Ranking error is the quantization error (q57 contract). */
  def probeIvfQuantized(index: IvfIndex, probeVec: Array[Double], k: Int,
                        nProbe: Int = 4, excludeId: Option[Long] = None): DataFrame = {
    require(index.assigned.columns.contains("p"),
      "probeIvfQuantized needs a persisted index (writeIvfIndex stores the packed codes)")
    val (q, mn, sc) = graft.operators.Quantize.int8Local(probeVec)
    val probePacked = struct(typedLit(q.toSeq).as("q"), lit(mn).as("mn"), lit(sc).as("scale"))
    val probeNorm = math.sqrt(probeVec.map(x => x * x).sum)
    val probeLists = index.centroids.zipWithIndex.map { case (c, i) =>
      (c.zip(probeVec).map { case (x, y) => x * y }.sum / probeNorm, i)
    }.sortBy(-_._1).take(nProbe).map(_._2)
    excludeId.map(id => index.assigned.filter(col("vec_id") =!= id))
      .getOrElse(index.assigned)
      .filter(col("list").isin(probeLists.toSeq: _*))
      .select(col("vec_id"),
        round(graft.operators.Quantize.cosine(col("p"), probePacked), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF (inverted-file) approximate top-k against a corpus vector:
    * `buildIvfIndex` + one `probeIvf`. One-shot convenience — a caller
    * issuing many probes should build the index once and call `probeIvf`
    * per query vector. */
  def ivfTopK(emb: DataFrame, probeId: Long, k: Int,
              nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val v = asDouble(emb)
    // A corpus at most ~8x the result size cannot be pruned meaningfully
    // (any useful candidate set already approaches the whole corpus) —
    // scan it exactly; the centroid machinery engages above the floor.
    if (SizeDispatch.atMost(v, 8L * k)) return cosineTopK(emb, probeId, k)
    val index = buildIvfIndex(emb, nLists)
    val probeVec = v.filter(col("vec_id") === probeId)
      .collect()(0).getSeq[Double](1).toArray
    probeIvf(index, probeVec, k, nProbe, excludeId = Some(probeId))
  }

  /** Rank-ordered finish for a batch kNN join: bounded top-k per query
    * (graft.functions.Aggregators.CosineTopK — fixed-size buffers with
    * map-side partial combine; only k rows per query per partition reach
    * the exchange, never the candidate set), then posexplode back to one
    * row per (qid, rank). */
  private def finishTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = graft.functions.Aggregators.cosineTopK(k)
    scored.groupBy("qid")
      .agg(topk(col("cos_sim"), col("vec_id")).as("h"))
      .select(col("qid"), col("h.sims").as("sims"), posexplode(col("h.ids")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col").as("vec_id"),
        element_at(col("sims"), (col("pos") + 1).cast("int")).as("cos_sim"))
      .orderBy("qid", "rank")
  }

  /** Exact batch kNN join: for EVERY query vector, the k nearest corpus
    * vectors by cosine (self-matches on vec_id excluded) — the shape a
    * training pipeline actually runs (dedup against a reference set,
    * retrieval labeling), vs the single-probe `cosineTopK`. The query
    * side broadcasts as PACKED BLOCKS (BroadcastNestedLoopJoin over
    * block rows); scoring is the fused
    * primitive block kernel; ranking is the bounded-heap aggregation
    * over k rows per query per corpus block, so the M×N candidate
    * stream is never materialized or shuffled. Cosine is
    * rounded at 4 decimals BEFORE ranking (ties at the k boundary then
    * break by vec_id asc) — deterministic and oracle-matched. At 100 TB
    * this is one full corpus scan for the whole query batch; for query
    * sets too large to broadcast, route through `knnJoinGrid` (NOT
    * `knnJoinIvf`, which also broadcasts the query side — nProbe× of it
    * after the per-probe explode; IVF reduces each query's candidate
    * scan, never the broadcast size). `knnJoinAuto` dispatches.
    *
    * r18 blocked rewrite (guide §1.2 step 2 — fix the per-task work).
    * The old form streamed the RAW M×N pair rows through
    * BroadcastNestedLoopJoin → Project(vec_dot, 2×vec_norm, round) →
    * ObjectHashAggregate: at 25M pairs the per-row machinery (join row
    * copies, per-row codegen dispatch, one boxed aggregator update per
    * pair) dwarfed the arithmetic — the same lesson the block-triangle
    * near-dup kernel recorded ("declarative forms 10-30× slower than
    * the primitive kernel"). Now both sides pack into bounded blocks
    * (~4k vectors: sorted ids + vectors + norms precomputed once per
    * row, the [[Dedup.embeddingNearDupPairs]] packing), the same
    * broadcast/grid join forms block PAIRS instead of row pairs, and a
    * fused primitive kernel scores one block pair per task, keeping a
    * per-query bounded top-k buffer — only k rows PER QUERY PER CORPUS
    * BLOCK (not per pair) ever leave the kernel for the final
    * CosineTopK merge. Output is bit-identical: dot and norm accumulate
    * left-to-right exactly like vec_dot/vec_norm, rounding is the same
    * BigDecimal.valueOf(..).setScale(4, HALF_UP) Spark's round applies,
    * the buffer comparator is CosineTopK's (cos desc, id asc), and
    * top-k-of-block-top-ks equals global top-k (selection composes;
    * CosineTopK's ScalaCheck'd merge-order invariance). */
  def knnJoinExact(corpus: DataFrame, queries: DataFrame, k: Int,
                   excludeSelf: Boolean = true): DataFrame =
    // tiny query sets (≤1024: a probe panel, not a batch) keep the
    // row-form BNLJ — the pair stream is at most 1024 × corpus-block
    // and the blocked tier's two packing exchanges + extra AQE stages
    // are pure fixed overhead at that size (measured: q51's 100-query
    // join 0.34 s row-form vs 0.63 s blocked). The probe is the same
    // memoized bounded count SizeDispatch everywhere uses.
    if (SizeDispatch.atMost(queries, 1024L))
      knnJoinExactRows(corpus, queries, k, excludeSelf)
    else knnJoinBlocked(corpus, queries, k, excludeSelf,
      broadcastQueries = true)

  /** Row-form broadcast tier (small query sets): BroadcastNestedLoopJoin
    * over raw vector rows with both norms hoisted out of the pair loop
    * (computed once per row below / inside the broadcast — r18). */
  private def knnJoinExactRows(corpus: DataFrame, queries: DataFrame, k: Int,
                               excludeSelf: Boolean): DataFrame = {
    val c = asDouble(corpus).withColumn("cn", norm(col("e")))
    val q = broadcast(asDouble(queries)
      .select(col("vec_id").as("qid"), col("e").as("qe"), norm(col("e")).as("qn")))
    finishTopK(
      c.crossJoin(q)
        .filter(if (excludeSelf) col("vec_id") =!= col("qid") else lit(true))
        .select(col("qid"), col("vec_id"),
          round(dot(col("e"), col("qe")) / (col("cn") * col("qn")), 4)
            .as("cos_sim")),
      k)
  }

  /** Packed vector blocks: ids + vectors + norms (precomputed in
    * vec_norm's exact accumulation order), one row per block. Vectors
    * hash into `defaultParallelism` groups and each group CHUNKS into
    * ≤4096-row blocks inside flatMapGroups — so the packing needs NO
    * count job, block memory stays bounded at any corpus size, and
    * every core gets blocks. Packing layout is not load-bearing:
    * per-query top-k over rounded scores is invariant to how
    * candidates are blocked (CosineTopK merge-order invariance). */
  private def packBlocks(v: DataFrame, blockRows: Int = 4096): DataFrame = {
    val spark = v.sparkSession
    import spark.implicits._
    val nBlocks = math.max(spark.sparkContext.defaultParallelism, 1)
    v.select(pmod(col("vec_id"), lit(nBlocks.toLong)).as("blk"),
        col("vec_id"), col("e"))
      .as[(Long, Long, Array[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (_, rows) =>
        rows.grouped(blockRows).map { chunk =>
          val vs = chunk.map(r => (r._2, r._3)).toArray.sortBy(_._1)
          val norms = vs.map { case (_, e) =>
            var s = 0.0; var i = 0
            while (i < e.length) { s += e(i) * e(i); i += 1 }
            math.sqrt(s)
          }
          (vs.map(_._1), vs.map(_._2), norms)
        }
      }
      .toDF("ids", "vecs", "norms")
  }

  /** Exactly Spark's Round(_, 4) over DoubleType: NaN/Infinity pass
    * THROUGH (BigDecimal.valueOf would throw NumberFormatException) —
    * a zero-norm embedding's NaN cosine must behave identically in the
    * blocked kernel and the declarative row tier (ADVICE r18). */
  private def round4(raw: Double): Double =
    if (raw.isNaN || raw.isInfinite) raw
    else java.math.BigDecimal.valueOf(raw)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Fused block-pair scorer: for every query of the block, the top-k
    * corpus rows of the block by (rounded cos desc, id asc), appended
    * to `out` as (qid, vec_id, cos_sim). Primitive insertion buffers —
    * zero allocation on the reject path. */
  private def scoreBlockPair(qids: Array[Long], qvecs: Array[Array[Double]],
                             qnorms: Array[Double], cids: Array[Long],
                             cvecs: Array[Array[Double]], cnorms: Array[Double],
                             k: Int, excludeSelf: Boolean,
                             out: scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row],
                             emit: (Long, Long, Double) => org.apache.spark.sql.Row): Unit = {
    val sims = new Array[Double](k)
    val ids = new Array[Long](k)
    var qi = 0
    while (qi < qids.length) {
      val q = qvecs(qi); val qn = qnorms(qi); val qid = qids(qi)
      var size = 0
      var ci = 0
      while (ci < cids.length) {
        val cid = cids(ci)
        if (!excludeSelf || cid != qid) {
          val c = cvecs(ci)
          var d = 0.0; var i = 0
          while (i < c.length) { d += c(i) * q(i); i += 1 }
          val cos = round4(d / (cnorms(ci) * qn))
          // CosineTopK.better: (cos desc, id asc)
          if (size < k || cos > sims(size - 1) ||
              (cos == sims(size - 1) && cid < ids(size - 1))) {
            var pos = if (size < k) size else k - 1
            while (pos > 0 && (sims(pos - 1) < cos ||
                (sims(pos - 1) == cos && ids(pos - 1) > cid))) {
              sims(pos) = sims(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
            }
            sims(pos) = cos; ids(pos) = cid
            if (size < k) size += 1
          }
        }
        ci += 1
      }
      var r = 0
      while (r < size) { out += emit(qid, ids(r), sims(r)); r += 1 }
      qi += 1
    }
  }

  /** [[scoreBlockPair]]'s dual-direction twin for [[marginPairs]]: ONE
    * dot per (l, r) pair feeds BOTH sides' bounded top-k buffers —
    * side 0 rows (per-l top-k over the r block) and side 1 rows
    * (per-r top-k over the l block) — instead of scoring the block
    * pair twice. Identical comparator and rounding. */
  private def scoreBlockPairBoth(lids: Array[Long], lvecs: Array[Array[Double]],
                                 lnorms: Array[Double], rids: Array[Long],
                                 rvecs: Array[Array[Double]], rnorms: Array[Double],
                                 k: Int,
                                 out: scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]): Unit = {
    val ls = lids.length; val rs = rids.length
    val lSims = Array.ofDim[Double](ls, k); val lIds = Array.ofDim[Long](ls, k)
    val rSims = Array.ofDim[Double](rs, k); val rIds = Array.ofDim[Long](rs, k)
    val lSize = new Array[Int](ls); val rSize = new Array[Int](rs)
    def insert(sims: Array[Double], ids: Array[Long], size: Int,
               cos: Double, cid: Long): Int = {
      if (size == k && !(cos > sims(size - 1) ||
          (cos == sims(size - 1) && cid < ids(size - 1)))) return size
      var pos = if (size < k) size else k - 1
      while (pos > 0 && (sims(pos - 1) < cos ||
          (sims(pos - 1) == cos && ids(pos - 1) > cid))) {
        sims(pos) = sims(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
      }
      sims(pos) = cos; ids(pos) = cid
      if (size < k) size + 1 else size
    }
    var li = 0
    while (li < ls) {
      val lv = lvecs(li); val ln = lnorms(li); val lid = lids(li)
      var ri = 0
      while (ri < rs) {
        val rv = rvecs(ri)
        var d = 0.0; var i = 0
        while (i < lv.length) { d += lv(i) * rv(i); i += 1 }
        val cos = round4(d / (ln * rnorms(ri)))
        lSize(li) = insert(lSims(li), lIds(li), lSize(li), cos, rids(ri))
        rSize(ri) = insert(rSims(ri), rIds(ri), rSize(ri), cos, lid)
        ri += 1
      }
      li += 1
    }
    var i = 0
    while (i < ls) {
      var r = 0
      while (r < lSize(i)) {
        out += org.apache.spark.sql.Row(0, lids(i), lIds(i)(r), lSims(i)(r)); r += 1
      }
      i += 1
    }
    i = 0
    while (i < rs) {
      var r = 0
      while (r < rSize(i)) {
        out += org.apache.spark.sql.Row(1, rids(i), rIds(i)(r), rSims(i)(r)); r += 1
      }
      i += 1
    }
  }

  private def knnJoinBlocked(corpus: DataFrame, queries: DataFrame, k: Int,
                             excludeSelf: Boolean,
                             broadcastQueries: Boolean): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cB = packBlocks(asDouble(corpus)).toDF("cids", "cvecs", "cnorms")
    val qB = packBlocks(asDouble(queries)).toDF("qids", "qvecs", "qnorms")
    val joined =
      if (broadcastQueries) cB.crossJoin(broadcast(qB))
      else cB.hint("shuffle_replicate_nl")
        .crossJoin(qB.hint("shuffle_replicate_nl"))
    val schema = Seq.empty[(Long, Long, Double)]
      .toDF("qid", "vec_id", "cos_sim").schema
    import org.apache.spark.sql.Row
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    val scored = joined.flatMap { r =>
      val cids = r.getSeq[Long](0).toArray
      val cvecs = r.getSeq[scala.collection.Seq[Double]](1).map(_.toArray).toArray
      val cnorms = r.getSeq[Double](2).toArray
      val qids = r.getSeq[Long](3).toArray
      val qvecs = r.getSeq[scala.collection.Seq[Double]](4).map(_.toArray).toArray
      val qnorms = r.getSeq[Double](5).toArray
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      scoreBlockPair(qids, qvecs, qnorms, cids, cvecs, cnorms, k, excludeSelf,
        out, (qid, vid, cos) => Row(qid, vid, cos))
      out
    }
    finishTopK(scored.toDF("qid", "vec_id", "cos_sim"), k)
  }

  /** Exact batch kNN join for query sets TOO LARGE TO BROADCAST: the
    * shuffle-replicate nested-loop grid (corpus-block × query-chunk).
    * Each task scores one corpus partition against one query partition
    * and the bounded-heap aggregation prunes to k rows per query
    * map-side before the exchange — the M×N candidate stream still never
    * materializes or shuffles; what the grid pays, vs the broadcast
    * tier, is replicating each side across the other's partitions
    * (Spark's `shuffle_replicate_nl`). Identical output to
    * `knnJoinExact`: same rounded scores, and CosineTopK's merge-order
    * invariance (ScalaCheck'd) makes the ranking independent of which
    * tier's task grid produced the partials. */
  def knnJoinGrid(corpus: DataFrame, queries: DataFrame, k: Int,
                  excludeSelf: Boolean = true): DataFrame =
    knnJoinBlocked(corpus, queries, k, excludeSelf,
      broadcastQueries = false)

  /** Size-dispatched exact kNN join (the q51 registered path — mirrors
    * `Dedup.embeddingNearDupPairsAuto`): a cheap BOUNDED count
    * (`limit(n+1).count`, never a full scan) routes query sets that fit
    * a broadcast (default 100k vectors ≈ 50 MB at 64 dims) through the
    * broadcast tier and everything larger through the grid. Both tiers
    * are exact and return identical rows — dispatch is a pure plan
    * choice, asserted by KnnJoinSpec's parity case. */
  def knnJoinAuto(corpus: DataFrame, queries: DataFrame, k: Int,
                  broadcastableQueries: Long = 100000L,
                  excludeSelf: Boolean = true): DataFrame = {
    if (SizeDispatch.atMost(queries, broadcastableQueries))
      knnJoinExact(corpus, queries, k, excludeSelf)
    else knnJoinGrid(corpus, queries, k, excludeSelf)
  }

  /** IVF-batched kNN join: every query routes to its `nProbe` nearest
    * centroid lists via a pure projection over the broadcast centroids
    * (argsort of (−cos, i) structs — no shuffle, no driver loop), then a
    * hash join on the short `list` key pairs queries with ONLY the
    * assigned candidates in probed lists (~nProbe/nLists of the corpus
    * per query) before the same bounded top-k finish as `knnJoinExact`.
    * One built index serves the whole batch — the assignment scan never
    * re-runs (`IvfIndex` contract). Recall follows the per-query probed
    * fraction; q51_check_knn_ivf pins it against the exact tier.
    * NOTE: the query side broadcasts here too — nProbe× its rows after
    * the per-probe explode — so this tier reduces each query's CANDIDATE
    * SCAN, never the broadcast size; query sets too large to broadcast
    * go through `knnJoinGrid`. */
  def knnJoinIvf(index: IvfIndex, queries: DataFrame, k: Int,
                 nProbe: Int = 4): DataFrame = {
    import graft.functions.VectorExpressions.{vec_dot, vec_norm}
    require(nProbe <= index.nLists, s"nProbe $nProbe > nLists ${index.nLists}")
    val ranked = array_sort(array(index.centroids.zipWithIndex.map { case (cv, i) =>
      struct((-vec_dot(col("qe"), typedLit(cv.toSeq)) / vec_norm(col("qe"))).as("nd"),
        lit(i).as("i"))
    }: _*))
    val q = asDouble(queries)
      // norm hoist (see knnJoinExact): computed once per query row,
      // BEFORE the per-probe explode — not per candidate pair
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        vec_norm(col("e")).as("qn"))
      .withColumn("list", explode(transform(slice(ranked, 1, nProbe), s => s.getField("i"))))
    // static partition pruning for disk-backed indexes: the union of
    // probed lists across the batch is bounded by nLists, so collect it
    // (a tiny job over the broadcast-sized query side — never corpus
    // data) and filter the assignment scan with literals. A stored index
    // (writeIvfIndex, partitioned by list) then reads only the probed
    // lists' partition directories — the same PartitionFilters pruning
    // probeIvf gets; for the in-memory index it's a cheap scan predicate.
    val probedLists = q.select("list").distinct().collect().map(_.getInt(0)).toSeq
    val candidates =
      if (probedLists.isEmpty) index.assigned.filter(lit(false))
      else index.assigned.filter(col("list").isin(probedLists: _*))
    finishTopK(
      candidates.withColumn("cn", vec_norm(col("e")))
        .join(broadcast(q), "list")
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(vec_dot(col("e"), col("qe")) / (col("cn") * col("qn")), 4)
            .as("cos_sim")),
      k)
  }

  /** Quantized brute-force top-k: the corpus is scanned as int8 codes
    * (`Quantize.int8` — 4× less data than float32) and ranked by the
    * integer-dot cosine identity (`Quantize.cosine`). The approximation
    * error is the quantization error only (bounded by scale/2 per
    * element), so ranking matches the exact scan except among near-ties
    * (which it may legitimately reorder) — QuantizeSpec pins
    * cluster-recall on a separated fixture and the cosine identity
    * itself to 1e-9.
    * On a real deployment the packed codes are the STORED layout
    * (written once via `Quantize.int8`, scanned many times); quantizing
    * inside the query, as here, still exercises the exact ranking path. */
  def cosineTopKQuantized(emb: DataFrame, probeId: Long, k: Int): DataFrame = {
    val packed = asDouble(emb).select(col("vec_id"),
      graft.operators.Quantize.int8(col("e")).as("p"))
    val probe = broadcast(packed.filter(col("vec_id") === probeId)
      .select(col("p").as("pp")))
    packed.filter(col("vec_id") =!= probeId)
      .crossJoin(probe)
      .select(col("vec_id"),
        round(graft.operators.Quantize.cosine(col("p"), col("pp")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Two-stage quantized serving — coarse int8 shortlist, exact
    * rerank (the refine step every quantized ANN deployment runs:
    * IVF-PQ + re-scoring, int8 scan + float rerank): the quantized
    * scan ranks ALL vectors on the cheap fixed-point codes and keeps
    * `shortlist`·k candidates; only those re-score with exact float
    * cosine. Rank quality equals the exact scan's wherever the
    * shortlist covers the true top-k — quantization error can only
    * cost MEMBERSHIP at the shortlist boundary, which the overshoot
    * absorbs (q126_check_rerank certifies: every miss was absent from
    * the shortlist, every returned score is bit-exact).
    *
    * Scale shape: the coarse pass reads the stored int8 codes (4×
    * smaller than float32 — on a deployment they are the persisted
    * layout, quantized once at write); the exact pass touches
    * shortlist·k rows through a broadcast semi join — never the
    * corpus. */
  def cosineTopKReranked(emb: DataFrame, probeId: Long, k: Int,
                         shortlist: Int = 4): DataFrame = {
    val cand = cosineTopKQuantized(emb, probeId, k * shortlist).select("vec_id")
    val v = asDouble(emb)
    val probe = broadcast(v.filter(col("vec_id") === probeId).select(col("e").as("pe")))
    v.join(broadcast(cand), "vec_id")
      .crossJoin(probe)
      .select(col("vec_id"),
        round(dot(col("e"), col("pe")) / (norm(col("e")) * norm(col("pe"))), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** LSH-bucketed approximate top-k: candidates share the probe's bucket
    * or any Hamming<=1 neighbor bucket; exact cosine ranks candidates.
    *
    * Applicability: sign-LSH recalls HIGH-similarity neighbors (near-dup
    * grade, cos >~ 0.8, where per-plane agreement is >~0.9). For
    * moderate-similarity retrieval (cos 0.2-0.4 — e.g. nearest neighbors
    * in a diffuse corpus) per-plane agreement is ~0.6 and recall collapses
    * at any bucket width tight enough to prune; use `ivfTopK`, whose
    * centroid lists follow the data's cluster structure, for that regime
    * (measured: IVF recall 1.0 vs LSH 0.0-0.2 on the clustered test
    * embeddings — the q36_check_recall contract pins the IVF path). */
  def lshTopK(emb: DataFrame, probeId: Long, k: Int,
              numPlanes: Int = 8, dim: Int = 64, seed: Long = 7L): DataFrame = {
    val planes = hyperplanes(numPlanes, dim, seed)
    val v = asDouble(emb).withColumn("sig", signature(col("e"), planes))
    val probeRow = v.filter(col("vec_id") === probeId)
      .select(col("e").as("pe"), col("sig").as("psig"))
    // multiprobe: the probe's signature and every 1-bit flip of it
    val probeSigs = broadcast(
      probeRow.select(col("pe"),
        explode(array(col("psig") +: (0 until numPlanes)
          .map(i => col("psig").bitwiseXOR(lit(1L << i))): _*)).as("sig")))
    v.filter(col("vec_id") =!= probeId)
      .join(probeSigs, "sig") // broadcast hash join on the bucket key
      .select(col("vec_id"),
        round(dot(col("e"), col("pe")) / (norm(col("e")) * norm(col("pe"))), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Johnson–Lindenstrauss dimensionality reduction by a DETERMINISTIC
    * dense ±1 sign matrix (Achlioptas 2003, "Database-friendly random
    * projections"): out[j] = Σ_i emb[i]·s(i,j) / √k with
    * s(i,j) = 1 − 2·((i·1103515245 + j·12345) mod 97 mod 2). The sign
    * is pure integer arithmetic so any engine reproduces the exact
    * matrix — no RNG state, no shipped matrix, nothing to persist: the
    * formula IS the projection. A pure codegen'd projection (nested
    * higher-order functions, no UDF): zero shuffle, streams at scan
    * speed, and LINEAR — exact duplicates stay exact duplicates, and
    * downstream IVF/kNN over the reduced column run on k-dim vectors
    * (the 100 TB play: project once at ingest, index and search at a
    * fraction of the width). Output values round to 4 decimals so
    * hash-gated engine comparison is exact. */
  def randomProjection(emb: DataFrame, outDim: Int,
                       inCol: String = "embedding",
                       outCol: String = "reduced",
                       inDim: Option[Int] = None): DataFrame = {
    require(outDim > 0, s"outDim must be positive: $outDim")
    inDim match {
      case Some(d) =>
        // codegen fast path for a KNOWN uniform input width: the sign
        // matrix is a compile-time constant, so each output component is
        // one codegen'd vec_dot against a literal column — no interpreted
        // higher-order lambdas (measured ~2M interpreted closure calls at
        // sf0.1 on the generic path). Fold order matches the generic
        // path's left fold, so results are bit-identical. Rows whose
        // vector width differs from `d` would diverge from the generic
        // formula — the caller asserts uniformity (the oracle gate would
        // catch a lie).
        import graft.functions.VectorExpressions.vec_dot
        require(d > 0, s"inDim must be positive: $d")
        val root = math.sqrt(outDim.toDouble)
        val signs = (0 until outDim).map(j => (0 until d).map(i =>
          1.0 - 2.0 * ((i.toLong * 1103515245L + j.toLong * 12345L) % 97 % 2)).toArray)
        emb.withColumn(outCol, array((0 until outDim).map(j =>
          round(vec_dot(col(inCol).cast("array<double>"),
            typedLit(signs(j).toSeq)) / root, 4)): _*))
      case None =>
        emb.withColumn(outCol, expr(
          s"""transform(sequence(0, ${outDim - 1}), j ->
             |  round(aggregate(
             |    transform($inCol, (x, i) ->
             |      cast(x as double) * (1.0d - 2.0d * cast((cast(i as bigint) * 1103515245 + cast(j as bigint) * 12345) % 97 % 2 as double))),
             |    cast(0.0 as double), (acc, v) -> acc + v) / sqrt(cast($outDim as double)), 4))""".stripMargin))
    }
  }

  /** Prototypicality data pruning (Sorscher et al. 2022, "Beyond neural
    * scaling laws: beating power law scaling via data pruning",
    * PAPERS.md): cluster the embeddings (the [[assignTopics]] spherical
    * k-means), rank each cluster's members by cosine to their centroid,
    * and KEEP the hardest `keepFrac` — the low-cohesion examples far
    * from the prototype, which the paper shows dominate learning once
    * the dataset is abundant (easy prototypical examples are the ones
    * to drop). `keepEasiest = true` flips to the scarce-data regime.
    *
    * Scale shape: assignment is the zero-shuffle centroid projection;
    * ranking is ONE window partitioned by topic (each cluster ranks
    * independently — no global order); the per-cluster quota is
    * ceil(frac·n) from a count window over the same partition, so the
    * whole pruning pass after assignment is one exchange on `topic`.
    * Each cluster ranks in a single task's (disk-backed) sort — sized
    * by corpus/k, the [[Dsir.resample]] caveat: when a single cluster
    * outgrows what one task should sort (~10M rows, the Percentiles
    * dispatch bound), raise k, or replace the exact rank with a
    * cohesion CUTOFF from the q39 percentile tiers (quota then exact
    * only up to ties at the cut). Ties (equal cohesion) break on
    * vec_id, deterministic across engines and partitionings. */
  def prototypicalityPrune(emb: DataFrame, k: Int = 8, keepFrac: Double = 0.3,
                           keepEasiest: Boolean = false, iters: Int = 5,
                           sampleSize: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = assignTopics(emb, k, iters, sampleSize)
    val order =
      if (keepEasiest) Seq(col("cohesion").desc, col("vec_id").asc)
      else Seq(col("cohesion").asc, col("vec_id").asc)
    val w = Window.partitionBy("topic").orderBy(order: _*)
    assigned
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n_cluster",
        count(lit(1)).over(Window.partitionBy("topic")).cast("long"))
      .withColumn("keep", col("rk") <= ceil(col("n_cluster") * keepFrac))
      .orderBy("vec_id")
  }

  /** Distributed k-center diversity selection (farthest-first
    * traversal; Sener & Savarese 2018's coreset rule, the
    * diversity-driven complement of [[prototypicalityPrune]]'s
    * hardness rule): per cluster, greedily pick `m` representatives,
    * each the member FARTHEST (max min-cosine-distance) from those
    * already picked — the classic 2-approximation to the k-center
    * cover, whose emitted `min_dist` is the cluster's coverage radius
    * at each step.
    *
    * Scale shape: the greedy is m ROUNDS, each ONE distributed
    * aggregation over the pinned assigned corpus — the selected
    * prefix (≤ k·m vectors, driver metadata by construction) enters
    * each round as broadcast literals inside a codegen'd per-row
    * min-distance expression, and the per-cluster argmax is a
    * max_by-shaped aggregate (partial map-side). No pairwise
    * materialization, no window; corpus scans = m, state = the
    * prefix. Ties break to the lowest vec_id everywhere,
    * deterministic across partitionings. */
  def kCenterSelect(emb: DataFrame, k: Int = 8, m: Int = 4,
                    iters: Int = 5, sampleSize: Int = 4096): DataFrame = {
    import graft.functions.VectorExpressions.{vec_dot, vec_norm}
    val spark = emb.sparkSession
    val centroids = kmeansCentroids(emb, k, iters, sampleSize)
    val best = array_max(array(centroids.zipWithIndex.map { case (c, i) =>
      struct((vec_dot(col("e"), typedLit(c.toSeq)) / vec_norm(col("e"))).as("cos"),
        lit(i).as("topic"))
    }: _*))
    val assigned = Storage.track(asDouble(emb).select(col("vec_id"), col("e"),
      best.getField("topic").as("topic"), best.getField("cos").as("cohesion"))
      .localCheckpoint(true))

    // seed: the farthest-from-centroid member per cluster (min cohesion,
    // ties to lowest id) — the max(struct) trick keeps the argmax a
    // plain partial-aggregable max
    val seedRows = assigned
      .groupBy("topic")
      .agg(max(struct((-col("cohesion")).as("d"), (-col("vec_id")).as("ni"),
        col("e").as("e"))).as("s"))
      .select(col("topic"), (-col("s.ni")).as("vec_id"), col("s.e").as("e"))
      .collect()

    // selected prefix per topic: (vec_id, vector); vectors are driver
    // metadata (≤ k·m of them)
    val sel = scala.collection.mutable.Map[Int, Vector[(Long, Seq[Double])]]()
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Double)]()
    seedRows.foreach { r =>
      val t = r.getInt(0)
      sel(t) = Vector((r.getLong(1), r.getSeq[Double](2)))
      out += ((t, 1, r.getLong(1), 1.0))
    }
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

    (2 to m).foreach { step =>
      // min cosine-distance of each row to its cluster's selected set,
      // as one codegen'd expression: dist = 1 − max over prefix of
      // cos(e, s). Selected ids are excluded via isin.
      val distByTopic = sel.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
        case (acc, (t, ps)) =>
          val maxCos = ps.map { case (_, s) =>
            val sn = math.sqrt(s.map(x => x * x).sum)
            vec_dot(col("e"), typedLit(s)) / (vec_norm(col("e")) * lit(sn))
          }.reduce((a, b) => greatest(a, b))
          when(col("topic") === t, lit(1.0) - maxCos).otherwise(acc)
      }
      val selectedIds = sel.values.flatten.map(_._1).toSeq
      val picked = assigned
        .filter(!col("vec_id").isin(selectedIds.map(java.lang.Long.valueOf): _*))
        .withColumn("dist", distByTopic)
        .groupBy("topic")
        .agg(max(struct(col("dist").as("d"), (-col("vec_id")).as("ni"),
          col("e").as("e"))).as("s"))
        .select(col("topic"), (-col("s.ni")).as("vec_id"), col("s.d").as("dist"),
          col("s.e").as("e"))
        .collect()
      picked.foreach { r =>
        val t = r.getInt(0)
        sel(t) = sel(t) :+ ((r.getLong(1), r.getSeq[Double](3)))
        out += ((t, step, r.getLong(1), r4(r.getDouble(2))))
      }
    }
    import spark.implicits._
    out.toSeq.sortBy(x => (x._1, x._2))
      .toDF("topic", "selection_rank", "vec_id", "min_dist")
  }

  /** Margin-criterion parallel-pair mining (Artetxe & Schwenk 2019; the
    * CCMatrix / LASER bitext miner): candidate (left, right) pairs are
    * each left vector's forward nearest neighbor on the right side,
    * scored by the RATIO margin — cos(x,y) divided by the mean of both
    * sides' average top-k similarities — which suppresses hubness
    * (vectors near everything) that raw cosine thresholds cannot. A
    * pair survives at margin ≥ threshold.
    *
    * Scale shape (r18 single-pass rewrite — guide §8's "score once"):
    * cosine is SYMMETRIC, so the forward kNN (each left vector's top-k
    * over right) and the backward kNN (each right vector's top-k over
    * left) rank the SAME M×N pair scores — yet the previous two
    * [[knnJoinAuto]] passes each re-scanned and re-scored the full
    * cross product (2×M×N dots). Now both sides pack into bounded
    * blocks once ([[packBlocks]] — norms precomputed per row), ONE
    * size-dispatched block-pair join runs the fused kernel, and each
    * block pair emits BOTH directions' bounded top-k buffers (k rows
    * per id per opposite-side block — the pair stream never exists);
    * one CosineTopK aggregation keyed (side, qid) merges the block
    * buffers. Scores round to 4 decimals BEFORE ranking (the kNN
    * contract) so ranks, averages, and margins mirror
    * engine-independently; a pair's k-list and within-qid rank order
    * are identical to the two-pass form (CosineTopK's merge-order
    * invariance), so every downstream double sums in the same order.
    * Dispatch: either side broadcastable → one BroadcastNestedLoopJoin
    * streaming the other side's blocks; both oversized → the
    * shuffle_replicate_nl block grid. */
  def marginPairs(left: DataFrame, right: DataFrame, k: Int = 4,
                  threshold: Double = 1.05): DataFrame = {
    // no self-exclusion anywhere: the two corpora are INDEPENDENT id
    // spaces — a left id equal to a right id is a different vector, and
    // a self-kNN exclusion would silently drop that candidate pair and
    // shift both sides' top-k averages (review r11 finding)
    //
    // NO small-input row-form tier, deliberately (ADVICE r18 low,
    // measured r19): unlike knnJoinExact's ≤1024-QUERY fast path (a
    // handful of probes against a corpus — the packing exchanges
    // dominate), a margin call scores |L|×|R| pairs in BOTH directions,
    // so the two-pass row form pays the declarative BNLJ pair stream
    // twice. The blocked dual-direction kernel won at every size the
    // data offers: 250×250 sides 1.19 s vs 1.60 s row-form, 1000×1000
    // 1.8 s vs 3.6 s (isolated medians, this box).
    marginPairsBlocked(left, right, k, threshold)
  }

  /** Blocked dual-direction tier of [[marginPairs]] (r18): one fused
    * kernel pass per block pair scores each cross pair ONCE for both
    * kNN directions. `private[operators]` so MarginPairsSpec can assert
    * the two-pass row form (its independent reference) agrees. */
  private[operators] def marginPairsBlocked(left: DataFrame, right: DataFrame,
                                            k: Int, threshold: Double): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val lSmall = SizeDispatch.atMost(left, 100000L)
    val rSmall = lSmall || SizeDispatch.atMost(right, 100000L)
    val lB = packBlocks(asDouble(left)).toDF("lids", "lvecs", "lnorms")
    val rB = packBlocks(asDouble(right)).toDF("rids", "rvecs", "rnorms")
    val paired =
      if (lSmall) rB.crossJoin(broadcast(lB))
      else if (rSmall) lB.crossJoin(broadcast(rB))
      else lB.hint("shuffle_replicate_nl").crossJoin(rB.hint("shuffle_replicate_nl"))
    val schema = Seq.empty[(Int, Long, Long, Double)]
      .toDF("side", "qid", "vec_id", "cos_sim").schema
    import org.apache.spark.sql.Row
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    // one fused kernel pass per block pair emits BOTH directions' k-row
    // buffers: side 0 = forward (left queries over right candidates),
    // side 1 = backward — k rows per id per opposite-side block, never
    // the pair stream
    val both = paired
      .select("lids", "lvecs", "lnorms", "rids", "rvecs", "rnorms")
      .flatMap { r =>
      val lids = r.getSeq[Long](0).toArray
      val lvecs = r.getSeq[scala.collection.Seq[Double]](1).map(_.toArray).toArray
      val lnorms = r.getSeq[Double](2).toArray
      val rids = r.getSeq[Long](3).toArray
      val rvecs = r.getSeq[scala.collection.Seq[Double]](4).map(_.toArray).toArray
      val rnorms = r.getSeq[Double](5).toArray
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      scoreBlockPairBoth(lids, lvecs, lnorms, rids, rvecs, rnorms, k, out)
      out
    }.toDF("side", "qid", "vec_id", "cos_sim")
    val topk = graft.functions.Aggregators.cosineTopK(k)
    val ranked = Storage.track(both.groupBy("side", "qid")
      .agg(topk(col("cos_sim"), col("vec_id")).as("h"))
      .select(col("side"), col("qid"), col("h.sims").as("sims"),
        posexplode(col("h.ids")))
      .select(col("side"), col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col").as("vec_id"),
        element_at(col("sims"), (col("pos") + 1).cast("int")).as("cos_sim"))
      .localCheckpoint(true))
    val fwd = ranked.filter(col("side") === 0).drop("side")
    val avgL = fwd.groupBy("qid").agg(avg(col("cos_sim")).as("avg_l"))
    val avgR = ranked.filter(col("side") === 1)
      .groupBy("qid").agg(avg(col("cos_sim")).as("avg_r"))
      .withColumnRenamed("qid", "vec_id")
    // margin is exact DECIMAL(14,4) internally (exact threshold) and
    // emitted as DOUBLE — the decimal's nearest double, identical in
    // both engines (VERDICT r11 #1)
    fwd.filter(col("rank") === 1)
      .join(avgL, "qid")
      .join(avgR, "vec_id")
      .select(col("qid").as("left_id"), col("vec_id").as("right_id"),
        col("cos_sim"),
        TextAnalysis.dec4(col("cos_sim") / ((col("avg_l") + col("avg_r")) / 2))
          .as("margin_dec"))
      .filter(col("margin_dec") >= threshold)
      .select(col("left_id"), col("right_id"), col("cos_sim"),
        col("margin_dec").cast(org.apache.spark.sql.types.DoubleType).as("margin"))
      .orderBy("left_id")
  }

  /** The pre-r18 two-pass reference form of [[marginPairs]]: two
    * independent kNN joins, one per direction. NOT dispatched to (the
    * blocked dual-direction kernel beats it at every measured size —
    * see marginPairs); kept `private[operators]` as MarginPairsSpec's
    * independent parity reference for the fused kernel. */
  private[operators] def marginPairsRows(left: DataFrame, right: DataFrame,
                                         k: Int, threshold: Double): DataFrame = {
    val fwd = Storage.track(
      knnJoinAuto(right, left, k, excludeSelf = false).localCheckpoint(true))
    val bwd = knnJoinAuto(left, right, k, excludeSelf = false)
    val avgL = fwd.groupBy("qid").agg(avg(col("cos_sim")).as("avg_l"))
    val avgR = bwd.groupBy("qid").agg(avg(col("cos_sim")).as("avg_r"))
      .withColumnRenamed("qid", "vec_id")
    fwd.filter(col("rank") === 1)
      .join(avgL, "qid")
      .join(avgR, "vec_id")
      .select(col("qid").as("left_id"), col("vec_id").as("right_id"),
        col("cos_sim"),
        TextAnalysis.dec4(col("cos_sim") / ((col("avg_l") + col("avg_r")) / 2))
          .as("margin_dec"))
      .filter(col("margin_dec") >= threshold)
      .select(col("left_id"), col("right_id"), col("cos_sim"),
        col("margin_dec").cast(org.apache.spark.sql.types.DoubleType).as("margin"))
      .orderBy("left_id")
  }

  /** MMR diversified re-ranking (Carbonell & Goldstein 1998 "maximal
    * marginal relevance" — the retrieval-side diversity selector: a
    * RAG context window or eval panel wants the k most relevant
    * *non-redundant* documents, and a plain top-k hands back a stack
    * of near-duplicates). Greedy rule: pick argmax of
    * λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s).
    *
    * Scale shape: the DISTRIBUTED stage is the exact cosine top-`n`
    * prefilter (the [[cosineTopK]] TakeOrdered plan — no global sort);
    * the greedy then runs on the driver over the n candidates
    * (n×dim doubles — bounded metadata by contract, the
    * [[kmeansCentroids]] sample posture; n defaults to 64, and the
    * n² pairwise table a step needs is computed lazily per pick, O(nk)
    * dot products total). All similarities round to 4 decimals BEFORE
    * comparison (the kNN contract) with ties broken (score desc,
    * rel desc, vec_id asc) — fully deterministic on any engine or
    * partitioning. λ=1 degenerates to exactly the rounded-cosine
    * top-k order; λ=0 to pure farthest-first diversity after the
    * relevance seed. */
  def mmrRerank(emb: DataFrame, probeId: Long, k: Int, lambda: Double,
                n: Int = 64): DataFrame = {
    require(k > 0 && n >= k && lambda >= 0.0 && lambda <= 1.0,
      s"mmrRerank: bad knobs k=$k n=$n lambda=$lambda")
    val spark = emb.sparkSession
    import spark.implicits._
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val v = asDouble(emb)
    val probe = broadcast(v.filter(col("vec_id") === probeId).select(col("e").as("pe")))
    val cand = v.filter(col("vec_id") =!= probeId)
      .crossJoin(probe)
      .select(col("vec_id"),
        round(dot(col("e"), col("pe")) / (norm(col("e")) * norm(col("pe"))), 4)
          .as("rel"), col("e"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(n)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      r4(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
    var remaining = cand.toVector
    (1 to math.min(k, cand.length)).foreach { rank =>
      val scored = remaining.map { case (id, rel, e) =>
        val pen = if (selected.isEmpty) 0.0
          else selected.iterator.map(s => cos(e, s._2)).max
        (id, rel, e, r4(lambda * rel - (1 - lambda) * pen))
      }
      val best = scored.maxBy { case (id, rel, _, sc) => (sc, rel, -id) }
      picked += ((rank, best._1, best._2, best._4))
      selected += ((best._1, best._3))
      remaining = remaining.filterNot(_._1 == best._1)
    }
    picked.toSeq.toDF("rank", "vec_id", "relevance", "mmr_score")
  }
}
