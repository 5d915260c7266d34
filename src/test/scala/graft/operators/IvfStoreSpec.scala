package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Disk-persisted IVF index (VERDICT r7 #1/#8): write → fresh read
  * round-trip recall, partition-pruned probe scans, and the stored
  * packed-codes quantized tier whose probe plan carries no quantize
  * expressions. */
class IvfStoreSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  /** Same separated-cluster fixture as KnnJoinSpec: neighbors of any
    * member are its cluster-mates — unambiguous at cosine >= 0.9. */
  private def clustered(nClusters: Int, perCluster: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = for {
      c <- 0 until nClusters
      m <- 0 until perCluster
    } yield ((c * perCluster + m).toLong,
      centers(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat))
    rows.toDF("vec_id", "embedding")
  }

  /** Build once, write, release the in-memory checkpoint, read back fresh
    * — every test probes the DISK index, never the build lineage. */
  private lazy val fixture: (org.apache.spark.sql.DataFrame, Similarity.IvfIndex, Array[Double]) = {
    val df = clustered(8, 16, seed = 97L)
    val path = java.nio.file.Files.createTempDirectory("ivf-store").toString
    val built = Similarity.buildIvfIndex(df, nLists = 8)
    Similarity.writeIvfIndex(built, path)
    Storage.releaseAll() // the checkpoint dies with the session; the disk index must not
    val index = Similarity.readIvfIndex(spark, path)
    val probeVec = df.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    (df, index, probeVec)
  }

  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect()
    // AQE wraps the final plan in AdaptiveSparkPlanExec and hides shuffle
    // subtrees inside leaf QueryStageExec nodes — unwrap both
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  test("round-trip: fresh read-back probeIvf matches the exact scan on separated clusters") {
    val (df, index, probeVec) = fixture
    assert(index.nLists === 8)
    val got = Similarity.probeIvf(index, probeVec, k = 5, nProbe = 3, excludeId = Some(0L))
      .select("vec_id").as[Long].collect().toSet
    val want = Similarity.cosineTopK(df, probeId = 0L, k = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(got === want, "disk round-trip must preserve recall")
  }

  test("probes over the stored index prune partitions to the probed lists") {
    val (_, index, probeVec) = fixture
    val probe = Similarity.probeIvf(index, probeVec, k = 5, nProbe = 2, excludeId = Some(0L))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"expected a partition-pruned scan:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*list".r.findFirstIn(plan).isDefined,
      s"expected the list filter INSIDE PartitionFilters (pruning, not a post-scan filter):\n$plan")
    // pruning is physical: 2 of 8 list partitions' files are touched
    val probed = filesRead(probe)
    val total = filesRead(index.assigned.select("vec_id", "list"))
    assert(probed > 0 && probed < total,
      s"probe read $probed of $total files — expected partition pruning")
  }

  test("quantized probe scans stored codes: no quantize expressions in the plan") {
    val (_, index, probeVec) = fixture
    val q = Similarity.probeIvfQuantized(index, probeVec, k = 5, nProbe = 3, excludeId = Some(0L))
    val plan = q.queryExecution.executedPlan.toString
    // Quantize.int8 would show as array_min/array_max/FLOOR over the float
    // vectors — the stored layout means none of that survives into serving
    assert(!plan.contains("array_min") && !plan.contains("array_max") &&
      !plan.toUpperCase.contains("FLOOR("),
      s"quantize expressions leaked into the stored-codes probe plan:\n$plan")
    assert(plan.contains("PartitionFilters"), s"quantized probe must prune too:\n$plan")
    // structural ranking contract (as QuantizeSpec): cluster separation
    // dwarfs quantization error, so every neighbor is a cluster-mate
    val ids = q.select("vec_id").as[Long].collect().toSet
    assert(ids.forall(id => id >= 1L && id <= 15L),
      s"every neighbor must come from the probe's cluster (ids 1-15): $ids")
    assert(ids.size === 5)
  }

  test("probeIvfQuantized over an unpersisted (in-memory) index fails with a clear message") {
    val (df, _, probeVec) = fixture
    val mem = Similarity.buildIvfIndex(df, nLists = 4)
    try {
      val ex = intercept[IllegalArgumentException](
        Similarity.probeIvfQuantized(mem, probeVec, k = 3))
      assert(ex.getMessage.contains("writeIvfIndex"))
    } finally Storage.releaseAll()
  }

  test("knnJoinIvf runs unchanged over a read-back index") {
    val (df, index, _) = fixture
    val queries = df.filter(col("vec_id") % 16 === 0)
    val exact = Similarity.knnJoinExact(df, queries, k = 5)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.knnJoinIvf(index, queries, k = 5, nProbe = 3)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === ivf)
  }

  test("batch kNN join over a stored index prunes to the union of probed lists") {
    val (df, index, _) = fixture
    // two queries from the same cluster probe overlapping lists — the
    // static union filter must reach PartitionFilters and skip files
    val join = Similarity.knnJoinIvf(index, df.filter(col("vec_id") < 2), k = 3, nProbe = 2)
    val plan = join.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*list".r.findFirstIn(plan).isDefined,
      s"expected the probed-list union inside PartitionFilters:\n$plan")
    val probed = filesRead(join)
    val total = filesRead(index.assigned.select("vec_id", "list"))
    assert(probed > 0 && probed < total,
      s"batch join read $probed of $total files — expected partition pruning")
  }
}
