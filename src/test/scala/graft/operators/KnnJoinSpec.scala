package graft.operators

import graft.SparkSpec
import graft.functions.Aggregators
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Batch kNN join: exact tier vs a declarative window brute force,
  * partitioning invariance of the bounded top-k aggregation, and the
  * IVF-batched tier's recall + build-once contract. Property cases use
  * raw seeded ScalaCheck Gens (no scalatest bridge in the offline
  * cache), as in PgArrayLiteralSpec. */
class KnnJoinSpec extends SparkSpec {
  import spark.implicits._

  private def forAllSamples[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val dim = 16

  /** Clustered fixture: `nClusters` well-separated unit-ish centers, each
    * with `perCluster` members = center + small noise. Neighbors of any
    * member are its cluster-mates — unambiguous at cosine >= 0.9. */
  private def clustered(nClusters: Int, perCluster: Int, seed: Long = 11L) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = for {
      c <- 0 until nClusters
      m <- 0 until perCluster
    } yield ((c * perCluster + m).toLong,
      centers(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat))
    rows.toDF("vec_id", "embedding")
  }

  /** Window-based exact twin: rank ALL rounded cosines per query. The
    * operator must match this row-for-row (it computes the same rounded
    * scores, just through the bounded-heap aggregation). */
  private def bruteForce(corpus: org.apache.spark.sql.DataFrame,
                         queries: org.apache.spark.sql.DataFrame, k: Int) = {
    import graft.functions.VectorExpressions.{vec_dot, vec_norm}
    val c = corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val q = c.join(queries.select(col("vec_id").as("qid")), col("vec_id") === col("qid"))
      .select(col("qid"), col("e").as("qe"))
    val scored = c.crossJoin(q).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(vec_dot(col("e"), col("qe")) / (vec_norm(col("e")) * vec_norm(col("qe"))), 4)
          .as("cos_sim"))
    scored.withColumn("rank",
        row_number().over(Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("cos_sim"))
      .orderBy("qid", "rank")
  }

  test("knnJoinExact matches the window brute force row-for-row") {
    val df = clustered(4, 12)
    val queries = df.filter(col("vec_id") % 7 === 0)
    val got = Similarity.knnJoinExact(df, queries, k = 5).collect().toSeq
    val want = bruteForce(df, queries, k = 5).collect().toSeq
    assert(got == want)
  }

  test("exact tier is invariant to corpus partitioning (merge order)") {
    val df = clustered(3, 10, seed = 23L)
    val queries = df.filter(col("vec_id") < 3)
    val base = Similarity.knnJoinExact(df, queries, k = 4).collect().toSeq
    for (n <- Seq(1, 3, 7)) {
      val got = Similarity.knnJoinExact(df.repartition(n), queries, k = 4).collect().toSeq
      assert(got == base, s"numPartitions=$n diverged")
    }
  }

  test("CosineTopK buffer: bounded size, rank order, deterministic tie-break") {
    val agg = new Aggregators.CosineTopK(3)
    val gen = Gen.listOf(Gen.zip(Gen.chooseNum(-1.0, 1.0), Gen.long))
    forAllSamples(gen) { xs =>
      val clean = xs.filterNot { case (s, _) => s.isNaN }
        .map { case (s, id) => (math.rint(s * 1e4) / 1e4, id) }.distinct
      val buf = clean.foldLeft(agg.zero)(agg.reduce)
      val out = agg.finish(buf)
      val want = clean.sortBy { case (s, id) => (-s, id) }.take(3)
      assert(out.ids.length == math.min(3, clean.length))
      assert(out.sims.lazyZip(out.ids).toList == want.map(t => (t._1, t._2)))
      // merge in arbitrary split order agrees with single-pass reduce
      val (l, r) = clean.splitAt(clean.length / 2)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      assert(merged == out)
    }
  }

  test("k larger than the candidate set returns all candidates, ranked") {
    val df = clustered(1, 4, seed = 31L)
    val queries = df.filter(col("vec_id") === 0)
    val got = Similarity.knnJoinExact(df, queries, k = 50)
    assert(got.select("vec_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(got.select("rank").as[Int].collect().toSeq == Seq(1, 2, 3))
  }

  test("knnJoinIvf recovers cluster-mates with recall 1.0 on separated clusters") {
    val df = clustered(8, 16, seed = 47L)
    val queries = df.filter(col("vec_id") % 16 === 0) // one query per cluster
    val index = Similarity.buildIvfIndex(df, nLists = 8)
    try {
      val exact = Similarity.knnJoinExact(df, queries, k = 5)
        .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivf = Similarity.knnJoinIvf(index, queries, k = 5, nProbe = 3)
        .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(exact == ivf, "clustered fixture: IVF batch join must recall the exact top-5")
    } finally Storage.releaseAll()
  }

  test("knnJoinExact with an empty query set returns an empty, well-typed result") {
    val df = clustered(2, 5, seed = 71L)
    val got = Similarity.knnJoinExact(df, df.filter(col("vec_id") < 0), k = 3)
    assert(got.count() === 0L)
    assert(got.columns.toSeq === Seq("qid", "rank", "vec_id", "cos_sim"))
  }

  test("knnJoinExact plan: broadcast queries + two-phase bounded top-k aggregation") {
    val df = clustered(4, 12, seed = 61L)
    val plan = Similarity.knnJoinExact(df, df.filter(col("vec_id") < 2), k = 3)
      .queryExecution.executedPlan.toString
    // corpus never shuffles into the join — the query side broadcasts
    assert(plan.contains("BroadcastNestedLoopJoin"), s"expected broadcast join:\n$plan")
    // the bounded-heap UDAF must run partial (map-side) + final — k rows
    // per query per partition into the exchange, not the candidate set
    assert("ObjectHashAggregate".r.findAllMatchIn(plan).size >= 2,
      s"expected two-phase ObjectHashAggregate:\n$plan")
  }

  test("knnJoinGrid (non-broadcastable-queries tier) matches knnJoinExact row-for-row") {
    val df = clustered(4, 12, seed = 83L)
    val queries = df.filter(col("vec_id") % 5 === 0)
    val exact = Similarity.knnJoinExact(df, queries, k = 5).collect().toSeq
    val grid = Similarity.knnJoinGrid(df, queries, k = 5).collect().toSeq
    assert(grid == exact)
    // tier choice survives repartitioning (merge-order invariance)
    val gridParts = Similarity.knnJoinGrid(df.repartition(7), queries.repartition(3), k = 5)
      .collect().toSeq
    assert(gridParts == exact)
  }

  test("knnJoinGrid plan: shuffle-replicate cartesian grid, no broadcast of either side") {
    val df = clustered(3, 8, seed = 89L)
    val plan = Similarity.knnJoinGrid(df, df.filter(col("vec_id") < 2), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("CartesianProduct"), s"expected the task grid:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"grid tier must not broadcast:\n$plan")
  }

  test("knnJoinAuto dispatches on a bounded query count and both routes agree") {
    val df = clustered(3, 8, seed = 101L)
    val queries = df.filter(col("vec_id") < 4)
    val base = Similarity.knnJoinExact(df, queries, k = 3).collect().toSeq
    // above the threshold: broadcast tier
    val bc = Similarity.knnJoinAuto(df, queries, k = 3, broadcastableQueries = 100L)
    assert(bc.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    assert(bc.collect().toSeq == base)
    // forced tiny threshold: grid tier, identical rows (VERDICT r7 #7 parity)
    val grid = Similarity.knnJoinAuto(df, queries, k = 3, broadcastableQueries = 2L)
    assert(grid.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    assert(grid.collect().toSeq == base)
  }

  test("knnJoinIvf probes a built index without re-running assignment") {
    val df = clustered(4, 8, seed = 53L)
    val index = Similarity.buildIvfIndex(df, nLists = 4)
    try {
      // the pinned assignment is an ExistingRDD scan in the probe plan —
      // proof the batch join reads the checkpoint, not the build lineage
      val plan = Similarity.knnJoinIvf(index, df.filter(col("vec_id") < 2), k = 3)
        .queryExecution.executedPlan.toString
      assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
        s"expected the probe to scan the pinned assignment, got:\n$plan")
    } finally Storage.releaseAll()
  }
}
