package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SemDeDup: within-cluster pruning semantics on planted clusters. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated directions; ids 1/2 are parallel (cos = 1),
  // id 3 is a distinct member of the same direction-cluster; 10/11 are
  // IDENTICAL vectors planted in different direction-clusters
  private def vec(axis: Int, scale: Double, jitter: Double = 0.0): Seq[Float] = {
    val v = Array.fill(8)(0.0)
    v(axis) = 1.0 * scale
    v((axis + 1) % 8) += jitter
    v.map(_.toFloat).toSeq
  }

  test("within-cluster kernel pairs same-cluster near-dups only") {
    val emb = Seq(
      (1L, vec(0, 1.0), 0L),
      (2L, vec(0, 2.0), 0L), // parallel to 1 -> cos 1.0, same cluster
      (3L, vec(0, 1.0, jitter = 0.9), 0L), // same cluster, cos ~0.74
      (10L, vec(3, 1.0), 1L),
      (11L, vec(3, 1.0), 2L) // identical to 10 but a DIFFERENT cluster
    ).toDF("vec_id", "embedding", "cluster")
    val pairs = Dedup.embeddingNearDupPairsByCluster(emb, threshold = 0.95)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(pairs.toSet === Set((1L, 2L)),
      s"only the same-cluster parallel pair qualifies: ${pairs.toSeq}")
  }

  test("semDedup keeps one member per family — the farthest from centroid, ties to lowest id") {
    val emb = (Seq(
      (1L, vec(0, 1.0)), (2L, vec(0, 2.0)), // dup family (cos 1.0), equal cohesion -> id 1 survives
      (3L, vec(0, 1.0, jitter = 0.9))) ++
      (10L to 20L).map(i => (i, vec(((i - 10) % 3 + 1).toInt, 1.0, jitter = 0.05 * (i - 9))))
      ).toDF("vec_id", "embedding")
    val survivors = Similarity.semDedup(emb, k = 4, threshold = 0.999)
    val kept = survivors.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(!kept.contains(2L) && kept.contains(1L),
      s"the parallel pair collapses to the lower id on a cohesion tie: $kept")
    assert(kept.contains(3L), s"non-dup same-cluster member survives: $kept")
    assert(kept.size === emb.count() - 1, s"exactly one vector removed: $kept")
    // survivors carry their assignment topics unchanged
    val assigned = Similarity.assignTopics(emb, 4)
      .select("vec_id", "topic", "cohesion")
    assert(survivors.select("vec_id", "topic", "cohesion")
      .except(assigned).count() === 0L)
  }

  test("no qualifying within-cluster pair remains among survivors") {
    val emb = (1L to 24L).map { i =>
      val axis = (i % 4).toInt
      (i, vec(axis, 1.0 + 0.1 * (i / 4), jitter = if (i % 8 < 4) 0.0 else 0.3))
    }.toDF("vec_id", "embedding")
    val survivors = Similarity.semDedup(emb, k = 4, threshold = 0.98)
    val assigned = Similarity.assignTopics(emb, 4)
      .select(col("vec_id"), col("topic").as("cluster"))
    val sEmb = emb.join(survivors.select("vec_id"), "vec_id").join(assigned, "vec_id")
    val left = Dedup.embeddingNearDupPairsByCluster(sEmb, threshold = 0.98).count()
    assert(left === 0L, "survivors must contain no within-cluster near-dup pair")
  }
}
