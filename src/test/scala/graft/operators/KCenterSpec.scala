package graft.operators

import graft.SparkSpec

/** k-center diversity selection (q93): farthest-first on a planted
  * geometry, tie rules, short clusters, and determinism. */
class KCenterSpec extends SparkSpec {
  import spark.implicits._

  // one tight cluster around +x with a known spread: the centroid sits
  // near the bulk (ids 0-3), id 4 drifts toward +y, id 5 sits between.
  // Farthest-first from the min-cohesion seed must walk the spread in
  // decreasing-coverage order.
  private val vecs: Seq[(Long, Seq[Float])] = Seq(
    0L -> Seq(1f, 0f), 1L -> Seq(0.99f, 0.02f), 2L -> Seq(0.98f, 0.04f),
    3L -> Seq(0.97f, 0.06f), 4L -> Seq(0.5f, 0.86f), 5L -> Seq(0.8f, 0.6f))
  private def df = vecs.toDF("vec_id", "embedding")

  test("farthest-first walks the planted spread and radii are monotone") {
    val rows = Similarity.kCenterSelect(df, k = 1, m = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length === 4)
    // seed = min cohesion = the +y drifter (id 4); next pick must be
    // from the opposite end of the cluster (the +x bulk, id 0)
    assert(rows(0)._2 === 4L, s"seed must be the farthest-from-centroid: ${rows.toSeq}")
    assert(rows(1)._2 === 0L, s"second pick must oppose the seed: ${rows.toSeq}")
    val ds = rows.drop(1).map(_._3)
    assert(ds.zip(ds.drop(1)).forall { case (a, b) => a >= b },
      s"coverage radius must be non-increasing: ${rows.toSeq}")
  }

  test("a cluster smaller than m yields its full membership, ranked") {
    val tiny = vecs.take(2).toDF("vec_id", "embedding")
    val rows = Similarity.kCenterSelect(tiny, k = 1, m = 5)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(rows.map(_._2).toSet === Set(0L, 1L), s"${rows.toSeq}")
    assert(rows.map(_._1).toSeq === Seq(1, 2))
  }

  test("selection is deterministic under repartition") {
    val a = Similarity.kCenterSelect(df, k = 1, m = 4).collect().toSeq
    val b = Similarity.kCenterSelect(df.repartition(7), k = 1, m = 4).collect().toSeq
    assert(a === b)
  }
}
