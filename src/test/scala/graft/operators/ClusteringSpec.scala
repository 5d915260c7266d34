package graft.operators

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {

  import spark.implicits._

  test("connected components merge transitive near-dup families") {
    // two families: {1,2,3} via chain 1-2, 2-3 (1-3 never paired) and
    // {10,11}; plus an isolated pair member 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("da", "db")
    val cc = Clustering.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc(1L) === 1L && cc(2L) === 1L && cc(3L) === 1L)
    assert(cc(10L) === 10L && cc(11L) === 10L)
    assert(cc(20L) === 20L && cc(21L) === 20L)
  }

  test("a long chain converges (diameter > 1 iteration)") {
    val pairs = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("da", "db")
    val cc = Clustering.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cc.map(_._2).distinct.toSeq === Seq(0L)) // one component, min id 0
    assert(cc.length === 12)
  }

  test("cluster summary: canonical id, size, sorted members") {
    val pairs = Seq((5L, 9L), (9L, 2L), (30L, 31L)).toDF("da", "db")
    val rows = Clustering.nearDupClusters(pairs).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq === Seq(
      (2L, 3L, "2,5,9"),
      (30L, 2L, "30,31")))
  }
}
