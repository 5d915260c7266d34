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

  test("non-convergence within maxIterations throws instead of emitting partial components") {
    // a 12-node path has diameter 11; 3 rounds of min-label propagation
    // cannot finish — the guard must surface that loudly (a silent return
    // would yield several components where there is one)
    val pairs = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("da", "db")
    val e = intercept[IllegalStateException] {
      Clustering.connectedComponents(pairs, maxIterations = 3).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("superseded label generations are unpersisted each iteration") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val pairs = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("da", "db")
    Clustering.connectedComponents(pairs).collect()
    // only the final generation's checkpoint (plus nothing else from the
    // loop) may remain; superseded ones were released explicitly
    assert(sc.getPersistentRDDs.size <= before + 1)
  }

  test("reliable checkpoint mode produces the same components") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("da", "db")
    val cc = Clustering.connectedComponents(pairs, reliableCheckpointDir = Some(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("cluster summary: canonical id, size, sorted members") {
    val pairs = Seq((5L, 9L), (9L, 2L), (30L, 31L)).toDF("da", "db")
    val rows = Clustering.nearDupClusters(pairs).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq === Seq(
      (2L, 3L, "2,5,9"),
      (30L, 2L, "30,31")))
  }
}
