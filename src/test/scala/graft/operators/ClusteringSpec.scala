package graft.operators

import graft.SparkSpec

/** Connected components is size-tiered (driver union-find below the
  * edge threshold, distributed label propagation + pointer jumping
  * above); `dist` forces the distributed tier so both stay covered. */
class ClusteringSpec extends SparkSpec {

  import spark.implicits._

  private def dist(pairs: org.apache.spark.sql.DataFrame, maxIterations: Int = 20,
                   dir: Option[String] = None) =
    Clustering.connectedComponents(pairs, maxIterations = maxIterations,
      reliableCheckpointDir = dir, localEdgeThreshold = 0L)

  test("connected components merge transitive near-dup families (both tiers)") {
    // two families: {1,2,3} via chain 1-2, 2-3 (1-3 never paired) and
    // {10,11}; plus an isolated pair member 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("da", "db")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L)
    for (cc <- Seq(Clustering.connectedComponents(pairs), dist(pairs))) {
      assert(cc.collect().map(r => (r.getLong(0), r.getLong(1))).toMap === expected)
    }
  }

  test("a long chain converges in both tiers (diameter > 1 iteration)") {
    val pairs = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("da", "db")
    for (ccDf <- Seq(Clustering.connectedComponents(pairs), dist(pairs))) {
      val cc = ccDf.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(cc.map(_._2).distinct.toSeq === Seq(0L)) // one component, min id 0
      assert(cc.length === 12)
    }
  }

  test("tiers agree on a random graph") {
    val rnd = new scala.util.Random(31)
    val pairs = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(p => p._1 != p._2).toDF("da", "db")
    val local = Clustering.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val distributed = dist(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(local === distributed)
  }

  test("non-convergence within maxIterations throws instead of emitting partial components") {
    // a 40-node path has diameter 39; 2 rounds of propagation + path
    // halving cannot finish — the guard must surface that loudly (a
    // silent return would yield several components where there is one)
    val pairs = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("da", "db")
    val e = intercept[IllegalStateException] {
      dist(pairs, maxIterations = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("superseded label generations are unpersisted each iteration") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val pairs = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("da", "db")
    dist(pairs).collect()
    // only the final generation's checkpoint (plus nothing else from the
    // loop) may remain; superseded ones were released explicitly
    assert(sc.getPersistentRDDs.size <= before + 1)
  }

  test("reliable checkpoint mode produces the same components") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("da", "db")
    val cc = dist(pairs, dir = Some(dir))
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
