package graft.operators

import graft.SparkSpec

/** Weighted PageRank over a host link graph (q115). */
class LinkAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String, Long)],
                    maxDriverEdges: Long = 4000000L): Map[String, Double] =
    LinkAnalysis.pageRank(edges.toDF("src", "dst", "weight"),
        maxDriverEdges = maxDriverEdges)
      .as[(String, Double)].collect().toMap

  test("symmetric two-node graph splits rank evenly") {
    val r = ranks(Seq(("a", "b", 1L), ("b", "a", 1L)))
    assert(r("a") === 0.5 && r("b") === 0.5)
  }

  test("uniform ring is uniform; a hub attracts rank") {
    val ring = ranks(Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L)))
    assert(ring.values.toSet.size === 1)
    // everyone links the hub; the hub pours its whole mass into spoke
    // a — both tower over the unlinked spokes, which tie at the floor
    val hub = ranks(Seq(("a", "h", 1L), ("b", "h", 1L), ("c", "h", 1L), ("h", "a", 1L)))
    assert(hub("h") > hub("b") && hub("a") > hub("b") && hub("b") === hub("c"))
  }

  test("edge weights steer the split") {
    // a sends 3/4 of its mass to b, 1/4 to c
    val r = ranks(Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L)))
    assert(r("b") > r("c") && r("a") > r("b"))
  }

  test("dangling node leaks mass (documented simplified form)") {
    // b has no out-edges: total rank < 1
    val r = ranks(Seq(("a", "b", 1L)))
    assert(r.values.sum < 1.0 && r("b") > r("a"))
  }

  test("every node keeps at least the teleport floor (1-d)/N") {
    val r = ranks(Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L), ("a", "d", 1L)))
    r.values.foreach(v => assert(v >= 0.15 / 4 - 1e-9))
  }

  test("distributed tier matches the driver tier at 6 decimals") {
    val edges = (0L until 40L).map(i =>
      (s"h${i % 8}", s"h${(i * 3 + 1) % 8}", 1L + i % 3))
    val drv = ranks(edges)
    val dist = ranks(edges, maxDriverEdges = 0L)
    assert(dist === drv)
  }

  private def ranksD(edges: Seq[(String, String, Long)],
                     maxDriverEdges: Long = 4000000L): Map[String, Double] =
    LinkAnalysis.pageRank(edges.toDF("src", "dst", "weight"),
        maxDriverEdges = maxDriverEdges, redistributeDangling = true)
      .as[(String, Double)].collect().toMap

  test("dangling redistribution conserves mass on a dangling-heavy graph") {
    // three of five nodes are dangling sinks; the published form keeps
    // the total at 1 (to rounding), the simplified form leaks it
    val edges = Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "d", 1L),
      ("a", "e", 2L))
    val simplified = ranks(edges)
    val published = ranksD(edges)
    assert(simplified.values.sum < 0.9)
    assert(math.abs(published.values.sum - 1.0) < 1e-4)
    // heavier-weighted sink still ranks above its siblings
    assert(published("e") > published("c"))
  }

  test("dangling-free graph: redistribution is a no-op") {
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
    assert(ranksD(edges) === ranks(edges))
  }

  test("distributed tier matches driver tier with redistribution on") {
    val edges = (0L until 30L).map(i =>
      (s"h${i % 7}", s"h${(i * 5 + 2) % 9}", 1L + i % 2)) // h7/h8 dangle
    val drv = ranksD(edges)
    val dist = ranksD(edges, maxDriverEdges = 0L)
    assert(math.abs(drv.values.sum - 1.0) < 1e-4)
    // float fold order differs across tiers; compare at 6 decimals
    drv.foreach { case (k, v) => assert(math.abs(dist(k) - v) < 1e-6) }
  }
}
