package graft.operators

import graft.SparkSpec

/** Count-min sketch (q86): one-sided estimates, the eps·N bound,
  * absent-token behavior, and merge-across-partitions correctness. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 'the' appears 12x, 'cat' 3x, 'rare' 1x; stream length 23
  private val docs = Seq(
    (1L, "the the the cat sat on the the mat rare"),
    (2L, "the the cat cat the"),
    (3L, "the the the the dog runs here and")
  ).toDF("doc_id", "text")

  test("estimates are exact-or-over, never under, and hit exact on this tiny stream") {
    val out = Sketches.cmsTokenCounts(docs, Seq("the", "cat", "rare", "ghost"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // eps=1e-4 over a 24-token stream: width 27k >> distinct 11, so no
    // collisions — estimates are exact
    assert(out("the") === 12L, s"hot token exact: $out")
    assert(out("cat") === 3L && out("rare") === 1L, s"estimates: $out")
    assert(out("ghost") === 0L, s"absent token estimates zero: $out")
  }

  test("the check contract holds on a multi-partition stream") {
    val wide = docs.repartition(8)
    val row = Sketches.cmsCheck(spark, wide, Seq("the", "cat", "rare", "ghost")).head()
    assert(row.getBoolean(0) && row.getBoolean(1),
      s"one-sided + eps bound must hold after partition merge: $row")
  }

  test("property: one-sided + eps bound hold on random Zipf-ish streams") {
    // deterministic pseudo-random corpora: skewed token draws (low ids
    // hot) exercise the hot/rare mix where CMS collisions actually land
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val docs = (1 to 20).map { d =>
        val toks = Seq.fill(30)(s"t${(math.sqrt(rnd.nextInt(400)).toInt)}")
        (d.toLong, toks.mkString(" "))
      }.toDF("doc_id", "text")
      val probes = (0 to 20).map(i => s"t$i") :+ "never_seen"
      val r = Sketches.cmsCheck(spark, docs, probes).head()
      assert(r.getBoolean(0), s"trial $trial: estimate under true count")
      assert(r.getBoolean(1), s"trial $trial: estimate above true + eps*N")
    }
  }

  test("estimates are deterministic for a fixed seed regardless of partitioning") {
    val a = Sketches.cmsTokenCounts(docs, Seq("the", "cat")).collect().toSeq
    val b = Sketches.cmsTokenCounts(docs.repartition(16), Seq("the", "cat")).collect().toSeq
    assert(a === b)
  }
}
