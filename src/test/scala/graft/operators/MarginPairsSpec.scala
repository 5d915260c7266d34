package graft.operators

import graft.SparkSpec

/** Margin-criterion bitext mining (q89): brute-force parity with the
  * ratio-margin closed form, and hubness suppression. */
class MarginPairsSpec extends SparkSpec {
  import spark.implicits._

  // left = even ids, right = odd ids. 1/3 are clean translations of
  // 0/2; 5 is a HUB (close to everything); 7 is filler so k=2 exists.
  private val vecs: Seq[(Long, Seq[Float])] = Seq(
    0L -> Seq(1f, 0f), 2L -> Seq(0f, 1f),
    1L -> Seq(0.99f, 0.05f), 3L -> Seq(0.05f, 0.99f),
    5L -> Seq(0.71f, 0.71f), 7L -> Seq(0.6f, 0.8f))
  private def df = vecs.toDF("vec_id", "embedding")
  private val left = vecs.filter(_._1 % 2 == 0)
  private val right = vecs.filter(_._1 % 2 == 1)

  private def r4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    r4(d / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
      math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)))
  }

  /** Brute-force ratio margin with the engine's conventions: cosines
    * rounded first, ties (cos desc, id asc), avg over top-k. */
  private def expected(k: Int): Map[(Long, Long), Double] = {
    def topk(x: (Long, Seq[Float]), others: Seq[(Long, Seq[Float])]) =
      others.map(o => (o._1, cos(x._2, o._2))).sortBy(t => (-t._2, t._1)).take(k)
    val avgL = left.map(l => l._1 -> topk(l, right).map(_._2).sum / k).toMap
    val avgR = right.map(r => r._1 -> topk(r, left).map(_._2).sum / k).toMap
    left.map { l =>
      val (rid, c) = topk(l, right).head
      (l._1, rid) -> r4(c / ((avgL(l._1) + avgR(rid)) / 2))
    }.toMap
  }

  test("pairs and margins match the brute-force ratio-margin closed form") {
    val d = df
    val got = Similarity.marginPairs(
      d.filter($"vec_id" % 2 === 0), d.filter($"vec_id" % 2 === 1),
      k = 2, threshold = 0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(got === expected(2), s"got $got")
    // the clean translations are the forward top-1s
    assert(got.keySet === Set((0L, 1L), (2L, 3L)))
  }

  test("the margin ranks the true translation above what raw cosine gives the hub") {
    val exp = expected(2)
    // margin of the true pair beats 1.0 (its cosine is far above the
    // neighborhood average); the hub's inflated average would drag any
    // pair with it toward 1.0 — the suppression the criterion exists for
    assert(exp((0L, 1L)) > 1.0 && exp((2L, 3L)) > 1.0, s"$exp")
  }

  test("left and right may share id values — colliding ids are distinct vectors, not self-pairs") {
    // remap right ids ONTO left ids: (0,1)->id 0, (0.99,...)->id 2 etc.
    // The true translation pairs are now (0,0) and (2,2) — exactly the
    // pairs the kNN self-exclusion would silently drop
    val remap = Map(1L -> 0L, 3L -> 2L, 5L -> 4L, 7L -> 6L)
    val l = left.toDF("vec_id", "embedding")
    val r = right.map { case (id, v) => (remap(id), v) }.toDF("vec_id", "embedding")
    val got = Similarity.marginPairs(l, r, k = 2, threshold = 0.0).collect()
      .map(ro => (ro.getLong(0), ro.getLong(1))).toSet
    assert(got === Set((0L, 0L), (2L, 2L)),
      s"colliding ids must still pair by geometry: $got")
  }

  test("the fused dual-direction kernel equals the two-pass row-form reference") {
    // marginPairs scores every (l, r) pair ONCE for both directions;
    // the independent reference runs one kNN join per direction — the
    // two must produce identical rows: margins, order, schema
    val d = df
    val l = d.filter($"vec_id" % 2 === 0)
    val r = d.filter($"vec_id" % 2 === 1)
    val fused = Similarity.marginPairs(l, r, k = 2, threshold = 0.0).collect().toSeq
    val twoPass = Similarity.marginPairsRows(l, r, k = 2, threshold = 0.0)
      .collect().toSeq
    assert(fused === twoPass)
  }

  test("threshold filters and determinism under repartition") {
    val d = df.repartition(5)
    val a = Similarity.marginPairs(d.filter($"vec_id" % 2 === 0),
      d.filter($"vec_id" % 2 === 1), k = 2, threshold = 1.0).collect().toSeq
    val b = Similarity.marginPairs(df.filter($"vec_id" % 2 === 0),
      df.filter($"vec_id" % 2 === 1), k = 2, threshold = 1.0).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty && a.forall(_.getDouble(3) >= 1.0))
  }
}
