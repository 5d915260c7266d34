package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Prototypicality pruning (q90): hardest-first selection on planted
  * clusters, quota arithmetic, the easy-keep flip, and determinism. */
class PrototypicalitySpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters on orthogonal axes; within each, members at
  // decreasing alignment with the axis (decreasing cohesion): the
  // LAST ids per cluster are the hardest
  private def axis(a: Float, b: Float, ids: Seq[Long]): Seq[(Long, Seq[Float])] =
    ids.zipWithIndex.map { case (id, i) =>
      val drift = 0.08f * i
      (id, Seq(a + drift * b, b + drift * a))
    }
  private val vecs = axis(1f, 0f, Seq(0L, 1L, 2L, 3L, 4L)) ++
    axis(0f, 1f, Seq(10L, 11L, 12L, 13L, 14L))
  private def df = vecs.toDF("vec_id", "embedding")

  test("hardest keepFrac per cluster is kept; quota is ceil(frac*n)") {
    val out = Similarity.prototypicalityPrune(df, k = 2, keepFrac = 0.4)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getBoolean(5))).toMap
    // per cluster of 5, ceil(0.4*5)=2 kept
    val keptByTopic = out.values.groupBy(_._1).map { case (t, xs) =>
      t -> xs.count(_._3) }
    assert(keptByTopic.values.forall(_ === 2), s"quota: $out")
    // within each cluster the kept members have strictly lower (or
    // tied-by-id) cohesion than every dropped member
    out.values.groupBy(_._1).foreach { case (_, xs) =>
      val kept = xs.filter(_._3).map(_._2)
      val dropped = xs.filterNot(_._3).map(_._2)
      assert(kept.max <= dropped.min, s"hardest-first violated: $out")
    }
  }

  test("keepEasiest flips the selection to the prototypes") {
    val hard = Similarity.prototypicalityPrune(df, k = 2, keepFrac = 0.4)
      .filter(col("keep")).select("vec_id").as[Long].collect().toSet
    val easy = Similarity.prototypicalityPrune(df, k = 2, keepFrac = 0.4,
      keepEasiest = true)
      .filter(col("keep")).select("vec_id").as[Long].collect().toSet
    assert(hard.intersect(easy).isEmpty,
      s"hard/easy 40% slices of 5-member clusters cannot overlap: $hard vs $easy")
  }

  test("selection is deterministic under repartition") {
    val a = Similarity.prototypicalityPrune(df, k = 2, keepFrac = 0.4).collect().toSeq
    val b = Similarity.prototypicalityPrune(df.repartition(7), k = 2, keepFrac = 0.4)
      .collect().toSeq
    assert(a === b)
  }
}
