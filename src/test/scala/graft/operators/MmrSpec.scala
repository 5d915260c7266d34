package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MMR diversified re-ranking (q113). */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  /** Probe 0 at e1; a tight near-dup stack along (0.99, 0.1, 0)
    * (ids 1-3), and two RELEVANT-but-diverse vectors tilted into
    * opposite off-axes (ids 4, 5). MMR's trade only bites when the
    * diverse candidates are competitive on relevance: a near-dup of
    * the probe has rel ≈ penalty ≈ 1 (score ≈ 0), so a zero-relevance
    * orthogonal vector would still lose to it. */
  private def fixture = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.1f, 0.0f)),
    (2L, Array(0.98f, 0.11f, 0.0f)),
    (3L, Array(0.97f, 0.12f, 0.0f)),
    (4L, Array(0.9f, -0.43f, 0.0f)),
    (5L, Array(0.9f, 0.0f, 0.43f))).toDF("vec_id", "embedding")

  test("lambda=1 reproduces the rounded-cosine top-k order exactly") {
    val topk = Similarity.cosineTopK(fixture, 0L, 3)
      .select("vec_id").as[Long].collect().toSeq
    val mmr = Similarity.mmrRerank(fixture, 0L, k = 3, lambda = 1.0, n = 5)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(mmr === topk)
  }

  test("lambda=0.5 breaks up the near-dup stack: picks cross clusters") {
    val got = Similarity.mmrRerank(fixture, 0L, k = 3, lambda = 0.5, n = 5)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    // rank 1 is the relevance argmax (id 1); then the redundant stack
    // (2, 3) is penalized and the diverse vectors win
    assert(got.head === 1L)
    assert(got.toSet === Set(1L, 4L, 5L), s"got $got")
  }

  test("k larger than the candidate pool returns the whole pool ranked") {
    val got = Similarity.mmrRerank(fixture, 0L, k = 10, lambda = 0.5, n = 10)
      .select("rank", "vec_id").as[(Int, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) === (1 to 5))
    assert(got.map(_._2).toSet === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("deterministic under repartition") {
    val a = Similarity.mmrRerank(fixture, 0L, k = 3, lambda = 0.5, n = 5)
      .orderBy("rank").collect().toSeq
    val b = Similarity.mmrRerank(fixture.repartition(7), 0L, k = 3, lambda = 0.5, n = 5)
      .orderBy("rank").collect().toSeq
    assert(a === b)
  }

  test("mmr_score is the rounded greedy marginal at every rank") {
    val got = Similarity.mmrRerank(fixture, 0L, k = 3, lambda = 0.5, n = 5)
      .orderBy("rank").select("vec_id", "relevance", "mmr_score")
      .as[(Long, Double, Double)].collect().toSeq
    // rank 1: no penalty -> score = 0.5 * relevance (rounded)
    val r1 = got.head
    assert(r1._3 === BigDecimal(0.5 * r1._2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // scores are achievable marginals: score <= lambda * relevance,
    // within the half-ulp the 4-decimal HALF_UP rounding can add
    got.foreach { case (_, rel, sc) => assert(sc <= 0.5 * rel + 5.1e-5) }
  }
}
