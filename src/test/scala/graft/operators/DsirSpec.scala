package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance weighting: direction, determinism, and the hashed
  * feature tier's exactness when the hash is injective on the vocab. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target talks about cats; raw docs 1-2 are cat-like, 3-4 are not
  private val target = Seq(
    (100L, "cat cat feline cat purr"),
    (101L, "cat purr feline")).toDF("doc_id", "text")
  private val raw = Seq(
    (1L, "cat purr cat feline"),
    (2L, "cat cat cat"),
    (3L, "dog bark growl dog"),
    (4L, "stock market index fund")).toDF("doc_id", "text")

  test("target-like docs score higher; weights are deterministic") {
    val w = Dsir.importanceWeights(raw, target).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(3L) && w(2L) > w(4L),
      s"cat docs must out-score dog/finance docs: $w")
    assert(w(3L) > w(4L) || w(3L) < 0,
      s"off-target docs stay below target-like ones: $w")
    val again = Dsir.importanceWeights(raw, target).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again === w)
  }

  test("hashed-bucket tier equals the token tier when the hash is injective") {
    // vocab here is ~10 tokens; 2^20 buckets make collisions vanishingly
    // unlikely, and an injective bucketing preserves every count and the
    // vocab size, so the weights are EXACTLY equal
    val tok = Dsir.importanceWeights(raw, target).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val hashed = Dsir.importanceWeights(raw, target, hashBuckets = 1 << 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(hashed === tok)
  }

  test("resample keeps the top fraction by gumbel score, deterministically") {
    val sel = Dsir.select(raw, target, frac = 0.5)
    val rows = sel.collect().map(r =>
      (r.getLong(0), r.getDouble(3), r.getBoolean(4)))
    assert(rows.length === 4)
    // exactly the top-2 by (score desc, doc_id) are kept at frac=0.5
    // (percent_rank < 0.5 over 4 rows keeps ranks 0 and 1)
    val byScore = rows.sortBy(r => (-r._2, r._1))
    assert(byScore.take(2).forall(_._3) && byScore.drop(2).forall(!_._3),
      s"top half kept: ${byScore.toSeq}")
    val again = Dsir.select(raw, target, frac = 0.5).collect()
      .map(r => (r.getLong(0), r.getBoolean(4))).toSeq
    assert(again === rows.map(r => (r._1, r._3)).toSeq)
  }

  test("the model broadcasts and the corpus shuffles once (plan audit)") {
    val plan = Dsir.importanceWeights(raw, target).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the log-ratio model must broadcast into the instance join:\n$plan")
  }
}
