package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The 100×-scale posture for the ONE shuffle the dedup kernels keep
  * (the inverted-index grouping): a corpus with a genuinely hot
  * boilerplate shingle must engage the hot-shingle cap machinery —
  * plan-asserted, not just value-asserted — and the session must leave
  * AQE's skew-join split armed as the backstop for residual skew
  * (VERDICT r10 #6). */
class SkewPostureSpec extends SparkSpec {
  import spark.implicits._

  // 60 docs all opening with the same boilerplate sentence (every pure
  // boilerplate shingle has document frequency 60 — hot at cap 10);
  // docs i and i+30 share a COLD tail, so each true near-dup pair has
  // cold candidate shingles and survives candidate generation, while
  // cross pairs share ONLY boilerplate (jac 5/13 — below the 0.5
  // threshold, the regime the cap is designed for)
  private def skewed = (0 until 60).map { i =>
    val t = i % 30
    (i.toLong, s"call now for your free offer today tA$t tB$t tC$t tD$t")
  }.toDF("doc_id", "text")

  test("a hot shingle over the cap engages the restitution plan, not the quadratic join") {
    val capped = Dedup.jaccardPairs(skewed, 0.5, maxShingleDocFreq = Some(10))
    val plan = capped.queryExecution.executedPlan.toString
    // the cap machinery's two fingerprints: hot instances are filtered
    // OUT of candidate generation (is_hot null-filter on the cold side)
    // and their contribution to `common` is restored exactly via the
    // per-doc hot-array intersect
    assert(plan.contains("array_intersect"),
      s"hot restitution must be in the plan:\n${plan.take(4000)}")
    assert(plan.toLowerCase.contains("is_hot"),
      s"cold-side candidate generation must exclude hot shingles:\n${plan.take(4000)}")
  }

  test("capped output is exact on the skewed corpus (restitution, not approximation)") {
    // every QUALIFYING pair (the tail twins, jac 1.0) has cold shingles
    // in its overlap, so the capped plan must reproduce the uncapped
    // result exactly — the hot restitution returns the boilerplate's
    // contribution to `common` without ever pairing through it
    val uncapped = Dedup.jaccardPairs(skewed, 0.5).collect().map(_.toSeq).toSeq
    val capped = Dedup.jaccardPairs(skewed, 0.5, maxShingleDocFreq = Some(10))
      .collect().map(_.toSeq).toSeq
    assert(capped === uncapped)
    assert(capped.size === 30, "all 30 tail-twin pairs must qualify at jac 1.0")
  }

  test("AQE skew-join split stays armed as the residual backstop") {
    // the kernels' own mitigation is the cap; for skew the cap cannot
    // see (e.g. a hot JOIN key on a probe side), Spark's runtime skew
    // split must not have been disabled by any session configuration
    assert(spark.conf.get("spark.sql.adaptive.enabled").toBoolean,
      "AQE must stay enabled")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled").toBoolean,
      "AQE skew-join split must stay enabled")
  }
}
