package graft.operators

import graft.SparkSpec

/** Naive-Bayes quality classifier: separation, unseen-token handling,
  * prior, and determinism. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val pos = Seq(
    (100L, "the study presents careful analysis of the evidence"),
    (101L, "the results indicate a consistent and careful methodology")
  ).toDF("doc_id", "text")
  private val neg = Seq(
    (200L, "click here buy now cheap cheap deal"),
    (201L, "win win free prize click now")
  ).toDF("doc_id", "text")
  private val cand = Seq(
    (1L, "the analysis presents consistent evidence"),
    (2L, "buy cheap prize now click"),
    (3L, "completely novel unseen vocabulary entirely")
  ).toDF("doc_id", "text")

  test("seed-like candidates separate; unseen tokens fall back to the smoothing weight") {
    val out = QualityClassifier.trainScore(cand, pos, neg).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out(1L)._1 > 0 && out(1L)._2, s"curated-like doc must score positive: $out")
    assert(out(2L)._1 < 0 && !out(2L)._2, s"spam-like doc must score negative: $out")
    // doc 3 is all-unseen: every token takes w0 = ln((nn+v)/(np+v)),
    // so llr = prior + 5*w0 exactly — balanced seeds make prior 0.
    // np = 8+8 pos tokens, nn = 7+6 neg tokens, v = 13+9 distinct
    val np = 16.0; val nn = 13.0; val v = 22.0
    val w0 = math.log(1.0 / (np + v)) - math.log(1.0 / (nn + v))
    val expected = BigDecimal(5 * w0).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    assert(BigDecimal(out(3L)._1).setScale(4, BigDecimal.RoundingMode.HALF_UP) === expected,
      s"all-unseen doc must score prior + n*w0: got ${out(3L)._1}, want $expected")
  }

  test("unbalanced seeds carry a nonzero log prior through the formula exactly") {
    // a third pos doc: np 16→21, v 22→23 ('further' is the only new
    // token), prior ln(2/2)=0 → ln(3/2). The all-unseen doc isolates
    // prior + n*w0 with w0 = ln((nn+v)/(np+v))
    val posBig = pos.unionByName(Seq((102L, "further careful analysis of results"))
      .toDF("doc_id", "text"))
    val got = QualityClassifier.trainScore(cand, posBig, neg).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val expected = BigDecimal(math.log(3.0 / 2) + 5 * math.log(36.0 / 44))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    assert(BigDecimal(got(3L)).setScale(4, BigDecimal.RoundingMode.HALF_UP) === expected,
      s"unseen doc must score ln(3/2) + 5*ln(36/44): got ${got(3L)}, want $expected")
  }

  test("the seed-vocab model broadcasts into the candidate token stream") {
    val plan = QualityClassifier.trainScore(cand, pos, neg)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the dispatched model join must broadcast under the vocab bound:\n$plan")
  }

  test("scores are deterministic across runs and row order") {
    val a = QualityClassifier.trainScore(cand, pos, neg).collect().toSeq
    val b = QualityClassifier.trainScore(cand.orderBy(org.apache.spark.sql.functions.rand(7)),
      pos, neg).collect().toSeq
    assert(a === b)
  }
}
