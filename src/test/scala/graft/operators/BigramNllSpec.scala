package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bigram-LM fluency scoring (q72): hand-computed smoothing arithmetic
  * and the aggregates-only join plan (instances never join). */
class BigramNllSpec extends SparkSpec {
  import spark.implicits._

  // corpus: doc1 "a b a b", doc2 "a b c", doc3 "solo"
  // V = 4 (a, b, c, solo); bigram counts: (a,b)=3, (b,a)=1, (b,c)=1
  // context counts: a=3, b=2
  // nll(1) = -(ln(4/7) + ln(2/6) + ln(4/7)) / 3
  // nll(2) = -(ln(4/7) + ln(2/6)) / 2
  private val docs = Seq(
    (1L, "a b a b"), (2L, "a b c"), (3L, "solo")).toDF("doc_id", "text")

  private def expect(): Seq[(Long, Double, Long)] = {
    val t1 = -(math.log(4.0 / 7) + math.log(2.0 / 6) + math.log(4.0 / 7)) / 3
    val t2 = -(math.log(4.0 / 7) + math.log(2.0 / 6)) / 2
    def r4(x: Double) = math.round(x * 10000) / 10000.0
    Seq((1L, r4(t1), 3L), (2L, r4(t2), 2L))
  }

  test("add-one smoothed NLL matches the hand computation; <2-token docs absent") {
    val got = TextAnalysis.bigramNll(docs)
      .as[(Long, Double, Long)].collect().toSeq.sortBy(_._1)
    assert(got === expect())
  }

  test("stats build without a second aggregation tree: window c1, one shuffle-hash join") {
    // r11 shape: c1 folds into the bigram table as a window over `prev`
    // (a vocab-sized exchange — the broadcast-back alternative re-ran
    // the corpus explode when exchange reuse missed), and instances
    // shuffle exactly once, as the probe side of the stats join
    val plan = TextAnalysis.bigramNll(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"stats join must shuffle-hash:\n$plan")
    assert(plan.contains("Window"), s"c1 must fold in as a window:\n$plan")
  }

  test("word salad scores above fluent text under the corpus's own model") {
    val fluent = "the cat sat on the mat and the dog sat on the rug"
    val salad = "mat the on rug dog sat cat the and on the sat mat dog"
    val corpus = (1L to 20L).map(i => (i, fluent)) :+ (99L, salad)
    val scored = TextAnalysis.bigramNll(corpus.toDF("doc_id", "text"))
      .as[(Long, Double, Long)].collect().map { case (id, nll, _) => id -> nll }.toMap
    assert(scored(99L) > scored(1L),
      s"salad ${scored(99L)} must out-score fluent ${scored(1L)}")
  }
}
