package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Repetition-based quality signals (q62): hand-computed fixtures plus
  * the no-join plan contract (carry columns ride the aggregation). */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionSignals: hand-computed dup-word and top-bigram fractions") {
    val docs = Seq(
      (1L, "a a a b", "s1"), // 4 words, 2 distinct -> dwf 0.5; bigrams [a a, a a, a b] -> tbf 2/3
      (2L, "x", "s1"),       // single word: no bigrams -> tbf 0; dwf 0
      (3L, "p q", "s2"),     // one bigram -> tbf 1.0
      (4L, "go go go go", "s2") // dwf 0.75; bigrams all "go go" -> tbf 1.0
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.repetitionSignals(docs, carry = Seq("source"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("source"),
          r.getAs[java.math.BigDecimal]("dup_word_frac").doubleValue(),
          r.getAs[java.math.BigDecimal]("top_bigram_frac").doubleValue())))
      .toMap
    assert(got(1L) === (("s1", 0.5, 0.6667)))
    assert(got(2L) === (("s1", 0.0, 0.0)))
    assert(got(3L) === (("s2", 0.0, 1.0)))
    assert(got(4L) === (("s2", 0.75, 1.0)))
  }

  test("repetitionSignals: no corpus-sized join — metadata rides the aggregation") {
    val docs = Seq((1L, "a b c", "s1")).toDF("doc_id", "text", "source")
    val plan = TextAnalysis.repetitionSignals(docs, carry = Seq("source"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"signals must not join metadata back:\n$plan")
  }

  test("unigramSurprisal: hand-computed scores against the corpus distribution") {
    // vocab: a:2, b:1, c:1; N=4
    // doc 1 = [a a b]: mean(-ln(2/4), -ln(2/4), -ln(1/4)) = 0.9242
    // doc 2 = [c]:     -ln(1/4)                           = 1.3863
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprisal(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 0.9242, 3L), (2L, 1.3863, 1L)))
  }

  test("unigramSurprisal: hot/tail split is a pure plan choice (scores identical)") {
    val docs = Seq(
      (1L, "the the the the rare"), (2L, "the of of words"), (3L, "rare of the")
    ).toDF("doc_id", "text")
    val all = TextAnalysis.unigramSurprisal(docs, hotVocab = 1024).collect().toSeq
    val split = TextAnalysis.unigramSurprisal(docs, hotVocab = 1).collect().toSeq
    assert(all === split, "forcing most tokens onto the shuffle tail must not change scores")
    // the forced split really routes the tail through a shuffle hash join
    val plan = TextAnalysis.unigramSurprisal(docs, hotVocab = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"tail must shuffle-hash join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"hot head must broadcast:\n$plan")
  }
}
