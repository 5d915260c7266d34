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
}
