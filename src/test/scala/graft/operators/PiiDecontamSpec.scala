package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII redaction + benchmark decontamination. */
class PiiDecontamSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("text").select(TextAnalysis.redactPii(col("text"))).as[String].head()

  test("redactPii replaces emails, phones, and IPv4 literals with typed tokens") {
    val got = redactOne(
      "mail a.user+tag@sub.example.org call +44-20-7946-0958 host 192.168.0.255 done")
    assert(got === "mail <EMAIL> call <PHONE> host <IP> done")
  }

  test("redactPii is idempotent and leaves clean text untouched") {
    val clean = "just ordinary prose with numbers 42 and a trailing dot."
    assert(redactOne(clean) === clean)
    val once = redactOne("x user@example.com +1-555-0100 10.0.0.1")
    assert(redactOne(once) === once)
  }

  test("piiCounts reports per-type hit counts") {
    val df = Seq("a@b.io c@d.io +1-555-0100 10.0.0.1 10.0.0.2 10.0.0.3").toDF("text")
    val row = df.select(TextAnalysis.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === ((2L, 1L, 3L)))
  }

  // ---------------------------------- checksum-validated cards (r13)
  private def luhnOne(s: String): Boolean =
    Seq(s).toDF("c").select(TextAnalysis.luhnValid(col("c"))).as[Boolean].head()
  private def redactCardsOne(s: String): String =
    Seq(s).toDF("text").select(TextAnalysis.redactValidCards(col("text")))
      .as[String].head()

  test("luhnValid accepts the classic valid test number, with or without separators") {
    assert(luhnOne("4111111111111111"))
    assert(luhnOne("4111 1111 1111 1111"))
    assert(luhnOne("4111-1111-1111-1111"))
  }

  test("luhnValid rejects a check-digit-off-by-one lookalike and short digit runs") {
    assert(!luhnOne("4111111111111112"))
    assert(!luhnOne("4111 1111 1111 1112"))
    assert(!luhnOne("411111111111")) // 12 digits: under the length floor
  }

  test("luhnCheckDigit synthesizes the digit that makes body||digit valid") {
    val got = Seq("411111111111111").toDF("b")
      .select(TextAnalysis.luhnCheckDigit(col("b"))).as[Int].head()
    assert(got === 1) // 4111...111 + '1' is the known-valid card above
    assert(luhnOne("411111111111111" + got.toString))
  }

  test("redactValidCards redacts checksum-valid candidates ONLY") {
    val got = redactCardsOne(
      "pay 4111 1111 1111 1111 not 4111 1111 1111 1112 ref 12345 end")
    assert(got === "pay <CARD> not 4111 1111 1111 1112 ref 12345 end")
    val clean = "order 1234 total 99 at 10.0.0.1"
    assert(redactCardsOne(clean) === clean)
  }

  test("contaminationScores counts distinct shared shingles and keeps zero-score docs") {
    // benchmark doc: trigrams of "the quick brown fox jumps" =
    //   {the quick brown, quick brown fox, brown fox jumps}
    val bench = Seq((1000L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),          // all 3 shingles shared
      (2L, "a b the quick brown c d"),            // exactly 1 shared
      (3L, "completely different words here now") // 0 shared — must still appear
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationScores(corpus, bench, n = 3, minShared = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got === Seq((1L, 3L, true), (2L, 1L, false), (3L, 0L, false)))
  }

  test("contaminationScores with an empty benchmark scores every doc zero") {
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val corpus = Seq((1L, "some words here"), (2L, "other words there")).toDF("doc_id", "text")
    val got = Dedup.contaminationScores(corpus, bench)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got === Seq((1L, 0L, false), (2L, 0L, false)))
  }

  test("contamination plan broadcasts the benchmark side") {
    val bench = Seq((1000L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq((1L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val plan = Dedup.contaminationScores(corpus, bench)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark shingles must broadcast (corpus side never shuffles into the join):\n$plan")
  }

  test("bloom tier: superset of the exact scores, exact on the planted fixture") {
    val bench = Seq((1000L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "a b the quick brown c d"),
      (3L, "completely different words here now")
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationScoresBloom(corpus, bench, n = 3, minShared = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    // at this scale (3 benchmark shingles, fpp 1%) false positives are
    // ~never hit, so the bloom tier reproduces the exact scores; the
    // superset guarantee is asserted in general at q65's oracle contract
    assert(got === Seq((1L, 3L, true), (2L, 1L, false), (3L, 0L, false)))
  }

  test("bloom tier plan has NO join: corpus streams through a membership filter") {
    val bench = Seq((1000L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq((1L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val hits = Dedup.contaminationScoresBloom(corpus, bench)
    val plan = hits.queryExecution.executedPlan.toString
    // the only join is the final left join re-attaching zero-score docs
    // (tiny: doc_id against doc_id); the contamination probe itself is
    // a partition-local filter — no shingle-keyed join anywhere
    assert(!plan.contains("SortMergeJoin"),
      s"bloom probe must not shuffle-join on shingles:\n$plan")
  }
}
