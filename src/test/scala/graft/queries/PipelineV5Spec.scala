package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q123: the composed r13-late pipeline (blocklist → badword gate →
  * learned langid gate → temperature mix) — planted per-stage victims
  * prove each gate drops exactly its target, and the manifest is
  * monotone on the real corpus. */
class PipelineV5Spec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{Curation, Packing, QualityClassifier, TextAnalysis => TA}

  private def enProse(i: Int): String =
    s"doc number $i starts here and the quick brown fox jumps over the " +
      "lazy dog while a tall green tree grows by the quiet river bank"

  private def deProse(i: Int): String =
    s"dokument nummer $i beginnt hier und der schnelle braune fuchs springt " +
      "ueber den faulen hund waehrend ein hoher gruener baum am stillen ufer waechst"

  // labeled seeds for the langid gate — disjoint vocabularies
  private lazy val seeds =
    ((0 until 20).map(i => (1000L + i, enProse(i), "en")) ++
      (0 until 20).map(i => (2000L + i, deProse(i), "de")))
      .toDF("doc_id", "text", "lang")

  // candidates: 10 clean en survivors + one victim per stage
  private lazy val fixture = {
    val rows =
      (0 until 10).map(i => (i.toLong, "good", enProse(i))) ++ Seq(
        (100L, "blocked", enProse(100)), // pristine text, falls at stage 1
        (101L, "good", enProse(101) + " grawlix"), // falls at the word gate
        (102L, "good", deProse(102))) // falls at the langid gate
    rows.toDF("doc_id", "source", "text")
  }

  test("each stage drops exactly its planted victim; the langid gate is learned") {
    val bl = Seq("blocked").toDF("source")
    val s1 = Curation.listGate(fixture, bl, "source")
    assert(s1.count() === 12L && !s1.select("doc_id").as[Long].collect().contains(100L),
      "the blocked-domain doc falls before any text gate")
    val s2 = Curation.badwordGate(s1, Seq("grawlix"))
    assert(s2.count() === 11L && !s2.select("doc_id").as[Long].collect().contains(101L),
      "the badword doc falls at the word gate")
    val keep = QualityClassifier.trainScoreMulti(s2, seeds, col("lang"))
      .filter(col("pred") === "en").select("doc_id")
    val s3 = s2.join(keep, Seq("doc_id"), "left_semi")
    assert(s3.count() === 10L && !s3.select("doc_id").as[Long].collect().contains(102L),
      "the German doc falls at the LEARNED langid gate")
    val sel = Packing.temperatureMix(s3, totalTokens = 100L, alpha = 0.5,
      sourceCol = col("source"), tokenCol = TA.wsTokenCount(col("text")),
      key = col("doc_id"))
    val n = sel.count()
    assert(n > 0L && n < 10L, s"the tight budget bites: $n of 10 selected")
  }

  test("the composed query runs on the real corpus with a monotone manifest") {
    val out = PipelineQueries.q123PipelineV5(spark, sfDirDocs)
      .as[(String, Long)].collect().toMap
    assert(out.keySet === Set("0_input", "1_blocklist", "2_badword",
      "3_langid", "4_mix"))
    assert(out("0_input") >= out("1_blocklist") &&
      out("1_blocklist") >= out("2_badword") &&
      out("2_badword") >= out("3_langid") && out("3_langid") >= out("4_mix"))
    // every stage bites on the real corpus (the oracle's guarantee too)
    assert(out("0_input") > out("1_blocklist") &&
      out("1_blocklist") > out("2_badword") &&
      out("2_badword") > out("3_langid") && out("4_mix") > 0L)
  }
}
