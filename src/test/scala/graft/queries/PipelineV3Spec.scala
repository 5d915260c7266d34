package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q100: the composed r12 pipeline (normalize → prose routing → Gopher
  * → temperature mix) — planted per-stage victims prove each gate
  * drops exactly its target, and the manifest is monotone. */
class PipelineV3Spec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{HeuristicRules, Packing, TextAnalysis => TA}

  // 60 long prose docs across 2 sources + one table doc (stage-1
  // victim) + one too-short doc (stage-2 victim). Prose bodies are
  // long enough to pass every Gopher rule.
  private def prose(i: Int): String =
    (s"doc number $i starts here and " +
      "the quick brown fox jumps over the lazy dog while a tall green tree " +
      "grows by the quiet river bank and the old sailor tells a long story " +
      "about distant winter storms near rocky shores under heavy summer rain " +
      "as the morning light is bright and the day is long and calm for all of them")

  private lazy val fixture = {
    val rows =
      (0 until 60).map(i => (i.toLong, s"s${i % 2}", prose(i))) ++
        Seq((100L, "s0", "| a | b |\n| 1 | 2 |\n| 3 | 4 |"), // table -> routed out
          (101L, "s1", "too short to pass the gopher battery")) // word-count rule
    rows.toDF("doc_id", "source", "text")
  }

  private def stages(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
    val normed = df.withColumn("text", TA.normalizeText(col("text")))
    val p = normed.filter(TA.formatOf(col("text")) === "prose")
    val g = HeuristicRules.gopherFilter(p)
    val m = Packing.temperatureMix(g, 2000L, 0.5,
      col("source"), TA.wsTokenCount(col("text")), col("doc_id"))
    Map("0_input" -> df.count(), "1_prose" -> p.count(),
      "2_gopher" -> g.count(), "3_mix" -> m.count())
  }

  test("each stage drops exactly its planted victim; manifest monotone") {
    val s = stages(fixture)
    assert(s("0_input") === 62L)
    assert(s("1_prose") === 61L, "the table doc is routed out")
    assert(s("2_gopher") === 60L, "the short doc falls to the word-count rule")
    assert(s("3_mix") < 60L && s("3_mix") > 0L, s"the budget bites: $s")
    assert(s("0_input") >= s("1_prose") && s("1_prose") >= s("2_gopher") &&
      s("2_gopher") >= s("3_mix"))
  }

  test("the composed query runs on the real corpus with a monotone manifest") {
    val out = PipelineQueries.q100PipelineV3(spark, sfDirDocs)
      .as[(String, Long)].collect().toMap
    assert(out.keySet === Set("0_input", "1_prose", "2_gopher", "3_mix"))
    assert(out("0_input") >= out("1_prose") &&
      out("1_prose") >= out("2_gopher") && out("2_gopher") >= out("3_mix"))
    assert(out("3_mix") > 0L)
  }
}
