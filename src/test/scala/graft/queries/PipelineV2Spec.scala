package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q94 composed pipeline: every stage bites exactly once on a planted
  * corpus, and the manifest is monotone. */
class PipelineV2Spec extends SparkSpec {
  import spark.implicits._

  // 60-word body passes every Gopher rule (stopwords, mean word len,
  // alphabetic); the fixture plants one failure per stage
  private def body(tag: String): String =
    (s"the story of $tag is a long and careful one about the river and " * 5) +
      "it ends well here"

  test("each stage drops exactly its planted victim; the manifest is monotone") {
    val pos = Seq((900L, "the study presents careful analysis of the evidence about the river"))
      .toDF("doc_id", "text").withColumn("lang", lit("en")).withColumn("source", lit("src0"))
    val neg = Seq((901L, "click here buy now cheap cheap prize deal offer bonus"))
      .toDF("doc_id", "text").withColumn("lang", lit("en")).withColumn("source", lit("src1"))
    val cand = Seq(
      (1L, body("one"), "en"),                   // survives everything
      (2L, "too short", "en"),                   // Gopher: n_words < 50
      // classifier victim: a Gopher-passing body of model-UNSEEN words
      // (each takes the slightly-negative w0) plus a heavy spam tail —
      // no positive-seed vocabulary to rescue it
      (3L, "the and " + ("zumba quark velvet nimbus copper " * 10) +
        "click buy now cheap cheap prize deal offer bonus now buy cheap", "en"),
      (4L, body("one"), "en"),                   // exact dup of doc 1
      (5L, body("five"), "de")                   // survives, second stratum
    ).toDF("doc_id", "text", "lang").withColumn("source", lit("src2"))
    val docs = cand.unionByName(pos).unionByName(neg)
      .select("doc_id", "text", "lang", "source")

    val dir = java.nio.file.Files.createTempDirectory("q94").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = PipelineQueries.q94PipelineV2(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("0_input") === 5L, s"$out")
    assert(out("1_gopher") === 4L, s"doc 2 falls to the rule battery: $out")
    assert(out("2_classifier") === 3L, s"doc 3 falls to the learned gate: $out")
    assert(out("3_exact") === 2L, s"doc 4 collapses into doc 1: $out")
    assert(out("4_sample") === 2L, s"both strata under k keep full membership: $out")
    val order = Seq("1_gopher", "2_classifier", "3_exact", "4_sample").map(out)
    assert(order.zip(order.drop(1)).forall { case (a, b) => a >= b })
  }
}
