package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q105: the composed r13 pipeline (blocklist → line corrections →
  * prose routing → normalize → Gopher → temperature mix) — planted
  * per-stage victims prove each gate drops exactly its target, the
  * line tier drops LINES not documents, and the manifest is monotone. */
class PipelineV4Spec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{Curation, Dedup, HeuristicRules, Packing, TextAnalysis => TA}

  private val banner = "HOME | ABOUT | CONTACT"

  private def prose(i: Int): String =
    (s"doc number $i starts here and " +
      "the quick brown fox jumps over the lazy dog while a tall green tree " +
      "grows by the quiet river bank and the old sailor tells a long story " +
      "about distant winter storms near rocky shores under heavy summer rain " +
      "as the morning light is bright and the day is long and calm for all of them")

  // 40 prose pages, each wrapped with the SAME banner (line victim);
  // one doc from a blocked domain (stage-1 victim; pristine text);
  // one code page (routing victim); one short doc (Gopher victim)
  private lazy val fixture = {
    val rows =
      (0 until 40).map(i => (i.toLong, s"s${i % 2}", s"$banner\n${prose(i)}")) ++
        Seq(
          (100L, "spam.example", s"$banner\n${prose(100)}"),
          (101L, "s0", s"$banner\nif (x) {\n  y[i] = f(x);\n}\nwhile (i < n) {\n  s = s + a[i];\n}"),
          (102L, "s1", s"$banner\ntoo short to pass the gopher battery"))
    rows.toDF("doc_id", "source", "text")
  }

  test("each stage drops exactly its planted victim; the line tier drops no documents") {
    val bl = Seq("spam.example").toDF("domain")
    val listed = Curation.listGate(fixture, bl, "source")
    assert(listed.count() === 42L, "the blocked domain falls at stage 1")

    val lineClean = Dedup.dropFrequentLines(listed, minDf = 10)
    assert(lineClean.count() === 42L, "the line tier deletes lines, never documents")
    assert(lineClean.filter(col("text").contains(banner)).count() === 0L,
      "the shared banner line is gone from every page")
    assert(lineClean.filter(col("doc_id") === 0L).select("text").head().getString(0)
      === prose(0), "prose bodies survive byte-exact once the banner falls")

    val p = lineClean.filter(TA.formatOf(col("text")) === "prose")
    assert(p.count() === 41L, "the code page is routed out AFTER its banner fell")
    val g = HeuristicRules.gopherFilter(
      p.withColumn("text", TA.normalizeText(col("text"))))
    assert(g.count() === 40L, "the short doc falls to the word-count rule")
    val m = Packing.temperatureMix(g, 2000L, 0.5,
      col("source"), TA.wsTokenCount(col("text")), col("doc_id"))
    val kept = m.count()
    assert(kept > 0L && kept < 40L, s"the budget bites: $kept")
  }

  test("banner order matters: unstripped, the banner's pipes poison the router") {
    // the same code page WITHOUT line corrections first: banner + code
    // page still routes code (semi-colon endings), but a pipe-only
    // two-line page flips verdict depending on whether the banner fell
    val page = Seq((1L, s"$banner\n$banner\n| a | 1 |\n| b | 2 |"))
      .toDF("doc_id", "text")
    val raw = TA.detectFormat(page).select("format").head().getString(0)
    assert(raw === "table", "pipes dominate the undeduped page")
  }

  test("the composed query runs on the real corpus with a monotone manifest") {
    val out = PipelineQueries.q105PipelineV4(spark, sfDirDocs)
      .as[(String, Long)].collect().toMap
    assert(out.keySet === Set("0_input", "1_blocklist", "2_linededup",
      "3_prose", "4_gopher", "5_mix"))
    assert(out("0_input") > out("1_blocklist"), "the blocklist bites on the corpus")
    assert(out("1_blocklist") === out("2_linededup"), "no documents lost to the line tier")
    assert(out("2_linededup") > out("3_prose"), "structured pages are routed out")
    assert(out("3_prose") > out("4_gopher") && out("4_gopher") >= out("5_mix"))
    assert(out("5_mix") > 0L)
  }
}
