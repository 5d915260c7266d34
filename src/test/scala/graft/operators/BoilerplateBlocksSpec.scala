package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** jusText-lite block-level boilerplate strip (q107). */
class BoilerplateBlocksSpec extends SparkSpec {
  import spark.implicits._

  private def stripOne(s: String): String =
    Seq(s).toDF("text")
      .select(TextAnalysis.stripBoilerplateBlocks(col("text"))).as[String].head()

  private val prose =
    "this is the story of a table and the reason is that the data is a joy to scan"

  test("nav bar falls to the stopword rule despite being long enough") {
    // 11 tokens (six words + five pipes) but zero function words
    val nav = "home | products | pricing | docs | contact | login"
    assert(stripOne(s"$nav\n\n$prose") === prose)
  }

  test("short footer falls to the length rule even with a stopword") {
    val footer = "the copyright page" // has 'the' but only 3 tokens
    assert(stripOne(s"$prose\n\n$footer") === prose)
  }

  test("content blocks survive in order with blank-line structure intact") {
    val p2 = "and then the table is sorted by a key that is part of the scan"
    val got = stripOne(s"home | about | contact | help | login | more\n\n$prose\n\n$p2")
    assert(got === s"$prose\n\n$p2")
  }

  test("a long noun-heavy block without function words is boilerplate") {
    val nouns = "widget gadget sprocket flange bracket gasket valve piston rotor stator coil"
    assert(stripOne(s"$nouns\n\n$prose") === prose)
  }

  test("an all-boilerplate page strips to empty") {
    assert(stripOne("home | about | contact | help | login | more\n\ncopyright 2024 corp") === "")
  }

  test("strip is a zero-shuffle row-local projection") {
    val df = Seq((1L, s"$prose\n\nx y")).toDF("doc_id", "text")
      .select(TextAnalysis.stripBoilerplateBlocks(col("text")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
