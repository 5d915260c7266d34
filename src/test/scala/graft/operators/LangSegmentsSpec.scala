package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-block language segmentation (r15; CCNet's per-paragraph langid
  * — q138's operator layer): majority is decided by identified word
  * MASS, not block count; ties follow q29's fixed priority; 'und'
  * blocks carry no identified mass; a same-language minority block
  * does not flag the page. */
class LangSegmentsSpec extends SparkSpec {
  import spark.implicits._

  private def profile(page: String) =
    Seq(page).toDF("page")
      .withColumn("__per", TextAnalysis.langSegments(col("page")))
      .select(TextAnalysis.langProfileFrom(col("__per")).as("p"))
      .select("p.n_blocks", "p.majority_lang", "p.minority_frac", "p.mixed")
      .as[(Long, String, java.math.BigDecimal, Boolean)].head()

  private val en = "the cat and the dog of a house is to be the end of it"
  private val fr = "le la les et un est le la les et un est"

  test("mass majority: many small foreign blocks outweigh one big block by words, not count") {
    // two en blocks (30 words total) vs one fr block (12): majority is
    // en by MASS even though fr lands mid-page
    val (n, maj, frac, mixed) = profile(s"$en\n\n$fr\n\n$en")
    assert(n === 3L && maj === "en" && mixed)
    // 12 fr words of 42 identified -> round(12/42, 4) = 0.2857
    assert(frac.doubleValue === 0.2857)
  }

  test("single-language page: not mixed, zero minority") {
    val (n, maj, frac, mixed) = profile(s"$en\n\n$en")
    assert(n === 2L && maj === "en" && !mixed && frac.doubleValue === 0.0)
  }

  test("same-language plant does not flag: the rule is language mass, not blocks") {
    val (_, maj, _, mixed) = profile(s"$fr\n\n$fr")
    assert(maj === "fr" && !mixed)
  }

  test("und blocks carry no identified mass; all-und page is und/unmixed") {
    val (_, maj1, frac1, mixed1) = profile(s"$en\n\nzzz qqq 12345")
    assert(maj1 === "en" && !mixed1 && frac1.doubleValue === 0.0)
    val (_, maj2, _, mixed2) = profile("zzz qqq\n\nxxx yyy")
    assert(maj2 === "und" && !mixed2)
  }

  test("kernel == chain bit-for-bit over the q138 corpus and edge pages") {
    val docs = spark.read.parquet(s"$sfDirDocs/documents.parquet")
    val d = col("doc_id")
    val frB = "le la les et un est le la les et un est"
    val deB = "der die und das ein ist der die und das ein ist"
    val page = concat(col("text"),
      when(d % 4 === 0, lit("\n\n" + frB)).otherwise(lit("")),
      when(d % 8 === 0, lit("\n\n" + deB)).otherwise(lit("")))
    def chain(p: org.apache.spark.sql.Column) =
      TextAnalysis.langProfileFrom(TextAnalysis.langSegments(p))
    val bad = docs
      .select(chain(page).as("c"), TextAnalysis.langProfileKernel(page).as("k"))
      .filter(!(col("c") <=> col("k")))
      .count()
    assert(bad === 0L)
    // edges: empty page, blank blocks, multi-lang overlap word 'un'
    // (French AND Spanish stop sets), und-only, trailing separators
    val edges = Seq("", "\n\n", "a\n\n\n\nb", "un un un",
      s"$en\n\n", "  \n\nzzz", "un le\n\nun el", "the\n\nthe\n\nthe")
      .toDF("p")
    val badE = edges
      .select(chain(col("p")).as("c"), TextAnalysis.langProfileKernel(col("p")).as("k"))
      .filter(!(col("c") <=> col("k")))
      .collect()
    assert(badE.isEmpty, badE.mkString("\n"))
  }

  test("tie breaks by the fixed q29 priority (en before de)") {
    val de = "der die und das ein ist der die und das ein ist der"
    // en block with exactly 13 words vs de block with 13 words
    val en13 = "the cat and the dog of a house is to be the end"
    assert(en13.split(" ").length === 13 && de.split(" ").length === 13)
    val (_, maj, _, _) = profile(s"$de\n\n$en13")
    assert(maj === "en")
  }
}
