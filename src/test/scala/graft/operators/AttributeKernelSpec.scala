package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The r14 attribute-sheet kernel (q128) and the quality-score kernel
  * (q127): one imperative text pass whose emitted values must be
  * BIT-IDENTICAL to the oracled HOF-chain formulas they replace —
  * asserted here row-for-row over the real sf0.01 documents corpus
  * (500 docs spanning prose/code/table shapes, 5 languages). */
class AttributeKernelSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(s"$sfDirDocs/documents.parquet")

  test("attributeSheet equals the HOF-chain sheet bit-for-bit") {
    val kernel = TextAnalysis.attributeSheet(docs, qualityThreshold = 0.44)
    val hof = docs.select(
        col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).as("n_words"),
        TextAnalysis.meanWordLen(col("text"))
          .cast(DecimalType(14, 4)).cast(DoubleType).as("mean_word_len"),
        TextAnalysis.formatOf(col("text")).as("format"),
        (TextAnalysis.qualityScore(col("text")) >= 0.44).as("quality_keep"),
        HeuristicRules.gopherKeepCol().as("gopher_keep"))
      .orderBy("doc_id")
    assert(kernel.schema.fieldNames.toSeq === hof.schema.fieldNames.toSeq)
    val k = kernel.collect().toSeq
    val h = hof.collect().toSeq
    assert(k.size === 500)
    assert(k === h)
  }

  test("qualityScoreKernel equals qualityScore bit-for-bit") {
    val both = docs.select(
      TextAnalysis.qualityScore(col("text")).as("hof"),
      TextAnalysis.qualityScoreKernel(col("text")).as("kernel"))
    assert(both.filter(!(col("hof") <=> col("kernel"))).count() === 0)
  }

  test("kernels count CODEPOINTS — non-BMP text agrees with the chain (ADVICE r14)") {
    import spark.implicits._
    // supplementary-plane chars are 2 UTF-16 units but 1 codepoint —
    // exactly where the pre-r15 kernels diverged from Spark's length()
    val nb = Seq(
      (1L, "the quick 😀 fox and a 😀😁 dog"),
      (2L, "code 𐀀 { x = 1; }\n  indented 😀 line..."),
      (3L, "😀😁😂"),
      (4L, "mixed é世界 and 🌍 world")
    ).toDF("doc_id", "text")
    val q = nb.select(
      TextAnalysis.qualityScore(col("text")).as("hof"),
      TextAnalysis.qualityScoreKernel(col("text")).as("kernel"))
    assert(q.filter(!(col("hof") <=> col("kernel"))).count() === 0)
    val sheetK = TextAnalysis.attributeSheet(nb, qualityThreshold = 0.44)
    val sheetH = nb.select(
        col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).as("n_words"),
        TextAnalysis.meanWordLen(col("text"))
          .cast(DecimalType(14, 4)).cast(DoubleType).as("mean_word_len"),
        TextAnalysis.formatOf(col("text")).as("format"),
        (TextAnalysis.qualityScore(col("text")) >= 0.44).as("quality_keep"),
        HeuristicRules.gopherKeepCol().as("gopher_keep"))
      .orderBy("doc_id")
    assert(sheetK.collect().toSeq === sheetH.collect().toSeq)
  }

  test("kernels pass nulls through") {
    import spark.implicits._
    val d = Seq((1L, null: String), (2L, "")).toDF("doc_id", "text")
    val r = d.select(
        TextAnalysis.qualityScoreKernel(col("text")).as("q"),
        TextAnalysis.attributeSignalsUdf(col("text")).isNull.as("sig_null"))
      .as[(Option[Double], Boolean)].collect().toSeq
    assert(r === Seq((None, true), (Some(0.3), false)))
  }

  test("single-pass plans: one kernel site in the sheet, zero past the quantile pin") {
    // the sheet runs its kernel exactly once per row (one invocation
    // site in the optimized plan — the PlanAudit structural contract)
    val sheet = TextAnalysis.attributeSheet(docs)
    assert(PlanAudit.scalaUdfSites(sheet) === 1)
    // keepTopQuantile's returned plan reads the PIN: the score kernel
    // already ran at the checkpoint, so the plan has ZERO live kernel
    // sites — the r13 double-text-pass defect is structurally gone
    val gated = Curation.keepTopQuantile(docs,
      TextAnalysis.qualityScoreKernel(org.apache.spark.sql.functions.col("text"))
        .cast(org.apache.spark.sql.types.DecimalType(14, 4)),
      org.apache.spark.sql.functions.col("source"), frac = 0.3)
    assert(PlanAudit.scalaUdfSites(gated) === 0)
    assert(gated.count() > 0)
    Storage.releaseAll(true)
  }

  test("wsTokenCountFast equals wsTokenCount on every corpus row and edge shapes") {
    import spark.implicits._
    val edge = Seq("", " ", "  ", "a", "a b", "a  b ", " a").toDF("text")
    Seq(docs.select(col("text")), edge).foreach { d =>
      val bad = d.select(TextAnalysis.wsTokenCount(col("text")).as("a"),
          TextAnalysis.wsTokenCountFast(col("text")).as("b"))
        .filter(!(col("a") <=> col("b"))).count()
      assert(bad === 0)
    }
  }
}
