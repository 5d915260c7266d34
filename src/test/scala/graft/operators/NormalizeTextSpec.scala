package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unicode text normalization (q96): the pre-dedup canonicalizer.
  * Every mapping hand-checked, idempotence, newline survival, and the
  * pure-projection plan shape. */
class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(Tuple1(s)).toDF("text")
      .select(TextAnalysis.normalizeText(col("text")).as("n"))
      .head().getString(0)

  test("quotes, dashes, spaces, zero-widths, ellipsis, controls") {
    // curly quotes -> ASCII
    assert(norm("\u2018a\u2019 \u201Cb\u201D \u201Ec\u201B \u00ABd\u00BB") ===
      "'a' \"b\" \"c' \"d\"")
    // dashes and minus -> '-'
    assert(norm("a \u2013 b \u2014 c \u2212 d") === "a - b - c - d")
    // unicode spaces -> ' ' (NBSP, figure, narrow, ideographic)
    assert(norm("a\u00A0b\u2007c\u202Fd\u3000e") === "a b c d e")
    // zero-widths, BOM, soft hyphen deleted
    assert(norm("a\u200Bb\u200Cc\u200Dd\uFEFFe\u00ADf") === "abcdef")
    // ellipsis expands
    assert(norm("wait\u2026 what") === "wait... what")
    // controls stripped, CRLF -> LF; newline survives, tab collapses
    assert(norm("ab\r\nc\td\u0007e") === "ab\nc de")
  }

  test("idempotent, and already-clean ASCII is untouched") {
    val s = "plain ascii text, with punctuation! and \"quotes\" - fine."
    assert(norm(s) === s)
    val messy = "\u201CA\u00A0b\u2018c\u2019 \u2026 x\u200By"
    assert(norm(norm(messy)) === norm(messy))
  }

  test("normalized variants collapse to one exact-dedup key") {
    // the reason the stage exists: a curly-quote variant must hash equal
    val a = "he said \"stop\" - now..."
    val b = "he said \u201Cstop\u201D \u2013 now\u2026"
    assert(norm(a) === norm(b))
  }

  test("pure projection: no shuffle, no UDF") {
    val df = Seq(Tuple1("x")).toDF("text")
      .select(TextAnalysis.normalizeText(col("text")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"normalize must not shuffle:\n$plan")
    assert(PlanAudit.scalaUdfSites(df) === 0, "normalize must stay codegen'd")
  }
}
