package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural format detection (q98): code vs table vs prose routing
  * on hand-built fixtures, threshold boundaries, and the
  * pure-projection plan shape. */
class FormatDetectSpec extends SparkSpec {
  import spark.implicits._

  private def verdict(text: String): String =
    TextAnalysis.detectFormat(Seq((1L, text)).toDF("doc_id", "text"))
      .head().getAs[String]("format")

  test("code, table, and prose fixtures route to their formats") {
    assert(verdict("if (x) {\n  y[i] = f(x);\n}\nreturn z;") === "code")
    assert(verdict("| name | qty |\n| a | 1 |\n| b | 2 |") === "table")
    assert(verdict("the quick brown fox jumps over the lazy dog " +
      "and keeps running through the quiet field") === "prose")
  }

  test("signals are exact on a hand-tiled fixture") {
    // 3 lines: one indented, one ending ';', one with two pipes
    val t = "ab{}\n  c=d;\n|x|y"
    val r = TextAnalysis.detectFormat(Seq((1L, t)).toDF("doc_id", "text")).head()
    // symbols: { } = ; -> 4 of 16 chars
    assert(r.getAs[Double]("symbol_density") === 0.25)
    assert(r.getAs[Double]("indent_frac") === 0.3333)
    assert(r.getAs[Double]("pipe_frac") === 0.3333)
    // "ab{}" ends '}' and "  c=d;" ends ';' -> 2 of 3 lines
    assert(r.getAs[Double]("semi_end_frac") === 0.6667)
  }

  test("symbol-heavy but unstructured text stays prose; structure flips it to code") {
    // dense symbols, no indent, no ;{} line endings -> prose
    assert(verdict("a = b < c > d (e) [f] = g < h > i (j) [k] = l") === "prose")
    // same density with ;-terminated lines -> code
    assert(verdict("a = b;\nc = d;\ne = f;") === "code")
  }

  test("pure projection: no shuffle, no UDF") {
    val df = TextAnalysis.detectFormat(Seq((1L, "x")).toDF("doc_id", "text"))
    val plan = df.queryExecution.executedPlan.toString
    assert(PlanAudit.scalaUdfSites(df) === 0)
    // only the presentation sort may exchange; drop it and demand none
    val noSort = TextAnalysis.formatSignals(col("text"))
      .foldLeft(Seq((1L, "x")).toDF("doc_id", "text")) {
        case (d, (n, c)) => d.withColumn(n, c)
      }
    assert(!noSort.queryExecution.executedPlan.toString.contains("Exchange"),
      "signals must ride the scan")
  }
}
