package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Markup cleaning (q70): hand-verified behavior on the corner cases
  * the regex chain is designed around. */
class CleanMarkupSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.cleanMarkup(col("t"))).head().getString(0)

  test("script and style blocks vanish wholesale, including '<' in code") {
    assert(clean("""a<script>if (1 < 2) { x("</p>"); }</script>b""") === "a b")
    assert(clean("""a<style type="x">p > span { color: red }</style>b""") === "a b")
    assert(clean("a<SCRIPT>\nmulti\nline\n</SCRIPT>b") === "a b")
  }

  test("tags with attributes strip; entities decode after tag removal") {
    assert(clean("""<p class="d">x &lt;tag&gt; y</p>""") === "x <tag> y")
    assert(clean("a &quot;q&quot; &#39;s&#39; &apos;t&apos; b") === "a \"q\" 's' 't' b")
    assert(clean("x&nbsp;y") === "x y")
  }

  test("&amp; decodes last so literal entity text survives one level") {
    assert(clean("&amp;lt; and &amp;") === "&lt; and &")
  }

  test("whitespace collapses and trims") {
    assert(clean("  a\t\tb\n\nc\r\nd  ") === "a b c d")
  }

  test("plain text is untouched") {
    assert(clean("the quick brown fox") === "the quick brown fox")
  }
}
