package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The URL-canonicalization kernel (r14) must be BIT-EQUAL to the
  * Column chain it replaces — the chain is the oracle-mirrored
  * reference semantics, the kernel the execution path. Asserted over
  * the q110 + q129 synthetic URL generators on the real corpus and an
  * adversarial edge list (Java-regex quirks included: '#.*' stops at a
  * newline, '$' matches before a final line terminator). */
class UrlKernelSpec extends SparkSpec {
  import spark.implicits._

  private def assertEqualOn(urls: org.apache.spark.sql.DataFrame): Unit =
    Seq(false, true).foreach { sp =>
      Seq(false, true).foreach { np =>
        val bad = urls
          .select(col("u"),
            Urls.canonicalizeUrl(col("u"), sp, np).as("chain"),
            Urls.canonicalizeUrlKernel(col("u"), sp, np).as("kernel"))
          .filter(!(col("chain") <=> col("kernel")))
          .collect()
        assert(bad.isEmpty,
          s"sortParams=$sp normalizePercent=$np mismatches:\n${bad.take(5).mkString("\n")}")
      }
    }

  test("kernel == chain on the q110/q129 synthetic corpus URLs") {
    val docs = spark.read.parquet(s"$sfDirDocs/documents.parquet")
    val d = col("doc_id")
    val q110url = concat(
      lit("HTTP://"),
      when(d % 2 === 0, lit("WWW.")).otherwise(lit("")),
      col("source"), lit(".Example.COM"),
      when(d % 5 === 0, lit(":80")).otherwise(lit("")),
      lit("/Articles/"), (d % 40).cast("string"),
      when(d % 3 === 0, lit("/")).otherwise(lit("")),
      when(d % 4 === 0, lit("?utm_source=feed&utm_campaign=x&page=2"))
        .when(d % 4 === 1, lit("?page=2&gclid=abc123"))
        .otherwise(lit("")),
      when(d % 7 === 0, lit("#section-2")).otherwise(lit("")))
    assertEqualOn(docs.select(q110url.as("u")))
    val g = d % 25
    val q129url = concat(lit("http://"), col("source"),
      lit(".example.com/items/"), g.cast("string"),
      when(d % 2 === 0,
        concat(lit("?a="), (g % 3).cast("string"), lit("&b="), (g % 2).cast("string")))
        .otherwise(
          concat(lit("?b="), (g % 2).cast("string"), lit("&a="), (g % 3).cast("string"))),
      when(d % 4 === 0, lit("&utm_x=1")).otherwise(lit("")))
    assertEqualOn(docs.select(q129url.as("u")))
  }

  test("kernel == chain on adversarial edges") {
    val edges = Seq(
      "", " ", "  x  ", "not a url", "/Rel/Path/?utm_x=1",
      "HTTP://WWW.A.com:80/p/", "https://A.com:443/p#frag",
      "https://a.com:8443/p/", "hTtP://WwW.B.OrG/X?b=2&a=1",
      "http://a.com/p?utm_source=x&page=2", "http://a.com/p?page=2&gclid=z",
      "http://a.com/p?utm_a=1&utm_b=2", "http://a.com/p?refx=1", // not 'ref'
      "http://a.com/p?ref=1", "http://a.com/p?utm=1", // 'utm' without '_'
      "http://a.com/p??a=1", "http://a.com/p?&&a=1&&", "http://a.com/p?&",
      "http://a.com/p?", "http://a.com/p?a", "http://a.com/p?a=",
      "?b=2&a=1", "&b=2&a=1", "a=1&b=2", "://nohost", "x://h/p",
      "9http://a.com/p", "+scheme://h/p", // scheme must start with a letter
      "http://a.com", "http://a.com/", "http://a.com//",
      "http://a.com/p#f1#f2", "http://a.com/p#f\nmore?utm_x=1&k=2",
      "http://a.com/p?a=1\n", "http://a.com/p?&\n", "http://a.com/p/\n",
      "http://a.com/p?a=1\r\n", "http://a.com/p#",
      "http://a.com/p?A=1&a=0", // case-sensitive param sort
      "http://www.only-www.com", "http://wwwx.a.com/p",
      "HTTPS://B.com:443", "http://a.com:8080:80/p",
      "http://a.com/p?z=9&y=8&x=7&utm_x=0&w=6",
      // ADVICE r14: '#.*' stops at EVERY Java line terminator, not \n
      "http://a.com/p#f\rmore", "http://a.com/p#f\u0085more",
      "http://a.com/p#f\u2028more?a=1", "http://a.com/p#f\u2029more",
      "http://a.com/p#a\r\nb#c", "http://a.com/p?a=1\u0085",
      // ADVICE r14: non-BMP param sort — UTF-16 order puts surrogates
      // (U+10000+) BEFORE U+E000..FFFF; codepoint order is the chain's
      "http://a.com/p?😀=1&�=2", // 😀 (supp.) vs U+FFFD
      "http://a.com/p?k=😀&k=�&b=1",
      "http://a.com/p?\uE000=1&𐀀=2",
      // percent tier edges: unreserved decode, hex uppercase, reserved
      // kept, malformed kept, '%' at end, double-%, case variants
      "http://a.com/%7Euser/p", "http://a.com/%7euser?x=%41%61",
      "http://a.com/a%2fb?q=%2F", "http://a.com/p?a=%zz&b=%4",
      "http://a.com/p%", "http://a.com/p%%41", "http://a.com/%",
      "http://%77%77%77.a.com/p", "HTTP://a.com/%54%65%73%74",
      "http://a.com/p?%75tm_x=1&page=2", // decodes to utm_x -> stripped
      "http://a.com/p?a=%3d1%26b", "http://a.com/%2e%2E/p",
      "http://a.com/p?utm_%78=1") // %78 in the NAME decodes to x
    assertEqualOn(edges.toDF("u"))
    // null passes through both forms
    val r = Seq(null.asInstanceOf[String]).toDF("u")
      .select(Urls.canonicalizeUrl(col("u")).isNull.as("a"),
        Urls.canonicalizeUrlKernel(col("u")).isNull.as("b"))
      .as[(Boolean, Boolean)].head()
    assert(r === ((true, true)))
  }
}
