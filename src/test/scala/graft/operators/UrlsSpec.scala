package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup (q110). */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("scheme/host lowercase, path case preserved") {
    assert(canon("HTTP://Example.COM/Articles/One") ===
      Seq("http://example.com/Articles/One"))
  }

  test("www, default ports, fragment, trailing slash all fall") {
    assert(canon(
      "http://www.a.com:80/p/",
      "https://A.com:443/p#frag",
      "https://a.com:8443/p/") === Seq(
      "http://a.com/p",
      "https://a.com/p",
      "https://a.com:8443/p")) // non-default port survives
  }

  test("tracking params stripped with separator repair, order preserved") {
    assert(canon(
      "http://a.com/p?utm_source=x&page=2",
      "http://a.com/p?page=2&gclid=z123",
      "http://a.com/p?utm_a=1&utm_b=2",
      "http://a.com/p?b=2&a=1") === Seq(
      "http://a.com/p?page=2",
      "http://a.com/p?page=2",
      "http://a.com/p",
      "http://a.com/p?b=2&a=1")) // param ORDER is preserved (documented)
  }

  test("relative / schemeless urls pass through steps 5-6 only") {
    assert(canon("/Path/To/Page/?utm_x=1", "not a url") ===
      Seq("/Path/To/Page", "not a url"))
  }

  private def canonS(urls: String*): Seq[String] =
    urls.toDF("u")
      .select(Urls.canonicalizeUrl(col("u"), sortParams = true).as("c"))
      .as[String].collect().toSeq

  test("sortParams tier: permuted param orders collapse; singletons unchanged") {
    assert(canonS(
      "http://a.com/p?b=2&a=1",
      "http://a.com/p?a=1&b=2",
      "http://a.com/p?b=2&utm_x=9&a=1",
      "http://a.com/p?page=2",
      "http://a.com/p?utm_a=1",
      "http://a.com/p/") === Seq(
      "http://a.com/p?a=1&b=2",
      "http://a.com/p?a=1&b=2",
      "http://a.com/p?a=1&b=2", // tracking strip composes with the sort
      "http://a.com/p?page=2",
      "http://a.com/p",
      "http://a.com/p"))
  }

  test("dedupByUrl with sortParams collapses permuted-param variants") {
    val docs = Seq(
      (1L, "aa", "http://a.com/p?x=1&y=2"),
      (2L, "bbb", "http://a.com/p?y=2&x=1"),
      (3L, "c", "http://a.com/p?x=1")).toDF("doc_id", "text", "url")
    val got = Urls.dedupByUrl(docs, col("url"), col("doc_id"), col("text"),
        sortParams = true)
      .orderBy("canonical_url")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("http://a.com/p?x=1", 1L, 3L, 1L),
      ("http://a.com/p?x=1&y=2", 2L, 2L, 3L)))
  }

  test("dedupByUrl keeps the longest text, ties to lowest id, counts variants") {
    val docs = Seq(
      (1L, "short", "HTTP://WWW.A.com/p?utm_x=1"),
      (2L, "a longer text", "http://a.com:80/p/"),
      (3L, "a longer text", "http://a.com/p#frag"),
      (4L, "other", "http://b.com/q")).toDF("doc_id", "text", "url")
    val got = Urls.dedupByUrl(docs, col("url"), col("doc_id"), col("text"))
      .orderBy("canonical_url")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("http://a.com/p", 3L, 2L, 13L), // 2 and 3 tie on length -> lowest id
      ("http://b.com/q", 1L, 4L, 5L)))
  }

  test("canonicalization is a pure projection: no shuffle in the plan") {
    val plan = Seq("http://a.com/p").toDF("u")
      .select(Urls.canonicalizeUrl(col("u")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
