package graft.operators

import graft.SparkSpec

/** Domain-level curation stats (q85): dup-rate arithmetic, the
  * deterministic language mode, and threshold verdicts. */
class DomainStatsSpec extends SparkSpec {
  import spark.implicits._

  // srcA: 4 docs, 2 identical -> dup_rate 0.25; langs en,en,de,de ->
  // tie broken to 'de' (count desc, lang ASC). srcB: 2 distinct docs,
  // dup_rate 0, but fails the minDocs floor.
  private val docs = Seq(
    (1L, "same text here", "en", "srcA", 14L),
    (2L, "same text here", "en", "srcA", 14L),
    (3L, "unique one", "de", "srcA", 10L),
    (4L, "unique two", "de", "srcA", 10L),
    (5L, "other corpus", "fr", "srcB", 12L),
    (6L, "other text", "fr", "srcB", 10L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("dup rate, token volume, and the tie-broken language mode") {
    val rows = Curation.domainStats(docs, minDocs = 3L).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = rows("srcA")
    assert(a.getLong(1) === 4L && a.getLong(2) === 3L)
    assert(a.getDouble(3) === 0.25, s"dup_rate: $a")
    assert(a.getString(6) === "de", s"2-2 lang tie must break to 'de': $a")
    assert(a.getLong(5) === 10L, s"3+3+2+2 whitespace tokens: $a")
    assert(a.getBoolean(7), s"srcA passes both thresholds: $a")
    val b = rows("srcB")
    assert(b.getDouble(3) === 0.0 && !b.getBoolean(7),
      s"srcB is dup-clean but under the doc floor: $b")
  }

  test("a duplicate-dominated source is dropped by the rate threshold") {
    val spam = Seq.tabulate(10)(i => (100L + i, "copy pasta", "en", "srcC", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Curation.domainStats(docs.unionByName(spam), minDocs = 3L)
      .collect().map(r => r.getString(0) -> r.getBoolean(7)).toMap
    assert(!r("srcC"), s"srcC dup_rate 0.9 must fail: $r")
    assert(r("srcA"), s"srcA unaffected: $r")
  }
}
