package graft.operators

import graft.SparkSpec

/** Substring-level exact dedup (q77, Lee et al. 2022): a planted quote
  * embedded in two otherwise-distinct documents is recovered as a
  * maximal run with exact position and length; unique text and
  * within-doc self-repeats produce no rows. */
class PassagesSpec extends SparkSpec {
  import spark.implicits._

  private val quote = (1 to 12).map(i => s"q$i").mkString(" ") // 12 tokens

  test("planted 12-token quote found in both docs as one maximal run (k=8)") {
    val docs = Seq(
      // quote at tokens 6..17
      (1L, s"a1 a2 a3 a4 a5 $quote z1 z2 z3 z4"),
      // quote at tokens 4..15
      (2L, s"b1 b2 b3 $quote y1 y2"),
      // fully unique
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14 c15 c16")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedPassages(docs, k = 8)
      .as[(Long, Long, Long)].collect().toSeq
    // only windows fully inside the quote match across docs: d1 hits at
    // pos 6..10 (run len (10-6)+8 = 12 = the quote), d2 at 4..8
    assert(got === Seq((1L, 6L, 12L), (2L, 4L, 12L)))
  }

  test("within-doc self-repeats are not flagged; short docs survive the window guard") {
    val phrase = (1 to 9).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"$phrase mid1 mid2 $phrase"), // repeats only within itself
      (2L, "too short"),                  // < k tokens: zero windows
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")
    ).toDF("doc_id", "text")
    assert(Dedup.duplicatedPassages(docs, k = 8).isEmpty)
  }

  test("two disjoint shared passages merge into two separate runs") {
    val p2 = (1 to 10).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"$quote gap1 gap2 gap3 $p2"),   // quote at 1..12, p2 at 16..25
      (2L, s"$quote other1 other2"),
      (3L, s"pre1 pre2 $p2 post1")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedPassages(docs, k = 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 12L), (1L, 16L, 10L),
      (2L, 1L, 12L),
      (3L, 3L, 10L)))
  }

  test("single-pass kernel: the rolling window hash appears once per window side") {
    // r11: window hashing moved from a per-window concat_ws projection
    // (O(tokens x k) char copying) to the fused rolling-hash kernel
    // (O(tokens)). The plan audit pins the invocation-site count: the
    // aggregation side and the membership probe side each tokenize once
    // — a third site would mean a stage re-runs the kernel.
    val docs = Seq((1L, "x1 x2 x3 x4 x5 x6 x7 x8 x9")).toDF("doc_id", "text")
    assert(PlanAudit.scalaUdfSites(Dedup.duplicatedPassages(docs, k = 8)) === 2)
  }

  test("rolling hash: equal windows hash equal, shifted/different windows differ") {
    // two docs sharing a 8-token window at different positions must
    // produce the same h for the shared window (the join key), and the
    // polynomial must distinguish order (reversed window ≠ window)
    val docs = Seq(
      (1L, "a b c d e f g h tail1 tail2"),
      (2L, "lead a b c d e f g h"),
      (3L, "h g f e d c b a")).toDF("doc_id", "text")
    val runs = Dedup.duplicatedPassages(docs, k = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // docs 1+2 share exactly "a b c d e f g h" (pos 1 in doc 1, pos 2 in
    // doc 2); doc 3's reversed window matches nothing
    assert(runs === Set((1L, 1L, 8L), (2L, 2L, 8L)), s"$runs")
  }

  test("crossPassages: increment passages matching the corpus found; corpus-only dups ignored") {
    val corpus = Seq(
      (2L, s"c1 c2 c3 $quote c4 c5"),            // holds the quote at 4..15
      (4L, "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10"),
      (6L, s"e1 e2 $quote e3"),                   // corpus-internal second copy
      (8L, s"e1 e2 $quote e3")                    // (corpus-only dup: not the question)
    ).toDF("doc_id", "text")
    val inc = Seq(
      (1L, s"n1 n2 $quote n3 n4"),                // quote at 3..14 -> flagged
      (3L, "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10 m11") // clean -> untouched
    ).toDF("doc_id", "text")
    val got = Dedup.crossPassages(corpus, inc, k = 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L, 12L)))
  }

  test("redactBenchmarkPassages: exactly the leaked span is cut, case and spacing preserved") {
    val leak = (1 to 10).map(i => s"L$i").mkString(" ") // 10 tokens, upper-case
    val docs = Seq(
      (1L, s"Alpha Beta ${leak} Gamma Delta"), // leak at 3..12
      (2L, "Clean One Two Three Four Five Six Seven Eight Nine Ten Eleven"),
      (3L, leak)                               // whole doc leaked -> empty
    ).toDF("doc_id", "text")
    val bench = Seq((100L, s"pre1 pre2 $leak post1")).toDF("doc_id", "text")
    val got = Dedup.redactBenchmarkPassages(docs, bench, k = 8)
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "Alpha Beta Gamma Delta", 10L),
      (2L, "Clean One Two Three Four Five Six Seven Eight Nine Ten Eleven", 0L),
      (3L, "", 10L)))
  }

  test("crossPassages: the corpus side never shuffles (broadcast membership probe)") {
    val corpus = Seq((2L, s"c1 c2 $quote c3")).toDF("doc_id", "text")
    val inc = Seq((1L, s"n1 $quote n2")).toDF("doc_id", "text")
    val df = Dedup.crossPassages(corpus, inc, k = 8)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    // both hash-set joins broadcast; the only exchanges sit on
    // increment-bounded data (matched hashes, run window)
    assert(plan.contains("BroadcastHashJoin"), s"probe must broadcast:\n$plan")
    assert(!plan.contains("ShuffledHashJoin") && !plan.contains("SortMergeJoin"),
      s"no corpus-side shuffle join allowed:\n$plan")
  }
}
