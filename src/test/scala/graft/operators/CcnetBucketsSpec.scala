package graft.operators

import graft.SparkSpec

/** CCNet perplexity bucketing (q83): tercile cuts, per-bucket keep
  * rates, and the value-tie contract. */
class CcnetBucketsSpec extends SparkSpec {
  import spark.implicits._

  // nine docs in three fluency tiers: three share the corpus's dominant
  // bigram patterns (low nll), three reuse them partially, three are
  // word salad over rare tokens (high nll). ≥2 tokens each so all nine
  // are bucketed.
  private val docs = Seq(
    (1L, "the cat sat on the mat"), (2L, "the cat sat on the mat"),
    (3L, "the cat sat on the mat"),
    (4L, "the cat ran on a mat"), (5L, "a cat sat on a rug"),
    (6L, "the dog sat on the rug"),
    (7L, "zx qy wv ut sr pq"), (8L, "aa bb cc dd ee ff"),
    (9L, "one two three four five six")
  ).toDF("doc_id", "text")

  test("buckets are fluency terciles and cover every scored doc exactly once") {
    val rows = TextAnalysis.ccnetBuckets(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(4))).toMap
    assert(rows.keySet === Set("head", "middle", "tail"))
    assert(rows.values.map(_._1).sum === 9L, s"all nine docs bucketed: $rows")
    // mean nll must be monotone head < middle < tail
    assert(rows("head")._3 < rows("middle")._3 && rows("middle")._3 < rows("tail")._3,
      s"tercile means must be ordered by fluency: $rows")
    // the head bucket keeps everything ('g' beats any hex prefix)
    assert(rows("head")._2 === rows("head")._1, s"head keeps all: $rows")
    // middle/tail keep at most their bucket size and the draw is a strict
    // subset somewhere on this fixture (rates 1/2 and 1/4)
    assert(rows("middle")._2 <= rows("middle")._1 && rows("tail")._2 <= rows("tail")._1)
  }

  test("docs sharing a rounded nll land in one bucket together") {
    // docs 1-3 are identical, so they share one nll value exactly; the
    // value-histogram cut can never split them across buckets
    val perDoc = TextAnalysis.bigramNll(docs)
    val withBucket = TextAnalysis.ccnetBuckets(docs)
    // recompute membership the way the operator assigns it: identical
    // nll => identical bucket. Indirect check: head has a multiple-of-3
    // count only if the triplet stayed together... assert directly via
    // bucket counts: no bucket can hold one or two of the triplet plus
    // the cut at n/3=3 — the triplet IS the head tercile here.
    val head = withBucket.collect().find(_.getString(0) == "head").get
    assert(head.getLong(1) === 3L, s"the identical triplet fills head: $head")
    assert(perDoc.collect().length === 9)
  }

  test("bucketing is deterministic across runs") {
    val a = TextAnalysis.ccnetBuckets(docs).collect().toSeq
    val b = TextAnalysis.ccnetBuckets(docs).collect().toSeq
    assert(a === b)
  }
}
