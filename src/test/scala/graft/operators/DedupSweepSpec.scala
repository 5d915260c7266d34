package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup threshold sweep (q117). */
class DedupSweepSpec extends SparkSpec {
  import spark.implicits._

  // A (10 words -> 8 trigram shingles), B = 8-word prefix (6 shingles,
  // all contained in A's): jac = 6/8 = 0.75. C shares nothing.
  private def fixture = Seq(
    (1L, "a b c d e f g h i j"),
    (2L, "a b c d e f g h"),
    (3L, "k l m n o p q r s t")).toDF("doc_id", "text")

  test("closed-form: the pair exists at 0.5, vanishes at 0.8") {
    val got = Dedup.dedupThresholdSweep(fixture, Seq(0.5, 0.8))
      .as[(Double, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0.5, 1L, 2L, 1L, 1L, 2L),
      (0.8, 0L, 0L, 0L, 0L, 3L)))
  }

  test("counts are monotone in the threshold") {
    val corpus = fixture.unionByName(Seq(
      (4L, "a b c d e f g h i x"), // another near-dup of A
      (5L, "u v w x y z aa bb cc dd")).toDF("doc_id", "text"))
    val got = Dedup.dedupThresholdSweep(corpus, Seq(0.3, 0.5, 0.7, 0.95))
      .as[(Double, Long, Long, Long, Long, Long)].collect().toSeq
    val pairs = got.map(_._2)
    val survivors = got.map(_._6)
    assert(pairs === pairs.sorted.reverse, s"pairs not non-increasing: $got")
    assert(survivors === survivors.sorted, s"survivors not non-decreasing: $got")
  }

  test("distributed tier matches the driver tier") {
    val corpus = fixture.unionByName(
      Seq((4L, "a b c d e f g h i x")).toDF("doc_id", "text"))
    val drv = Dedup.dedupThresholdSweep(corpus, Seq(0.4, 0.7)).collect().toSeq
    val dist = Dedup.dedupThresholdSweep(corpus, Seq(0.4, 0.7),
      maxDriverPairs = 0L).collect().toSeq
    assert(dist === drv)
  }
}
