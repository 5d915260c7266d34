package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Retrieval chunking (q91) and exact-k stratified sampling (q92). */
class ChunkingSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("chunks tile with the configured overlap and keep the tail") {
    // 10 tokens, chunk 4, overlap 2 -> stride 2 -> chunks at 0,2,4,6:
    // [a b c d][c d e f][e f g h][g h i j]  (ceil((10-4)/2)=3 -> 4 chunks)
    val docs = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkForRetrieval(docs, chunkTokens = 4, overlap = 2)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (0L, "a b c d", 4L), (1L, "c d e f", 4L),
      (2L, "e f g h", 4L), (3L, "g h i j", 4L)), s"${got.toSeq}")
  }

  test("short docs are one chunk; a ragged tail chunk keeps its remainder") {
    val docs = Seq((1L, "only three tokens"), (2L, "a b c d e")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkForRetrieval(docs, chunkTokens = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.count(_._1 == 1L) === 1 && got.find(_._1 == 1L).get._3 === "only three tokens")
    // doc 2: 5 tokens -> chunks at 0 and 2: [a b c d][c d e]
    assert(got.filter(_._1 == 2L).map(_._3).toSeq === Seq("a b c d", "c d e"))
  }

  test("every original token position is covered by some chunk") {
    val text = (1 to 57).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkForRetrieval(docs, chunkTokens = 16, overlap = 4)
      .collect().map(_.getString(2))
    val covered = chunks.flatMap(_.split(" ")).toSet
    assert(covered === (1 to 57).map(i => s"w$i").toSet)
  }

  test("exact-k sample: quota, determinism, and minwise stability under growth") {
    val docs = (1L to 40L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val s = Packing.stratifiedExactK(docs, col("doc_id"), col("lang"), k = 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(s.count(_._1 == "en") === 5 && s.count(_._1 == "de") === 5)
    // determinism under repartition
    val s2 = Packing.stratifiedExactK(docs.repartition(9), col("doc_id"), col("lang"), k = 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(s.toSeq === s2.toSeq)
    // minwise stability: adding rows can only displace a kept id with a
    // smaller-hash arrival — the kept set of the grown corpus is never
    // a reshuffle, and here it must still contain >= k-1 of the old ids
    val grown = docs.unionByName(Seq((100L, "en")).toDF("doc_id", "lang"))
    val s3 = Packing.stratifiedExactK(grown, col("doc_id"), col("lang"), k = 5)
      .collect().filter(_.getString(0) == "en").map(_.getLong(2)).toSet
    val old = s.filter(_._1 == "en").map(_._3).toSet
    assert(s3.intersect(old).size >= 4, s"$old -> $s3")
  }

  test("property: random texts — chunks cover every position, tile at the stride, honor bounds") {
    val rnd = new scala.util.Random(11)
    (1 to 4).foreach { trial =>
      val nTok = 1 + rnd.nextInt(120)
      val chunk = 2 + rnd.nextInt(20)
      val overlap = rnd.nextInt(chunk)
      val toks = (0 until nTok).map(i => s"p$i")
      val docs = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val rows = TextAnalysis.chunkForRetrieval(docs, chunk, overlap)
        .collect().map(r => (r.getLong(1), r.getString(2).split(" ").toSeq))
      val stride = chunk - overlap
      rows.foreach { case (cid, ws) =>
        assert(ws === toks.slice(cid.toInt * stride, cid.toInt * stride + chunk),
          s"trial $trial (n=$nTok c=$chunk o=$overlap): chunk $cid off-tile")
      }
      assert(rows.flatMap(_._2).toSet === toks.toSet,
        s"trial $trial: positions uncovered")
      assert(rows.head._2.size <= chunk && rows.forall(_._2.size <= chunk))
    }
  }

  test("plan shapes: chunking shuffles only for the presentation sort; the sampler has no window") {
    val docs = (1L to 40L).map(i => (i, "w " * 20, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val chunkPlan = TextAnalysis.chunkForRetrieval(docs, 8, 2)
      .queryExecution.executedPlan.toString
    // the generate (explode) must run BELOW the only exchange — the
    // chunk computation itself is shuffle-free
    assert("Exchange".r.findAllIn(chunkPlan).size === 1, s"plan:\n$chunkPlan")
    assert(chunkPlan.indexOf("Generate") > chunkPlan.indexOf("Exchange"),
      s"explode must be below the presentation sort's exchange:\n$chunkPlan")
    val samplePlan = Packing.stratifiedExactK(docs, col("doc_id"), col("lang"), 5)
      .queryExecution.executedPlan.toString
    assert(!samplePlan.contains("Window"),
      s"the bounded aggregator must replace any per-stratum rank window:\n$samplePlan")
  }

  test("a stratum smaller than k yields its full membership") {
    val docs = Seq((1L, "en"), (2L, "en"), (3L, "zh")).toDF("doc_id", "lang")
    val s = Packing.stratifiedExactK(docs, col("doc_id"), col("lang"), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(s.filter(_._1 == "en").map(_._2).toSet === Set(1L, 2L))
    assert(s.filter(_._1 == "zh").map(_._2).toSet === Set(3L))
  }
}
