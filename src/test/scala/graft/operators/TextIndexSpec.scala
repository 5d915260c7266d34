package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted inverted text index (q147): search through the store must
  * EQUAL the in-memory bm25TopK over the logically-current document
  * set after every lifecycle verb — build, append, delete, compact.
  * Bucket pruning must actually prune. */
class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet(s"$sfDirDocs/documents.parquet")
    .select("doc_id", "text")

  private val query = "spark vector query merge"

  private def rows(df: DataFrame): Seq[(Long, Double, Long)] =
    df.as[(Long, Double, Long)].collect().toSeq

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("text-idx").toString

  test("built index reproduces bm25TopK exactly — ids, scores, n_terms, order") {
    val path = tmp()
    TextIndex.build(docs, path, nBuckets = 16)
    val got = rows(TextIndex.search(spark, path, query, k = 20))
    val want = rows(TextSearch.bm25TopK(docs, query, k = 20))
    assert(got === want)
    // a query with no hits and an empty query return empty cleanly
    assert(TextIndex.search(spark, path, "zzzz qqqq", k = 5).count() === 0L)
    assert(TextIndex.search(spark, path, "", k = 5).count() === 0L)
    Manifests.rmTree(path)
  }

  test("append: planted doc surfaces; index equals bm25TopK over the union") {
    val path = tmp()
    TextIndex.build(docs, path, nBuckets = 16)
    val planted = Seq(
      (900001L, "spark vector query merge spark vector query merge"),
      (900002L, "nothing relevant here at all")).toDF("doc_id", "text")
    TextIndex.append(planted, path, batchId = 1L)
    val got = rows(TextIndex.search(spark, path, query, k = 20))
    val want = rows(TextSearch.bm25TopK(docs.unionByName(planted), query, k = 20))
    assert(got === want)
    assert(got.head._1 === 900001L) // the stuffed doc wins
    // idempotent replay: re-append overwrites its own partitions only
    TextIndex.append(planted, path, batchId = 1L)
    assert(rows(TextIndex.search(spark, path, query, k = 20)) === want)
    Manifests.rmTree(path)
  }

  test("delete: victims gone, scores shift with the new df/stats — still exact") {
    val path = tmp()
    TextIndex.build(docs, path, nBuckets = 16)
    val before = rows(TextIndex.search(spark, path, query, k = 5))
    val victims = before.take(2).map(_._1)
    val removed = TextIndex.delete(spark, path, victims)
    assert(removed > 0L)
    val got = rows(TextIndex.search(spark, path, query, k = 20))
    val want = rows(TextSearch.bm25TopK(
      docs.filter(!col("doc_id").isin(victims: _*)), query, k = 20))
    assert(got === want)
    assert(!got.exists(r => victims.contains(r._1)))
    // re-delete is a no-op
    assert(TextIndex.delete(spark, path, victims) === 0L)
    Manifests.rmTree(path)
  }

  test("compaction is transparent to search and composes with append + delete") {
    val path = tmp()
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    TextIndex.build(half1, path, nBuckets = 16)
    TextIndex.append(half2, path, batchId = 1L)
    TextIndex.compact(spark, path, uptoBatch = 1L)
    val got = rows(TextIndex.search(spark, path, query, k = 20))
    assert(got === rows(TextSearch.bm25TopK(docs, query, k = 20)))
    // delete out of the compacted epoch
    val victim = got.head._1
    TextIndex.delete(spark, path, Seq(victim))
    val after = rows(TextIndex.search(spark, path, query, k = 20))
    assert(after === rows(TextSearch.bm25TopK(
      docs.filter(col("doc_id") =!= victim), query, k = 20)))
    Manifests.rmTree(path)
  }

  test("phrase search: adjacency gates membership, BM25 ranks, occurrences count") {
    val path = tmp()
    val corpus = Seq(
      (1L, "the green tree stands near the river"),          // exact phrase
      (2L, "green leaves on a tall tree"),                   // both words, NOT adjacent
      (3L, "a green tree and another green tree here"),      // two occurrences
      (4L, "tree green is reversed order"),                  // reversed — no match
      (5L, "completely unrelated text about rivers"),
      (6L, "green  tree")                                    // double space: raw slots differ
    ).toDF("doc_id", "text")
    TextIndex.build(corpus, path, nBuckets = 8)
    val got = TextIndex.searchPhrase(spark, path, "green tree", k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(got.map(_._1).toSet === Set(1L, 3L))
    assert(got.find(_._1 == 3L).get._3 === 2L) // two occurrences counted
    assert(got.find(_._1 == 1L).get._3 === 1L)
    // doc 6's double space breaks raw adjacency (slot between the words)
    assert(!got.exists(_._1 == 6L))
    // three-word phrase
    val tri = TextIndex.searchPhrase(spark, path, "the green tree", k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(tri.map(_._1) === Seq(1L))
    // repeated-token phrase
    val rep = TextIndex.searchPhrase(spark, path, "green tree and another green", k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(rep.map(_._1) === Seq(3L))
    // one-word phrase: membership by term, occurrences = tf
    val one = TextIndex.searchPhrase(spark, path, "green", k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(one.map(_._1).toSet === Set(1L, 2L, 3L, 4L, 6L))
    assert(one.find(_._1 == 3L).get._3 === 2L)
    Manifests.rmTree(path)
  }

  test("phrase search composes with the lifecycle: append and delete shift results") {
    val path = tmp()
    TextIndex.build(Seq((1L, "alpha beta gamma")).toDF("doc_id", "text"), path, 8)
    TextIndex.append(Seq((2L, "alpha beta delta"), (3L, "beta alpha"))
      .toDF("doc_id", "text"), path, batchId = 1L)
    val got = TextIndex.searchPhrase(spark, path, "alpha beta", k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(got.map(_._1).toSet === Set(1L, 2L))
    TextIndex.delete(spark, path, Seq(1L))
    assert(TextIndex.searchPhrase(spark, path, "alpha beta", k = 10)
      .as[(Long, Double, Long)].collect().map(_._1).toSeq === Seq(2L))
    Manifests.rmTree(path)
  }

  test("bucket pruning reaches the scan: only the query terms' buckets are read") {
    val path = tmp()
    TextIndex.build(docs, path, nBuckets = 16)
    val q = TextIndex.search(spark, path, query, k = 20)
    // the pre-adaptive physical plan keeps the scan nodes visible (AQE
    // stage leaves hide them behind QueryStageExec)
    val scans = q.queryExecution.sparkPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .filter(_.metadata.getOrElse("Location", "").contains("postings"))
    assert(scans.nonEmpty, q.queryExecution.sparkPlan.toString)
    assert(scans.forall(_.metadata.getOrElse("PartitionFilters", "").contains("bucket")),
      scans.map(_.metadata.getOrElse("PartitionFilters", "")).mkString("; "))
    Manifests.rmTree(path)
  }
}
