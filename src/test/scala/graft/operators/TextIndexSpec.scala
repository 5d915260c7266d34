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

  test("searchSlop: slop=0 equals searchPhrase; wider slop admits ordered gaps only") {
    val path = tmp()
    val corpus = docs.unionByName(Seq(
      (910001L, "alpha beta"),            // adjacent
      (910002L, "alpha x beta"),          // gap 1
      (910003L, "alpha x y beta"),        // gap 2
      (910004L, "beta x alpha"),          // wrong order — never matches
      (910005L, "alpha x y z beta")       // gap 3
    ).toDF("doc_id", "text"))
    TextIndex.build(corpus, path, nBuckets = 16)
    def ids(df: DataFrame) = df.select("doc_id").as[Long].collect().toSet
    // slop=0 ≡ phrase, on a real multi-hit query over the corpus
    val phrase = TextIndex.searchPhrase(spark, path, "alpha beta", k = 50)
    val slop0 = TextIndex.searchSlop(spark, path, "alpha beta", slop = 0, k = 50)
    assert(rows(phrase) === rows(slop0))
    assert(ids(slop0).contains(910001L) && !ids(slop0).contains(910002L))
    // each slop unit admits one more position of spread, order enforced
    val slop1 = ids(TextIndex.searchSlop(spark, path, "alpha beta", slop = 1, k = 50))
    val slop2 = ids(TextIndex.searchSlop(spark, path, "alpha beta", slop = 2, k = 50))
    assert(slop1.contains(910002L) && !slop1.contains(910003L))
    assert(slop2.contains(910003L) && !slop2.contains(910005L))
    assert(!slop2.contains(910004L)) // reversed order never matches
    // monotone: candidates only grow with slop
    assert(ids(slop0).subsetOf(slop1) && slop1.subsetOf(slop2))
    Manifests.rmTree(path)
  }

  test("stop analyzer: query stopwords vanish, dl is the analyzed count, meta pins it") {
    val path = tmp()
    TextIndex.build(docs, path, nBuckets = 16, analyzer = Analyzer.Stop)
    // a query wrapped in stopwords equals the bare-term query
    val a = rows(TextIndex.search(spark, path, "the data of stream", k = 20))
    val b = rows(TextIndex.search(spark, path, "data stream", k = 20))
    assert(a === b && a.nonEmpty)
    // dl is the ANALYZED count: a doc padded with stopwords analyzes to
    // the same terms as its bare twin, so under `stop` the two score
    // IDENTICALLY — while a `simple` index penalizes the padded dl.
    // Appending (not rebuilding) also proves the analyzer is PINNED by
    // meta: the append path analyzes with it, no parameter passed.
    val planted = Seq((920001L, "datax streamx"),
      (920002L, "the datax the streamx the")).toDF("doc_id", "text")
    TextIndex.append(planted, path, batchId = 1L)
    val scores = TextIndex.search(spark, path, "datax streamx", k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(scores(920001L) === scores(920002L))
    val pSimple = tmp()
    TextIndex.build(docs.unionByName(planted), pSimple, nBuckets = 16)
    val sSimple = TextIndex.search(spark, pSimple, "datax streamx", k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(sSimple(920001L) > sSimple(920002L))
    Seq(path, pSimple).foreach(Manifests.rmTree)
  }

  test("position gaps: elided stopwords keep Lucene phrase/slop semantics") {
    val path = tmp()
    val corpus = Seq(
      (1L, "new york city"),
      (2L, "new the york"),    // elided stopword -> gap of 2
      (3L, "new of the york"), // gap of 3
      (4L, "york then new"),   // wrong order — never matches
      (5L, "new bridge york")  // non-stopword between -> same gap of 2
    ).toDF("doc_id", "text")
    TextIndex.build(corpus, path, nBuckets = 8, analyzer = Analyzer.Stop)
    def ids(df: DataFrame): Set[Long] =
      df.select("doc_id").as[Long].collect().toSet
    // exact phrase: only TRUE adjacency — "new the york" must NOT match
    // (the pre-gap analyzed-offset layout matched it, a false positive)
    assert(ids(TextIndex.searchPhrase(spark, path, "new york", k = 10))
      === Set(1L))
    // slop 1 matches ACROSS one elided stopword, exactly as across a
    // real word — positions are raw-sequence offsets either way
    assert(ids(TextIndex.searchSlop(spark, path, "new york", slop = 1, k = 10))
      === Set(1L, 2L, 5L))
    assert(ids(TextIndex.searchSlop(spark, path, "new york", slop = 2, k = 10))
      === Set(1L, 2L, 3L, 5L))
    // dl is still the ANALYZED count: the stopword carries no length
    // mass, so docs 1 and 2 (both 2 surviving terms +1 unique) rank by
    // the same norm
    Manifests.rmTree(path)

    // english: stems participate in gap arithmetic the same way
    val pe = tmp()
    TextIndex.build(Seq(
      (6L, "connecting the networks"),
      (7L, "connected networks")).toDF("doc_id", "text"),
      pe, nBuckets = 8, analyzer = Analyzer.English)
    assert(ids(TextIndex.searchPhrase(spark, pe, "connect network", k = 10))
      === Set(7L))
    assert(ids(TextIndex.searchSlop(spark, pe, "connect network", slop = 1, k = 10))
      === Set(6L, 7L))
    Manifests.rmTree(pe)

    // a pre-gap stop/english index (meta without `positions`) is
    // REFUSED by positional search with a pointed rebuild error
    val pOld = tmp()
    TextIndex.build(corpus, pOld, nBuckets = 8, analyzer = Analyzer.Stop)
    Seq((8, Analyzer.Stop)).toDF("n_buckets", "analyzer").coalesce(1)
      .write.mode("overwrite").parquet(s"$pOld/meta")
    val e = intercept[IllegalArgumentException] {
      TextIndex.searchPhrase(spark, pOld, "new york", k = 10)
    }
    assert(e.getMessage.contains("rebuild"))
    // plain BM25 search ignores positions — still served
    assert(TextIndex.search(spark, pOld, "york", k = 10).count() > 0)
    // ... and APPEND is refused too (ADVICE r17): one append would
    // permanently mix raw-offset postings into the analyzed-offset
    // index — a corruption no later rebuild of just the new batches
    // could untangle — and nothing else would warn at append time
    val eApp = intercept[IllegalArgumentException] {
      TextIndex.append(Seq((9L, "more new york text")).toDF("doc_id", "text"),
        pOld, batchId = 0L)
    }
    assert(eApp.getMessage.contains("rebuild"))
    Manifests.rmTree(pOld)
  }

  test("local bucketOf equals the distributed pmod(xxhash64) for varied tokens") {
    // the serving path computes query-term buckets via local Catalyst
    // eval (zero jobs); parity with the WRITE path's planned expression
    // is the invariant that keeps pruned searches exact
    val toks = Seq("spark", "vector", "a", "", "zzzz", "naïve", "日本語",
      "with space", "UPPER", "0123456789", " nul")
    for (n <- Seq(7, 16, 64)) {
      val want = toks.toDF("tok")
        .select(col("tok"), pmod(xxhash64(col("tok")), lit(n)).cast("int").as("b"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      toks.foreach(t => assert(TextIndex.bucketOf(t, n) === want(t), s"tok=$t n=$n"))
    }
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
