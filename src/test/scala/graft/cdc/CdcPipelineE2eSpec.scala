package graft.cdc

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Dedup, TextAnalysis}
import graft.sources.ReplayDecode
import graft.wal.{FrameFile, PgOutput, PgOutputEncoder}

/** The two halves of the engine composing: a `documents` table arriving
  * over CDC (inserts, an update that changes dedup structure, a delete)
  * is materialized with applyChanges and fed STRAIGHT into the pipeline
  * operators — text analysis, exact dedup, decontamination — with
  * results reflecting the post-CDC state, not the initial inserts. */
class CdcPipelineE2eSpec extends SparkSpec {

  import PgOutput._

  private val rel = RelationMeta(7, "public", "documents", Vector(
    RelationColumn("doc_id", 20, -1, 0), // int8
    RelationColumn("text", 1043, -1, 0), // varchar
    RelationColumn("lang", 1043, -1, 0)))

  private val dupText = "the quick brown fox jumps over the lazy dog"

  private def writeFixture(): String = {
    val e = PgOutputEncoder
    val frames: Seq[Array[Byte]] = Seq(
      e.relation(rel),
      e.begin(),
      e.insert(7, Seq(Some("1"), Some(dupText), Some("en"))),
      e.insert(7, Seq(Some("2"), Some(dupText), Some("en"))), // exact dup of doc 1
      e.insert(7, Seq(Some("3"), Some("unique words entirely here now"), Some("en"))),
      e.commit(),
      e.begin(),
      // doc 2 rewritten -> no longer a duplicate of doc 1
      e.update(7, Seq(Some("2"), Some("completely different text now yes"), Some("en"))),
      e.delete(7, Seq(Some("3"), None, None)),
      e.commit())
    val path = Files.createTempDirectory("cdc-pipe").resolve("wal0.frames").toString
    FrameFile.write(path, frames.zipWithIndex.map { case (f, i) => (200L + i, f) })
    path
  }

  private def materialized() = {
    import spark.implicits._
    val typed = Envelope.typedView(ReplayDecode.batchDf(spark, writeFixture()), rel)
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    Envelope.applyChanges(empty, typed, Seq("doc_id"))
  }

  test("materialized CDC state reflects the update and delete") {
    val rows = materialized().orderBy("doc_id").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
    assert(rows(1).getAs[String]("text") === "completely different text now yes")
  }

  test("exact dedup over the materialized table sees the post-update grouping") {
    val docs = materialized()
    // before tx2 docs 1 and 2 were exact duplicates; after the CDC
    // update they are distinct — dedup must see the FINAL state
    assert(docs.select("text").distinct().count() === 2L)
    // and re-running on only the first transaction's state shows the dup
    val typed = Envelope.typedView(
      ReplayDecode.batchDf(spark, writeFixture()), rel)
      .filter(col("txid") === 201L)
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    val tx1 = Envelope.applyChanges(empty, typed, Seq("doc_id"))
    assert(tx1.count() === 3L && tx1.select("text").distinct().count() === 2L)
  }

  test("incremental ingest: CDC-materialized batch dedups against a standing corpus") {
    import spark.implicits._
    // the CDC stream delivers the ingest increment; the standing corpus
    // already contains doc 1's text under another id — dedupAgainstCorpus
    // must drop the near-dup and admit the rest (the q60 daily pattern)
    val corpus = Seq((100L, dupText + " end")).toDF("doc_id", "text")
    val increment = materialized()
    val survivors = Dedup.dedupAgainstCorpus(corpus, increment, threshold = 0.5, n = 3)
    assert(survivors.select("doc_id").as[Long].collect().sorted.toSeq === Seq(2L))
    val flagged = Dedup.crossDupPairs(corpus, increment, 0.5)
      .select("inc_id").as[Long].collect().toSeq
    assert(flagged === Seq(1L))
  }

  test("text analysis and decontamination run on the CDC-materialized table") {
    val docs = materialized()
    val annotated = docs.select(col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).as("toks"),
      TextAnalysis.langId(col("text")).as("pred"))
      .orderBy("doc_id").collect()
    assert(annotated.map(_.getAs[Long]("toks")).toSeq === Seq(9L, 5L))
    // benchmark = the duplicated sentence; only doc 1 still leaks it
    import spark.implicits._
    val bench = Seq((100L, dupText)).toDF("doc_id", "text")
    val scores = Dedup.contaminationScores(docs, bench, n = 3, minShared = 3L)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(scores === Map(1L -> true, 2L -> false))
  }
}
