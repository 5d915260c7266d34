package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dedup provenance (r14): the alias sidecar answers "where did my
  * document go" — every rejected doc maps to its best corpus match, the
  * pair kernel runs once for both outputs, and crash replay reproduces
  * survivors AND aliases identically. */
class AliasIngestSpec extends SparkSpec {
  import spark.implicits._

  test("dedupAgainstCorpusWithAliases: disjoint cover, best-match alias, one kernel pass") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta theta"),
      (3L, "a completely different body of text here")).toDF("doc_id", "text")
    val inc = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),   // exact dup of 1 (and near 2)
      (11L, "fresh never seen words entirely novel")) // survivor
      .toDF("doc_id", "text")
    val (surv, al) = Dedup.dedupAgainstCorpusWithAliases(corpus, inc, 0.5, 3)
    assert(surv.select("doc_id").as[Long].collect().toSeq === Seq(11L))
    val aliases = al.orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    // doc 10's best match is corpus doc 1 (jaccard 1.0 beats doc 2's)
    assert(aliases.map(a => (a._1, a._2)) === Seq((10L, 1L)))
    assert(aliases.head._3 === 1.0)
    // survivors ∪ aliased = the whole increment, disjoint
    assert((surv.select("doc_id").as[Long].collect().toSet ++
      al.select("doc_id").as[Long].collect().toSet) === Set(10L, 11L))
    graft.operators.Storage.releaseAll(true)
  }

  test("alias ties break to the lowest corpus id") {
    val corpus = Seq(
      (7L, "one two three four five six"),
      (5L, "one two three four five six")).toDF("doc_id", "text")
    val inc = Seq((10L, "one two three four five six")).toDF("doc_id", "text")
    val (_, al) = Dedup.dedupAgainstCorpusWithAliases(corpus, inc, 0.5, 3)
    assert(al.as[(Long, Long, Double)].collect().toSeq === Seq((10L, 5L, 1.0)))
    graft.operators.Storage.releaseAll(true)
  }

  test("ingest sink writes the alias sidecar; crash replay reproduces it") {
    val inDir = java.nio.file.Files.createTempDirectory("alias-in")
    val store = java.nio.file.Files.createTempDirectory("alias-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("alias-ck").toString
    def writeInput(name: String, mtime: Long, docs: Seq[(Long, String)]): Unit = {
      val f = inDir.resolve(name)
      java.nio.file.Files.write(f,
        docs.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("\n").getBytes("UTF-8"))
      assert(f.toFile.setLastModified(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    writeInput("0.json", t0, Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "totally fresh words appear in this one")))
    writeInput("1.json", t0 + 30000, Seq(
      (20L, "alpha beta gamma delta epsilon eta"), // near-dup of survivor 10
      (21L, "and another unrelated document body here")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def run(): Unit = {
      val docs = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(inDir.toString)
      val q = StreamingOps.dedupedIngestToStore(docs, store, ckpt,
        threshold = 0.5, aliases = true)
      q.processAllAvailable()
      q.stop()
    }
    run()
    def stored(): Seq[Long] =
      StreamingOps.readCorpusStore(spark, store).get
        .select("doc_id").as[Long].collect().sorted.toSeq
    def aliases(): Seq[(Long, Long, Long)] =
      StreamingOps.readCorpusStore(spark, s"$store/${StreamingOps.AliasesDir}").get
        .select(col("doc_id"), col("kept_id"),
          col(StreamingOps.IngestBatchCol).cast("long"))
        .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(stored() === Seq(10L, 11L, 21L))
    assert(aliases() === Seq((20L, 10L, 1L))) // batch 1's reject points at 10
    // crash after batch 1's writes, before its commit: replay reproduces
    assert(java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", "1")))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))
    run()
    assert(stored() === Seq(10L, 11L, 21L))
    assert(aliases() === Seq((20L, 10L, 1L)))
    // the corpus store's own read never sees the sidecar
    assert(StreamingOps.readCorpusStore(spark, store).get.columns.toSet ===
      Set("doc_id", "text", StreamingOps.IngestBatchCol))
  }
}
