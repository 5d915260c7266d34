package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ingest-store compaction (the small-files answer for a long-running
  * daily ingest): folding committed batch partitions into one
  * consolidated epoch changes the LAYOUT only — rows, as-of semantics,
  * and continued ingest are bit-identical; the manifest flip is the
  * single commit point, so a crash mid-compaction leaves readers on
  * the old view. */
class CompactStoreSpec extends SparkSpec {
  import spark.implicits._

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))

  private def writeInput(dir: java.nio.file.Path, name: String, mtime: Long,
                         docs: Seq[(Long, String)]): Unit = {
    val f = dir.resolve(name)
    val lines = docs.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    assert(f.toFile.setLastModified(mtime))
  }

  private def storeRows(store: String): Seq[(Long, Long)] =
    StreamingOps.readCorpusStore(spark, store).get
      .select(col("doc_id"), col(StreamingOps.IngestBatchCol).cast("long"))
      .as[(Long, Long)].collect().sorted.toSeq

  private def parquetFiles(store: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(store))
  }

  test("compaction preserves rows and as-of semantics; ingest continues over the epoch") {
    val inDir = java.nio.file.Files.createTempDirectory("cmp-in")
    val store = java.nio.file.Files.createTempDirectory("cmp-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cmp-ck").toString
    val t0 = System.currentTimeMillis() - 60000
    writeInput(inDir, "0.json", t0, Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "totally fresh words appear in this one")))
    writeInput(inDir, "1.json", t0 + 30000, Seq(
      (21L, "and another unrelated document body here")))
    def run(): Unit = {
      val docs = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(inDir.toString)
      val q = StreamingOps.dedupedIngestToStore(docs, store, ckpt, threshold = 0.5)
      q.processAllAvailable()
      q.stop()
    }
    run()
    val before = storeRows(store)
    assert(before === Seq((10L, 0L), (11L, 0L), (21L, 1L)))
    val filesBefore = parquetFiles(store).size

    val cs = StreamingOps.compactStore(spark, store, uptoBatch = 1L)
    assert(cs === StreamingOps.CompactionState(0L, 1L))
    // rows identical through the SAME reader; layout consolidated
    assert(storeRows(store) === before)
    assert(parquetFiles(store).size < filesBefore,
      s"compaction must shrink the file count (was $filesBefore)")
    // the superseded batch partitions are gone (GC ran)
    assert(!new java.io.File(s"$store/${StreamingOps.IngestBatchCol}=0").exists())
    // as-of filtering still works on the epoch's data column
    val asOf1 = StreamingOps.readCorpusStore(spark, store).get
      .filter(col(StreamingOps.IngestBatchCol) < 1).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(asOf1 === Seq(10L, 11L))

    // continued ingest: batch 2 dedups against the COMPACTED corpus (a
    // near-dup of compacted doc 10 is rejected; fresh text admitted)
    writeInput(inDir, "2.json", t0 + 60000, Seq(
      (30L, "alpha beta gamma delta epsilon eta"), // near-dup of compacted 10
      (31L, "completely different closing sentence body")))
    run()
    assert(storeRows(store) === before :+ ((31L, 2L)))

    // second epoch folds the new batch in and supersedes the first
    val cs2 = StreamingOps.compactStore(spark, store, uptoBatch = 2L)
    assert(cs2 === StreamingOps.CompactionState(1L, 2L))
    assert(storeRows(store) === before :+ ((31L, 2L)))
    assert(!new java.io.File(s"$store/_compaction/epoch-0").exists())
  }

  test("a shrinking compaction watermark is refused (would silently lose rows)") {
    val inDir = java.nio.file.Files.createTempDirectory("cmp3-in")
    val store = java.nio.file.Files.createTempDirectory("cmp3-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cmp3-ck").toString
    val t0 = System.currentTimeMillis() - 60000
    writeInput(inDir, "0.json", t0, Seq((10L, "alpha beta gamma delta epsilon zeta")))
    writeInput(inDir, "1.json", t0 + 30000, Seq((21L, "and another unrelated document body here")))
    val docs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir.toString)
    val q = StreamingOps.dedupedIngestToStore(docs, store, ckpt)
    q.processAllAvailable()
    q.stop()
    StreamingOps.compactStore(spark, store, uptoBatch = 1L)
    // epoch-0 covers batch 1; a stale caller asking to compact only up
    // to batch 0 would write an epoch WITHOUT doc 21 and then GC its
    // only copy — must be refused, store untouched
    val e = intercept[IllegalArgumentException] {
      StreamingOps.compactStore(spark, store, uptoBatch = 0L)
    }
    assert(e.getMessage.contains("watermark"))
    assert(storeRows(store) === Seq((10L, 0L), (21L, 1L)))
  }

  test("a half-written epoch without a manifest flip is invisible to readers") {
    val inDir = java.nio.file.Files.createTempDirectory("cmp2-in")
    val store = java.nio.file.Files.createTempDirectory("cmp2-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cmp2-ck").toString
    writeInput(inDir, "0.json", System.currentTimeMillis() - 60000, Seq(
      (10L, "alpha beta gamma delta epsilon zeta")))
    val docs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir.toString)
    val q = StreamingOps.dedupedIngestToStore(docs, store, ckpt)
    q.processAllAvailable()
    q.stop()
    // simulate a crash AFTER the epoch write but BEFORE the manifest
    // flip: garbage rows under _compaction, no manifest
    Seq((999L, "garbage that must never be read", 0L))
      .toDF("doc_id", "text", StreamingOps.IngestBatchCol)
      .write.parquet(s"$store/_compaction/epoch-0")
    assert(StreamingOps.compactionState(store).isEmpty)
    assert(storeRows(store) === Seq((10L, 0L)),
      "an uncommitted epoch must be inert garbage")
  }
}
