package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{TextIndex, TextSearch}

/** Streaming ingest into the persisted text index: searches must equal
  * the in-memory BM25 over everything landed so far, and commit-drop
  * crash replay must reproduce the identical index. */
class TextIndexIngestSpec extends SparkSpec {
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

  private val b0 = Seq(
    (1L, "spark streams merge the vector tables"),
    (2L, "a quiet river bank with no relevant words"),
    (3L, "vector vector vector spark"))
  private val b1 = Seq(
    (10L, "merge spark vector spark"),
    (11L, "another unrelated document about gardens"))

  test("textIndexIngest: search == bm25TopK over landed batches; replay idempotent") {
    val inDir = java.nio.file.Files.createTempDirectory("tidx-in")
    val idx = java.nio.file.Files.createTempDirectory("tidx-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("tidx-ck").toString
    val t0 = System.currentTimeMillis() - 60000
    writeInput(inDir, "0.json", t0, b0)
    writeInput(inDir, "1.json", t0 + 30000, b1)

    def run(): Unit = {
      val docs = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(inDir.toString)
      val q = StreamingOps.textIndexIngest(docs, idx, ckpt, nBuckets = 8)
      q.processAllAvailable()
      q.stop()
    }
    run()

    val all = (b0 ++ b1).toDF("doc_id", "text")
    def got() = TextIndex.search(spark, idx, "spark vector", k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    val want = TextSearch.bm25TopK(all, "spark vector", k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(got() === want)
    assert(got().map(_._1).toSet === Set(1L, 3L, 10L))

    // crash after batch 1's writes, before its commit: replay must
    // reproduce the identical index (its own partitions overwrite)
    assert(java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", "1")))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))
    run()
    assert(got() === want)

    // the full lifecycle composes on a stream-built index
    TextIndex.delete(spark, idx, Seq(3L))
    assert(TextIndex.search(spark, idx, "spark vector", k = 10)
      .as[(Long, Double, Long)].collect().toSeq ===
      TextSearch.bm25TopK(all.filter(col("doc_id") =!= 3L), "spark vector", k = 10)
        .as[(Long, Double, Long)].collect().toSeq)
    graft.operators.Manifests.rmTree(idx)
  }
}
