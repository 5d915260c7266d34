package graft.streaming

import graft.SparkSpec
import graft.operators.{Takedown, TextAnalysis}
import org.apache.spark.sql.functions._

/** Incremental attribute-sheet sidecar (r14): one kernel pass per NEW
  * batch, old batches never re-scored, reads current against the store
  * (takedown composes), compaction-transparent. */
class AttributeUpkeepSpec extends SparkSpec {
  import spark.implicits._

  private val bc = StreamingOps.IngestBatchCol

  private def writeBatch(store: String, b: Long, ids: Seq[Long]): Unit =
    ids.map(i => (i, s"the document number $i with some plain prose text"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$store/$bc=$b")

  private def hashDir(dir: String): Seq[(String, String)] = {
    val root = java.nio.file.Paths.get(dir)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    java.nio.file.Files.walk(root).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) {
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(java.nio.file.Files.readAllBytes(p)).map("%02x".format(_)).mkString
        out += ((root.relativize(p).toString, h))
      }
    }
    out.sortBy(_._1).toSeq
  }

  test("upkeep scores only new batches; sheet matches direct computation; takedown composes") {
    val store = java.nio.file.Files.createTempDirectory("attr-upkeep").toString
    writeBatch(store, 0, Seq(1L, 2L))
    writeBatch(store, 1, Seq(10L, 11L))
    assert(StreamingOps.upkeepAttributeSheet(spark, store) === Seq(0L, 1L))
    // idempotent: nothing new
    assert(StreamingOps.upkeepAttributeSheet(spark, store) === Nil)
    val b0Before = hashDir(s"$store/${StreamingOps.AttributesDir}/$bc=0")
    // a new batch arrives: only IT is scored
    writeBatch(store, 2, Seq(20L))
    assert(StreamingOps.upkeepAttributeSheet(spark, store) === Seq(2L))
    assert(hashDir(s"$store/${StreamingOps.AttributesDir}/$bc=0") === b0Before)
    // the sheet equals a direct q128-kernel run over the whole store
    val sheet = StreamingOps.readAttributeSheet(spark, store).get
      .orderBy("doc_id")
    val direct = TextAnalysis.attributeSheet(
      StreamingOps.readCorpusStore(spark, store).get.drop(bc))
    // the sheet carries the batch id (re-threshold ablations slice by
    // ingest epoch); the signal columns equal a direct kernel run
    assert(sheet.columns.sorted.toSeq === (direct.columns :+ bc).sorted.toSeq)
    assert(sheet.select(direct.columns.map(col): _*).collect().toSeq ===
      direct.collect().toSeq)
    // takedown: the read drops the victim's attributes immediately...
    Takedown.deleteFromStore(spark, store, Seq(10L))
    val after = StreamingOps.readAttributeSheet(spark, store).get
    assert(after.filter(col("doc_id") === 10L).count() === 0L)
    assert(after.count() === 4L)
    // ...and the same verb reclaims the physical sidecar rows
    val r = Takedown.deleteFromStore(
      spark, s"$store/${StreamingOps.AttributesDir}", Seq(10L))
    assert(r.deletedRows === 1L)
    assert(spark.read.parquet(s"$store/${StreamingOps.AttributesDir}")
      .filter(col("doc_id") === 10L).count() === 0L)
  }

  test("upkeep composes with compaction in either order") {
    val store = java.nio.file.Files.createTempDirectory("attr-compact").toString
    writeBatch(store, 0, Seq(1L))
    writeBatch(store, 1, Seq(10L))
    // compact FIRST, then upkeep: batch ids survive as the epoch's data
    // column, so both batches are discovered and scored
    StreamingOps.compactStore(spark, store, uptoBatch = 1L)
    assert(StreamingOps.upkeepAttributeSheet(spark, store) === Seq(0L, 1L))
    writeBatch(store, 2, Seq(20L))
    assert(StreamingOps.upkeepAttributeSheet(spark, store) === Seq(2L))
    val sheet = StreamingOps.readAttributeSheet(spark, store).get
    assert(sheet.select("doc_id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 10L, 20L))
    // the store's own read never sees the sidecar
    assert(StreamingOps.readCorpusStore(spark, store).get.columns.toSet ===
      Set("doc_id", "text", bc))
  }
}
