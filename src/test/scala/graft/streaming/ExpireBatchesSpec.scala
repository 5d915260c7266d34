package graft.streaming

import graft.SparkSpec
import graft.operators.Manifests
import org.apache.spark.sql.functions._

/** Retention / TTL (r14): whole batches age out — live partitions by
  * directory removal, epoch-folded rows by a manifest-flipped rewrite,
  * attribute sidecar partitions alongside; the commit guard refuses an
  * uncommitted bound. */
class ExpireBatchesSpec extends SparkSpec {
  import spark.implicits._

  private val bc = StreamingOps.IngestBatchCol

  private def writeBatch(store: String, b: Long, ids: Seq[Long]): Unit =
    ids.map(i => (i, s"document body number $i")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$store/$bc=$b")

  private def ids(store: String): Seq[Long] =
    StreamingOps.readCorpusStore(spark, store).get
      .select("doc_id").as[Long].collect().sorted.toSeq

  test("live-only store: expiry is pure directory removal, sidecar follows") {
    val s = java.nio.file.Files.createTempDirectory("ttl-live").toString
    (0L to 2L).foreach(b => writeBatch(s, b, Seq(b * 10, b * 10 + 1)))
    StreamingOps.upkeepAttributeSheet(spark, s)
    // an alias sidecar partition for batch 1 ages out with it
    Seq((99L, 10L, 1.0)).toDF("doc_id", "kept_id", "jaccard")
      .coalesce(1).write.parquet(s"$s/${StreamingOps.AliasesDir}/$bc=1")
    val (removed, epoch) = StreamingOps.expireBatches(spark, s, uptoBatch = 1L)
    assert(removed === 5 && !epoch) // 2 store + 2 attribute + 1 alias dirs
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s, StreamingOps.AliasesDir, s"$bc=1")))
    assert(ids(s) === Seq(20L, 21L))
    assert(StreamingOps.readAttributeSheet(spark, s).get
      .select("doc_id").as[Long].collect().sorted.toSeq === Seq(20L, 21L))
  }

  test("epoch-folded rows rewrite out through a manifest flip; watermark intact") {
    val s = java.nio.file.Files.createTempDirectory("ttl-epoch").toString
    (0L to 2L).foreach(b => writeBatch(s, b, Seq(b * 10, b * 10 + 1)))
    StreamingOps.compactStore(spark, s, uptoBatch = 1L)
    val (e0, covers0) = Manifests.read(s).get
    val (removed, epochRewritten) = StreamingOps.expireBatches(spark, s, 0L)
    assert(epochRewritten && removed === 0) // batch 0 lived only in the epoch
    val (e1, covers1) = Manifests.read(s).get
    assert(e1 === e0 + 1 && covers1 === covers0) // watermark never shrinks
    assert(ids(s) === Seq(10L, 11L, 20L, 21L))
    // expiring ALL epoch rows leaves a legal zero-row epoch
    val (_, again) = StreamingOps.expireBatches(spark, s, 1L)
    assert(again)
    assert(ids(s) === Seq(20L, 21L))
    // idempotent: nothing left in range
    assert(StreamingOps.expireBatches(spark, s, 1L) === ((0, false)))
  }

  test("commit guard refuses a bound above the last committed batch") {
    val s = java.nio.file.Files.createTempDirectory("ttl-guard").toString
    writeBatch(s, 0, Seq(1L))
    writeBatch(s, 1, Seq(2L))
    val ckpt = java.nio.file.Files.createTempDirectory("ttl-ck").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(ckpt, "commits"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(ckpt, "commits", "0"), "{}")
    val e = intercept[IllegalArgumentException](
      StreamingOps.expireBatches(spark, s, 1L, Some(ckpt)))
    assert(e.getMessage.contains("uncommitted"))
    assert(StreamingOps.expireBatches(spark, s, 0L, Some(ckpt))._1 === 1)
    assert(ids(s) === Seq(2L))
  }
}
