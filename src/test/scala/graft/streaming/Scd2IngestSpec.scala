package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.ChangeHistory

/** Streaming SCD2 maintenance (the live end of q112/q120): the
  * closed/open two-area store must reproduce a full rebuild of the
  * concatenated change stream, survive crash-replay, and never rewrite
  * a closed version. */
class Scd2IngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))

  private def writeInput(dir: java.nio.file.Path, name: String, mtime: Long,
                         rows: Seq[(Long, Long, Long, String, Double)]): Unit = {
    val f = dir.resolve(name)
    val lines = rows.map { case (k, ts, seq, op, v) =>
      s"""{"k":$k,"ts":$ts,"seq":$seq,"op":"$op","v":$v}"""
    }
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    assert(f.toFile.setLastModified(mtime))
  }

  // batch 0: keys 1 (I+U), 2 (I), 3 (I), 5 (I then D)
  private val b0 = Seq(
    (1L, 100L, 1L, "I", 1.0), (2L, 110L, 2L, "I", 2.0),
    (3L, 120L, 3L, "I", 3.0), (5L, 130L, 4L, "I", 5.0),
    (5L, 140L, 5L, "D", 0.0), (1L, 150L, 6L, "U", 1.5))
  // batch 1: 1 updated twice, 2 deleted, 4 new, 5 re-inserted, 3 untouched
  private val b1 = Seq(
    (1L, 200L, 7L, "U", 1.6), (1L, 210L, 8L, "U", 1.7),
    (2L, 220L, 9L, "D", 0.0), (4L, 230L, 10L, "I", 4.0),
    (5L, 240L, 11L, "I", 5.5))

  private def rebuild = ChangeHistory.scd2(
    (b0 ++ b1).toDF("k", "ts", "seq", "op", "v"),
    key = col("k"), tsMicros = col("ts"), seq = col("seq"),
    op = col("op"), values = Seq("v" -> col("v")))
    .select("key", "change_id", "v", "valid_from_us", "valid_to_us", "is_current")
    .as[(Long, Long, Double, Long, Option[Long], Boolean)].collect().sorted.toSeq

  test("scd2IngestToStore: the store equals a full rebuild; replay idempotent; closed never rewritten") {
    val inDir = java.nio.file.Files.createTempDirectory("scd2-in")
    val store = java.nio.file.Files.createTempDirectory("scd2-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("scd2-ck").toString
    val t0 = System.currentTimeMillis() - 60000
    writeInput(inDir, "0.json", t0, b0)
    writeInput(inDir, "1.json", t0 + 30000, b1)

    def run(): Unit = {
      val changes = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(inDir.toString)
      val q = StreamingOps.scd2IngestToStore(changes, store, ckpt,
        key = col("k"), tsMicros = col("ts"), seq = col("seq"),
        op = col("op"), values = Seq("v" -> col("v")))
      q.processAllAvailable()
      q.stop()
    }
    def storeRows() = StreamingOps.readScd2Store(spark, store).get
      .select("key", "change_id", "v", "valid_from_us", "valid_to_us", "is_current")
      .as[(Long, Long, Double, Long, Option[Long], Boolean)].collect().sorted.toSeq

    run()
    assert(storeRows() === rebuild)

    // closed-area append-only: batch 0's partition holds exactly the
    // versions batch 0 itself could close (key 1's first version, key
    // 5's deleted one); batch 1's holds the versions IT closed — key
    // 1's carried-open version, its own intermediate, and key 2's
    // open version felled by the batch-1 delete
    val closed0 = spark.read
      .parquet(s"$store/closed/${StreamingOps.IngestBatchCol}=0")
      .select("key", "change_id").as[(Long, Long)].collect().sorted.toSeq
    assert(closed0 === Seq((1L, 1L), (5L, 4L)))
    val closed1 = spark.read
      .parquet(s"$store/closed/${StreamingOps.IngestBatchCol}=1")
      .select("key", "change_id").as[(Long, Long)].collect().sorted.toSeq
    assert(closed1 === Seq((1L, 6L), (1L, 7L), (2L, 2L)))

    // crash after batch 1's writes but before its checkpoint commit:
    // the replay reads the open set AS OF < 1 and recomputes identically
    assert(java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", "1")))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))
    run()
    assert(storeRows() === rebuild)

    // crash-state GC safety (ADVICE r13): with batch 1's commit missing
    // the newest snapshot is UNCOMMITTED — commit-aware GC must keep it
    // AND the newest committed one (batch 0, the replay's read target)
    assert(java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", "1")))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))
    assert(StreamingOps.gcScd2OpenSnapshots(store, Some(ckpt)) === 0)
    run() // replay batch 1 — its `< 1` snapshot survived GC
    assert(storeRows() === rebuild)

    // checkpoint-less GC keeps the two newest (conservative bound)
    assert(StreamingOps.gcScd2OpenSnapshots(store) === 0)
    // commit-aware GC: both batches committed -> only the newest
    // snapshot survives, the view is unchanged
    assert(StreamingOps.gcScd2OpenSnapshots(store, Some(ckpt)) === 1)
    assert(storeRows() === rebuild)
  }

  test("readScd2Store: None before any batch; open-only after a closure-free batch") {
    val store = java.nio.file.Files.createTempDirectory("scd2-empty").toString
    assert(StreamingOps.readScd2Store(spark, store).isEmpty)

    val inDir = java.nio.file.Files.createTempDirectory("scd2-in2")
    val ckpt = java.nio.file.Files.createTempDirectory("scd2-ck2").toString
    writeInput(inDir, "0.json", System.currentTimeMillis() - 60000,
      Seq((1L, 100L, 1L, "I", 1.0), (2L, 110L, 2L, "I", 2.0)))
    val changes = spark.readStream.schema(schema).json(inDir.toString)
    val q = StreamingOps.scd2IngestToStore(changes, store, ckpt,
      key = col("k"), tsMicros = col("ts"), seq = col("seq"),
      op = col("op"), values = Seq("v" -> col("v")))
    q.processAllAvailable()
    q.stop()
    val rows = StreamingOps.readScd2Store(spark, store).get
      .select("key", "is_current").as[(Long, Boolean)].collect().sorted.toSeq
    assert(rows === Seq((1L, true), (2L, true)))
  }
}
