package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming incremental aggregate-view maintenance (the live end of
  * q143): the maintained view must equal the from-scratch aggregate
  * over the materialized state after every run, survive commit-drop
  * crash replay byte-for-value, and GC must keep exactly the
  * commit-aware survivor set. */
class IvmIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("lsn", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))

  private def writeInput(dir: java.nio.file.Path, name: String, mtime: Long,
                         rows: Seq[(String, Long, Long, Long, String, Double)]): Unit = {
    val f = dir.resolve(name)
    val lines = rows.map { case (op, lsn, seq, k, g, v) =>
      s"""{"op":"$op","lsn":$lsn,"seq":$seq,"k":$k,"g":"$g","v":$v}"""
    }
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    assert(f.toFile.setLastModified(mtime))
  }

  // batch 0: three inserts across two groups
  private val b0 = Seq(
    ("I", 100L, 1L, 1L, "a", 1.0), ("I", 110L, 2L, 2L, "a", 2.0),
    ("I", 120L, 3L, 3L, "b", 3.0))
  // batch 1: key 1 moves group a->b with a new value, key 2 deleted,
  // key 4 inserted into a, key 3 re-valued in place
  private val b1 = Seq(
    ("U", 200L, 4L, 1L, "b", 10.0), ("D", 210L, 5L, 2L, "a", 0.0),
    ("I", 220L, 6L, 4L, "a", 7.0), ("U", 230L, 7L, 3L, "b", 4.0))

  private def viewRows(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "n_rows", "n_val", "sum_val")
      .as[(String, Long, Long, Double)].collect().sorted.toSeq

  test("ivmIngestToStore: view == recompute after every run; crash replay idempotent; GC commit-aware") {
    val inDir = java.nio.file.Files.createTempDirectory("ivm-in")
    val store = java.nio.file.Files.createTempDirectory("ivm-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivm-ck").toString
    val t0 = System.currentTimeMillis() - 60000
    writeInput(inDir, "0.json", t0, b0)
    writeInput(inDir, "1.json", t0 + 30000, b1)

    def run(): Unit = {
      val changes = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(inDir.toString)
      val q = StreamingOps.ivmIngestToStore(changes, store, ckpt,
        rowKeys = Seq("k"), groupKeys = Seq("g"), valueCol = "v")
      q.processAllAvailable()
      q.stop()
    }
    run()

    val view = StreamingOps.readIvmView(spark, store).get
    val base = StreamingOps.readIvmBase(spark, store).get
    // expected final state: k1 (b,10), k3 (b,4), k4 (a,7); k2 gone
    assert(viewRows(view) === Seq(("a", 1L, 1L, 7.0), ("b", 2L, 2L, 14.0)))
    // the view equals the from-scratch aggregate over the base
    val recomputed = base.groupBy("g")
      .agg(count(lit(1)).as("n_rows"), count(col("v")).as("n_val"),
        sum(coalesce(col("v"), lit(0.0))).as("sum_val"))
    assert(viewRows(view) === viewRows(recomputed))

    // crash after the batch-1 writes but before its checkpoint commit:
    // the replay reads snapshots < 1 and must reproduce identical values
    val before = viewRows(view)
    assert(java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", "1")))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))
    run()
    assert(viewRows(StreamingOps.readIvmView(spark, store).get) === before)
    assert(viewRows(StreamingOps.readIvmView(spark, store).get) ===
      viewRows(StreamingOps.readIvmBase(spark, store).get.groupBy("g")
        .agg(count(lit(1)).as("n_rows"), count(col("v")).as("n_val"),
          sum(coalesce(col("v"), lit(0.0))).as("sum_val"))))

    // GC: both areas hold snapshots 0 and 1; the commit-aware rule
    // keeps the newest at-or-below the last committed batch (1) —
    // snapshot 0 goes in each area
    val removed = StreamingOps.gcIvmSnapshots(store, Some(ckpt))
    assert(removed === 2)
    val left = graft.operators.Fs.listDirNames(graft.operators.Fs.path(s"$store/view"))
      .filter(_.startsWith(s"${StreamingOps.IngestBatchCol}="))
    assert(left === Seq(s"${StreamingOps.IngestBatchCol}=1"))
    // reads still serve the surviving snapshot
    assert(viewRows(StreamingOps.readIvmView(spark, store).get) === before)
  }

  test("quantileIngestToStore: insert-monotone sketches fold per batch; replay idempotent") {
    val inDir = java.nio.file.Files.createTempDirectory("qv-in")
    val store = java.nio.file.Files.createTempDirectory("qv-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("qv-ck").toString
    val t0 = System.currentTimeMillis() - 60000
    writeInput(inDir, "0.json", t0, b0)
    writeInput(inDir, "1.json", t0 + 30000, b1)
    def run(): Unit = {
      val changes = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(inDir.toString)
      val q = StreamingOps.quantileIngestToStore(changes, store, ckpt,
        groupKeys = Seq("g"), valueCol = "v", quantiles = Seq(0.5 -> "p50"))
      q.processAllAvailable()
      q.stop()
    }
    run()
    def rows() = StreamingOps.readIvmView(spark, store).get
      .select("g", "n_val", "p50")
      .as[(String, Long, Double)].collect().sorted.toSeq
    // insert-monotone: every I/U value ever seen contributes, deletes
    // don't retract — a: 1,2,7 (p50=2); b: 3,10,4 (p50=4)
    val got = rows()
    assert(got === Seq(("a", 3L, 2.0), ("b", 3L, 4.0)))
    // crash after batch-1 writes, before its commit: replay reproduces
    assert(java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", "1")))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))
    run()
    assert(rows() === got)
  }
}
