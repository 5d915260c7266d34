package graft.streaming

import graft.SparkSpec
import graft.operators.Manifests
import org.apache.spark.sql.functions._

/** Store-level data skipping: leaves whose recorded [min, max] cannot
  * satisfy the range are NEVER OPENED (asserted via inputFiles), stats
  * stay conservative through append/compact/takedown, and missing
  * stats always mean must-read. */
class StoreStatsSpec extends SparkSpec {
  import spark.implicits._

  private val bc = StreamingOps.IngestBatchCol

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("store-stats").toString

  /** Three batches with disjoint doc_id ranges — the time-ordered
    * ingest layout where range pruning bites. */
  private def mkStore(p: String): Unit =
    (0 to 2).foreach { b =>
      (b * 100 until (b + 1) * 100)
        .map(i => (i.toLong, s"doc $i", s"src${i % 3}"))
        .toDF("doc_id", "text", "source")
        .write.mode("overwrite").parquet(s"$p/$bc=$b")
    }

  private def filesOf(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.inputFiles.toSet

  test("pruned read opens only overlapping leaves; rows match the full read") {
    val p = tmp()
    mkStore(p)
    val scored = StreamingOps.upkeepStoreStats(spark, p, Seq("doc_id", "source"))
    assert(scored.size === 3)
    val pruned = StreamingOps.readCorpusStorePruned(spark, p,
      Seq(StreamingOps.SkipRange("doc_id", 150, 160))).get
    // only batch 1's files are in the scan
    assert(filesOf(pruned).forall(_.contains(s"$bc=1")), filesOf(pruned))
    // content equality after the row filter (pruning is a pre-filter)
    val want = StreamingOps.readCorpusStore(spark, p).get
      .filter(col("doc_id").between(150, 160)).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(pruned.filter(col("doc_id").between(150, 160)).select("doc_id")
      .as[Long].collect().sorted.toSeq === want && want.size === 11)
    // string stats are recorded too (min_str/max_str populated)
    val sRows = spark.read.parquet(s"$p/${StreamingOps.StatsDir}/${bc}__EQ__0")
      .filter(col("column") === "source").head()
    assert(sRows.getAs[String]("min_str") === "src0" &&
      sRows.getAs[String]("max_str") === "src2")
    Manifests.rmTree(p)
  }

  test("a batch newer than the last upkeep is always read (missing stats = must-read)") {
    val p = tmp()
    mkStore(p)
    StreamingOps.upkeepStoreStats(spark, p, Seq("doc_id"))
    // batch 3 lands AFTER the upkeep — no stats row
    (300 until 400).map(i => (i.toLong, s"doc $i", "srcX"))
      .toDF("doc_id", "text", "source").write.parquet(s"$p/$bc=3")
    val pruned = StreamingOps.readCorpusStorePruned(spark, p,
      Seq(StreamingOps.SkipRange("doc_id", 0, 50))).get
    val fs = filesOf(pruned)
    assert(fs.exists(_.contains(s"$bc=0")) && fs.exists(_.contains(s"$bc=3")))
    assert(!fs.exists(_.contains(s"$bc=1")) && !fs.exists(_.contains(s"$bc=2")))
    Manifests.rmTree(p)
  }

  test("compaction epoch gets its own stats; disjoint epoch is skipped whole") {
    val p = tmp()
    mkStore(p)
    StreamingOps.compactStore(spark, p, uptoBatch = 1L) // batches 0-1 -> epoch
    val scored = StreamingOps.upkeepStoreStats(spark, p, Seq("doc_id"))
    assert(scored.contains("epoch-0") && scored.contains(s"$bc=2"))
    // a range hitting only batch 2 never opens the epoch
    val pruned = StreamingOps.readCorpusStorePruned(spark, p,
      Seq(StreamingOps.SkipRange("doc_id", 250, 260))).get
    assert(filesOf(pruned).forall(_.contains(s"$bc=2")), filesOf(pruned))
    // a range inside the epoch never opens batch 2
    val prunedE = StreamingOps.readCorpusStorePruned(spark, p,
      Seq(StreamingOps.SkipRange("doc_id", 10, 20))).get
    assert(filesOf(prunedE).forall(_.contains("epoch-0")), filesOf(prunedE))
    // upkeep is idempotent and GCs stats of vanished leaves
    assert(StreamingOps.upkeepStoreStats(spark, p, Seq("doc_id")).isEmpty)
    val statNames = graft.operators.Fs.listDirNames(
      graft.operators.Fs.path(s"$p/${StreamingOps.StatsDir}"))
    assert(statNames.toSet === Set("epoch-0", s"${bc}__EQ__2"))
    Manifests.rmTree(p)
  }

  test("takedown leaves bounds conservative: pruned reads stay correct") {
    val p = tmp()
    mkStore(p)
    StreamingOps.upkeepStoreStats(spark, p, Seq("doc_id"))
    // delete the extremes of batch 1 — recorded [100, 199] is now a
    // strict superset of the actual [101, 198]: still safe
    graft.operators.Takedown.deleteFromStore(spark, p, Seq(100L, 199L))
    val pruned = StreamingOps.readCorpusStorePruned(spark, p,
      Seq(StreamingOps.SkipRange("doc_id", 100, 100))).get
    assert(pruned.filter(col("doc_id") === 100L).count() === 0L)
    assert(filesOf(pruned).forall(_.contains(s"$bc=1")))
    Manifests.rmTree(p)
  }

  test("multi-range conjunction prunes on every range; untracked column must-read") {
    val p = tmp()
    mkStore(p)
    StreamingOps.upkeepStoreStats(spark, p, Seq("doc_id"))
    // doc_id range admits batches 0 and 1; an untracked column's range
    // cannot prune anything (no stats for it)
    val pruned = StreamingOps.readCorpusStorePruned(spark, p,
      Seq(StreamingOps.SkipRange("doc_id", 50, 150),
        StreamingOps.SkipRange("n_chars", 0, 1))).get
    val fs = filesOf(pruned)
    assert(fs.exists(_.contains(s"$bc=0")) && fs.exists(_.contains(s"$bc=1")) &&
      !fs.exists(_.contains(s"$bc=2")))
    Manifests.rmTree(p)
  }
}
