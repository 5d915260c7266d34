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
    val sRows = spark.read.parquet(s"$p/${StreamingOps.StatsDir}/leaf=${bc}__EQ__0")
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
    assert(statNames.toSet === Set("leaf=epoch-0", s"leaf=${bc}__EQ__2"))
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

  test("loadStoreStats reads the whole sidecar in ONE Spark job") {
    val p = tmp()
    mkStore(p)
    StreamingOps.upkeepStoreStats(spark, p, Seq("doc_id", "source"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val stats = StreamingOps.loadStoreStats(spark, p)
      // the listener bus is async — wait for the first event, then a
      // grace beat so any SECOND job (which would disprove one-scan)
      // has time to surface
      val deadline = System.currentTimeMillis() + 10000
      while (jobs.get() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      Thread.sleep(500)
      // one collect over the partition-discovered sidecar — NOT one
      // read+collect per leaf (the pre-r17 serving bottleneck:
      // O(leaves) driver round-trips at thousands of batches)
      assert(jobs.get() === 1, s"expected 1 job for 3 leaves, got ${jobs.get()}")
      assert(stats.keySet === Set(s"$bc=0", s"$bc=1", s"$bc=2"))
      assert(stats(s"$bc=1").whole("doc_id").minNum.get === 100.0 &&
        stats(s"$bc=1").whole("doc_id").maxNum.get === 199.0)
      assert(stats(s"$bc=2").whole("source") ===
        StreamingOps.ColStats(None, None, Some("src0"), Some("src2")))
    } finally spark.sparkContext.removeSparkListener(listener)
    Manifests.rmTree(p)
  }

  test("string equality/range skipping through min_str/max_str") {
    val p = tmp()
    // batches with DISJOINT source values — the string-skip regime
    (0 to 2).foreach { b =>
      (0 until 50).map(i => ((b * 50 + i).toLong, s"doc $i", s"src$b"))
        .toDF("doc_id", "text", "source")
        .write.mode("overwrite").parquet(s"$p/$bc=$b")
    }
    StreamingOps.upkeepStoreStats(spark, p, Seq("doc_id", "source"))
    // equality: src1 lives only in batch 1
    val eq = StreamingOps.readCorpusStorePruned(spark, p,
      Seq(StreamingOps.SkipStrRange("source", Some("src1"), Some("src1")))).get
    assert(filesOf(eq).nonEmpty && filesOf(eq).forall(_.contains(s"$bc=1")),
      filesOf(eq))
    assert(eq.filter(col("source") === "src1").count() === 50L)
    // range: source >= 'src2' admits only batch 2
    val ge = StreamingOps.readCorpusStorePruned(spark, p,
      Seq(StreamingOps.SkipStrRange("source", Some("src2"), None))).get
    assert(filesOf(ge).forall(_.contains(s"$bc=2")), filesOf(ge))
    // numeric-only stats on a string predicate = must-read (conservative)
    val pn = tmp()
    (0 to 1).foreach { b =>
      Seq(((b * 10).toLong, s"src$b")).toDF("doc_id", "source")
        .write.parquet(s"$pn/$bc=$b")
    }
    StreamingOps.upkeepStoreStats(spark, pn, Seq("doc_id")) // no source stats
    val all = StreamingOps.readCorpusStorePruned(spark, pn,
      Seq(StreamingOps.SkipStrRange("source", Some("src1"), Some("src1")))).get
    assert(filesOf(all).exists(_.contains(s"$bc=0")) &&
      filesOf(all).exists(_.contains(s"$bc=1")))
    Manifests.rmTree(p); Manifests.rmTree(pn)
  }

  test("clustered epoch skips at FILE granularity; rows never change") {
    val p = tmp()
    mkStore(p) // doc_id 0..299 across three batches
    // compact EVERYTHING, range-clustered on doc_id into ~6 files
    StreamingOps.compactStore(spark, p, uptoBatch = 2L,
      targetFileRows = 50L, clusterBy = Seq("doc_id"))
    StreamingOps.upkeepStoreStats(spark, p, Seq("doc_id", "source"))
    val stats = StreamingOps.loadStoreStats(spark, p)
    val ls = stats("epoch-0")
    assert(ls.perFile.size >= 4, s"expected multiple epoch files, got ${ls.perFile.keySet}")
    // per-file doc_id spans are narrow (clustering) and the whole-leaf
    // rollup brackets them
    assert(ls.whole("doc_id").minNum.get === 0.0 &&
      ls.whole("doc_id").maxNum.get === 299.0)
    assert(ls.perFile.values.forall { m =>
      val c = m("doc_id"); c.maxNum.get - c.minNum.get < 300.0 / 2 })
    // a narrow range opens a strict subset of the epoch's files
    val pruned = StreamingOps.readCorpusStorePruned(spark, p,
      Seq(StreamingOps.SkipRange("doc_id", 150, 160))).get
    val opened = filesOf(pruned)
    assert(opened.nonEmpty && opened.size < ls.perFile.size, opened)
    // and rows are identical to the unpruned read after the row filter
    val want = StreamingOps.readCorpusStore(spark, p).get
      .filter(col("doc_id").between(150, 160)).count()
    assert(pruned.filter(col("doc_id").between(150, 160)).count() === want
      && want === 11L)
    Manifests.rmTree(p)
  }

  test("z-order clustered epoch prunes files on EITHER dimension") {
    val p = tmp()
    // two interleaved dimensions, 32x32 grid
    (0 until 1024).map(i => (i.toLong, (i % 32).toLong, (i / 32).toLong))
      .toDF("doc_id", "dx", "dy")
      .write.parquet(s"$p/$bc=0")
    StreamingOps.compactStore(spark, p, uptoBatch = 0L,
      targetFileRows = 64L, clusterBy = Seq("dx", "dy"))
    StreamingOps.upkeepStoreStats(spark, p, Seq("dx", "dy"))
    val nFiles = StreamingOps.loadStoreStats(spark, p)("epoch-0").perFile.size
    assert(nFiles >= 8)
    def opened(rs: StreamingOps.SkipPred*): Int =
      filesOf(StreamingOps.readCorpusStorePruned(spark, p, rs).get).size
    // a narrow filter on EITHER dimension opens a subset of files —
    // the multi-dimensional pruning single-column sorting cannot give
    assert(opened(StreamingOps.SkipRange("dx", 0, 3)) < nFiles)
    assert(opened(StreamingOps.SkipRange("dy", 0, 3)) < nFiles)
    // correctness: the pruned rows equal the unpruned filter
    val pruned = StreamingOps.readCorpusStorePruned(spark, p,
      Seq(StreamingOps.SkipRange("dx", 0, 3))).get
    assert(pruned.filter(col("dx") <= 3).count() ===
      StreamingOps.readCorpusStore(spark, p).get.filter(col("dx") <= 3).count())
    Manifests.rmTree(p)
  }

  test("takedown on a per-file-scored epoch invalidates its sidecar; reads stay correct") {
    val p = tmp()
    mkStore(p)
    StreamingOps.compactStore(spark, p, uptoBatch = 2L,
      targetFileRows = 50L, clusterBy = Seq("doc_id"))
    StreamingOps.upkeepStoreStats(spark, p, Seq("doc_id"))
    assert(StreamingOps.loadStoreStats(spark, p)("epoch-0").perFile.nonEmpty)
    // takedown swaps the epoch's files under new names
    graft.operators.Takedown.deleteFromStore(spark, p, Seq(155L))
    // the sidecar is gone (stale file names could otherwise be opened
    // or skipped) -> the epoch is must-read until the next upkeep
    assert(!StreamingOps.loadStoreStats(spark, p).contains("epoch-0"))
    val pruned = StreamingOps.readCorpusStorePruned(spark, p,
      Seq(StreamingOps.SkipRange("doc_id", 150, 160))).get
    assert(pruned.filter(col("doc_id").between(150, 160)).count() === 10L)
    // re-upkeep restores file-level skipping over the swapped files
    StreamingOps.upkeepStoreStats(spark, p, Seq("doc_id"))
    val pruned2 = StreamingOps.readCorpusStorePruned(spark, p,
      Seq(StreamingOps.SkipRange("doc_id", 150, 160))).get
    assert(pruned2.filter(col("doc_id").between(150, 160)).count() === 10L)
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
