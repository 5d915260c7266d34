package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Both exact-percentile tiers must return identical results — the
  * range-partitioned tier exists for groups too large to rank in one
  * task, not for different semantics. */
class PercentilesSpec extends SparkSpec {

  private val qs = Seq(0.5 -> "p50", 0.9 -> "p90")

  test("windowed and range-partitioned tiers agree on the lineitem fixture") {
    val li = Tables.load(spark, sfDirDocs, "lineitem")
    val w = Percentiles.exactWindowed(li, "l_returnflag", "l_extendedprice", qs).collect()
    val r = Percentiles.exactRangePartitioned(li, "l_returnflag", "l_extendedprice", qs).collect()
    assert(w.map(_.toSeq).toSeq === r.map(_.toSeq).toSeq)
    assert(w.nonEmpty)
  }

  test("quantile_cont semantics match Spark's built-in exact percentile on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val df = (1 to 10000).map(_ => (if (rnd.nextBoolean()) "a" else "b", rnd.nextGaussian() * 100))
      .toDF("g", "x")
    val ours = Percentiles.exactWindowed(df, "g", "x", qs)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    val builtin = df.groupBy("g")
      .agg(round(expr("percentile(x, 0.5)"), 2).as("p50"), round(expr("percentile(x, 0.9)"), 2).as("p90"))
      .orderBy("g")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(ours === builtin)
  }

  test("exactAuto dispatches on group size and all tiers agree") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // 2 fat groups + 500 small ones; a tiny giant threshold forces every
    // dispatch branch through the same fixture
    val fat = (1 to 10000).map(i => (if (i % 2 == 0) "a" else "b", rnd.nextDouble() * 100)).toDF("g", "x")
    val small = (1 to 10000).map(i => (s"g${i % 500}", rnd.nextDouble() * 100)).toDF("g", "x")
    for (df <- Seq(fat, small)) {
      val w = Percentiles.exactWindowed(df, "g", "x", qs).collect()
      // giant branch: threshold below the fat group size -> range tier
      val giant = Percentiles.exactAuto(df, "g", "x", qs, giantGroupThreshold = 100).collect()
      // ordinary branch: threshold above the total -> windowed, no pre-scan
      val ord = Percentiles.exactAuto(df, "g", "x", qs, giantGroupThreshold = 1000000).collect()
      for (r <- Seq(giant, ord))
        assert(w.map(_.toSeq).toSeq === r.map(_.toSeq).toSeq)
    }
  }

  test("giant-group tier is key-generic: long and date group keys match the windowed tier") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val longs = (1 to 20000).map(i => (i % 7L, rnd.nextDouble() * 100)).toDF("g", "x")
    val w = Percentiles.exactWindowed(longs, "g", "x", qs).collect()
    val r = Percentiles.exactRangePartitioned(longs, "g", "x", qs).collect()
    assert(w.map(_.toSeq).toSeq === r.map(_.toSeq).toSeq)
    assert(w.length === 7)
    // exactAuto's giant branch must route long keys through the range tier
    val auto = Percentiles.exactAuto(longs, "g", "x", qs, giantGroupThreshold = 100).collect()
    assert(w.map(_.toSeq).toSeq === auto.map(_.toSeq).toSeq)
    // date keys: a non-primitive external type (java.sql.Date) as the
    // broadcast offset-map key
    val dates = (1 to 5000).map(i =>
      (java.sql.Date.valueOf(s"2024-01-0${i % 5 + 1}"), rnd.nextDouble() * 10)).toDF("d", "x")
    val wd = Percentiles.exactWindowed(dates, "d", "x", qs).collect()
    val rd = Percentiles.exactRangePartitioned(dates, "d", "x", qs).collect()
    assert(wd.map(_.toSeq).toSeq === rd.map(_.toSeq).toSeq)
    assert(wd.length === 5)
  }

  test("exactAuto dispatch gate is bounded: the first job never full-scans (VERDICT r7 #3)") {
    import spark.implicits._
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
    val path = java.nio.file.Files.createTempDirectory("pctl-gate").toString
    (1 to 200000).map(i => (s"g${i % 5}", i.toDouble)).toDF("g", "x")
      .repartition(4).write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val readByJob = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    @volatile var firstJob = Int.MaxValue
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        firstJob = math.min(firstJob, js.jobId)
        js.stageIds.foreach(s => stageToJob.put(s, js.jobId))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val job = stageToJob.getOrDefault(sc.stageInfo.stageId, -1)
        readByJob.merge(job, sc.stageInfo.taskMetrics.inputMetrics.recordsRead, _ + _)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // 200k rows, threshold 100: the gate must answer "above threshold"
      // from a limit(101)-bounded count, NOT a 200k-row full scan
      Percentiles.exactAuto(df, "g", "x", qs, giantGroupThreshold = 100).collect()
      val deadline = System.currentTimeMillis() + 10000
      while (!readByJob.containsKey(firstJob) && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      val gateRead = readByJob.getOrDefault(firstJob, -1L)
      assert(gateRead >= 0L, "listener never saw the dispatch job")
      // vectorized-reader batch granularity gives slack; a full scan is 200k
      assert(gateRead < 50000L,
        s"dispatch gate read $gateRead records — looks like a full-scan count")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("tiers agree on a skewed fixture (one giant group, one tiny)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 50000).map(_ => ("big", rnd.nextDouble() * 1000)) ++
      Seq(("tiny", 1.0), ("tiny", 2.0), ("tiny", 3.0))
    val df = rows.toDF("g", "x").repartition(16)
    val w = Percentiles.exactWindowed(df, "g", "x", qs).collect()
    val r = Percentiles.exactRangePartitioned(df, "g", "x", qs).collect()
    assert(w.map(_.toSeq).toSeq === r.map(_.toSeq).toSeq)
    // tiny group sanity: median of {1,2,3} is 2, p90 interpolates to 2.8
    val tiny = w.find(_.getString(0) == "tiny").get
    assert(tiny.getDouble(1) === 2.0)
    assert(tiny.getDouble(2) === 2.8)
  }
}
