package graft.operators

object Q141Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.put(si.stageId, (si.numTasks,
          si.taskMetrics.executorRunTime,
          si.taskMetrics.shuffleWriteMetrics.recordsWritten))
      }
    })
    val t0 = System.nanoTime()
    val df = graft.queries.PipelineQueries.q141HardNegatives(spark, "/tmp/sf1")
    val n = df.collect().length
    println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.1f s")
    Thread.sleep(1000)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_._2._2).take(8).foreach { case (id, (nt, rt, recs)) =>
      println(f"stage=$id tasks=$nt runTimeMs=$rt shuffleRecs=$recs")
    }
    spark.stop()
  }
}
