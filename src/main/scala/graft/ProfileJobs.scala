package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only: job-level timing of a named query (usage: runMain graft.ProfileJobs <sfDir> <query>). */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val query = if (args.length > 1) args(1) else "q68_curate"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = js.stageInfos.map(_.name.takeWhile(_ != ' ')).distinct.mkString("|")
        starts.put(js.jobId, (System.nanoTime(), desc.take(120)))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, d) =>
          log.add(f"job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $d")
        }
      }
    })

    val fn = SparkEntry.queries(query)
    (1 to 3).foreach { it =>
      log.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).collect()
      val total = (System.nanoTime() - t0) / 1e9
      graft.operators.Storage.releaseAll(blocking = true)
      Thread.sleep(500)
      println(s"--- iteration $it  total=$total")
      log.forEach(l => println("  " + l))
    }
    spark.stop()
  }
}
