package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line. Protocol per BASELINE.md:
  * 1 warmup + median of 5 timed runs per query (mirrored by
  * tools/bench_duck.py); the action is collect()
  * (all declared queries return small results — aggregates, top-k, or
  * filtered rows — so collect measures full execution without letting
  * Catalyst prune work the way count() would). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // long many-query sessions accumulate shuffle files + broadcasts;
      // frequent periodic GC keeps ContextCleaner work incremental instead
      // of one mid-measurement storm
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).collect()
      (System.nanoTime() - t0) / 1e9
    }

    // _check queries are correctness contracts that deliberately recompute
    // each approximate operator's exact twin — correctness artifacts, not
    // headline throughput; Verify runs them, the bench doesn't.
    val results = SparkEntry.queries.toSeq
      .filterNot(_._1.contains("_check"))
      .sortBy(_._1).map { case (name, fn) =>
      val t = try {
        timeOne(fn) // warmup (JIT + file listing + codegen caches)
        // median of 5: robust to the occasional driver-side cleanup stall
        val runs = Seq.fill(5)(timeOne(fn)).sorted
        runs(2)
      } catch { case _: Throwable => -1.0 }
      // drain cleanup between queries so it doesn't land mid-measurement
      System.gc(); Thread.sleep(300)
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
