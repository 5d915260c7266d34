package graft

import org.apache.spark.sql.SparkSession

/** Dev timing harness: time named queries in isolation with the Bench
  * protocol (1 warmup + median of 5, collect() action, Storage drained
  * between iterations) without paying for the full sweep. Usage:
  *
  *   sbt "runMain graft.TimeOne /root/testdata/sf0.1 q68_curate q72_bigram_nll"
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeOne <sfDir> <query>...")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions) // lifecycle SQL
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "64m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries(name)
      def one(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        val t = (System.nanoTime() - t0) / 1e9
        graft.operators.Storage.releaseAll(blocking = true)
        t
      }
      one() // warmup
      val ts = Seq.fill(5)(one())
      println(f"$name%-22s med=${ts.sorted.apply(2)}%.3f min=${ts.min}%.3f max=${ts.max}%.3f")
    }
    spark.stop()
  }
}
