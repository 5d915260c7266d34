package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time a subset of registered queries (args = query names;
  * no args = all). Same session config + protocol as Bench, for iterating
  * on one operator without paying the full 46-query sweep. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    wanted.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val runs = Seq.fill(5)(once()).sorted
      println(f"BENCHONE $name%-24s median=${runs(2)}%.3f min=${runs.head}%.3f")
    }
    spark.stop()
  }
}
