package graft

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("scratch").master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val df = queries.CoreQueries.q13Rollup(spark, dir)
    df.show(10)
    println("--- rows: " + df.count())
    spark.stop()
  }
}
