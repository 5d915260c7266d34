package graft

import org.apache.spark.sql.SparkSession

object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"--- $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("scratch").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val emb = Tables.load(spark, dir, "embeddings")
    time("q26 warmup") { operators.Similarity.cosineTopK(emb, 0L, 10).collect() }
    time("q26 vec_dot") { operators.Similarity.cosineTopK(emb, 0L, 10).collect() }
    time("q36 lsh warm") { operators.Similarity.lshTopK(emb, 0L, 10).collect() }
    time("q36 lsh") { operators.Similarity.lshTopK(emb, 0L, 10).collect() }
    // codegen confirmation
    val plan = operators.Similarity.cosineTopK(emb, 0L, 10).queryExecution.executedPlan.toString
    println("--- vec_dot in codegen stage: " + plan.contains("vec_dot"))
    spark.stop()
  }
}
