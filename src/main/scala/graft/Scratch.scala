package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val wh = Files.createTempDirectory("wh").toString
    val orders = Tables.load(spark, dir, "orders").withColumnRenamed("o_orderkey", "okey")
    val lineitem = Tables.load(spark, dir, "lineitem").withColumnRenamed("l_orderkey", "okey")
    operators.Layout.writeBucketed(orders, "b_orders", "okey", 4, Some(wh))
    operators.Layout.writeBucketed(lineitem, "b_lineitem", "okey", 4, Some(wh))
    val j = operators.Layout.coLocatedJoin(spark, "b_orders", "b_lineitem", "okey")
      .groupBy("okey").agg(count(lit(1)).as("n"))
    val plan = j.queryExecution.executedPlan.toString
    println("--- exchanges in bucketed join plan: " + "Exchange".r.findAllIn(plan).length)
    println("--- joined rows: " + j.agg(sum("n")).collect()(0).getLong(0))
    val salted = operators.Layout.saltedJoin(lineitem,
      Tables.load(spark, dir, "part").select(col("p_partkey").as("l_partkey"), col("p_brand")),
      "l_partkey", 4)
    println("--- salted join rows: " + salted.count())
    spark.stop()
  }
}
