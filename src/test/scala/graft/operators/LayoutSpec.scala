package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Layout operators: the assertions inspect the PHYSICAL plan — the
  * point of bucketing is the absence of exchanges, not the row values. */
class LayoutSpec extends SparkSpec {

  test("bucketed tables join and aggregate with zero shuffle exchanges") {
    val wh = Files.createTempDirectory("wh").toString
    val orders = Tables.load(spark, sfDir, "orders")
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    Layout.writeBucketed(orders.withColumnRenamed("o_orderkey", "okey"), "b_orders", "okey", 4, Some(wh))
    Layout.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "okey"), "b_lineitem", "okey", 4, Some(wh))

    val joined = Layout.coLocatedJoin(spark, "b_orders", "b_lineitem", "okey")
      .groupBy("okey").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange"), s"expected exchange-free plan:\n$plan")
    // and it is still correct
    val viaShuffle = orders.join(lineitem, col("o_orderkey") === col("l_orderkey")).count()
    assert(joined.agg(sum("n")).collect()(0).getLong(0) === viaShuffle)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("salted join returns exactly the plain inner-join result") {
    val lineitem = Tables.load(spark, sfDir, "lineitem").limit(2000)
    val part = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val plain = lineitem.join(part, "l_partkey")
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Layout.saltedJoin(lineitem, part, "l_partkey", saltFactor = 4)
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }
}
