package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SinksSpec extends SparkSpec {

  test("date-partitioned write enables static partition pruning") {
    val out = Files.createTempDirectory("sink").toString + "/events"
    Sinks.writeDatePartitioned(Tables.load(spark, sfDir, "events"), "ts", out)
    val read = spark.read.parquet(out).filter(col("p_date") === "2024-01-02")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(p_date"), plan)
    assert(read.count() > 0)
    // pruned scan reads strictly fewer files than the full table
    val all = spark.read.parquet(out).count()
    assert(read.count() < all)
  }
}
