package graft

import org.apache.spark.sql.SparkSession

/** Explain audit: dump formatted plans of representative queries and grep
  * for the plan features the scale posture demands. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def audit(name: String, df: org.apache.spark.sql.DataFrame, expect: Seq[String]): Unit = {
      val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      println(s"=== $name")
      expect.foreach { e =>
        println(s"  ${if (plan.contains(e)) "OK  " else "MISS"} $e")
      }
      if (args.contains("-v")) println(plan)
    }
    audit("q01 pushdown", queries.CoreQueries.q01FilterProject(spark, dir),
      Seq("PushedFilters: [IsNotNull(l_returnflag), IsNotNull(l_quantity), EqualTo(l_returnflag,R), GreaterThan(l_quantity,45.0)]",
        "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double"))
    audit("q03 ts pushdown + partial agg", queries.CoreQueries.q03PricingSummary(spark, dir),
      Seq("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate,", "HashAggregate", "WholeStageCodegen"))
    audit("q05 broadcast dims", queries.CoreQueries.q05JoinAgg(spark, dir),
      Seq("BroadcastHashJoin", "BroadcastExchange"))
    audit("q16 top-k", queries.CoreQueries.q16TopK(spark, dir),
      Seq("TakeOrderedAndProject"))
    audit("q08 anti join", queries.CoreQueries.q08AntiJoin(spark, dir),
      Seq("LeftAnti"))
    audit("q09 theta residual stays hash join", queries.CoreQueries.q09ThetaResidual(spark, dir),
      Seq("Join condition: (l_quantity", "HashJoin"))
    audit("q25 dedup partial agg", queries.CoreQueries.q25DedupExact(spark, dir),
      Seq("HashAggregate", "WholeStageCodegen"))
    spark.stop()
  }
}
