package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.ScalaUDF

/** Plan introspection shared by the test suite and the bench harness.
  *
  * The dedup operators' scale contract is that every per-document kernel
  * (shingling, minhash banding, simhash) executes exactly once per query.
  * Since round 3 that property is structural — fan-out points are
  * materialized (eager local checkpoint) and candidate pairs are expanded
  * by grouping the inverted index instead of self-joining it — so it can
  * be VERIFIED by counting kernel invocation sites in the optimized plan:
  * a kernel that appears in N branches of the plan tree runs N times.
  * The bench emits these counts per round so a regression (e.g. someone
  * reintroducing a self-join over a signature subtree) is visible in the
  * benchmark artifact itself, not just in a slower number.
  */
object PlanAudit {

  /** Number of ScalaUDF invocation sites in the optimized logical plan.
    * Materialized kernels contribute ZERO (they already ran; the plan
    * reads their checkpointed blocks); a live kernel should contribute
    * exactly one site. */
  def scalaUdfSites(df: DataFrame): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case _: ScalaUDF => n += 1
        case _ => ()
      })
    }
    n
  }
}
