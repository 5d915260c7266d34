package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD2 change-history build (q112). */
class ChangeHistorySpec extends SparkSpec {
  import spark.implicits._

  // (key, ts_us, seq, op, value)
  private def history(rows: (Long, Long, Long, String, Double)*) =
    ChangeHistory.scd2(
      rows.toDF("k", "ts", "seq", "op", "v"),
      key = col("k"), tsMicros = col("ts"), seq = col("seq"),
      op = col("op"), values = Seq("v" -> col("v")))
      .select("key", "change_id", "v", "valid_from_us", "valid_to_us", "is_current")
      .orderBy("key", "valid_from_us", "change_id")
      .as[(Long, Long, Double, Long, Option[Long], Boolean)].collect().toSeq

  test("I/U chain: each version closed by the next, last one current") {
    assert(history(
      (1L, 100L, 1L, "I", 1.0), (1L, 200L, 2L, "U", 2.0), (1L, 300L, 3L, "U", 3.0)) ===
      Seq((1L, 1L, 1.0, 100L, Some(200L), false),
        (1L, 2L, 2.0, 200L, Some(300L), false),
        (1L, 3L, 3.0, 300L, None, true)))
  }

  test("DELETE closes the open version and opens none — no current row") {
    assert(history(
      (1L, 100L, 1L, "I", 1.0), (1L, 200L, 2L, "D", 0.0)) ===
      Seq((1L, 1L, 1.0, 100L, Some(200L), false)))
  }

  test("re-insert after delete opens a fresh current version") {
    assert(history(
      (1L, 100L, 1L, "I", 1.0), (1L, 200L, 2L, "D", 0.0), (1L, 300L, 3L, "I", 9.0)) ===
      Seq((1L, 1L, 1.0, 100L, Some(200L), false),
        (1L, 3L, 9.0, 300L, None, true)))
  }

  test("same-timestamp changes order by the sequence column") {
    assert(history(
      (1L, 100L, 2L, "U", 2.0), (1L, 100L, 1L, "I", 1.0)) ===
      Seq((1L, 1L, 1.0, 100L, Some(100L), false),
        (1L, 2L, 2.0, 100L, None, true)))
  }

  test("keys are independent; single insert is simply current") {
    assert(history((1L, 100L, 1L, "I", 1.0), (2L, 50L, 2L, "I", 5.0)) ===
      Seq((1L, 1L, 1.0, 100L, None, true), (2L, 2L, 5.0, 50L, None, true)))
  }

  test("the only shuffle is the key-partitioned window") {
    val df = Seq((1L, 100L, 1L, "I", 1.0)).toDF("k", "ts", "seq", "op", "v")
    val plan = ChangeHistory.scd2(df, col("k"), col("ts"), col("seq"),
        col("op"), Seq("v" -> col("v")))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 1, plan)
  }
}
