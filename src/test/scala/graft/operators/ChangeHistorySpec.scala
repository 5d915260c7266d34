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

  private def merged(histRows: Seq[(Long, Long, Long, String, Double)],
                     batchRows: Seq[(Long, Long, Long, String, Double)]) = {
    val hist = ChangeHistory.scd2(
      histRows.toDF("k", "ts", "seq", "op", "v"),
      key = col("k"), tsMicros = col("ts"), seq = col("seq"),
      op = col("op"), values = Seq("v" -> col("v")))
    ChangeHistory.scd2Merge(hist,
        batchRows.toDF("k", "ts", "seq", "op", "v"),
        key = col("k"), tsMicros = col("ts"), seq = col("seq"),
        op = col("op"), values = Seq("v" -> col("v")))
      .select("key", "change_id", "v", "valid_from_us", "valid_to_us", "is_current")
      .orderBy("key", "valid_from_us", "change_id")
      .as[(Long, Long, Double, Long, Option[Long], Boolean)].collect().toSeq
  }

  test("scd2Merge equals the full rebuild on every split of a mixed stream") {
    // keys exercising every merge path: 1 = open version updated twice
    // in the batch; 2 = deleted by the batch; 3 = untouched; 4 = new in
    // the batch; 5 = deleted in history, re-inserted by the batch
    val stream = Seq(
      (1L, 100L, 1L, "I", 1.0), (2L, 110L, 2L, "I", 2.0),
      (3L, 120L, 3L, "I", 3.0), (5L, 130L, 4L, "I", 5.0),
      (5L, 140L, 5L, "D", 0.0), (1L, 150L, 6L, "U", 1.5),
      // ---- every split point below 200 keeps history < batch ----
      (1L, 200L, 7L, "U", 1.6), (1L, 210L, 8L, "U", 1.7),
      (2L, 220L, 9L, "D", 0.0), (4L, 230L, 10L, "I", 4.0),
      (5L, 240L, 11L, "I", 5.5))
    val full = history(stream: _*)
    for (split <- Seq(160L, 205L, 225L)) {
      val got = merged(stream.filter(_._2 < split), stream.filter(_._2 >= split))
      assert(got === full, s"split at $split diverged from the full rebuild")
    }
  }

  test("scd2Merge: a batch-only run over an empty history is just scd2") {
    val batch = Seq((1L, 100L, 1L, "I", 1.0), (1L, 200L, 2L, "U", 2.0))
    assert(merged(Seq((9L, 10L, 0L, "I", 9.0)), batch)
      .filter(_._1 == 1L) === history(batch: _*))
  }

  test("snapshotAsOf: half-open intervals — visible at change time, gone when superseded") {
    val hist = ChangeHistory.scd2(
      Seq((1L, 100L, 1L, "I", 1.0), (1L, 200L, 2L, "U", 2.0),
        (2L, 150L, 3L, "I", 5.0), (2L, 250L, 4L, "D", 0.0))
        .toDF("k", "ts", "seq", "op", "v"),
      col("k"), col("ts"), col("seq"), col("op"), Seq("v" -> col("v")))
    def at(t: Long): Map[Long, Double] =
      ChangeHistory.snapshotAsOf(hist, t)
        .select("key", "v").as[(Long, Double)].collect().toMap
    assert(at(50L) === Map.empty, "before any change: empty table")
    assert(at(100L) === Map(1L -> 1.0), "visible AT its own change time")
    assert(at(199L) === Map(1L -> 1.0, 2L -> 5.0))
    assert(at(200L) === Map(1L -> 2.0, 2L -> 5.0),
      "superseded version invisible at the instant of the update")
    assert(at(250L) === Map(1L -> 2.0), "the delete removes key 2 at its time")
    assert(at(999L) === Map(1L -> 2.0), "the open version serves forever")
    // row-local: no shuffle beyond the history build itself
    val plan = ChangeHistory.snapshotAsOf(hist, 200L)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 1, plan)
  }

  test("scd2Merge: the history side does not shuffle under the broadcast bound") {
    val hist = ChangeHistory.scd2(
      Seq((1L, 100L, 1L, "I", 1.0)).toDF("k", "ts", "seq", "op", "v"),
      col("k"), col("ts"), col("seq"), col("op"), Seq("v" -> col("v")))
      .localCheckpoint(true)
    val out = ChangeHistory.scd2Merge(hist,
      Seq((1L, 200L, 2L, "U", 2.0)).toDF("k", "ts", "seq", "op", "v"),
      col("k"), col("ts"), col("seq"), col("op"), Seq("v" -> col("v")))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"first-change keys must broadcast into the history join:\n$plan")
  }
}
