package graft.cdc

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.ChangeHistory
import graft.sources.ReplayDecode
import graft.wal.{FrameFile, PgOutput, PgOutputEncoder}

/** The IVM family consuming the engine's OWN decoder output end-to-end:
  * a pgoutput WAL fixture (inserts, a group-moving update, a
  * replica-identity-DEFAULT delete carrying only the key, a
  * TOAST-unchanged update) decodes to typed views, and the maintained
  * aggregate and min/max views must equal the from-scratch aggregates
  * over the applyChanges state after EVERY transaction. */
class CdcIvmE2eSpec extends SparkSpec {

  import PgOutput._

  private val rel = RelationMeta(9, "public", "accounts", Vector(
    RelationColumn("k", 20, -1, 0),    // int8
    RelationColumn("g", 1043, -1, 0),  // varchar
    RelationColumn("v", 20, -1, 0)))   // int8

  private def writeFixture(): String = {
    val e = PgOutputEncoder
    val frames: Seq[Array[Byte]] = Seq(
      e.relation(rel),
      e.begin(),
      e.insert(9, Seq(Some("1"), Some("a"), Some("10"))),
      e.insert(9, Seq(Some("2"), Some("a"), Some("20"))),
      e.insert(9, Seq(Some("3"), Some("b"), Some("30"))),
      e.commit(),
      e.begin(),
      // key 1 moves a -> b (the cross-group retraction path)
      e.update(9, Seq(Some("1"), Some("b"), Some("15"))),
      // replica identity DEFAULT delete: only the key arrives
      e.delete(9, Seq(Some("2"), None, None)),
      // TOAST: key 3's g and v arrive UNCHANGED — resolve from base
      e.update(9, Seq(Some("3"), Some("ignored"), Some("0")), unchanged = Set(1, 2)),
      e.commit())
    val path = Files.createTempDirectory("cdc-ivm").resolve("wal0.frames").toString
    FrameFile.write(path, frames.zipWithIndex.map { case (f, i) => (300L + i, f) })
    path
  }

  test("maintained agg + min/max views track the decoded CDC stream exactly") {
    import spark.implicits._
    val typed = Envelope.typedView(ReplayDecode.batchDf(spark, writeFixture()), rel)
    val txids = typed.select("txid").distinct().orderBy("txid")
      .as[Long].collect().toSeq
    assert(txids.size === 2)
    var base = Seq.empty[(Long, String, Long)].toDF("k", "g", "v")
    var agg: Option[DataFrame] = None
    var mm: Option[DataFrame] = None
    txids.foreach { tx =>
      val batch = typed.filter(col("txid") === tx)
      val newBase = Envelope.applyChanges(base, batch, Seq("k"))
      agg = Some(ChangeHistory.maintainAggView(agg, base, batch,
        rowKeys = Seq("k"), groupKeys = Seq("g"), valueCol = "v"))
      mm = Some(ChangeHistory.maintainMinMaxView(mm, base, newBase, batch,
        rowKeys = Seq("k"), groupKeys = Seq("g"), valueCol = "v"))
      base = newBase
      // the invariant after every decoded transaction
      val wantAgg = base.groupBy("g").agg(count(lit(1)).as("n_rows"),
          count(col("v")).as("n_val"), sum(coalesce(col("v"), lit(0L))).as("sum_val"))
        .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      val gotAgg = agg.get.select("g", "n_rows", "n_val", "sum_val")
        .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(gotAgg === wantAgg)
      val wantMm = base.groupBy("g").agg(count(lit(1)).as("n_rows"),
          min(col("v")).as("min_val"), max(col("v")).as("max_val"))
        .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      val gotMm = mm.get.select("g", "n_rows", "min_val", "max_val")
        .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(gotMm === wantMm)
    }
    // final state: k1 (b, 15), k3 (b, 30 — TOAST-resolved, NOT zeroed);
    // k2 gone; group a vanished
    assert(agg.get.select("g", "n_rows", "n_val", "sum_val")
      .as[(String, Long, Long, Long)].collect().toSeq === Seq(("b", 2L, 2L, 45L)))
    assert(mm.get.select("g", "n_rows", "min_val", "max_val")
      .as[(String, Long, Long, Long)].collect().toSeq === Seq(("b", 2L, 15L, 30L)))
  }

  test("maintained quantile view tracks the decoded stream (insert-monotone)") {
    import spark.implicits._
    val typed = Envelope.typedView(ReplayDecode.batchDf(spark, writeFixture()), rel)
    val txids = typed.select("txid").distinct().orderBy("txid")
      .as[Long].collect().toSeq
    var qv: Option[DataFrame] = None
    txids.foreach { tx =>
      val batch = typed.filter(col("txid") === tx)
      qv = Some(ChangeHistory.maintainQuantileView(qv, batch,
        groupKeys = Seq("g"), valueCol = "v", quantiles = Seq(0.5 -> "p50")))
    }
    // insert-monotone: every I/U value ever seen contributes; deletes
    // and TOAST-unchanged sentinels do not. Stream values per group:
    //   a: 10 (k1 I), 20 (k2 I)      — the later moves/deletes don't retract
    //   b: 30 (k3 I), 15 (k1 U->b)   (k3's TOAST update carries v
    //                                 UNCHANGED -> typedView nulls it -> skipped)
    val got = qv.get.select("g", "n_val", "p50")
      .as[(String, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got.map(t => (t._1, t._2)) === Seq(("a", 2L), ("b", 2L)))
    // GK at eps=0.01 over 2 values returns an exact element
    assert(Seq(10.0, 20.0).contains(got(0)._3))
    assert(Seq(15.0, 30.0).contains(got(1)._3))
  }
}
