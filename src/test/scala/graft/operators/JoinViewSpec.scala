package graft.operators

import graft.SparkSpec
import graft.cdc.Envelope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental join-view maintenance (q146; Blakeley, Larson & Tompa
  * 1986). Invariant: after every batch pair, the maintained view
  * equals the inner join of the two applyChanges-materialized states.
  * Left rows: (k, ck, lv) keyed by k; right rows: (ck, rv) keyed by
  * ck; join on ck. */
class JoinViewSpec extends SparkSpec {
  import spark.implicits._
  import ChangeHistory.IvmSide

  private def lbatch(rows: (String, Long, Long, Long, Long, String)*) =
    rows.toDF("op", "lsn", "seq", "k", "ck", "lv")

  private def rbatch(rows: (String, Long, Long, Long, String)*) =
    rows.toDF("op", "lsn", "seq", "ck", "rv")

  private def emptyL = lbatch().select("k", "ck", "lv")
  private def emptyR = rbatch().select("ck", "rv")

  private def rows(df: DataFrame): Seq[(Long, Long, String, String)] =
    df.select("ck", "k", "lv", "rv").as[(Long, Long, String, String)]
      .collect().toSeq.sorted

  /** Drives batch pairs, asserting view == newL ⋈ newR after each. */
  private def roundtrip(pairs: Seq[(DataFrame, DataFrame)]): DataFrame = {
    var (lb, rb) = (emptyL, emptyR)
    var view: Option[DataFrame] = None
    pairs.foreach { case (bl, br) =>
      val nl = Envelope.applyChanges(lb, bl, Seq("k"))
      val nr = Envelope.applyChanges(rb, br, Seq("ck"))
      view = Some(ChangeHistory.maintainJoinView(view,
        IvmSide(lb, nl, bl, Seq("k")), IvmSide(rb, nr, br, Seq("ck")),
        joinKeys = Seq("ck")))
      lb = nl; rb = nr
      assert(rows(view.get) === rows(nl.join(nr, "ck")))
    }
    view.get
  }

  test("inserts on both sides join; unmatched rows stay out") {
    val v = roundtrip(Seq((
      lbatch(("I", 1L, 0L, 1L, 10L, "a"), ("I", 2L, 0L, 2L, 11L, "b"),
        ("I", 3L, 0L, 3L, 99L, "c")), // ck 99 has no right row
      rbatch(("I", 1L, 0L, 10L, "X"), ("I", 2L, 0L, 11L, "Y"),
        ("I", 3L, 0L, 12L, "Z"))))) // ck 12 has no left row
    assert(rows(v) === Seq((10L, 1L, "a", "X"), (11L, 2L, "b", "Y")))
  }

  test("a right-side delete retracts every joined left row; re-insert restores") {
    val v = roundtrip(Seq(
      (lbatch(("I", 1L, 0L, 1L, 10L, "a"), ("I", 2L, 0L, 2L, 10L, "b")),
        rbatch(("I", 1L, 0L, 10L, "X"))),
      (lbatch(), rbatch(("D", 10L, 0L, 10L, "X"))),
      (lbatch(), rbatch(("I", 20L, 0L, 10L, "X2")))))
    assert(rows(v) === Seq((10L, 1L, "a", "X2"), (10L, 2L, "b", "X2")))
  }

  test("a left UPDATE moving the join key fixes BOTH key groups") {
    val v = roundtrip(Seq(
      (lbatch(("I", 1L, 0L, 1L, 10L, "a"), ("I", 2L, 0L, 2L, 11L, "b")),
        rbatch(("I", 1L, 0L, 10L, "X"), ("I", 2L, 0L, 11L, "Y"))),
      // key 1 moves ck 10 -> 11: its old (10, X) row must go, a new
      // (11, Y) row must appear
      (lbatch(("U", 10L, 0L, 1L, 11L, "a2")), rbatch())))
    assert(rows(v) ===
      Seq((11L, 1L, "a2", "Y"), (11L, 2L, "b", "Y")))
  }

  test("replica-identity-DEFAULT left delete (null join key in the D row) still retracts") {
    val del = Seq(("D", 10L, 0L, 1L, null.asInstanceOf[java.lang.Long], null.asInstanceOf[String]))
      .toDF("op", "lsn", "seq", "k", "ck", "lv")
    val v = roundtrip(Seq(
      (lbatch(("I", 1L, 0L, 1L, 10L, "a"), ("I", 2L, 0L, 2L, 10L, "b")),
        rbatch(("I", 1L, 0L, 10L, "X"))),
      (del, rbatch())))
    assert(rows(v) === Seq((10L, 2L, "b", "X")))
  }

  test("TRUNCATE on the right empties the view until re-inserts arrive") {
    val v = roundtrip(Seq(
      (lbatch(("I", 1L, 0L, 1L, 10L, "a")), rbatch(("I", 1L, 0L, 10L, "X"))),
      (lbatch(), rbatch(("T", 10L, 0L, 0L, null), ("I", 10L, 1L, 10L, "fresh")))))
    assert(rows(v) === Seq((10L, 1L, "a", "fresh")))
  }

  test("value updates on either side refresh the joined row in place") {
    val v = roundtrip(Seq(
      (lbatch(("I", 1L, 0L, 1L, 10L, "a")), rbatch(("I", 1L, 0L, 10L, "X"))),
      (lbatch(("U", 10L, 0L, 1L, 10L, "a9")), rbatch(("U", 10L, 0L, 10L, "X9")))))
    assert(rows(v) === Seq((10L, 1L, "a9", "X9")))
  }

  test("multi-batch churn keeps the invariant on both sides at once") {
    roundtrip(Seq(
      (lbatch(("I", 1L, 0L, 1L, 10L, "a"), ("I", 2L, 0L, 2L, 11L, "b"),
        ("I", 3L, 0L, 3L, 10L, "c")),
        rbatch(("I", 1L, 0L, 10L, "X"), ("I", 2L, 0L, 11L, "Y"))),
      (lbatch(("U", 10L, 0L, 1L, 11L, "a2"), ("D", 11L, 0L, 3L, 10L, "c"),
        ("I", 12L, 0L, 4L, 12L, "d")),
        rbatch(("U", 10L, 0L, 10L, "X2"), ("I", 11L, 0L, 12L, "Z"))),
      (lbatch(("I", 20L, 0L, 5L, 10L, "e")),
        rbatch(("D", 20L, 0L, 11L, "Y")))))
  }
}
