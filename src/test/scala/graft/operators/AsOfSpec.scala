package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("as-of join attaches the latest right row at-or-before each left row") {
    val left = Seq(
      (1L, ts(5), "p1"), (1L, ts(10), "p2"), (1L, ts(1), "p0"),
      (2L, ts(7), "q1")).toDF("k", "ts", "name")
    val right = Seq(
      (1L, ts(2), 100L), (1L, ts(5), 200L), (1L, ts(9), 300L),
      (3L, ts(1), 999L)).toDF("k", "ts", "state")
    val out = AsOf.joinLatest(left, right, Seq("k"), "ts", Seq("state"))
      .orderBy("k", "ts").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("name"), r.getAs[Any]("asof_state")))
    assert(out.toSeq === Seq(
      (1L, "p0", null), // nothing at or before 10:01
      (1L, "p1", 200L), // simultaneous right row (10:05) is visible
      (1L, "p2", 300L), // latest before 10:10
      (2L, "q1", null))) // key with no right rows at all
  }

  test("a matched right row with SQL NULL payload yields NULL, not an older value") {
    val left = Seq((1L, ts(10), "p")).toDF("k", "ts", "name")
    val right = Seq(
      (1L, ts(2), Some(100L)),
      (1L, ts(5), Option.empty[Long])) // the as-of match, payload legitimately NULL
      .toDF("k", "ts", "state")
    val out = AsOf.joinLatest(left, right, Seq("k"), "ts", Seq("state")).collect()
    assert(out.length === 1)
    // DuckDB ASOF contract: the 10:05 row matches; its NULL must survive,
    // not be skipped in favor of the older 100
    assert(out(0).isNullAt(out(0).fieldIndex("asof_state")))
  }

  test("ties among right rows at identical (key, ts) resolve deterministically") {
    val left = Seq((1L, ts(9), "p")).toDF("k", "ts", "name")
    val right = Seq((1L, ts(5), 10L), (1L, ts(5), 30L), (1L, ts(5), 20L))
      .toDF("k", "ts", "state")
    val results = (1 to 5).map { _ =>
      AsOf.joinLatest(left, right, Seq("k"), "ts", Seq("state"))
        .collect()(0).getAs[Long]("asof_state")
    }
    // struct-greatest payload wins, every time
    assert(results.distinct === Seq(30L))
  }
}
