package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental distinct-count view over persisted HLL sketches (q144;
  * the Druid/Pinot sketch-rollup pattern). Distinct-EVER semantics:
  * union only, deletes never retract. */
class DistinctViewSpec extends SparkSpec {
  import spark.implicits._

  // (op, lsn, k, g, u)
  private def batch(rows: (String, Long, Long, String, java.lang.Long)*) =
    rows.toDF("op", "lsn", "k", "g", "u")

  private def est(v: DataFrame): Map[String, Long] =
    v.select("g", "uniques").collect()
      .map(r => (Option(r.getString(0)).getOrElse("<null>"), r.getLong(1))).toMap

  private def fold(v: Option[DataFrame], b: DataFrame): DataFrame =
    ChangeHistory.maintainDistinctView(v, b, Seq("g"), "u")

  test("small cardinality is exact; duplicate values across batches never double-count") {
    val v1 = fold(None, batch(
      ("I", 1L, 1L, "a", 10L), ("I", 2L, 2L, "a", 11L), ("I", 3L, 3L, "b", 10L)))
    assert(est(v1) === Map("a" -> 2L, "b" -> 1L))
    val v2 = fold(Some(v1), batch(
      ("I", 10L, 4L, "a", 10L), // already-seen value: no growth
      ("I", 11L, 5L, "a", 12L), ("I", 12L, 6L, "c", 7L)))
    assert(est(v2) === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("deletes and truncate do not retract — distinct-ever semantics") {
    val v1 = fold(None, batch(("I", 1L, 1L, "a", 10L), ("I", 2L, 2L, "a", 11L)))
    val v2 = fold(Some(v1), batch(("D", 10L, 1L, "a", 10L), ("T", 11L, 0L, "a", null)))
    assert(est(v2) === Map("a" -> 2L))
  }

  test("NULL values contribute nothing; NULL group key is a group") {
    val v = fold(None, batch(
      ("I", 1L, 1L, "a", null), ("I", 2L, 2L, null, 5L), ("I", 3L, 3L, null, 6L)))
    assert(est(v) === Map("<null>" -> 2L))
  }

  test("chained maintenance equals the one-shot sketch; 10k cardinality within rsd") {
    val rows = spark.range(10000)
      .select(lit("I").as("op"), col("id").as("lsn"), col("id").as("k"),
        concat(lit("g"), pmod(col("id"), lit(2))).as("g"),
        // ~5000 distinct users per group
        (col("id") % 5000L).as("u"))
    val parts = (0 to 2).map(i => rows.filter(pmod(col("k"), lit(3)) === i))
    val chained = parts.foldLeft(Option.empty[DataFrame])((v, b) => Some(fold(v, b))).get
    val oneShot = fold(None, rows)
    assert(est(chained) === est(oneShot))
    est(chained).foreach { case (g, n) =>
      assert(math.abs(n - 2500L) <= 75, s"$g estimate $n vs exact 2500")
    }
  }

  test("the view is persistable bytes: parquet roundtrip mid-chain changes nothing") {
    val b1 = batch(("I", 1L, 1L, "a", 10L), ("I", 2L, 2L, "b", 20L))
    val b2 = batch(("I", 10L, 3L, "a", 11L), ("I", 11L, 4L, "b", 20L))
    val direct = fold(Some(fold(None, b1)), b2)
    val tmp = java.nio.file.Files.createTempDirectory("dv-rt").toString
    fold(None, b1).write.mode("overwrite").parquet(tmp)
    val resumed = fold(Some(spark.read.parquet(tmp)), b2)
    assert(est(resumed) === est(direct))
    Manifests.rmTree(tmp)
  }
}
