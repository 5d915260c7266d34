package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import graft.{SparkSpec, Tables}

/** Timestamp-type portability regression (r9 postmortem): the driver's
  * testdata switched `events.ts` from TIMESTAMP(NANOS) to plain
  * `timestamp[us]` parquet (TIMESTAMP_NTZ in Spark) and three queries
  * hard-failed analysis (`unix_micros`/`CAST AS DOUBLE` reject NTZ).
  * This spec materializes the SAME events data in all three wire
  * flavors an engine meets in the wild —
  *   (a) instant-semantics LTZ (`isAdjustedToUTC=true`),
  *   (b) naive `timestamp[us]` NTZ (what the driver now writes),
  *   (c) legacy raw-nanos int64 (what it wrote before; read back as
  *       LongType under `nanosAsLong` and normalized by Tables.load) —
  * and asserts every ts-touching query returns IDENTICAL rows on each.
  * The session timezone is pinned UTC, so all three denote the same
  * instants and any divergence is a portability bug, not semantics. */
class TimestampFlavorSpec extends SparkSpec {

  private val tsQueries = Seq(
    "q10_asof_latest", "q15_analytic_frame", "q19_date_fns",
    "q23_tumbling_window", "q38_sessionize", "q40_asof_join",
    "q75_funnel", "q76_retention")

  private lazy val flavorDirs: Map[String, String] = {
    val base = Files.createTempDirectory("ts_flavor").toString
    val events = Tables.load(spark, sfDir, "events") // normalized LTZ
    assert(events.schema("ts").dataType == TimestampType,
      "Tables.load must hand every query an LTZ ts")
    val flavors = Map(
      "ltz" -> events.withColumn("ts", col("ts").cast(TimestampType)),
      "ntz" -> events.withColumn("ts", col("ts").cast(TimestampNTZType)),
      // epoch nanos as int64 — exactly what nanosAsLong yields reading
      // the old TIMESTAMP(NANOS) files (Tables.load divs back to micros)
      "nanos_long" -> events.withColumn(
        "ts", (Tables.epochMicros(col("ts")) * 1000L).cast(LongType)))
    flavors.map { case (flavor, df) =>
      val dir = s"$base/$flavor"
      Files.createDirectories(Paths.get(dir))
      df.coalesce(1).write.parquet(s"$dir/events.parquet")
      // the ts queries also touch dimension/fact tables: link them in
      Tables.names.filter(_ != "events").foreach { t =>
        Files.createSymbolicLink(
          Paths.get(s"$dir/$t.parquet"), Paths.get(s"$sfDir/$t.parquet"))
      }
      flavor -> dir
    }
  }

  test("written flavors round-trip to the three distinct Spark types") {
    val raw = spark.read.parquet(s"${flavorDirs("ntz")}/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)
    val rawL = spark.read.parquet(s"${flavorDirs("ltz")}/events.parquet")
    assert(rawL.schema("ts").dataType == TimestampType)
    val rawN = spark.read.parquet(s"${flavorDirs("nanos_long")}/events.parquet")
    assert(rawN.schema("ts").dataType == LongType)
  }

  test("Tables.load normalizes every flavor to LTZ") {
    flavorDirs.foreach { case (flavor, dir) =>
      val dt = Tables.load(spark, dir, "events").schema("ts").dataType
      assert(dt == TimestampType, s"flavor $flavor loaded as $dt")
    }
  }

  test("ts range filters push to the parquet scan THROUGH the NTZ normalization cast") {
    // the boundary cast must not cost pushdown: Catalyst rewrites
    // `cast(ts_ntz as ltz) < lit` to an NTZ-level comparison (the cast is
    // monotonic under the fixed session zone), so the scan still prunes
    // row groups on ts. A regression here reads 100% of a 100 TB fact
    // table for a one-day query — worth a tripwire.
    import org.apache.spark.sql.functions.{col, lit}
    val plan = Tables.load(spark, flavorDirs("ntz"), "events")
      .filter(col("ts") < lit("2024-01-10 00:00:00").cast("timestamp"))
      .select("event_id", "ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), LessThan(ts"),
      s"ts filter must reach the scan:\n$plan")
  }

  for (q <- tsQueries) test(s"$q identical across ts flavors") {
    val fn = graft.SparkEntry.queries(q)
    val results = flavorDirs.map { case (flavor, dir) =>
      flavor -> fn(spark, dir).collect().map(_.toString).sorted.toSeq
    }
    val ref = results("ltz")
    assert(ref.nonEmpty, s"$q returned no rows")
    results.foreach { case (flavor, rows) =>
      assert(rows == ref, s"$q differs on flavor $flavor")
    }
  }
}
