package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types.TimestampType
import graft.{SparkSpec, Tables}

/** Multi-format ingest (VERDICT r9 missing #5): the catalog accepts
  * orc/csv/json table drops through the same `Tables.load` path as
  * parquet, with identical boundary normalization of `ts` — csv
  * arrives via schema inference (TIMESTAMP_NTZ or LTZ by conf), json
  * has no timestamp wire type at all (ISO strings). Every format must
  * load to the same rows and drive the same query results. */
class MultiFormatSpec extends SparkSpec {

  private val formats = Seq("orc", "csv", "json")

  private lazy val dirs: Map[String, String] = {
    val base = Files.createTempDirectory("multifmt").toString
    val events = Tables.load(spark, sfDir, "events")
    formats.map { fmt =>
      val dir = s"$base/$fmt"
      Files.createDirectories(Paths.get(dir))
      // write micros-preserving text (the default writer format truncates
      // to millis); on read the millis-only default parser rejects these,
      // so inference lands ts on STRING and normalizeTs parses it exactly
      val w = events.coalesce(1).write
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      fmt match {
        case "orc"  => w.orc(s"$dir/events.orc")
        case "csv"  => w.option("header", "true").csv(s"$dir/events.csv")
        case "json" => w.json(s"$dir/events.json")
      }
      Tables.names.filter(_ != "events").foreach { t =>
        Files.createSymbolicLink(
          Paths.get(s"$dir/$t.parquet"), Paths.get(s"$sfDir/$t.parquet"))
      }
      fmt -> dir
    }.toMap
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toString).sorted.toSeq
  }

  for (fmt <- formats) {
    test(s"$fmt events load to the same normalized rows as parquet") {
      val viaFmt = Tables.load(spark, dirs(fmt), "events")
      assert(viaFmt.schema("ts").dataType == TimestampType,
        s"$fmt ts must normalize to LTZ")
      assert(canon(viaFmt) == canon(Tables.load(spark, sfDir, "events")))
    }
  }

  test("a query runs identically over a csv-backed events table") {
    val fn = graft.SparkEntry.queries("q38_sessionize")
    val viaCsv = fn(spark, dirs("csv")).collect().map(_.toString).sorted.toSeq
    val viaPq = fn(spark, sfDir).collect().map(_.toString).sorted.toSeq
    assert(viaCsv.nonEmpty && viaCsv == viaPq)
  }

  test("loadAs with an explicit schema skips csv inference") {
    val schema = Tables.load(spark, sfDir, "events").schema
    val df = Tables.loadAs(spark, s"${dirs("csv")}/events.csv", "csv", Some(schema))
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() == Tables.load(spark, sfDir, "events").count())
  }

  test("unknown format is rejected with the format list") {
    val e = intercept[IllegalArgumentException] {
      Tables.loadAs(spark, "/nope", "avroish")
    }
    assert(e.getMessage.contains("parquet/orc/csv/json"))
  }
}
