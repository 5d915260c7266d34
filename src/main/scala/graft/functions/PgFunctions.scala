package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

import graft.wal.PgArrayLiteral

/** `from_pg_array` UDF family — PG array-literal text → typed Spark
  * arrays, with exact parity to the reference's parser semantics
  * (`PgArrayUtil.java:9-204`, see graft.wal.PgArrayLiteral).
  *
  * These sit at the typed-view boundary (one evaluation per ingested
  * cell, not in analytic hot paths), so a Scala UDF is the right
  * cost/benefit; if a bench ever shows otherwise the promotion path is a
  * codegen Catalyst Expression (SURVEY.md §4.3). NULL in → NULL out,
  * matching `TableColumn.notNull` (`TableColumn.java:55-57`).
  */
object PgFunctions {

  val fromPgLongArray = udf((s: String) =>
    if (s == null) null else PgArrayLiteral.parseLongArray(s))
  val fromPgIntArray = udf((s: String) =>
    if (s == null) null else PgArrayLiteral.parseIntArray(s))
  val fromPgDoubleArray = udf((s: String) =>
    if (s == null) null else PgArrayLiteral.parseDoubleArray(s))
  val fromPgStringArray = udf((s: String) =>
    if (s == null) null else PgArrayLiteral.parseStringArray(s))

  def from_pg_long_array(c: Column): Column = fromPgLongArray(c)
  def from_pg_int_array(c: Column): Column = fromPgIntArray(c)
  def from_pg_double_array(c: Column): Column = fromPgDoubleArray(c)
  def from_pg_string_array(c: Column): Column = fromPgStringArray(c)

  /** SQL-name registration for spark.sql users. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("from_pg_long_array", fromPgLongArray)
    spark.udf.register("from_pg_int_array", fromPgIntArray)
    spark.udf.register("from_pg_double_array", fromPgDoubleArray)
    spark.udf.register("from_pg_string_array", fromPgStringArray)
  }
}
