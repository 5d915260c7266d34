package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row with
  * right.ts <= left.ts within the same key — the time-series join Spark
  * SQL lacks natively (SURVEY.md §2.B "Joins — as-of/interval").
  *
  * Implementation is the union-window technique: tag both inputs, union,
  * and carry the last non-null right payload forward over a per-key
  * (ts, tag) ordering. ONE shuffle on the key (the window), no range
  * explosion, no nested-loop — survives arbitrarily large inputs as long
  * as single keys fit a partition's window frame streaming (Spark windows
  * stream rows; state is O(payload), not O(rows)). Ties (right.ts ==
  * left.ts) resolve right-before-left, i.e. an exactly-simultaneous
  * right row IS visible to the left row, matching DuckDB ASOF JOIN's
  * `left.ts >= right.ts` contract. */
object AsOf {

  /** @param left       rows to enrich
    * @param right      timeline of states/events to join as-of
    * @param keys       equi-join key columns (both sides)
    * @param ts         event-time column name (both sides)
    * @param payload    right-side columns to attach (null when no right
    *                   row precedes the left row) */
  def joinLatest(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
                 payload: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val leftCols = left.columns.toSeq
    // The whole payload travels as ONE struct with a constant marker field:
    // the struct of a right row is non-null even when every payload VALUE
    // is SQL NULL, so last(ignoreNulls) carries the matched row's NULLs
    // instead of skipping to an older non-null value (DuckDB ASOF
    // contract). Left rows carry a null struct (skipped by ignoreNulls).
    val pstruct = struct(lit(1).as("__m") +: payload.map(c => col(c).as(s"__p_$c")): _*)
    // tag: right=0 sorts before left=1 at equal ts -> simultaneous rows visible
    val taggedRight = right.select(
      keyCols ++ Seq(col(ts), lit(0).as("__tag"), pstruct.as("__ps")) ++
        leftCols.filterNot(keys.contains).filterNot(_ == ts).map(c => lit(null).as(c)): _*)
    val psType = taggedRight.schema("__ps").dataType
    val taggedLeft = left.select(
      keyCols ++ Seq(col(ts), lit(1).as("__tag"), lit(null).cast(psType).as("__ps")) ++
        leftCols.filterNot(keys.contains).filterNot(_ == ts).map(col): _*)
    // Final __ps sort key: among right rows at identical (key, ts) the
    // struct-greatest payload wins deterministically (was: union order).
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(ts).asc, col("__tag").asc, col("__ps").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__ps", last(col("__ps"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col("__ps").getField(s"__p_$c").as(s"asof_$c")): _*)
  }
}
