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
    // tag: right=0 sorts before left=1 at equal ts -> simultaneous rows visible
    val taggedRight = right.select(
      keyCols ++ Seq(col(ts), lit(0).as("__tag")) ++
        payload.map(c => col(c).as(s"__p_$c")) ++
        leftCols.filterNot(keys.contains).filterNot(_ == ts).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      keyCols ++ Seq(col(ts), lit(1).as("__tag")) ++
        payload.map(c => lit(null).as(s"__p_$c")) ++
        leftCols.filterNot(keys.contains).filterNot(_ == ts).map(col): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(ts).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(taggedRight.unionByName(taggedLeft)) { (df, c) =>
      df.withColumn(s"__p_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__p_$c").as(s"asof_$c")): _*)
  }
}
