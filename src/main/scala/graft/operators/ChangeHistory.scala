package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension (SCD2) history from a CDC change
  * stream — the canonical downstream materialization of the change
  * envelopes the sources layer decodes (the reference stops at the
  * consumer callback, `CdcEngine.java:114-126`; every warehouse
  * consumer's first move is exactly this validity-interval build).
  * Kimball's type-2 rule: every INSERT/UPDATE opens a version valid
  * from its change time, closed by the NEXT change to the same key;
  * a DELETE closes the open version without opening one. The row
  * whose interval is open (`valid_to_us` null) is `is_current`.
  *
  * Scale shape: ONE key-partitioned window (lead over the per-key
  * change sequence) — the only shuffle, keyed on the dimension key,
  * groups bounded by a key's change count (per-key history, never
  * corpus-sized). Validity bounds emit as epoch MICROSECONDS
  * (BIGINT): exact integer comparisons in any engine, no
  * timestamp-flavor or timezone hazards (the q38 convention).
  */
object ChangeHistory {

  /** Build the SCD2 history. `seq` breaks ties inside one timestamp
    * (the CDC (lsn, seq) discipline: change order must be total per
    * key). `op` is 'I'/'U'/'D' — I and U both open versions (an
    * upsert stream needs no distinction), D only closes. Value
    * columns pass through untouched. */
  def scd2(changes: DataFrame, key: Column, tsMicros: Column, seq: Column,
           op: Column, values: Seq[(String, Column)]): DataFrame = {
    val base = changes.select(
      Seq(key.as("key"), tsMicros.as("valid_from_us"), seq.as("change_id"),
        op.as("__op")) ++ values.map { case (n, c) => c.as(n) }: _*)
    val w = Window.partitionBy(col("key"))
      .orderBy(col("valid_from_us"), col("change_id"))
    base
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .filter(col("__op") =!= "D")
      .withColumn("is_current", col("valid_to_us").isNull)
      .drop("__op")
  }
}
