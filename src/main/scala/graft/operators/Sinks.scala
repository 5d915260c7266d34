package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Write-side layout helpers — the sink surface grown from the
  * reference's single consumer callback (`CdcConsumer.java:6-12`).
  * Partition/bucket layout at write time is what makes the read side's
  * partition pruning and exchange-free joins possible at 100 TB. */
object Sinks {

  /** Date-partitioned parquet: directory partitioning on a derived date
    * column → downstream time-range scans prune partitions statically
    * (verify: PartitionFilters in the scan node). */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String,
                           mode: SaveMode = SaveMode.Overwrite): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode(mode)
      .partitionBy("p_date")
      .parquet(path)

  /** Key-partitioned parquet for a dimension snapshot (e.g. apply-changes
    * output): low-cardinality key directories prune equality scans. */
  def writeKeyPartitioned(df: DataFrame, keyCol: String, path: String,
                          mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(keyCol).parquet(path)
}
