package org.apache.spark.sql

import org.apache.spark.sql.types.StructType

/** Bridge into the `private[sql]` DataFrame constructor so the
  * library's V1 streaming source/sink (graft.sources.GraftStoreSource)
  * can produce frames with the `isStreaming` bit the micro-batch
  * engine requires — the same seam [[GraftColumnBridge]] opens for
  * Catalyst expressions. Both directions re-wrap an already-planned
  * frame's `toRdd` (lazy — nothing executes here):
  *
  *  - [[asStreaming]]: a V1 `Source.getBatch` must return a frame
  *    whose logical plan is flagged streaming (the engine splices it
  *    into the incremental plan; `FileStreamSource` does the same via
  *    `LogicalRelation(..., isStreaming = true)`);
  *  - [[asBatch]]: a V1 `Sink.addBatch` receives the incremental
  *    micro-batch frame, which a plain `.write` refuses ("streaming
  *    queries must be executed with writeStream") — re-wrapping its
  *    executed RDD as a batch frame is the `FileStreamSink` pattern
  *    expressed through the public write path. */
object GraftStreamingBridge {

  private def classicOf(df: Dataset[Row]): classic.Dataset[Row] =
    df.asInstanceOf[classic.Dataset[Row]]

  def asStreaming(df: Dataset[Row]): Dataset[Row] = {
    val c = classicOf(df)
    c.sparkSession.internalCreateDataFrame(
      c.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  def asBatch(df: Dataset[Row]): Dataset[Row] = {
    val c = classicOf(df)
    c.sparkSession.internalCreateDataFrame(
      c.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** An empty STREAMING frame of the given schema (a source's getBatch
    * on an empty id window). */
  def emptyStreaming(spark: SparkSession, schema: StructType): Dataset[Row] = {
    val c = spark.asInstanceOf[classic.SparkSession]
    c.internalCreateDataFrame(
      c.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
      schema, isStreaming = true)
  }
}
