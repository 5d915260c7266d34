package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-dup CLUSTERING — the step a real dedup pipeline runs after pair
  * generation: connected components over the near-dup pair graph, so each
  * duplicate family collapses to one canonical document (min doc_id).
  *
  * Algorithm: iterative label propagation ("hash-to-min") — every node
  * starts as its own component, then repeatedly takes the min label over
  * itself and its neighbors until a fixpoint. Each iteration is ONE
  * shuffle (join on the edge key + min-aggregate); convergence needs
  * O(component diameter) iterations, and near-dup families are
  * shallow (pairs/triangles/stars — diameter 2-3 in practice). This is
  * the standard distributed-CC shape (the large-star/small-star variant
  * optimizes the same loop); no driver-side graph materialization — the
  * only driver values are the per-iteration convergence checksums.
  *
  * (No clustering surface in the reference; north-star addition on top of
  * the q32/q33 pair operators.)
  */
object Clustering {

  /** Release a localCheckpoint'd generation's storage immediately instead
    * of waiting for the ContextCleaner to GC the unreferenced RDD — the
    * superseded generations would otherwise pile up for the whole loop
    * (bounded by iteration count, but pointless to hold). The checkpointed
    * RDD sits behind the plan's LogicalRDD leaf. */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Connected components of an undirected pair graph.
    *
    * Lineage control: each iteration's labels are checkpointed —
    * localCheckpoint by default (fast; blocks die with an executor), or a
    * RELIABLE checkpoint when `reliableCheckpointDir` is set (survives
    * executor loss — the right mode for long cluster runs). Without
    * truncation the self-referential join plan doubles per iteration and
    * OOMs the driver just printing itself. Superseded generations are
    * unpersisted as soon as the next one materializes.
    *
    * @param pairs  DataFrame of edges (two id columns)
    * @param maxIterations convergence bound: label propagation needs
    *        O(component diameter) rounds; if the graph hasn't converged
    *        by then the result would be SILENTLY WRONG (labels not yet
    *        minimal), so this throws instead of returning
    * @param reliableCheckpointDir HDFS/posix dir for reliable checkpoints
    * @return (node, comp) — comp is the minimum node id in the component
    */
  def connectedComponents(pairs: DataFrame, a: String = "da", b: String = "db",
                          maxIterations: Int = 20,
                          reliableCheckpointDir: Option[String] = None): DataFrame = {
    val spark = pairs.sparkSession
    reliableCheckpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def truncate(df: DataFrame): DataFrame =
      if (reliableCheckpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val edges = pairs.select(col(a).cast("long").as("u"), col(b).cast("long").as("v"))
      .union(pairs.select(col(b).cast("long").as("u"), col(a).cast("long").as("v")))
      .distinct()
      .cache()
    var labels = truncate(edges.select(col("u").as("node")).distinct()
      .withColumn("comp", col("node")))
    var checksum = labels.agg(sum(col("comp"))).collect()(0).getLong(0)
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // min over neighbors' labels, then min with own label
      val neighborMin = edges.join(labels.withColumnRenamed("node", "u"), "u")
        .groupBy(col("v").as("node")).agg(min(col("comp")).as("ncomp"))
      val next = truncate(labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp")))
      val nextSum = next.agg(sum(col("comp"))).collect()(0).getLong(0)
      releaseCheckpoint(labels) // superseded generation: free its blocks now
      labels = next
      // labels only ever decrease: an unchanged checksum IS a fixpoint
      converged = nextSum == checksum
      checksum = nextSum
      i += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIterations iterations " +
          "(component diameter exceeds the bound); raise maxIterations — " +
          "a partial result would silently merge fewer nodes than it should")
    labels
  }

  /** Cluster summary: one row per duplicate family (>= 2 docs), with the
    * canonical (min) id, size, and the sorted member list. */
  def nearDupClusters(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .groupBy(col("comp").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"),
        // sort numerically FIRST, cast to string after (lexicographic sort
        // of "10" < "9" would diverge from the oracle's ORDER BY node)
        array_join(transform(sort_array(collect_list(col("node"))),
          x => x.cast("string")), ",").as("members"))
      .orderBy("cluster_id")
}
