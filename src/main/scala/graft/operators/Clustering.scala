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

  /** Connected components of an undirected pair graph.
    * @param pairs  DataFrame of edges (two id columns)
    * @return (node, comp) — comp is the minimum node id in the component
    */
  def connectedComponents(pairs: DataFrame, a: String = "da", b: String = "db",
                          maxIterations: Int = 20): DataFrame = {
    val edges = pairs.select(col(a).cast("long").as("u"), col(b).cast("long").as("v"))
      .union(pairs.select(col(b).cast("long").as("u"), col(a).cast("long").as("v")))
      .distinct()
      .cache()
    // localCheckpoint (not cache) each iteration: it TRUNCATES lineage, so
    // the plan stays O(1) instead of doubling per iteration (a 10-deep
    // self-referential join plan OOMs the driver just printing itself).
    // On a cluster with executor loss concerns, swap for reliable
    // checkpoint(dir) — same contract.
    var labels = edges.select(col("u").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint()
    var checksum = labels.agg(sum(col("comp"))).collect()(0).getLong(0)
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // min over neighbors' labels, then min with own label
      val neighborMin = edges.join(labels.withColumnRenamed("node", "u"), "u")
        .groupBy(col("v").as("node")).agg(min(col("comp")).as("ncomp"))
      val next = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        .localCheckpoint()
      val nextSum = next.agg(sum(col("comp"))).collect()(0).getLong(0)
      labels = next
      // labels only ever decrease: an unchanged checksum IS a fixpoint
      converged = nextSum == checksum
      checksum = nextSum
      i += 1
    }
    edges.unpersist()
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
