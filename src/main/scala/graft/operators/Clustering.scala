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
    * (bounded by iteration count, but pointless to hold). */
  private def releaseCheckpoint(df: DataFrame): Unit = Storage.release(df)

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
    * Size-tiered like Percentiles.exactAuto: the pair graph is METADATA
    * (edges between near-duplicates), orders of magnitude smaller than
    * the corpus, and usually driver-sized even when the corpus is not.
    * Below `localEdgeThreshold` edges (default 1M ≈ 16 MB — the same
    * order as a broadcast join's build side) the components are solved
    * with a driver union-find in milliseconds; the distributed
    * label-propagation loop is the at-scale tier for pair graphs that
    * outgrow that. The edge count used to dispatch comes off the cached
    * edge set the distributed loop needs anyway.
    *
    * @param pairs  DataFrame of edges (two id columns)
    * @param maxIterations convergence bound (distributed tier): label
    *        propagation with path halving needs O(log diameter) rounds;
    *        if the graph hasn't converged by then the result would be
    *        SILENTLY WRONG (labels not yet minimal), so this throws
    *        instead of returning
    * @param reliableCheckpointDir HDFS/posix dir for reliable checkpoints
    * @param localEdgeThreshold dispatch bound: at or below this many
    *        (undirected) edges the driver union-find tier runs; 0 forces
    *        the distributed loop
    * @return (node, comp) — comp is the minimum node id in the component
    */
  def connectedComponents(pairs: DataFrame, a: String = "da", b: String = "db",
                          maxIterations: Int = 20,
                          reliableCheckpointDir: Option[String] = None,
                          localEdgeThreshold: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    reliableCheckpointDir.foreach(spark.sparkContext.setCheckpointDir)
    // every generation goes through the shared Storage registry: the loop
    // releases superseded ones eagerly, but the FINAL labels checkpoint
    // (returned to the caller) and the edge cache outlive this function —
    // in a many-query session (the bench sweep) those stragglers are what
    // pile up between GCs, so Bench drains Storage between queries.
    def truncate(df: DataFrame): DataFrame = Storage.track(
      if (reliableCheckpointDir.isDefined) df.checkpoint() else df.localCheckpoint())
    // no eager distinct: the pair kernels emit each pair once already,
    // and BOTH consumers tolerate duplicates — union-find is idempotent
    // per edge, and the min-propagation loop aggregates with min().
    // The dedup shuffle only pays off for the distributed tier (where
    // duplicate edges would re-shuffle every iteration), so it is
    // applied there and only there. Duplicates make the threshold count
    // conservative (an overcount can only route a small graph to the
    // distributed tier, never a big one to the driver).
    val edges = Storage.track(
      pairs.select(col(a).cast("long").as("u"), col(b).cast("long").as("v"))
        .union(pairs.select(col(b).cast("long").as("u"), col(a).cast("long").as("v")))
        .cache())
    if (edges.count() / 2 <= localEdgeThreshold) {
      import spark.implicits._
      val es = edges.as[(Long, Long)].collect()
      edges.unpersist()
      return localUnionFind(spark, es)
    }
    val dedupEdges = Storage.track(edges.distinct().cache())
    dedupEdges.count()
    edges.unpersist()
    var labels = truncate(dedupEdges.select(col("u").as("node")).distinct()
      .withColumn("comp", col("node")))
    var checksum = labels.agg(sum(col("comp"))).collect()(0).getLong(0)
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // min over neighbors' labels, then min with own label
      val neighborMin = dedupEdges.join(labels.withColumnRenamed("node", "u"), "u")
        .groupBy(col("v").as("node")).agg(min(col("comp")).as("ncomp"))
      val viaNeighbors = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
      // pointer jump (path halving): comp <- min(comp, comp(comp)).
      // Neighbor propagation alone walks one hop per round — O(diameter)
      // rounds, and a chain-shaped duplicate family of depth d costs d
      // shuffles. Composing it with one label-to-label hop halves label
      // paths every round -> O(log diameter) rounds (measured on the
      // sf0.1 embedding graph's 75-node components: ~14 rounds -> ~7).
      // The jump source is re-aliased to fresh column names so the
      // self-join does not trip Spark 4.1's ambiguous-self-join
      // detection.
      val jumpSrc = viaNeighbors.select(col("node").as("jnode"), col("comp").as("jcomp"))
      val next = truncate(viaNeighbors
        .join(jumpSrc, col("comp") === col("jnode"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("jcomp"), col("comp"))).as("comp")))
      val nextSum = next.agg(sum(col("comp"))).collect()(0).getLong(0)
      releaseCheckpoint(labels) // superseded generation: free its blocks now
      labels = next
      // labels only ever decrease: an unchanged checksum IS a fixpoint
      converged = nextSum == checksum
      checksum = nextSum
      i += 1
    }
    dedupEdges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIterations iterations " +
          "(component diameter exceeds the bound); raise maxIterations — " +
          "a partial result would silently merge fewer nodes than it should")
    labels
  }

  /** Driver union-find with path compression; roots are kept at the
    * component's MINIMUM id by always attaching the larger root under
    * the smaller, so output labels match the distributed tier exactly.
    * Only reachable below `localEdgeThreshold` — bounded memory. */
  private def localUnionFind(spark: org.apache.spark.sql.SparkSession,
                             edges: Array[(Long, Long)]): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (u, v) =>
      parent.getOrElseUpdate(u, u)
      parent.getOrElseUpdate(v, v)
      val ru = find(u)
      val rv = find(v)
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    import spark.implicits._
    parent.keys.toSeq.sorted.map(n => (n, find(n))).toDF("node", "comp")
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
