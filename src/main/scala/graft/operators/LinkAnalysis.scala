package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph authority scoring — weighted PageRank (Page et al. 1999)
  * over a host/domain link graph: the crawl-frontier prioritization
  * signal (CommonCrawl publishes exactly this host-level ranking; a
  * curation pipeline uses it as a domain-quality prior next to the
  * q85 statistics and the q102 list gate).
  *
  * Scale shape, two regimes on the AGGREGATED edge table (host-level
  * graphs are host²-bounded — the corpus-sized work is only the
  * one map-side-combinable (src,dst) weight count):
  *  - DRIVER TIER (edge table under `maxDriverEdges` — the normal
  *    case for domain graphs; the q68/repeatAllocation bounded-
  *    metadata contract): collect the weighted edges, iterate the
  *    power method in plain Scala with per-destination contributions
  *    folded in SORTED src order — bit-reproducible in any engine, so
  *    the oracle mirrors the iterations as chained SQL CTEs with
  *    ordered list_reduce folds.
  *  - DISTRIBUTED TIER above the bound: the same update as a
  *    DataFrame loop (join ranks to shares, aggregate by dst,
  *    localCheckpoint every third iteration to cut lineage). Float
  *    accumulation order inside the aggregate is engine-scheduled
  *    there, so the tier is deterministic-per-plan but not
  *    oracle-mirrorable — the driver tier is the verified semantics,
  *    the distributed tier its documented at-scale twin.
  * Dangling mass: the DEFAULT form does not redistribute it (a node
  * with no out-edges leaks its damped mass — the simplified form the
  * q115 oracle mirrors bit-for-bit), `redistributeDangling = true`
  * adds the published correction (Page et al. 1999): each iteration
  * the dangling nodes' total mass D spreads uniformly, r'(v) =
  * (1-d)/n + d*(contrib(v) + D/n), conserving Σr = 1 on any graph —
  * one scalar per iteration on the driver tier (folded in sorted node
  * order, reproducible), one one-row broadcast per iteration on the
  * distributed tier. */
object LinkAnalysis {

  /** Weighted PageRank. `edges` columns: (src, dst, weight). Returns
    * (node, pagerank) with pagerank rounded to 6 decimals. */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85,
               maxDriverEdges: Long = 4000000L,
               redistributeDangling: Boolean = false): DataFrame = {
    require(iters > 0 && damping > 0 && damping < 1,
      s"pageRank: bad knobs iters=$iters damping=$damping")
    val spark = edges.sparkSession
    import spark.implicits._
    val agg = edges.groupBy(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"))
      .agg(sum(col("weight").cast("long")).as("w"))
    if (SizeDispatch.atMost(agg, maxDriverEdges)) {
      val e = agg.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val outW = e.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
      val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
      val n = nodes.length.toDouble
      // shares sorted by (dst, src): the per-dst fold order is src-asc,
      // exactly the oracle's list(x ORDER BY src) fold
      val byDst = e.map { case (s, d, w) => (d, s, w.toDouble / outW(s).toDouble) }
        .sortBy(t => (t._1, t._2)).groupBy(_._1)
      val dangling = nodes.filterNot(outW.contains) // sorted (nodes is)
      var r = nodes.map(_ -> 1.0 / n).toMap
      (1 to iters).foreach { _ =>
        val contrib = byDst.map { case (d, es) =>
          d -> es.foldLeft(0.0) { case (acc, (_, s, share)) => acc + r(s) * share }
        }
        // dangling mass folded in sorted node order — reproducible
        val dShare = if (!redistributeDangling) 0.0
          else dangling.foldLeft(0.0)((acc, v) => acc + r(v)) / n
        r = nodes.map(v =>
          v -> ((1.0 - damping) / n +
            damping * (contrib.getOrElse(v, 0.0) + dShare))).toMap
      }
      nodes.map(v => (v, r(v))).toSeq.toDF("node", "pr")
        .select(col("node"), round(col("pr"), 6).as("pagerank"))
        .orderBy("node")
    } else {
      val sh = Storage.track(
        agg.join(agg.groupBy("src").agg(sum("w").as("ow")), "src")
          .select(col("src"), col("dst"),
            (col("w").cast("double") / col("ow").cast("double")).as("share"))
          .localCheckpoint(true))
      val nodes = Storage.track(
        sh.select(col("src").as("node")).union(sh.select(col("dst")))
          .distinct().localCheckpoint(true))
      val n = nodes.count().toDouble
      lazy val srcs = Storage.track( // built only when redistribution is on
        sh.select(col("src")).distinct().localCheckpoint(true))
      var ranks = nodes.withColumn("r", lit(1.0 / n))
      (1 to iters).foreach { i =>
        val contrib = sh.join(ranks, sh("src") === ranks("node"))
          .groupBy(col("dst").as("node"))
          .agg(sum(col("r") * col("share")).as("contrib"))
        // dangling mass: ONE one-row aggregate riding a broadcast —
        // the ranks of nodes with no out-edges, spread uniformly
        val base = nodes.join(contrib, Seq("node"), "left")
        val withD =
          if (!redistributeDangling) base.withColumn("__d", lit(0.0))
          else base.crossJoin(broadcast(
            ranks.join(srcs, ranks("node") === srcs("src"), "left_anti")
              .agg(coalesce(sum(col("r")), lit(0.0)).as("__d"))))
        ranks = withD
          .select(col("node"),
            (lit((1.0 - damping) / n) + lit(damping) *
              (coalesce(col("contrib"), lit(0.0)) + col("__d") / lit(n)))
              .as("r"))
        if (i % 3 == 0 && i < iters)
          ranks = Storage.track(ranks.localCheckpoint(true))
      }
      ranks.select(col("node"), round(col("r"), 6).as("pagerank")).orderBy("node")
    }
  }
}
