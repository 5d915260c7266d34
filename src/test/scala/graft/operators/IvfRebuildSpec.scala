package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Staleness-triggered full rebuild (VERDICT r12 #3): once day-2 data
  * drifts off the day-1 centroids, `rebuildIvfIndex` refits fresh
  * centroids over the whole index view and commits a new generation
  * via the Manifests atomic flip — probes serve through the swap,
  * recall recovers, the staleness baseline resets, and crash-replayed
  * appends still overwrite their own partition in the new generation. */
class IvfRebuildSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  private def clustered(nClusters: Int, perCluster: Int, seed: Long,
                        idBase: Long) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = for {
      c <- 0 until nClusters
      m <- 0 until perCluster
    } yield (idBase + c * perCluster + m,
      centers(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat))
    rows.toDF("vec_id", "embedding")
  }

  // day-1 and day-2 come from DISJOINT cluster structures — the drift
  // scenario the staleness gauge exists for
  private lazy val fixture = {
    val day1 = clustered(8, 16, seed = 41L, idBase = 0L)
    val day2 = clustered(8, 16, seed = 99L, idBase = 1000L)
    val path = java.nio.file.Files.createTempDirectory("ivf-rebuild").toString
    Similarity.writeIvfIndex(Similarity.buildIvfIndex(day1, nLists = 8), path)
    Storage.releaseAll()
    val preFlip = Similarity.readIvfIndex(spark, path)
    val report = Similarity.appendIvfBatch(preFlip, day2, path, batchId = 7L)
    (day1, day2, path, preFlip, report)
  }

  /** Exact-neighbour hit rate for ten day-2 probes at (k=5, nProbe=2). */
  private def recallDay2(idx: Similarity.IvfIndex, all: org.apache.spark.sql.DataFrame,
                         day2: org.apache.spark.sql.DataFrame): Double = {
    val probes = day2.orderBy("vec_id").limit(10)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val hits = probes.map { case (pid, vec) =>
      val got = Similarity.probeIvf(idx, vec, k = 5, nProbe = 2,
        excludeId = Some(pid)).select("vec_id").as[Long].collect().toSet
      val want = Similarity.cosineTopK(all, probeId = pid, k = 5)
        .select("vec_id").as[Long].collect().toSet
      (got intersect want).size.toDouble / want.size
    }
    hits.sum / hits.length
  }

  test("drifted day-2 data trips the gauge; rebuild restores recall and resets the baseline") {
    val (day1, day2, path, preFlip, report) = fixture
    val all = day1.unionByName(day2)
    // the drift is visible: appended cohesion well under the build's
    assert(report.staleness.exists(_ > 0.05), s"drift must trip the gauge: $report")

    val drifted = Similarity.readIvfIndex(spark, path)
    val recallBefore = recallDay2(drifted, all, day2)

    val (gen, covers) = Similarity.rebuildIvfIndex(spark, path)
    assert(gen === 0L && covers === 7L)

    // pre-flip reader serves THROUGH the swap: its handle (opened
    // before the day-2 append even) still executes over the retained
    // old-generation files and sees its own point-in-time view
    assert(preFlip.assigned.count() === day1.count())
    assert(drifted.assigned.count() === day1.count() + day2.count())

    val rebuilt = Similarity.readIvfIndex(spark, path)
    // fresh centroids actually moved and cover the combined distribution
    assert(rebuilt.centroids.map(_.toSeq).toSeq !== drifted.centroids.map(_.toSeq).toSeq)
    assert(rebuilt.assigned.count() === day1.count() + day2.count())
    val recallAfter = recallDay2(rebuilt, all, day2)
    assert(recallAfter >= recallBefore,
      s"rebuild must not lose recall: $recallAfter < $recallBefore")
    assert(recallAfter >= 0.9, s"fresh centroids must route day-2 well: $recallAfter")

    // staleness baseline RESET: day-3 data from the day-2 distribution
    // now coheres with the new centroids
    val day3 = clustered(8, 4, seed = 99L, idBase = 2000L)
    val r3 = Similarity.appendIvfBatch(rebuilt, day3, path, batchId = 8L)
    assert(r3.staleness.exists(s => s < report.staleness.get && s < 0.1),
      s"rebuilt baseline must absorb the new distribution: $r3 vs $report")

    // crash-replay across the swap: batch 7 was folded into the new
    // generation, but its partition layout survives — a replayed append
    // overwrites it, never duplicates
    val total = Similarity.readIvfIndex(spark, path).assigned.count()
    Similarity.appendIvfBatch(Similarity.readIvfIndex(spark, path), day2, path, batchId = 7L)
    assert(Similarity.readIvfIndex(spark, path).assigned.count() === total)

    // probe plans over the new generation stay partition-pruned on list
    val vec = day2.orderBy("vec_id").limit(1)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val plan = Similarity.probeIvf(Similarity.readIvfIndex(spark, path), vec,
      k = 5, nProbe = 2).queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*list".r.findFirstIn(plan).isDefined,
      s"expected list pruning over the rebuilt generation:\n$plan")

    // deferred GC reclaims the superseded generation; the committed one serves
    assert(Similarity.gcIndexGenerations(path) > 0)
    assert(!new java.io.File(s"$path/assigned").exists())
    assert(Similarity.readIvfIndex(spark, path).assigned.count() === total)
    assert(Similarity.gcIndexGenerations(path) === 0, "gc is idempotent")
  }
}
