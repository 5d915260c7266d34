package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared deterministic-release registry for operator-held storage:
  * localCheckpoint generations (Dedup's kernel pinch-points, Clustering's
  * per-iteration label generations) and cached intermediates (Clustering's
  * edge set).
  *
  * The normal release path is the ContextCleaner GC'ing an unreferenced
  * plan, but GC timing is not a storage-lifecycle contract — a many-query
  * session (the bench sweep) can accumulate generations between
  * collections, and a cleanup storm landing mid-measurement shows up as a
  * multi-second stall on whichever query happens to be running. Callers
  * that want deterministic release (between benchmark queries, between
  * pipeline stages) call `releaseAll()`; everyone else loses nothing
  * because the references are weak.
  *
  * CONTRACT (not a cache-drop): releasing a locally-checkpointed plan
  * makes it UNEXECUTABLE, not recomputable — `localCheckpoint` truncates
  * lineage, so once its blocks are gone a still-held DataFrame fails with
  * "checkpoint block not found" rather than rebuilding from source. Only
  * call `releaseAll()` at a point where no previously-returned dedup /
  * clustering result will be executed again (a fresh call to the operator
  * builds a fresh kernel). Plain cached plans (no lineage truncation) are
  * merely uncached and do recompute.
  */
object Storage {

  /** One registered plan. The DataFrame reference is WEAK (the registry
    * must not keep results alive in long-running apps), so a minor GC
    * between an operator returning and the next drain can clear it — for
    * checkpointed plans the blocks would then linger until the
    * ContextCleaner got around to them (the flat 1-2 phantom residents in
    * the r7 gauge stats). `rddId` is the durable handle for exactly that
    * case: the checkpoint RDD can still be found (if yet unreleased) in
    * `sc.getPersistentRDDs` and dropped deterministically. -1 for plain
    * cached plans, whose storage recomputes and is CacheManager-owned. */
  private final case class Entry(df: java.lang.ref.WeakReference[DataFrame],
                                 sc: org.apache.spark.SparkContext, rddId: Int)

  private val live = java.util.concurrent.ConcurrentHashMap.newKeySet[Entry]()

  /** Register a checkpointed or cached plan for deterministic release.
    * Returns the argument for call-site chaining. */
  def track(df: DataFrame): DataFrame = {
    val rddId = df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
      case _ => -1
    }
    live.add(Entry(new java.lang.ref.WeakReference(df),
      df.sparkSession.sparkContext, rddId))
    df
  }

  /** Free one plan's storage immediately: checkpoint blocks for
    * `LogicalRDD` leaves (the shape `localCheckpoint` returns), the
    * CacheManager entry otherwise. No-op if nothing is persisted.
    * `blocking = true` waits for block removal — callers that read a
    * storage gauge right after (the bench's per-iteration evidence) need
    * it, or the gauge races the async unpersist and reports phantom
    * residents (the flat rdds=2-3 rows in the r7 sweep stats). */
  def release(df: DataFrame, blocking: Boolean = false): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking)
      case _ => df.unpersist(blocking)
    }

  /** Unpersist every plan the registry still holds (no-op for plans the
    * GC already reclaimed) and clear the registry. See the class contract:
    * released CHECKPOINTED plans become unexecutable — call between
    * queries, not while a returned result is still live.
    * @return the number of entries drained — callers pacing JVM cleanup
    *         (the bench) use a non-zero count as "this query holds
    *         storage / allocates kernel-heavy" signal. */
  def releaseAll(blocking: Boolean = false): Int = {
    var n = 0
    val it = live.iterator()
    while (it.hasNext) {
      val e = it.next()
      val df = e.df.get()
      if (df != null) release(df, blocking)
      else if (e.rddId >= 0)
        // plan object already GC'd: reach the checkpoint blocks through
        // the context's persistent-RDD registry instead (no-op if the
        // ContextCleaner won the race)
        e.sc.getPersistentRDDs.get(e.rddId).foreach(_.unpersist(blocking))
      it.remove()
      n += 1
    }
    n
  }
}
