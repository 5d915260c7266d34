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

  private val live =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.ref.WeakReference[DataFrame]]()

  /** Register a checkpointed or cached plan for deterministic release.
    * Returns the argument for call-site chaining. */
  def track(df: DataFrame): DataFrame = {
    live.add(new java.lang.ref.WeakReference(df))
    df
  }

  /** Free one plan's storage immediately: checkpoint blocks for
    * `LogicalRDD` leaves (the shape `localCheckpoint` returns), the
    * CacheManager entry otherwise. No-op if nothing is persisted. */
  def release(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => df.unpersist(blocking = false)
    }

  /** Unpersist every plan the registry still holds (no-op for plans the
    * GC already reclaimed) and clear the registry. See the class contract:
    * released CHECKPOINTED plans become unexecutable — call between
    * queries, not while a returned result is still live. */
  def releaseAll(): Unit = {
    val it = live.iterator()
    while (it.hasNext) {
      val df = it.next().get()
      if (df != null) release(df)
      it.remove()
    }
  }
}
