package graft.operators

/** Best-effort single-maintainer lease for the store REWRITE verbs
  * (r18; VERDICT r17 next #5 — the store's concurrency contract in one
  * place, enforced where cheap):
  *
  * THE GRAFT-STORE CONCURRENCY CONTRACT
  *  - READERS need no coordination, ever: batch partitions are
  *    immutable once landed, and every multi-file mutation commits
  *    through an atomic point (manifest flip, leaf two-phase swap,
  *    partition rename) that readers observe entirely-before or
  *    entirely-after.
  *  - CONCURRENT WRITERS of NEW batches are safe: implicit-id writers
  *    race through `landNextBatch`'s rename + nested-dir detection (a
  *    lost race is a loud error, never a clobber); explicit-id writers
  *    own their id by contract (ids are the caller's ledger — a
  *    streaming checkpoint's epochs, an ingest job's run ids), so two
  *    writers sharing an id is the same bug as two jobs sharing a
  *    checkpoint directory. One stream owns a store it writes.
  *  - REWRITE VERBS — compaction, batch expiry, takedown, GC — are
  *    SINGLE-MAINTAINER: they rewrite existing data, so two running
  *    concurrently on one store could interleave their multi-step
  *    protocols (epoch write + flip, leaf swap) in ways no atomic
  *    commit point covers. This lease makes that contract enforced
  *    instead of documented: each verb holds `_maintenance.lock` at
  *    the store root for its duration, and a second verb fails LOUDLY
  *    with the holder's identity instead of corrupting. Ingest and
  *    tails keep running — the lease gates maintainers only.
  *  - TAILS: compaction is transparent mid-tail (folded ids stay data);
  *    expiry/takedown under an UN-DELIVERED window elide those rows —
  *    sequencing them after the tail has drained is the operator's
  *    call, exactly as with any file-log source.
  *
  * The lease is advisory and best-effort (an object store without
  * atomic create degrades to the documented convention), and it is NOT
  * auto-stolen: a verb that died leaves its lock behind, and the next
  * verb's error says who/when/how to clear — a loud steal beats a
  * silent race between two live maintainers. */
object StoreLease {

  val LockName = "_maintenance.lock"

  /** Run `body` holding the store's maintenance lease. Throws (with
    * the current holder's recorded identity and age) when another verb
    * holds it. The lock releases on ANY exit — success or exception —
    * so only a killed JVM leaves it behind. */
  def withLease[T](storePath: String, verb: String)(body: => T): T = {
    val lock = Fs.path(storePath, LockName)
    val holder = s"$verb pid=${ProcessHandle.current().pid()} " +
      s"at=${java.time.Instant.now()}"
    if (!Fs.createExclusive(lock, holder)) {
      val existing = scala.util.Try(Fs.readString(lock))
        .getOrElse("<unreadable>")
      throw new IllegalStateException(
        s"$verb: store $storePath is under maintenance by [$existing] " +
          s"(lock: $lock). Rewrite verbs are single-maintainer — wait for " +
          "it to finish; if that maintainer is known dead (crashed JVM), " +
          "delete the lock file and retry.")
    }
    try body finally Fs.rm(lock)
  }
}
