package graft.operators

import graft.SparkSpec
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

/** The store concurrency contract's enforced piece (r18; VERDICT r17
  * next #5): rewrite verbs are single-maintainer — a second maintainer
  * fails LOUDLY with the holder's identity, the lock releases on every
  * exit path, and ingest writers are never gated. */
class StoreLeaseSpec extends SparkSpec {
  import spark.implicits._

  private val bc = StreamingOps.IngestBatchCol

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("lease").toString

  private def mkStore(p: String): Unit =
    (0 to 1).foreach { b =>
      Seq((b * 100L, s"t$b", s"s$b")).toDF("doc_id", "text", "source")
        .write.parquet(s"$p/$bc=$b")
    }

  test("a held lease makes every rewrite verb fail loudly; release restores them") {
    val p = tmp(); mkStore(p)
    StoreLease.withLease(p, "spec-holder") {
      val e1 = intercept[IllegalStateException] {
        StreamingOps.compactStore(spark, p, uptoBatch = 1L)
      }
      assert(e1.getMessage.contains("under maintenance") &&
        e1.getMessage.contains("spec-holder"))
      val e2 = intercept[IllegalStateException] {
        StreamingOps.expireBatches(spark, p, uptoBatch = 0L)
      }
      assert(e2.getMessage.contains("under maintenance"))
      val e3 = intercept[IllegalStateException] {
        Takedown.deleteFromStore(spark, p, Seq(100L))
      }
      assert(e3.getMessage.contains("under maintenance"))
      val e4 = intercept[IllegalStateException] {
        StreamingOps.gcStore(p)
      }
      assert(e4.getMessage.contains("under maintenance"))
      // ingest writers are NOT gated — the lease is for maintainers only
      Seq((999L, "new", "s9")).toDF("doc_id", "text", "source")
        .write.format("graft-store").mode("append").save(p)
    }
    // released on exit: the verbs work again
    assert(StreamingOps.compactStore(spark, p, uptoBatch = 1L).coversUpTo === 1L)
    assert(Takedown.deleteFromStore(spark, p, Seq(100L)).deletedRows === 1L)
    Manifests.rmTree(p)
  }

  test("the lock releases on exception exit; a dead maintainer's lock is loud, not stolen") {
    val p = tmp(); mkStore(p)
    // a verb that throws mid-body still releases (try/finally)
    intercept[IllegalArgumentException] {
      StoreLease.withLease(p, "crasher") {
        throw new IllegalArgumentException("boom")
      }
    }
    assert(StreamingOps.compactStore(spark, p, uptoBatch = 0L).epoch === 0L)
    // a lock left by a KILLED JVM (simulated: create the file directly)
    // is never auto-stolen — the error names the holder and the remedy
    assert(Fs.createExclusive(Fs.path(p, StoreLease.LockName), "dead-verb pid=1"))
    val e = intercept[IllegalStateException] {
      StreamingOps.gcStore(p)
    }
    assert(e.getMessage.contains("dead-verb") && e.getMessage.contains("delete"))
    Fs.rm(Fs.path(p, StoreLease.LockName))
    assert(StreamingOps.gcStore(p) >= 0)
    Manifests.rmTree(p)
  }
}
