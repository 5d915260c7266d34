package graft.sql

import graft.SparkSpec
import graft.operators.Manifests
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

/** SQL-reachable store lifecycle (r18; VERDICT r17 next #1): OPTIMIZE /
  * VACUUM / UPKEEP / DELETE parse through the injected GraftSqlParser,
  * run the proven Scala verbs, and return informative rows — the full
  * Delta-model loop (ingest, query, optimize, forget) with no
  * engine-side Scala. */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private val bc = StreamingOps.IngestBatchCol

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-sql").toString

  /** Three live batches, doc_id ranges disjoint per batch. */
  private def mkStore(p: String, rows: Int = 90): Unit =
    (0 to 2).foreach { b =>
      (0 until rows / 3).map(i => (b * 1000L + i, s"text $i", s"s$b"))
        .toDF("doc_id", "text", "source")
        .write.mode("overwrite").parquet(s"$p/$bc=$b")
    }

  private def storeRows(p: String): Set[Long] =
    StreamingOps.readCorpusStore(spark, p).get
      .select("doc_id").as[Long].collect().toSet

  test("OPTIMIZE compacts through SQL; rows unchanged; output = (epoch, covers)") {
    val p = tmp(); mkStore(p)
    val before = storeRows(p)
    val out = spark.sql(s"OPTIMIZE graft.`$p` UPTO BATCH 1")
    assert(out.columns.toSeq === Seq("epoch", "covers_upto"))
    assert(out.as[(Long, Long)].head() === ((0L, 1L)))
    assert(Manifests.read(p) === Some((0L, 1L)))
    assert(storeRows(p) === before)
    // no UPTO: everything landed folds; epoch advances
    val out2 = spark.sql(s"OPTIMIZE graft.`$p`")
    assert(out2.as[(Long, Long)].head() === ((1L, 2L)))
    assert(storeRows(p) === before)
    Manifests.rmTree(p)
  }

  test("OPTIMIZE ZORDER BY clusters the epoch; UPKEEP STATS enables file skipping") {
    val p = tmp(); mkStore(p)
    val before = storeRows(p)
    spark.sql(s"OPTIMIZE graft.`$p` ZORDER BY (doc_id) FILE ROWS 20").collect()
    val scored = spark.sql(s"UPKEEP graft.`$p` STATS (doc_id)")
    assert(scored.columns.toSeq === Seq("scored"))
    assert(scored.as[Int].head() >= 1)
    // ranged SQL read through the view opens only qualifying files
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gsql_z " +
      s"USING `graft-store` OPTIONS (path '$p')")
    val got = spark.sql(
      "SELECT doc_id FROM gsql_z WHERE doc_id >= 1000 AND doc_id < 1005")
      .as[Long].collect().toSet
    assert(got === (1000L until 1005L).toSet)
    assert(storeRows(p) === before)
    spark.sql("DROP VIEW gsql_z")
    Manifests.rmTree(p)
  }

  test("DELETE FROM a graft target erases rows (epoch included); non-graft DELETE delegates") {
    val p = tmp(); mkStore(p)
    spark.sql(s"OPTIMIZE graft.`$p` UPTO BATCH 1").collect()
    val out = spark.sql(
      s"DELETE FROM graft.`$p` WHERE doc_id IN (3, 1001, 2004)")
    assert(out.columns.toSeq === Seq("rows_deleted", "units_rewritten"))
    assert(out.as[(Long, Int)].head() === ((3L, 2))) // epoch + live batch 2
    assert(!storeRows(p).exists(Set(3L, 1001L, 2004L)))
    // equality form
    assert(spark.sql(s"DELETE FROM graft.`$p` WHERE doc_id = 5")
      .as[(Long, Int)].head()._1 === 1L)
    // a DELETE whose target is NOT a graft store keeps Spark's own path
    // (the v1-relation refusal), never our takedown
    val pq = tmp()
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(pq)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW plainpq_tbl " +
      s"USING parquet OPTIONS (path '$pq')")
    val e = intercept[Exception] {
      spark.sql("DELETE FROM plainpq_tbl WHERE id = 1")
    }
    assert(!e.getMessage.contains("graft"), e.getMessage)
    spark.sql("DROP VIEW plainpq_tbl")
    Seq(p, pq).foreach(Manifests.rmTree)
  }

  test("VACUUM reclaims superseded dirs; VACUUM EXPIRE drops batches wholesale") {
    val p = tmp(); mkStore(p)
    // stage deferred GC: compact with a (fabricated) checkpoint whose
    // commit log covers the bound — GC is deferred, dirs stay behind
    val cp = tmp()
    graft.operators.Fs.mkdirs(graft.operators.Fs.path(cp, "commits"))
    graft.operators.Fs.writeString(graft.operators.Fs.path(cp, "commits", "2"), "{}")
    spark.sql(s"OPTIMIZE graft.`$p` CHECKPOINT '$cp'").collect()
    assert(graft.operators.Fs.listDirNames(graft.operators.Fs.path(p))
      .count(_.startsWith(s"$bc=")) === 3, "deferred GC should leave dirs")
    val before = storeRows(p)
    val vac = spark.sql(s"VACUUM graft.`$p`")
    assert(vac.columns.toSeq === Seq("removed_dirs", "epoch_rewritten"))
    assert(vac.as[(Int, Boolean)].head() === ((3, false)))
    assert(storeRows(p) === before, "VACUUM must never change rows")
    // EXPIRE: TTL by batch id — batch 0's rows leave the epoch
    val exp = spark.sql(s"VACUUM graft.`$p` EXPIRE UPTO BATCH 0")
    assert(exp.as[(Int, Boolean)].head()._2 === true)
    assert(storeRows(p) === before.filter(_ >= 1000L))
    Seq(p, cp).foreach(Manifests.rmTree)
  }

  test("UPKEEP ATTRIBUTES scores each new batch once through SQL") {
    val p = tmp(); mkStore(p)
    val out = spark.sql(s"UPKEEP graft.`$p` ATTRIBUTES")
    assert(out.columns.toSeq === Seq("scored"))
    assert(out.as[Int].head() === 3) // one sheet partition per batch
    assert(StreamingOps.readAttributeSheet(spark, p).get.count() > 0)
    // idempotent: already-scored batches never re-run
    assert(spark.sql(s"UPKEEP graft.`$p` ATTRIBUTES THRESHOLD 0.5")
      .as[Int].head() === 0)
    Manifests.rmTree(p)
  }

  test("catalog-table targets resolve; layout and provider refusals are pointed") {
    val p = tmp(); mkStore(p)
    spark.sql("DROP TABLE IF EXISTS gsql_cat")
    spark.sql(s"CREATE TABLE gsql_cat USING `graft-store` OPTIONS (path '$p')")
    val out = spark.sql("OPTIMIZE gsql_cat UPTO BATCH 1")
    assert(out.as[(Long, Long)].head() === ((0L, 1L)))
    assert(spark.sql("UPKEEP gsql_cat STATS (doc_id)").as[Int].head() >= 1)
    assert(spark.sql("DELETE FROM gsql_cat WHERE doc_id = 3")
      .as[(Long, Int)].head()._1 === 1L)
    // non-corpus layout: every verb refuses
    val e1 = intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE graft_ivm_missing_tbl")
    }
    assert(e1.getMessage.contains("not found in the catalog"))
    spark.sql("DROP TABLE IF EXISTS gsql_ivm")
    spark.sql(s"CREATE TABLE gsql_ivm (k STRING) USING `graft-store` " +
      s"OPTIONS (path '${tmp()}/ivm', layout 'ivm-view')")
    val e2 = intercept[IllegalArgumentException] {
      spark.sql("OPTIMIZE gsql_ivm")
    }
    assert(e2.getMessage.contains("layout 'ivm-view'"))
    // non-graft provider
    spark.sql("DROP TABLE IF EXISTS gsql_pq")
    spark.sql(s"CREATE TABLE gsql_pq (id BIGINT) USING parquet " +
      s"OPTIONS (path '${tmp()}/pq')")
    val e3 = intercept[IllegalArgumentException] {
      spark.sql("VACUUM gsql_pq")
    }
    assert(e3.getMessage.contains("not graft-store"))
    Seq("gsql_cat", "gsql_ivm", "gsql_pq")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Manifests.rmTree(p)
  }

  test("CLONE exports a store (or a batch window) as a new store; DESCRIBE HISTORY ledgers it") {
    val p = tmp(); mkStore(p)
    spark.sql(s"OPTIMIZE graft.`$p` UPTO BATCH 1").collect()
    spark.sql(s"DELETE FROM graft.`$p` WHERE doc_id = 3").collect()
    // full clone: rows identical, batch ids preserved as partitions
    val d1 = s"${tmp()}/clone-full"
    val out = spark.sql(s"CLONE graft.`$p` TO '$d1'")
    assert(out.columns.toSeq === Seq("batches_cloned", "max_batch"))
    assert(out.as[(Int, Long)].head() === ((3, 2L)))
    assert(storeRows(d1) === storeRows(p))
    assert(StreamingOps.readCorpusStore(spark, d1).get
      .select(col(bc).cast("long")).distinct().count() === 3L)
    // window clone: only batches ≤ 0 (their takedown inherited)
    val d2 = s"${tmp()}/clone-window"
    spark.sql(s"CLONE graft.`$p` TO '$d2' UPTO BATCH 0").collect()
    assert(storeRows(d2) === storeRows(p).filter(_ < 1000L))
    // the clone is a REAL store: appends land under the next free id,
    // and later takedowns on the SOURCE never reach it (isolation is
    // the point of a snapshot handoff)
    Seq((7777L, "x", "s9")).toDF("doc_id", "text", "source")
      .write.format("graft-store").mode("append").save(d2)
    spark.sql(s"DELETE FROM graft.`$p` WHERE doc_id = 6").collect()
    assert(storeRows(d2).contains(6L) && storeRows(d2).contains(7777L))
    assert(!storeRows(p).contains(6L))
    // non-empty destination refused
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"CLONE graft.`$p` TO '$d2'")
    }
    assert(e.getMessage.contains("empty ground"))
    // DESCRIBE HISTORY: epoch + live batch ledger, metadata only
    val hist = spark.sql(s"DESCRIBE HISTORY graft.`$p`")
      .as[(String, Long, Int, Long, Boolean)].collect().toSeq
    assert(hist.exists(r => r._1 == "epoch" && r._2 == 0L && r._3 > 0))
    assert(hist.exists(r => r._1 == "covers_upto" && r._2 == 1L))
    assert(hist.count(_._1 == "batch") === 1) // batch 2 live (0-1 folded+gc'd)
    // plain DESCRIBE on a non-graft name keeps Spark's own path
    val eDesc = intercept[Exception] {
      spark.sql("DESCRIBE HISTORY some_missing_table_xyz")
    }
    assert(!eDesc.getMessage.contains("graft lifecycle"), eDesc.getMessage)
    Seq(p, d1, d2).foreach(Manifests.rmTree)
  }

  test("safety rails surface through SQL: checkpoint bound, empty store, grammar") {
    val p = tmp(); mkStore(p)
    // a checkpoint whose last commit is 0 refuses UPTO BATCH 2 (the
    // compactStore crash-replay guard, reached from SQL)
    val cp = tmp()
    graft.operators.Fs.mkdirs(graft.operators.Fs.path(cp, "commits"))
    graft.operators.Fs.writeString(graft.operators.Fs.path(cp, "commits", "0"), "{}")
    val e1 = intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE graft.`$p` UPTO BATCH 2 CHECKPOINT '$cp'")
    }
    assert(e1.getMessage.contains("exceeds the checkpoint"))
    // same guard on EXPIRE
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"VACUUM graft.`$p` EXPIRE UPTO BATCH 2 CHECKPOINT '$cp'")
    }
    assert(e2.getMessage.contains("exceeds the checkpoint"))
    // empty store: OPTIMIZE has nothing to compact
    val e3 = intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE graft.`${tmp()}/empty`")
    }
    assert(e3.getMessage.contains("nothing to compact"))
    // grammar errors are pointed, not delegated into ANTLR noise
    val e4 = intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE graft.`$p` ZORDER doc_id")
    }
    assert(e4.getMessage.contains("grammar"))
    val e5 = intercept[IllegalArgumentException] {
      spark.sql(s"DELETE FROM graft.`$p` WHERE doc_id > 5")
    }
    assert(e5.getMessage.contains("WHERE col IN"))
    // EXPLAIN goes through the command without executing it
    assert(spark.sql(s"EXPLAIN OPTIMIZE graft.`$p` UPTO BATCH 1").count() === 1L)
    assert(Manifests.read(p).isEmpty, "EXPLAIN must not run the compaction")
    // shrinking watermark: refused through SQL (the compactView guard)
    spark.sql(s"OPTIMIZE graft.`$p` UPTO BATCH 2").collect()
    val eShrink = intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE graft.`$p` UPTO BATCH 1")
    }
    assert(eShrink.getMessage.contains("watermark must not shrink"))
    Seq(p, cp).foreach(Manifests.rmTree)
  }
}
