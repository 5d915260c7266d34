package graft.sources

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.read.streaming.ReadLimit

import graft.SparkSpec
import graft.cdc.Envelope
import graft.wal.{PgOutput, PgOutputEncoder}

/** Scripted in-memory stand-in for a pgjdbc `PGReplicationStream` — the
  * mocked frame feed the live socket source is unit-tested against
  * (no live PostgreSQL in the sandbox; the socket half of A1 is
  * integration-gated and documented in LivePgBootstrap). */
class ScriptedFrameSource(options: Map[String, String]) extends ReplicationFrameSource {
  private val feed = ScriptedFrameSource.feeds(options("fixtureId"))
  override def poll(): Option[(Long, Array[Byte])] = Option(feed.queue.poll())
  override def advance(lsn: Long): Unit = feed.advanced.add(lsn)
  override def close(): Unit = feed.closed.set(true)
}

object ScriptedFrameSource {
  final class Feed {
    val queue = new ConcurrentLinkedQueue[(Long, Array[Byte])]()
    val advanced = new ConcurrentLinkedQueue[Long]()
    val closed = new AtomicBoolean(false)
  }
  val feeds: TrieMap[String, Feed] = TrieMap.empty

  def register(id: String, frames: Seq[(Long, Array[Byte])]): Feed = {
    val f = new Feed
    frames.foreach(f.queue.add)
    feeds(id) = f
    f
  }
}

class PgCdcLiveSpec extends SparkSpec {

  import PgOutput._

  private val rel = RelationMeta(1, "public", "accounts", Vector(
    RelationColumn("id", 20, -1, 0), RelationColumn("name", 1043, -1, 0)))

  private val e = PgOutputEncoder

  /** relation, tx1 (2 inserts), tx2 (3 inserts), singleton insert. */
  private def frames(): Seq[(Long, Array[Byte])] = Seq(
    e.relation(rel), // 100
    e.begin(), // 101
    e.insert(1, Seq(Some("1"), Some("a"))), // 102
    e.insert(1, Seq(Some("2"), Some("b"))), // 103
    e.commit(), // 104
    e.begin(), // 105
    e.insert(1, Seq(Some("3"), Some("c"))), // 106
    e.insert(1, Seq(Some("4"), Some("d"))), // 107
    e.insert(1, Seq(Some("5"), Some("e"))), // 108
    e.commit(), // 109
    e.insert(1, Seq(Some("6"), Some("f"))) // 110 (out-of-tx singleton)
  ).zipWithIndex.map { case (f, i) => (100L + i, f) }

  private def newStream(cap: Int, overflow: Boolean = false,
                        fs: Seq[(Long, Array[Byte])] = frames()): (PgCdcLiveStream, ScriptedFrameSource.Feed) = {
    val id = s"t${System.nanoTime()}"
    val feed = ScriptedFrameSource.register(id, fs)
    val src = new ScriptedFrameSource(Map("fixtureId" -> id))
    (new PgCdcLiveStream(src, maxBatchRecords = cap, allowMidTxFlush = overflow), feed)
  }

  private def end(stream: PgCdcLiveStream, from: Long, cap: Int): Long =
    stream.latestOffset(LsnOffset(from), ReadLimit.maxRows(cap.toLong))
      .asInstanceOf[LsnOffset].lsn

  test("offsets snap to tx-safe LSNs under the admission cap (atomic mode)") {
    // The cap counts DATA rows (I/U/D) only — BEGIN/COMMIT/RELATION are
    // not rows (ReadMaxRows semantics): cap 1 admits one insert.
    val (stream, _) = newStream(cap = 4)
    // cap 1 from 0: tx1 has 2 rows -> snap back to 100 (R is safe)
    assert(end(stream, 0L, 1) === 100L)
    // cap 2: exactly tx1's rows -> its COMMIT at 104
    assert(end(stream, 0L, 2) === 104L)
    // cap 4: tx2 (3 more rows) would exceed -> still 104
    assert(end(stream, 0L, 4) === 104L)
    // cap 5: both txs' 5 rows -> tx2's COMMIT at 109
    assert(end(stream, 0L, 5) === 109L)
    // from 104, cap 3: tx2's COMMIT at 109; the singleton would exceed
    assert(end(stream, 104L, 3) === 109L)
    // from 109: the singleton is its own safe point
    assert(end(stream, 109L, 5) === 110L)
  }

  test("an oversized transaction extends to its COMMIT in atomic mode") {
    val (stream, _) = newStream(cap = 2)
    // from 104 with cap 2: tx2 (5 frames) exceeds the cap and there is no
    // earlier safe point -> extend to COMMIT at 109, whole tx in one batch
    assert(end(stream, 104L, 2) === 109L)
  }

  test("allowMidTxFlush cuts an oversized transaction at the cap and keeps txids") {
    val (stream, _) = newStream(cap = 2, overflow = true)
    val cut = end(stream, 104L, 2)
    assert(cut === 107L) // tx2's first two rows (106, 107): mid-tx overflow flush
    // decode both halves through planInputPartitions: txid must stay 105
    val p1 = stream.planInputPartitions(LsnOffset(104L), LsnOffset(cut))(0)
      .asInstanceOf[LivePartition]
    val rest = end(stream, cut, 100)
    val p2 = stream.planInputPartitions(LsnOffset(cut), LsnOffset(rest))(0)
      .asInstanceOf[LivePartition]
    val recs1 = LiveDecode.decode(p1.relationFrames, p1.frames, p1.openTxid).toVector
    val recs2 = LiveDecode.decode(p2.relationFrames, p2.frames, p2.openTxid).toVector
    assert(recs1.map(_.columns("id")) === Vector("3", "4"))
    assert(recs2.map(_.columns("id")) === Vector("5", "6"))
    // the overflowed tail keeps the transaction's txid (BEGIN lsn = 105)
    assert((recs1 ++ recs2.take(1)).map(_.txid).distinct === Vector(105L))
    assert(recs2.last.txid === 110L) // singleton: txid = own lsn
  }

  test("proto v2 streamed txns: batches never split them; overflow cut is vetoed; assembly at commit") {
    val v2: Seq[(Long, Array[Byte])] = Seq(
      e.relation(rel), // 200
      e.streamStart(700), // 201: tx 700, segment 1
      e.streamed(700, e.insert(1, Seq(Some("10"), Some("x")))), // 202
      e.streamStop(), // 203
      e.streamStart(700, firstSegment = false), // 204: segment 2
      e.streamed(700, e.insert(1, Seq(Some("11"), Some("y")))), // 205
      e.streamStop(), // 206
      e.streamCommit(700), // 207
      e.insert(1, Seq(Some("12"), Some("z"))) // 208: singleton
    ).zipWithIndex.map { case (f, i) => (200L + i, f) }
    // atomic mode, cap below the tx's rows: the only safe point within the
    // cap precedes the stream (the tx stays open from S to c)
    val (atom, _) = newStream(cap = 4, fs = v2)
    assert(end(atom, 0L, 1) === 200L)
    // cap covering the tx: the batch extends exactly to the stream commit
    assert(end(atom, 0L, 2) === 207L)
    // overflow mode, starting past the relation frame so no safe point
    // exists within the cap: the mid-tx cut would land inside the
    // streamed block — vetoed (buffered segments would be acked away);
    // extend to the stream commit instead
    val (over, _) = newStream(cap = 1, overflow = true, fs = v2)
    assert(end(over, 200L, 1) === 207L)
    // assembly: both segments' rows emit once, tagged with the real xid
    val p = atom.planInputPartitions(LsnOffset(0L), LsnOffset(207L))(0)
      .asInstanceOf[LivePartition]
    val recs = LiveDecode.decode(p.relationFrames, p.frames, p.openTxid).toVector
    assert(recs.map(r => (r.columns("id"), r.txid)) === Vector(("10", 700L), ("11", 700L)))
  }

  test("proto v3 2PC: the live b..K window never splits; delivery at K; rollback discards") {
    val fs: Seq[(Long, Array[Byte])] = Seq(
      e.relation(rel), // 300
      e.beginPrepare(900, "g1"), // 301
      e.insert(1, Seq(Some("10"), Some("x"))), // 302
      e.insert(1, Seq(Some("11"), Some("y"))), // 303
      e.prepare(900, "g1"), // 304
      e.begin(), // 305: v1 tx inside the undecided window
      e.insert(1, Seq(Some("12"), Some("z"))), // 306
      e.commit(), // 307
      e.commitPrepared(900, "g1"), // 308
      e.beginPrepare(901, "g2"), // 309
      e.insert(1, Seq(Some("13"), Some("w"))), // 310
      e.prepare(901, "g2"), // 311
      e.rollbackPrepared(901, "g2"), // 312
      e.insert(1, Seq(Some("14"), Some("v"))) // 313: singleton
    ).zipWithIndex.map { case (f, i) => (300L + i, f) }
    // the live source decodes only acked-away slices, so the WHOLE
    // b..K window gates safe points: with the cap inside the window the
    // batch extends to the decision at 308
    val (atom, _) = newStream(cap = 4, fs = fs)
    assert(end(atom, 0L, 1) === 300L) // only the pre-b point is safe
    assert(end(atom, 300L, 2) === 308L) // atomic extension to K
    assert(end(atom, 300L, 3) === 308L)
    // overflow mode: the mid-window cut is vetoed (buffered prepared
    // frames would be acked away before the decision)
    val (over, _) = newStream(cap = 2, overflow = true, fs = fs)
    assert(end(over, 300L, 2) === 308L)
    // assembly: the v1 tx emits at its own position; the prepared tx's
    // rows emit at K with the b frame's xid
    val p = atom.planInputPartitions(LsnOffset(300L), LsnOffset(308L))(0)
      .asInstanceOf[LivePartition]
    val recs = LiveDecode.decode(p.relationFrames, p.frames, p.openTxid).toVector
    assert(recs.map(r => (r.columns("id"), r.txid)) ===
      Vector(("12", 305L), ("10", 900L), ("11", 900L)))
    // the rolled-back window: gated until 'r', then discarded
    val (tail, _) = newStream(cap = 10, fs = fs)
    assert(end(tail, 308L, 1) === 312L) // the r frame closes the window
    val p2 = tail.planInputPartitions(LsnOffset(308L), LsnOffset(313L))(0)
      .asInstanceOf[LivePartition]
    val recs2 = LiveDecode.decode(p2.relationFrames, p2.frames, p2.openTxid).toVector
    assert(recs2.map(r => (r.columns("id"), r.txid)) === Vector(("14", 313L)))
  }

  test("proto v3 2PC: a streamed tx resolved by 'p' gates and assembles at K") {
    val fs: Seq[(Long, Array[Byte])] = Seq(
      e.relation(rel), // 400
      e.streamStart(700), // 401
      e.streamed(700, e.insert(1, Seq(Some("20"), Some("x")))), // 402
      e.streamStop(), // 403
      e.streamPrepare(700, "g3"), // 404
      e.commitPrepared(700, "g3") // 405
    ).zipWithIndex.map { case (f, i) => (400L + i, f) }
    val (s, _) = newStream(cap = 10, fs = fs)
    // 'p' swaps streamed→prepared without opening a safe point; only K does
    assert(end(s, 400L, 1) === 405L)
    val p = s.planInputPartitions(LsnOffset(400L), LsnOffset(405L))(0)
      .asInstanceOf[LivePartition]
    val recs = LiveDecode.decode(p.relationFrames, p.frames, p.openTxid).toVector
    assert(recs.map(r => (r.columns("id"), r.txid)) === Vector(("20", 700L)))
  }

  test("a RELATION announced inside a streamed segment decodes then and in later batches") {
    // Real servers re-send RELATION inside every streamed transaction,
    // xid-prefixed ('R' + Int32 xid + body). The registry cache must
    // strip the prefix: it replays through a fresh decoder with no
    // stream context (ADVICE r8 high).
    val rel2 = RelationMeta(2, "public", "orders2", Vector(
      RelationColumn("id", 20, -1, 0), RelationColumn("v", 1043, -1, 0)))
    val v2: Seq[(Long, Array[Byte])] = Seq(
      e.streamStart(900), // 300: tx 900 opens
      e.streamed(900, e.relation(rel2)), // 301: relation announced INSIDE the segment
      e.streamed(900, e.insert(2, Seq(Some("1"), Some("a")))), // 302
      e.streamStop(), // 303
      e.streamCommit(900), // 304
      e.insert(2, Seq(Some("2"), Some("b"))) // 305: singleton in a LATER batch
    ).zipWithIndex.map { case (f, i) => (300L + i, f) }
    val (stream, _) = newStream(cap = Int.MaxValue, fs = v2)
    // batch 1: exactly the streamed tx (safe point = the stream commit)
    val e1 = end(stream, 0L, 1)
    assert(e1 === 304L)
    val p1 = stream.planInputPartitions(LsnOffset(0L), LsnOffset(e1))(0)
      .asInstanceOf[LivePartition]
    val recs1 = LiveDecode.decode(p1.relationFrames, p1.frames, p1.openTxid).toVector
    assert(recs1.map(r => (r.table, r.columns("id"), r.txid)) ===
      Vector(("orders2", "1", 900L)))
    // release the buffer (the streamed RELATION frame is gone from it);
    // batch 2's DML must decode via the cached, xid-stripped registry frame
    stream.commit(LsnOffset(e1))
    val e2 = end(stream, e1, 10)
    assert(e2 === 305L)
    val p2 = stream.planInputPartitions(LsnOffset(e1), LsnOffset(e2))(0)
      .asInstanceOf[LivePartition]
    val recs2 = LiveDecode.decode(p2.relationFrames, p2.frames, p2.openTxid).toVector
    assert(recs2.map(r => (r.table, r.columns("id"))) === Vector(("orders2", "2")))
  }

  test("commit(end) advances the slot and releases the buffer; relations survive") {
    val (stream, feed) = newStream(cap = 5)
    val e1 = end(stream, 0L, 2)
    assert(e1 === 104L)
    stream.commit(LsnOffset(e1))
    assert(feed.advanced.asScala.toSeq === Seq(104L))
    // next batch plans AFTER the buffer release; the RELATION frame (lsn
    // 100, already released) must still reach the decoder via the registry
    val e2 = end(stream, e1, 10)
    val p = stream.planInputPartitions(LsnOffset(e1), LsnOffset(e2))(0)
      .asInstanceOf[LivePartition]
    val recs = LiveDecode.decode(p.relationFrames, p.frames, p.openTxid).toVector
    assert(recs.map(_.columns("id")) === Vector("3", "4", "5", "6"))
    stream.commit(LsnOffset(e2))
    assert(feed.advanced.asScala.toSeq === Seq(104L, e2))
    stream.stop()
    assert(feed.closed.get())
  }

  test("equal-LSN frames are retained, keyed by arrival seq, and ack stays conservative") {
    // RELATION, BEGIN, and the first INSERT all report LSN 100 (pgjdbc's
    // getLastReceiveLSN can repeat across consecutive pgoutput messages);
    // the INSERT at 101 shares its LSN with the COMMIT. Every frame must
    // survive; the pre-composite stream dropped all but the first of each.
    val fs: Seq[(Long, Array[Byte])] = Seq(
      (100L, e.relation(rel)), (100L, e.begin()),
      (100L, e.insert(1, Seq(Some("1"), Some("a")))),
      (101L, e.insert(1, Seq(Some("2"), Some("b")))),
      (101L, e.commit()))
    val (stream, feed) = newStream(cap = Int.MaxValue, fs = fs)
    val eo = stream.latestOffset(LsnOffset(0L), ReadLimit.allAvailable())
      .asInstanceOf[LsnOffset]
    assert(eo === LsnOffset(101L, 1L)) // tx-safe point: the COMMIT's composite key
    val p = stream.planInputPartitions(LsnOffset(0L), eo)(0).asInstanceOf[LivePartition]
    val recs = LiveDecode.decode(p.relationFrames, p.frames, p.openTxid).toVector
    assert(recs.map(_.columns("id")) === Vector("1", "2"))
    assert(recs.map(_.txid).distinct === Vector(100L)) // both rows in tx BEGIN@100
    // ack is LSN-granular: more frames at lsn 101 could still arrive, so
    // the slot advances only to 100 — the 101-run redelivers after a crash
    // and the composite offset filters the duplicates
    stream.commit(eo)
    assert(feed.advanced.asScala.toSeq === Seq(100L))
  }

  test("end-to-end: readStream pgcdc-live delivers every record with tx scoping") {
    val id = s"e2e${System.nanoTime()}"
    ScriptedFrameSource.register(id, frames())
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-live").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val q = spark.readStream.format("pgcdc-live")
      .option("frameSource.class", classOf[ScriptedFrameSource].getName)
      .option("fixtureId", id)
      .option("maxBatchRecords", 5)
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= df.collect().map(r => (r.getAs[Long]("lsn"), r.getAs[Long]("txid"),
            r.getAs[Map[String, String]]("columns")("id")))
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = seen.synchronized(seen.sortBy(_._1).toVector)
    assert(got.map(_._3) === Vector("1", "2", "3", "4", "5", "6"))
    assert(got.map(_._2) === Vector(101L, 101L, 105L, 105L, 105L, 110L))
    // the slot was advanced (commit path) at least once by the run
    assert(ScriptedFrameSource.feeds(id).advanced.asScala.nonEmpty)
  }

  test("restart + slot redelivery: below-watermark frames are filtered, nothing lost or duplicated") {
    // run 1: consume the first batch only, then stop (checkpoint holds its
    // end offset; the mock's advance() stands in for the slot flush)
    val id1 = s"rs${System.nanoTime()}"
    ScriptedFrameSource.register(id1, frames())
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-live-rs").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    def run(fixtureId: String, trigger: org.apache.spark.sql.streaming.Trigger) = {
      val q = spark.readStream.format("pgcdc-live")
        .option("frameSource.class", classOf[ScriptedFrameSource].getName)
        .option("fixtureId", fixtureId)
        .option("maxBatchRecords", 2)
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= df.collect().map(_.getAs[Long]("lsn")) }; ()
        }
        .trigger(trigger).start()
      q
    }
    val q1 = run(id1, org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
    val deadline = System.currentTimeMillis() + 60000
    while (seen.synchronized(seen.isEmpty) && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    q1.stop()
    val firstSeen = seen.synchronized(seen.toVector)
    assert(firstSeen.nonEmpty && firstSeen.size < 6)

    // run 2 simulates PostgreSQL redelivering EVERYTHING after the slot's
    // flushed LSN on reconnect: a fresh feed carrying the full frame
    // sequence again. The restarted stream must (a) skip frames at or
    // below the checkpointed offset and (b) deliver the rest exactly.
    val id2 = s"rs2${System.nanoTime()}"
    ScriptedFrameSource.register(id2, frames())
    val q2 = run(id2, org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q2.awaitTermination(60000)
    val all = seen.synchronized(seen.toVector)
    assert(all.toSet === Set(102L, 103L, 106L, 107L, 108L, 110L), s"lsns=$all")
    // redelivery may only duplicate the batch in flight at the kill
    val dups = all.groupBy(identity).collect { case (l, occ) if occ.size > 1 => l }
    assert(dups.toSet.subsetOf(firstSeen.toSet), s"unexpected duplicates: $dups")
  }

  test("streaming TOAST e2e: live envelope -> typedView -> applyChanges keeps unchanged columns") {
    val relP = RelationMeta(1, "public", "docs", Vector(
      RelationColumn("id", 20, -1, 0), RelationColumn("name", 1043, -1, 0),
      RelationColumn("payload", 25, -1, 0))) // the TOAST-able column
    val fs: Seq[(Long, Array[Byte])] = Seq(
      e.relation(relP),
      e.begin(),
      e.insert(1, Seq(Some("1"), Some("a"), Some("big-toast-value"))),
      e.commit(),
      e.begin(),
      // UPDATE changes name; payload arrives as a 'u' (unchanged) cell
      e.update(1, Seq(Some("1"), Some("a2"), None), unchanged = Set(2)),
      e.commit()).zipWithIndex.map { case (f, i) => (100L + i, f) }
    val id = s"toast${System.nanoTime()}"
    ScriptedFrameSource.register(id, fs)
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-live-toast").toString
    import spark.implicits._
    var state = Seq.empty[(Long, String, String)].toDF("id", "name", "payload")
    val q = spark.readStream.format("pgcdc-live")
      .option("frameSource.class", classOf[ScriptedFrameSource].getName)
      .option("fixtureId", id)
      .option("maxBatchRecords", 1) // insert and update land in DIFFERENT batches
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val typed = Envelope.typedView(df, relP)
        state = Envelope.applyChanges(state, typed, Seq("id"))
        state = spark.createDataFrame( // materialize per batch (the consumer's table)
          spark.sparkContext.parallelize(state.collect().toSeq), state.schema)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = state.collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("name") === "a2")
    // the TOASTed payload must survive the merge, not become NULL
    assert(rows(0).getAs[String]("payload") === "big-toast-value")
  }

  test("typed view works over the live envelope (same schema as replay)") {
    val id = s"tv${System.nanoTime()}"
    ScriptedFrameSource.register(id, frames())
    val src = new ScriptedFrameSource(Map("fixtureId" -> id))
    val stream = new PgCdcLiveStream(src)
    val e1 = end(stream, 0L, Int.MaxValue)
    val p = stream.planInputPartitions(LsnOffset(0L), LsnOffset(e1))(0)
      .asInstanceOf[LivePartition]
    val recs = LiveDecode.decode(p.relationFrames, p.frames, p.openTxid).toVector
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(recs.map(r => org.apache.spark.sql.Row(
        r.op, r.lsn, r.txid, r.schema, r.table, r.columns, r.nulls, r.before, r.seq))),
      Envelope.schema)
    val typed = Envelope.typedView(df, rel).orderBy("lsn").collect()
    assert(typed.map(_.getAs[Long]("id")).toVector === Vector(1L, 2L, 3L, 4L, 5L, 6L))
  }
}
