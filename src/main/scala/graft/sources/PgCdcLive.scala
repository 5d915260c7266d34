package graft.sources

import java.nio.ByteBuffer
import java.util.{Map => JMap}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.cdc.ChangeRecord
import graft.wal.{PgOutput, PgOutputDecoder}

/** Where live pgoutput frames come from — the seam between the engine and
  * the PostgreSQL wire. A deployment implements this over pgjdbc's
  * `PGReplicationStream` (no JDBC driver ships in this library):
  *
  * {{{
  * class PgJdbcFrameSource(opts: Map[String, String]) extends ReplicationFrameSource {
  *   private val conn = DriverManager.getConnection(opts("url"),
  *     props(LivePgBootstrap.replicationProperties()))          // A1
  *   // slot/publication bootstrap via LivePgBootstrap.*Sql     // A2, A3
  *   private val stream = conn.unwrap(classOf[PGConnection]).getReplicationAPI
  *     .replicationStream().logical().withSlotName(opts("slot"))
  *     .withSlotOptions(LivePgBootstrap.slotOptions(opts("publication")))
  *     .start()                                                  // CdcEngine.java:68-84
  *   def poll() = Option(stream.readPending())
  *     .map(b => (stream.getLastReceiveLSN.asLong, toBytes(b)))
  *   def advance(lsn: Long) = {                                  // A12
  *     stream.setFlushedLSN(LogSequenceNumber.valueOf(lsn))
  *     stream.setAppliedLSN(LogSequenceNumber.valueOf(lsn))
  *     stream.forceUpdateStatus()                                // CdcEngine.java:132-137
  *   }
  *   def close() = { stream.close(); conn.close() }
  * }
  * }}}
  */
trait ReplicationFrameSource extends AutoCloseable {
  /** Non-blocking: the next (lsn, pgoutput frame) if one is pending. */
  def poll(): Option[(Long, Array[Byte])]
  /** Confirm everything at or below `lsn` durably consumed (slot flush). */
  def advance(lsn: Long): Unit
}

/** Live CDC source: `spark.readStream.format("pgcdc-live")
  *   .option("frameSource.class", classOf[MySource].getName) ... .load()`.
  *
  * The MicroBatchStream sibling of `PgCdcReplayStream` whose frames come
  * from a replication socket instead of a capture file (VERDICT r1 #5,
  * reference lifecycle `CdcEngine.java:68-84`):
  *
  *  - the replication connection is a SINGLE serial stream (one walsender
  *    per slot — the same constraint the reference engine runs under), so
  *    frames buffer on the driver and the offset is the frame LSN;
  *    parallelism begins downstream of the source;
  *  - batch boundaries snap to tx-safe points exactly like replay; with
  *    `maxBatchRecords` + `allowMidTxFlush=true` an oversized transaction
  *    is cut mid-tx (the reference's overflow flush,
  *    `CdcEngine.java:121-124`) — memory stays bounded at the cost of
  *    batch-level atomicity for that tx, and the open txid is carried
  *    into the next batch so records still group correctly;
  *  - `commit(end)` advances the slot (`ReplicationFrameSource.advance`,
  *    the reference's `setFlushedLSN`/`forceUpdateStatus`) and releases
  *    the driver buffer up to `end`;
  *  - crash recovery: offsets the checkpoint committed but the slot never
  *    acked are REDELIVERED by PostgreSQL on reconnect; frames at or
  *    below the restart offset are filtered by LSN — the same
  *    at-least-once-upgraded-to-effective-exactly-once contract as
  *    replay (SURVEY.md §7.3.1).
  */
class PgCdcLiveProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "pgcdc-live"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PgCdcReplayTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new PgCdcLiveTable(properties.asScala.toMap)
}

class PgCdcLiveTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String =
    s"pgcdc-live(${options.getOrElse("frameSource.class", "?")})"
  override def schema(): StructType = PgCdcReplayTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = PgCdcReplayTable.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new PgCdcLiveStream(
            PgCdcLiveStream.instantiateSource(options),
            maxBatchRecords =
              options.get("maxBatchRecords").map(_.toInt).getOrElse(Int.MaxValue),
            allowMidTxFlush =
              options.get("allowMidTxFlush").exists(_.toBoolean))
      }
    }
}

/** LSN offset (monotone; PostgreSQL LSNs are 64-bit). */
final case class LsnOffset(lsn: Long) extends Offset {
  override def json(): String = s"""{"lsn":$lsn}"""
}

object PgCdcLiveStream {
  /** Reflective factory: `frameSource.class` names a
    * ReplicationFrameSource with a `(Map[String, String])` or no-arg
    * constructor — the seam that lets a pgjdbc-backed implementation plug
    * in without this library shipping a JDBC driver. */
  def instantiateSource(options: Map[String, String]): ReplicationFrameSource = {
    val cls = Class.forName(options.getOrElse("frameSource.class",
      sys.error("pgcdc-live: 'frameSource.class' option required")))
    val inst =
      cls.getConstructors.find(_.getParameterTypes.toSeq == Seq(classOf[Map[_, _]])) match {
        case Some(c) => c.newInstance(options)
        case None => cls.getDeclaredConstructor().newInstance()
      }
    inst.asInstanceOf[ReplicationFrameSource]
  }
}

class PgCdcLiveStream(source: ReplicationFrameSource,
                      maxBatchRecords: Int = Int.MaxValue,
                      allowMidTxFlush: Boolean = false)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  // AvailableNow: snapshot the socket's high-water mark at trigger start;
  // batches pace toward it under the admission cap and never pass it.
  private var availableNowTarget: Long = Long.MaxValue

  override def prepareForTriggerAvailableNow(): Unit = synchronized {
    drain()
    availableNowTarget = lastPolledLsn
  }

  // Driver-side frame buffer between socket and batch planning. Frames
  // stay buffered until commit(end) acks them to the slot — a crash loses
  // only unacked frames, which PostgreSQL redelivers.
  private val buffer = mutable.ArrayDeque.empty[(Long, Array[Byte])]
  // Latest RELATION frame per relation OID, prepended to every batch so
  // executors can decode without history (PostgreSQL sends RELATION once
  // per session, not per batch — the registry is driver state, mirroring
  // the reference's decoder registry, PgWalMessageDecoder.java:39).
  private val relationFrames = mutable.LinkedHashMap.empty[Int, (Long, Array[Byte])]
  // txid open at each buffered frame boundary, for mid-tx batch starts.
  private var openTxidAtBufferHead: Long = -1L
  private var lastPolledLsn: Long = 0L

  private def isRelation(bytes: Array[Byte]): Boolean = bytes.nonEmpty && bytes(0) == 'R'.toByte

  /** Pull pending frames off the socket into the buffer (bounded per call
    * to keep latestOffset prompt). */
  private def drain(maxPull: Int = 65536): Unit = synchronized {
    var pulled = 0
    var more = true
    while (more && pulled < maxPull) {
      source.poll() match {
        case Some((lsn, bytes)) if lsn > lastPolledLsn =>
          lastPolledLsn = lsn
          if (isRelation(bytes)) {
            val oid = ByteBuffer.wrap(bytes, 1, 4).getInt
            relationFrames(oid) = (lsn, bytes)
          }
          buffer.append((lsn, bytes))
          pulled += 1
        case Some(_) => () // redelivered below-watermark frame: drop
        case None => more = false
      }
    }
  }

  override def initialOffset(): Offset = LsnOffset(0L)

  override def deserializeOffset(json: String): Offset =
    LsnOffset("""\d+""".r.findFirstIn(json).map(_.toLong).getOrElse(0L))

  override def getDefaultReadLimit: ReadLimit =
    if (maxBatchRecords == Int.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxBatchRecords.toLong)

  /** Advance from `start` by the admission limit, snapped to a tx-safe
    * LSN; an oversized open tx either extends the batch to its COMMIT
    * (atomic mode, the default) or — with allowMidTxFlush — cuts at the
    * cap (the reference's overflow flush). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = synchronized {
    drain()
    val s = start.asInstanceOf[LsnOffset].lsn
    val cap = limit match {
      case r: ReadMaxRows => r.maxRows().min(Int.MaxValue.toLong).toInt
      case _ => Int.MaxValue
    }
    val pending = buffer.iterator
      .filter { case (lsn, _) => lsn > s && lsn <= availableNowTarget }.toVector
    if (pending.isEmpty) return LsnOffset(s)
    var open = openTxidAt(s) >= 0
    var safeWithinCap = -1L // furthest tx-safe lsn in the first `cap` frames
    var firstSafeBeyond = -1L // first tx-safe lsn past the cap (atomic fallback)
    var atCap = -1L // lsn of the cap'th frame (overflow cut point)
    var n = 0
    pending.foreach { case (lsn, bytes) =>
      n += 1
      bytes.headOption.map(_.toChar) match {
        case Some('B') => open = true
        case Some('C') => open = false
        case _ => ()
      }
      if (!open) {
        if (n <= cap) safeWithinCap = lsn
        else if (firstSafeBeyond < 0) firstSafeBeyond = lsn
      }
      if (n == cap) atCap = lsn
    }
    if (safeWithinCap >= 0) LsnOffset(safeWithinCap) // atomic batch within the cap
    else if (allowMidTxFlush && atCap >= 0) LsnOffset(atCap) // overflow flush: cut mid-tx
    else if (firstSafeBeyond >= 0) LsnOffset(firstSafeBeyond) // extend to the tx's COMMIT
    else LsnOffset(s) // tx open beyond everything buffered: wait for more
  }

  /** txid of the transaction open just after LSN `at` (scan of the buffer
    * head — frames below the committed watermark are released, so this is
    * O(buffered)). -1 when no tx is open. */
  private def openTxidAt(at: Long): Long = {
    var txid = openTxidAtBufferHead
    buffer.iterator.takeWhile(_._1 <= at).foreach { case (lsn, bytes) =>
      bytes.headOption.map(_.toChar) match {
        case Some('B') => txid = lsn
        case Some('C') => txid = -1L
        case _ => ()
      }
    }
    txid
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used via SupportsAdmissionControl")

  override def reportLatestOffset(): Offset = synchronized { LsnOffset(lastPolledLsn) }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = synchronized {
    val s = start.asInstanceOf[LsnOffset].lsn
    val e = end.asInstanceOf[LsnOffset].lsn
    // On restart the buffer may not yet hold (s, e]: drain until it does
    // (PostgreSQL resends everything after the slot's flushed LSN).
    var tries = 0
    while (lastPolledLsn < e && tries < 1000) { drain(); tries += 1 }
    val slice = buffer.iterator.filter { case (lsn, _) => lsn > s && lsn <= e }.toVector
    // Relation registry snapshot for frames the slice can reference.
    val rels = relationFrames.values.filter(_._1 <= e).toVector
    Array(LivePartition(rels, slice, openTxidAt(s)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[LivePartition]
      new PartitionReader[InternalRow] {
        private val serializer = ExpressionEncoder[ChangeRecord]().createSerializer()
        private val it = LiveDecode.decode(p.relationFrames, p.frames, p.openTxid)
        private var current: InternalRow = _
        override def next(): Boolean =
          if (it.hasNext) { current = serializer(it.next()).copy(); true } else false
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }

  /** Slot ack (A12): everything at or below `end` is durably processed —
    * advance the slot's flushed LSN and release the driver buffer. */
  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[LsnOffset].lsn
    source.advance(e)
    openTxidAtBufferHead = openTxidAt(e)
    while (buffer.nonEmpty && buffer.head._1 <= e) buffer.removeHead()
  }

  override def stop(): Unit = source.close()
}

final case class LivePartition(relationFrames: Vector[(Long, Array[Byte])],
                               frames: Vector[(Long, Array[Byte])],
                               openTxid: Long) extends InputPartition

/** Decode for live slices: relation registry seeded from the snapshot,
  * txid seeded from the open transaction at the slice start (so an
  * overflow-flushed tx's tail records keep their txid). */
object LiveDecode {
  def decode(relationFrames: Vector[(Long, Array[Byte])],
             frames: Vector[(Long, Array[Byte])],
             initialTxid: Long): Iterator[ChangeRecord] = {
    val decoder = new PgOutputDecoder
    relationFrames.foreach { case (_, bytes) => decoder.decode(ByteBuffer.wrap(bytes)) }
    var txid = initialTxid
    frames.iterator.flatMap { case (lsn, bytes) =>
      decoder.decode(ByteBuffer.wrap(bytes)) match {
        case Some(PgOutput.Begin) => txid = lsn; None
        case Some(PgOutput.Commit) => txid = -1L; None
        case Some(PgOutput.Change(op, meta, cells, before)) =>
          Some(ChangeRecord(
            op = op.toString,
            lsn = lsn,
            txid = if (txid >= 0) txid else lsn,
            schema = meta.schema,
            table = meta.table,
            columns = cells.collect { case (k, Some(v)) => k -> v },
            nulls = cells.collect { case (k, None) => k }.toVector.sorted,
            before = before.collect { case (k, Some(v)) => k -> v }))
        case _ => None
      }
    }
  }
}
