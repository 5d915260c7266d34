package graft.sources

import java.nio.ByteBuffer
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.cdc.{ChangeRecord, Envelope}
import graft.wal.{FrameFile, PgOutput, PgOutputDecoder}

/** Replay decode shared by the batch and streaming paths: one captured
  * frame file/stream → ChangeRecords. Mirrors the reference's poll-loop
  * semantics (`CdcEngine.java:89-138`): txid scoping from BEGIN/COMMIT,
  * out-of-tx DML delivered standalone (txid = own lsn, the singleton path
  * `CdcEngine.java:125-127`), dropped frame types skipped. */
object ReplayDecode {

  /** Decode frames [emitFrom, emitUntil) of a frame sequence. The decoder
    * always consumes from frame 0 so the relation registry, txid state,
    * and streamed-transaction buffers are complete regardless of the
    * requested window (RELATION frames can long precede the DML
    * referencing them; a proto-v2 streamed tx's segments can long precede
    * its stream commit). */
  def decode(frames: Vector[(Long, Array[Byte])],
             emitFrom: Int, emitUntil: Int): Iterator[ChangeRecord] = {
    val decoder = new PgOutputDecoder
    var txid = -1L
    // proto v2 streamed-tx assembly: per top-level xid, buffered
    // (msgXid, record) pairs — resolved at StreamCommit (emit, in the
    // batch containing the commit frame) or StreamAbort (discard;
    // sub != top discards just the subtransaction's records)
    val pending = scala.collection.mutable.Map
      .empty[Int, scala.collection.mutable.ArrayBuffer[(Int, ChangeRecord)]]
    // proto v3 two-phase assembly: a prepared transaction's content
    // (b..P, or a streamed tx resolved by 'p') buffers per gid and is
    // DECIDED arbitrarily later — emitted whole in the batch containing
    // COMMIT PREPARED ('K'), discarded at ROLLBACK PREPARED ('r').
    // decode-from-0 makes the prepared-undecided window restart-safe:
    // a batch cut between P and K rebuilds the buffer on every replay.
    // Prepared records carry txid = the b frame's xid (unsigned).
    var prepGid: Option[String] = None
    var prepTx = -1L
    val prepared = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.ArrayBuffer[ChangeRecord]]
    // per-frame arrival seq within an equal-LSN run — (lsn, seq) totally
    // orders records (LSNs repeat across consecutive pgoutput frames)
    var seqLsn = Long.MinValue
    var seq = 0L
    def changeRec(op: Char, lsn: Long, tx: Long, meta: PgOutput.RelationMeta,
                  cells: PgOutput.Cells, before: PgOutput.Cells): ChangeRecord =
      ChangeRecord(
        op = op.toString, lsn = lsn, txid = tx,
        schema = meta.schema, table = meta.table,
        columns = cells.collect { case (k, Some(v)) => k -> v },
        nulls = cells.collect { case (k, None) => k }.toVector.sorted,
        before = before.collect { case (k, Some(v)) => k -> v },
        seq = seq)
    // one op='T' record per truncated relation (no cells) — the
    // table-wide wipe marker applyChanges honors
    def truncRecs(lsn: Long, tx: Long, metas: Vector[PgOutput.RelationMeta]): Seq[ChangeRecord] =
      metas.map(m => ChangeRecord("T", lsn, tx, m.schema, m.table,
        Map.empty, Vector.empty, Map.empty, seq))
    frames.iterator.take(emitUntil).zipWithIndex.flatMap { case ((lsn, bytes), idx) =>
      if (lsn == seqLsn) seq += 1L else { seqLsn = lsn; seq = 0L }
      // route a record: into the open prepared buffer (regardless of the
      // emit window — the decision frame decides where it emits), else
      // emitted inline when inside the window
      def route(rec: => ChangeRecord): Seq[ChangeRecord] = prepGid match {
        case Some(g) => prepared(g) += rec; Nil
        case None => if (idx >= emitFrom) Seq(rec) else Nil
      }
      def routeAll(recs: => Seq[ChangeRecord]): Seq[ChangeRecord] = prepGid match {
        case Some(g) => prepared(g) ++= recs; Nil
        case None => if (idx >= emitFrom) recs else Nil
      }
      def curTx: Long = if (prepGid.isDefined) prepTx else if (txid >= 0) txid else lsn
      decoder.decode(ByteBuffer.wrap(bytes)) match {
        case Some(PgOutput.Begin) => txid = lsn; Nil
        case Some(PgOutput.Commit) => txid = -1L; Nil
        case Some(PgOutput.BeginPrepare(_, _, xid, gid)) =>
          prepGid = Some(gid); prepTx = xid.toLong & 0xffffffffL
          prepared.getOrElseUpdate(gid, scala.collection.mutable.ArrayBuffer.empty)
          Nil
        case Some(_: PgOutput.Prepare) => prepGid = None; Nil
        case Some(PgOutput.CommitPrepared(_, _, _, gid)) =>
          // unknown gid (decided before the capture started): nothing
          // buffered, nothing to deliver
          val recs = prepared.remove(gid).map(_.toSeq).getOrElse(Nil)
          if (idx >= emitFrom) recs else Nil
        case Some(PgOutput.RollbackPrepared(_, _, _, gid)) =>
          prepared.remove(gid); Nil
        case Some(PgOutput.StreamPrepare(_, _, xid, gid)) =>
          // a streamed tx's segments resolve into the prepared-undecided
          // state instead of applying — K/r decide later
          prepared(gid) = pending.remove(xid)
            .map(_.map(_._2)).getOrElse(scala.collection.mutable.ArrayBuffer.empty)
          Nil
        case Some(PgOutput.Change(op, meta, cells, before)) =>
          route(changeRec(op, lsn, curTx, meta, cells, before))
        case Some(PgOutput.Truncate(metas, _, _)) =>
          routeAll(truncRecs(lsn, curTx, metas))
        case Some(m: PgOutput.LogicalMessage) =>
          // transactional: scoped to the enclosing tx; non-transactional:
          // standalone at its own position (txid = own lsn, like the
          // out-of-tx DML singleton path) — and never buffered into a
          // prepared tx (it does not belong to it)
          if (m.transactional)
            route(Envelope.messageRecord(lsn, if (prepGid.isDefined) prepTx
              else if (txid >= 0) txid else lsn, m, seq))
          else if (idx >= emitFrom) Seq(Envelope.messageRecord(lsn, lsn, m, seq))
          else Nil
        case Some(tm: PgOutput.TypeMessage) =>
          route(Envelope.typeRecord(lsn, curTx, tm, seq))
        case Some(om: PgOutput.OriginMessage) =>
          // ORIGIN tags the enclosing transaction (sent just after BEGIN
          // in cascaded setups) — scope it like transactional messages
          route(Envelope.originRecord(lsn, curTx, om, seq))
        case Some(PgOutput.Streamed(top, msgXid, PgOutput.Change(op, meta, cells, before))) =>
          // buffered regardless of the emit window — the commit decides
          pending.getOrElseUpdate(top, scala.collection.mutable.ArrayBuffer.empty) +=
            ((msgXid, changeRec(op, lsn, top.toLong & 0xffffffffL, meta, cells, before)))
          Nil
        case Some(PgOutput.Streamed(top, msgXid, PgOutput.Truncate(metas, _, _))) =>
          pending.getOrElseUpdate(top, scala.collection.mutable.ArrayBuffer.empty) ++=
            truncRecs(lsn, top.toLong & 0xffffffffL, metas).map((msgXid, _))
          Nil
        case Some(PgOutput.Streamed(top, msgXid, m: PgOutput.LogicalMessage)) =>
          // transactional messages ride the streamed tx (and vanish with
          // its abort); non-transactional ones bypass the buffer
          if (m.transactional) {
            pending.getOrElseUpdate(top, scala.collection.mutable.ArrayBuffer.empty) +=
              ((msgXid, Envelope.messageRecord(lsn, top.toLong & 0xffffffffL, m, seq)))
            Nil
          } else if (idx >= emitFrom) Seq(Envelope.messageRecord(lsn, lsn, m, seq))
          else Nil
        case Some(PgOutput.Streamed(top, msgXid, tm: PgOutput.TypeMessage)) =>
          // type announcements inside a streamed tx vanish with its abort
          pending.getOrElseUpdate(top, scala.collection.mutable.ArrayBuffer.empty) +=
            ((msgXid, Envelope.typeRecord(lsn, top.toLong & 0xffffffffL, tm, seq)))
          Nil
        case Some(PgOutput.StreamCommit(top, _, _)) =>
          val recs = pending.remove(top).map(_.map(_._2).toSeq).getOrElse(Nil)
          if (idx >= emitFrom) recs else Nil
        case Some(PgOutput.StreamAbort(top, sub)) =>
          if (sub == top) pending.remove(top)
          else pending.get(top).foreach(_.filterInPlace(_._1 != sub))
          Nil
        case _ => Nil
      }
    }
  }

  /** Distributed batch replay: files are the unit of parallelism (each
    * captured WAL segment decodes independently — executors decode, the
    * driver only lists files). */
  def batch(spark: SparkSession, pathGlob: String): Dataset[ChangeRecord] = {
    implicit val enc = Encoders.product[ChangeRecord]
    spark.read.format("binaryFile").load(pathGlob)
      .select("content")
      .as(Encoders.BINARY)
      .mapPartitions(_.flatMap { bytes =>
        val frames = FrameFile.read(bytes)
        decode(frames, 0, frames.size)
      })
  }

  def batchDf(spark: SparkSession, pathGlob: String): DataFrame = batch(spark, pathGlob).toDF()
}

/** DataSourceV2 streaming source replaying a captured pgoutput frame file
  * as micro-batches — the Spark-native counterpart of the reference's
  * poll loop + tx assembly (`CdcEngine.java:84-138`, A4/A11/A12):
  *
  *  - offsets are frame positions whose LSN is checkpointed by Spark's
  *    offset log → restart resumes exactly where the last batch ended
  *    (the reference's `setFlushedLSN` ack, upgraded to effective
  *    exactly-once by the checkpoint, SURVEY.md §7.3.1);
  *  - batch boundaries only land on transaction-safe points (no open tx),
  *    so a micro-batch always contains whole transactions — the
  *    reference's tx-atomic delivery (A11); `maxFramesPerTrigger` bounds
  *    batch size like `maxBatchSize` bounds the reference's batches, but
  *    snapped to the next safe point rather than mid-tx flushed;
  *  - `commit(end)` is where a live source would advance the replication
  *    slot's flushed LSN (A12); for replay it's a no-op.
  *
  * Usage: `spark.readStream.format("pgcdc-replay").option("path", f).load()`.
  */
class PgCdcReplayProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "pgcdc-replay"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PgCdcReplayTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new PgCdcReplayTable(properties.asScala.toMap)
}

object PgCdcReplayTable {
  val schema: StructType = ExpressionEncoder[ChangeRecord]().schema
}

class PgCdcReplayTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"pgcdc-replay(${options.getOrElse("path", "?")})"
  override def schema(): StructType = PgCdcReplayTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = PgCdcReplayTable.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new PgCdcReplayStream(
            options.getOrElse("path", sys.error("pgcdc-replay: 'path' option required")),
            options.get("maxFramesPerTrigger").map(_.toInt).getOrElse(Int.MaxValue),
            options.get("allowMidTxFlush").exists(_.toBoolean))
      }
    }
}

final case class FrameOffset(frame: Int) extends Offset {
  override def json(): String = s"""{"frame":$frame}"""
}

class PgCdcReplayStream(path: String, maxFramesPerTrigger: Int,
                        allowMidTxFlush: Boolean = false) extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  // Driver-side index: frame boundaries where no transaction is open —
  // the only legal batch cut points (tx atomicity, A11). Cheap: one pass
  // over frame headers + first bytes.
  private lazy val frames: Vector[(Long, Array[Byte])] = FrameFile.readPath(path)
  private lazy val safePoints: Vector[Int] = {
    var open = false
    // proto v2: a streamed tx stays open from its first 'S' segment until
    // its stream commit 'c' (or whole-tx abort) — a safe point requires
    // no open v1 tx AND no unresolved streamed tx
    val streamed = scala.collection.mutable.Set.empty[Int]
    val pts = Vector.newBuilder[Int]
    pts += 0
    frames.zipWithIndex.foreach { case ((_, bytes), i) =>
      bytes(0).toChar match {
        case 'B' => open = true
        case 'C' => open = false
        // v3 2PC: the b..P content phase must not split (same rule as
        // B..C); the prepared-UNDECIDED window P..K/r IS cuttable here —
        // replay re-decodes from frame 0, so the buffer rebuilds and the
        // tx still delivers whole in the batch containing its decision
        case 'b' => open = true
        case 'P' => open = false
        case 'S' => streamed += ByteBuffer.wrap(bytes, 1, 4).getInt
        case 'c' => streamed -= ByteBuffer.wrap(bytes, 1, 4).getInt
        // STREAM PREPARE resolves the streamed segments into the
        // prepared-undecided state: xid sits after tag+flags+3×Int64
        case 'p' => streamed -= ByteBuffer.wrap(bytes, 26, 4).getInt
        case 'A' =>
          val top = ByteBuffer.wrap(bytes, 1, 4).getInt
          if (ByteBuffer.wrap(bytes, 5, 4).getInt == top) streamed -= top
        case _ => ()
      }
      if (!open && streamed.isEmpty) pts += (i + 1)
    }
    pts.result().distinct
  }

  override def initialOffset(): Offset = FrameOffset(0)

  override def deserializeOffset(json: String): Offset =
    FrameOffset("""\d+""".r.findFirstIn(json).map(_.toInt).getOrElse(0))

  override def getDefaultReadLimit: ReadLimit =
    if (maxFramesPerTrigger == Int.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxFramesPerTrigger.toLong)

  /** Admission control: advance from `start` by the rate limit, snapped
    * back to the furthest tx-safe point. When a single transaction
    * exceeds the limit: by default advance to the NEXT safe point so the
    * whole tx still ships in one batch (atomicity over memory);
    * with `allowMidTxFlush=true`, cut AT the limit even mid-tx — the
    * reference's overflow flush (`CdcEngine.java:121-124`), bounding
    * batch memory for pathological transactions at the cost of
    * batch-level atomicity for that tx (decode-from-0 keeps txids
    * correct across the cut; at-least-once redelivery on a crash between
    * the two halves is absorbed by the idempotent applyChanges MERGE).
    * Stateless: restart recovery needs no driver state beyond the
    * checkpointed offset. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[FrameOffset].frame
    val cap = limit match {
      case r: ReadMaxRows => r.maxRows().min(Int.MaxValue.toLong).toInt
      case _ => Int.MaxValue
    }
    val target = math.min(frames.size.toLong, s.toLong + cap).toInt
    val snapped = safePoints.filter(_ <= target).lastOption.getOrElse(0)
    if (snapped > s) FrameOffset(snapped)
    else if (allowMidTxFlush && target > s) FrameOffset(target)
    else FrameOffset(safePoints.find(_ > s).getOrElse(s))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used via SupportsAdmissionControl")

  override def reportLatestOffset(): Offset = FrameOffset(frames.size)

  /** Replay files are immutable — nothing to snapshot for AvailableNow. */
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FrameOffset].frame
    val e = end.asInstanceOf[FrameOffset].frame
    Array(ReplayPartition(path, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[ReplayPartition]
      new PartitionReader[InternalRow] {
        private val serializer =
          ExpressionEncoder[ChangeRecord]().createSerializer()
        private val it = {
          val fs = FrameFile.readPath(p.path)
          ReplayDecode.decode(fs, p.from, p.until)
        }
        private var current: InternalRow = _
        override def next(): Boolean =
          if (it.hasNext) { current = serializer(it.next()).copy(); true } else false
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }

  /** Live-source analogue: advance the slot's flushed/applied LSN
    * (`CdcEngine.java:132-137`). Replay keeps its progress in Spark's
    * checkpoint, so nothing to do here. */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

final case class ReplayPartition(path: String, from: Int, until: Int) extends InputPartition
