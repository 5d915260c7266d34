package graft

import java.nio.ByteBuffer
import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.wal.{FrameFile, PgOutput, PgOutputDecoder, PgOutputEncoder => E}

/** CDC ingest throughput bench — the reference's actual workload (decode
  * pgoutput frames into records, single thread, `CdcEngine.java:89-138`)
  * vs this engine's two paths: the same single-threaded decode (parity
  * check) and the distributed batch replay (files = partitions). Prints
  * one JSON line with records/second. */
object BenchCdc {

  private val rel = PgOutput.RelationMeta(1, "public", "t", Vector(
    PgOutput.RelationColumn("id", 20, -1, 0),
    PgOutput.RelationColumn("name", 1043, -1, 0),
    PgOutput.RelationColumn("price", 1700, ((12 << 16) | 2) + 4, 0),
    PgOutput.RelationColumn("tags", 1009, -1, 0)))

  /** One segment: RELATION + txs of 100 inserts (the reference's default
    * maxBatchSize) until `rows` rows. */
  private def segment(rows: Int, seed: Int): Seq[(Long, Array[Byte])] = {
    val rnd = new scala.util.Random(seed)
    val frames = Seq.newBuilder[Array[Byte]]
    frames += E.relation(rel)
    var emitted = 0
    while (emitted < rows) {
      frames += E.begin()
      val n = math.min(100, rows - emitted)
      (0 until n).foreach { i =>
        frames += E.insert(1, Seq(
          Some((emitted + i).toString),
          Some("name-" + rnd.nextInt(1000000)),
          Some(f"${rnd.nextDouble() * 1000}%.2f"),
          Some(s"{a${rnd.nextInt(100)},b${rnd.nextInt(100)}}")))
      }
      emitted += n
      frames += E.commit()
    }
    frames.result().zipWithIndex.map { case (f, i) => (i.toLong, f) }
  }

  /** v2 twin of [[segment]]: the same rows arrive as STREAMED
    * transactions (S + xid-prefixed inserts + E + stream commit) —
    * measures what the proto-v2 segment framing and per-tx buffering
    * cost relative to plain v1 decode. */
  private def segmentV2(rows: Int, seed: Int): Seq[(Long, Array[Byte])] = {
    val rnd = new scala.util.Random(seed)
    val frames = Seq.newBuilder[Array[Byte]]
    frames += E.relation(rel)
    var emitted = 0
    var xid = 1000
    while (emitted < rows) {
      frames += E.streamStart(xid)
      val n = math.min(100, rows - emitted)
      (0 until n).foreach { i =>
        frames += E.streamed(xid, E.insert(1, Seq(
          Some((emitted + i).toString),
          Some("name-" + rnd.nextInt(1000000)),
          Some(f"${rnd.nextDouble() * 1000}%.2f"),
          Some(s"{a${rnd.nextInt(100)},b${rnd.nextInt(100)}}"))))
      }
      frames += E.streamStop()
      frames += E.streamCommit(xid)
      emitted += n
      xid += 1
    }
    frames.result().zipWithIndex.map { case (f, i) => (i.toLong, f) }
  }

  def main(args: Array[String]): Unit = {
    val rowsPerFile = 100000
    val nFiles = 8
    val dir = Files.createTempDirectory("cdcbench")
    (0 until nFiles).foreach { i =>
      FrameFile.write(dir.resolve(f"wal$i%02d.frames").toString, segment(rowsPerFile, i))
    }
    val v2Path = dir.resolve("wal_v2.frames").toString
    FrameFile.write(v2Path, segmentV2(rowsPerFile, 99))

    // single-thread decode (the reference's execution model)
    val frames0 = FrameFile.readPath(dir.resolve("wal00.frames").toString)
    def decodeAll(): Long = {
      val d = new PgOutputDecoder
      var n = 0L
      frames0.foreach { case (_, bytes) =>
        d.decode(ByteBuffer.wrap(bytes)) match {
          case Some(_: PgOutput.Change) => n += 1
          case _ => ()
        }
      }
      n
    }
    decodeAll() // warm
    val t0 = System.nanoTime()
    val n1 = decodeAll()
    val singleRate = n1 / ((System.nanoTime() - t0) / 1e9)

    // assembled-path twins (ReplayDecode: frame decode + ChangeRecord
    // construction; v2 additionally buffers per xid and emits at each
    // stream commit) — compare these two to price the v2 framing, not
    // v2 against the raw decode-only number above
    def assembled(fs: Vector[(Long, Array[Byte])]): Long =
      graft.sources.ReplayDecode.decode(fs, 0, fs.size).size.toLong
    assembled(frames0) // warm
    val tA = System.nanoTime()
    val nA = assembled(frames0)
    val v1AssembledRate = nA / ((System.nanoTime() - tA) / 1e9)
    val framesV2 = FrameFile.readPath(v2Path)
    assembled(framesV2) // warm
    val t2 = System.nanoTime()
    val n2 = assembled(framesV2)
    val v2Rate = n2 / ((System.nanoTime() - t2) / 1e9)

    // distributed batch replay (8 files, local[8])
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val glob = dir.toString + "/*.frames"
    graft.sources.ReplayDecode.batch(spark, glob).count() // warm
    val t1 = System.nanoTime()
    val total = graft.sources.ReplayDecode.batch(spark, glob).count()
    val distRate = total / ((System.nanoTime() - t1) / 1e9)

    println(s"""{"metric":"cdc_decode","unit":"records_per_sec",""" +
      s""""single_thread":${singleRate.round},""" +
      s""""single_thread_assembled":${v1AssembledRate.round},""" +
      s""""single_thread_v2_streamed":${v2Rate.round},""" +
      s""""distributed_8_files":${distRate.round},""" +
      s""""rows":${nFiles * rowsPerFile}}""")
    spark.stop()
  }
}
