package graft.wal

import java.io.{DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream}
import java.nio.ByteBuffer

/** Captured-WAL frame file: the replay container for the streaming source
  * (no live PostgreSQL in the sandbox — SURVEY.md §4.3 "file-replay CDC
  * source"). Layout: repeated `[int64 lsn][int32 len][len bytes pgoutput
  * frame]`, big-endian, LSNs strictly increasing within a file. */
object FrameFile {

  def write(path: String, frames: Seq[(Long, Array[Byte])]): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    try frames.foreach { case (lsn, bytes) =>
      out.writeLong(lsn); out.writeInt(bytes.length); out.write(bytes)
    } finally out.close()
  }

  /** Thrown when a file ends mid-frame (truncated header or body) —
    * corruption must not be silently masked as a clean end-of-stream. */
  final class CorruptFrameException(msg: String) extends java.io.IOException(msg)

  def read(bytes: Array[Byte]): Vector[(Long, Array[Byte])] = {
    val buf = ByteBuffer.wrap(bytes)
    val out = Vector.newBuilder[(Long, Array[Byte])]
    while (buf.remaining() > 0) {
      if (buf.remaining() < 12)
        throw new CorruptFrameException(
          s"truncated frame header: ${buf.remaining()} trailing bytes (need 12)")
      val lsn = buf.getLong()
      val len = buf.getInt()
      if (buf.remaining() < len)
        throw new CorruptFrameException(
          s"truncated frame body at lsn=$lsn: need $len bytes, have ${buf.remaining()}")
      val frame = new Array[Byte](len)
      buf.get(frame)
      out += lsn -> frame
    }
    out.result()
  }

  def readPath(path: String): Vector[(Long, Array[Byte])] = {
    val in = new DataInputStream(new FileInputStream(path))
    val out = Vector.newBuilder[(Long, Array[Byte])]
    try {
      var done = false
      while (!done) {
        // EOF is clean ONLY on the leading readLong (a frame boundary);
        // EOF inside the header or body is a truncated capture and throws.
        val lsn =
          try Some(in.readLong())
          catch { case _: EOFException => done = true; None }
        lsn.foreach { l =>
          try {
            val len = in.readInt()
            val frame = new Array[Byte](len)
            in.readFully(frame)
            out += l -> frame
          } catch {
            case _: EOFException =>
              throw new CorruptFrameException(s"truncated frame at lsn=$l in $path")
          }
        }
      }
    } finally in.close()
    out.result()
  }
}
