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

  def read(bytes: Array[Byte]): Vector[(Long, Array[Byte])] = {
    val buf = ByteBuffer.wrap(bytes)
    val out = Vector.newBuilder[(Long, Array[Byte])]
    while (buf.remaining() >= 12) {
      val lsn = buf.getLong()
      val len = buf.getInt()
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
        try {
          val lsn = in.readLong()
          val len = in.readInt()
          val frame = new Array[Byte](len)
          in.readFully(frame)
          out += lsn -> frame
        } catch { case _: EOFException => done = true }
      }
    } finally in.close()
    out.result()
  }
}
