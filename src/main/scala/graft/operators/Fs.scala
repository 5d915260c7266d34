package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Filesystem seam for the store-lifecycle layer (Manifests flip,
  * compaction GC, takedown swap, retention, sidecar upkeep, SCD2
  * snapshot GC): every path operation routes through the Hadoop
  * `FileSystem` API instead of `java.nio`/`java.io.File`, so the same
  * verbs run unchanged on a local disk (`file:` / bare paths — the
  * sandbox), HDFS (`hdfs://`), or an object store (`s3a://` etc.).
  * The reference has no store lifecycle at all (its sink is a consumer
  * callback, `CdcConsumer.java:6-12`); this is the deployment seam the
  * engine's own lifecycle verbs need at 100 TB, where the corpus never
  * lives on a single node's local filesystem.
  *
  * Semantics preserved from the local implementation:
  *  - `rename` is the atomicity primitive (atomic on HDFS and POSIX;
  *    on object stores the destination still APPEARS atomically as a
  *    complete object, and the Manifests commit protocol — a versioned
  *    manifest file selected by max epoch — never depends on
  *    rename-over-existing, which HDFS cannot express);
  *  - listings are status-based (one RPC per directory), never
  *    path-existence probes per child;
  *  - recursive delete is the filesystem's own (`delete(p, true)`),
  *    not a client-side walk.
  *
  * The active Spark session's Hadoop configuration is used when one
  * exists (so `fs.defaultFS`, S3 credentials, etc. are honored);
  * otherwise a plain `Configuration` (local defaults) — lifecycle
  * verbs that run before/without a session, e.g. a bare
  * [[Takedown.recover]], still work against local paths.
  */
object Fs {

  private def conf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Join path parts; the head may carry a scheme (`hdfs://…`). */
  def path(head: String, parts: String*): Path =
    parts.foldLeft(new Path(head))((p, c) => new Path(p, c))

  def fsOf(p: Path): FileSystem = p.getFileSystem(conf)

  def exists(p: Path): Boolean = fsOf(p).exists(p)

  def isDir(p: Path): Boolean = {
    val fs = fsOf(p)
    fs.exists(p) && fs.getFileStatus(p).isDirectory
  }

  def isFile(p: Path): Boolean = {
    val fs = fsOf(p)
    fs.exists(p) && fs.getFileStatus(p).isFile
  }

  def mkdirs(p: Path): Unit = { fsOf(p).mkdirs(p); () }

  /** All children of `p` (empty when `p` is absent / not a dir). */
  def list(p: Path): Seq[FileStatus] = {
    val fs = fsOf(p)
    if (!fs.exists(p) || !fs.getFileStatus(p).isDirectory) Nil
    else fs.listStatus(p).toIndexedSeq
  }

  /** Names of child DIRECTORIES of `p` (empty when absent). */
  def listDirNames(p: Path): Seq[String] =
    list(p).filter(_.isDirectory).map(_.getPath.getName)

  /** Small whole-file read (manifest-scale metadata only). */
  def readString(p: Path): String = {
    val fs = fsOf(p)
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Small whole-file write (overwrite). NOT a commit by itself — the
    * Manifests protocol writes to a dot-prefixed tmp and commits via
    * [[rename]] to a fresh (never-existing) destination. */
  def writeString(p: Path, s: String): Unit = {
    val fs = fsOf(p)
    val out = fs.create(p, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    ()
  }

  /** EXCLUSIVE small-file create: succeeds only if `p` did not exist
    * (`FileSystem.create(p, overwrite = false)` — atomic on HDFS and
    * the local FS; the lease primitive). Returns false when the file
    * already exists, throws on other IO failures. */
  def createExclusive(p: Path, s: String): Boolean = {
    val fs = fsOf(p)
    Option(p.getParent).foreach(fs.mkdirs(_))
    val out =
      try fs.create(p, false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => return false
        case _: java.io.IOException if fs.exists(p) => return false
      }
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    true
  }

  /** Rename `from` → `to` (parents created). CAVEAT: when `to` is an
    * EXISTING DIRECTORY, both HDFS and the local filesystem move the
    * source INSIDE it (POSIX rename-into-dir semantics) and report
    * success — they do not refuse. Callers that need
    * collision-on-existing semantics must check for the nested result
    * themselves (see GraftStoreRelation.landNextBatch, whose
    * nested-dir detection is the load-bearing race check). Atomic on
    * HDFS and local; on object stores the destination appears as a
    * complete object. Failures surface (no silent `false`). */
  def rename(from: Path, to: Path): Unit = {
    val fs = fsOf(to)
    Option(to.getParent).foreach(fs.mkdirs(_))
    if (!fs.rename(from, to))
      throw new java.io.IOException(s"rename failed: $from -> $to" +
        (if (fs.exists(to)) " (destination exists)" else ""))
  }

  /** Recursive delete, no-op on absence. */
  def rmTree(p: Path): Unit = {
    val fs = fsOf(p)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Delete one file, no-op on absence. */
  def rm(p: Path): Unit = {
    val fs = fsOf(p)
    if (fs.exists(p)) { fs.delete(p, false); () }
  }
}
