package graft.operators

/** The shared commit protocol for store compaction (text corpus store
  * and IVF index store): a consolidated epoch directory under an
  * underscore-prefixed `_compaction` dir (invisible to Spark's file
  * index, so half-written epochs can never leak into readers) plus a
  * tiny manifest JSON whose ATOMIC replace is the single commit point.
  * Readers construct their view from the manifest alone; superseded
  * inputs are garbage the best-effort GC may or may not have removed.
  */
object Manifests {

  val CompactDir = "_compaction"

  /** Read a store's committed (epoch, coversUpTo), if any. */
  def read(storeDir: String): Option[(Long, Long)] = {
    val m = java.nio.file.Paths.get(storeDir, CompactDir, "manifest.json")
    if (!java.nio.file.Files.isRegularFile(m)) None
    else {
      val s = java.nio.file.Files.readString(m)
      val re = """"epoch"\s*:\s*(\d+).*"covers_upto"\s*:\s*(-?\d+)""".r
      re.findFirstMatchIn(s).map(g => (g.group(1).toLong, g.group(2).toLong))
    }
  }

  /** Path of an epoch's consolidated data. */
  def epochPath(storeDir: String, epoch: Long): String =
    s"$storeDir/$CompactDir/epoch-$epoch"

  /** Commit an epoch: tmp write + atomic move. Everything before this
    * call is invisible; everything after it is the new view. */
  def flip(storeDir: String, epoch: Long, coversUpTo: Long): Unit = {
    val mdir = java.nio.file.Paths.get(storeDir, CompactDir)
    java.nio.file.Files.createDirectories(mdir)
    val tmp = mdir.resolve(".manifest.tmp")
    java.nio.file.Files.writeString(tmp,
      s"""{"epoch":$epoch,"covers_upto":$coversUpTo}""")
    java.nio.file.Files.move(tmp, mdir.resolve("manifest.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Recursive delete, no-op on absence — for best-effort GC of
    * superseded inputs (readers never depend on it). */
  def rmTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => { java.nio.file.Files.deleteIfExists(q); () })
}
