package graft.operators
object KernelBench {
  def main(args: Array[String]): Unit = {
    val urls = (0 until 50000).map { d =>
      val g = d % 25
      val qs = if (d % 2 == 0) s"?a=${g % 3}&b=${g % 2}" else s"?b=${g % 2}&a=${g % 3}"
      val trk = if (d % 4 == 0) "&utm_x=1" else ""
      s"http://src_${d % 10}.example.com/items/$g$qs$trk"
    }.toArray
    // warmup
    var sink = 0
    for (_ <- 0 until 5; u <- urls) sink += graft.operators.Urls.canonicalizeLocal(u, true).length
    val t0 = System.nanoTime()
    val reps = 20
    for (_ <- 0 until reps; u <- urls) sink += graft.operators.Urls.canonicalizeLocal(u, true).length
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"rows=${urls.length * reps} total=$dt%.3f s per-50k=${dt / reps}%.4f s sink=$sink")
  }
}
