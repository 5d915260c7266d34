package graft

import org.apache.spark.sql.SparkSession
import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** Dev diagnostic for the in-sweep stall class (VERDICT r18 wrong #1):
  * runs named queries with the Bench iteration protocol and prints, per
  * iteration, the wall time alongside JVM-health deltas — GC count/time,
  * JIT compilation time, code-cache / metaspace / heap occupancy — so a
  * stalled iteration self-identifies as GC-bound, compile-bound, or
  * neither. Usage:
  *
  *   sbt "runMain graft.BenchDiag /root/testdata/sf0.1 q29_lang_id:12 q105_pipeline_v4:8"
  *
  * (`:N` = timed iterations after one warmup; default 5.)
  */
object BenchDiag {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchDiag <sfDir> <query[:iters]>...")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("FATAL")

    val gcs = ManagementFactory.getGarbageCollectorMXBeans.asScala
    val jit = ManagementFactory.getCompilationMXBean
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
    def poolUsed(prefix: String): Long =
      pools.filter(_.getName.startsWith(prefix)).map(_.getUsage.getUsed).sum
    def snap(): (Long, Long, Long) =
      (gcs.map(_.getCollectionCount).sum, gcs.map(_.getCollectionTime).sum,
        jit.getTotalCompilationTime)

    // --sweep reproduces the full Bench order (all non-_check queries,
    // name-sorted, warmup + 5) so a sweep-state-dependent stall lands on
    // a diagnosed iteration
    val specs =
      if (args.lift(1).contains("--sweep"))
        SparkEntry.queries.toSeq.filterNot(_._1.contains("_check"))
          .map(_._1).sorted
      else args.drop(1).toSeq
    val t00 = System.nanoTime()
    specs.foreach { spec =>
      val (name, iters) = spec.split(":") match {
        case Array(n)    => (n, 5)
        case Array(n, i) => (n, i.toInt)
      }
      val fn = SparkEntry.queries(name)
      def one(tag: String): Double = {
        val (gc0, gt0, jt0) = snap()
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        val t = (System.nanoTime() - t0) / 1e9
        val drained = graft.operators.Storage.releaseAll(blocking = true)
        if (drained > 0) System.gc()
        val (gc1, gt1, jt1) = snap()
        val heap = ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
        val el = (System.nanoTime() - t00) / 1e9
        println(f"$el%7.1f $name%-22s $tag%-6s t=$t%7.3f  gc=+${gc1 - gc0}%3d ${(gt1 - gt0) / 1000.0}%6.2fs  " +
          f"jit=+${(jt1 - jt0) / 1000.0}%6.2fs  code=${poolUsed("CodeHeap") >> 20}%4dMB  " +
          f"meta=${poolUsed("Metaspace") >> 20}%4dMB  heap=${heap.getUsed >> 20}%5d/${heap.getMax >> 20}MB")
        t
      }
      one("warm")
      (1 to iters).foreach(i => one(s"it$i"))
      graft.operators.Storage.releaseAll()
      System.gc(); Thread.sleep(300)
    }
    spark.stop()
  }
}
