package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Layout operators: the assertions inspect the PHYSICAL plan — the
  * point of bucketing is the absence of exchanges, not the row values. */
class LayoutSpec extends SparkSpec {

  test("bucketed tables join and aggregate with zero shuffle exchanges") {
    val wh = Files.createTempDirectory("wh").toString
    // unique table names: the catalog is shared across suites and sbt
    // runs suites in parallel — fixed names collide (flaky full runs)
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val (tOrders, tLineitem) = (s"b_orders_$tag", s"b_lineitem_$tag")
    val orders = Tables.load(spark, sfDir, "orders")
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    try {
      Layout.writeBucketed(orders.withColumnRenamed("o_orderkey", "okey"), tOrders, "okey", 4, Some(wh))
      Layout.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "okey"), tLineitem, "okey", 4, Some(wh))

      val joined = Layout.coLocatedJoin(spark, tOrders, tLineitem, "okey")
        .groupBy("okey").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"), s"expected exchange-free plan:\n$plan")
      // and it is still correct
      val viaShuffle = orders.join(lineitem, col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.agg(sum("n")).collect()(0).getLong(0) === viaShuffle)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tOrders")
      spark.sql(s"DROP TABLE IF EXISTS $tLineitem")
    }
  }

  test("zValue interleaves bits exactly (reference implementation parity)") {
    def spreadRef(x: Long): Long = {
      var v = 0L
      var i = 0
      while (i < 16) { v |= ((x >> i) & 1L) << (2 * i); i += 1 }
      v
    }
    def zRef(a: Long, b: Long): Long = spreadRef(a & 0xFFFF) | (spreadRef(b & 0xFFFF) << 1)
    import spark.implicits._
    val samples = Seq(0L, 1L, 2L, 3L, 255L, 256L, 65535L, 65536L, 12345L, 54321L)
    val pairs = for (a <- samples; b <- samples) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z === zRef(a, b), s"z($a,$b)") }
  }

  test("z-ordered layout prunes files on EITHER dimension") {
    import spark.implicits._
    // a 256x256 uniform grid, 16 z-range files with QUADRANT-ALIGNED
    // cuts: every file is a union of consecutive 64x64 Morton cells, so
    // a narrow filter on either dimension hits at most the 4 cells of
    // one quadrant row/column — deterministically under any range-
    // sampler outcome (unaligned cuts could straddle a curve jump and
    // leave a file spanning one dim fully; the sampler's seed varies
    // with RDD id, which made this spec flaky). The contrast case: an
    // a-sorted layout leaves b at full width in every file.
    val grid = (for (a <- 0 until 256; b <- 0 until 256) yield (a.toLong, b.toLong))
      .toDF("a", "b").repartition(8)
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.writeZOrdered(grid, "a", "b", zDir, files = 16)
    def fileRanges(dir: String): Seq[(Long, Long, Long, Long)] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("a"), max("a"), min("b"), max("b")).head()
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    def hits(ranges: Seq[(Long, Long, Long, Long)], lo: Long, hi: Long,
             onB: Boolean): Int =
      ranges.count { case (aMin, aMax, bMin, bMax) =>
        if (onB) bMax >= lo && bMin <= hi else aMax >= lo && aMin <= hi }
    val zRanges = fileRanges(zDir)
    assert(zRanges.size >= 8)
    // b in [100,110]: z-layout must skip at least half the files
    assert(hits(zRanges, 100, 110, onB = true) <= zRanges.size / 2,
      s"b-filter should prune z-files, ranges=$zRanges")
    // a in [100,110]: same guarantee on the other interleaved dimension
    assert(hits(zRanges, 100, 110, onB = false) <= zRanges.size / 2,
      s"a-filter should prune z-files, ranges=$zRanges")
    // contrast: sorting by a alone leaves b at full width — zero pruning
    val aDir = java.nio.file.Files.createTempDirectory("asort").toString
    grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(aDir)
    val aRanges = fileRanges(aDir)
    assert(hits(aRanges, 100, 110, onB = true) === aRanges.size,
      s"single-dim sort should leave b unprunable, got $aRanges")
  }

  test("salted join returns exactly the plain inner-join result") {
    val lineitem = Tables.load(spark, sfDir, "lineitem").limit(2000)
    val part = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val plain = lineitem.join(part, "l_partkey")
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Layout.saltedJoin(lineitem, part, "l_partkey", saltFactor = 4)
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }
}
