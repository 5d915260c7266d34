package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Smoke + spot checks of the core query surface at sf0.001 (the DuckDB
  * oracle at sf0.01 is the authoritative gate — tools/check.py; this
  * suite guards compile-to-result sanity in `sbt test`). */
class CoreQueriesSpec extends SparkSpec {

  test("every registered query executes and returns rows") {
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows: $empty")
  }

  test("every query with an oracle has matching column names (driver hashes by sorted name)") {
    SparkEntry.oracleSql.keys.foreach { name =>
      assert(SparkEntry.queries.contains(name), s"oracle without query: $name")
    }
  }

  test("oracle-backed outputs are scalar-only (driver comparator cannot sort nested cells)") {
    // r10's only red row: q71's LIST column crashed the driver's pandas
    // sort before any value compare. Schema-only check (no execution) so
    // the class of failure dies at `sbt test`, mirrored by Verify's guard.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      SparkEntry.queries(name)(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty, s"non-scalar oracle-backed outputs: $offenders")
  }

  test("q02 aggregates match hand-computed values") {
    val rows = CoreQueries.q02HashAgg(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("cnt")).sum
    assert(total === 6000L) // lineitem rows at sf0.001 (FIXTURES.md §3)
  }

  test("q12 approx distinct within 5% of exact") {
    val exact = CoreQueries.q12DistinctCardinality(spark, sfDir)
      .collect()(0).getAs[Long]("du").toDouble
    val approx = CoreQueries.q12ApproxDistinct(spark, sfDir)
      .collect()(0).getAs[Long]("du_approx").toDouble
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  test("q45 approx percentiles within 1% of exact q39") {
    val exact = CoreQueries.q39Percentiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    CoreQueries.q45ApproxPercentiles(spark, sfDir).collect().foreach { r =>
      val (p50, p90) = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - p50) / p50 < 0.01)
      assert(math.abs(r.getDouble(2) - p90) / p90 < 0.01)
    }
  }

  test("q16 top-k is ordered and bounded") {
    val ps = CoreQueries.q16TopK(spark, sfDir).collect().map(_.getAs[Double]("p"))
    assert(ps.length === 25)
    assert(ps.sameElements(ps.sorted(Ordering[Double].reverse)))
  }

  test("set ops: UNION / UNION ALL / EXCEPT complement the declared INTERSECT") {
    import org.apache.spark.sql.functions.col
    val c = graft.Tables.load(spark, sfDir, "customer").select(col("c_nationkey").as("k"))
    val s = graft.Tables.load(spark, sfDir, "supplier").select(col("s_nationkey").as("k"))
    val union = c.union(s).distinct().count()
    val unionAll = c.union(s).count()
    val except = c.distinct().except(s.distinct()).count()
    val intersect = c.intersect(s).count()
    assert(unionAll === c.count() + s.count())
    assert(union === except + intersect + s.distinct().except(c.distinct()).count())
  }

  test("map functions over the envelope-style MAP column") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(Map("a" -> "1", "b" -> "2"), Map("a" -> "3")).toDF("m")
    assert(df.select(element_at(col("m"), "a")).as[String].collect().toSeq === Seq("1", "3"))
    assert(df.select(size(map_keys(col("m")))).as[Int].collect().toSeq === Seq(2, 1))
    val exploded = df.select(explode(col("m"))).collect()
    assert(exploded.length === 3)
  }

  test("q13 rollup contains the grand total") {
    val rows = CoreQueries.q13Rollup(spark, sfDir).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length === 1)
    assert(grand(0).getAs[Long]("cnt") === 1500L) // orders at sf0.001
  }
}
