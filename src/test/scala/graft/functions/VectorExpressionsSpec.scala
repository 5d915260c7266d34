package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native vec_dot/vec_norm expressions: interpreted-vs-codegen parity,
  * null propagation, SQL registration via GraftExtensions. */
class VectorExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val df = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0))
  ).toDF("id", "a", "b")

  test("vec_dot and vec_norm compute exact values through the Column API") {
    val rows = df.select(col("id"),
      VectorExpressions.vec_dot(col("a"), col("b")).as("d"),
      VectorExpressions.vec_norm(col("a")).as("n"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) === 32.0) // 4+10+18
    assert(rows(0).getDouble(2) === math.sqrt(14.0))
    assert(rows(1).getDouble(1) === 0.0)
  }

  test("SQL names resolve through GraftExtensions") {
    df.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT vec_dot(a, b) AS d, vec_norm(b) AS n FROM vecs WHERE id = 1")
      .collect()(0)
    assert(r.getDouble(0) === 32.0)
    assert(r.getDouble(1) === math.sqrt(77.0))
  }

  test("null input propagates to null output") {
    val withNull = Seq((1L, null.asInstanceOf[Array[Double]], Array(1.0))).toDF("id", "a", "b")
    val r = withNull.select(VectorExpressions.vec_dot(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("a NULL array ELEMENT yields NULL, not a silent 0.0") {
    val withNullElem = Seq(
      (1L, Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 1.0, 1.0)))
      .toDF("id", "a", "b")
    val r = withNullElem.select(
      VectorExpressions.vec_dot(col("a"), col("b")).as("d"),
      VectorExpressions.vec_norm(col("a")).as("n"),
      VectorExpressions.vec_norm(col("b")).as("nb")).collect()(0)
    assert(r.isNullAt(0), "vec_dot over a NULL element must be NULL")
    assert(r.isNullAt(1), "vec_norm over a NULL element must be NULL")
    assert(r.getDouble(2) === math.sqrt(3.0)) // null-free side still computes
  }

  test("length mismatch throws rather than truncating") {
    val bad = Seq((1L, Array(1.0, 2.0), Array(1.0))).toDF("id", "a", "b")
    val e = intercept[Exception] {
      bad.select(VectorExpressions.vec_dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("length mismatch"))
  }

  test("interpreted eval matches codegen result (fold-order parity)") {
    val rnd = new scala.util.Random(9)
    val xs = Array.fill(64)(rnd.nextGaussian())
    val ys = Array.fill(64)(rnd.nextGaussian())
    // expected: plain left-to-right fold
    var exp = 0.0
    (0 until 64).foreach(i => exp += xs(i) * ys(i))
    val got = Seq((xs, ys)).toDF("a", "b")
      .select(VectorExpressions.vec_dot(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(got === exp)
  }
}
