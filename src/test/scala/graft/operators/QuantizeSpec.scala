package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Int8 embedding quantization: code range, error bound, edge vectors. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def df(vs: Seq[Array[Double]]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "e")

  test("codes stay in [-128, 127] and endpoints map to the extremes") {
    val rows = df(Seq(Array(0.0, 1.0, 0.5), Array(-3.0, 7.0, 2.0)))
      .select(Quantize.int8(col("e")).getField("q").as("q"))
      .as[Seq[Int]].collect()
    rows.foreach { q => assert(q.forall(x => x >= -128 && x <= 127), q) }
    assert(rows(0).head === -128) // min element -> -128
    assert(rows(0)(1) === 127)    // max element -> 127
  }

  test("round-trip error is within scale/2 on random vectors") {
    val rnd = new scala.util.Random(5)
    val vs = Seq.fill(200)(Array.fill(64)(rnd.nextGaussian()))
    val bad = df(vs)
      .select((Quantize.maxAbsError(col("e")) - Quantize.errorBound(col("e"))).as("slack"))
      .filter(col("slack") > 0.0).count()
    assert(bad === 0L)
  }

  test("constant vectors quantize to all -128 and reconstruct exactly") {
    val got = df(Seq(Array(2.5, 2.5, 2.5)))
      .select(Quantize.int8(col("e")).getField("q").as("q"),
        Quantize.dequantize(Quantize.int8(col("e"))).as("rt"))
      .as[(Seq[Int], Seq[Double])].head()
    assert(got._1 === Seq(-128, -128, -128))
    assert(got._2 === Seq(2.5, 2.5, 2.5))
  }

  test("quantization is a pure projection: no shuffle in the plan") {
    val plan = df(Seq(Array(0.0, 1.0)))
      .select(Quantize.int8(col("e")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free projection:\n$plan")
  }
}
