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

  test("integer-dot cosine identity equals the dequantized cosine") {
    val rnd = new scala.util.Random(13)
    val vs = Seq.fill(50)(Array.fill(16)(rnd.nextGaussian()))
    val pairs = df(vs).select(Quantize.int8(col("e")).as("pa"))
      .crossJoin(df(vs.reverse).select(Quantize.int8(col("e")).as("pb")).limit(1))
    val viaIdentity = pairs.select(Quantize.cosine(col("pa"), col("pb"))).as[Double].collect()
    val viaDequant = pairs.select {
      import graft.functions.VectorExpressions.{vec_dot, vec_norm}
      val (a, b) = (Quantize.dequantize(col("pa")), Quantize.dequantize(col("pb")))
      vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
    }.as[Double].collect()
    viaIdentity.zip(viaDequant).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9, s"$x vs $y")
    }
  }

  test("cosineTopKQuantized recalls the probe's cluster on a separated corpus") {
    // within a cluster every mate is a near-tie (cos ~0.9999), so exact
    // id-parity with the float scan is NOT the contract — quantization
    // noise may reorder ties. The contract is structural: cluster
    // separation dwarfs the scale/2 quantization error, so every
    // selected neighbor must be a cluster-mate of the probe.
    val rnd = new scala.util.Random(29)
    val dim = 32
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextGaussian()))
    val vs = for (c <- 0 until 4; _ <- 0 until 12)
      yield centers(c).map(_ + rnd.nextGaussian() * 0.01)
    val emb = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val quant = Similarity.cosineTopKQuantized(emb, probeId = 0L, k = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(quant.forall(id => id >= 1L && id <= 11L),
      s"every neighbor must come from the probe's cluster (ids 1-11): $quant")
    assert(quant.size === 5)
  }

  test("cosineTopKReranked: exact scores on the shortlist; cluster recall like the exact scan") {
    val rnd = new scala.util.Random(31)
    val dim = 32
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextGaussian()))
    val vs = for (c <- 0 until 4; _ <- 0 until 12)
      yield centers(c).map(_ + rnd.nextGaussian() * 0.01)
    val emb = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val exact = Similarity.cosineTopK(emb, 0L, 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val rr = Similarity.cosineTopKReranked(emb, 0L, 5, shortlist = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // the shortlist covers the cluster (5*4 = 20 > 11 mates), so the
    // rerank reproduces the EXACT scan identically — scores included
    assert(rr === exact, s"rerank $rr vs exact $exact")
    // k bounds and shortlist stays within the cluster-mates property
    assert(rr.size === 5 && rr.forall { case (id, _) => id >= 1L && id <= 11L })
  }

  test("int8Local (driver-side probe quantizer) matches the column form bit-for-bit") {
    val rnd = new scala.util.Random(41)
    val vs = Seq.fill(100)(Array.fill(24)(rnd.nextGaussian() * (rnd.nextInt(5) + 1))) ++
      Seq(Array.fill(8)(3.14)) // constant vector: the scale-0 rule
    val colForm = df(vs)
      .select(col("vec_id"), Quantize.int8(col("e")).as("p"))
      .select(col("vec_id"), col("p.q"), col("p.mn"), col("p.scale"))
      .as[(Long, Seq[Int], Double, Double)].collect().sortBy(_._1)
    colForm.zip(vs).foreach { case ((_, q, mn, sc), v) =>
      val (lq, lmn, lsc) = Quantize.int8Local(v)
      assert(q === lq.toSeq)
      assert(mn === lmn && sc === lsc)
    }
  }

  test("quantization is a pure projection: no shuffle in the plan") {
    val plan = df(Seq(Array(0.0, 1.0)))
      .select(Quantize.int8(col("e")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free projection:\n$plan")
  }
}
