package graft.operators

import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Persistable mergeable quantile sketch — the state the incremental
  * quantile view ([[ChangeHistory.maintainQuantileView]]) stores per
  * group, completing the IVM family's sketch tier beside the q144 HLL
  * view. The sketch is Spark's OWN Greenwald–Khanna summary
  * (`catalyst.util.QuantileSummaries` — the engine behind
  * `approx_percentile`, Greenwald & Khanna 2001 via the Spark
  * implementation), serialized to a compact explicit BINARY codec
  * (count, relativeError, then the (value, g, delta) tuple array — no
  * Java serialization in stored data, so persisted views survive JVM
  * and library upgrades). Rank error is the GK bound: a query at rank
  * φ returns a value whose true rank is within ε·n.
  *
  * Merge is the published GK merge (the same one approx_percentile's
  * partial aggregation runs), so chained per-batch folds and a one-shot
  * build agree within the sketch's own error — the q152 contract bounds
  * chained-vs-one-shot exactly the q144 way. */
object QuantileSketch {

  /** Explicit codec: 8B count | 8B relativeError | 4B n | n×(8+8+8)B. */
  def toBytes(qs0: QuantileSummaries): Array[Byte] = {
    val qs = if (qs0.compressed) qs0 else qs0.compress()
    val s = qs.sampled
    val bb = java.nio.ByteBuffer.allocate(8 + 8 + 4 + s.length * 24)
    bb.putLong(qs.count).putDouble(qs.relativeError).putInt(s.length)
    s.foreach { st => bb.putDouble(st.value).putLong(st.g).putLong(st.delta) }
    bb.array()
  }

  def fromBytes(b: Array[Byte]): QuantileSummaries = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val count = bb.getLong()
    val eps = bb.getDouble()
    val n = bb.getInt()
    val s = Array.fill(n)(
      new QuantileSummaries.Stats(bb.getDouble(), bb.getLong(), bb.getLong()))
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps, s,
      count, true)
  }

  private def emptySummaries(eps: Double): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps,
      Array.empty[QuantileSummaries.Stats], 0L, true)

  private def mergeQs(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries = {
    val ac = if (a.compressed) a else a.compress()
    val bc = if (b.compressed) b else b.compress()
    if (ac.count == 0L) bc else if (bc.count == 0L) ac else ac.merge(bc)
  }

  private class SketchAgg(eps: Double)
      extends Aggregator[java.lang.Double, QuantileSummaries, Array[Byte]] {
    override def zero: QuantileSummaries = emptySummaries(eps)
    override def reduce(b: QuantileSummaries, a: java.lang.Double): QuantileSummaries =
      if (a == null) b else b.insert(a.doubleValue())
    override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      mergeQs(a, b)
    override def finish(b: QuantileSummaries): Array[Byte] = toBytes(b)
    // the buffer never leaves the JVM-pinned aggregation path, so Java
    // serialization is safe HERE; the stored output is the explicit codec
    override def bufferEncoder: Encoder[QuantileSummaries] =
      Encoders.javaSerialization[QuantileSummaries]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate a DOUBLE column into one serialized sketch (NULLs
    * contribute nothing; an all-NULL group yields an empty sketch). */
  def sketchAgg(value: Column, relativeError: Double = 0.01): Column =
    udaf(new SketchAgg(relativeError)).apply(value)

  /** Pairwise merge of two serialized sketches (either side NULL →
    * the other) — the hll_union analogue for the view merge. */
  def mergeSketches: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((a: Array[Byte], b: Array[Byte]) =>
      (Option(a), Option(b)) match {
        case (Some(x), Some(y)) => toBytes(mergeQs(fromBytes(x), fromBytes(y)))
        case (x, y) => x.orElse(y).orNull
      })

  /** Quantile estimate from a serialized sketch (NULL on an empty or
    * absent sketch). */
  def quantileOf(q: Double): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((b: Array[Byte]) =>
      Option(b).map(fromBytes)
        .filter(_.count > 0L)
        .flatMap(_.query(q))
        .map(java.lang.Double.valueOf)
        .orNull)

  /** Count of inserted values in a serialized sketch (0 on NULL). */
  def countOf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((b: Array[Byte]) =>
      Option(b).map(fromBytes(_).count).getOrElse(0L))
}
