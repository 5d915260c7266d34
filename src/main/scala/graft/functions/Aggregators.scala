package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAFs (the reference's only extension point is a consumer
  * callback — `CdcConsumer.java:6-12`; aggregation is absent there, so
  * these follow Spark's `Aggregator[IN, BUF, OUT]` contract instead:
  * merge-able buffers → partial aggregation + a single shuffle of
  * fixed-size state, exactly what survives a 1000-executor scale-up).
  */
object Aggregators {

  /** Exact weighted-mean buffer. BigDecimal accumulation keeps the sums
    * exact (inputs are money-like, exact at 2 decimals), so the result is
    * independent of partitioning / merge order.
    */
  case class WSum(wsum: BigDecimal, w: BigDecimal)

  /** Weighted mean over (key, value, weight) rows: sum(v*w)/sum(w),
    * rounded at 2 decimals with the same HALF_UP-on-shortest-decimal-
    * representation rule as Spark's `round`. */
  class WeightedMean extends Aggregator[(String, Double, Double), WSum, Double] {
    private def bd(x: Double): BigDecimal = BigDecimal(java.math.BigDecimal.valueOf(x))
    def zero: WSum = WSum(BigDecimal(0), BigDecimal(0))
    def reduce(b: WSum, in: (String, Double, Double)): WSum =
      WSum(b.wsum + bd(in._2) * bd(in._3), b.w + bd(in._3))
    def merge(a: WSum, b: WSum): WSum = WSum(a.wsum + b.wsum, a.w + b.w)
    def finish(b: WSum): Double =
      if (b.w.signum == 0) Double.NaN
      else java.math.BigDecimal.valueOf(b.wsum.toDouble / b.w.toDouble)
        .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
    def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def weightedMean: TypedColumn[(String, Double, Double), Double] =
    new WeightedMean().toColumn
}
