package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}

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

  /** Bounded top-k buffer: `sims`/`ids` are parallel rank-ordered lists
    * (sim desc, id asc), never longer than k. What shuffles per group is
    * this fixed-size buffer — NOT the candidate set — which is what makes
    * the kNN join's aggregation scale like any hash agg: partial top-k
    * map-side, k rows per group per partition into the exchange. */
  case class TopKBuf(sims: Seq[Double], ids: Seq[Long])

  /** Rank-ordered hits, as parallel arrays (a Product encoder can carry
    * Seq fields where it cannot carry Seq-of-tuple outputs directly). */
  case class TopKHits(ids: Seq[Long], sims: Seq[Double])

  /** Exact bounded top-k over (sim, id) rows: keeps the k best under
    * (sim desc, id asc). Insertion is O(k) with an O(1) reject fast path
    * (the common case once the buffer saturates); merge folds one bounded
    * buffer into the other, so the result is independent of partitioning
    * and merge order — ScalaCheck'd in KnnJoinSpec. Callers round `sim`
    * BEFORE aggregation so the ordering (and k-boundary tie-breaks) match
    * an oracle ranking rounded values. */
  class CosineTopK(k: Int) extends Aggregator[(Double, Long), TopKBuf, TopKHits] {
    require(k > 0, s"k must be positive, got $k")
    private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)
    def zero: TopKBuf = TopKBuf(Vector.empty, Vector.empty)
    private def insert(b: TopKBuf, s: Double, id: Long): TopKBuf = {
      val n = b.ids.length
      if (n == k && !better(s, id, b.sims(n - 1), b.ids(n - 1))) b
      else {
        var pos = 0
        while (pos < n && better(b.sims(pos), b.ids(pos), s, id)) pos += 1
        TopKBuf(((b.sims.take(pos) :+ s) ++ b.sims.drop(pos)).take(k),
          ((b.ids.take(pos) :+ id) ++ b.ids.drop(pos)).take(k))
      }
    }
    def reduce(b: TopKBuf, in: (Double, Long)): TopKBuf = insert(b, in._1, in._2)
    def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      b.sims.lazyZip(b.ids).foldLeft(a) { case (acc, (s, id)) => insert(acc, s, id) }
    def finish(b: TopKBuf): TopKHits = TopKHits(b.ids, b.sims)
    def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    def outputEncoder: Encoder[TopKHits] = Encoders.product[TopKHits]
  }

  /** Untyped-DataFrame handle: `cosineTopK(k)(col("cos_sim"), col("vec_id"))`
    * aggregates to a struct(ids, sims) of the k best rows per group. */
  def cosineTopK(k: Int): UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new CosineTopK(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))

  /** Bounded min-k buffer over (string key, id) rows — [[CosineTopK]]'s
    * ascending-string twin, backing the exact-k stratified sampler:
    * keeps the k smallest under (key asc, id asc), so what shuffles per
    * group is a fixed k-row buffer regardless of group size. Ids travel
    * as STRINGS (the same cast the hash key already takes), so any key
    * type — numeric or string doc keys — survives the aggregator; the
    * caller casts the output back to the input key's type (ADVICE r11:
    * the old non-nullable Long tuple encoder crashed on string keys).
    * The id tiebreak only fires on equal hash keys — i.e. equal input
    * keys for md5 — so string-vs-numeric id ordering cannot diverge. */
  case class MinKBuf(keys: Seq[String], ids: Seq[String])

  /** Output: the k ids with the smallest keys, rank-ordered. */
  case class MinKIds(ids: Seq[String])

  class MinKByKey(k: Int) extends Aggregator[(String, String), MinKBuf, MinKIds] {
    require(k > 0, s"k must be positive, got $k")
    private def better(s1: String, i1: String, s2: String, i2: String): Boolean = {
      val c = s1.compareTo(s2)
      c < 0 || (c == 0 && i1.compareTo(i2) < 0)
    }
    def zero: MinKBuf = MinKBuf(Vector.empty, Vector.empty)
    private def insert(b: MinKBuf, s: String, id: String): MinKBuf = {
      val n = b.ids.length
      if (n == k && !better(s, id, b.keys(n - 1), b.ids(n - 1))) b
      else {
        var pos = 0
        while (pos < n && better(b.keys(pos), b.ids(pos), s, id)) pos += 1
        MinKBuf(((b.keys.take(pos) :+ s) ++ b.keys.drop(pos)).take(k),
          ((b.ids.take(pos) :+ id) ++ b.ids.drop(pos)).take(k))
      }
    }
    def reduce(b: MinKBuf, in: (String, String)): MinKBuf = insert(b, in._1, in._2)
    def merge(a: MinKBuf, b: MinKBuf): MinKBuf =
      b.keys.lazyZip(b.ids).foldLeft(a) { case (acc, (s, id)) => insert(acc, s, id) }
    def finish(b: MinKBuf): MinKIds = MinKIds(b.ids)
    def bufferEncoder: Encoder[MinKBuf] = Encoders.product[MinKBuf]
    def outputEncoder: Encoder[MinKIds] = Encoders.product[MinKIds]
  }

  /** Untyped handle: `minKByKey(k)(col("h"), col("doc_id"))` → the k ids
    * with the smallest keys per group, rank-ordered. */
  def minKByKey(k: Int): UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MinKByKey(k),
      Encoders.tuple(Encoders.STRING, Encoders.STRING))
}
