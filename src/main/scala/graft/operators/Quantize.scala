package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the standard 4×
  * storage/shuffle shrink for corpus-scale vector tables (float32 →
  * int8 + two float params per vector). Per-vector affine quantization:
  *
  *   scale = (max(e) - min(e)) / 255
  *   q_i   = floor((e_i - min(e)) / scale + 0.5) - 128   ∈ [-128, 127]
  *   e'_i  = (q_i + 128) * scale + min(e)
  *
  * `floor(y + 0.5)` is used instead of round(): floor on doubles is
  * exact and identical in every engine, while round() half-way semantics
  * differ (HALF_UP vs half-even) — the q56 oracle mirrors the formula
  * literally. Constant vectors (scale 0) quantize to all -128 and
  * reconstruct to the constant. Everything is a pure higher-order-
  * function projection: zero shuffle, codegen'd, streams at scan speed.
  *
  * Reconstruction error is bounded by scale/2 per element — the q56
  * contract audits the measured max against exactly that bound. */
object Quantize {

  private def vmin(e: Column): Column = array_min(e)
  private def vscale(e: Column): Column =
    (array_max(e) - array_min(e)) / lit(255.0)

  /** struct(q: array<int> in [-128,127], mn: double, scale: double). */
  def int8(e: Column): Column = {
    val mn = vmin(e)
    val sc = vscale(e)
    val q = when(sc === 0.0, transform(e, _ => lit(-128)))
      .otherwise(transform(e, x => (floor((x - mn) / sc + lit(0.5)) - 128).cast("int")))
    struct(q.as("q"), mn.as("mn"), sc.as("scale"))
  }

  /** Driver-side twin of [[int8]] for quantizing a single probe vector
    * (the stored-index serving path quantizes ONE query on the driver and
    * scans the stored codes — no quantize expressions reach the plan).
    * Bit-identical to the column form: same floor(y+0.5) arithmetic on
    * doubles, same scale-0 rule. Parity is property-tested. */
  def int8Local(e: Array[Double]): (Array[Int], Double, Double) = {
    val mn = e.min
    val sc = (e.max - mn) / 255.0
    val q =
      if (sc == 0.0) Array.fill(e.length)(-128)
      else e.map(x => (math.floor((x - mn) / sc + 0.5) - 128).toInt)
    (q, mn, sc)
  }

  /** Inverse of [[int8]]: array<double> reconstruction. */
  def dequantize(packed: Column): Column =
    transform(packed.getField("q"),
      q => (q + 128).cast("double") * packed.getField("scale") + packed.getField("mn"))

  /** Per-vector max |e - e'| over the round trip. */
  def maxAbsError(e: Column): Column = {
    val rt = dequantize(int8(e))
    array_max(zip_with(e, rt, (a, b) => abs(a - b)))
  }

  /** Per-vector error-bound slack: scale/2 + epsilon for the float
    * arithmetic; the q56 contract asserts maxAbsError <= this. */
  def errorBound(e: Column): Column = vscale(e) / 2.0 + lit(1e-9)

  /** Cosine of two RECONSTRUCTED vectors straight from their packed
    * codes, via the affine identity (a'_i = (qa_i+128)·sa + mna):
    *
    *   dot(a',b') = sa·sb·Σq̂aq̂b + sa·mnb·Σq̂a + sb·mna·Σq̂b + d·mna·mnb
    *   |a'|²      = sa²·Σq̂a² + 2·sa·mna·Σq̂a + d·mna²     (q̂ = q+128)
    *
    * The hot loop is the INTEGER dot over int8 codes — the form a
    * quantized 100 TB scan actually runs (4× less data through the
    * scan, int multiplies in codegen); the float corrections are O(1)
    * per pair from per-vector sums. Equal to
    * cosine(dequantize(a), dequantize(b)) up to float error —
    * property-tested in QuantizeSpec.
    *
    * The dimensionality for the d·mn correction terms is DERIVED from
    * the code array itself (`size(q)`) — a caller-supplied dim that
    * disagreed with the actual vector length would silently skew every
    * cosine (ADVICE r7). */
  def cosine(pa: Column, pb: Column): Column = {
    def shifted(p: Column): Column =
      transform(p.getField("q"), q => (q + 128).cast("long"))
    def isum(xs: Column): Column = aggregate(xs, lit(0L), _ + _)
    val (qa, qb) = (shifted(pa), shifted(pb))
    val (sa, mna) = (pa.getField("scale"), pa.getField("mn"))
    val (sb, mnb) = (pb.getField("scale"), pb.getField("mn"))
    val (sumA, sumB) = (isum(qa).cast("double"), isum(qb).cast("double"))
    val intDot = isum(zip_with(qa, qb, _ * _)).cast("double")
    val (sqA, sqB) = (isum(zip_with(qa, qa, _ * _)).cast("double"),
      isum(zip_with(qb, qb, _ * _)).cast("double"))
    val d = size(pa.getField("q")).cast("double")
    val dot = sa * sb * intDot + sa * mnb * sumA + sb * mna * sumB + d * mna * mnb
    val na = sqrt(sa * sa * sqA + lit(2.0) * sa * mna * sumA + d * mna * mna)
    val nb = sqrt(sb * sb * sqB + lit(2.0) * sb * mnb * sumB + d * mnb * mnb)
    dot / (na * nb)
  }
}
