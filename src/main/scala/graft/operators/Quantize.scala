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
}
