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

  // ---------------------------------------- product quantization (r15)
  /** PQ codebook (Jégou, Douze, Schmid 2011, "Product Quantization for
    * Nearest Neighbor Search"): the vector splits into `m` contiguous
    * subvectors of `dsub` dims; each subspace carries its own
    * `nCentroids`-entry codebook, and a vector encodes to m one-byte
    * codes — 8 bytes for a 64-dim float32 vector at the defaults (32×;
    * scalar int8 is 4×). `codebooks(s)(c)` is subspace s's centroid c. */
  final case class PqCodebook(m: Int, dsub: Int,
                              codebooks: Array[Array[Array[Double]]]) {
    def nCentroids: Int = codebooks(0).length
    require(m == codebooks.length && codebooks.forall(_.forall(_.length == dsub)),
      s"inconsistent PQ codebook: m=$m dsub=$dsub")
    require(nCentroids <= 256, s"PQ codes are one byte: nCentroids=$nCentroids")
  }

  /** Driver-side PQ training over a bounded sample: plain Euclidean
    * k-means per subspace (Lloyd, deterministic — seeds are the first
    * distinct subvectors in the caller's hash order, empty clusters
    * keep their previous centroid). The sample is driver metadata by
    * the kmeansCentroids contract — PQ training never touches the
    * corpus beyond the bounded sample. */
  def pqTrainLocal(samples: Array[Array[Double]], m: Int,
                   nCentroids: Int = 256, iters: Int = 5): PqCodebook = {
    require(samples.nonEmpty, "pqTrainLocal: empty sample")
    val dim = samples(0).length
    require(dim % m == 0, s"pqTrainLocal: dim=$dim not divisible by m=$m")
    val dsub = dim / m
    val books = Array.tabulate(m) { s =>
      val subs = samples.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      // deterministic seeding: first k DISTINCT subvectors in sample order
      val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[Double]]
      subs.iterator.takeWhile(_ => seen.size < nCentroids)
        .foreach(v => { seen += v.toSeq; () })
      val k = seen.size
      var cents = seen.toArray.map(_.toArray)
      for (_ <- 1 to iters) {
        val sums = Array.fill(k)(new Array[Double](dsub))
        val counts = new Array[Long](k)
        subs.foreach { p =>
          var best = 0; var bd = Double.MaxValue
          var c = 0
          while (c < k) {
            var d = 0.0; var i = 0
            while (i < dsub) { val x = p(i) - cents(c)(i); d += x * x; i += 1 }
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          var i = 0
          while (i < dsub) { sums(best)(i) += p(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(k)(c =>
          if (counts(c) == 0L) cents(c)
          else sums(c).map(_ / counts(c)))
      }
      cents
    }
    PqCodebook(m, dsub, books)
  }

  /** Encode one vector to its m one-byte codes (nearest centroid per
    * subspace, Euclidean; ties to the lowest code — deterministic). */
  def pqEncodeLocal(cb: PqCodebook, v: Array[Double]): Array[Byte] = {
    require(v.length == cb.m * cb.dsub,
      s"pqEncodeLocal: dim=${v.length} != m*dsub=${cb.m * cb.dsub}")
    val out = new Array[Byte](cb.m)
    var s = 0
    while (s < cb.m) {
      val book = cb.codebooks(s)
      var best = 0; var bd = Double.MaxValue
      var c = 0
      while (c < book.length) {
        var d = 0.0; var i = 0
        while (i < cb.dsub) {
          val x = v(s * cb.dsub + i) - book(c)(i); d += x * x; i += 1
        }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      out(s) = best.toByte // 0..255 wraps to signed; decode with & 0xFF
      s += 1
    }
    out
  }

  /** Reconstruct a vector from its codes (the PQ approximation). */
  def pqDecodeLocal(cb: PqCodebook, codes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](cb.m * cb.dsub)
    var s = 0
    while (s < cb.m) {
      val cent = cb.codebooks(s)(codes(s) & 0xFF)
      System.arraycopy(cent, 0, out, s * cb.dsub, cb.dsub)
      s += 1
    }
    out
  }

  /** Distributed encode: BINARY column of exactly m bytes per vector —
    * the persisted-index layout (a one-pass kernel UDF with the
    * codebook in its closure; nondeterministic as a materialization
    * barrier, the engine-wide kernel convention). */
  def pqEncodeUdf(cb: PqCodebook): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((e: Seq[Double]) =>
      if (e == null) null else pqEncodeLocal(cb, e.toArray)).asNondeterministic()

  /** Asymmetric-distance (ADC) lookup tables for one probe: per
    * (subspace, code) the probe-subvector·centroid dot and the
    * centroid's squared norm. One m×nCentroids table pair per probe —
    * driver metadata; the scan then scores a row with m byte lookups
    * and adds, never touching floats per dimension. */
  def pqAdcLut(cb: PqCodebook, probe: Array[Double]): (Array[Array[Double]], Array[Array[Double]]) = {
    require(probe.length == cb.m * cb.dsub,
      s"pqAdcLut: dim=${probe.length} != m*dsub=${cb.m * cb.dsub}")
    val dots = Array.tabulate(cb.m) { s =>
      cb.codebooks(s).map { c =>
        var d = 0.0; var i = 0
        while (i < cb.dsub) { d += probe(s * cb.dsub + i) * c(i); i += 1 }
        d
      }
    }
    val sq = cb.codebooks.map(_.map { c =>
      var d = 0.0; var i = 0
      while (i < c.length) { d += c(i) * c(i); i += 1 }
      d
    })
    (dots, sq)
  }

  /** Driver twin of the ADC scan's score: approximate cosine of the
    * probe against the RECONSTRUCTION encoded by `codes` —
    * Σ dot-LUT / (|q| · sqrt(Σ sqnorm-LUT)). Exactly the arithmetic
    * [[pqAdcScoreUdf]] runs per row (the independent-re-derivation
    * hook the q135 contract uses). */
  def pqAdcScoreLocal(dots: Array[Array[Double]], sq: Array[Array[Double]],
                      probeNorm: Double, codes: Array[Byte]): Double = {
    var num = 0.0; var den = 0.0
    var s = 0
    while (s < codes.length) {
      val c = codes(s) & 0xFF
      num += dots(s)(c)
      den += sq(s)(c)
      s += 1
    }
    val d = probeNorm * math.sqrt(den)
    if (d == 0.0) 0.0 else num / d
  }

  /** ADC scoring kernel over the stored byte codes: the scan reads the
    * m-byte `pq` column ONLY. */
  def pqAdcScoreUdf(cb: PqCodebook, probe: Array[Double]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val (dots, sq) = pqAdcLut(cb, probe)
    val pn = math.sqrt(probe.map(x => x * x).sum)
    org.apache.spark.sql.functions.udf((codes: Array[Byte]) =>
      if (codes == null) null.asInstanceOf[java.lang.Double]
      else java.lang.Double.valueOf(pqAdcScoreLocal(dots, sq, pn, codes)))
      .asNondeterministic()
  }

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
