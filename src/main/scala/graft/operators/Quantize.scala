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
  /** `residual = true` marks an IVFADC codebook (Jégou et al. 2011
    * §IV.B): the codes encode `rot(v − c_list)` — the vector's residual
    * against its coarse IVF centroid — instead of `rot(v)`. Residuals
    * concentrate near zero, so the SAME m bytes carry materially less
    * reconstruction error (the q151 contract measures the improvement).
    * Train/encode/decode take whatever vector the caller passes; the
    * flag tells the SERVING path (ADC) to use the per-(probe, list)
    * tables of [[pqAdcLutResidual]]. */
  final case class PqCodebook(m: Int, dsub: Int,
                              codebooks: Array[Array[Array[Double]]],
                              rot: Option[Array[Array[Double]]] = None,
                              residual: Boolean = false) {
    def nCentroids: Int = codebooks(0).length
    require(m == codebooks.length && codebooks.forall(_.forall(_.length == dsub)),
      s"inconsistent PQ codebook: m=$m dsub=$dsub")
    require(nCentroids <= 256, s"PQ codes are one byte: nCentroids=$nCentroids")
    require(rot.forall(r => r.length == m * dsub && r.forall(_.length == m * dsub)),
      s"rotation must be ${m * dsub}x${m * dsub}")
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
    * subspace, Euclidean; ties to the lowest code — deterministic).
    * An OPQ codebook ([[opqTrainLocal]]) rotates the vector into the
    * codebook's decorrelated basis first — the codebooks LIVE in the
    * rotated space, so every consumer composes unchanged. */
  def pqEncodeLocal(cb: PqCodebook, v0: Array[Double]): Array[Byte] = {
    require(v0.length == cb.m * cb.dsub,
      s"pqEncodeLocal: dim=${v0.length} != m*dsub=${cb.m * cb.dsub}")
    val v = cb.rot.fold(v0)(r => rotateLocal(r, v0))
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

  /** Reconstruct a vector from its codes (the PQ approximation), in
    * the ORIGINAL space: an OPQ codebook's concatenated centroids live
    * in the rotated basis, so the reconstruction rotates back (Rᵀ —
    * the inverse of an orthonormal R). */
  def pqDecodeLocal(cb: PqCodebook, codes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](cb.m * cb.dsub)
    var s = 0
    while (s < cb.m) {
      val cent = cb.codebooks(s)(codes(s) & 0xFF)
      System.arraycopy(cent, 0, out, s * cb.dsub, cb.dsub)
      s += 1
    }
    cb.rot.fold(out)(r => rotateTLocal(r, out))
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
  def pqAdcLut(cb: PqCodebook, probe0: Array[Double]): (Array[Array[Double]], Array[Array[Double]]) = {
    require(probe0.length == cb.m * cb.dsub,
      s"pqAdcLut: dim=${probe0.length} != m*dsub=${cb.m * cb.dsub}")
    // OPQ: the probe meets the codes in the rotated basis; R is
    // orthonormal so dot products and norms are preserved and the ADC
    // score keeps its meaning — cosine(probe, reconstruction)
    val probe = cb.rot.fold(probe0)(r => rotateLocal(r, probe0))
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

  // ------------------------------------- IVFADC residual tier (r16)
  /** Per-(probe, list) ADC tables for a RESIDUAL codebook (Jégou et al.
    * 2011 §IV.B): the stored codes reconstruct the residual in the
    * rotated basis, so the served vector is v̂ = c_l + Rᵀ·d(codes) and
    *
    *   dot(p, v̂)  = dot(p, c_l) + Σ_s dot((R·p)_s, book_s[code_s])
    *   |v̂|²       = |c_l|² + 2·Σ_s dot((R·c_l)_s, book_s[code_s])
    *                + Σ_s |book_s[code_s]|²
    *
    * Tables per probe: the probe-side `dots` and centroid-norm `sq`
    * (list-independent, shared with the raw tier) plus, per probed
    * list, a scalar pair (dot(p, c_l), |c_l|²) and one m×nCentroids
    * `cross` table — nProbe × m × 256 doubles total, driver metadata
    * exactly as the raw LUT is. */
  final case class ResidualLut(dots: Array[Array[Double]],
                               sq: Array[Array[Double]],
                               probeNorm: Double,
                               constDot: Map[Int, Double],
                               constSq: Map[Int, Double],
                               cross: Map[Int, Array[Array[Double]]])

  def pqAdcLutResidual(cb: PqCodebook, probe: Array[Double],
                       listCentroids: Map[Int, Array[Double]]): ResidualLut = {
    require(cb.residual, "pqAdcLutResidual: codebook is not residual-encoded")
    val (dots, sq) = pqAdcLut(cb, probe)
    val pn = math.sqrt(probe.map(x => x * x).sum)
    val constDot = listCentroids.map { case (l, c) =>
      l -> c.zip(probe).map { case (x, y) => x * y }.sum
    }
    val constSq = listCentroids.map { case (l, c) => l -> c.map(x => x * x).sum }
    val cross = listCentroids.map { case (l, c0) =>
      val c = cb.rot.fold(c0)(r => rotateLocal(r, c0))
      l -> Array.tabulate(cb.m) { s =>
        cb.codebooks(s).map { cent =>
          var d = 0.0; var i = 0
          while (i < cb.dsub) { d += c(s * cb.dsub + i) * cent(i); i += 1 }
          d
        }
      }
    }
    ResidualLut(dots, sq, pn, constDot, constSq, cross)
  }

  /** Driver twin of the residual ADC scan's score — approximate
    * cosine(probe, c_list + Rᵀ·decode(codes)). */
  def pqAdcScoreResidualLocal(lut: ResidualLut, list: Int,
                              codes: Array[Byte]): Double = {
    var num = lut.constDot(list)
    var den = lut.constSq(list)
    val cr = lut.cross(list)
    var s = 0
    while (s < codes.length) {
      val c = codes(s) & 0xFF
      num += lut.dots(s)(c)
      den += 2.0 * cr(s)(c) + lut.sq(s)(c)
      s += 1
    }
    val d = lut.probeNorm * math.sqrt(math.max(den, 0.0))
    if (d == 0.0) 0.0 else num / d
  }

  /** Residual-ADC scoring kernel: the scan reads (list, pq) only. */
  def pqAdcScoreResidualUdf(lut: ResidualLut): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((list: Int, codes: Array[Byte]) =>
      if (codes == null) null.asInstanceOf[java.lang.Double]
      else java.lang.Double.valueOf(pqAdcScoreResidualLocal(lut, list, codes)))
      .asNondeterministic()

  // ------------------------------------------ OPQ rotation (r15)
  /** y = R·v (R given as rows). */
  def rotateLocal(r: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val n = r.length
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = r(i)
      var d = 0.0; var j = 0
      while (j < n) { d += row(j) * v(j); j += 1 }
      out(i) = d
      i += 1
    }
    out
  }

  /** y = Rᵀ·v — the inverse rotation for orthonormal R. */
  def rotateTLocal(r: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val n = r.length
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = r(i); val vi = v(i)
      var j = 0
      while (j < n) { out(j) += row(j) * vi; j += 1 }
      i += 1
    }
    out
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
    * deterministic (fixed sweep order, fixed iteration cap), exact
    * enough for a d×d covariance (off-diagonal driven below 1e-12 of
    * the Frobenius norm). Returns (eigenvalues, eigenvectors-as-rows),
    * sorted by DESCENDING eigenvalue, ties to the lower original
    * index. The eigenvector rows are orthonormal to machine precision
    * — they form the rotation bank [[pcaRotation]] permutes. */
  def jacobiEigenSym(a0: Array[Array[Double]], maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var fro = 0.0
    locally { var i = 0; while (i < n) { var j = 0; while (j < n) { fro += a(i)(j) * a(i)(j); j += 1 }; i += 1 } }
    val eps = 1e-24 * math.max(fro, 1e-300)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > eps) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          off += 2 * apq * apq
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
              case 0.0 => 1.0 // theta == 0 -> 45 degrees
              case x => x
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - s * vqk
              v(q)(k) = s * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    (order.map(i => a(i)(i)).toArray, order.map(i => v(i)).toArray)
  }

  /** OPQ rotation via PCA + eigenvalue-balanced subspace allocation
    * (Gong, Lazebnik, Gordo, Perronnin 2013, "Iterated Quantization" /
    * "Optimized Product Quantization" — the parametric OPQ-P variant:
    * rotate into the PCA basis, then PERMUTE the principal directions
    * into the m subspaces so the products of per-subspace eigenvalues
    * balance — each codebook then faces comparable variance instead of
    * subspace 0 eating every high-variance raw dimension). Greedy
    * allocation: principal directions in descending-eigenvalue order,
    * each to the non-full bucket with the smallest Σ log λ so far
    * (products balance in log space; ties to the lowest bucket).
    *
    * Covariance comes from the SAME bounded deterministic sample the
    * PQ codebooks train on (the kmeansCentroids contract — driver
    * metadata, never a corpus pass; a d×d second moment needs ~d
    * samples, the 4096-row sample is 64× that at d=64). The rotation
    * is pure geometry — cos(R·a, R·b) = cos(a, b) exactly — so exact
    * reranks and returned scores are untouched.
    *
    * Returns R with the eigenvector rows bucket-ordered: subspace s of
    * the rotated vector is rows [s·dsub, (s+1)·dsub). */
  def pcaRotation(samples: Array[Array[Double]], m: Int): Array[Array[Double]] = {
    require(samples.nonEmpty, "pcaRotation: empty sample")
    val d = samples(0).length
    require(d % m == 0, s"pcaRotation: dim=$d not divisible by m=$m")
    val dsub = d / m
    val n = samples.length.toDouble
    val mean = new Array[Double](d)
    samples.foreach { v => var i = 0; while (i < d) { mean(i) += v(i); i += 1 } }
    locally { var i = 0; while (i < d) { mean(i) /= n; i += 1 } }
    val cov = Array.ofDim[Double](d, d)
    samples.foreach { v =>
      var i = 0
      while (i < d) {
        val xi = v(i) - mean(i)
        var j = i
        while (j < d) { cov(i)(j) += xi * (v(j) - mean(j)); j += 1 }
        i += 1
      }
    }
    locally { var i = 0
      while (i < d) {
        var j = i
        while (j < d) { cov(i)(j) /= n; cov(j)(i) = cov(i)(j); j += 1 }
        i += 1
      } }
    val (evals, evecs) = jacobiEigenSym(cov)
    // greedy balanced allocation of the d principal directions
    val logSum = new Array[Double](m)
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    (0 until d).foreach { e =>
      var best = -1; var bestLog = Double.MaxValue
      var b = 0
      while (b < m) {
        if (buckets(b).size < dsub && logSum(b) < bestLog) { best = b; bestLog = logSum(b) }
        b += 1
      }
      buckets(best) += e
      logSum(best) += math.log(math.max(evals(e), 1e-12))
    }
    buckets.flatMap(_.iterator.map(evecs(_))).toArray
  }

  /** Orthogonal Procrustes: the R maximizing tr(R·A) over orthogonal
    * matrices — R = V·Uᵀ for A = U·Σ·Vᵀ (the closed-form rotation
    * update of OPQ's non-parametric alternation). The SVD comes from
    * the symmetric eigendecomposition of AᵀA ([[jacobiEigenSym]]);
    * near-null singular directions complete by Gram–Schmidt against
    * the unit basis, and the CALLER accept-tests the result (the
    * safeguarded alternation keeps monotonicity regardless). */
  def procrustesLocal(a: Array[Array[Double]]): Array[Array[Double]] = {
    val d = a.length
    val ata = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        var s = 0.0; var k = 0
        while (k < d) { s += a(k)(i) * a(k)(j); k += 1 }
        ata(i)(j) = s; ata(j)(i) = s
        j += 1
      }
      i += 1
    }
    val (lam, vRows) = jacobiEigenSym(ata) // vRows(k) = right-singular vector k
    val sig = lam.map(l => math.sqrt(math.max(l, 0.0)))
    val tol = math.max(sig.headOption.getOrElse(0.0), 1e-300) * 1e-10
    // u_k = A·v_k / σ_k for the well-conditioned directions
    val u = Array.ofDim[Double](d, d)
    val have = Array.fill(d)(false)
    var k = 0
    while (k < d) {
      if (sig(k) > tol) {
        var r = 0
        while (r < d) {
          var s = 0.0; var c = 0
          while (c < d) { s += a(r)(c) * vRows(k)(c); c += 1 }
          u(k)(r) = s / sig(k)
          r += 1
        }
        have(k) = true
      }
      k += 1
    }
    // complete near-null directions: Gram–Schmidt unit-basis fill
    var e = 0
    k = 0
    while (k < d) {
      if (!have(k)) {
        var placed = false
        while (!placed && e < d) {
          val cand = new Array[Double](d); cand(e) = 1.0
          var kk = 0
          while (kk < d) {
            if (have(kk) || kk < k) {
              var dp = 0.0; var c = 0
              while (c < d) { dp += cand(c) * u(kk)(c); c += 1 }
              c = 0
              while (c < d) { cand(c) -= dp * u(kk)(c); c += 1 }
            }
            kk += 1
          }
          val n2 = math.sqrt(cand.map(x => x * x).sum)
          if (n2 > 1e-6) {
            var c = 0
            while (c < d) { u(k)(c) = cand(c) / n2; c += 1 }
            have(k) = true; placed = true
          }
          e += 1
        }
      }
      k += 1
    }
    // R = V·Uᵀ: R(i)(j) = Σ_k v_k(i)·u_k(j)
    Array.tabulate(d, d)((i2, j2) => {
      var s = 0.0; var k2 = 0
      while (k2 < d) { s += vRows(k2)(i2) * u(k2)(j2); k2 += 1 }
      s
    })
  }

  private def isOrthonormal(r: Array[Array[Double]], eps: Double = 1e-8): Boolean = {
    val d = r.length
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        var dot = 0.0; var k = 0
        while (k < d) { dot += r(i)(k) * r(j)(k); k += 1 }
        if (math.abs(dot - (if (i == j) 1.0 else 0.0)) > eps) return false
        j += 1
      }
      i += 1
    }
    true
  }

  /** OPQ training (Gong et al. 2013, the NON-PARAMETRIC alternation,
    * safeguarded): start from the PCA/eigenvalue-balanced rotation
    * ([[pcaRotation]] — the paper's parametric init), then alternate
    *   (1) train per-subspace codebooks on the rotated sample,
    *   (2) fix the codes, solve the optimal rotation in closed form
    *       ([[procrustesLocal]] on A = Σ xᵢ·cᵢᵀ),
    * accepting a step ONLY if the measured sample MSE improves (the
    * explicit accept test makes monotonicity unconditional — rank
    * deficiency or float noise can never regress the model). Finally
    * the result is compared against plain PQ on the same sample and
    * the better one ships (identity rotation is a legal OPQ solution,
    * so the returned codebook is NEVER worse than [[pqTrainLocal]] —
    * the q142 contract asserts exactly this inequality). Deterministic
    * end-to-end: deterministic covariance and k-means seeding,
    * fixed-order Jacobi, fixed round count. */
  def opqTrainLocal(samples: Array[Array[Double]], m: Int,
                    nCentroids: Int = 256, iters: Int = 5,
                    opqRounds: Int = 6): PqCodebook = {
    def trainAt(r: Array[Array[Double]]): (PqCodebook, Double) = {
      val plain = pqTrainLocal(samples.map(rotateLocal(r, _)), m, nCentroids, iters)
      val cb = PqCodebook(plain.m, plain.dsub, plain.codebooks, Some(r))
      (cb, pqMseLocal(cb, samples))
    }
    val d = samples(0).length
    var (bestCb, bestMse) = trainAt(pcaRotation(samples, m))
    var round = 0
    var improved = true
    while (round < opqRounds && improved) {
      improved = false
      // fix the codes under the current model; c_i = rotated-space recon
      val r = bestCb.rot.get
      val aMat = Array.ofDim[Double](d, d)
      samples.foreach { x =>
        val codes = pqEncodeLocal(bestCb, x)
        var s = 0
        while (s < bestCb.m) {
          val cent = bestCb.codebooks(s)(codes(s) & 0xFF)
          var i = 0
          while (i < bestCb.dsub) {
            val ci = cent(i); val row = s * bestCb.dsub + i
            var j = 0
            while (j < d) { aMat(j)(row) += x(j) * ci; j += 1 }
            i += 1
          }
          s += 1
        }
      }
      // A = Σ x_i c_iᵀ with A(row=x-dim)(col=c-dim)? tr(R·A) needs
      // A(i)(j) = Σ x_i(j-th? ) — built above as aMat(xdim)(cdim)
      val cand = procrustesLocal(aMat)
      if (isOrthonormal(cand)) {
        val (cb2, mse2) = trainAt(cand)
        if (mse2 < bestMse) { bestCb = cb2; bestMse = mse2; improved = true }
      }
      round += 1
    }
    // identity is a legal rotation: never ship a rotation that loses
    // to plain PQ on its own training sample
    val plain = pqTrainLocal(samples, m, nCentroids, iters)
    if (pqMseLocal(plain, samples) < bestMse)
      PqCodebook(plain.m, plain.dsub, plain.codebooks,
        Some(Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)))
    else bestCb
  }

  /** Mean squared reconstruction error of a codebook over a sample —
    * the quantity OPQ's balanced rotation drives down vs plain PQ (the
    * q142 contract measures exactly this, same sample, same m, same
    * k-means procedure). */
  def pqMseLocal(cb: PqCodebook, samples: Array[Array[Double]]): Double = {
    var tot = 0.0
    samples.foreach { v =>
      val rec = pqDecodeLocal(cb, pqEncodeLocal(cb, v))
      var i = 0
      while (i < v.length) { val x = v(i) - rec(i); tot += x * x; i += 1 }
    }
    tot / samples.length
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
