package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design (the 100 TB posture):
  *  - candidate generation is always an inverted-index / bucket JOIN on a
  *    short key (shingle, LSH band bucket, SimHash chunk) — never an
  *    all-pairs cross join over documents;
  *  - per-document signatures (shingles, minhash, simhash) are computed by
  *    tight-loop JVM kernels (Scala UDFs) — a deliberate trade: Catalyst's
  *    higher-order functions evaluate lambdas interpretively per element,
  *    which profiled 10-50x slower than a fused loop at sf0.1; the UDF is
  *    a pure per-row projection, so it costs no shuffle and pipelines
  *    inside the scan stage;
  *  - exact Jaccard is count-based over the inverted-index join (common =
  *    rows per pair), so verification never materializes per-pair arrays;
  *  - hot shingles (boilerplate) can be frequency-capped via
  *    `maxShingleDocFreq` to bound candidate skew — at SF where the exact
  *    oracle runs we leave it uncapped so results match exactly.
  *
  * Cross-engine parity: shingling matches DuckDB `string_split(lower(t),' ')`
  * + windowed concat exactly; Jaccard is exact integer counts; rounding is
  * HALF_UP-on-shortest-decimal like Spark's `round`.
  *
  * (The reference has no dedup surface — its only "distinct" notion is the
  * relation-OID registry, `PgWalMessageDecoder.java:39`; these are the
  * north-star additions from BASELINE.json.)
  */
object Dedup {

  /** Distinct n-word shingles of the lowercased, single-space-tokenized
    * text; documents shorter than n words get an empty shingle set
    * (mirrors the DuckDB oracle's `range(1, greatest(len-1,1))`). */
  private[operators] def shingleSet(text: String, n: Int): Array[String] = {
    val ws = text.toLowerCase.split(" ", -1)
    if (ws.length < n) Array.empty[String]
    else {
      val out = new java.util.LinkedHashSet[String]
      var i = 0
      while (i <= ws.length - n) {
        val sb = new StringBuilder(ws(i))
        var j = 1
        while (j < n) { sb.append(' ').append(ws(i + j)); j += 1 }
        out.add(sb.toString)
        i += 1
      }
      out.toArray(new Array[String](out.size))
    }
  }

  private def shingleUdf(n: Int) = udf((text: String) => shingleSet(text, n))

  /** (doc_id, shingles) projection. */
  def withShingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"), shingleUdf(n)(col("text")).as("shingles"))

  /** (doc_id, hashed shingles) projection: shingles as fnv64 longs.
    * All joins/counts downstream run on fixed-width longs — smaller
    * shuffles, faster hash joins than ~20-char strings. A hash collision
    * merges two distinct shingles; at 64 bits that needs ~4e9 distinct
    * shingles (birthday bound) before it's likely — per-partition corpora
    * stay far below that, and the oracle SFs are exact w.h.p. */
  private def withHashedShingles(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"),
      udf((text: String) => shingleSet(text, n).map(fnv64)).apply(col("text")).as("shingles"))

  private def jaccard(common: Column, na: Column, nb: Column): Column =
    round(common.cast(DoubleType) / (na + nb - common), 4)

  /** Exact n-gram Jaccard near-dup pairs (jac >= threshold). Candidates
    * come from an inverted-index join on shared shingles (a pair with
    * jac>0 shares >=1 shingle — recall is exact); `common` falls straight
    * out of that join as a pair count, so the whole operator is one wide
    * shuffle on the shingle key + one pair aggregation. With
    * `maxShingleDocFreq` (cap on a shingle's document frequency),
    * boilerplate shingles are dropped from candidate generation and pairs
    * are exact-verified against full shingle arrays instead. */
  def jaccardPairs(docs: DataFrame, threshold: Double = 0.5, n: Int = 3,
                   maxShingleDocFreq: Option[Int] = None): DataFrame = {
    val sh = withHashedShingles(docs, n)
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("sg"))
    val counts = ex.groupBy("doc_id").agg(count(lit(1)).as("cnt"))
    maxShingleDocFreq match {
      case None =>
        val common = ex.select(col("sg"), col("doc_id").as("da"))
          .join(ex.select(col("sg"), col("doc_id").as("db")), "sg")
          .filter(col("da") < col("db"))
          .groupBy("da", "db").agg(count(lit(1)).as("common"))
        common
          .join(counts.select(col("doc_id").as("da"), col("cnt").as("na")), "da")
          .join(counts.select(col("doc_id").as("db"), col("cnt").as("nb")), "db")
          .select(col("da"), col("db"), jaccard(col("common"), col("na"), col("nb")).as("jac"))
          .filter(col("jac") >= threshold)
          .orderBy("da", "db")
      case Some(cap) =>
        val hot = ex.groupBy("sg").count().filter(col("count") > cap).select("sg")
        val cold = ex.join(hot, Seq("sg"), "left_anti")
        val cands = cold.select(col("sg"), col("doc_id").as("da"))
          .join(cold.select(col("sg"), col("doc_id").as("db")), "sg")
          .filter(col("da") < col("db"))
          .select("da", "db").distinct()
        verifyJaccard(cands, sh, threshold)
      }
  }

  /** Exact verification of candidate pairs against full shingle arrays
    * (used by the LSH paths, whose candidate sets are small). */
  private def verifyJaccard(cands: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val sa = sh.select(col("doc_id").as("da"), col("shingles").as("sa"))
    val sb = sh.select(col("doc_id").as("db"), col("shingles").as("sb"))
    val common = size(array_intersect(col("sa"), col("sb")))
    cands
      .join(sa, "da").join(sb, "db")
      .select(col("da"), col("db"),
        jaccard(common, size(col("sa")), size(col("sb"))).as("jac"))
      .filter(col("jac") >= threshold)
      .orderBy("da", "db")
  }

  /** MinHash parameters: k affine hashes over 31-bit shingle hashes,
    * banded r rows x b bands. Coefficients are fixed-seed so plans are
    * deterministic across runs/executors. */
  final case class MinHashParams(numHashes: Int = 128, bands: Int = 64, seed: Long = 42L) {
    require(numHashes == bands * (numHashes / bands), "bands must divide numHashes")
    val rows: Int = numHashes / bands
    val prime: Long = 2147483647L // 2^31-1; a*h stays < 2^62, no Long overflow
    val coeffs: Array[(Long, Long)] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(numHashes)((1L + rnd.nextInt(Int.MaxValue - 1).toLong,
        rnd.nextInt(Int.MaxValue).toLong))
    }
  }

  /** Per-document LSH band keys ("band:m_i,m_j"): the full k-minhash
    * signature and its banding fused into one pass over the (hashed)
    * shingle set — a zero-shuffle projection; the only shuffle in the
    * LSH path is the bucket join itself. */
  private def bandKeysUdf(p: MinHashParams) = {
    val coeffs = p.coeffs
    val (prime, numHashes, bands, rows) = (p.prime, p.numHashes, p.bands, p.rows)
    udf((shingles: Seq[Long]) =>
      if (shingles.isEmpty) Array.empty[String]
      else {
        val mins = Array.fill(numHashes)(Long.MaxValue)
        shingles.foreach { sgHash =>
          val h = sgHash & 0x7FFFFFFFL
          var i = 0
          while (i < numHashes) {
            val v = (coeffs(i)._1 * h + coeffs(i)._2) % prime
            if (v < mins(i)) mins(i) = v
            i += 1
          }
        }
        Array.tabulate(bands) { b =>
          val sb = new StringBuilder(b.toString)
          var r = 0
          while (r < rows) { sb.append(if (r == 0) ':' else ',').append(mins(b * rows + r)); r += 1 }
          sb.toString
        }
      })
  }

  /** MinHash+LSH near-dup pairs. Candidates = documents sharing any band
    * bucket; candidates are then exact-verified, so output EQUALS
    * `jaccardPairs` whenever LSH recall at the threshold is 1 — with the
    * default (r=2, b=64) the miss probability at jac=0.5 is
    * (1-0.25)^64 ~ 1e-8. Unlike `jaccardPairs` the candidate join key is
    * a fixed-size band bucket, immune to hot-shingle skew — this is the
    * 100 TB path. */
  def minHashLshPairs(docs: DataFrame, threshold: Double = 0.5, n: Int = 3,
                      p: MinHashParams = MinHashParams()): DataFrame = {
    val sh = withHashedShingles(docs, n)
    val banded = sh.select(col("doc_id"), explode(bandKeysUdf(p)(col("shingles"))).as("bk"))
    val cands = banded.select(col("bk"), col("doc_id").as("da"))
      .join(banded.select(col("bk"), col("doc_id").as("db")), "bk")
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
    verifyJaccard(cands, sh, threshold)
  }

  /** FNV-1a 64-bit over UTF-8 bytes — deterministic across JVMs,
    * executor-safe (no object hash seeds). */
  private[operators] def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** 64-bit SimHash over 3-gram shingle hashes: per bit, sum +1/-1 votes
    * of each shingle's fnv64 bit; sign -> bit. Fused per-document kernel,
    * zero shuffle. Shingles (not words) keep the feature space wide
    * enough to discriminate when the vocabulary is small. */
  private val simHashUdf = udf((shingles: Seq[Long]) => {
    val votes = new Array[Int](64)
    shingles.foreach { h =>
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  })

  def simHash(docs: DataFrame, n: Int = 3): DataFrame =
    withHashedShingles(docs, n).select(col("doc_id"), simHashUdf(col("shingles")).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance <= maxHamming (default 3).
    * Candidates via the pigeonhole banding of the 64-bit signature into
    * 4 x 16-bit chunks: any pair within Hamming 3 matches on >=1 chunk, so
    * recall is exact; verification is bit_count(xor) <= k on the candidate
    * set. The chunk join is a fixed-key hash join — scale-safe. */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simHash(docs)
    val chunks = (0 until 4).map { i =>
      struct(lit(i).as("chunk"),
        shiftrightunsigned(col("simhash"), i * 16).bitwiseAND(0xFFFFL).as("key"))
    }
    val banded = sh.select(col("doc_id"), col("simhash"), explode(array(chunks: _*)).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    val cands = banded.select(col("chunk"), col("key"), col("doc_id").as("da"), col("simhash").as("ha"))
      .join(banded.select(col("chunk"), col("key"), col("doc_id").as("db"), col("simhash").as("hb")),
        Seq("chunk", "key"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"), col("ha"), col("hb")).distinct()
    cands
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("da"), col("db"), col("hamming").cast("long").as("hamming"))
      .orderBy("da", "db")
  }

  /** Embedding-cosine near-dup pairs (cos >= threshold), exact. The
    * vector set is broadcast and each task sweeps a slice of the pair
    * triangle with a fused primitive-array kernel — brute-force all-pairs
    * is a dense compute problem, and the declarative forms (HOF folds or
    * boxed UDF joins) profiled 10-30x slower. Left-to-right accumulation
    * and HALF_UP rounding keep results bit-identical to the DuckDB
    * oracle. At 100 TB the same kernel runs per LSH bucket
    * (Similarity.signature) instead of globally; driver-side collect of
    * the vectors is the test-SF shortcut for the broadcast. */
  /** LSH-bucketed embedding near-dup — the 100 TB composition promised by
    * `embeddingNearDupPairs`: vectors bucket by random-hyperplane sign
    * signature (zero-shuffle projection), candidate pairs form inside
    * buckets only (plus Hamming<=1 multiprobe for boundary-straddling
    * pairs), and exact cosine verifies candidates. Near-identical vectors
    * agree on (nearly) every hyperplane sign, so recall for
    * high-threshold near-dups is ~1 while candidate volume scales with
    * bucket occupancy, not N². */
  def embeddingNearDupPairsLsh(emb: DataFrame, threshold: Double = 0.95,
                               numPlanes: Int = 16, dim: Int = 64,
                               seed: Long = 7L): DataFrame = {
    val planes = Similarity.hyperplanes(numPlanes, dim, seed)
    val v = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("sig", Similarity.signature(col("e"), planes))
    // multiprobe: each vector posts its signature + every 1-bit flip;
    // matching on the exact signature of the OTHER side keeps the
    // candidate set symmetric without N x N probe expansion
    val probes = v.select(col("vec_id"), col("e"),
      explode(array(col("sig") +: (0 until numPlanes)
        .map(i => col("sig").bitwiseXOR(lit(1L << i))): _*)).as("bucket"))
    val a = probes.select(col("bucket"), col("vec_id").as("va"), col("e").as("ea"))
    val b = v.select(col("sig").as("bucket"), col("vec_id").as("vb"), col("e").as("eb"))
    val dot = graft.functions.VectorExpressions.vec_dot(col("ea"), col("eb"))
    val na = graft.functions.VectorExpressions.vec_norm(col("ea"))
    val nb = graft.functions.VectorExpressions.vec_norm(col("eb"))
    a.join(b, "bucket")
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb"), round(dot / (na * nb), 4).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .distinct()
      .orderBy("va", "vb")
  }

  def embeddingNearDupPairs(emb: DataFrame, threshold: Double = 0.4): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val ids = vecs.map(_._1)
    val es = vecs.map(_._2)
    val norms = es.map { e =>
      var s = 0.0; var i = 0
      while (i < e.length) { s += e(i) * e(i); i += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((ids, es, norms))
    val nVec = ids.length
    spark.range(nVec.toLong)
      .flatMap { iL =>
        val (bids, bes, bnorms) = bc.value
        val i = iL.toInt
        val a = bes(i)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var j = i + 1
        while (j < bids.length) {
          val b = bes(j)
          var dot = 0.0
          var k = 0
          while (k < a.length) { dot += a(k) * b(k); k += 1 }
          val cos = java.math.BigDecimal.valueOf(dot / (bnorms(i) * bnorms(j)))
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
          if (cos >= threshold) out += ((bids(i), bids(j), cos))
          j += 1
        }
        out
      }
      .toDF("va", "vb", "cos_sim")
      .orderBy("va", "vb")
  }
}
