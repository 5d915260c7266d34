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
  *  - per-document signatures (minhash, simhash) are computed with one
  *    explode + hash-partitioned aggregation = a single shuffle keyed by
  *    doc_id, partial-aggregated map-side;
  *  - verification (exact Jaccard / Hamming) runs only on the candidate
  *    set, joining back fixed-size signature/shingle arrays;
  *  - hot shingles (boilerplate) can be frequency-capped via
  *    `maxShingleDocFreq` to bound candidate skew — at SF where the exact
  *    oracle runs we leave it uncapped so results match exactly.
  *
  * The reference has no dedup surface (its only "distinct" notion is
  * relation-OID registry lookup, `PgWalMessageDecoder.java:39`); these are
  * the north-star additions from BASELINE.json.
  */
object Dedup {

  /** Distinct n-word shingles of the lowercased, single-space-tokenized
    * text; documents shorter than n words get an empty shingle set
    * (mirrors the DuckDB oracle's `range(1, greatest(len-1,1))`). */
  def shingleArray(text: Column, n: Int = 3): Column = {
    val ws = split(lower(text), " ")
    when(size(ws) >= n,
      array_distinct(transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + lit(1))): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** (doc_id, shingles) projection. */
  def withShingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"), shingleArray(col("text"), n).as("shingles"))

  private def verifyJaccard(cands: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val sa = sh.select(col("doc_id").as("da"), col("shingles").as("sa"))
    val sb = sh.select(col("doc_id").as("db"), col("shingles").as("sb"))
    val common = size(array_intersect(col("sa"), col("sb"))).cast(DoubleType)
    val jac = common / (size(col("sa")) + size(col("sb")) - common)
    cands
      .join(sa, "da").join(sb, "db")
      .select(col("da"), col("db"), round(jac, 4).as("jac"))
      .filter(col("jac") >= threshold)
      .orderBy("da", "db")
  }

  /** Exact n-gram Jaccard near-dup pairs (jac >= threshold), candidates
    * from an inverted-index join on shared shingles (a pair with jac>0
    * shares >=1 shingle, so recall is exact). One wide shuffle on the
    * shingle key; `maxShingleDocFreq` (None = exact) drops boilerplate
    * shingles from candidate generation to cap skew at scale. */
  def jaccardPairs(docs: DataFrame, threshold: Double = 0.5, n: Int = 3,
                   maxShingleDocFreq: Option[Int] = None): DataFrame = {
    val sh = withShingles(docs, n)
    val ex0 = sh.select(col("doc_id"), explode(col("shingles")).as("sg"))
    val ex = maxShingleDocFreq match {
      case Some(cap) =>
        val hot = ex0.groupBy("sg").count().filter(col("count") > cap).select("sg")
        ex0.join(hot, Seq("sg"), "left_anti")
      case None => ex0
    }
    val cands = ex.select(col("sg"), col("doc_id").as("da"))
      .join(ex.select(col("sg"), col("doc_id").as("db")), "sg")
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
    verifyJaccard(cands, sh, threshold)
  }

  /** MinHash parameters: k independent affine hashes over 31-bit shingle
    * hashes, banded r rows x b bands. Coefficients are fixed-seed so plans
    * are deterministic across runs/executors. */
  final case class MinHashParams(numHashes: Int = 128, bands: Int = 64, seed: Long = 42L) {
    require(numHashes == bands * (numHashes / bands), "bands must divide numHashes")
    val rows: Int = numHashes / bands
    val prime: Long = 2147483647L // 2^31-1; a*h stays < 2^62, no Long overflow
    val coeffs: Seq[(Long, Long)] = {
      val rnd = new scala.util.Random(seed)
      Seq.fill(numHashes)((1L + rnd.nextInt(Int.MaxValue - 1).toLong,
        rnd.nextInt(Int.MaxValue).toLong))
    }
  }

  /** Per-document MinHash signature columns m0..m{k-1}: explode shingles,
    * xxhash64 -> 31-bit, k min-aggregates in ONE hash aggregation (map-side
    * partials, single shuffle on doc_id). */
  def minHashSignatures(sh: DataFrame, p: MinHashParams = MinHashParams()): DataFrame = {
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("sg"))
      .withColumn("h", pmod(xxhash64(col("sg")), lit(p.prime)))
    val aggs = p.coeffs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * a + b, lit(p.prime))).as(s"m$i")
    }
    ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash+LSH near-dup pairs. Candidates = documents sharing any band
    * bucket; candidates are then exact-verified, so output EQUALS
    * `jaccardPairs` whenever LSH recall at the threshold is 1 — with the
    * default (r=2, b=64) the miss probability at jac=0.5 is
    * (1-0.25)^64 ~ 1e-8. Unlike `jaccardPairs` the candidate join key is a
    * fixed-size band bucket, immune to hot-shingle skew — this is the
    * 100 TB path. */
  def minHashLshPairs(docs: DataFrame, threshold: Double = 0.5, n: Int = 3,
                      p: MinHashParams = MinHashParams()): DataFrame = {
    val sh = withShingles(docs, n)
    val sig = minHashSignatures(sh, p)
    val bandStructs = (0 until p.bands).map { b =>
      val key = concat_ws(",", (0 until p.rows).map(r => col(s"m${b * p.rows + r}")): _*)
      struct(lit(b).as("band"), key.as("key"))
    }
    val banded = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cands = banded.select(col("band"), col("key"), col("doc_id").as("da"))
      .join(banded.select(col("band"), col("key"), col("doc_id").as("db")), Seq("band", "key"))
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
    verifyJaccard(cands, sh, threshold)
  }

  /** 64-bit SimHash over 3-gram shingle hashes: per bit, sum +1/-1 votes
    * of each shingle's xxhash64 bit; sign -> bit. Shingles (not words)
    * keep the feature space wide enough to discriminate when the
    * vocabulary is small. One explode + one 64-column aggregation
    * (single shuffle). */
  def simHash(docs: DataFrame, n: Int = 3): DataFrame = {
    val ex = docs.select(col("doc_id"),
      explode(shingleArray(col("text"), n)).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val bitAggs = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val bits = ex.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
    val sim = (0 until 64).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    bits.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming (default 3).
    * Candidates via the pigeonhole banding of the 64-bit signature into
    * 4 x 16-bit chunks: any pair within Hamming 3 matches on >=1 chunk, so
    * recall is exact; verification is bit_count(xor)<= k on the candidate
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

  /** Embedding-cosine near-dup pairs (cos >= threshold). Brute-force
    * all-pairs at test SF (exact, oracle-matched: left-fold double sums in
    * zip order). The 100 TB path is Similarity.lshBuckets — random
    * hyperplane bucketing — composed with this same verify step. */
  def embeddingNearDupPairs(emb: DataFrame, threshold: Double = 0.4): DataFrame = {
    val v = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val a = v.select(col("vec_id").as("va"), col("e").as("ea"))
    val b = v.select(col("vec_id").as("vb"), col("e").as("eb"))
    val dot = aggregate(zip_with(col("ea"), col("eb"), (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val na = sqrt(aggregate(transform(col("ea"), x => x * x), lit(0.0), (s, x) => s + x))
    val nb = sqrt(aggregate(transform(col("eb"), x => x * x), lit(0.0), (s, x) => s + x))
    a.crossJoin(b).filter(col("va") < col("vb"))
      .select(col("va"), col("vb"), round(dot / (na * nb), 4).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy("va", "vb")
  }
}
