package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch frequency estimation (Cormode & Muthukrishnan 2005)
  * — the heavy-hitter sketch completing the approx family alongside HLL
  * (q12), Bloom decontamination (q65), and the percentile sketch (q45):
  * answer "how often does token X occur in the corpus" for a FIXED probe
  * set without a full aggregation, from one mergeable fixed-size sketch.
  *
  * Scale shape: Spark's `count_min_sketch` aggregate is map-side
  * combinable — each task sketches its partition and the d×w integer
  * grids MERGE associatively, so the corpus is one pass and the
  * exchange carries sketches (eps=1e-4, conf=0.99 → ~5×27,183 counters
  * ≈ 1 MB), never tokens. The driver holds only the merged sketch and
  * the probe list (both fixed-size metadata), exactly the contract the
  * IVF/centroid operators follow. Estimates are DETERMINISTIC for a
  * given seed, one-sided (never under the true count), and bounded
  * above by true + eps·N with probability ≥ conf — the q86_check
  * contract asserts both sides against exact counts.
  */
object Sketches {

  /** Sketch the token stream of `docs` once, then estimate the count of
    * every probe token. Output: (tok, est_count) ordered by token; also
    * carries the exact stream length n_stream on every row so the eps·N
    * bound is visible in the result itself. */
  def cmsTokenCounts(docs: DataFrame, probes: Seq[String],
                     eps: Double = 1e-4, confidence: Double = 0.99,
                     seed: Int = 42): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs.select(explode(split(lower(col("text")), " ")).as("tok"))
    // one pass: the sketch aggregate and the stream length share the scan
    val row = toks.agg(
      count_min_sketch(col("tok"), lit(eps), lit(confidence), lit(seed)).as("sk"),
      count(lit(1)).as("n")).head()
    val cms = CountMinSketch.readFrom(row.getAs[Array[Byte]](0))
    val n = row.getLong(1)
    import spark.implicits._
    probes.distinct.sorted
      .map(p => (p, cms.estimateCount(p), n))
      .toDF("tok", "est_count", "n_stream")
  }

  /** The q86 contract: against exact per-token counts (computed the
    * plain groupBy way), every probe estimate is (a) never below the
    * true count — the CMS one-sided guarantee is structural, not
    * probabilistic — and (b) within eps·N above it (probabilistic at
    * conf, deterministic for a fixed seed+data). One boolean row. */
  def cmsCheck(spark: SparkSession, docs: DataFrame, probes: Seq[String],
               eps: Double = 1e-4): DataFrame = {
    val est = cmsTokenCounts(docs, probes, eps)
      .select(col("tok"), col("est_count"), col("n_stream"))
    val exact = docs.select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok").isin(probes.map(lit): _*))
      .groupBy("tok").agg(count(lit(1)).as("true_count"))
    val joined = est.join(exact, Seq("tok"), "left")
      .select(col("est_count"),
        coalesce(col("true_count"), lit(0L)).as("true_count"),
        col("n_stream")).collect()
    val noUnder = joined.forall(r => r.getLong(0) >= r.getLong(1))
    val withinEps = joined.forall(r =>
      r.getLong(0) <= r.getLong(1) + math.ceil(eps * r.getLong(2)).toLong)
    import spark.implicits._
    Seq((noUnder, withinEps)).toDF("no_underestimate", "within_eps_bound")
  }
}
