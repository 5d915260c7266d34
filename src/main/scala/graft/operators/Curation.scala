package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the whole training-data pipeline as ONE
  * operator: quality gate → repetition gate → exact dedup → near-dup
  * dedup (canonical survivor per family) → benchmark decontamination,
  * with a per-stage manifest of document counts (the audit artifact a
  * production curation run reports).
  *
  * Every stage reuses the already-verified operator (`TextAnalysis
  * .qualityScore`/`repetitionSignals`, `Dedup.jaccardPairs`/
  * `keepCanonical`/`contaminationScores`), so the composition adds no
  * new semantics — only the staging contract:
  *
  *  - **Stage boundaries are materialization points.** Each stage pins
  *    via `pin` (default: a localCheckpoint pinch-point registered with
  *    [[Storage]]) so the next stage and the manifest count read the
  *    pinned result instead of recomputing the prefix chain — the local
  *    analogue of the parquet write a cluster-scale pipeline puts
  *    between stages (swap `pin` for a parquet round-trip via
  *    [[Sinks]] to get exactly that).
  *  - **Drop sets join by size.** The repetition and contamination
  *    stages drop a FRACTION of the corpus; their id sets anti-join
  *    through the same bounded-count dispatch as `keepCanonical`
  *    (broadcast below `broadcastableIds`, shuffle hash join above) —
  *    no unconditional corpus-fraction broadcast anywhere.
  *  - **Exact dedup is one window, no join**: row_number over
  *    md5(lower(text)) partitions keyed by content, keep rank 1 (lowest
  *    doc_id) — groups are duplicate-set-sized, the shuffle is the one
  *    content shuffle exact dedup fundamentally needs.
  *
  * The 4-decimal quality/repetition quantization makes every threshold
  * comparison engine-exact (the DuckDB oracle mirrors each stage and
  * the manifest compares as INTEGERS — no float tolerance anywhere). */
object Curation {

  /** Thresholds; defaults match q68's oracle. `broadcastableIds` bounds
    * the drop-set dispatch (the `knnJoinAuto` pattern). */
  final case class CurationConfig(
      minQuality: Double = 0.44,
      maxDupWordFrac: Double = 0.8,
      maxTopBigramFrac: Double = 0.1,
      shingle: Int = 3,
      jaccard: Double = 0.5,
      minShared: Long = 3L,
      broadcastableIds: Long = 5000000L)

  /** The per-increment gate prefix of [[curate]] for micro-batch /
    * incremental use: optional markup cleaning, then quality gate →
    * repetition gate → exact within-increment dedup. No manifest
    * counts and no pinning (an increment is broadcast-sized by
    * definition; the near-dup and decontamination stages belong to the
    * CROSS-CORPUS probe the caller composes next — see
    * `StreamingOps.curatedIngestToStore`). Deterministic per input, so
    * an at-least-once replay of the same batch recomputes identical
    * survivors. */
  def gateBatch(docs: DataFrame, cfg: CurationConfig = CurationConfig(),
                cleanMarkupFirst: Boolean = false): DataFrame = {
    val cleaned =
      if (cleanMarkupFirst)
        docs.withColumn("text", TextAnalysis.cleanMarkup(col("text")))
      else docs
    val s1 = cleaned.filter(TextAnalysis.qualityScore(col("text")) >= cfg.minQuality)
    val flagged = TextAnalysis.repetitionSignals(s1)
      .filter(col("top_bigram_frac") >= cfg.maxTopBigramFrac ||
        col("dup_word_frac") >= cfg.maxDupWordFrac)
      .select("doc_id")
    // same bounded dispatch as curate.dropIds, probed on the INCREMENT
    // (an upper bound on the flagged set that costs no kernel work): a
    // normal micro-batch broadcasts, an oversized backfill batch routes
    // through a shuffle hash anti join instead of OOMing executors
    val side =
      if (SizeDispatch.atMost(docs, cfg.broadcastableIds)) broadcast(flagged)
      else flagged.hint("shuffle_hash")
    val s2 = s1.join(side, Seq("doc_id"), "left_anti")
    val w = Window.partitionBy(md5(lower(col("text")))).orderBy(col("doc_id"))
    s2.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Runs the pipeline over `docs` (schema incl. doc_id, text) against a
    * held-out `benchmark`; returns (survivors, manifest). The manifest
    * has one row per stage: (stage, docs_in, docs_out), counted on the
    * pinned stage results. */
  def curate(docs: DataFrame, benchmark: DataFrame,
             cfg: CurationConfig = CurationConfig(),
             pin: DataFrame => DataFrame =
               df => Storage.track(df.localCheckpoint(true))): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._

    // size-dispatched anti join: drop sets are usually small (broadcast)
    // but proportional to the corpus in the worst case (shuffle hash)
    def dropIds(base: DataFrame, ids: DataFrame): DataFrame = {
      val side =
        if (SizeDispatch.atMost(ids, cfg.broadcastableIds)) broadcast(ids)
        else ids.hint("shuffle_hash")
      base.join(side, Seq("doc_id"), "left_anti")
    }

    val n0 = docs.count()

    val s1 = pin(docs.filter(TextAnalysis.qualityScore(col("text")) >= cfg.minQuality))
    val n1 = s1.count()

    val sig = TextAnalysis.repetitionSignals(s1)
    val flagged = sig.filter(col("top_bigram_frac") >= cfg.maxTopBigramFrac ||
      col("dup_word_frac") >= cfg.maxDupWordFrac).select("doc_id")
    val s2 = pin(dropIds(s1, flagged))
    val n2 = s2.count()

    val w = Window.partitionBy(md5(lower(col("text")))).orderBy(col("doc_id"))
    val s3 = pin(s2.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn"))
    val n3 = s3.count()

    val pairs = Dedup.jaccardPairs(s3, cfg.jaccard, cfg.shingle)
    val s4 = pin(Dedup.keepCanonical(s3, pairs,
      TextAnalysis.qualityScore(col("text")),
      broadcastableLabels = cfg.broadcastableIds))
    val n4 = s4.count()

    val contaminated = Dedup
      .contaminationScores(s4, benchmark, cfg.shingle, cfg.minShared)
      .filter(col("contaminated")).select("doc_id")
    val s5 = pin(dropIds(s4, contaminated))
    val n5 = s5.count()

    val manifest = Seq(
      ("1_quality", n0, n1),
      ("2_repetition", n1, n2),
      ("3_exact", n2, n3),
      ("4_neardup", n3, n4),
      ("5_decontam", n4, n5))
      .toDF("stage", "docs_in", "docs_out")
    (s5, manifest)
  }
}
