package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Corpus quality classifier — the fastText-style filter used by the
  * GPT-3 / LLaMA data pipelines (Brown et al. 2020 §A; Touvron et al.
  * 2023: "classify pages as Wikipedia-referenced vs random crawl"),
  * re-expressed as a pure relational pipeline: train an add-1-smoothed
  * multinomial naive Bayes on a POSITIVE seed slice (curated text) and
  * a NEGATIVE seed slice (raw crawl), then score every candidate
  * document by the class log-likelihood ratio plus the log prior.
  * Unlike [[Dsir]] (which importance-weights the raw corpus toward a
  * target), this is a held-out classifier: the scored documents are
  * disjoint from both seeds, tokens never seen in training take the
  * smoothing-only weight, and the output carries a hard keep decision
  * (llr > 0) rather than a resampling rank.
  *
  * Scale shape: two map-side-combinable token counts build the model
  * (both SEED-sized, not corpus-sized — seeds are curated samples by
  * construction); the per-token weight table is seed-vocab-sized and
  * its join into the candidate token stream is size-dispatched —
  * broadcast while the vocabulary is bounded (the normal case; a
  * hashed feature space caps it like [[Dsir]] at open-vocabulary
  * scale), shuffle-hash beyond that, where a hot token only skews the
  * probe side and AQE's skew split is the backstop. The candidate
  * corpus shuffles exactly once: the per-doc aggregation. The class
  * totals and the log prior ride a one-row broadcast.
  */
object QualityClassifier {

  private def toks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))

  /** Train on `pos`/`neg`, score `candidates`. Output per candidate doc:
    * (doc_id, n_toks, llr, keep) — llr at 4 decimals, keep = llr > 0,
    * ordered by doc_id. */
  def trainScore(candidates: DataFrame, pos: DataFrame, neg: DataFrame,
                 broadcastVocabLimit: Long = 2000000L): DataFrame = {
    val cp = toks(pos).groupBy("tok").agg(count(lit(1)).as("cp"))
    val cn = toks(neg).groupBy("tok").agg(count(lit(1)).as("cn"))
    val counts = cp.join(cn, Seq("tok"), "full_outer")
      .select(col("tok"), coalesce(col("cp"), lit(0L)).as("cp"),
        coalesce(col("cn"), lit(0L)).as("cn"))
    // one-row class stats: token totals, shared vocab size, doc-count
    // log prior. The doc counts are seed-sized aggregates, not corpus
    // passes.
    val tot = counts.agg(sum(col("cp")).as("np"), sum(col("cn")).as("nn"),
        count(lit(1)).as("v"))
      .crossJoin(pos.agg(count(lit(1)).cast(DoubleType).as("dp")))
      .crossJoin(neg.agg(count(lit(1)).cast(DoubleType).as("dn")))
      .select(col("np"), col("nn"), col("v"),
        log(col("dp") / col("dn")).as("prior"),
        // weight a token the model never saw: both counts 0 under the
        // same smoothing — ln(1/(np+v)) − ln(1/(nn+v))
        (log(lit(1.0) / (col("np") + col("v")).cast(DoubleType)) -
          log(lit(1.0) / (col("nn") + col("v")).cast(DoubleType))).as("w0"))
    val model = counts.crossJoin(broadcast(tot.select("np", "nn", "v")))
      .select(col("tok"),
        (log((col("cp") + 1L).cast(DoubleType) / (col("np") + col("v")).cast(DoubleType)) -
          log((col("cn") + 1L).cast(DoubleType) / (col("nn") + col("v")).cast(DoubleType)))
          .as("w"))
    val dispatched =
      if (SizeDispatch.atMost(counts, broadcastVocabLimit)) broadcast(model)
      else model.hint("shuffle_hash")
    toks(candidates)
      .join(dispatched, Seq("tok"), "left")
      .crossJoin(broadcast(tot.select("prior", "w0")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        (max(col("prior")) + sum(coalesce(col("w"), col("w0"))))
          .cast(DecimalType(14, 4)).as("llr"))
      .withColumn("keep", col("llr") > 0)
      .orderBy("doc_id")
  }
}
