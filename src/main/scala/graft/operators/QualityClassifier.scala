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
  * corpus shuffles exactly once: the per-doc aggregation. Train/score
  * are SEPARATE so a long-lived consumer (the streaming curation gate)
  * trains once and scores every micro-batch against the pinned model.
  */
object QualityClassifier {

  /** A trained model: the pinned per-token weight table plus the two
    * scalars every score needs. The caller owns the pin's lifetime —
    * batch queries register it with [[Storage]] (released by the bench
    * drain); a streaming query holds it untracked for the stream's
    * life. */
  final case class NbModel(weights: DataFrame, prior: Double, w0: Double)

  private def toks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))

  /** Fit on `pos`/`neg`. One seed-side job: the count table pins
    * (seed-vocab-sized) and the class totals collect to scalars. */
  def train(pos: DataFrame, neg: DataFrame, track: Boolean = true): NbModel = {
    val cp = toks(pos).groupBy("tok").agg(count(lit(1)).as("cp"))
    val cn = toks(neg).groupBy("tok").agg(count(lit(1)).as("cn"))
    val counts0 = cp.join(cn, Seq("tok"), "full_outer")
      .select(col("tok"), coalesce(col("cp"), lit(0L)).as("cp"),
        coalesce(col("cn"), lit(0L)).as("cn"))
      .localCheckpoint(true)
    val counts = if (track) Storage.track(counts0) else counts0
    val tot = counts.agg(sum(col("cp")).as("np"), sum(col("cn")).as("nn"),
        count(lit(1)).as("v"))
      .crossJoin(pos.agg(count(lit(1)).cast(DoubleType).as("dp")))
      .crossJoin(neg.agg(count(lit(1)).cast(DoubleType).as("dn")))
      .head()
    val (np, nn, v) = (tot.getLong(0).toDouble, tot.getLong(1).toDouble,
      tot.getLong(2).toDouble)
    val prior = math.log(tot.getDouble(3) / tot.getDouble(4))
    // weight a token the model never saw: both counts 0 under the same
    // smoothing — ln(1/(np+v)) − ln(1/(nn+v))
    val w0 = math.log(1.0 / (np + v)) - math.log(1.0 / (nn + v))
    val weights = counts.select(col("tok"),
      (log((col("cp") + 1L).cast(DoubleType) / lit(np + v)) -
        log((col("cn") + 1L).cast(DoubleType) / lit(nn + v))).as("w"))
    NbModel(weights, prior, w0)
  }

  /** Score candidates against a trained model. Output per doc:
    * (doc_id, n_toks, llr, keep) — llr at 4 decimals, keep = llr > 0,
    * ordered by doc_id. */
  def score(candidates: DataFrame, m: NbModel,
            broadcastVocabLimit: Long = 2000000L): DataFrame = {
    val dispatched =
      if (SizeDispatch.atMost(m.weights, broadcastVocabLimit)) broadcast(m.weights)
      else m.weights.hint("shuffle_hash")
    // llr is exact DECIMAL(14,4) internally (order-independent sums,
    // exact keep threshold) and emitted as DOUBLE — the decimal's
    // nearest double, identical in both engines (VERDICT r11 #1).
    toks(candidates)
      .join(dispatched, Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        (lit(m.prior) + sum(coalesce(col("w"), lit(m.w0))))
          .cast(DecimalType(14, 4)).as("llr_dec"))
      .select(col("doc_id"), col("n_toks"),
        col("llr_dec").cast(DoubleType).as("llr"),
        (col("llr_dec") > 0).as("keep"))
      .orderBy("doc_id")
  }

  /** Train on `pos`/`neg`, score `candidates` — the one-shot q84 form. */
  def trainScore(candidates: DataFrame, pos: DataFrame, neg: DataFrame,
                 broadcastVocabLimit: Long = 2000000L): DataFrame =
    score(candidates, train(pos, neg), broadcastVocabLimit)
}
