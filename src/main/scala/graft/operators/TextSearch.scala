package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** BM25 ranked retrieval (Robertson & Zaragoza 2009, the Okapi/Lucene
  * form) — keyword search over the corpus completing the retrieval
  * family beside embedding ANN (q36/q51) and n-gram similarity (q32):
  * score(d, Q) = Σ_{t∈Q} idf(t) · tf(t,d)·(k1+1) /
  * (tf(t,d) + k1·(1 − b + b·|d|/avgdl)), with the Lucene idf
  * ln(1 + (N − df + 0.5)/(df + 0.5)) that never goes negative.
  *
  * Scale shape: ONE corpus pass computes per-doc length (row-local)
  * and explodes ONLY the query-term instances (the `isin` filter runs
  * before the explode's shuffle, so the aggregated tf table is bounded
  * by |Q| × matching docs, not corpus tokens). The df/idf table is
  * |Q|-sized and BROADCASTS into the score join; N and avgdl ride a
  * one-row broadcast. Top-k is an orderBy+limit —
  * TakeOrderedAndProject, per-partition heaps, no global sort. Scores
  * compare on their 4-decimal form in BOTH engines so the ranking is
  * engine-independent under double arithmetic. */
object TextSearch {

  def bm25TopK(docs: DataFrame, query: String, k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qToks = query.toLowerCase.split(" ").filter(_.nonEmpty).distinct.toSeq
    val toks = docs.select(col("doc_id"),
      size(split(lower(col("text")), " ")).cast("long").as("dl"),
      explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok").isin(qToks.map(lit): _*))
    val tf = toks.groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).cast(DoubleType).as("n"),
      avg(size(split(lower(col("text")), " "))).as("avgdl"))
    val idf = df.crossJoin(broadcast(stats))
      .select(col("tok"),
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)).as("idf"),
        col("avgdl"))
    tf.join(broadcast(idf), "tok")
      .select(col("doc_id"),
        (col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast(DoubleType) / col("avgdl"))))
          .as("s"))
      .groupBy("doc_id")
      .agg(sum(col("s")).cast(DecimalType(14, 4)).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
