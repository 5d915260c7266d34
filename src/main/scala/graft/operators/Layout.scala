package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for the 100 TB posture: bucketed co-located
  * joins (kill the shuffle on repeated fact-fact joins) and salted joins
  * (kill the straggler on skewed keys). Both are library surface — the
  * reference has no physical layout at all (single stream, one thread,
  * SURVEY.md §4.1), so these are where the Spark engine earns its scale.
  */
object Layout {

  /** Write a table bucketed+sorted by the join key. Bucketed scans expose
    * `HashPartitioning(key, n)` so equi-joins and aggregations on the key
    * plan with ZERO exchanges (verify: no ShuffleExchange in the plan).
    * On a cluster this is the layout for fact tables that join repeatedly
    * on the same key (orders⋈lineitem at every SF). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: Option[String] = None): Unit = {
    val w = df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
    path.fold(w)(p => w.option("path", s"$p/$table")).saveAsTable(table)
  }

  /** Equi-join two bucketed tables on their bucket key — planned as a
    * SortMergeJoin over the co-located buckets, no exchange on either
    * side. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Salted inner equi-join for skewed keys: the skewed (large) side gets
    * a random salt in [0, saltFactor); the small side is replicated
    * saltFactor times. The hot key's rows spread over saltFactor
    * partitions instead of one straggler task. AQE's skew-join handles
    * moderate skew automatically — explicit salting is for the pathological
    * keys AQE can't split (single-key hot spots in the billions of rows).
    * Semantics: exactly an inner equi-join on `key`. */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int = 8): DataFrame = {
    val salted = skewed.withColumn("__salt", (rand(seed = 7) * saltFactor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
