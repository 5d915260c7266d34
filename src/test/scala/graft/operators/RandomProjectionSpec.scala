package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JL random projection (q71): hand-computed sign matrix, linearity,
  * and composition with the IVF index over the reduced column. */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("2x2 projection matches the hand-computed sign matrix") {
    // s(i,j) = 1 - 2*((i*1103515245 + j*12345) % 97 % 2):
    // s(0,0)=+1, s(1,0)=+1, s(0,1)=+1, s(1,1)=-1  ->  [(x+y)/sqrt2, (x-y)/sqrt2]
    val df = Seq((1L, Array(3.0f, 4.0f))).toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(df, outDim = 2)
      .select("reduced").as[Seq[Double]].head()
    assert(out === Seq(4.9497, -0.7071))
  }

  test("projection is linear: exact duplicates stay exact duplicates") {
    val emb = spark.read.parquet(s"$sfDirDocs/embeddings.parquet").limit(50)
    val dup = emb.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(100000L))
    val red = Similarity.randomProjection(emb.unionByName(dup), outDim = 8)
      .select("vec_id", "reduced")
    val a = red.filter(col("vec_id") === 0).as[(Long, Seq[Double])].head()._2
    val b = red.filter(col("vec_id") === 100000L).as[(Long, Seq[Double])].head()._2
    assert(a === b)
    assert(a.size === 8)
  }

  test("codegen fast path (known inDim) is bit-identical to the generic HOF path") {
    val emb = spark.read.parquet(s"$sfDirDocs/embeddings.parquet").limit(100)
    val generic = Similarity.randomProjection(emb, outDim = 8)
      .select("vec_id", "reduced")
    val fast = Similarity.randomProjection(emb, outDim = 8, inDim = Some(64))
      .select("vec_id", "reduced")
    assert(fast.exceptAll(generic).isEmpty && generic.exceptAll(fast).isEmpty,
      "literal sign vectors + vec_dot must reproduce the fold exactly")
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fast path must not shuffle:\n$plan")
  }

  test("projection is deterministic across runs and is shuffle-free") {
    val emb = spark.read.parquet(s"$sfDirDocs/embeddings.parquet").limit(80)
    val p1 = Similarity.randomProjection(emb, outDim = 4).select("vec_id", "reduced")
    val p2 = Similarity.randomProjection(emb, outDim = 4).select("vec_id", "reduced")
    assert(p1.exceptAll(p2).isEmpty && p2.exceptAll(p1).isEmpty)
    val plan = p1.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }

  test("IVF search over the reduced column still finds a planted duplicate") {
    val emb = spark.read.parquet(s"$sfDirDocs/embeddings.parquet").limit(200)
    val planted = emb.filter(col("vec_id") === 7).withColumn("vec_id", lit(200000L))
    val red = Similarity.randomProjection(emb.unionByName(planted), outDim = 16)
      .select(col("vec_id"), col("reduced").cast("array<float>").as("embedding"))
    val index = Similarity.buildIvfIndex(red, nLists = 8)
    val hits = Similarity.knnJoinIvf(index, red.filter(col("vec_id") === 200000L),
        k = 1, nProbe = 8)
      .select("vec_id").as[Long].collect()
    // the duplicate projects to the identical vector -> cosine 1 -> top-1
    assert(hits.toSeq === Seq(7L))
  }
}
