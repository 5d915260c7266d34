package graft.operators

import org.apache.spark.sql.functions.col
import graft.{SparkSpec, Tables}

/** The memoized size-probe behind every broadcast-vs-shuffle dispatch
  * (VERDICT r9 #5): correctness of the verdicts, and that a repeated
  * semantically-identical probe is answered from the cache — fresh
  * alias ExprIds must not defeat the memo (canonicalized-plan keying),
  * while genuinely fresh data (a new checkpoint) must miss. */
class SizeDispatchSpec extends SparkSpec {

  test("atMost answers the bound correctly on both sides") {
    SizeDispatch.clear()
    val nation = Tables.load(spark, sfDir, "nation") // 25 rows
    assert(SizeDispatch.atMost(nation, 25L))
    assert(!SizeDispatch.atMost(nation, 24L))
    assert(SizeDispatch.atMost(nation, 1000000L))
  }

  test("semantically-identical probes hit the cache despite fresh ExprIds") {
    SizeDispatch.clear()
    def build() = Tables.load(spark, sfDir, "nation")
      .filter(col("n_regionkey") > 1)
      .select(col("n_nationkey").as("k")) // .as mints a fresh ExprId
    assert(SizeDispatch.atMost(build(), 100L))
    val after1 = SizeDispatch.cacheSize
    assert(SizeDispatch.atMost(build(), 100L))
    assert(SizeDispatch.cacheSize == after1,
      "an identical rebuilt plan must not add a cache entry")
    // a different bound is a different question: new entry
    assert(SizeDispatch.atMost(build(), 3L) == (build().count() <= 3))
    assert(SizeDispatch.cacheSize == after1 + 1)
  }

  test("fresh checkpoints miss; an explicit key can bridge them") {
    SizeDispatch.clear()
    val base = Tables.load(spark, sfDir, "region")
    val cp1 = Storage.track(base.localCheckpoint(true))
    val cp2 = Storage.track(base.localCheckpoint(true))
    assert(SizeDispatch.atMost(cp1, 100L))
    val after1 = SizeDispatch.cacheSize
    assert(SizeDispatch.atMost(cp2, 100L))
    assert(SizeDispatch.cacheSize == after1 + 1,
      "distinct checkpoints are distinct data: must not share an entry")
    // keyed by the shared pre-checkpoint plan (+ tag) they DO share one
    assert(SizeDispatch.atMost(cp1, 50L, key = base, tag = "spec-bridge"))
    val after2 = SizeDispatch.cacheSize
    assert(SizeDispatch.atMost(cp2, 50L, key = base, tag = "spec-bridge"))
    assert(SizeDispatch.cacheSize == after2)
  }

  test("count memoizes the full cardinality without colliding with atMost") {
    SizeDispatch.clear()
    val nation = Tables.load(spark, sfDir, "nation")
    assert(SizeDispatch.atMost(nation, 5L) == false) // partial count cached
    assert(SizeDispatch.count(nation) == 25L)        // full count, own entry
    assert(SizeDispatch.count(nation) == 25L)
    assert(SizeDispatch.cacheSize == 2)
  }

  test("a keyed derived count never aliases a probe of the key plan itself") {
    SizeDispatch.clear()
    val nation = Tables.load(spark, sfDir, "nation") // 25 rows
    val derived = nation.filter(col("n_regionkey") === 0) // 5 rows
    // cache the DERIVED cardinality under nation's plan (the
    // keepCanonical pattern: labels keyed by pairs)
    assert(SizeDispatch.atMost(derived, 10L, key = nation, tag = "derived"))
    // an untagged probe of nation ITSELF at the same bound must answer
    // from nation's rows (25 > 10), not the derived entry (5 <= 10)
    assert(!SizeDispatch.atMost(nation, 10L))
    // and the explicit-key form without a tag is rejected outright
    intercept[IllegalArgumentException] {
      SizeDispatch.atMost(derived, 10L, key = nation)
    }
  }
}
