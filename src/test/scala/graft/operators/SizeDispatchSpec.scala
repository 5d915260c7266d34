package graft.operators

import org.apache.spark.sql.functions.col
import graft.{SparkSpec, Tables}

/** The memoized size-probe behind every broadcast-vs-shuffle dispatch
  * (VERDICT r9 #5): correctness of the verdicts, and that a repeated
  * semantically-identical probe is answered from the cache — fresh
  * alias ExprIds must not defeat the memo (canonicalized-plan keying),
  * while genuinely fresh data (a new checkpoint) must miss.
  *
  * Assertions are on keys THIS spec owns (`hasEntry`), never on the
  * global entry count: suites run in parallel in one JVM and any of
  * them can route a probe through the shared cache between two
  * statements here (ADVICE r10). `clear()` is likewise not called —
  * it would yank entries concurrent suites just probed. */
class SizeDispatchSpec extends SparkSpec {

  test("atMost answers the bound correctly on both sides") {
    val nation = Tables.load(spark, sfDir, "nation") // 25 rows
    assert(SizeDispatch.atMost(nation, 25L))
    assert(!SizeDispatch.atMost(nation, 24L))
    assert(SizeDispatch.atMost(nation, 1000000L))
  }

  test("semantically-identical probes hit the cache despite fresh ExprIds") {
    def build() = Tables.load(spark, sfDir, "nation")
      .filter(col("n_regionkey") > 1)
      .select(col("n_nationkey").as("k")) // .as mints a fresh ExprId
    assert(SizeDispatch.atMost(build(), 101L))
    // the REBUILT plan maps onto the existing key — canonicalization
    // normalized the fresh ExprIds, so the second probe's lookup (the
    // exact get() atMost performs) is a hit by construction
    assert(SizeDispatch.hasEntry(build(), 101L, ""))
    assert(SizeDispatch.atMost(build(), 101L))
    // a different bound is a different question: no entry until probed
    assert(!SizeDispatch.hasEntry(build(), 3L, ""))
    assert(SizeDispatch.atMost(build(), 3L) == (build().count() <= 3))
    assert(SizeDispatch.hasEntry(build(), 3L, ""))
  }

  test("fresh checkpoints miss; an explicit key can bridge them") {
    val base = Tables.load(spark, sfDir, "region")
    val cp1 = Storage.track(base.localCheckpoint(true))
    val cp2 = Storage.track(base.localCheckpoint(true))
    assert(SizeDispatch.atMost(cp1, 100L))
    assert(SizeDispatch.hasEntry(cp1, 100L, ""))
    // distinct checkpoints are distinct data: cp1's entry must not
    // answer for cp2 (its LogicalRDD id does not canonicalize away)
    assert(!SizeDispatch.hasEntry(cp2, 100L, ""))
    assert(SizeDispatch.atMost(cp2, 100L))
    assert(SizeDispatch.hasEntry(cp2, 100L, ""))
    // keyed by the shared pre-checkpoint plan (+ tag) they DO share one:
    // after cp1's keyed probe the entry exists under base's plan, and
    // cp2's keyed lookup is that same get()
    assert(SizeDispatch.atMost(cp1, 50L, key = base, tag = "spec-bridge"))
    assert(SizeDispatch.hasEntry(base, 50L, "spec-bridge"))
    assert(SizeDispatch.atMost(cp2, 50L, key = base, tag = "spec-bridge"))
  }

  test("count memoizes the full cardinality without colliding with atMost") {
    val nation = Tables.load(spark, sfDir, "nation")
    assert(SizeDispatch.atMost(nation, 5L) == false) // partial count cached
    assert(SizeDispatch.count(nation) == 25L)        // full count, own entry
    assert(SizeDispatch.count(nation) == 25L)
    // the two live under different keys: bound-5 probe vs count's own
    // tag namespace (bound 0, "count:" prefix)
    assert(SizeDispatch.hasEntry(nation, 5L, ""))
    assert(SizeDispatch.hasEntry(nation, 0L, "count:"))
  }

  test("a keyed derived count never aliases a probe of the key plan itself") {
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
