package graft.operators

import graft.SparkSpec

/** Corpus diagnostics (q88): exact counts, the closed-form Zipf OLS on
  * a hand-constructed frequency ladder, and rank-tie determinism. */
class CorpusDiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  test("zipf slope matches the closed-form OLS on a planted 4/2/1 ladder") {
    // en: 'a' x4, 'b' x2, 'c' x1 -> ranks 1,2,3; x=ln(rk), y=ln(cnt)
    val docs = Seq((1L, "a a a a b b c", "en"))
      .toDF("doc_id", "text", "lang")
    val row = TextAnalysis.corpusDiagnostics(docs).head()
    assert(row.getString(0) === "en")
    assert(row.getLong(1) === 7L && row.getLong(2) === 3L)
    assert(row.getDouble(3) ===
      BigDecimal(3.0 / 7).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val xy = Seq((math.log(1.0), math.log(4.0)), (math.log(2.0), math.log(2.0)),
      (math.log(3.0), math.log(1.0)))
    val n = xy.length
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum; val sxx = xy.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(row.getDouble(4) ===
      BigDecimal(slope).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      s"slope must be the OLS closed form (~ -1): $row vs $slope")
    assert(slope < -0.9 && slope > -1.4, s"a 4/2/1 ladder is Zipf-like: $slope")
  }

  test("languages aggregate independently and rank ties break on token") {
    val docs = Seq(
      (1L, "x x y y", "en"),   // tie at cnt=2: 'x' takes rank 1
      (2L, "nur ein wort", "de")
    ).toDF("doc_id", "text", "lang")
    val rows = TextAnalysis.corpusDiagnostics(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("en") === ((4L, 2L)) && rows("de") === ((3L, 3L)), s"$rows")
    // determinism under repartition
    val a = TextAnalysis.corpusDiagnostics(docs).collect().toSeq
    val b = TextAnalysis.corpusDiagnostics(docs.repartition(5)).collect().toSeq
    assert(a === b)
  }
}
