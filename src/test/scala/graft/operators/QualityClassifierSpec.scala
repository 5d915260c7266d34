package graft.operators

import graft.SparkSpec

/** Naive-Bayes quality classifier: separation, unseen-token handling,
  * prior, and determinism. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val pos = Seq(
    (100L, "the study presents careful analysis of the evidence"),
    (101L, "the results indicate a consistent and careful methodology")
  ).toDF("doc_id", "text")
  private val neg = Seq(
    (200L, "click here buy now cheap cheap deal"),
    (201L, "win win free prize click now")
  ).toDF("doc_id", "text")
  private val cand = Seq(
    (1L, "the analysis presents consistent evidence"),
    (2L, "buy cheap prize now click"),
    (3L, "completely novel unseen vocabulary entirely")
  ).toDF("doc_id", "text")

  test("seed-like candidates separate; unseen tokens fall back to the smoothing weight") {
    val out = QualityClassifier.trainScore(cand, pos, neg).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out(1L)._1 > 0 && out(1L)._2, s"curated-like doc must score positive: $out")
    assert(out(2L)._1 < 0 && !out(2L)._2, s"spam-like doc must score negative: $out")
    // doc 3 is all-unseen: every token takes w0 = ln((nn+v)/(np+v)),
    // so llr = prior + 5*w0 exactly — balanced seeds make prior 0.
    // np = 8+8 pos tokens, nn = 7+6 neg tokens, v = 13+9 distinct
    val np = 16.0; val nn = 13.0; val v = 22.0
    val w0 = math.log(1.0 / (np + v)) - math.log(1.0 / (nn + v))
    val expected = BigDecimal(5 * w0).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    assert(BigDecimal(out(3L)._1).setScale(4, BigDecimal.RoundingMode.HALF_UP) === expected,
      s"all-unseen doc must score prior + n*w0: got ${out(3L)._1}, want $expected")
  }

  test("unbalanced seeds carry a nonzero log prior through the formula exactly") {
    // a third pos doc: np 16→21, v 22→23 ('further' is the only new
    // token), prior ln(2/2)=0 → ln(3/2). The all-unseen doc isolates
    // prior + n*w0 with w0 = ln((nn+v)/(np+v))
    val posBig = pos.unionByName(Seq((102L, "further careful analysis of results"))
      .toDF("doc_id", "text"))
    val got = QualityClassifier.trainScore(cand, posBig, neg).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val expected = BigDecimal(math.log(3.0 / 2) + 5 * math.log(36.0 / 44))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    assert(BigDecimal(got(3L)).setScale(4, BigDecimal.RoundingMode.HALF_UP) === expected,
      s"unseen doc must score ln(3/2) + 5*ln(36/44): got ${got(3L)}, want $expected")
  }

  test("the seed-vocab model broadcasts into the candidate token stream") {
    val plan = QualityClassifier.trainScore(cand, pos, neg)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the dispatched model join must broadcast under the vocab bound:\n$plan")
  }

  test("scores are deterministic across runs and row order") {
    val a = QualityClassifier.trainScore(cand, pos, neg).collect().toSeq
    val b = QualityClassifier.trainScore(cand.orderBy(org.apache.spark.sql.functions.rand(7)),
      pos, neg).collect().toSeq
    assert(a === b)
  }

  // --- calibrate (q114): held-out threshold sweep ---

  test("calibrate: discriminative seeds give a clean operating curve") {
    import spark.implicits._
    // 100 ids per class -> both md5 halves populated; class-pure vocab
    val cpos = (0L until 100L).map(i => (i, "good wonderful prose " * 3))
      .toDF("doc_id", "text")
    val cneg = (100L until 200L).map(i => (i, "spam junk noise " * 3))
      .toDF("doc_id", "text")
    val got = QualityClassifier.calibrate(cpos, cneg, Seq(-100.0, 0.0, 100.0))
      .orderBy("threshold")
      .select("threshold", "n_keep", "tp", "fp", "fn", "precision", "recall", "f1")
      .as[(Double, Long, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    val heldPos = got.head._3 + got.head._5 // tp + fn at any tau
    assert(heldPos > 0 && got.forall(r => r._3 + r._5 == heldPos),
      "held-out positive count constant across the sweep")
    // tau=-100 keeps everything; tau=0 separates perfectly; tau=100 nothing
    assert(got(0)._6.contains(heldPos.toDouble / got(0)._2) || got(0)._6.isDefined)
    assert(got(1)._6 === Some(1.0) && got(1)._7 === Some(1.0) && got(1)._8 === Some(1.0))
    assert(got(2)._2 === 0L && got(2)._6.isEmpty && got(2)._7 === Some(0.0))
    // n_keep monotone non-increasing in tau
    assert(got.map(_._2) === got.map(_._2).sorted.reverse)
  }

  test("calibrate: the held-out halves are disjoint from training") {
    import spark.implicits._
    // one shared token in both classes: a doc appearing in BOTH train
    // and test would shift counts; the invariant tp+fp+(drops) == held
    // size catches leakage via the constant class totals
    val cpos = (0L until 60L).map(i => (i, "alpha beta")).toDF("doc_id", "text")
    val cneg = (60L until 120L).map(i => (i, "gamma delta")).toDF("doc_id", "text")
    val got = QualityClassifier.calibrate(cpos, cneg, Seq(0.0)).collect().head
    val (nKeep, tp, fp, fn) = (got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4))
    assert(nKeep == tp + fp)
    // the held-out set is a strict subset of the 120 seed ids, non-empty
    assert(tp + fp + fn < 120 && tp + fn > 0)
  }

  test("trainScoreMulti: separable labels classify perfectly; unseen vocab falls to priors") {
    import org.apache.spark.sql.functions.col
    val seeds = Seq(
      (1L, "hund katze maus hund", "de"), (2L, "katze hund", "de"),
      (3L, "dog cat mouse", "en"), (4L, "cat dog dog", "en"), (5L, "mouse dog", "en"),
      (6L, "chien chat", "fr"), (7L, "chat souris chien", "fr")
    ).toDF("doc_id", "text", "lang")
    val cands = Seq(
      (10L, "hund hund katze"), (11L, "dog mouse"), (12L, "chat chien chien"),
      (13L, "zzz qqq"), // unseen vocab everywhere -> every token takes w0 -> prior argmax
      (14L, "")         // no tokens -> prior-argmax fallback, n_toks 0
    ).toDF("doc_id", "text")
    val got = QualityClassifier.trainScoreMulti(cands, seeds, col("lang"))
      .select("doc_id", "n_toks", "pred")
      .as[(Long, Long, String)].collect().toSeq
    // en has the most seed docs AND the most tokens -> prior and w0 argmax
    assert(got === Seq((10L, 3L, "de"), (11L, 2L, "en"), (12L, 3L, "fr"),
      (13L, 2L, "en"), (14L, 0L, "en")), s"got $got")
  }

  test("trainScoreMulti: hostile label values (dots, backticks, spaces) resolve fine") {
    import org.apache.spark.sql.functions.col
    // ADVICE r13: helper columns used to splice raw label values into
    // column names — '.', '`' and whitespace broke col(...) resolution.
    // Labels now appear only as comparison literals (index-keyed cols).
    val seeds = Seq(
      (1L, "hund katze maus", "de.DE x"), (2L, "katze hund", "de.DE x"),
      (3L, "dog cat mouse", "en`US"), (4L, "cat dog", "en`US")
    ).toDF("doc_id", "text", "lang")
    val cands = Seq((10L, "hund katze"), (11L, "dog cat")).toDF("doc_id", "text")
    val got = QualityClassifier.trainScoreMulti(cands, seeds, col("lang"))
      .select("doc_id", "pred").as[(Long, String)].collect().toSeq
    assert(got === Seq((10L, "de.DE x"), (11L, "en`US")), s"got $got")
  }

  test("trainScoreMulti: exact score ties break to the lexicographically first label") {
    import org.apache.spark.sql.functions.col
    // perfectly symmetric classes: same doc count, same token counts
    val seeds = Seq(
      (1L, "aaa bbb", "l2"), (2L, "ccc ddd", "l1")
    ).toDF("doc_id", "text", "lang")
    // a doc of one token from each class scores identically under both
    val cands = Seq((10L, "aaa ccc")).toDF("doc_id", "text")
    val got = QualityClassifier.trainScoreMulti(cands, seeds, col("lang"))
      .select("pred").as[String].collect().toSeq
    assert(got === Seq("l1"))
  }

  test("trainScoreMulti is deterministic under repartition") {
    import org.apache.spark.sql.functions.col
    val seeds = (0L until 80L).map(i =>
      (i, if (i % 2 == 0) "alpha beta gamma" else "delta epsilon zeta",
        if (i % 2 == 0) "a" else "b")).toDF("doc_id", "text", "lang")
    val cands = (100L until 140L).map(i =>
      (i, if (i % 3 == 0) "alpha beta" else "zeta delta")).toDF("doc_id", "text")
    val x = QualityClassifier.trainScoreMulti(cands, seeds, col("lang")).collect().toSeq
    val y = QualityClassifier.trainScoreMulti(
      cands.repartition(7), seeds.repartition(5), col("lang")).collect().toSeq
    assert(x === y && x.nonEmpty)
  }
}
