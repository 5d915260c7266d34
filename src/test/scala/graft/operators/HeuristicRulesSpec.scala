package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gopher rule battery: a planted fixture where each designed document
  * trips exactly one rule, so every verdict is hand-verifiable. */
class HeuristicRulesSpec extends SparkSpec {
  import spark.implicits._

  private val prose = (1 to 60).map(i => s"the and word of to is number$i").mkString(" ")

  private val docs = Seq(
    (1L, prose), // clean: passes everything
    (2L, "the and of to is tiny"), // too few words
    (3L, prose + " " + Seq.fill(60)("####### ######## #########").mkString(" ")), // symbols + word len
    (4L, (1 to 60).map(i => s"- bullet the and of to is line$i").mkString("\n")), // bullet lines
    (5L, (1 to 60).map(i => s"the and of to is trailing line$i ...").mkString("\n")), // ellipsis ends
    (6L, (1 to 60).map(i => s"$i 42 7 9 1").mkString(" ") + " the a and of"), // no alpha words
    (7L, (1 to 60).map(i => s"word$i token item entry").mkString(" ")) // no stopwords
  ).toDF("doc_id", "text")

  test("each planted doc trips exactly its designed rule") {
    val s = HeuristicRules.gopherSignals(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def ok(id: Long, colName: String): Boolean =
      s(id).getBoolean(s(id).fieldIndex(colName))
    assert(ok(1L, "keep"), s"doc 1 must pass: ${s(1L)}")
    assert(!ok(2L, "ok_words") && ok(2L, "ok_stops"), s"${s(2L)}")
    assert(!ok(3L, "ok_symbols"), s"${s(3L)}")
    assert(!ok(4L, "ok_lines") && ok(4L, "ok_words"), s"${s(4L)}")
    assert(!ok(5L, "ok_lines"), s"${s(5L)}")
    assert(!ok(6L, "ok_alpha"), s"${s(6L)}")
    assert(!ok(7L, "ok_stops"), s"${s(7L)}")
    Seq(2L, 3L, 4L, 5L, 6L, 7L).foreach(id => assert(!ok(id, "keep"), s"doc $id must fail"))
  }

  test("gopherFilter equals signals.filter(keep) and stays join-free") {
    val viaSignals = HeuristicRules.gopherSignals(docs)
      .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).sorted
    val filtered = HeuristicRules.gopherFilter(docs)
    assert(filtered.select("doc_id").collect().map(_.getLong(0)).sorted === viaSignals)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"the filter form must be row-local:\n$plan")
    assert(!plan.contains("Exchange"), s"the filter form must not shuffle:\n$plan")
  }

  test("gopherKeepCol embeds the battery verdict in a wider projection, join-free") {
    val viaSignals = HeuristicRules.gopherSignals(docs)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    val sheet = docs.select(col("doc_id"),
        HeuristicRules.gopherKeepCol().as("keep"))
      .as[(Long, Boolean)].collect().toMap
    assert(sheet === viaSignals)
    val plan = docs.select(col("doc_id"), HeuristicRules.gopherKeepCol())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"the column form must be a pure projection:\n$plan")
  }

  test("signals stay in the documented ranges on the corpus tables") {
    val sig = HeuristicRules.gopherSignals(
      graft.Tables.load(spark, sfDir, "documents"))
    val r = sig.agg(
      min(col("alpha_frac")).as("minA"), max(col("alpha_frac")).as("maxA"),
      min(col("bullet_frac")), max(col("bullet_frac")),
      sum(when(col("keep"), 1L).otherwise(0L)).as("kept"),
      count(lit(1)).as("n")).head()
    assert(r.getDouble(0) >= 0.0 && r.getDouble(1) <= 1.0)
    // word-soup corpus: no bullets/newlines anywhere
    assert(r.getDouble(2) === 0.0 && r.getDouble(3) === 0.0)
    assert(r.getLong(5) > 0)
  }
}
