package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Analyzer tier edges the q155 contract doesn't carry: short-word and
  * non-alpha passthrough, empty analysis, columnar/driver parity on
  * adversarial tokens. */
class AnalyzerSpec extends SparkSpec {
  import spark.implicits._

  test("porter: short words and non-alpha tokens pass through untouched") {
    assert(Analyzer.porterStem("as") === "as")
    assert(Analyzer.porterStem("is") === "is")
    assert(Analyzer.porterStem("a") === "a")
    assert(Analyzer.porterStem("x86") === "x86")
    assert(Analyzer.porterStem("co-op") === "co-op")
    assert(Analyzer.porterStem("" ) === "")
    assert(Analyzer.porterStem("ABC") === "ABC") // caller lowercases first
  }

  test("analyzeLocal: stop removes exactly the policy words; english stems the rest") {
    val s = "The running DOGS are in the parks"
    assert(Analyzer.analyzeLocal(Analyzer.Simple, s) ===
      Seq("the", "running", "dogs", "are", "in", "the", "parks"))
    assert(Analyzer.analyzeLocal(Analyzer.Stop, s) ===
      Seq("running", "dogs", "parks"))
    assert(Analyzer.analyzeLocal(Analyzer.English, s) ===
      Seq("run", "dog", "park"))
    assert(Analyzer.analyzeLocal(Analyzer.English, "the of and") === Seq.empty)
  }

  test("columnar analyze equals the driver twin on adversarial tokens") {
    val texts = Seq(
      "running  doubled--spaces ties agreed",
      "x86 3.14 MIXED-case YyY",
      "", "   ", "the the the",
      "générальное utf8 naïve")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    Analyzer.Names.foreach { a =>
      val got = df.select(col("id"), Analyzer.analyze(a, col("text")).as("t"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) === Analyzer.analyzeLocal(a, t), s"analyzer=$a text=$t")
      }
    }
  }

  test("analyzeLocal is locale-independent (Turkish-I regression)") {
    // Spark's lower() ignores the JVM default locale; the driver twin
    // must too, or query tokens diverge from indexed tokens on a
    // tr_TR JVM ('TITLE'.toLowerCase -> 'tıtle')
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      assert(Analyzer.analyzeLocal(Analyzer.Simple, "TITLE FIX") ===
        Seq("title", "fix"))
      assert(Analyzer.analyzeLocal(Analyzer.English, "INDEXING TITLES") ===
        Seq("index", "titl"))
    } finally java.util.Locale.setDefault(saved)
  }

  test("unknown analyzer names are refused everywhere") {
    intercept[IllegalArgumentException](Analyzer.analyzeLocal("nope", "x"))
    intercept[IllegalArgumentException](Analyzer.analyze("nope", lit("x")))
    intercept[IllegalArgumentException] {
      TextIndex.build(Seq((1L, "x")).toDF("doc_id", "text"),
        java.nio.file.Files.createTempDirectory("bad-an").toString,
        nBuckets = 4, analyzer = "nope")
    }
  }
}
