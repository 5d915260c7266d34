package graft.queries

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Gate self-check (r9 postmortem): one pathological oracle — q68's
  * un-materialized recursive CTE, 843.9 s in DuckDB at sf0.01 — stalled
  * the DRIVER's correctness harness and zeroed the round's artifact
  * without any builder-side test going red. This spec times EVERY
  * oracle in DuckDB (via the driver-side python3+duckdb present in the
  * harness container) against a per-oracle budget at sf0.01, so a
  * too-expensive verification contract fails the BUILDER's session
  * loudly, where it can be fixed, instead of silently blanking the
  * driver's gate. Cancels (not passes) where python3/duckdb or the
  * testdata isn't available. No Spark session needed — the oracle map
  * is pure data. */
class OracleBudgetSpec extends AnyFunSuite {
  private val BudgetSeconds = 10.0
  private val SfDir = "/root/testdata/sf0.01"

  test(s"every oracle completes in DuckDB within ${BudgetSeconds}s at sf0.01") {
    assume(Files.exists(Paths.get(s"$SfDir/documents.parquet")), "testdata absent")
    val probe = new ProcessBuilder("python3", "-c", "import duckdb").start()
    assume(probe.waitFor() == 0, "python3+duckdb unavailable")

    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val tmp = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(tmp, json)

    val script = new java.io.File("tools/oracle_budget.py").getAbsoluteFile
    assume(script.exists(), s"$script absent")
    val pb = new ProcessBuilder("python3", script.toString,
      tmp.toString, SfDir, BudgetSeconds.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val rc = p.waitFor()
    Files.deleteIfExists(tmp)
    assert(rc == 0, s"oracle over budget or failing:\n$out")
  }
}
