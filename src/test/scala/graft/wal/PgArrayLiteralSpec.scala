package graft.wal

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Parity suite for the PG array-literal parser — fixtures mirror the
  * reference's behaviors (FIXTURES.md §2 parser rows; `PgArrayUtil.java`
  * semantics, independently reimplemented). Property cases are driven by
  * raw ScalaCheck generators with a fixed seed (the scalatest-scalacheck
  * bridge isn't in the offline cache). */
class PgArrayLiteralSpec extends AnyFunSuite {

  /** Deterministic sampling harness over a ScalaCheck Gen. */
  private def forAllSamples[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  test("empty array literal for every type") {
    assert(PgArrayLiteral.parseLongArray("{}") === Nil)
    assert(PgArrayLiteral.parseIntArray("{}") === Nil)
    assert(PgArrayLiteral.parseDoubleArray("{}") === Nil)
    assert(PgArrayLiteral.parseStringArray("{}") === Nil)
  }

  test("numeric arrays") {
    assert(PgArrayLiteral.parseLongArray("{1,2,3}") === List(1L, 2L, 3L))
    assert(PgArrayLiteral.parseIntArray("{-5, 7}") === List(-5, 7))
    assert(PgArrayLiteral.parseDoubleArray("{1.5,-2.25}") === List(1.5, -2.25))
  }

  test("non-numeric content in numeric array throws") {
    intercept[NumberFormatException](PgArrayLiteral.parseLongArray("{1,x}"))
    intercept[NumberFormatException](PgArrayLiteral.parseDoubleArray("{a}"))
  }

  test("unquoted string elements") {
    assert(PgArrayLiteral.parseStringArray("{a,b,c}") === List("a", "b", "c"))
    assert(PgArrayLiteral.parseStringArray("{NULL}") === List("NULL"))
  }

  test("quoted elements with escapes (b f n r t quote backslash)") {
    assert(PgArrayLiteral.parseStringArray("""{"a,b","c}d"}""") === List("a,b", "c}d"))
    assert(PgArrayLiteral.parseStringArray("""{"x\ny","q\"z","w\\v"}""") ===
      List("x\ny", "q\"z", "w\\v"))
    assert(PgArrayLiteral.parseStringArray("""{"\b\f\r\t"}""") === List("\b\f\r\t"))
    assert(PgArrayLiteral.parseStringArray("""{"Aé"}""") === List("Aé"))
  }

  test("unicode escape \\uXXXX") {
    val lit = "{\"\\" + "u0041\\" + "u00e9\"}" // A=A, é=é
    assert(PgArrayLiteral.parseStringArray(lit) === List("Aé"))
  }

  test("bad unicode quad throws") {
    val lit = "{\"\\" + "uZZZZ\"}" // avoid Scala's own \u preprocessing
    intercept[IllegalArgumentException](PgArrayLiteral.parseStringArray(lit))
  }

  test("trailing garbage throws") {
    intercept[IllegalArgumentException](PgArrayLiteral.parseStringArray("{a}x"))
  }

  test("property: long/double array round-trip") {
    forAllSamples(Gen.listOf(Gen.long)) { xs =>
      assert(PgArrayLiteral.parseLongArray(xs.mkString("{", ",", "}")) === xs)
    }
    forAllSamples(Gen.listOf(Gen.chooseNum(-1e9, 1e9))) { xs =>
      assert(PgArrayLiteral.parseDoubleArray(xs.mkString("{", ",", "}")) === xs)
    }
  }

  test("property: quoted string round-trip with escape serialization") {
    val elem = Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf(',', '"', '\\', '\n', '\t', '{', '}', ' '))).map(_.mkString)
    def serialize(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\t' => "\\t"
        case c => c.toString
      } + "\""
    forAllSamples(Gen.listOf(elem)) { xs =>
      val lit = xs.map(serialize).mkString("{", ",", "}")
      assert(PgArrayLiteral.parseStringArray(lit) === xs)
    }
  }
}
