package graft.wal

import scala.collection.mutable.ArrayBuffer

/** PostgreSQL array-literal text parser — semantic port of the reference's
  * `PgArrayUtil.java:9-204` behavior (studied, not copied):
  *
  *  - `{}` parses to the empty list for every element type
  *    (`PgArrayUtil.java:10-12,30-32,46-48`);
  *  - numeric arrays (`bigint[]`, `int[]`, `numeric[]`) strip the braces
  *    and split on commas, parsing each piece strictly — non-numeric
  *    content throws (`:18-19,38-39`);
  *  - string arrays use a recursive-descent parse supporting unquoted
  *    elements (terminated by `,` `}` `{`) and quoted elements with the
  *    escape set `\b \f \n \r \t \uXXXX \" \\` (`:140-203`); a malformed
  *    `\uXXXX` hex quad throws (`:185-188`); content after the closing
  *    `}` throws (`:132-138`);
  *  - nested arrays are NOT supported (`{` terminates an unquoted
  *    element, `:152-161`) — faithful to the reference.
  */
object PgArrayLiteral {

  def parseLongArray(s: String): List[Long] =
    splitNumeric(s).map(_.trim.toLong)

  def parseIntArray(s: String): List[Int] =
    parseLongArray(s).map(_.toInt)

  def parseDoubleArray(s: String): List[Double] =
    splitNumeric(s).map(_.trim.toDouble)

  private def splitNumeric(s: String): List[String] = {
    val t = s.trim
    require(t.length >= 2 && t.head == '{' && t.last == '}', s"not an array literal: $s")
    val body = t.substring(1, t.length - 1)
    if (body.isEmpty) Nil else body.split(",", -1).toList
  }

  /** Recursive-descent string-array parse with quoting + escapes. */
  def parseStringArray(s: String): List[String] = {
    val p = new Parser(s)
    p.expect('{')
    val out = ArrayBuffer.empty[String]
    if (p.peek == '}') { p.next() }
    else {
      var done = false
      while (!done) {
        out += p.element()
        p.next() match {
          case ',' => ()
          case '}' => done = true
          case c => p.fail(s"expected ',' or '}', got '$c'")
        }
      }
    }
    p.eof()
    out.toList
  }

  private final class Parser(s: String) {
    private var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"bad array literal at $i: $msg in <$s>")
    def peek: Char = if (i < s.length) s.charAt(i) else fail("unexpected end")
    def next(): Char = { val c = peek; i += 1; c }
    def expect(c: Char): Unit = if (next() != c) fail(s"expected '$c'")
    def eof(): Unit = if (i != s.length) fail("trailing content after '}'")

    def element(): String =
      if (peek == '"') quoted() else unquoted()

    private def unquoted(): String = {
      val b = new StringBuilder
      while (peek != ',' && peek != '}' && peek != '{') b += next()
      b.toString
    }

    private def quoted(): String = {
      expect('"')
      val b = new StringBuilder
      var done = false
      while (!done) {
        next() match {
          case '"' => done = true
          case '\\' =>
            next() match {
              case 'b' => b += '\b'
              case 'f' => b += '\f'
              case 'n' => b += '\n'
              case 'r' => b += '\r'
              case 't' => b += '\t'
              case '"' => b += '"'
              case '\\' => b += '\\'
              case 'u' =>
                val quad = (0 until 4).map(_ => next()).mkString
                val cp = try Integer.parseInt(quad, 16)
                catch { case _: NumberFormatException => fail(s"bad \\u quad '$quad'") }
                b += cp.toChar
              case c => b += c // PG: backslash before any other char escapes it
            }
          case c => b += c
        }
      }
      b.toString
    }
  }
}
