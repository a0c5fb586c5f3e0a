package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class GlobSpec extends AnyFunSuite {
  private def m(glob: String, s: String): Boolean = s.matches(Glob.toRegex(glob))

  test("star, question mark, and anchoring") {
    assert(m("b*t", "blue bolt"))
    assert(!m("b*t", "blue bolts")) // GLOB is whole-string
    assert(m("*ge?r*", "hot gear"))
    assert(!m("*ge?r*", "hot ger"))
    assert(m("???", "abc"))
    assert(!m("???", "abcd"))
  }

  test("regex metacharacters are escaped") {
    assert(m("a.b", "a.b"))
    assert(!m("a.b", "axb"))
    assert(m("x(y)z", "x(y)z"))
    assert(m("a+b", "a+b"))
  }

  test("malformed patterns still compile instead of throwing") {
    assert(m("*[ab", "x[ab"))        // unterminated class → literal '['
    assert(!m("*[ab", "xa"))
    assert(m("a\\b", "a\\b"))        // backslash is literal in GLOB
  }

  test("character classes pass through") {
    assert(m("[bh]ot*", "hot gear"))
    assert(m("[bh]ot*", "bottle"))
    assert(!m("[bh]ot*", "dot"))
  }

  test("']' as first class member is a literal (SQLite/fnmatch rule)") {
    assert(m("[]]", "]"))
    assert(!m("[]]", "x"))
    assert(m("[^]]", "a"))
    assert(!m("[^]]", "]"))
  }

  test("unterminated class falls back to literal '[' with glob semantics intact") {
    assert(m("[*", "[anything"))
    assert(!m("[*", "x"))
    assert(m("[.", "[."))
    assert(!m("[.", "[x"))
  }
}
