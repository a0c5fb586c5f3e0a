package graft.text2sql

import org.scalatest.funsuite.AnyFunSuite

/** Pure-text side of the rowid surface — no SparkSession needed. */
class RowidRewriteSpec extends AnyFunSuite {

  private val t = Map("t" -> Seq("a", "b", "c"))

  test("token gate: finds rowid/_rowid_/oid outside quotes and comments") {
    assert(RowidRewrite.referencesRowid("SELECT rowid FROM t"))
    assert(RowidRewrite.referencesRowid("select T._ROWID_ from t"))
    assert(RowidRewrite.referencesRowid("DELETE FROM t WHERE oid > 5"))
    assert(!RowidRewrite.referencesRowid("SELECT 'rowid' FROM t"))
    assert(!RowidRewrite.referencesRowid("SELECT a -- rowid\nFROM t"))
    assert(!RowidRewrite.referencesRowid("SELECT /* rowid */ a FROM t"))
    assert(!RowidRewrite.referencesRowid("SELECT rowidx FROM t"))
    assert(!RowidRewrite.referencesRowid("SELECT android FROM t"))
  }

  test("referencedTables matches bare and backticked names") {
    val names = Set("t", "abc123", "nation")
    assert(RowidRewrite.referencedTables(
      "SELECT rowid FROM `abc123` JOIN t ON 1=1", names) == Set("abc123", "t"))
    assert(RowidRewrite.referencedTables(
      "SELECT 1 FROM nation WHERE n_name = 't'", names) == Set("nation"))
  }

  test("_rowid_ and oid normalize to rowid; shadowed/quoted/AS survive") {
    assert(RowidRewrite.normalizeAliases(
      "SELECT _rowid_, t.oid FROM t", Set.empty) ==
      "SELECT rowid, t.rowid FROM t")
    // a declared column named oid shadows the alias
    assert(RowidRewrite.normalizeAliases(
      "SELECT oid FROM t", Set("oid")) == "SELECT oid FROM t")
    // backtick-quoted = explicit column reference, never rewritten
    assert(RowidRewrite.normalizeAliases(
      "SELECT `oid` FROM t", Set.empty) == "SELECT `oid` FROM t")
    // an output alias names the result column, not the rowid surface
    assert(RowidRewrite.normalizeAliases(
      "SELECT x AS oid FROM t", Set.empty) == "SELECT x AS oid FROM t")
  }

  test("bare * over an enabled table expands to visible columns") {
    assert(RowidRewrite.expandStars("SELECT * FROM t", t) ==
      "SELECT t.a, t.b, t.c FROM t")
    assert(RowidRewrite.expandStars("SELECT rowid, * FROM t", t) ==
      "SELECT rowid, t.a, t.b, t.c FROM t")
    assert(RowidRewrite.expandStars("SELECT *, rowid FROM t WHERE a > 1", t) ==
      "SELECT t.a, t.b, t.c, rowid FROM t WHERE a > 1")
  }

  test("aliased and qualified stars expand with the written qualifier") {
    assert(RowidRewrite.expandStars("SELECT x.* FROM t x", t) ==
      "SELECT x.a, x.b, x.c FROM t x")
    assert(RowidRewrite.expandStars("SELECT x.* FROM t AS x", t) ==
      "SELECT x.a, x.b, x.c FROM t AS x")
    assert(RowidRewrite.expandStars("SELECT t.* FROM t", t) ==
      "SELECT t.a, t.b, t.c FROM t")
  }

  test("multi-table FROM: enabled side expands, other side stays a star") {
    val out = RowidRewrite.expandStars(
      "SELECT * FROM t x JOIN s y ON x.a = y.k", t)
    assert(out == "SELECT x.a, x.b, x.c, y.* FROM t x JOIN s y ON x.a = y.k")
  }

  test("stars that do not touch an enabled table are untouched") {
    assert(RowidRewrite.expandStars("SELECT * FROM s", t) == "SELECT * FROM s")
    assert(RowidRewrite.expandStars("SELECT count(*) FROM t", t) ==
      "SELECT count(*) FROM t")
    assert(RowidRewrite.expandStars("SELECT y.* FROM s y JOIN t ON 1=1", t) ==
      "SELECT y.* FROM s y JOIN t ON 1=1")
  }

  test("subquery SELECTs expand independently; outer stars see no table") {
    val out = RowidRewrite.expandStars(
      "SELECT * FROM (SELECT * FROM t) q", t)
    // inner * expands (binds to t); outer * binds to the subquery
    // alias q, which is not an enabled table
    assert(out == "SELECT * FROM (SELECT t.a, t.b, t.c FROM t) q")
  }

  test("multiplication stars are never select items") {
    assert(RowidRewrite.expandStars("SELECT a * b FROM t", t) ==
      "SELECT a * b FROM t")
    assert(RowidRewrite.expandStars("SELECT 3 * 4 FROM t", t) ==
      "SELECT 3 * 4 FROM t")
  }

  test("NATURAL/USING join with a bare star over an enabled table declines") {
    intercept[UnsupportedOperationException] {
      RowidRewrite.expandStars("SELECT * FROM t NATURAL JOIN s", t)
    }
    intercept[UnsupportedOperationException] {
      RowidRewrite.expandStars("SELECT * FROM t JOIN s USING (a)", t)
    }
    // qualified stars stay fine under USING when they bind elsewhere
    assert(RowidRewrite.expandStars(
      "SELECT a, b FROM t JOIN s USING (a)", t) ==
      "SELECT a, b FROM t JOIN s USING (a)")
  }

  test("un-aliased subquery next to an enabled table with bare star declines") {
    intercept[UnsupportedOperationException] {
      RowidRewrite.expandStars(
        "SELECT * FROM t, (SELECT 1 AS z)", Map("t" -> Seq("a")))
    }
    // aliased subquery is representable
    assert(RowidRewrite.expandStars(
      "SELECT * FROM t, (SELECT 1 AS z) q", Map("t" -> Seq("a"))) ==
      "SELECT t.a, q.* FROM t, (SELECT 1 AS z) q")
  }

  test("INSERT … SELECT * expands through the whole statement") {
    assert(RowidRewrite.expandStars(
      "INSERT INTO s SELECT * FROM t WHERE a > 0", t) ==
      "INSERT INTO s SELECT t.a, t.b, t.c FROM t WHERE a > 0")
  }

  test("backticked table names and odd column names quote correctly") {
    val m = Map("9abc" -> Seq("x y", "ok"))
    assert(RowidRewrite.expandStars("SELECT * FROM `9abc`", m) ==
      "SELECT `9abc`.`x y`, `9abc`.ok FROM `9abc`")
  }

  test("cteNames collects WITH-defined names, nested and chained") {
    assert(RowidRewrite.cteNames(
      "WITH a AS (SELECT 1), b(x) AS (SELECT 2) SELECT * FROM a, b") ==
      Set("a", "b"))
    assert(RowidRewrite.cteNames(
      "WITH RECURSIVE r AS (SELECT 1 UNION ALL SELECT n+1 FROM r) " +
        "SELECT * FROM r") == Set("r"))
    assert(RowidRewrite.cteNames(
      "SELECT * FROM (WITH q AS (SELECT 1) SELECT * FROM q)") == Set("q"))
    assert(RowidRewrite.cteNames(
      "WITH t AS NOT MATERIALIZED (SELECT 1) SELECT * FROM t") == Set("t"))
    assert(RowidRewrite.cteNames("SELECT 'with' FROM t") == Set.empty)
  }

  test("set operations: each branch expands against its own FROM") {
    val out = RowidRewrite.expandStars(
      "SELECT * FROM t UNION ALL SELECT * FROM s", t)
    assert(out == "SELECT t.a, t.b, t.c FROM t UNION ALL SELECT * FROM s")
  }
}
