package graft.exec

import graft.SparkSpec
import graft.text2sql.SqlDialect

/** SQLite 3.37 STRICT tables and WITHOUT ROWID, pinned against python
  * sqlite3 3.40.1 running the same statements. */
class StrictTableSpec extends SparkSpec {

  private def sql(q: String) =
    Runner.runSql(spark, SqlDialect.translate(q))

  private def rowsOf(q: String): Seq[Seq[Any]] =
    sql(q).collect().map(_.toSeq.toSeq).toSeq

  private var n = 0
  private def fresh(): String = { n += 1; s"strict_t$n" }

  test("STRICT refuses non-whitelist datatypes at CREATE") {
    val e = intercept[Exception](
      sql(s"CREATE TABLE ${fresh()}(a VARCHAR(10)) STRICT"))
    assert(e.getMessage.contains("unknown datatype"), e.getMessage)
    val e2 = intercept[Exception](
      sql(s"CREATE TABLE ${fresh()}(a) STRICT"))
    assert(e2.getMessage.contains("missing datatype"), e2.getMessage)
    // ANY is a documented targeted decline (typed lake columns)
    val e3 = intercept[UnsupportedOperationException](
      sql(s"CREATE TABLE ${fresh()}(a ANY) STRICT"))
    assert(e3.getMessage.contains("ANY"), e3.getMessage)
  }

  test("INTEGER column: lossless conversions store, lossy ones raise " +
      "with SQLite's class naming") {
    val t = fresh()
    sql(s"CREATE TABLE $t(i INTEGER) STRICT")
    sql(s"INSERT INTO $t VALUES (1)")
    sql(s"INSERT INTO $t VALUES (2.0)")
    sql(s"INSERT INTO $t VALUES ('  12  ')")
    assert(rowsOf(s"SELECT i FROM $t ORDER BY i") ==
      Seq(Seq(1L), Seq(2L), Seq(12L)))
    val e1 = intercept[Exception](sql(s"INSERT INTO $t VALUES (2.5)"))
    assert(e1.getMessage.contains(
      s"cannot store REAL value in INTEGER column $t.i"), e1.getMessage)
    val e2 = intercept[Exception](sql(s"INSERT INTO $t VALUES ('1.5')"))
    assert(e2.getMessage.contains(
      s"cannot store REAL value in INTEGER column $t.i"), e2.getMessage)
    val e3 = intercept[Exception](sql(s"INSERT INTO $t VALUES ('abc')"))
    assert(e3.getMessage.contains(
      s"cannot store TEXT value in INTEGER column $t.i"), e3.getMessage)
    // the failed statements left nothing behind (statement atomicity)
    assert(rowsOf(s"SELECT COUNT(*) FROM $t") == Seq(Seq(3L)))
  }

  test("REAL / TEXT / BLOB columns enforce their classes") {
    val t = fresh()
    sql(s"CREATE TABLE $t(r REAL, t2 TEXT, b BLOB)")
    sql(s"DROP TABLE $t")
    sql(s"CREATE TABLE $t(r REAL, t2 TEXT, b BLOB) STRICT")
    sql(s"INSERT INTO $t(r) VALUES (7)") // int widens into REAL
    assert(rowsOf(s"SELECT r FROM $t WHERE r IS NOT NULL") == Seq(Seq(7.0)))
    val e1 = intercept[Exception](sql(s"INSERT INTO $t(r) VALUES ('abc')"))
    assert(e1.getMessage.contains(
      s"cannot store TEXT value in REAL column $t.r"), e1.getMessage)
    sql(s"INSERT INTO $t(t2) VALUES (5)") // int renders into TEXT
    assert(rowsOf(s"SELECT t2 FROM $t WHERE t2 IS NOT NULL") ==
      Seq(Seq("5")))
    val e2 = intercept[Exception](sql(s"INSERT INTO $t(t2) VALUES (X'41')"))
    assert(e2.getMessage.contains(
      s"cannot store BLOB value in TEXT column $t.t2"), e2.getMessage)
    val e3 = intercept[Exception](sql(s"INSERT INTO $t(b) VALUES ('xyz')"))
    assert(e3.getMessage.contains(
      s"cannot store TEXT value in BLOB column $t.b"), e3.getMessage)
    sql(s"INSERT INTO $t(b) VALUES (X'41')")
    assert(rowsOf(s"SELECT COUNT(*) FROM $t WHERE b IS NOT NULL") ==
      Seq(Seq(1L)))
  }

  test("UPDATE enforces STRICT rules too; NULL always stores") {
    val t = fresh()
    sql(s"CREATE TABLE $t(i INTEGER, t2 TEXT) STRICT")
    sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    val e = intercept[Exception](
      sql(s"UPDATE $t SET i = 'zz' WHERE t2 = 'a'"))
    assert(e.getMessage.contains(
      s"cannot store TEXT value in INTEGER column $t.i"), e.getMessage)
    sql(s"UPDATE $t SET i = '30' WHERE t2 = 'b'") // lossless text
    sql(s"UPDATE $t SET i = NULL WHERE t2 = 'a'")
    assert(rowsOf(s"SELECT i FROM $t ORDER BY t2") ==
      Seq(Seq(null), Seq(30L)))
    // UPDATE … FROM enforces too: the assignment's static type
    // resolves against the JOINED frame — lossless values store,
    // lossy ones raise with SQLite's class naming
    sql(s"UPDATE $t SET i = s.x FROM (SELECT '7' AS x) s WHERE t2 = 'b'")
    assert(rowsOf(s"SELECT i FROM $t WHERE t2 = 'b'") == Seq(Seq(7L)))
    val u = intercept[Exception](
      sql(s"UPDATE $t SET i = s.x FROM (SELECT 2.5 AS x) s WHERE t2 = 'b'"))
    assert(u.getMessage.contains(
      s"cannot store REAL value in INTEGER column $t.i"), u.getMessage)
  }

  test("ALTER ADD COLUMN on a STRICT table validates the datatype") {
    val t = fresh()
    sql(s"CREATE TABLE $t(i INTEGER) STRICT")
    val e = intercept[Exception](
      sql(s"ALTER TABLE $t ADD COLUMN v VARCHAR(5)"))
    assert(e.getMessage.contains("unknown datatype"), e.getMessage)
    sql(s"ALTER TABLE $t ADD COLUMN v TEXT")
    sql(s"INSERT INTO $t(i) VALUES (1)")
    val e2 = intercept[Exception](sql(s"UPDATE $t SET v = X'41'"))
    assert(e2.getMessage.contains(
      s"cannot store BLOB value in TEXT column $t.v"), e2.getMessage)
  }

  test("WITHOUT ROWID requires a PK and suppresses the rowid surface") {
    val e = intercept[Exception](
      sql(s"CREATE TABLE ${fresh()}(a INT) WITHOUT ROWID"))
    assert(e.getMessage.contains("PRIMARY KEY missing"), e.getMessage)
    val t = fresh()
    sql(s"CREATE TABLE $t(k TEXT PRIMARY KEY, v INT) WITHOUT ROWID")
    sql(s"INSERT INTO $t VALUES ('a', 1)")
    assert(rowsOf(s"SELECT * FROM $t") == Seq(Seq("a", 1L)))
    // rowid does not resolve (SQLite: "no such column: rowid")
    val e2 = intercept[Exception](sql(s"SELECT rowid FROM $t"))
    assert(e2.getMessage.toLowerCase.contains("rowid"), e2.getMessage)
    // a rowid-enabled sibling is unaffected
    val t2 = fresh()
    sql(s"CREATE TABLE $t2(v INT)")
    sql(s"INSERT INTO $t2 VALUES (9)")
    assert(rowsOf(s"SELECT rowid, v FROM $t2") == Seq(Seq(1L, 9L)))
  }

  test("PRAGMA table_list reports the wr/strict flags per table") {
    val t = fresh()
    sql(s"CREATE TABLE $t(k TEXT PRIMARY KEY, v INT) WITHOUT ROWID")
    val t2 = fresh()
    sql(s"CREATE TABLE $t2(i INTEGER) STRICT")
    val rows = rowsOf("PRAGMA table_list")
      .map(r => r(1).toString -> (r(4), r(5))).toMap
    assert(rows(t) == ((1, 0)), rows(t).toString)
    assert(rows(t2) == ((0, 1)), rows(t2).toString)
  }

  test("STRICT, WITHOUT ROWID combine; sqlite_master renders the options") {
    val t = fresh()
    sql(s"CREATE TABLE $t(k INTEGER PRIMARY KEY, v TEXT) STRICT, WITHOUT ROWID")
    sql(s"INSERT INTO $t VALUES (1, 'x')")
    val e = intercept[Exception](sql(s"INSERT INTO $t VALUES (2, X'41')"))
    assert(e.getMessage.contains("cannot store BLOB value"), e.getMessage)
    val master = rowsOf(
      s"SELECT sql FROM sqlite_master WHERE name = '$t'").head.head.toString
    assert(master.contains("STRICT") && master.contains("WITHOUT ROWID"),
      master)
  }
}
