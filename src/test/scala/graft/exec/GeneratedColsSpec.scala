package graft.exec

import graft.SparkSpec
import graft.text2sql.SqlDialect

/** SQLite generated columns (GENERATED ALWAYS AS … VIRTUAL|STORED)
  * executed over the copy-on-write machinery. Every expectation is
  * pinned against python sqlite3 3.40.1 running the same statements.
  */
class GeneratedColsSpec extends SparkSpec {

  private def sql(q: String) =
    Runner.runSql(spark, SqlDialect.translate(q))

  private def rowsOf(q: String): Seq[Seq[Any]] =
    sql(q).collect().map(_.toSeq.toSeq).toSeq

  private var n = 0
  private def fresh(): String = { n += 1; s"genc_t$n" }

  test("virtual and stored columns compute on INSERT; positional " +
      "VALUES binds only ordinary columns") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT, b INT GENERATED ALWAYS AS (a*2) VIRTUAL, " +
      s"s TEXT AS (a || '-x') STORED)")
    sql(s"INSERT INTO $t(a) VALUES (3), (5)")
    assert(rowsOf(s"SELECT * FROM $t ORDER BY a") ==
      Seq(Seq(3L, 6L, "3-x"), Seq(5L, 10L, "5-x")))
    // positional: 1 value for the single ordinary column (sqlite:
    // "table has 2 columns but 3 values" when over-supplied)
    val e = intercept[Exception](sql(s"INSERT INTO $t VALUES (1, 9, 'q')"))
    assert(e.getMessage.contains("columns"), e.getMessage)
    sql(s"INSERT INTO $t VALUES (7)")
    assert(rowsOf(s"SELECT b, s FROM $t WHERE a = 7") == Seq(Seq(14L, "7-x")))
  }

  test("INSERT naming a generated column / UPDATE assigning one refuse " +
      "with SQLite's error") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT, b INT AS (a+1))")
    val e1 = intercept[Exception](sql(s"INSERT INTO $t(a, b) VALUES (1, 9)"))
    assert(e1.getMessage.contains("cannot INSERT into generated column"),
      e1.getMessage)
    sql(s"INSERT INTO $t(a) VALUES (1)")
    val e2 = intercept[Exception](sql(s"UPDATE $t SET b = 4"))
    assert(e2.getMessage.contains("cannot UPDATE generated column"),
      e2.getMessage)
  }

  test("UPDATE recomputes generated values from the assigned row") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT, b INT AS (a*2), t2 TEXT)")
    sql(s"INSERT INTO $t(a, t2) VALUES (3, 'x'), (5, 'y')")
    sql(s"UPDATE $t SET a = 10 WHERE a = 3")
    assert(rowsOf(s"SELECT a, b FROM $t ORDER BY a") ==
      Seq(Seq(5L, 10L), Seq(10L, 20L)))
    // RETURNING hands back the recomputed value
    assert(rowsOf(s"UPDATE $t SET a = 6 WHERE a = 5 RETURNING a, b") ==
      Seq(Seq(6L, 12L)))
  }

  test("chained generated columns evaluate in declaration order") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT, b INT AS (a+1), c INT AS (b+1))")
    sql(s"INSERT INTO $t(a) VALUES (1)")
    assert(rowsOf(s"SELECT * FROM $t") == Seq(Seq(1L, 2L, 3L)))
  }

  test("FORWARD references evaluate in dependency order (sqlite rule)") {
    val t = fresh()
    // b references the LATER-declared c: SQLite computes c first
    sql(s"CREATE TABLE $t(a INT, b INT AS (c+1), c INT AS (a+1))")
    sql(s"INSERT INTO $t(a) VALUES (1)")
    assert(rowsOf(s"SELECT * FROM $t") == Seq(Seq(1L, 3L, 2L)))
    // UPDATE recomputes through the same dependency chain
    sql(s"UPDATE $t SET a = 10")
    assert(rowsOf(s"SELECT * FROM $t") == Seq(Seq(10L, 12L, 11L)))
  }

  test("reference cycles are accepted at CREATE and raise SQLite's " +
      "loop error at write time") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT, b INT AS (c+1), c INT AS (b+1))")
    val e = intercept[Exception](sql(s"INSERT INTO $t(a) VALUES (1)"))
    assert(e.getMessage.contains("generated column loop on"), e.getMessage)
    val t2 = fresh()
    sql(s"CREATE TABLE $t2(a INT, b INT AS (b+1))")
    val e2 = intercept[Exception](sql(s"INSERT INTO $t2(a) VALUES (1)"))
    assert(e2.getMessage.contains("generated column loop on \"b\""),
      e2.getMessage)
  }

  test("function expressions work; unknown identifiers refuse at CREATE") {
    val t = fresh()
    sql(s"CREATE TABLE $t(s TEXT, n INT AS (length(s)))")
    sql(s"INSERT INTO $t(s) VALUES ('hello')")
    assert(rowsOf(s"SELECT n FROM $t") == Seq(Seq(5L)))
    val e = intercept[Exception](
      sql(s"CREATE TABLE ${fresh()}(a INT, b INT AS (zz+1))"))
    assert(e.getMessage.contains("generated column"), e.getMessage)
  }

  test("table_info hides generated columns, table_xinfo reports hidden " +
      "2/3, sqlite_master carries the clause") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT, b INT AS (a*2), c TEXT, " +
      s"d INT AS (a+9) STORED, e REAL)")
    val ti = rowsOf(s"PRAGMA table_info($t)")
    assert(ti.map(r => (r(0), r(1))) == Seq((0, "a"), (1, "c"), (2, "e")))
    val txi = rowsOf(s"PRAGMA table_xinfo($t)")
    assert(txi.map(r => (r(0), r(1), r.last)) ==
      Seq((0, "a", 0), (1, "b", 2), (2, "c", 0), (3, "d", 3), (4, "e", 0)))
    val master = rowsOf(
      s"SELECT sql FROM sqlite_master WHERE name = '$t'").head.head.toString
    assert(master.contains("GENERATED ALWAYS AS (a*2)"), master)
    assert(master.contains("GENERATED ALWAYS AS (a+9) STORED"), master)
  }

  test("ALTER interactions: drop-base refuses, drop-generated ok, " +
      "add VIRTUAL computes, add STORED refuses, rename-referenced refuses") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT, b INT AS (a*2), t2 TEXT)")
    sql(s"INSERT INTO $t(a, t2) VALUES (1, 'x')")
    val e1 = intercept[Exception](sql(s"ALTER TABLE $t DROP COLUMN a"))
    assert(e1.getMessage.contains("after drop column: no such column: a"),
      e1.getMessage)
    val e2 = intercept[Exception](
      sql(s"ALTER TABLE $t RENAME COLUMN a TO aa"))
    assert(e2.getMessage.contains("referenced by generated column"),
      e2.getMessage)
    sql(s"ALTER TABLE $t ADD COLUMN v INT AS (a+1)")
    assert(rowsOf(s"SELECT v FROM $t") == Seq(Seq(2L)))
    val e3 = intercept[Exception](
      sql(s"ALTER TABLE $t ADD COLUMN sg INT AS (a+2) STORED"))
    assert(e3.getMessage.contains("cannot add a STORED column"),
      e3.getMessage)
    sql(s"ALTER TABLE $t DROP COLUMN b")
    assert(rowsOf(s"SELECT * FROM $t") == Seq(Seq(1L, "x", 2L)))
    // with b gone, a is only referenced by v — still refuses
    val e4 = intercept[Exception](sql(s"ALTER TABLE $t DROP COLUMN a"))
    assert(e4.getMessage.contains("no such column: a"), e4.getMessage)
    // renaming the generated column itself follows
    sql(s"ALTER TABLE $t RENAME COLUMN v TO vv")
    sql(s"UPDATE $t SET a = 4")
    assert(rowsOf(s"SELECT vv FROM $t") == Seq(Seq(5L)))
  }

  test("ON CONFLICT DO UPDATE recomputes generated columns") {
    val t = fresh()
    sql(s"CREATE TABLE $t(k INTEGER PRIMARY KEY, a INT, b INT AS (a*10))")
    sql(s"INSERT INTO $t(k, a) VALUES (1, 2)")
    sql(s"INSERT INTO $t(k, a) VALUES (1, 7) " +
      s"ON CONFLICT(k) DO UPDATE SET a = excluded.a")
    assert(rowsOf(s"SELECT k, a, b FROM $t") == Seq(Seq(1L, 7L, 70L)))
    val e = intercept[Exception](
      sql(s"INSERT INTO $t(k, a) VALUES (1, 8) " +
        s"ON CONFLICT(k) DO UPDATE SET b = 5"))
    assert(e.getMessage.contains("cannot UPDATE generated column"),
      e.getMessage)
    // OR REPLACE recomputes through the plain insert path
    sql(s"INSERT OR REPLACE INTO $t(k, a) VALUES (1, 9)")
    assert(rowsOf(s"SELECT b FROM $t") == Seq(Seq(90L)))
  }

  test("UPDATE triggers see recomputed NEW generated values") {
    val t = fresh(); val log = fresh()
    sql(s"CREATE TABLE $t(a INT, b INT AS (a*2))")
    sql(s"CREATE TABLE $log(nb INT)")
    sql(s"INSERT INTO $t(a) VALUES (3)")
    sql(s"CREATE TRIGGER ${t}_tr AFTER UPDATE ON $t BEGIN " +
      s"INSERT INTO $log(nb) VALUES (NEW.b); END")
    sql(s"UPDATE $t SET a = 5")
    assert(rowsOf(s"SELECT nb FROM $log") == Seq(Seq(10L)))
  }

  test("DEFAULT VALUES and defaults feed generated computation") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT DEFAULT 4, b INT AS (a+1))")
    sql(s"INSERT INTO $t DEFAULT VALUES")
    assert(rowsOf(s"SELECT a, b FROM $t") == Seq(Seq(4L, 5L)))
  }
}
