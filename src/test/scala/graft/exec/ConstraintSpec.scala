package graft.exec

import graft.SparkSpec
import graft.text2sql.SqlDialect

/** NOT NULL / CHECK constraint enforcement, pinned against sqlite3
  * 3.51 running the same statements (error texts, evaluation order,
  * OR IGNORE / OR REPLACE / DO NOTHING interactions — every behavior
  * asserted here was measured first). */
class ConstraintSpec extends SparkSpec {

  private def sql(q: String) =
    Runner.runSql(spark, SqlDialect.translate(q))

  private def rowsOf(q: String): Seq[Seq[Any]] =
    sql(q).collect().map(_.toSeq.toSeq).toSeq

  private var n = 0
  private def fresh(): String = { n += 1; s"con_t$n" }

  test("NOT NULL raises SQLite's exact error; the write rolls back") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT NOT NULL, b INT)")
    sql(s"INSERT INTO $t VALUES (1, 2)")
    val e = intercept[Exception](sql(s"INSERT INTO $t VALUES (NULL, 3)"))
    assert(e.getMessage.contains(s"NOT NULL constraint failed: $t.a"),
      e.getMessage)
    // statement-atomic: nothing landed
    assert(rowsOf(s"SELECT a, b FROM $t") == Seq(Seq(1L, 2L)))
  }

  test("unnamed CHECK names the expr as written; named CHECK names " +
      "the constraint; declaration order decides on multi-violation") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT, b INT CHECK (b > 0), " +
      s"CONSTRAINT amax CHECK (a < 100))")
    val e1 = intercept[Exception](sql(s"INSERT INTO $t VALUES (1, -1)"))
    assert(e1.getMessage.contains("CHECK constraint failed: b > 0"),
      e1.getMessage)
    val e2 = intercept[Exception](sql(s"INSERT INTO $t VALUES (200, 1)"))
    assert(e2.getMessage.contains("CHECK constraint failed: amax"),
      e2.getMessage)
    // both violated: the FIRST declared check reports (measured)
    val e3 = intercept[Exception](sql(s"INSERT INTO $t VALUES (200, -1)"))
    assert(e3.getMessage.contains("CHECK constraint failed: b > 0"),
      e3.getMessage)
    // NULL passes a CHECK (only FALSE fails — measured)
    sql(s"INSERT INTO $t VALUES (1, NULL)")
    assert(rowsOf(s"SELECT a FROM $t") == Seq(Seq(1L)))
  }

  test("NOT NULL checks before CHECK even when the CHECK's column " +
      "comes first (measured order)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT CHECK (a > 0), b INT NOT NULL)")
    val e = intercept[Exception](sql(s"INSERT INTO $t VALUES (-1, NULL)"))
    assert(e.getMessage.contains(s"NOT NULL constraint failed: $t.b"),
      e.getMessage)
  }

  test("an unlisted NOT NULL column takes its DEFAULT; without one " +
      "the insert raises") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT NOT NULL DEFAULT 7, b INT)")
    sql(s"INSERT INTO $t(b) VALUES (1)")
    assert(rowsOf(s"SELECT a, b FROM $t") == Seq(Seq(7L, 1L)))
    val u = fresh()
    sql(s"CREATE TABLE $u(a INT NOT NULL, b INT)")
    val e = intercept[Exception](sql(s"INSERT INTO $u(b) VALUES (1)"))
    assert(e.getMessage.contains(s"NOT NULL constraint failed: $u.a"),
      e.getMessage)
  }

  test("INSERT OR IGNORE skips violating rows; explicit ON CONFLICT " +
      "DO NOTHING still aborts (both measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT, b INT, CHECK (a < b))")
    sql(s"INSERT OR IGNORE INTO $t VALUES (5, 1), (1, 5)")
    assert(rowsOf(s"SELECT a, b FROM $t") == Seq(Seq(1L, 5L)))
    val e = intercept[Exception](
      sql(s"INSERT INTO $t VALUES (9, 1) ON CONFLICT DO NOTHING"))
    assert(e.getMessage.contains("CHECK constraint failed: a < b"),
      e.getMessage)
    // OR IGNORE skips NOT NULL violations too
    val u = fresh()
    sql(s"CREATE TABLE $u(a INT NOT NULL, b INT)")
    sql(s"INSERT OR IGNORE INTO $u VALUES (NULL, 1), (2, 2)")
    assert(rowsOf(s"SELECT a, b FROM $u") == Seq(Seq(2L, 2L)))
  }

  test("the REPLACE algorithm substitutes the DEFAULT for a NULL in a " +
      "NOT NULL column, and aborts when none exists (measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(k INT PRIMARY KEY, a INT NOT NULL DEFAULT 3)")
    sql(s"INSERT OR REPLACE INTO $t VALUES (1, NULL)")
    assert(rowsOf(s"SELECT k, a FROM $t") == Seq(Seq(1L, 3L)))
    val u = fresh()
    sql(s"CREATE TABLE $u(k INT PRIMARY KEY, a INT NOT NULL)")
    val e = intercept[Exception](
      sql(s"INSERT OR REPLACE INTO $u VALUES (1, NULL)"))
    assert(e.getMessage.contains(s"NOT NULL constraint failed: $u.a"),
      e.getMessage)
  }

  test("UPDATE enforces; UPDATE OR IGNORE skips violating rows " +
      "(they keep their old values — measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(k INT, a INT NOT NULL, b INT CHECK (b >= 0))")
    sql(s"INSERT INTO $t VALUES (1, 10, 0), (2, 20, 5)")
    val e1 = intercept[Exception](
      sql(s"UPDATE $t SET a = NULL WHERE k = 1"))
    assert(e1.getMessage.contains(s"NOT NULL constraint failed: $t.a"),
      e1.getMessage)
    val e2 = intercept[Exception](sql(s"UPDATE $t SET b = -1 WHERE k = 2"))
    assert(e2.getMessage.contains("CHECK constraint failed: b >= 0"),
      e2.getMessage)
    // untouched after both failures
    assert(rowsOf(s"SELECT k, a, b FROM $t ORDER BY k") ==
      Seq(Seq(1L, 10L, 0L), Seq(2L, 20L, 5L)))
    // OR IGNORE: the NULL-assigning row keeps its old value, the
    // conforming row updates (measured: 1|10, 2|99)
    sql(s"UPDATE OR IGNORE $t SET a = " +
      s"CASE WHEN k = 1 THEN NULL ELSE 99 END")
    assert(rowsOf(s"SELECT k, a FROM $t ORDER BY k") ==
      Seq(Seq(1L, 10L), Seq(2L, 99L)))
    // a CHECK referencing an ASSIGNED column gates on the NEW value
    sql(s"UPDATE OR IGNORE $t SET b = b - 10")
    assert(rowsOf(s"SELECT k, b FROM $t ORDER BY k") ==
      Seq(Seq(1L, 0L), Seq(2L, 5L))) // both would go negative: skipped
    sql(s"UPDATE OR IGNORE $t SET b = b + 1")
    assert(rowsOf(s"SELECT k, b FROM $t ORDER BY k") ==
      Seq(Seq(1L, 1L), Seq(2L, 6L)))
    // OR FAIL: a statement that WOULD violate declines named (its
    // rowid-order partial effects have no set-based equivalent)
    val e3 = intercept[UnsupportedOperationException](
      sql(s"UPDATE OR FAIL $t SET a = NULL"))
    assert(e3.getMessage.contains("NOT NULL/CHECK"), e3.getMessage)
  }

  test("UPDATE OR FAIL with no would-violation IS a plain UPDATE " +
      "(measured); a would-be unique conflict or constraint hit " +
      "declines named with the table untouched") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT PRIMARY KEY, b INT CHECK (b > 0))")
    sql(s"INSERT INTO $t VALUES (1, 10), (2, 20), (3, 30)")
    // measured: sqlite3 applies both rows, changes() = 2
    sql(s"UPDATE OR FAIL $t SET b = b + 1 WHERE a >= 2")
    assert(rowsOf(s"SELECT changes()") == Seq(Seq(2L)))
    assert(rowsOf(s"SELECT a, b FROM $t ORDER BY a") ==
      Seq(Seq(1L, 10L), Seq(2L, 21L), Seq(3L, 31L)))
    // a CHECK hit mid-statement would leave rowid-order partials
    val e1 = intercept[UnsupportedOperationException](
      sql(s"UPDATE OR FAIL $t SET b = b - 25"))
    assert(e1.getMessage.contains("NOT NULL/CHECK"), e1.getMessage)
    // a re-key onto an occupied key likewise
    val e2 = intercept[UnsupportedOperationException](
      sql(s"UPDATE OR FAIL $t SET a = 2 WHERE a = 1"))
    assert(e2.getMessage.contains("UNIQUE conflict"), e2.getMessage)
    // a conflict-free re-key executes
    sql(s"UPDATE OR FAIL $t SET a = 9 WHERE a = 1")
    assert(rowsOf(s"SELECT a, b FROM $t ORDER BY a") ==
      Seq(Seq(2L, 21L), Seq(3L, 31L), Seq(9L, 10L)))
  }

  test("a WITHOUT ROWID PRIMARY KEY is implicitly NOT NULL (insert " +
      "raises, table_info reports 1 — both measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(k TEXT PRIMARY KEY, v INT) WITHOUT ROWID")
    val e = intercept[Exception](sql(s"INSERT INTO $t VALUES (NULL, 1)"))
    assert(e.getMessage.contains(s"NOT NULL constraint failed: $t.k"),
      e.getMessage)
    assert(rowsOf(s"SELECT name, `notnull`, pk FROM pragma_table_info('$t') " +
      s"ORDER BY cid") == Seq(Seq("k", 1, 1), Seq("v", 0, 0)))
    // composite WITHOUT ROWID key: any NULL member raises, naming it
    val w = fresh()
    sql(s"CREATE TABLE $w(a INT, b INT, v TEXT, PRIMARY KEY (a, b)) " +
      s"WITHOUT ROWID")
    val e2 = intercept[Exception](sql(s"INSERT INTO $w VALUES (1, NULL, 'x')"))
    assert(e2.getMessage.contains(s"NOT NULL constraint failed: $w.b"),
      e2.getMessage)
  }

  test("an INTEGER PRIMARY KEY NOT NULL still auto-assigns a NULL key " +
      "(the rowid-alias rule precedes the constraint — measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(k INTEGER PRIMARY KEY NOT NULL, v TEXT)")
    sql(s"INSERT INTO $t VALUES (NULL, 'x')")
    assert(rowsOf(s"SELECT k, v FROM $t") == Seq(Seq(1L, "x")))
  }

  test("subqueries are prohibited in CHECK constraints (SQLite's own " +
      "parse error) and unknown columns error at CREATE") {
    val e = intercept[Exception](
      sql(s"CREATE TABLE ${fresh()}(a INT, CHECK (a IN (SELECT 1)))"))
    assert(e.getMessage.contains(
      "subqueries prohibited in CHECK constraints"), e.getMessage)
    val e2 = intercept[Exception](
      sql(s"CREATE TABLE ${fresh()}(a INT, CHECK (zz > 0))"))
    assert(e2.getMessage.contains("error in CHECK constraint"),
      e2.getMessage)
  }

  test("DEFAULT VALUES routes through the same checks (a violating " +
      "default aborts — measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT DEFAULT -5 CHECK (a > 0))")
    val e = intercept[Exception](sql(s"INSERT INTO $t DEFAULT VALUES"))
    assert(e.getMessage.contains("CHECK constraint failed: a > 0"),
      e.getMessage)
  }

  test("sqlite_master renders the declared constraints; ALTER guards " +
      "CHECK-referenced columns; ADD COLUMN constraints register") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT NOT NULL, b TEXT COLLATE NOCASE, " +
      s"CONSTRAINT amax CHECK (a < 100))")
    val master = rowsOf(
      s"SELECT sql FROM sqlite_master WHERE name = '$t'").head.head.toString
    assert(master.contains("NOT NULL"), master)
    assert(master.contains("COLLATE NOCASE"), master)
    assert(master.contains("CONSTRAINT amax CHECK (a < 100)"), master)
    val e1 = intercept[UnsupportedOperationException](
      sql(s"ALTER TABLE $t RENAME COLUMN a TO z"))
    assert(e1.getMessage.contains("CHECK constraint amax"), e1.getMessage)
    val e2 = intercept[Exception](sql(s"ALTER TABLE $t DROP COLUMN a"))
    assert(e2.getMessage.contains("after drop column"), e2.getMessage)
    // an added column's NOT NULL/CHECK enforce on later writes
    sql(s"ALTER TABLE $t ADD COLUMN c INT NOT NULL DEFAULT 1")
    sql(s"ALTER TABLE $t ADD COLUMN d INT CHECK (d > 0)")
    val e3 = intercept[Exception](
      sql(s"INSERT INTO $t VALUES (1, 'x', NULL, 5)"))
    assert(e3.getMessage.contains(s"NOT NULL constraint failed: $t.c"),
      e3.getMessage)
    val e4 = intercept[Exception](
      sql(s"INSERT INTO $t VALUES (1, 'x', 1, -5)"))
    assert(e4.getMessage.contains("CHECK constraint failed: d > 0"),
      e4.getMessage)
    sql(s"INSERT INTO $t VALUES (1, 'x', 1, 5)")
    assert(rowsOf(s"SELECT a, c, d FROM $t") == Seq(Seq(1L, 1L, 5L)))
  }

  test("an FK ON DELETE SET NULL cascade into a NOT NULL child column " +
      "raises the child's constraint (SQLite's outcome)") {
    val p = fresh(); val c = fresh()
    sql(s"CREATE TABLE $p(id INT PRIMARY KEY, v TEXT)")
    sql(s"CREATE TABLE $c(cid INT, pid INT NOT NULL " +
      s"REFERENCES $p(id) ON DELETE SET NULL)")
    sql(s"INSERT INTO $p VALUES (1, 'a'), (2, 'b')")
    sql(s"INSERT INTO $c VALUES (10, 1), (20, 2)")
    sql("PRAGMA foreign_keys = 1")
    try {
      val e = intercept[Exception](sql(s"DELETE FROM $p WHERE id = 1"))
      assert(e.getMessage.contains(s"NOT NULL constraint failed: $c.pid"),
        e.getMessage)
    } finally sql("PRAGMA foreign_keys = 0")
  }

  test("constraints drop with their table and follow a rename") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT NOT NULL)")
    val t2 = s"${t}_r"
    sql(s"ALTER TABLE $t RENAME TO $t2")
    val e = intercept[Exception](sql(s"INSERT INTO $t2 VALUES (NULL)"))
    assert(e.getMessage.contains(s"NOT NULL constraint failed"),
      e.getMessage)
    sql(s"DROP TABLE $t2")
    sql(s"CREATE TABLE $t2(a INT)")
    sql(s"INSERT INTO $t2 VALUES (NULL)") // constraint died with the drop
    assert(rowsOf(s"SELECT count(*) FROM $t2") == Seq(Seq(1L)))
  }
}
