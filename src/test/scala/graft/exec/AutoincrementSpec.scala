package graft.exec

import graft.SparkSpec
import graft.text2sql.SqlDialect

/** INTEGER PRIMARY KEY auto-assignment and AUTOINCREMENT +
  * sqlite_sequence bookkeeping, pinned against python sqlite3 3.40.1
  * running the same statements. */
class AutoincrementSpec extends SparkSpec {

  private def sql(q: String) =
    Runner.runSql(spark, SqlDialect.translate(q))

  private def rowsOf(q: String): Seq[Seq[Any]] =
    sql(q).collect().map(_.toSeq.toSeq).toSeq

  private var n = 0
  private def fresh(): String = { n += 1; s"ainc_t$n" }

  test("AUTOINCREMENT requires an INTEGER PRIMARY KEY column") {
    val e1 = intercept[Exception](
      sql(s"CREATE TABLE ${fresh()}(id INT PRIMARY KEY AUTOINCREMENT)"))
    assert(e1.getMessage.contains(
      "AUTOINCREMENT is only allowed on an INTEGER PRIMARY KEY"),
      e1.getMessage)
    val e2 = intercept[Exception](
      sql(s"CREATE TABLE ${fresh()}(id INTEGER AUTOINCREMENT, v TEXT)"))
    assert(e2.getMessage.contains("INTEGER PRIMARY KEY"), e2.getMessage)
  }

  test("missing INTEGER PRIMARY KEY auto-assigns max+1; plain tables " +
      "reuse a deleted max, AUTOINCREMENT never does") {
    val p = fresh()
    sql(s"CREATE TABLE $p(id INTEGER PRIMARY KEY, v TEXT)")
    sql(s"INSERT INTO $p(v) VALUES ('a'), ('b'), ('c')")
    assert(rowsOf(s"SELECT id, v FROM $p ORDER BY id") ==
      Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
    sql(s"DELETE FROM $p WHERE id = 3")
    sql(s"INSERT INTO $p(v) VALUES ('d')")
    // plain table: max is 2 again, so 3 is REUSED (SQLite's rule)
    assert(rowsOf(s"SELECT id, v FROM $p ORDER BY id") ==
      Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "d")))
    val a = fresh()
    sql(s"CREATE TABLE $a(id INTEGER PRIMARY KEY AUTOINCREMENT, v TEXT)")
    sql(s"INSERT INTO $a(v) VALUES ('a'), ('b'), ('c')")
    sql(s"DELETE FROM $a WHERE id = 3")
    sql(s"INSERT INTO $a(v) VALUES ('d')")
    // AUTOINCREMENT: seq was 3, so the new row takes 4
    assert(rowsOf(s"SELECT id, v FROM $a ORDER BY id") ==
      Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(4L, "d")))
  }

  test("explicit ids advance sqlite_sequence; the catalog row tracks, " +
      "renames, and drops with the table") {
    val t = fresh()
    sql(s"CREATE TABLE $t(id INTEGER PRIMARY KEY AUTOINCREMENT, v TEXT)")
    // the catalog table exists from CREATE, with no row yet
    assert(rowsOf(
      s"SELECT name FROM sqlite_master WHERE name = 'sqlite_sequence'")
      == Seq(Seq("sqlite_sequence")))
    assert(rowsOf(s"SELECT * FROM sqlite_sequence WHERE name = '$t'").isEmpty)
    sql(s"INSERT INTO $t(v) VALUES ('a'), ('b')")
    assert(rowsOf(s"SELECT seq FROM sqlite_sequence WHERE name = '$t'") ==
      Seq(Seq(2L)))
    sql(s"INSERT INTO $t(id, v) VALUES (100, 'e')")
    sql(s"INSERT INTO $t(v) VALUES ('f')")
    assert(rowsOf(s"SELECT id FROM $t ORDER BY id") ==
      Seq(Seq(1L), Seq(2L), Seq(100L), Seq(101L)))
    assert(rowsOf(s"SELECT seq FROM sqlite_sequence WHERE name = '$t'") ==
      Seq(Seq(101L)))
    val t2 = s"${t}_renamed"
    sql(s"ALTER TABLE $t RENAME TO $t2")
    assert(rowsOf(s"SELECT seq FROM sqlite_sequence WHERE name = '$t2'") ==
      Seq(Seq(101L)))
    sql(s"DROP TABLE $t2")
    assert(rowsOf(
      s"SELECT * FROM sqlite_sequence WHERE name IN ('$t', '$t2')").isEmpty)
    // the catalog table itself survives the drop
    assert(rowsOf(
      s"SELECT name FROM sqlite_master WHERE name = 'sqlite_sequence'")
      == Seq(Seq("sqlite_sequence")))
  }

  test("explicit NULL keys auto-assign in source order, mixed with " +
      "supplied keys") {
    val t = fresh()
    sql(s"CREATE TABLE $t(id INTEGER PRIMARY KEY, v TEXT)")
    sql(s"INSERT INTO $t(id, v) VALUES (NULL, 'a')")
    sql(s"INSERT INTO $t(id, v) VALUES (5, 'b')")
    sql(s"INSERT INTO $t(id, v) VALUES (NULL, 'c'), (NULL, 'd')")
    assert(rowsOf(s"SELECT id, v FROM $t ORDER BY id") ==
      Seq(Seq(1L, "a"), Seq(5L, "b"), Seq(6L, "c"), Seq(7L, "d")))
    // the AUTOINCREMENT twin numbers past the sequence
    val a = fresh()
    sql(s"CREATE TABLE $a(id INTEGER PRIMARY KEY AUTOINCREMENT, v TEXT)")
    sql(s"INSERT INTO $a(id, v) VALUES (9, 'x')")
    sql(s"DELETE FROM $a WHERE id = 9")
    sql(s"INSERT INTO $a(id, v) VALUES (NULL, 'y')")
    assert(rowsOf(s"SELECT id, v FROM $a") == Seq(Seq(10L, "y")))
  }

  test("NULL keys number past explicit keys supplied EARLIER IN THE " +
      "SAME statement (SQLite's row-at-a-time max-so-far)") {
    // measured sqlite3: empty table, (5,NULL) -> 5,6
    val t = fresh()
    sql(s"CREATE TABLE $t(id INTEGER PRIMARY KEY, v TEXT)")
    sql(s"INSERT INTO $t(id, v) VALUES (5, 'b'), (NULL, 'c')")
    assert(rowsOf(s"SELECT id, v FROM $t ORDER BY id") ==
      Seq(Seq(5L, "b"), Seq(6L, "c")))
    // measured: (10,NULL,3,NULL) -> 10,11,3,12 (max-so-far includes
    // the assigned 11, and the later smaller key 3 doesn't lower it)
    val u = fresh()
    sql(s"CREATE TABLE $u(id INTEGER PRIMARY KEY, v TEXT)")
    sql(s"INSERT INTO $u(id, v) VALUES (10,'a'), (NULL,'b'), (3,'c'), " +
      s"(NULL,'d')")
    assert(rowsOf(s"SELECT id, v FROM $u ORDER BY id") ==
      Seq(Seq(3L, "c"), Seq(10L, "a"), Seq(11L, "b"), Seq(12L, "d")))
    // measured: seq 7 survives a delete; (2,NULL,NULL) -> 2,8,9
    val a = fresh()
    sql(s"CREATE TABLE $a(id INTEGER PRIMARY KEY AUTOINCREMENT, v TEXT)")
    sql(s"INSERT INTO $a(id, v) VALUES (7, 'x')")
    sql(s"DELETE FROM $a")
    sql(s"INSERT INTO $a(id, v) VALUES (2,'a'), (NULL,'b'), (NULL,'c')")
    assert(rowsOf(s"SELECT id, v FROM $a ORDER BY id") ==
      Seq(Seq(2L, "a"), Seq(8L, "b"), Seq(9L, "c")))
  }

  test("INT PRIMARY KEY is NOT the rowid alias: NULL and missing keys " +
      "store as NULL instead of auto-assigning (measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(k INT PRIMARY KEY, v TEXT)")
    sql(s"INSERT INTO $t(v) VALUES ('x')")
    sql(s"INSERT INTO $t VALUES (NULL, 'y')")
    assert(rowsOf(s"SELECT k IS NULL, v FROM $t ORDER BY v") ==
      Seq(Seq(true, "x"), Seq(true, "y")))
  }

  test("a discarded DO NOTHING row still advances the sequence " +
      "(assignment precedes conflict checking)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(id INTEGER PRIMARY KEY AUTOINCREMENT, " +
      s"v TEXT UNIQUE)")
    sql(s"INSERT INTO $t(v) VALUES ('x')")
    sql(s"INSERT INTO $t(v) VALUES ('x') ON CONFLICT(v) DO NOTHING")
    assert(rowsOf(s"SELECT seq FROM sqlite_sequence WHERE name = '$t'") ==
      Seq(Seq(2L)))
    sql(s"INSERT INTO $t(v) VALUES ('y')")
    assert(rowsOf(s"SELECT id FROM $t ORDER BY id") ==
      Seq(Seq(1L), Seq(3L)))
  }

  test("a rolled-back trigger body rolls its sequence advance back too") {
    val a = fresh(); val t = fresh()
    sql(s"CREATE TABLE $a(id INTEGER PRIMARY KEY AUTOINCREMENT, v TEXT)")
    sql(s"CREATE TABLE $t(x INT)")
    sql(s"CREATE TRIGGER ${t}_tr AFTER INSERT ON $t BEGIN " +
      s"INSERT INTO $a(v) VALUES ('from-trigger'); " +
      s"SELECT RAISE(ABORT, 'boom') WHERE NEW.x < 0; END")
    sql(s"INSERT INTO $t VALUES (1)")
    assert(rowsOf(s"SELECT seq FROM sqlite_sequence WHERE name = '$a'") ==
      Seq(Seq(1L)))
    val e = intercept[Exception](sql(s"INSERT INTO $t VALUES (-1)"))
    assert(e.getMessage.contains("boom"), e.getMessage)
    // the aborted statement's body insert AND its seq advance rolled back
    assert(rowsOf(s"SELECT seq FROM sqlite_sequence WHERE name = '$a'") ==
      Seq(Seq(1L)))
    sql(s"INSERT INTO $t VALUES (2)")
    assert(rowsOf(s"SELECT id FROM $a ORDER BY id") ==
      Seq(Seq(1L), Seq(2L)))
  }

  test("DEFAULT VALUES and OR REPLACE assign through the sequence too") {
    val t = fresh()
    sql(s"CREATE TABLE $t(id INTEGER PRIMARY KEY AUTOINCREMENT, " +
      s"v TEXT DEFAULT 'dv')")
    sql(s"INSERT INTO $t DEFAULT VALUES")
    assert(rowsOf(s"SELECT id, v FROM $t") == Seq(Seq(1L, "dv")))
    sql(s"INSERT OR REPLACE INTO $t(v) VALUES ('x')")
    assert(rowsOf(s"SELECT id, v FROM $t ORDER BY id") ==
      Seq(Seq(1L, "dv"), Seq(2L, "x")))
    assert(rowsOf(s"SELECT seq FROM sqlite_sequence WHERE name = '$t'") ==
      Seq(Seq(2L)))
  }
}
