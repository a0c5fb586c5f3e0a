package graft.exec

import graft.SparkSpec
import graft.text2sql.SqlDialect

/** SQLite 3.35 upsert-clause CHAINS (`ON CONFLICT … ON CONFLICT …`),
  * pinned against sqlite3 3.40.1 running the same statements: a
  * conflicting row routes to the FIRST clause (left to right) whose
  * target it conflicts on — clause order decides, not index
  * declaration order — and that clause consumes the row entirely.
  * Also covers the targetless DO UPDATE form on a multi-key table
  * (SQLite resolves it against whichever constraint actually
  * failed). */
class UpsertChainSpec extends SparkSpec {

  private def sql(q: String) =
    Runner.runSql(spark, SqlDialect.translate(q))

  private def rowsOf(q: String): Seq[Seq[Any]] =
    sql(q).collect().map(_.toSeq.toSeq).toSeq

  private var n = 0
  private def fresh(): String = { n += 1; s"chain_t$n" }

  test("first matching target wins: conflict on a takes clause 1's " +
      "DO UPDATE, conflict on b takes clause 2's DO NOTHING (measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT PRIMARY KEY, b TEXT UNIQUE, v INT)")
    sql(s"INSERT INTO $t VALUES (1,'x',10),(2,'y',20)")
    sql(s"INSERT INTO $t VALUES (1,'z',99) ON CONFLICT(a) DO UPDATE " +
      s"SET v=excluded.v ON CONFLICT(b) DO NOTHING")
    assert(rowsOf(s"SELECT a, b, v FROM $t ORDER BY a") ==
      Seq(Seq(1L, "x", 99L), Seq(2L, "y", 20L)))
    sql(s"INSERT INTO $t VALUES (3,'y',77) ON CONFLICT(a) DO UPDATE " +
      s"SET v=excluded.v ON CONFLICT(b) DO NOTHING")
    assert(rowsOf(s"SELECT a, b, v FROM $t ORDER BY a") ==
      Seq(Seq(1L, "x", 99L), Seq(2L, "y", 20L)))
  }

  test("a row conflicting on SEVERAL keys routes by CLAUSE order, " +
      "not index declaration order (measured both orders)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT, b INT, v INT)")
    sql(s"CREATE UNIQUE INDEX ${t}_u1 ON $t(a)")
    sql(s"CREATE UNIQUE INDEX ${t}_u2 ON $t(b)")
    sql(s"INSERT INTO $t VALUES (1, 9, 10),(5, 2, 20)")
    // (1,2,99) conflicts on a (row 1) AND b (row 2): clause (a) first
    sql(s"INSERT INTO $t VALUES (1,2,99) ON CONFLICT(a) DO NOTHING " +
      s"ON CONFLICT(b) DO UPDATE SET v=excluded.v")
    assert(rowsOf(s"SELECT a, b, v FROM $t ORDER BY a") ==
      Seq(Seq(1L, 9L, 10L), Seq(5L, 2L, 20L)))
    // clause (b) first: row 2 takes the update
    sql(s"INSERT INTO $t VALUES (1,2,99) ON CONFLICT(b) DO UPDATE " +
      s"SET v=excluded.v ON CONFLICT(a) DO NOTHING")
    assert(rowsOf(s"SELECT a, b, v FROM $t ORDER BY a") ==
      Seq(Seq(1L, 9L, 10L), Seq(5L, 2L, 99L)))
  }

  test("trailing targetless clause catches conflicts on any other " +
      "key; three-clause chain routes by first hit (measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT UNIQUE, b INT UNIQUE, c INT UNIQUE, v INT)")
    sql(s"INSERT INTO $t VALUES (1,10,100,0),(2,20,200,0)")
    // incoming hits a (row 1) first → DO NOTHING, even though b and
    // the targetless tail also match
    sql(s"INSERT INTO $t VALUES (9,9,100,3) ON CONFLICT(a) DO NOTHING " +
      s"ON CONFLICT(b) DO UPDATE SET v=5 ON CONFLICT DO NOTHING")
    assert(rowsOf(s"SELECT a, b, c, v FROM $t ORDER BY a") ==
      Seq(Seq(1L, 10L, 100L, 0L), Seq(2L, 20L, 200L, 0L)))
    // conflict ONLY on c → the targetless tail (DO NOTHING) consumes
    sql(s"INSERT INTO $t VALUES (7,8,100,3) ON CONFLICT(a) DO NOTHING " +
      s"ON CONFLICT(b) DO UPDATE SET v=5 ON CONFLICT DO NOTHING")
    assert(rowsOf(s"SELECT count(*) FROM $t") == Seq(Seq(2L)))
    // no conflict at all → plain append
    sql(s"INSERT INTO $t VALUES (7,8,300,3) ON CONFLICT(a) DO NOTHING " +
      s"ON CONFLICT(b) DO UPDATE SET v=5 ON CONFLICT DO NOTHING")
    assert(rowsOf(s"SELECT count(*) FROM $t") == Seq(Seq(3L)))
  }

  test("targetless DO UPDATE on a multi-key table resolves against " +
      "whichever key actually conflicted (measured — the single-key " +
      "join would miss the second index)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT PRIMARY KEY, b TEXT UNIQUE, v INT)")
    sql(s"INSERT INTO $t VALUES (1,'x',10),(2,'y',20)")
    // conflicts on PK a
    sql(s"INSERT INTO $t VALUES (2,'w',88) ON CONFLICT DO UPDATE " +
      s"SET v=excluded.v")
    assert(rowsOf(s"SELECT a, b, v FROM $t ORDER BY a") ==
      Seq(Seq(1L, "x", 10L), Seq(2L, "y", 88L)))
    // conflicts on UNIQUE b only — sqlite3 updates row 1 through it
    sql(s"INSERT INTO $t VALUES (7,'x',55) ON CONFLICT DO UPDATE " +
      s"SET v=excluded.v")
    assert(rowsOf(s"SELECT a, b, v FROM $t ORDER BY a") ==
      Seq(Seq(1L, "x", 55L), Seq(2L, "y", 88L)))
    // chain tail form: ON CONFLICT(b) DO NOTHING … ON CONFLICT DO
    // UPDATE — a PK-only conflict reaches the targetless update
    sql(s"INSERT INTO $t VALUES (1,'q',42) ON CONFLICT(b) DO NOTHING " +
      s"ON CONFLICT DO UPDATE SET v=excluded.v")
    assert(rowsOf(s"SELECT a, b, v FROM $t ORDER BY a") ==
      Seq(Seq(1L, "x", 42L), Seq(2L, "y", 88L)))
  }

  test("a false DO UPDATE WHERE gate DROPS the row — it is consumed, " +
      "never passed to a later clause (measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT UNIQUE, b INT UNIQUE, v INT)")
    sql(s"INSERT INTO $t VALUES (1,9,10),(5,2,20)")
    // (1,2,99) hits BOTH keys; clause 1's false gate consumes it —
    // sqlite3 leaves both rows untouched and appends nothing
    sql(s"INSERT INTO $t VALUES (1,2,99) ON CONFLICT(a) DO UPDATE " +
      s"SET v=excluded.v WHERE 0 ON CONFLICT(b) DO NOTHING")
    assert(rowsOf(s"SELECT a, b, v FROM $t ORDER BY a") ==
      Seq(Seq(1L, 9L, 10L), Seq(5L, 2L, 20L)))
  }

  test("duplicate targets: the first clause wins (measured); a " +
      "conflict no clause covers aborts with SQLite's UNIQUE error") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT UNIQUE, b INT UNIQUE, v INT)")
    sql(s"INSERT INTO $t VALUES (1,9,10),(5,2,20)")
    sql(s"INSERT INTO $t VALUES (1,3,7) ON CONFLICT(a) DO NOTHING " +
      s"ON CONFLICT(a) DO UPDATE SET v=1")
    assert(rowsOf(s"SELECT a, b, v FROM $t ORDER BY a") ==
      Seq(Seq(1L, 9L, 10L), Seq(5L, 2L, 20L)))
    // conflict only on b, but only a is covered → SQLite's error
    val e = intercept[Exception](
      sql(s"INSERT INTO $t VALUES (3,2,55) ON CONFLICT(a) DO NOTHING " +
        s"ON CONFLICT(a) DO UPDATE SET v=1"))
    assert(e.getMessage.contains(s"UNIQUE constraint failed: $t.b"),
      e.getMessage)
    assert(rowsOf(s"SELECT count(*) FROM $t") == Seq(Seq(2L)))
  }

  test("declines and errors: two DO UPDATE clauses decline named; a " +
      "chain target matching no index raises SQLite's error; chains " +
      "on a constraint-less ingested table raise it too") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT UNIQUE, b INT UNIQUE, v INT)")
    sql(s"INSERT INTO $t VALUES (1,9,10)")
    val e1 = intercept[UnsupportedOperationException](
      sql(s"INSERT INTO $t VALUES (1,2,3) ON CONFLICT(a) DO UPDATE " +
        s"SET v=1 ON CONFLICT(b) DO UPDATE SET v=2"))
    assert(e1.getMessage.contains("multiple ON CONFLICT DO UPDATE"),
      e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      sql(s"INSERT INTO $t VALUES (1,2,3) ON CONFLICT(v) DO NOTHING " +
        s"ON CONFLICT DO NOTHING"))
    assert(e2.getMessage.contains("1st ON CONFLICT clause does not " +
      "match any PRIMARY KEY or UNIQUE constraint"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      sql(s"INSERT INTO $t VALUES (1,2,3) ON CONFLICT(a) DO NOTHING " +
        s"ON CONFLICT(v) DO UPDATE SET v=1"))
    assert(e3.getMessage.contains("2nd ON CONFLICT clause does not " +
      "match any PRIMARY KEY or UNIQUE constraint"), e3.getMessage)
  }

  test("batch routing: covered-key batch duplicates keep the first " +
      "row (documented stand-in); RETURNING reports the affected slice") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT UNIQUE, b INT UNIQUE, v INT)")
    sql(s"INSERT INTO $t VALUES (1,9,10),(5,2,20)")
    // one update (a=1), one drop (b=2 → DO NOTHING), one append
    val r = sql(s"INSERT INTO $t VALUES (1,7,91),(6,2,92),(8,8,93) " +
      s"ON CONFLICT(a) DO UPDATE SET v=excluded.v " +
      s"ON CONFLICT(b) DO NOTHING RETURNING a, v")
    assert(r.collect().map(x => (x.getLong(0), x.getLong(1))).toSet ==
      Set((1L, 91L), (8L, 93L)))
    assert(rowsOf(s"SELECT a, b, v FROM $t ORDER BY a") ==
      Seq(Seq(1L, 9L, 91L), Seq(5L, 2L, 20L), Seq(8L, 8L, 93L)))
  }

  test("an earlier pass re-keying the base row a later sub-slice " +
      "conflicted on turns that row into an INSERT — counted in " +
      "RETURNING and changes() (measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT PRIMARY KEY, b INT UNIQUE, v TEXT)")
    sql(s"INSERT INTO $t VALUES (1, 10, 'base')")
    // (1,99) conflicts on the PK and re-keys b 10→99; (5,10)
    // conflicted on b against the ORIGINAL base but inserts at its
    // turn (sqlite3-measured: both rows in RETURNING, changes() = 2)
    val r = sql(s"INSERT INTO $t VALUES (1, 99, 'upd'), (5, 10, 'new') " +
      s"ON CONFLICT DO UPDATE SET b = excluded.b, v = excluded.v " +
      s"RETURNING a, b, v")
    assert(r.collect().map(x =>
      (x.getLong(0), x.getLong(1), x.getString(2))).toSet ==
      Set((1L, 99L, "upd"), (5L, 10L, "new")))
    assert(rowsOf(s"SELECT changes()") == Seq(Seq(2L)))
    assert(rowsOf(s"SELECT a, b, v FROM $t ORDER BY a") ==
      Seq(Seq(1L, 99L, "upd"), Seq(5L, 10L, "new")))
  }
}
