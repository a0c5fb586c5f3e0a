package graft.exec

import graft.SparkSpec
import graft.text2sql.SqlDialect

/** UNIQUE / PRIMARY KEY enforcement on session-declared tables,
  * pinned against sqlite3 3.51 running the same statements. Ingested
  * tables declare no constraints, so none of this machinery runs for
  * them (the documented leading-column conventions are unchanged). */
class UniqueSpec extends SparkSpec {

  private def sql(q: String) =
    Runner.runSql(spark, SqlDialect.translate(q))

  private def rowsOf(q: String): Seq[Seq[Any]] =
    sql(q).collect().map(_.toSeq.toSeq).toSeq

  private var n = 0
  private def fresh(): String = { n += 1; s"uniq_t$n" }

  test("plain INSERT rejects duplicate declared keys with SQLite's " +
      "error — PK, column UNIQUE, table UNIQUE, and unique index") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT PRIMARY KEY, b TEXT UNIQUE, c INT, d INT, " +
      s"UNIQUE (c, d))")
    sql(s"INSERT INTO $t VALUES (1, 'x', 1, 1)")
    val e1 = intercept[Exception](sql(s"INSERT INTO $t VALUES (1, 'y', 2, 2)"))
    assert(e1.getMessage.contains(s"UNIQUE constraint failed: $t.a"),
      e1.getMessage)
    val e2 = intercept[Exception](sql(s"INSERT INTO $t VALUES (2, 'x', 3, 3)"))
    assert(e2.getMessage.contains(s"UNIQUE constraint failed: $t.b"),
      e2.getMessage)
    val e3 = intercept[Exception](sql(s"INSERT INTO $t VALUES (3, 'z', 1, 1)"))
    assert(e3.getMessage.contains(s"UNIQUE constraint failed: $t.c, $t.d"),
      e3.getMessage)
    // nothing landed
    assert(rowsOf(s"SELECT count(*) FROM $t") == Seq(Seq(1L)))
    val u = fresh()
    sql(s"CREATE TABLE $u(a INT)")
    sql(s"CREATE UNIQUE INDEX ${u}_ux ON $u (a)")
    sql(s"INSERT INTO $u VALUES (1)")
    val e4 = intercept[Exception](sql(s"INSERT INTO $u VALUES (1)"))
    assert(e4.getMessage.contains(s"UNIQUE constraint failed: $u.a"),
      e4.getMessage)
  }

  test("batch-internal duplicates reject too; NULL keys never " +
      "conflict (both measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT PRIMARY KEY, b INT UNIQUE)")
    val e = intercept[Exception](
      sql(s"INSERT INTO $t VALUES (1, 1), (1, 2)"))
    assert(e.getMessage.contains(s"UNIQUE constraint failed: $t.a"),
      e.getMessage)
    // a NULL alias key assigned the value a later explicit key takes:
    // ADVICE's silent-duplicate case now rejects (needs the INTEGER
    // alias shape — on INT PRIMARY KEY the NULL just stores, measured)
    val m = fresh()
    sql(s"CREATE TABLE $m(a INTEGER PRIMARY KEY, b INT UNIQUE)")
    val e2 = intercept[Exception](
      sql(s"INSERT INTO $m(a, b) VALUES (1, NULL), (NULL, NULL), (2, NULL)"))
    assert(e2.getMessage.contains(s"UNIQUE constraint failed: $m.a"),
      e2.getMessage)
    // NULLs coexist on UNIQUE columns (measured: both store)
    sql(s"INSERT INTO $t VALUES (1, NULL), (2, NULL)")
    assert(rowsOf(s"SELECT count(*) FROM $t") == Seq(Seq(2L)))
  }

  test("UPDATE re-keying into a collision aborts and rolls back") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT PRIMARY KEY, v TEXT)")
    sql(s"INSERT INTO $t VALUES (1, 'x'), (2, 'y')")
    val e = intercept[Exception](sql(s"UPDATE $t SET a = 1 WHERE a = 2"))
    assert(e.getMessage.contains(s"UNIQUE constraint failed: $t.a"),
      e.getMessage)
    assert(rowsOf(s"SELECT a, v FROM $t ORDER BY a") ==
      Seq(Seq(1L, "x"), Seq(2L, "y")))
  }

  test("OR REPLACE displaces base rows conflicting on ANY unique key " +
      "and resolves batch-internal duplicates last-wins (measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT PRIMARY KEY, b TEXT UNIQUE)")
    sql(s"INSERT INTO $t VALUES (1, 'x'), (2, 'y')")
    // (2,'x') conflicts with row 1 on b AND row 2 on a: both displace
    sql(s"INSERT OR REPLACE INTO $t VALUES (2, 'x')")
    assert(rowsOf(s"SELECT a, b FROM $t") == Seq(Seq(2L, "x")))
    // batch-internal: the LAST row per key wins (measured sqlite3)
    val u = fresh()
    sql(s"CREATE TABLE $u(a INT PRIMARY KEY, v TEXT)")
    sql(s"INSERT OR REPLACE INTO $u VALUES (1, 'first'), (1, 'second')")
    assert(rowsOf(s"SELECT a, v FROM $u") == Seq(Seq(1L, "second")))
  }

  test("targetless DO NOTHING / OR IGNORE skip conflicts on EVERY " +
      "declared key; a targeted clause covers only its key (measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT PRIMARY KEY, b TEXT UNIQUE)")
    sql(s"INSERT INTO $t VALUES (1, 'x')")
    // conflicts on b only — the bare form skips it
    sql(s"INSERT INTO $t VALUES (2, 'x') ON CONFLICT DO NOTHING")
    sql(s"INSERT OR IGNORE INTO $t VALUES (3, 'x'), (4, 'w')")
    assert(rowsOf(s"SELECT a, b FROM $t ORDER BY a") ==
      Seq(Seq(1L, "x"), Seq(4L, "w")))
    // targeted at a: the b-conflict is NOT covered and aborts
    val e = intercept[Exception](
      sql(s"INSERT INTO $t VALUES (5, 'x') ON CONFLICT(a) DO NOTHING"))
    assert(e.getMessage.contains(s"UNIQUE constraint failed: $t.b"),
      e.getMessage)
    // batch-internal duplicate under the bare form keeps the FIRST row
    sql(s"INSERT OR IGNORE INTO $t VALUES (7, 'p1'), (7, 'p2')")
    assert(rowsOf(s"SELECT b FROM $t WHERE a = 7") == Seq(Seq("p1")))
  }

  test("an EXPRESSION unique index enforces, displaces under OR " +
      "REPLACE, and skips under OR IGNORE (all measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a TEXT, v INT)")
    sql(s"CREATE UNIQUE INDEX ${t}_ux ON $t (lower(a))")
    sql(s"INSERT INTO $t VALUES ('Hello', 1)")
    val e = intercept[Exception](sql(s"INSERT INTO $t VALUES ('HELLO', 2)"))
    assert(e.getMessage.contains(s"UNIQUE constraint failed: index '${t}_ux'"),
      e.getMessage)
    // OR REPLACE displaces the case-variant conflictor (measured)
    sql(s"INSERT OR REPLACE INTO $t VALUES ('HELLO', 2)")
    assert(rowsOf(s"SELECT a, v FROM $t") == Seq(Seq("HELLO", 2L)))
    // OR IGNORE skips the conflictor, keeps the novel row (measured)
    sql(s"INSERT OR IGNORE INTO $t VALUES ('hello', 3), ('world', 4)")
    assert(rowsOf(s"SELECT a, v FROM $t ORDER BY v") ==
      Seq(Seq("HELLO", 2L), Seq("world", 4L)))
    // NULL expression values never conflict (measured: both store)
    sql(s"INSERT INTO $t VALUES (NULL, 5), (NULL, 6)")
    assert(rowsOf(s"SELECT count(*) FROM $t") == Seq(Seq(4L)))
    // ALTER guards the indexed expression's column; DROP INDEX frees it
    val e2 = intercept[Exception](sql(s"ALTER TABLE $t DROP COLUMN a"))
    assert(e2.getMessage.contains(s"${t}_ux"), e2.getMessage)
    sql(s"DROP INDEX ${t}_ux")
    sql(s"INSERT INTO $t VALUES ('hello', 7)") // constraint gone
    assert(rowsOf(s"SELECT count(*) FROM $t") == Seq(Seq(5L)))
  }

  test("OR REPLACE batch resolution works on a rowid-ENABLED declared-" +
      "key table (the position tag must not collide with rowid)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INTEGER PRIMARY KEY, v TEXT)")
    sql(s"INSERT INTO $t VALUES (1, 'x')")
    // reference the rowid surface so the emulated column materializes
    assert(rowsOf(s"SELECT rowid FROM $t") == Seq(Seq(1L)))
    sql(s"INSERT OR REPLACE INTO $t VALUES (1, 'first'), (1, 'second')")
    assert(rowsOf(s"SELECT a, v FROM $t") == Seq(Seq(1L, "second")))
    sql(s"INSERT OR IGNORE INTO $t VALUES (1, 'skip'), (2, 'new')")
    assert(rowsOf(s"SELECT a, v FROM $t ORDER BY a") ==
      Seq(Seq(1L, "second"), Seq(2L, "new")))
  }

  test("a PARTIAL unique index enforces only among predicate-TRUE " +
      "rows; exempt rows neither conflict nor displace (all measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT, b INT)")
    sql(s"CREATE UNIQUE INDEX ${t}_ux ON $t (a) WHERE b > 0")
    sql(s"INSERT INTO $t VALUES (1, 1)")
    sql(s"INSERT INTO $t VALUES (1, 0)") // exempt: b <= 0
    val e = intercept[Exception](sql(s"INSERT INTO $t VALUES (1, 2)"))
    assert(e.getMessage.contains(s"UNIQUE constraint failed: $t.a"),
      e.getMessage)
    // OR REPLACE displaces only the in-predicate conflictor (measured:
    // (1,1) goes, (1,0) survives)
    sql(s"INSERT OR REPLACE INTO $t VALUES (1, 5)")
    assert(rowsOf(s"SELECT a, b FROM $t ORDER BY b") ==
      Seq(Seq(1L, 0L), Seq(1L, 5L)))
    // OR IGNORE skips the in-predicate conflictor, keeps the rest
    sql(s"INSERT OR IGNORE INTO $t VALUES (1, 7), (2, 8)")
    assert(rowsOf(s"SELECT a, b FROM $t ORDER BY b") ==
      Seq(Seq(1L, 0L), Seq(1L, 5L), Seq(2L, 8L)))
    // an OUT-of-predicate incoming row conflicts with nothing
    sql(s"INSERT OR REPLACE INTO $t VALUES (1, -1)")
    assert(rowsOf(s"SELECT a, b FROM $t ORDER BY b") ==
      Seq(Seq(1L, -1L), Seq(1L, 0L), Seq(1L, 5L), Seq(2L, 8L)))
    // PRAGMA index_list reports the partial flag
    assert(rowsOf(s"PRAGMA index_list($t)")
      .map(r => (r(1), r(2), r(4))) == Seq((s"${t}_ux", 1, 1)))
    sql(s"DROP INDEX ${t}_ux")
  }

  test("one batch mixing exempt and in-scope rows on the SAME key " +
      "keeps both — the exempt row must not inflate the in-scope " +
      "row's dedup rank (measured: sqlite3 inserts both)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT, b INT)")
    sql(s"CREATE UNIQUE INDEX ${t}_ux ON $t (a) WHERE b > 0")
    // exempt (b<=0) first, in-scope second — the shape that silently
    // dropped the in-scope row when the dedup window ignored scope
    sql(s"INSERT OR IGNORE INTO $t VALUES (1, -1), (1, 5)")
    assert(rowsOf(s"SELECT a, b FROM $t ORDER BY b") ==
      Seq(Seq(1L, -1L), Seq(1L, 5L)))
    // OR REPLACE (keepLast) with the exempt row LAST: the in-scope
    // row ahead of it survives untouched
    sql(s"DELETE FROM $t")
    sql(s"INSERT OR REPLACE INTO $t VALUES (2, 3), (2, 0)")
    assert(rowsOf(s"SELECT a, b FROM $t ORDER BY b") ==
      Seq(Seq(2L, 0L), Seq(2L, 3L)))
    // NULL-keyed rows are exempt the same way: same batch as an
    // in-scope row, both land
    sql(s"INSERT OR IGNORE INTO $t VALUES (NULL, 9), (3, 9)")
    assert(rowsOf(s"SELECT a, b FROM $t WHERE b = 9 ORDER BY a") ==
      Seq(Seq(null, 9L), Seq(3L, 9L))) // SQLite: NULLs sort first ASC
    // and two in-scope conflictors in the batch still resolve to one
    sql(s"INSERT OR IGNORE INTO $t VALUES (4, 1), (4, 2)")
    assert(rowsOf(s"SELECT a, b FROM $t WHERE a = 4") == Seq(Seq(4L, 1L)))
    sql(s"DROP INDEX ${t}_ux")
  }

  test("UPDATE OR REPLACE deletes the row a re-keyed row collides " +
      "with and completes the update (measured against sqlite3)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT PRIMARY KEY, b TEXT)")
    sql(s"INSERT INTO $t VALUES (1,'x'), (2,'y'), (3,'z')")
    sql(s"UPDATE OR REPLACE $t SET a = 2 WHERE a = 1")
    assert(rowsOf(s"SELECT a, b FROM $t ORDER BY a") ==
      Seq(Seq(2L, "x"), Seq(3L, "z")))
    // two rows re-keyed onto ONE key: row-at-a-time SQLite leaves the
    // LAST processed row (the earlier update is displaced by the later)
    sql(s"UPDATE OR REPLACE $t SET a = 9 WHERE a IN (2, 3)")
    assert(rowsOf(s"SELECT a, b FROM $t ORDER BY a") ==
      Seq(Seq(9L, "z")))
    // a plain UPDATE re-keying into a collision still aborts
    sql(s"INSERT INTO $t VALUES (10, 'w')")
    val e = intercept[Exception](sql(s"UPDATE $t SET a = 9 WHERE a = 10"))
    assert(e.getMessage.contains(s"UNIQUE constraint failed: $t.a"),
      e.getMessage)
  }

  test("UPDATE OR REPLACE substitutes the NOT NULL DEFAULT for an " +
      "assigned NULL; without a default it aborts (REPLACE algorithm's " +
      "NOT NULL step — measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(k INT PRIMARY KEY, a INT NOT NULL DEFAULT 7, " +
      s"c INT NOT NULL)")
    sql(s"INSERT INTO $t VALUES (1, 1, 100), (2, 2, 200)")
    sql(s"UPDATE OR REPLACE $t SET a = NULL WHERE k = 1")
    assert(rowsOf(s"SELECT k, a, c FROM $t ORDER BY k") ==
      Seq(Seq(1L, 7L, 100L), Seq(2L, 2L, 200L)))
    val e = intercept[Exception](
      sql(s"UPDATE OR REPLACE $t SET c = NULL WHERE k = 2"))
    assert(e.getMessage.contains(s"NOT NULL constraint failed: $t.c"),
      e.getMessage)
    assert(rowsOf(s"SELECT c FROM $t WHERE k = 2") == Seq(Seq(200L)))
  }

  test("UPDATE OR REPLACE displaces through an EXPRESSION unique " +
      "index; OR ABORT executes as a plain UPDATE; OR FAIL and the " +
      "FROM/LIMIT REPLACE forms decline named") {
    val t = fresh()
    sql(s"CREATE TABLE $t(id INT, c TEXT)")
    sql(s"CREATE UNIQUE INDEX ${t}_ux ON $t (lower(c))")
    sql(s"INSERT INTO $t VALUES (1,'AA'), (2,'bb')")
    sql(s"UPDATE OR REPLACE $t SET c = 'Bb' WHERE id = 1")
    assert(rowsOf(s"SELECT id, c FROM $t ORDER BY id") ==
      Seq(Seq(1L, "Bb")))
    sql(s"UPDATE OR ABORT $t SET c = 'qq' WHERE id = 1")
    assert(rowsOf(s"SELECT c FROM $t") == Seq(Seq("qq")))
    // OR FAIL with no would-violation executes as a plain UPDATE;
    // a would-be expression-key collision declines named
    sql(s"UPDATE OR FAIL $t SET c = 'zz' WHERE id = 1")
    assert(rowsOf(s"SELECT c FROM $t") == Seq(Seq("zz")))
    sql(s"INSERT INTO $t VALUES (2, 'ww')")
    val e1 = intercept[UnsupportedOperationException](
      sql(s"UPDATE OR FAIL $t SET c = 'x'")) // both rows land on 'x'
    assert(e1.getMessage.contains("UPDATE OR FAIL"), e1.getMessage)
    val e2 = intercept[UnsupportedOperationException](
      sql(s"UPDATE OR REPLACE $t SET c = 'x' LIMIT 1"))
    assert(e2.getMessage.contains("UPDATE OR REPLACE"), e2.getMessage)
    sql(s"DROP INDEX ${t}_ux")
  }

  test("targeted EXPRESSION ON CONFLICT: (lower(c)) matches the " +
      "declared expression index and drives DO UPDATE / DO NOTHING; " +
      "a non-matching target raises SQLite's error (all measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(id INT, email TEXT)")
    sql(s"CREATE UNIQUE INDEX ${t}_ux ON $t (lower(email))")
    sql(s"INSERT INTO $t VALUES (1, 'A@x.com')")
    sql(s"INSERT INTO $t VALUES (2, 'a@X.COM') " +
      s"ON CONFLICT (lower(email)) DO UPDATE SET id = excluded.id")
    assert(rowsOf(s"SELECT id, email FROM $t") == Seq(Seq(2L, "A@x.com")))
    // no conflict → plain append
    sql(s"INSERT INTO $t VALUES (3, 'b@y.com') " +
      s"ON CONFLICT (lower(email)) DO UPDATE SET id = 99")
    assert(rowsOf(s"SELECT id, email FROM $t ORDER BY id") ==
      Seq(Seq(2L, "A@x.com"), Seq(3L, "b@y.com")))
    // DO NOTHING skips the expression-key conflict
    sql(s"INSERT INTO $t VALUES (4, 'B@Y.COM') " +
      s"ON CONFLICT (lower(email)) DO NOTHING")
    assert(rowsOf(s"SELECT count(*) FROM $t") == Seq(Seq(2L)))
    // a target matching NO declared index raises SQLite's error
    val e = intercept[Exception](
      sql(s"INSERT INTO $t VALUES (5, 'c') " +
        s"ON CONFLICT (upper(email)) DO NOTHING"))
    assert(e.getMessage.contains(
      "ON CONFLICT clause does not match any PRIMARY KEY or UNIQUE " +
        "constraint"),
      e.getMessage)
    sql(s"DROP INDEX ${t}_ux")
  }

  test("targeted PARTIAL-index ON CONFLICT: (a) WHERE b > 0 matches " +
      "the declared partial index; out-of-scope rows never conflict " +
      "(all measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT, b INT)")
    sql(s"CREATE UNIQUE INDEX ${t}_ux ON $t (a) WHERE b > 0")
    sql(s"INSERT INTO $t VALUES (1, 5), (1, -1)")
    // in-scope conflict → DO UPDATE fires on the in-scope row only
    sql(s"INSERT INTO $t VALUES (1, 7) " +
      s"ON CONFLICT (a) WHERE b > 0 DO UPDATE SET b = excluded.b")
    assert(rowsOf(s"SELECT a, b FROM $t ORDER BY b") ==
      Seq(Seq(1L, -1L), Seq(1L, 7L)))
    // an OUT-of-scope incoming row conflicts with nothing → appends
    sql(s"INSERT INTO $t VALUES (1, 0) " +
      s"ON CONFLICT (a) WHERE b > 0 DO UPDATE SET b = 999")
    assert(rowsOf(s"SELECT a, b FROM $t ORDER BY b") ==
      Seq(Seq(1L, -1L), Seq(1L, 0L), Seq(1L, 7L)))
    // a bare (a) target without the WHERE matches no index → error
    val e = intercept[Exception](
      sql(s"INSERT INTO $t VALUES (1, 9) ON CONFLICT (a) WHERE b < 0 " +
        s"DO NOTHING"))
    assert(e.getMessage.contains("does not match any PRIMARY KEY"),
      e.getMessage)
    sql(s"DROP INDEX ${t}_ux")
  }

  test("a UNIQUE column with a declared collation enforces UNDER that " +
      "collation: NOCASE keys collide case-insensitively, RTRIM keys " +
      "ignore trailing spaces (measured against sqlite3)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(x TEXT COLLATE NOCASE UNIQUE, v INT)")
    sql(s"INSERT INTO $t VALUES ('Apple', 1)")
    val e = intercept[Exception](sql(s"INSERT INTO $t VALUES ('APPLE', 2)"))
    assert(e.getMessage.contains(s"UNIQUE constraint failed: $t.x"),
      e.getMessage)
    // OR REPLACE displaces the case-variant; OR IGNORE skips it
    sql(s"INSERT OR REPLACE INTO $t VALUES ('aPPle', 3)")
    assert(rowsOf(s"SELECT x, v FROM $t") == Seq(Seq("aPPle", 3L)))
    sql(s"INSERT OR IGNORE INTO $t VALUES ('ApPlE', 4), ('pear', 5)")
    assert(rowsOf(s"SELECT x, v FROM $t ORDER BY v") ==
      Seq(Seq("aPPle", 3L), Seq("pear", 5L)))
    // DO UPDATE matches the conflict key case-insensitively too
    sql(s"INSERT INTO $t VALUES ('PEAR', 6) " +
      s"ON CONFLICT (x) DO UPDATE SET v = excluded.v")
    assert(rowsOf(s"SELECT x, v FROM $t ORDER BY v") ==
      Seq(Seq("aPPle", 3L), Seq("pear", 6L)))
    // RTRIM: trailing spaces don't make a new key
    val r = fresh()
    sql(s"CREATE TABLE $r(y TEXT COLLATE RTRIM UNIQUE)")
    sql(s"INSERT INTO $r VALUES ('a ')")
    val e2 = intercept[Exception](sql(s"INSERT INTO $r VALUES ('a   ')"))
    assert(e2.getMessage.contains(s"UNIQUE constraint failed: $r.y"),
      e2.getMessage)
  }

  test("a COLLATE NOCASE rider on a CREATE UNIQUE INDEX column " +
      "enforces case-insensitively; a PK takes its column's declared " +
      "collation; unknown collations fail at DDL with SQLite's error") {
    val t = fresh()
    sql(s"CREATE TABLE $t(c TEXT)")
    sql(s"CREATE UNIQUE INDEX ${t}_ux ON $t (c COLLATE NOCASE)")
    sql(s"INSERT INTO $t VALUES ('Hi')")
    val e = intercept[Exception](sql(s"INSERT INTO $t VALUES ('HI')"))
    assert(e.getMessage.contains(s"UNIQUE constraint failed: $t.c"),
      e.getMessage)
    sql(s"DROP INDEX ${t}_ux")
    val p = fresh()
    sql(s"CREATE TABLE $p(k TEXT COLLATE NOCASE PRIMARY KEY)")
    sql(s"INSERT INTO $p VALUES ('One')")
    val e2 = intercept[Exception](sql(s"INSERT INTO $p VALUES ('ONE')"))
    assert(e2.getMessage.contains(s"UNIQUE constraint failed: $p.k"),
      e2.getMessage)
    val e3 = intercept[Exception](
      sql(s"CREATE TABLE ${fresh()}(z TEXT COLLATE MYCOLL)"))
    assert(e3.getMessage.contains("no such collation sequence: MYCOLL"),
      e3.getMessage)
  }

  test("DO UPDATE re-keying into another unique key's collision aborts") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT PRIMARY KEY, b TEXT UNIQUE)")
    sql(s"INSERT INTO $t VALUES (1, 'x'), (2, 'y')")
    val e = intercept[Exception](
      sql(s"INSERT INTO $t VALUES (2, 'z') " +
        s"ON CONFLICT(a) DO UPDATE SET b = 'x'"))
    assert(e.getMessage.contains(s"UNIQUE constraint failed: $t.b"),
      e.getMessage)
    assert(rowsOf(s"SELECT a, b FROM $t ORDER BY a") ==
      Seq(Seq(1L, "x"), Seq(2L, "y")))
  }

  test("UPDATE OR IGNORE on a keyed table skips the row whose new key " +
      "collides with an untouched row and applies the rest; changes() " +
      "and RETURNING cover only the applied rows (all measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT PRIMARY KEY, b TEXT)")
    sql(s"INSERT INTO $t VALUES (1,'x'), (2,'y'), (3,'z'), (4,'w')")
    sql(s"UPDATE OR IGNORE $t SET a = 2 WHERE a = 1") // occupied -> skip
    assert(rowsOf(s"SELECT changes()") == Seq(Seq(0L)))
    val ret = rowsOf(s"UPDATE OR IGNORE $t SET a = 9 WHERE a = 3 " +
      s"RETURNING a, b") // free -> applied
    assert(ret == Seq(Seq(9L, "z")))
    assert(rowsOf(s"SELECT changes()") == Seq(Seq(1L)))
    assert(rowsOf(s"SELECT a, b FROM $t ORDER BY a") ==
      Seq(Seq(1L, "x"), Seq(2L, "y"), Seq(4L, "w"), Seq(9L, "z")))
  }

  test("UPDATE OR IGNORE: NULL key members never conflict; partial " +
      "unique indexes skip only in-predicate collisions; expression " +
      "keys skip on the expression value (all measured)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT, b INT, c TEXT, UNIQUE(a, b))")
    sql(s"INSERT INTO $t VALUES (1,1,'p'), (1,2,'q'), (2,NULL,'r')")
    sql(s"UPDATE OR IGNORE $t SET a = 1, b = 2 WHERE c = 'r'") // skip
    sql(s"UPDATE OR IGNORE $t SET b = NULL WHERE c = 'p'") // NULL: applied
    assert(rowsOf(s"SELECT changes()") == Seq(Seq(1L)))
    assert(rowsOf(s"SELECT a, b, c FROM $t ORDER BY c") ==
      Seq(Seq(1L, null, "p"), Seq(1L, 2L, "q"), Seq(2L, null, "r")))
    val p = fresh()
    sql(s"CREATE TABLE $p(a INT, b INT)")
    sql(s"CREATE UNIQUE INDEX ${p}_ux ON $p (a) WHERE b > 0")
    sql(s"INSERT INTO $p VALUES (1,1), (2,1), (1,0)")
    // new image (2,0) lands OUTSIDE the predicate -> applied
    sql(s"UPDATE OR IGNORE $p SET a = 2 WHERE a = 1 AND b = 0")
    assert(rowsOf(s"SELECT changes()") == Seq(Seq(1L)))
    // new image (2,1) in predicate, collides with untouched -> skip
    sql(s"UPDATE OR IGNORE $p SET a = 2 WHERE a = 1 AND b = 1")
    assert(rowsOf(s"SELECT changes()") == Seq(Seq(0L)))
    assert(rowsOf(s"SELECT a, b FROM $p ORDER BY a, b") ==
      Seq(Seq(1L, 1L), Seq(2L, 0L), Seq(2L, 1L)))
    val x = fresh()
    sql(s"CREATE TABLE $x(a TEXT)")
    sql(s"CREATE UNIQUE INDEX ${x}_ux ON $x (lower(a))")
    sql(s"INSERT INTO $x VALUES ('Foo'), ('bar')")
    sql(s"UPDATE OR IGNORE $x SET a = 'FOO' WHERE a = 'bar'") // skip
    assert(rowsOf(s"SELECT changes()") == Seq(Seq(0L)))
    assert(rowsOf(s"SELECT a FROM $x ORDER BY a") ==
      Seq(Seq("Foo"), Seq("bar")))
  }

  test("UPDATE OR IGNORE declines the intra-statement collision " +
      "chains whose outcome depends on rowid order (measured: the " +
      "1->2,2->3 swap yields different changes() under different " +
      "rowid orders in sqlite3)") {
    val t = fresh()
    sql(s"CREATE TABLE $t(a INT PRIMARY KEY, b TEXT)")
    sql(s"INSERT INTO $t VALUES (1,'x'), (2,'y')")
    // a row landing on another updated row's pre-update key
    val e1 = intercept[UnsupportedOperationException](
      sql(s"UPDATE OR IGNORE $t SET a = " +
        s"CASE a WHEN 1 THEN 2 WHEN 2 THEN 3 END WHERE a IN (1, 2)"))
    assert(e1.getMessage.contains("pre-update"), e1.getMessage)
    // two rows landing on the same new key
    val e2 = intercept[UnsupportedOperationException](
      sql(s"UPDATE OR IGNORE $t SET a = 7 WHERE a IN (1, 2)"))
    assert(e2.getMessage.contains("same"), e2.getMessage)
    // the table is untouched either way
    assert(rowsOf(s"SELECT a, b FROM $t ORDER BY a") ==
      Seq(Seq(1L, "x"), Seq(2L, "y")))
  }
}
