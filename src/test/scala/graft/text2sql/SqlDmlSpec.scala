package graft.text2sql

import graft.SparkSpec
import graft.exec.Runner

/** DML routing (SqlDml + exec.Upsert + Runner): the reference executes
  * arbitrary generated statements against SQLite (pandasqlite.py:
  * 245-247), so the engine must either re-express a DML statement
  * (INSERT OR REPLACE → copy-on-write upsert) or fail with a targeted
  * read-only message — never a generic analysis error.
  */
class SqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private def freshView(name: String): Unit =
    Seq((1L, "one", 10L), (2L, "two", 20L), (3L, "three", 30L))
      .toDF("id", "name", "v").createOrReplaceTempView(name)

  test("detect classifies the four verbs; SELECT and scalar replace() are not DML") {
    import SqlDml._
    assert(detect("UPDATE t SET x = 1")
      == Some(Update("t", Seq("x" -> "1"), None, None, "", None)))
    assert(detect("  delete from 'abc' where x < 0")
      == Some(Delete("abc", Some("x < 0"), None, "")))
    // plain INSERT INTO parses as an APPEND (replace = false)
    detect("INSERT INTO t VALUES (1)") match {
      case Some(Upsert("t", Seq(), src, false, None, None, _, _, _)) =>
        assert(src.contains("VALUES (1)"))
      case other => fail(s"expected append Upsert, got $other")
    }
    // INSERT without INTO is not SQLite grammar → targeted error
    assert(detect("INSERT t VALUES (1)") == Some(Unsupported("INSERT")))
    // OR IGNORE = the implied DO NOTHING on the default key
    assert(detect("INSERT OR IGNORE INTO t VALUES (1)")
      == Some(Upsert("t", Nil, "SELECT * FROM (VALUES (1))", false,
        Some(OnConflict(Nil, Nil, None, Nil, None)), None, orIgnore = true)))
    // OR ABORT/FAIL/ROLLBACK differ only on constraint violation —
    // none exist on ingested tables, so they run as plain appends
    detect("INSERT OR ABORT INTO t VALUES (1)") match {
      case Some(Upsert("t", _, _, false, None, None, _, _, _)) =>
      case other => fail(s"expected append Upsert, got $other")
    }
    detect("INSERT OR REPLACE INTO t (a, b) VALUES (1, 2)") match {
      case Some(Upsert("t", Seq("a", "b"), src, true, None, None, _, _, _)) =>
        assert(src.contains("VALUES (1, 2)"))
      case other => fail(s"expected Upsert, got $other")
    }
    detect("REPLACE INTO `my t` SELECT * FROM s") match {
      case Some(Upsert("my t", Seq(), src, true, None, None, _, _, _)) => assert(src == "SELECT * FROM s")
      case other => fail(s"expected Upsert, got $other")
    }
    // quoted-hash table names, as the reference's generated SQL writes them
    detect("INSERT OR REPLACE INTO 'abc123' SELECT * FROM s") match {
      case Some(Upsert("abc123", _, _, true, None, None, _, _, _)) =>
      case other => fail(s"expected Upsert into abc123, got $other")
    }
    assert(detect("SELECT * FROM t").isEmpty)
    assert(detect("SELECT replace(s, 'a', 'b') FROM t").isEmpty)
    // trailing semicolons (the habitual model emission) never ride
    // into a re-wrapped source
    detect("INSERT OR REPLACE INTO t (a) VALUES (1);") match {
      case Some(Upsert(_, _, src, _, _, _, _, _, _)) => assert(!src.contains(";"), src)
      case other => fail(s"expected Upsert, got $other")
    }
    assert(detect("DROP TABLE t ; ") == Some(DropRelation("t", false)))
    // WITH-prefixed DML classifies; the CTE rides into the source
    detect("WITH c AS (SELECT 1 AS x) INSERT OR REPLACE INTO t SELECT * FROM c") match {
      case Some(Upsert("t", _, src, true, None, None, _, _, _)) =>
        assert(src.startsWith("WITH c AS"), src)
      case other => fail(s"expected Upsert, got $other")
    }
    assert(detect("WITH c AS (SELECT 1 AS x) DELETE FROM t WHERE id IN (SELECT x FROM c)")
      == Some(Delete("t", Some("id IN (SELECT x FROM c)"), None,
        "WITH c AS (SELECT 1 AS x)")))
  }

  test("detect parses UPDATE/DELETE clause structure; unsound forms decline named") {
    import SqlDml._
    // multi-assignment, rightmost-wins duplicates are the parser's to
    // KEEP (executor applies the SQLite rule), WHERE + RETURNING split
    assert(detect("UPDATE t SET a = 1, b = a + 2 WHERE a < 3 RETURNING a, b")
      == Some(Update("t", Seq("a" -> "1", "b" -> "a + 2"),
        Some("a < 3"), Some("a, b"), "", None)))
    // keywords inside literals/subqueries never stop the clause scan
    assert(detect("UPDATE t SET s = 'where x' WHERE id IN (SELECT id FROM u WHERE z = 1)")
      == Some(Update("t", Seq("s" -> "'where x'"),
        Some("id IN (SELECT id FROM u WHERE z = 1)"), None, "", None)))
    assert(detect("DELETE FROM t RETURNING *")
      == Some(Delete("t", None, Some("*"), "")))
    // INDEXED BY / NOT INDEXED are pure access-path hints — skipped
    assert(detect("DELETE FROM t INDEXED BY idx WHERE x = 1")
      == Some(Delete("t", Some("x = 1"), None, "")))
    assert(detect("UPDATE t NOT INDEXED SET a = 1")
      == Some(Update("t", Seq("a" -> "1"), None, None, "", None)))
    // a conflict action parses and rides along (the executor applies
    // plain-UPDATE semantics on constraint-less tables); an unknown
    // action still declines named
    assert(detect("UPDATE OR IGNORE t SET a = 1")
      == Some(Update("t", Seq("a" -> "1"), None, None, "", None,
        Some("IGNORE"))))
    assert(detect("UPDATE OR BOGUS t SET a = 1")
      == Some(Unsupported("UPDATE OR BOGUS")))
    // the join form now PARSES (SQLite 3.33 UPDATE-FROM)
    assert(detect("UPDATE t SET a = u.b FROM u WHERE t.id = u.id")
      == Some(Update("t", Seq("a" -> "u.b"),
        Some("t.id = u.id"), None, "", Some("u"))))
    // the DML LIMIT form now parses (SQLITE_ENABLE_UPDATE_DELETE_LIMIT)
    assert(detect("DELETE FROM t WHERE x = 1 ORDER BY x LIMIT 5")
      == Some(Delete("t", Some("x = 1"), None, "",
        Some("x"), Some("5"), None)))
    assert(detect("DELETE FROM t LIMIT 3 OFFSET 2")
      == Some(Delete("t", None, None, "", None, Some("3"), Some("2"))))
    // SQLite `LIMIT m, n` = OFFSET m LIMIT n
    assert(detect("UPDATE t SET a = 1 ORDER BY b DESC, c LIMIT 2, 4")
      == Some(Update("t", Seq("a" -> "1"), None, None, "", None, None,
        Some("b DESC, c"), Some("4"), Some("2"))))
    // ORDER BY without LIMIT is not SQLite DML grammar
    assert(detect("DELETE FROM t ORDER BY x")
      == Some(Unsupported("DELETE with ORDER BY but no LIMIT")))
    // the row-value SET form (SQLite 3.15) splits into per-column
    // assignments — exact, since every RHS sees the OLD row
    assert(detect("UPDATE t SET (a, b) = (1, 2)")
      == Some(Update("t", Seq("a" -> "1", "b" -> "2"), None, None, "",
        None)))
    assert(detect("UPDATE t SET (a, b) = (b + 1, a), v = 'x' WHERE a < 3")
      == Some(Update("t",
        Seq("a" -> "b + 1", "b" -> "a", "v" -> "'x'"),
        Some("a < 3"), None, "", None)))
    assert(detect("UPDATE t SET (a, b) = (1, 2, 3)")
      == Some(Unsupported("2 columns assigned 3 values")))
    // a FROM-less row-value subquery IS the plain row-value form
    assert(detect("UPDATE t SET (a, b) = (SELECT 1, 2)")
      == Some(Update("t", Seq("a" -> "1", "b" -> "2"), None, None, "",
        None)))
    // a FROM-carrying one splits into per-column correlated subqueries
    assert(detect("UPDATE t SET (a, b) = (SELECT x, y FROM s WHERE s.k = t.k)")
      == Some(Update("t",
        Seq("a" -> "(SELECT x FROM s WHERE s.k = t.k)",
            "b" -> "(SELECT y FROM s WHERE s.k = t.k)"),
        None, None, "", None)))
    // mangled statements fall back to the bare-verb decline
    assert(detect("UPDATE t SET = 5") == Some(Unsupported("UPDATE")))
    assert(detect("DELETE t WHERE x = 1") == Some(Unsupported("DELETE")))
  }

  test("detect parses the ON CONFLICT upsert clause; unsound forms decline named") {
    import SqlDml._
    detect("INSERT INTO t VALUES (1) ON CONFLICT DO NOTHING") match {
      case Some(Upsert("t", _, src, false, Some(OnConflict(Nil, Nil, None, Nil, None)), None, _, _, _)) =>
        assert(!src.toLowerCase.contains("conflict"), src)
      case other => fail(s"expected DO NOTHING Upsert, got $other")
    }
    detect("""INSERT INTO t (a, b) SELECT x, y FROM s
              ON CONFLICT (a) DO UPDATE SET b = excluded.b WHERE b < excluded.b""") match {
      case Some(Upsert("t", Seq("a", "b"), _, false,
          Some(OnConflict(Seq("a"), Seq(("b", "excluded.b")), Some(w), Nil, None)), None,
          _, _, _)) =>
        assert(w == "b < excluded.b")
      case other => fail(s"expected DO UPDATE Upsert, got $other")
    }
    // a join's ON inside the source never splits the statement; the
    // clause scan only fires on the ON CONFLICT keyword pair
    detect("""INSERT INTO t SELECT s.x FROM s JOIN u ON s.id = u.id
              ON CONFLICT DO NOTHING""") match {
      case Some(Upsert("t", _, src, false, Some(OnConflict(Nil, Nil, None, Nil, None)), None, _, _, _)) =>
        assert(src.contains("ON s.id = u.id"), src)
      case other => fail(s"expected Upsert with join source, got $other")
    }
    // expression and partial-index targets parse structurally; the
    // executor matches them against a declared unique index (or raises
    // SQLite's no-match error — UniqueSpec pins both)
    detect("INSERT INTO t VALUES (1) ON CONFLICT (lower(a)) DO NOTHING") match {
      case Some(Upsert("t", _, _, false,
          Some(OnConflict(Nil, Nil, None, Seq("lower(a)"), None)), None,
          _, _, _)) =>
      case other => fail(s"expected expression-target Upsert, got $other")
    }
    detect("INSERT INTO t VALUES (1) ON CONFLICT (a) WHERE a > 0 DO NOTHING") match {
      case Some(Upsert("t", _, _, false,
          Some(OnConflict(Seq("a"), Nil, None, Nil, Some(w))), None,
          _, _, _)) => assert(w == "a > 0")
      case other => fail(s"expected partial-target Upsert, got $other")
    }
    // SQLite 3.35 clause chains parse into head + rest
    detect(
      "INSERT INTO t VALUES (1) ON CONFLICT (a) DO NOTHING ON CONFLICT (b) DO NOTHING") match {
      case Some(u: Upsert) =>
        assert(u.conflict == Some(OnConflict(Seq("a"), Nil, None, Nil, None)))
        assert(u.conflictRest ==
          Seq(OnConflict(Seq("b"), Nil, None, Nil, None)))
      case other => fail(s"expected chained Upsert, got $other")
    }
    detect(
      "INSERT INTO t VALUES (1) ON CONFLICT (a) DO UPDATE SET v = 1 ON CONFLICT DO NOTHING") match {
      case Some(u: Upsert) =>
        assert(u.conflict ==
          Some(OnConflict(Seq("a"), Seq(("v", "1")), None, Nil, None)))
        assert(u.conflictRest == Seq(OnConflict(Nil, Nil, None, Nil, None)))
      case other => fail(s"expected chained Upsert, got $other")
    }
    // a targetless clause anywhere but LAST is SQLite's syntax error
    val chainEx = intercept[IllegalArgumentException](detect(
      "INSERT INTO t VALUES (1) ON CONFLICT DO NOTHING ON CONFLICT (a) DO NOTHING"))
    assert(chainEx.getMessage == "near \"ON\": syntax error")
    detect("INSERT INTO t VALUES (1) ON CONFLICT (a) DO UPDATE SET b = 1 RETURNING *") match {
      case Some(Upsert("t", _, _, false,
          Some(OnConflict(Seq("a"), Seq(("b", "1")), None, Nil, None)), Some("*"), _,
          _, _)) =>
      case other => fail(s"expected RETURNING Upsert, got $other")
    }
  }

  test("rewriteExcluded maps excluded.col to the flat join name, quote-aware") {
    import SqlDml.rewriteExcluded
    assert(rewriteExcluded("v + excluded.v") == "v + __excl_v")
    assert(rewriteExcluded("excluded.`a b` || excluded.\"c\"")
      == "`__excl_a b` || `__excl_c`")
    // inside a string literal: untouched
    assert(rewriteExcluded("'excluded.v' || excluded.v")
      == "'excluded.v' || __excl_v")
    // a bare identifier merely NAMED excluded (no dot) is untouched
    assert(rewriteExcluded("excluded + 1") == "excluded + 1")
  }

  test("ON CONFLICT DO NOTHING / OR IGNORE skip conflicting rows and append the rest") {
    freshView("dml_n")
    Runner.runSql(spark,
      "INSERT INTO dml_n VALUES (2, 'CONFLICT', 99), (5, 'five', 50) ON CONFLICT DO NOTHING")
    val rows = spark.table("dml_n").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "one", 10L), (2L, "two", 20L),
      (3L, "three", 30L), (5L, "five", 50L)))
    // OR IGNORE: the same semantics from the verb prefix, sequencing
    // against the re-bound state (5 now conflicts)
    Runner.runSql(spark,
      "INSERT OR IGNORE INTO dml_n VALUES (5, 'FIVE2', 55), (6, 'six', 60)")
    assert(spark.table("dml_n").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "one"), (2L, "two"), (3L, "three"), (5L, "five"), (6L, "six")))
  }

  test("ON CONFLICT DO UPDATE applies assignments with excluded scoping; WHERE gates") {
    freshView("dml_c")
    // id 2 conflicts and updates (old row visible bare, incoming as
    // excluded); id 3 conflicts but the WHERE gate fails (60 > 30 is
    // required, incoming v=1) so the old row survives; id 7 appends
    Runner.runSql(spark,
      """INSERT INTO dml_c (id, name, v)
         VALUES (2, 'TWO', 200), (3, 'THREE', 1), (7, 'seven', 70)
         ON CONFLICT (id) DO UPDATE
           SET name = excluded.name || '/' || name, v = v + excluded.v
         WHERE excluded.v > v""")
    val rows = spark.table("dml_c").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "one", 10L), (2L, "TWO/two", 220L),
      (3L, "three", 30L), (7L, "seven", 70L)))
  }

  test("ON CONFLICT errors are targeted: unknown key column, unknown SET column") {
    freshView("dml_ck")
    val e1 = intercept[IllegalArgumentException] {
      Runner.runSql(spark,
        "INSERT INTO dml_ck VALUES (1, 'x', 1) ON CONFLICT (bogus) DO NOTHING")
    }
    assert(e1.getMessage.contains("no such column bogus"))
    val e2 = intercept[IllegalArgumentException] {
      Runner.runSql(spark,
        "INSERT INTO dml_ck VALUES (1, 'x', 1) ON CONFLICT (id) DO UPDATE SET bogus = 1")
    }
    assert(e2.getMessage.contains("no such column bogus"))
  }

  test("UPDATE rewrites matching rows in place; NULL-predicate rows stay untouched") {
    freshView("dml_u")
    val out = Runner.runSql(spark,
      "UPDATE dml_u SET name = upper(name), v = v + 1 WHERE id >= 2")
    val rows = spark.table("dml_u").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "one", 10L), (2L, "TWO", 21L), (3L, "THREE", 31L)))
    assert(out.count() == 3) // no RETURNING → the new table state
    // assignments see the OLD row: swap is not sequential
    Seq((1L, 100L, 200L)).toDF("id", "a", "b").createOrReplaceTempView("dml_u2")
    Runner.runSql(spark, "UPDATE dml_u2 SET a = b, b = a")
    val r2 = spark.table("dml_u2").collect()(0)
    assert((r2.getLong(1), r2.getLong(2)) == (200L, 100L))
    // NULL predicate rows are kept unmodified (SQLite updates only
    // WHERE-true rows; a bare CASE WHEN NULL would also fall through,
    // but the coalesce makes it explicit)
    Seq((1L, Some(5L), "x"), (2L, None, "y"))
      .toDF("id", "k", "s").createOrReplaceTempView("dml_u3")
    Runner.runSql(spark, "UPDATE dml_u3 SET s = 'hit' WHERE k > 0")
    assert(spark.table("dml_u3").orderBy("id")
      .collect().map(_.getString(2)).toSeq == Seq("hit", "y"))
  }

  test("DELETE removes WHERE-true rows only; no WHERE truncates, schema survives") {
    freshView("dml_d")
    Runner.runSql(spark, "DELETE FROM dml_d WHERE id % 2 = 1")
    assert(spark.table("dml_d").collect().map(_.getLong(0)).toSeq == Seq(2L))
    // NULL-predicate rows are KEPT (SQLite deletes only WHERE-true)
    Seq((1L, Some(5L)), (2L, None), (3L, Some(-1L)))
      .toDF("id", "k").createOrReplaceTempView("dml_d2")
    Runner.runSql(spark, "DELETE FROM dml_d2 WHERE k > 0")
    assert(spark.table("dml_d2").orderBy("id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    // truncate: all rows go, the schema (and view) survive
    Runner.runSql(spark, "DELETE FROM dml_d2")
    assert(spark.table("dml_d2").count() == 0)
    assert(spark.table("dml_d2").columns.toSeq == Seq("id", "k"))
  }

  test("RETURNING hands back affected rows: old values for DELETE, new for UPDATE") {
    freshView("dml_ret")
    val del = Runner.runSql(spark,
      "DELETE FROM dml_ret WHERE v >= 20 RETURNING id, name").orderBy("id")
    assert(del.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((2L, "two"), (3L, "three")))
    assert(spark.table("dml_ret").count() == 1)
    val upd = Runner.runSql(spark,
      "UPDATE dml_ret SET v = v * 10 WHERE id = 1 RETURNING name, v")
    assert(upd.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("one", 100L)))
    // the RETURNING result was materialized before the re-bind: it
    // re-reads stably even after FURTHER statements mutate the table
    Runner.runSql(spark, "DELETE FROM dml_ret")
    assert(upd.collect().map(_.getLong(1)).toSeq == Seq(100L))
  }

  test("WITH-prefixed UPDATE/DELETE keep CTE bindings in scope; updates compose") {
    freshView("dml_w")
    Runner.runSql(spark,
      "WITH hot AS (SELECT 2 AS hid) DELETE FROM dml_w WHERE id IN (SELECT hid FROM hot)")
    assert(spark.table("dml_w").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L))
    // generation dirs: statement 2 reads what statement 1 wrote
    Runner.runSql(spark, "UPDATE dml_w SET v = v + 1 WHERE id = 1")
    Runner.runSql(spark, "UPDATE dml_w SET v = v + 1 WHERE id = 1")
    assert(spark.table("dml_w").filter("id = 1")
      .collect().map(_.getLong(2)).toSeq == Seq(12L))
  }

  test("UPDATE/DELETE errors are targeted: unknown table, unknown column") {
    freshView("dml_me")
    val e1 = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "UPDATE no_such_mt SET a = 1")
    }
    assert(e1.getMessage.contains("not a registered"))
    val e2 = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "UPDATE dml_me SET bogus = 1")
    }
    assert(e2.getMessage.contains("no such column"))
    val e3 = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "DELETE FROM no_such_mt WHERE 1 = 1")
    }
    assert(e3.getMessage.contains("not a registered"))
  }

  test("plain INSERT INTO appends; duplicate keys survive (no PK rule)") {
    freshView("dml_a")
    val out = Runner.runSql(spark,
      "INSERT INTO dml_a (id, name, v) VALUES (2, 'TWO', 22), (9, 'nine', 90)")
    assert(out.count() == 3 + 2)
    // key 2 now has BOTH rows — plain INSERT never replaces
    assert(out.filter("id = 2").count() == 2)
    // the view re-bound to the appended state
    assert(spark.table("dml_a").count() == 3 + 2)
  }

  test("INSERT OR REPLACE with VALUES replaces on the leading-column key and appends") {
    freshView("dml_v")
    Runner.runSql(spark,
      "INSERT OR REPLACE INTO dml_v (id, name, v) VALUES (2, 'TWO', 22), (4, 'four', 40)")
    val rows = spark.table("dml_v").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "one", 10L), (2L, "TWO", 22L),
      (3L, "three", 30L), (4L, "four", 40L)))
  }

  test("INSERT OR REPLACE with a SELECT source and partial column list NULLs the rest") {
    freshView("dml_s")
    // SQLite OR REPLACE deletes + re-inserts: unlisted columns become
    // NULL, the replaced row's old values do not survive
    Runner.runSql(spark,
      "INSERT OR REPLACE INTO dml_s (id, name) SELECT id, upper(name) FROM dml_s WHERE id >= 2")
    val rows = spark.table("dml_s").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(rows == Seq((1L, "one", 10L), (2L, "TWO", -1L), (3L, "THREE", -1L)))
  }

  test("repeated upserts into the same table compose (each reads the prior generation)") {
    // regression: a fixed materialization dir made statement 2 write
    // the very path its own merge plan was reading
    freshView("dml_r")
    Runner.runSql(spark,
      "INSERT OR REPLACE INTO dml_r (id, name, v) VALUES (2, 'TWO', 22)")
    Runner.runSql(spark,
      "INSERT OR REPLACE INTO dml_r (id, name, v) VALUES (2, 'TWO2', 222), (4, 'four', 40)")
    val rows = spark.table("dml_r").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "one", 10L), (2L, "TWO2", 222L),
      (3L, "three", 30L), (4L, "four", 40L)))
  }

  test("truncated DML raises the targeted error, never an index error") {
    for (stmt <- Seq(
      "INSERT OR REPLACE INTO dml_t",
      "REPLACE INTO dml_t",
      "INSERT OR REPLACE INTO dml_t (id, name)",
      // truncated/malformed ALTER forms: targeted, never an index error
      "ALTER",
      "ALTER TABLE",
      "ALTER TABLE dml_t",
      "ALTER TABLE dml_t ADD",
      "ALTER TABLE dml_t ADD COLUMN",
      "ALTER TABLE dml_t RENAME",
      "ALTER TABLE dml_t RENAME COLUMN x",
      "ALTER TABLE dml_t DROP COLUMN",
      "ALTER VIEW v RENAME TO w")) {
      val e = intercept[UnsupportedOperationException] {
        Runner.runSql(spark, stmt)
      }
      assert(e.getMessage.contains("read-only analytics engine"), stmt)
    }
  }

  test("digit-leading hash table names upsert (the reference's quoted-hash convention)") {
    // ingested tables are md5-hex-named and may start with a digit;
    // the generated SQL quotes them ('9abc…') and spark.table() would
    // fail to PARSE the bare name without backtick quoting
    freshView("9abc12f")
    Runner.runSql(spark,
      "INSERT OR REPLACE INTO '9abc12f' (id, name, v) VALUES (1, 'ONE', 11)")
    val rows = spark.table("`9abc12f`").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "ONE", 11L), (2L, "two", 20L), (3L, "three", 30L)))
  }

  test("a view re-resolves its base after DML rebinds it (SQLite view semantics)") {
    freshView("vw_src")
    Runner.runSql(spark, "DROP VIEW IF EXISTS vw_live")
    Runner.runSql(spark,
      "CREATE VIEW vw_live AS SELECT id, v FROM vw_src WHERE v >= 20")
    def liveCount = Runner.runSql(spark,
      "SELECT count(*) AS c FROM vw_live").head().getLong(0)
    assert(liveCount == 2L)
    // SQLite views re-resolve at query time — DML on the base must be
    // visible through the view, not a stale creation-time snapshot
    Runner.runSql(spark, "INSERT INTO vw_src VALUES (9, 'nine', 90)")
    assert(liveCount == 3L)
    Runner.runSql(spark, "UPDATE vw_src SET v = 5 WHERE id = 2")
    assert(liveCount == 2L)
    Runner.runSql(spark, "DELETE FROM vw_src WHERE id = 9")
    assert(liveCount == 1L)
    Runner.runSql(spark, "DROP VIEW vw_live")
  }

  test("CREATE VIEW / CREATE TABLE AS / DROP route as session DDL") {
    freshView("ddl_src")
    // view: live plan over the session relation
    Runner.runSql(spark,
      "CREATE VIEW ddl_v AS SELECT id, upper(name) AS uname FROM ddl_src WHERE id >= 2")
    assert(spark.table("ddl_v").orderBy("id")
      .collect().map(_.getString(1)).toSeq == Seq("TWO", "THREE"))
    // a column list renames the outputs positionally (SQLite's rule),
    // and the sqlite_master text carries it as written
    Runner.runSql(spark,
      "CREATE VIEW ddl_vc (vid, vname) AS SELECT id, name FROM ddl_src")
    assert(spark.table("ddl_vc").columns.toSeq == Seq("vid", "vname"))
    assert(Runner.runSql(spark,
        "SELECT sql FROM sqlite_master WHERE name = 'ddl_vc'")
      .head().getString(0).contains("(vid, vname)"))
    Runner.runSql(spark, "DROP VIEW ddl_vc")
    // CTAS materializes: mutating nothing, rows persist as stored files
    Runner.runSql(spark,
      "CREATE TABLE ddl_t AS SELECT id, v * 2 AS v2 FROM ddl_src")
    assert(spark.table("ddl_t").orderBy("id")
      .collect().map(_.getLong(1)).toSeq == Seq(20L, 40L, 60L))
    // SQLite conflict semantics: bare CREATE on an existing name fails
    // with the targeted message; IF NOT EXISTS is a no-op
    val e = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "CREATE VIEW ddl_v AS SELECT 1")
    }
    assert(e.getMessage.contains("already exists"))
    Runner.runSql(spark, "CREATE VIEW IF NOT EXISTS ddl_v AS SELECT 1")
    assert(spark.table("ddl_v").count() == 2) // unchanged
    // DROP unregisters; bare DROP on a missing name is targeted
    Runner.runSql(spark, "DROP VIEW ddl_v")
    Runner.runSql(spark, "DROP TABLE IF EXISTS ddl_v") // no-op
    val d = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "DROP TABLE ddl_v")
    }
    assert(d.getMessage.contains("no such session table"))
    // generated columns execute since round 9 (GeneratedColsSpec pins
    // the full surface); the DDL routes and computes here end-to-end
    Runner.runSql(spark,
      "CREATE TABLE gen_t (a INTEGER, b INTEGER GENERATED ALWAYS AS (a * 2))")
    Runner.runSql(spark, "INSERT INTO gen_t (a) VALUES (21)")
    assert(spark.table("gen_t").collect().map(_.toSeq.toSeq).toSeq ==
      Seq(Seq(21L, 42L)))
    Runner.runSql(spark, "DROP TABLE gen_t")
  }

  test("CREATE TABLE with column defs builds an empty typed relation; PK drives upserts") {
    Runner.runSql(spark, "DROP TABLE IF EXISTS ct_t")
    // the PRIMARY KEY is NOT the leading column — a later OR REPLACE
    // must resolve on it (SQLite's rule), not the leading-column
    // convention for constraint-less ingested tables
    Runner.runSql(spark,
      """CREATE TABLE ct_t (
           label TEXT NOT NULL,
           k INTEGER PRIMARY KEY,
           score REAL DEFAULT 0.5,
           tags BLOB,
           seen BOOLEAN,
           day DATE)""")
    val sch = spark.table("ct_t").schema
    import org.apache.spark.sql.types._
    assert(sch.fields.map(f => (f.name, f.dataType)).toSeq == Seq(
      ("label", StringType), ("k", LongType), ("score", DoubleType),
      ("tags", BinaryType), ("seen", LongType), ("day", StringType)))
    assert(spark.table("ct_t").count() == 0)
    Runner.runSql(spark,
      "INSERT INTO ct_t (label, k, score) VALUES ('a', 1, 1.5), ('b', 2, 2.5)")
    // OR REPLACE resolves on k (the declared PK): label 'B' replaces
    // k=2 even though its label differs; k=3 appends
    Runner.runSql(spark,
      "INSERT OR REPLACE INTO ct_t (label, k, score) VALUES ('B', 2, 9.0), ('c', 3, 3.5)")
    val rows = spark.table("ct_t").orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows == Seq(("a", 1L, 1.5), ("B", 2L, 9.0), ("c", 3L, 3.5)))
    // IF NOT EXISTS no-op; bare CREATE errors (SQLite semantics)
    Runner.runSql(spark, "CREATE TABLE IF NOT EXISTS ct_t (x INTEGER)")
    assert(spark.table("ct_t").columns.length == 6)
    // AUTOINCREMENT parses as a tolerated rider; the key still drives
    // upserts (max+1 insert assignment only diverges from SQLite's
    // never-reuse rule after deletes at the max — documented)
    Runner.runSql(spark, "DROP TABLE IF EXISTS ct_ai")
    Runner.runSql(spark,
      "CREATE TABLE ct_ai (id INTEGER PRIMARY KEY AUTOINCREMENT, x TEXT)")
    Runner.runSql(spark, "INSERT INTO ct_ai (id, x) VALUES (1, 'a')")
    Runner.runSql(spark, "INSERT OR REPLACE INTO ct_ai (id, x) VALUES (1, 'b')")
    assert(spark.table("ct_ai").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "b")))
    val e = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "CREATE TABLE ct_t (x INTEGER)")
    }
    assert(e.getMessage.contains("already exists"))
    // DROP forgets the declared key with the table
    Runner.runSql(spark, "DROP TABLE ct_t")
    assert(graft.exec.SessionKeys.keyFor(spark, "ct_t").isEmpty)
  }

  test("CREATE TABLE parses table-level constraints, quoted idents, STRICT tails") {
    import SqlDml._
    // field-access matching: positional CreateTable patterns break on
    // every new optional field
    detect("""CREATE TABLE t ("a col" VARCHAR(30), b DOUBLE PRECISION,
              c, PRIMARY KEY (b, c), FOREIGN KEY (c) REFERENCES u(x))""") match {
      case Some(ct: CreateTable) =>
        assert(ct.name == "t" && !ct.ifNotExists)
        assert(ct.cols == Seq(("a col", "VARCHAR(30)"),
          ("b", "DOUBLE PRECISION"), ("c", "")))
        assert(ct.pkCols == Seq("b", "c") && ct.defaults.isEmpty &&
          ct.uniques.isEmpty)
        assert(ct.fks == Seq(Fk(Seq("c"), "u", Seq("x"))))
      case other => fail(s"expected CreateTable, got $other")
    }
    // a UNIQUE table constraint is the conflict-key fallback when no
    // PK is declared; CHECK contents never leak keywords; the STRICT
    // tail parses into its flag
    detect("""CREATE TABLE t (a INT, b TEXT CHECK (b <> 'primary key'),
              UNIQUE (a)) STRICT""") match {
      case Some(ct: CreateTable) =>
        assert(ct.cols.map(_._1) == Seq("a", "b"))
        assert(ct.pkCols.isEmpty && ct.uniques == Seq(Seq("a")))
        assert(ct.strict && !ct.withoutRowid)
      case other => fail(s"expected CreateTable with UNIQUE fallback, got $other")
    }
    // column-level PRIMARY KEY with riders; AUTOINCREMENT captures
    detect("CREATE TEMP TABLE IF NOT EXISTS t (id INTEGER PRIMARY KEY AUTOINCREMENT, v REAL)") match {
      case Some(ct: CreateTable) =>
        assert(ct.ifNotExists && ct.cols.map(_._1) == Seq("id", "v"))
        assert(ct.pkCols == Seq("id"))
        assert(ct.autoincrement == Some(("id", "INTEGER", true)))
      case other => fail(s"expected CreateTable, got $other")
    }
    // DEFAULT expressions capture verbatim: quoted, signed, keyword,
    // and parenthesized forms (CREATE TABLE allows all four)
    detect("""CREATE TABLE t (a TEXT DEFAULT 'n/a', b INT DEFAULT -1,
              c TEXT DEFAULT CURRENT_TIMESTAMP NOT NULL,
              d REAL DEFAULT (1.5 * 2))""") match {
      case Some(ct: CreateTable) =>
        assert(ct.cols.map(_._1) == Seq("a", "b", "c", "d"))
        assert(ct.defaults == Seq("a" -> "'n/a'", "b" -> "-1",
          "c" -> "CURRENT_TIMESTAMP", "d" -> "(1.5 * 2)"))
      case other => fail(s"expected CreateTable with defaults, got $other")
    }
  }

  test("INSERT INTO t DEFAULT VALUES inserts one all-default row") {
    Runner.runSql(spark, "DROP TABLE IF EXISTS dv_t")
    Runner.runSql(spark,
      "CREATE TABLE dv_t (id INTEGER, tag TEXT DEFAULT 'n/a', n INTEGER DEFAULT 7)")
    Runner.runSql(spark, "INSERT INTO dv_t DEFAULT VALUES")
    val rows = spark.table("dv_t").collect()
      .map(r => (r.isNullAt(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((true, "n/a", 7L)))
    // RETURNING sees the defaulted row (SQLite allows it on this form)
    val ret = Runner.runSql(spark,
      "INSERT INTO dv_t DEFAULT VALUES RETURNING tag, n").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(ret == Seq(("n/a", 7L)))
    assert(spark.table("dv_t").count() == 2)
    // SQLite's grammar: no column list, no upsert clause on this form
    intercept[UnsupportedOperationException] {
      Runner.runSql(spark, "INSERT INTO dv_t (id) DEFAULT VALUES") }
    intercept[UnsupportedOperationException] {
      Runner.runSql(spark,
        "INSERT INTO dv_t DEFAULT VALUES ON CONFLICT DO NOTHING") }
    // a user SELECT that happens to produce the sentinel text binds
    // positionally (the flag is structural, not a magic string)
    Runner.runSql(spark, "DROP TABLE IF EXISTS dvs_t")
    Runner.runSql(spark, "CREATE TABLE dvs_t (b INTEGER)")
    Runner.runSql(spark,
      "INSERT INTO dvs_t SELECT true AS __graft_default_values")
    assert(spark.table("dvs_t").collect().head.getLong(0) == 1L)
  }

  test("declared DEFAULTs fill unlisted INSERT columns; table_info reports them") {
    Runner.runSql(spark, "DROP TABLE IF EXISTS dft_t")
    Runner.runSql(spark,
      """CREATE TABLE dft_t (id INTEGER PRIMARY KEY, tag TEXT DEFAULT 'n/a',
           score REAL DEFAULT (2 + 0.5), n INTEGER DEFAULT -1)""")
    Runner.runSql(spark, "INSERT INTO dft_t (id) VALUES (1)")
    Runner.runSql(spark, "INSERT INTO dft_t (id, tag) VALUES (2, 'real')")
    val rows = spark.table("dft_t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    assert(rows == Seq((1L, "n/a", 2.5, -1L), (2L, "real", 2.5, -1L)))
    // PRAGMA table_info reports the default text as written
    val ti = Runner.runSql(spark, "PRAGMA table_info(dft_t)").collect()
      .map(r => (r.getString(1), r.getString(4))).toSeq
    assert(ti == Seq(("id", null), ("tag", "'n/a'"),
      ("score", "(2 + 0.5)"), ("n", "-1")))
    // the default follows a column rename and dies with a column drop
    Runner.runSql(spark, "ALTER TABLE dft_t RENAME COLUMN tag TO label")
    Runner.runSql(spark, "ALTER TABLE dft_t DROP COLUMN n")
    Runner.runSql(spark, "INSERT INTO dft_t (id) VALUES (3)")
    val r3 = spark.table("dft_t").where("id = 3").collect().head
    assert(r3.getString(1) == "n/a")
    // an ADD COLUMN default backfills AND applies to later inserts
    Runner.runSql(spark,
      "ALTER TABLE dft_t ADD COLUMN src TEXT DEFAULT 'lake'")
    Runner.runSql(spark, "INSERT INTO dft_t (id) VALUES (4)")
    val srcs = spark.table("dft_t").orderBy("id").collect()
      .map(_.getString(3)).toSeq
    assert(srcs == Seq("lake", "lake", "lake", "lake"))
    // CURRENT_TIMESTAMP renders SQLite's fixed UTC text shape
    Runner.runSql(spark, "DROP TABLE IF EXISTS dft_ts")
    Runner.runSql(spark,
      "CREATE TABLE dft_ts (id INTEGER, at TEXT DEFAULT CURRENT_TIMESTAMP)")
    Runner.runSql(spark, "INSERT INTO dft_ts (id) VALUES (1)")
    val at = spark.table("dft_ts").collect().head.getString(1)
    assert(at.matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}"), at)
    Runner.runSql(spark, "DROP TABLE dft_ts")
    Runner.runSql(spark, "DROP TABLE dft_t")
  }

  test("CREATE [UNIQUE] INDEX registers; unique declares the upsert key; DROP INDEX forgets") {
    freshView("idx_t")
    // a plain index: pure access-path no-op (SQLite results never
    // change) — and the upsert key stays the leading column
    Runner.runSql(spark, "CREATE INDEX idx_plain ON idx_t (name)")
    assert(graft.exec.SessionKeys.keyFor(spark, "idx_t").isEmpty)
    // a UNIQUE index declares the constraint OR REPLACE resolves
    // against — here the NON-leading v column
    Runner.runSql(spark, "CREATE UNIQUE INDEX idx_u ON idx_t (v)")
    Runner.runSql(spark,
      "INSERT OR REPLACE INTO idx_t (id, name, v) VALUES (9, 'NEW', 20)")
    val rows = spark.table("idx_t").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // v=20 replaced (old id 2 row gone), ids 1/3 survive
    assert(rows == Seq((1L, "one", 10L), (3L, "three", 30L), (9L, "NEW", 20L)))
    // duplicate index name errors unless IF NOT EXISTS; DROP forgets
    val e = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "CREATE INDEX idx_u ON idx_t (name)")
    }
    assert(e.getMessage.contains("already exists"))
    Runner.runSql(spark, "CREATE INDEX IF NOT EXISTS idx_u ON idx_t (name)")
    Runner.runSql(spark, "DROP INDEX idx_u")
    assert(graft.exec.SessionKeys.keyFor(spark, "idx_t").isEmpty)
    val d = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "DROP INDEX idx_u")
    }
    assert(d.getMessage.contains("no such index"))
    Runner.runSql(spark, "DROP INDEX IF EXISTS idx_u") // no-op
    // unknown column / missing table are targeted
    val c = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "CREATE UNIQUE INDEX idx_b ON idx_t (bogus)")
    }
    assert(c.getMessage.contains("no such column"))
    val m = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "CREATE INDEX idx_m ON no_such_table (x)")
    }
    assert(m.getMessage.contains("not a registered"))
    // unsound UNIQUE variants decline targeted; the expression form
    // now parses with its raw item texts (enforced via the
    // expression-key machinery)
    import SqlDml._
    detect("CREATE UNIQUE INDEX e ON t (lower(a))") match {
      case Some(CreateIndex("e", "t", Nil, true, false, _, Seq("lower(a)"), None)) =>
      case other => fail(s"expected expression-keyed CreateIndex, got $other")
    }
    // partial UNIQUE now parses with its predicate (enforced only
    // among predicate-TRUE rows — UniqueSpec)
    detect("CREATE UNIQUE INDEX e ON t (a) WHERE a > 0") match {
      case Some(CreateIndex("e", "t", Seq("a"), true, false, _, Nil,
          Some("a > 0"))) =>
      case other => fail(s"expected partial CreateIndex, got $other")
    }
    // a plain expression/partial index is still a sound no-op
    detect("CREATE INDEX e ON t (lower(a)) WHERE a > 0") match {
      case Some(CreateIndex("e", "t", Nil, false, false, _, _, _)) =>
      case other => fail(s"expected no-op CreateIndex, got $other")
    }
  }

  test("row-value SET executes with OLD-row reads (swap is exact)") {
    freshView("rv_t")
    Runner.runSql(spark, "UPDATE rv_t SET (id, v) = (v, id) WHERE id = 1")
    val rows = spark.table("rv_t").orderBy("v")
      .collect().map(_.toSeq.toSeq).toSeq
    // the id/v swap read the OLD row on both sides (sqlite3-pinned)
    assert(rows.contains(Seq(10L, "one", 1L)), rows.toString)
    assert(rows.count(_ == Seq(2L, "two", 20L)) == 1)
  }

  test("row-value SUBQUERY SET executes per-column correlated; " +
      "no-match rows assign NULLs (sqlite3-pinned)") {
    freshView("rvq_t")
    Seq((1L, "ONE", 100L), (2L, "TWO", 200L))
      .toDF("sid", "sname", "sv").createOrReplaceTempView("rvq_src")
    Runner.runSql(spark,
      """UPDATE rvq_t SET (name, v) =
           (SELECT sname, sv FROM rvq_src WHERE rvq_src.sid = rvq_t.id)
         WHERE id < 3""")
    val rows = spark.table("rvq_t").orderBy("id")
      .collect().map(_.toSeq.toSeq).toSeq
    assert(rows == Seq(Seq(1L, "ONE", 100L), Seq(2L, "TWO", 200L),
      Seq(3L, "three", 30L)), rows.toString)
    // a matching row MISSING from the source assigns NULLs (measured)
    Runner.runSql(spark,
      """UPDATE rvq_t SET (name, v) =
           (SELECT sname, sv FROM rvq_src WHERE rvq_src.sid = rvq_t.id)
         WHERE id = 3""")
    val r3 = spark.table("rvq_t").where("id = 3")
      .collect().map(_.toSeq.toSeq).toSeq
    assert(r3 == Seq(Seq(3L, null, null)), r3.toString)
    // the FROM-less subquery form is the plain row-value swap
    freshView("rvq_u")
    Runner.runSql(spark,
      "UPDATE rvq_u SET (id, v) = (SELECT v, id) WHERE id = 1")
    val swapped = spark.table("rvq_u").where("v = 1")
      .collect().map(_.toSeq.toSeq).toSeq
    assert(swapped == Seq(Seq(10L, "one", 1L)), swapped.toString)
    // star / DISTINCT forms decline named
    import SqlDml._
    assert(detect("UPDATE t SET (a, b) = (SELECT * FROM s)")
      == Some(Unsupported("UPDATE with a star/DISTINCT row-value subquery SET")))
  }

  test("UPDATE … FROM joins, updates matched rows only, resolves deterministically") {
    freshView("uf_t")
    Seq((1L, "alpha"), (3L, "gamma"), (9L, "omega"))
      .toDF("ref_id", "tag").createOrReplaceTempView("uf_src")
    Runner.runSql(spark,
      """UPDATE uf_t SET name = name || '@' || tag, v = v + 1
         FROM uf_src WHERE uf_t.id = uf_src.ref_id""")
    val rows = spark.table("uf_t").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // ids 1 and 3 matched and updated; id 2 had no match and is untouched
    assert(rows == Seq((1L, "one@alpha", 11L), (2L, "two", 20L),
      (3L, "three@gamma", 31L)))
    // multi-match: SQLite picks one arbitrary join row; graft picks
    // the deterministic minimum of the assigned row image — reruns
    // agree with themselves
    freshView("uf_m")
    Seq((1L, "zz"), (1L, "aa")).toDF("ref_id", "tag")
      .createOrReplaceTempView("uf_msrc")
    Runner.runSql(spark,
      "UPDATE uf_m SET name = tag FROM uf_msrc WHERE id = ref_id")
    assert(spark.table("uf_m").filter("id = 1")
      .collect().map(_.getString(1)).toSeq == Seq("aa"))
    // RETURNING sees the new values of the matched rows only
    freshView("uf_r")
    Runner.runSql(spark,
      """UPDATE uf_r SET v = v * 100 FROM uf_src
         WHERE uf_r.id = uf_src.ref_id RETURNING id, v""").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq match {
      case Seq((1L, 1000L), (3L, 3000L)) =>
      case other => fail(s"unexpected RETURNING rows: $other")
    }
  }

  test("INSERT … RETURNING hands back the affected slice per conflict action") {
    // plain append: every inserted row, final (NULL-padded) values
    freshView("ir_a")
    val ins = Runner.runSql(spark,
      "INSERT INTO ir_a (id, name) VALUES (8, 'eight'), (9, 'nine') RETURNING id, name, v")
    assert(ins.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.isNullAt(2))).toSeq
      == Seq((8L, "eight", true), (9L, "nine", true)))
    // DO NOTHING: only the non-conflicting row comes back
    freshView("ir_n")
    val ign = Runner.runSql(spark,
      "INSERT OR IGNORE INTO ir_n VALUES (2, 'CONF', 99), (7, 'seven', 70) RETURNING id")
    assert(ign.collect().map(_.getLong(0)).toSeq == Seq(7L))
    // DO UPDATE: updated rows (new values) + appended rows
    freshView("ir_u")
    val up = Runner.runSql(spark,
      """INSERT INTO ir_u VALUES (2, 'TWO', 200), (7, 'seven', 70)
         ON CONFLICT (id) DO UPDATE SET v = v + excluded.v
         RETURNING id, v""").orderBy("id")
    assert(up.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((2L, 220L), (7L, 70L)))
    // OR REPLACE: the incoming rows are the affected slice
    freshView("ir_r")
    val rep = Runner.runSql(spark,
      "INSERT OR REPLACE INTO ir_r VALUES (3, 'THREE', 33) RETURNING name, v")
    assert(rep.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("THREE", 33L)))
    // the RETURNING result is materialized: stable across later DML
    Runner.runSql(spark, "DELETE FROM ir_r")
    assert(rep.count() == 1)
  }

  test("upsert errors are targeted: unknown table, arity mismatch, unknown column") {
    freshView("dml_e")
    val e1 = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "INSERT OR REPLACE INTO no_such_t VALUES (1, 'a', 2)")
    }
    assert(e1.getMessage.contains("not a registered"))
    val e2 = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "INSERT OR REPLACE INTO dml_e (id, name) VALUES (1, 'a', 2)")
    }
    assert(e2.getMessage.contains("2 target columns"))
    val e3 = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "INSERT OR REPLACE INTO dml_e (id, bogus, v) VALUES (1, 'a', 2)")
    }
    assert(e3.getMessage.contains("no such column"))
  }

  test("comments never confuse the DML clause scanners") {
    import SqlDml._
    // a clause keyword inside a trailing comment is NOT a clause
    assert(detect("DELETE FROM t WHERE x > 0 -- limit cleanup pass")
      == Some(Delete("t", Some("x > 0"), None, "")))
    assert(detect("UPDATE t SET a = 1 /* WHERE id = 5 */")
      == Some(Update("t", Seq("a" -> "1"), None, None, "", None)))
    // comment-shaped text inside literals survives verbatim
    assert(detect("DELETE FROM t WHERE s = '-- not a comment'")
      == Some(Delete("t", Some("s = '-- not a comment'"), None, "")))
    // and executes end-to-end
    freshView("cmt_t")
    Runner.runSql(spark,
      "DELETE FROM cmt_t WHERE v > 15 -- limit this to the big rows")
    assert(spark.table("cmt_t").count() == 1)
  }

  test("multi-statement scripts fail targeted (SQLite's one-statement rule)") {
    freshView("multi_t")
    val e = intercept[UnsupportedOperationException] {
      Runner.runSql(spark,
        "DELETE FROM multi_t WHERE id = 1; SELECT * FROM multi_t")
    }
    assert(e.getMessage.contains("one statement"))
    assert(spark.table("multi_t").count() == 3) // nothing executed
    // `;` inside literals/comments is opaque; trailing `;` is fine
    assert(Runner.runSql(spark,
      "SELECT 'a; b' AS s FROM multi_t -- note; here\n;").count() == 3)
    // CREATE TRIGGER's BEGIN…END body holds `;` legally — the
    // statement-splitting exemption lets it through to the trigger
    // engine, which registers it (see TriggerSpec for the surface)
    Runner.runSql(spark,
      "CREATE TRIGGER tg AFTER UPDATE ON multi_t BEGIN SELECT 1; END")
    assert(Runner.runSql(spark,
      "SELECT name FROM sqlite_master WHERE type = 'trigger' " +
        "AND name = 'tg'").count() == 1)
    Runner.runSql(spark, "DROP TRIGGER tg")
  }

  test("detect classifies SQLite's ALTER TABLE forms") {
    import SqlDml._
    assert(detect("ALTER TABLE t RENAME TO u")
      == Some(AlterRenameTable("t", "u")))
    assert(detect("alter table 'h2' rename column a to b;")
      == Some(AlterRenameColumn("h2", "a", "b")))
    // the COLUMN keyword is optional in SQLite's grammar
    assert(detect("ALTER TABLE t RENAME a TO b")
      == Some(AlterRenameColumn("t", "a", "b")))
    assert(detect("ALTER TABLE t ADD COLUMN c INTEGER DEFAULT 5 NOT NULL")
      == Some(AlterAddColumn("t", "c", "INTEGER", Some("5"), notNull = true)))
    assert(detect("ALTER TABLE t ADD c TEXT DEFAULT 'x y'")
      == Some(AlterAddColumn("t", "c", "TEXT", Some("'x y'"), notNull = false)))
    // typeless + no default (both legal in SQLite)
    assert(detect("ALTER TABLE t ADD COLUMN c")
      == Some(AlterAddColumn("t", "c", "", None, notNull = false)))
    assert(detect("ALTER TABLE t DROP COLUMN c")
      == Some(AlterDropColumn("t", "c")))
    assert(detect("ALTER TABLE t DROP c")
      == Some(AlterDropColumn("t", "c")))
    // SQLite's own ADD COLUMN restrictions decline at parse
    assert(detect("ALTER TABLE t ADD COLUMN c INTEGER PRIMARY KEY")
      == Some(Unsupported(
        "ALTER TABLE ADD COLUMN with PRIMARY KEY (SQLite forbids)")))
    assert(detect("ALTER TABLE t ADD COLUMN c TEXT DEFAULT (1+2)")
      == Some(Unsupported("ALTER TABLE ADD COLUMN with a parenthesized " +
        "DEFAULT expression (SQLite forbids)")))
    assert(detect("ALTER TABLE t ADD COLUMN c TEXT DEFAULT CURRENT_TIMESTAMP")
      == Some(Unsupported("ALTER TABLE ADD COLUMN with a " +
        "CURRENT_TIMESTAMP default (SQLite forbids)")))
    // there is no ALTER VIEW/INDEX in SQLite; trailing garbage declines
    assert(detect("ALTER INDEX i RENAME TO j")
      == Some(Unsupported("ALTER INDEX")))
    assert(detect("ALTER TABLE t RENAME TO u extra")
      == Some(Unsupported("ALTER TABLE RENAME TO")))
  }

  test("ALTER TABLE executes: rename/add/drop column, rename table, keys follow") {
    freshView("alt_t")
    Runner.runSql(spark,
      "ALTER TABLE alt_t ADD COLUMN src TEXT DEFAULT 'lake'")
    assert(spark.table("alt_t").columns.toSeq
      == Seq("id", "name", "v", "src"))
    assert(spark.table("alt_t").select("src").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("lake"))
    // no default → NULL for existing rows
    Runner.runSql(spark, "ALTER TABLE alt_t ADD COLUMN w INTEGER")
    assert(spark.table("alt_t").where("w IS NULL").count() == 3)
    Runner.runSql(spark, "ALTER TABLE alt_t RENAME COLUMN name TO label")
    assert(spark.table("alt_t").columns.toSeq
      == Seq("id", "label", "v", "src", "w"))
    Runner.runSql(spark, "ALTER TABLE alt_t DROP COLUMN w")
    assert(spark.table("alt_t").columns.toSeq
      == Seq("id", "label", "v", "src"))
    Runner.runSql(spark, "ALTER TABLE alt_t RENAME TO alt_u")
    assert(spark.table("alt_u").where("label = 'two'").count() == 1)
    val gone = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "ALTER TABLE alt_t DROP COLUMN v")
    }
    assert(gone.getMessage.contains("no such session table"))
    // declared keys follow renames: PK moves with the table AND the
    // renamed column, so a later upsert resolves on it
    Runner.runSql(spark, "DROP TABLE IF EXISTS alt_k")
    Runner.runSql(spark,
      "CREATE TABLE alt_k (pk INTEGER PRIMARY KEY, s TEXT)")
    Runner.runSql(spark, "INSERT INTO alt_k VALUES (1, 'a'), (2, 'b')")
    Runner.runSql(spark, "ALTER TABLE alt_k RENAME COLUMN pk TO k")
    Runner.runSql(spark, "ALTER TABLE alt_k RENAME TO alt_k2")
    assert(graft.exec.SessionKeys.keyFor(spark, "alt_k2") == Some(Seq("k")))
    Runner.runSql(spark, "INSERT OR REPLACE INTO alt_k2 VALUES (2, 'B')")
    assert(spark.table("alt_k2").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "a"), (2L, "B")))
    // SQLite's DROP COLUMN restrictions: PK and indexed columns refuse
    val pkErr = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "ALTER TABLE alt_k2 DROP COLUMN k")
    }
    assert(pkErr.getMessage.contains("PRIMARY KEY column"))
    Runner.runSql(spark, "CREATE INDEX alt_ix ON alt_k2 (s)")
    val ixErr = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "ALTER TABLE alt_k2 DROP COLUMN s")
    }
    assert(ixErr.getMessage.contains("indexed by alt_ix"))
    Runner.runSql(spark, "DROP INDEX alt_ix")
    // NOT NULL without a non-NULL default refuses (SQLite's rule)
    val nn = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "ALTER TABLE alt_k2 ADD COLUMN z TEXT NOT NULL")
    }
    assert(nn.getMessage.contains("NOT NULL column"))
    // duplicate targets refuse
    val dup = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "ALTER TABLE alt_k2 ADD COLUMN s TEXT")
    }
    assert(dup.getMessage.contains("duplicate column"))
    Runner.runSql(spark, "DROP TABLE alt_k2")
  }

  test("DELETE/UPDATE with ORDER BY + LIMIT touch the ordered slice only") {
    import spark.implicits._
    Seq((1L, 10L), (2L, 40L), (3L, 20L), (4L, 30L), (5L, 50L))
      .toDF("id", "v").createOrReplaceTempView("dml_lim")
    // delete the two SMALLEST v among WHERE-true rows: v=20 (id 3) and
    // v=30 (id 4) — v=10 is excluded by the WHERE
    Runner.runSql(spark,
      "DELETE FROM dml_lim WHERE v > 15 ORDER BY v LIMIT 2")
    assert(spark.table("dml_lim").orderBy("id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 5L))
    // OFFSET skips the first ranked row; RETURNING sees the deleted
    // (old) rows
    Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("id", "v").createOrReplaceTempView("dml_lim2")
    val del = Runner.runSql(spark,
      "DELETE FROM dml_lim2 ORDER BY v DESC LIMIT 2 OFFSET 1 RETURNING id")
    assert(del.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    assert(spark.table("dml_lim2").orderBy("id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 4L))
    // UPDATE LIMIT: only the top-n ordered rows take the assignment
    Seq((1L, 10L), (2L, 20L), (3L, 30L))
      .toDF("id", "v").createOrReplaceTempView("dml_lim3")
    Runner.runSql(spark,
      "UPDATE dml_lim3 SET v = v + 1000 ORDER BY v DESC LIMIT 1")
    assert(spark.table("dml_lim3").orderBy("id")
      .collect().map(_.getLong(1)).toSeq == Seq(10L, 20L, 1030L))
    // bare LIMIT with no ORDER BY deletes a deterministic arbitrary
    // subset of the right SIZE (SQLite: unspecified which rows)
    Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "v")
      .createOrReplaceTempView("dml_lim4")
    Runner.runSql(spark, "DELETE FROM dml_lim4 LIMIT 2")
    assert(spark.table("dml_lim4").count() == 1)
    // negative LIMIT = no limit (SQLite's rule)
    Runner.runSql(spark, "DELETE FROM dml_lim4 LIMIT -1")
    assert(spark.table("dml_lim4").count() == 0)
    // a non-constant LIMIT is a targeted error
    Seq((1L, 1L)).toDF("id", "v").createOrReplaceTempView("dml_lim5")
    val e = intercept[IllegalArgumentException] {
      Runner.runSql(spark, "DELETE FROM dml_lim5 LIMIT v")
    }
    assert(e.getMessage.contains("not a constant integer"))
  }
}
