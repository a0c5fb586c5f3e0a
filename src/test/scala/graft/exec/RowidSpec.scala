package graft.exec

import org.apache.spark.sql.Row
import graft.SparkSpec
import graft.text2sql.SqlDialect

/** End-to-end rowid surface through the generated-SQL path
  * ([[Runner.runSql]]): lazy enablement, visibility, DML semantics.
  */
class RowidSpec extends SparkSpec {

  private def mkTable(name: String, rows: Seq[(Int, String)]): Unit = {
    import spark.implicits._
    // single partition in given order — deterministic rowid 1..N
    rows.toDF("id", "txt").coalesce(1).createOrReplaceTempView(name)
  }

  private def run(sql: String) = Runner.runSql(spark, SqlDialect.translate(sql))

  test("SELECT rowid materializes lazily and numbers 1..N in row order") {
    mkTable("rw_sel", Seq(1 -> "a", 2 -> "b", 3 -> "c"))
    val out = run("SELECT rowid, id FROM rw_sel ORDER BY rowid").collect()
    assert(out.toSeq == Seq(Row(1L, 1), Row(2L, 2), Row(3L, 3)))
    // stable across statements
    val again = run("SELECT rowid FROM rw_sel WHERE id = 2").collect()
    assert(again.toSeq == Seq(Row(2L)))
  }

  test("star stays rowid-free after enablement; rowid only when asked") {
    mkTable("rw_star", Seq(1 -> "a", 2 -> "b"))
    run("SELECT rowid FROM rw_star").collect() // enables
    val star = run("SELECT * FROM rw_star ORDER BY id")
    assert(star.columns.toSeq == Seq("id", "txt"))
    val both = run("SELECT rowid, * FROM rw_star ORDER BY rowid")
    assert(both.columns.toSeq == Seq("rowid", "id", "txt"))
  }

  test("_rowid_ and oid resolve as aliases") {
    mkTable("rw_alias", Seq(5 -> "x", 6 -> "y"))
    val out = run("SELECT _rowid_ AS r1, oid AS r2, id FROM rw_alias " +
      "WHERE _rowid_ = 2").collect()
    assert(out.toSeq == Seq(Row(2L, 2L, 6)))
  }

  test("the classic dedup DELETE keeps the first row per duplicate group") {
    mkTable("rw_dedup", Seq(10 -> "dup", 11 -> "uniq", 12 -> "dup",
      13 -> "dup", 14 -> "other"))
    run("""DELETE FROM rw_dedup WHERE rowid NOT IN
            (SELECT MIN(rowid) FROM rw_dedup GROUP BY txt)""")
    val left = run("SELECT id, txt FROM rw_dedup ORDER BY id").collect()
    assert(left.toSeq == Seq(Row(10, "dup"), Row(11, "uniq"), Row(14, "other")))
    // survivors keep their original rowids (SQLite: DELETE leaves gaps)
    val rids = run("SELECT rowid FROM rw_dedup ORDER BY rowid").collect()
    assert(rids.toSeq == Seq(Row(1L), Row(2L), Row(5L)))
  }

  test("UPDATE via rowid hits exactly the addressed row") {
    mkTable("rw_upd", Seq(1 -> "a", 2 -> "b", 3 -> "c"))
    run("UPDATE rw_upd SET txt = 'Z' WHERE rowid = 2")
    val out = run("SELECT rowid, id, txt FROM rw_upd ORDER BY rowid").collect()
    assert(out.toSeq == Seq(Row(1L, 1, "a"), Row(2L, 2, "Z"), Row(3L, 3, "c")))
  }

  test("INSERT assigns monotonically increasing rowids past max") {
    mkTable("rw_ins", Seq(1 -> "a", 2 -> "b"))
    run("SELECT rowid FROM rw_ins").collect() // enable
    run("INSERT INTO rw_ins (id, txt) VALUES (3, 'c'), (4, 'd')")
    val out = run("SELECT rowid, id FROM rw_ins ORDER BY rowid").collect()
    assert(out.toSeq == Seq(Row(1L, 1), Row(2L, 2), Row(3L, 3), Row(4L, 4)))
    // positional INSERT binds the VISIBLE schema (rowid not a slot)
    run("INSERT INTO rw_ins VALUES (5, 'e')")
    val five = run("SELECT rowid, id FROM rw_ins WHERE id = 5").collect()
    assert(five.toSeq == Seq(Row(5L, 5)))
    // after a DELETE leaves a gap, new rowids still go past the max
    run("DELETE FROM rw_ins WHERE rowid = 5")
    run("INSERT INTO rw_ins VALUES (6, 'f')")
    val six = run("SELECT rowid FROM rw_ins WHERE id = 6").collect()
    assert(six.toSeq.head.getLong(0) >= 5L)
  }

  test("explicit rowid in the column list is honored") {
    mkTable("rw_exp", Seq(1 -> "a"))
    run("SELECT rowid FROM rw_exp").collect() // enable
    run("INSERT INTO rw_exp (rowid, id, txt) VALUES (99, 2, 'b')")
    val out = run("SELECT rowid, id FROM rw_exp ORDER BY rowid").collect()
    assert(out.toSeq == Seq(Row(1L, 1), Row(99L, 2)))
  }

  test("RETURNING can hand back rowid") {
    mkTable("rw_ret", Seq(1 -> "a", 2 -> "b", 3 -> "a"))
    val ret = run("DELETE FROM rw_ret WHERE txt = 'a' RETURNING rowid, id")
      .orderBy("rowid").collect()
    assert(ret.toSeq == Seq(Row(1L, 1), Row(3L, 3)))
  }

  test("a declared column named rowid shadows the surface (never enabled)") {
    import spark.implicits._
    Seq((1, 100L), (2, 200L)).toDF("id", "rowid")
      .coalesce(1).createOrReplaceTempView("rw_shadow")
    val out = run("SELECT rowid, id FROM rw_shadow ORDER BY id").collect()
    assert(out.toSeq == Seq(Row(100L, 1), Row(200L, 2)))
    assert(!Rowid.isEnabled(spark, "rw_shadow"))
    // star shows the REAL column — it is a declared one
    assert(run("SELECT * FROM rw_shadow").columns.toSeq == Seq("id", "rowid"))
  }

  test("PRAGMA table_info and sqlite_master never list the emulated rowid") {
    mkTable("rw_pragma", Seq(1 -> "a"))
    run("SELECT rowid FROM rw_pragma").collect() // enable
    val cols = run("PRAGMA table_info(rw_pragma)")
      .select("name").collect().map(_.getString(0)).toSeq
    assert(cols == Seq("id", "txt"))
    val ddl = run("SELECT sql FROM sqlite_master WHERE name = 'rw_pragma'")
      .collect().head.getString(0)
    assert(!ddl.toLowerCase.contains("rowid"))
  }

  test("CREATE TABLE AS over a rowid select freezes it as a declared column") {
    mkTable("rw_ctas", Seq(1 -> "a", 2 -> "b"))
    run("CREATE TABLE rw_ctas2 AS SELECT rowid AS orig_rid, id FROM rw_ctas")
    val out = run("SELECT orig_rid, id FROM rw_ctas2 ORDER BY orig_rid").collect()
    assert(out.toSeq == Seq(Row(1L, 1), Row(2L, 2)))
  }

  test("last_insert_rowid() reports the newest insert; empty inserts keep it") {
    mkTable("rw_lir", Seq(1 -> "a", 2 -> "b"))
    run("SELECT rowid FROM rw_lir").collect() // enable
    run("INSERT INTO rw_lir (id, txt) VALUES (3, 'c'), (4, 'd')")
    assert(run("SELECT last_insert_rowid() AS r").collect().head.getLong(0) == 4L)
    // an all-conflict OR IGNORE inserts nothing — the value stays
    run("""INSERT OR IGNORE INTO rw_lir
           SELECT id, 'dup' FROM rw_lir WHERE id <= 2""")
    assert(run("SELECT last_insert_rowid() AS r").collect().head.getLong(0) == 4L)
    // explicit rowid wins the max
    run("INSERT INTO rw_lir (rowid, id, txt) VALUES (77, 5, 'e')")
    assert(run("SELECT last_insert_rowid() AS r").collect().head.getLong(0) == 77L)
  }

  test("a CTE named like an enabled table shadows it for the statement") {
    mkTable("rw_cshadow", Seq(1 -> "a", 2 -> "b"))
    run("SELECT rowid FROM rw_cshadow").collect() // enable
    // the CTE projects DIFFERENT columns — star must bind to the CTE,
    // not expand against the table's visible schema
    val out = run("""WITH rw_cshadow AS (SELECT 42 AS z)
                     SELECT * FROM rw_cshadow""").collect()
    assert(out.toSeq == Seq(Row(42)))
  }

  test("an INTEGER PRIMARY KEY is the rowid (SQLite's alias rule)") {
    run("DROP TABLE IF EXISTS rw_ipk")
    run("CREATE TABLE rw_ipk (id INTEGER PRIMARY KEY, txt TEXT)")
    run("INSERT INTO rw_ipk (id, txt) VALUES (10, 'a'), (35, 'b')")
    // rowid materializes as the KEY VALUES, not an independent 1..N
    val out = run("SELECT rowid, id, txt FROM rw_ipk ORDER BY rowid").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((10L, 10L), (35L, 35L)))
    // post-enablement inserts write the key through to rowid
    run("INSERT INTO rw_ipk (id, txt) VALUES (20, 'c')")
    val three = run("SELECT rowid FROM rw_ipk ORDER BY rowid").collect()
    assert(three.map(_.getLong(0)).toSeq == Seq(10L, 20L, 35L))
    // assigning the aliased key (or rowid) declines — write-through
    // the materialized copy is not modeled
    intercept[UnsupportedOperationException] {
      run("UPDATE rw_ipk SET id = 99 WHERE rowid = 10")
    }
    // other columns update fine
    run("UPDATE rw_ipk SET txt = 'Z' WHERE rowid = 35")
    val z = run("SELECT txt FROM rw_ipk WHERE rowid = 35").collect()
    assert(z.head.getString(0) == "Z")
    // the same guard covers ON CONFLICT DO UPDATE assignment targets
    intercept[UnsupportedOperationException] {
      run("INSERT INTO rw_ipk VALUES (10, 'x') " +
        "ON CONFLICT (id) DO UPDATE SET id = 99")
    }
    run("DROP TABLE rw_ipk")
  }

  test("joins with stars expand only the enabled side") {
    mkTable("rw_j1", Seq(1 -> "a", 2 -> "b"))
    import spark.implicits._
    Seq((1, 10.0), (2, 20.0)).toDF("k", "v")
      .createOrReplaceTempView("rw_j2")
    run("SELECT rowid FROM rw_j1").collect() // enable rw_j1 only
    val out = run("SELECT * FROM rw_j1 x JOIN rw_j2 y ON x.id = y.k " +
      "ORDER BY x.id")
    assert(out.columns.toSeq == Seq("id", "txt", "k", "v"))
    assert(out.count() == 2)
  }
}
