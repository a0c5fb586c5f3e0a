package graft.exec

import graft.SparkSpec

/** White-box coverage for the deferred-count machinery behind
  * changes()/total_changes() — specifically the interaction between
  * the 64-entry fold window and [[Atomic]]'s statement-abort restore,
  * which long sessions hit (a fold during an aborted statement must
  * not double-count once the snapshot revives the folded entry). */
class SessionChangesSpec extends SparkSpec {

  test("a main-list fold during an aborted statement never double-counts") {
    // fill the deferred window so the NEXT record folds the oldest
    (1 to 64).foreach(_ => SessionChanges.record(spark, () => 1L))
    val tot0 = SessionChanges.totalChanges(spark)
    val last0 = SessionChanges.changes(spark)
    val snap = SessionChanges.snapshot(spark)
    SessionChanges.record(spark, () => 5L) // folds one entry into acc
    SessionChanges.restore(spark, snap)
    // restore must revert BOTH the vector and the fold accumulator
    assert(SessionChanges.totalChanges(spark) == tot0)
    assert(SessionChanges.changes(spark) == last0)
  }

  test("a FAILED statement keeps the previous changes() value — and " +
      "its captured thunk never poisons later calls (latent-bug pin)") {
    import graft.text2sql.SqlDialect
    def sql(q: String) = Runner.runSql(spark, SqlDialect.translate(q))
    sql("DROP TABLE IF EXISTS chg_fail_t")
    sql("CREATE TABLE chg_fail_t (i INTEGER, k INTEGER) STRICT")
    sql("INSERT INTO chg_fail_t VALUES (1, 1), (2, 2)")
    val before = sql("SELECT changes() AS n").first().getLong(0)
    // the failing UPDATE…FROM records a lazy count whose plan RAISES
    // (the STRICT cast) — without the counter rollback, the next
    // changes() call would surface this statement's error instead of
    // the previous value (the cross-suite failure this pins)
    intercept[Exception](
      sql("UPDATE chg_fail_t SET i = s.x FROM (SELECT 2.5 AS x) s"))
    assert(sql("SELECT changes() AS n").first().getLong(0) == before)
    sql("DROP TABLE chg_fail_t")
  }

  test("trigger-bucket folds survive an abort (sqlite3's total_changes rule)") {
    val snap = SessionChanges.snapshot(spark)
    val tot0 = SessionChanges.totalChanges(spark)
    SessionChanges.inTriggerBody {
      (1 to 65).foreach(_ => SessionChanges.record(spark, () => 2L))
    }
    SessionChanges.restore(spark, snap)
    // completed body statements keep counting even though the
    // statement's effects rolled back (measured sqlite3 behavior)
    assert(SessionChanges.totalChanges(spark) == tot0 + 130L)
  }
}
