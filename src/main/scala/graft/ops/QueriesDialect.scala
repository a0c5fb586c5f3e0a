package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.text2sql.SqlDialect

/** SQLite-dialect queries executed through `SqlDialect.translate` →
  * `spark.sql` — the exact path LLM-generated SQL takes in the engine
  * (reference pandasqlite/pandasqlite.py:245-247 executes generated SQL
  * verbatim against SQLite; here the same text is translated once and
  * handed to Catalyst).
  *
  * Each key's LEFT side below is SQLite SQL as a model emits it
  * (strftime / date modifiers / iif / group_concat / unicode / char /
  * printf); the oracle is hand-written DuckDB SQL for the same answer.
  * A green CORRECTNESS row therefore proves the translation, not just
  * the plan.
  */
object QueriesDialect {
  type Q = (SparkSession, String) => DataFrame

  /** SQLite-dialect text, translated at execution time. */
  val sqlite: Map[String, String] = Map(
    // the reference's #1 real-user surface: date questions over TEXT /
    // timestamp values via SQLite strftime + date-modifier chains
    "fn_date_sqlite" ->
      """SELECT event_id,
           strftime('%Y', ts) AS y,
           strftime('%Y-%m', ts) AS ym,
           strftime('%H:%M:%S', ts) AS hms,
           strftime('%I%p', ts) AS hr12,
           strftime('%P', ts) AS ampm_lc,
           strftime('%e', ts) AS dom_sp,
           strftime('%j', ts) AS doy,
           strftime('%w', ts) AS dow,
           strftime('%U', ts) AS wk_sun,
           strftime('%W', ts) AS wk_mon,
           strftime('%Y-W%W', ts) AS yw,
           strftime('%V', ts) AS wk_iso,
           strftime('%G', ts) AS yr_iso,
           strftime('%u', ts) AS dow_iso,
           strftime('%s', ts) AS epoch_s,
           strftime('%J', ts) AS jd_str,
           unixepoch(ts) AS epoch_i,
           date(ts) AS d,
           date(ts, 'start of month') AS som,
           date(ts, '+7 days') AS plus7,
           date(ts, '-1 months') AS minus1m,
           date(ts, 'weekday 1') AS next_mon,
           time(ts) AS tm,
           datetime(ts, '+1 days', '+2 hours') AS shifted,
           datetime(1700000000 + event_id, 'unixepoch') AS from_epoch,
           date(1700000000 + event_id, 'unixepoch', '+1 days') AS from_epoch_p1,
           date(julianday(ts) + 30) AS jd_plus30,
           datetime(julianday(ts)) AS jd_roundtrip
         FROM events ORDER BY event_id""",

    // JSON1 MUTATION surface (json_set / insert / replace / remove /
    // type / quote / patch) — Spark has no JSON editors at all; these
    // resolve to the native graft.functions.SqliteJson expressions
    // (raw-token-preserving tree, SQLite edit semantics pinned in
    // SqliteJsonSpec against real SQLite 3.40). The oracle states the
    // expected documents by string surgery over the same props
    // column, so a green row proves the edit semantics end-to-end.
    "fn_json_modify" ->
      """SELECT event_id,
           json_set(props, '$.e', event_id) AS set_e,
           json_set(props, '$.k', event_type) AS set_k,
           json_insert(props, '$.k', 99) AS ins_noop,
           json_replace(props, '$.k', event_id) AS repl_k,
           json_remove(props, '$.k') AS rm_k,
           json_type(props) AS t_doc,
           json_type(props, '$.k') AS t_k,
           json_type(props, '$.zz') AS t_missing,
           json_quote(event_type) AS q_type,
           json_patch(props, '{"k":null,"p":1}') AS patched
         FROM events ORDER BY event_id LIMIT 2000""",

    // the table-valued json_each in SQLite's idiomatic comma form —
    // the translator inserts the LATERAL Spark requires, the
    // generator (functions.SqliteJsonEachGen) supplies the rows
    "fn_json_each_tvf" ->
      """SELECT event_id, je.key AS k, je.value AS v, je.type AS ty,
           je.atom AS atom, je.fullkey AS fk, je.path AS p
         FROM events, json_each(events.props) je
         ORDER BY event_id LIMIT 2000""",

    // NON-ROOT path arguments through both TVFs (row shape verified
    // against sqlite 3.40.1 verbatim): json_tree('…','$.a') reports
    // the parent prefix as the root row's path with the key step in
    // fullkey, and json_each('…','$[#-1]') carries the argument
    // verbatim with a NULL key for the scalar target — the exact
    // columns that silently echoed the raw path before round 8
    "fn_json_tree_path" ->
      """SELECT event_id,
           jt.key AS tk, jt.value AS tv, jt.type AS tty,
           jt.fullkey AS tfk, jt.path AS tp,
           je.key AS ek, je.value AS ev, je.fullkey AS efk, je.path AS ep
         FROM events
         CROSS JOIN json_tree('{"a":{"b":' || (event_id % 5) || '}}', '$.a') jt
         CROSS JOIN json_each('[5,' || (event_id % 7) || ']', '$[#-1]') je
         ORDER BY event_id, tfk, efk LIMIT 2000""",

    // SQLite storage-class introspection over typed lake columns —
    // typeof() answers with SQLite's class names ('integer', 'real',
    // 'text', 'null'), never Spark's; the mixed column exercises the
    // per-row null guard
    "fn_typeof" ->
      """SELECT c_custkey,
           typeof(c_custkey) AS t_int,
           typeof(c_name) AS t_text,
           typeof(c_acctbal) AS t_real,
           typeof(NULL) AS t_null,
           typeof(iif(c_custkey % 2 = 0, NULL, c_name)) AS t_mixed
         FROM customer ORDER BY c_custkey""",

    "fn_cond_iif" ->
      """SELECT c_custkey,
           iif(c_acctbal < 0, 'neg', 'pos') AS sgn,
           iif(c_acctbal < 0, iif(c_custkey % 2 = 0, 'ne', 'no'), 'p') AS nested,
           unicode(substr(c_name, 1, 1)) AS first_cp,
           char(71, 79) AS go_str,
           printf('%s:%d', c_mktsegment, c_custkey) AS tagged,
           max(c_acctbal, 0.0) AS pos_bal,
           min(c_custkey, 100) AS capped_id,
           CAST(c_custkey AS TEXT) AS id_str
         FROM customer ORDER BY c_custkey""",

    "agg_group_concat_fn" ->
      """SELECT l_returnflag,
           group_concat(DISTINCT l_linestatus) AS statuses,
           group_concat(l_linestatus, '|') AS all_statuses,
           string_agg(l_linestatus, '/') AS sa,
           total(l_quantity) AS tq
         FROM lineitem GROUP BY l_returnflag
         ORDER BY l_returnflag""",

    // string functions whose Spark twins silently differ: 2-arg
    // ltrim/rtrim/trim take (trimStr, src) in Spark — swapped operands,
    // wrong VALUES without translation, not an error; printf's Java
    // Formatter throws on %f-with-DECIMAL and %i; concat propagates
    // NULL where SQLite skips it; glob()'s function form doesn't exist in Spark at all
    "fn_text_sqlite" ->
      """SELECT c_custkey,
           ltrim(c_name, 'Customer#') AS id_digits,
           rtrim(c_name, '0123456789') AS name_prefix,
           trim(c_mktsegment, 'AEIOU') AS seg_trim,
           printf('%s has %.2f', c_name, c_acctbal) AS msg,
           printf('%08d|%x', c_custkey, c_custkey) AS padded,
           concat(c_name, NULL, '!') AS bang,
           iif(glob('Customer#*', c_name), 1, 0) AS is_cust,
           soundex(c_mktsegment) AS seg_sdx
         FROM customer ORDER BY c_custkey""",

    // SQLite trunc() is numeric where Spark's trunc() is date-only —
    // silently invalid without translation. log10/2-arg log are valid
    // in BOTH dialects and pass through; ambiguous 1-arg log (SQLite
    // base-10 vs Spark natural) is deliberately NOT rewritten — see
    // SqlDialect. round() wraps the transcendentals for cross-engine
    // parity and itself exercises nested-call rewriting.
    "fn_math_sqlite" ->
      """SELECT l_orderkey, l_linenumber,
           round(log10(l_quantity + 1), 6) AS lg,
           round(log(2, l_quantity + 1), 6) AS lg2,
           trunc(l_extendedprice) AS tr,
           trunc(-l_extendedprice) AS trn
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, lg, tr LIMIT 2000""",

    // SQLite LIKE folds ASCII case (its documented default) where
    // Spark's LIKE does not — the one dialect gap that silently
    // returned DIFFERENT ROWS before translation. The translated query
    // must match lowercase patterns against uppercase data, honor
    // NOT LIKE / ESCAPE composition, and apply COLLATE NOCASE to an
    // equality. c_mktsegment values are uppercase ('BUILDING',
    // 'AUTOMOBILE'); a case-sensitive engine returns zero rows here.
    "filter_like_sqlite" ->
      """SELECT c_custkey, c_name, c_mktsegment
         FROM customer
         WHERE (c_mktsegment LIKE 'build%'
                OR c_mktsegment = 'automobile' COLLATE NOCASE)
           AND c_name NOT LIKE '%0001'
           AND c_name LIKE 'customer#%' ESCAPE '!'
         ORDER BY c_custkey""",

    // JSON1 aggregates over unique-keyed per-group rows
    "fn_json_agg" ->
      """WITH per AS (SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
                      FROM lineitem GROUP BY 1, 2)
         SELECT l_returnflag,
           json_group_array(l_linestatus) AS statuses,
           json_group_object(l_linestatus, cnt) AS status_counts
         FROM per GROUP BY l_returnflag
         ORDER BY l_returnflag""",

    // JSON1 scalar surface as a model emits it: `->` / `->>` operators
    // (bare-key and $-path forms), json_extract (single and multi
    // path), constructors, validity, and lengths — all over the
    // events.props JSON column plus inline-built JSON. Only ints,
    // strings, and booleans appear in the JSON values (doubles would
    // make the serialization engine-dependent).
    "fn_json_sqlite" ->
      """SELECT event_id,
           props ->> 'k' AS k_txt,
           json_extract(props, '$.k') AS k_ext,
           props -> 'k' AS k_json,
           ('{"s":"' || event_type || '"}') -> 's' AS s_json,
           ('{"s":"' || event_type || '"}') ->> 's' AS s_txt,
           json_valid(props) AS ok,
           json_array(event_id, event_type) AS arr,
           json_object('id', event_id, 'type', event_type) AS obj,
           json_array_length(json_array(event_id, event_type)) AS alen,
           json_extract(props, '$.k', '$.zz') AS multi
         FROM events ORDER BY event_id LIMIT 2000""",

    // SQLite value-rendering functions: hex() over the value's BLOB
    // rendering (text → UTF-8 bytes, numerics → their TEXT rendering —
    // Spark's own hex(25) answers '19' where SQLite answers '3235';
    // NULL → '' not NULL), quote() as the SQL-literal rendering
    "fn_hex_quote" ->
      """SELECT c_custkey,
           hex(c_name) AS h_text,
           hex(c_custkey) AS h_int,
           quote(c_name) AS q_text,
           quote(c_acctbal) AS q_real,
           quote(NULL) AS q_null,
           hex(NULL) AS h_null
         FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey""",

    // FILTER (WHERE …) on WINDOW aggregates — standard SQL that
    // SQLite executes and Spark's parser rejects (FILTER is
    // group-by-only there); the translator rewrites it to a
    // NULL-producing CASE inside the aggregate, which is exactly
    // FILTER's semantics. Sums/avgs rounded per cross-engine policy.
    "win_filter_clause" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
           count(*) FILTER (WHERE c_acctbal > 0)
             OVER (PARTITION BY c_mktsegment) AS n_pos,
           round(sum(c_acctbal) FILTER (WHERE c_acctbal > 0)
             OVER (PARTITION BY c_mktsegment), 4) AS pos_bal,
           round(avg(c_acctbal) FILTER (WHERE c_acctbal < 0)
             OVER (PARTITION BY c_mktsegment ORDER BY c_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS neg_run
         FROM customer ORDER BY c_custkey""",

    // SQLite's built-in RTRIM collation: compare with trailing spaces
    // ignored. The corpus has no padded columns, so padding is
    // constructed inline — each predicate only matches if the fold
    // really strips it (suffix placement, prefix placement, ORDER BY
    // operand)
    "filter_collate_rtrim" ->
      """SELECT c_custkey, c_name, c_mktsegment
         FROM customer
         WHERE (c_mktsegment || '   ') = 'BUILDING' COLLATE RTRIM
            OR c_mktsegment = 'FURNITURE  ' COLLATE RTRIM
            OR (c_mktsegment || ' ') COLLATE RTRIM = 'MACHINERY'
         ORDER BY (c_name || '  ') COLLATE RTRIM, c_custkey""",
  )

  val queries: Map[String, Q] = sqlite.map { case (k, q) =>
    val fn: Q = (s, d) => {
      Tables.registerAll(s, d)
      // through Runner.runSql — the EXACT generated-SQL path, which
      // also pins SQLite evaluation semantics (non-ANSI: 1/0 and bad
      // casts yield NULL for the row, never a whole-query error); the
      // translator sees the session's case_sensitive_like state just
      // as Runner.ask threads it
      graft.exec.Runner.runSql(s, SqlDialect.translate(q,
        graft.exec.Pragma.caseSensitiveLike(s)))
    }
    k -> fn
  } ++ Map[String, Q](
    // `PRAGMA case_sensitive_like = 1` flips SQLite's LIKE to the
    // BINARY comparison — the translated query must then KEEP Spark's
    // case-sensitive LIKE instead of folding to ILIKE, and a COLLATE
    // NOCASE riding on the LIKE stays ignored (SQLite's LIKE honors
    // no collating sequences in either mode). Runs the whole
    // pragma-then-query session flow through Runner.runSql, restoring
    // the flag afterwards (keys share one session). The uppercase
    // pattern row proves sensitivity (lowercase 'build%' matches
    // nothing against 'BUILDING' — the exact rows the default mode's
    // key DOES return); the equality COLLATE NOCASE still folds.
    "filter_like_cs_sqlite" -> ((s, d) => {
      Tables.registerAll(s, d)
      graft.exec.Runner.runSql(s, "PRAGMA case_sensitive_like = 1")
      try {
        val q =
          """SELECT c_custkey, c_name, c_mktsegment
             FROM customer
             WHERE (c_mktsegment LIKE 'BUILD%'
                    OR c_mktsegment LIKE 'build%'
                    OR c_mktsegment = 'automobile' COLLATE NOCASE)
               AND c_name NOT LIKE '%0001'
             ORDER BY c_custkey"""
        graft.exec.Runner.runSql(s, SqlDialect.translate(q,
          graft.exec.Pragma.caseSensitiveLike(s)))
      } finally
        graft.exec.Runner.runSql(s, "PRAGMA case_sensitive_like = 0")
    }),
    // SQLite DML as a model emits it, driven end-to-end through the
    // translator + Runner routing: INSERT OR REPLACE rewrites onto the
    // copy-on-write upsert (graft.exec.Upsert) — one statement that
    // both REPLACES existing keys (every even nation, renamed) and
    // APPENDS new ones (keys+100), then the post-statement table state
    // is read back. A dedicated working view is used so the mutation
    // never re-binds the shared `nation` view other keys read.
    // CREATE TRIGGER end-to-end (exec.Triggers): an UPDATE OF … WHEN
    // audit trigger and a DELETE audit trigger fire set-based over the
    // affected-row slices; DROP TRIGGER stops the firing; the final
    // audit table is plain-SQL-derivable, so the DuckDB oracle states
    // it directly. The whole session flow — column-def CREATE, CTAS,
    // CREATE TRIGGER, triggering DML, DROP — runs through Runner.
    "ddl_create_trigger_sql" -> ((s, d) => {
      Tables.registerAll(s, d)
      def run(q: String) =
        graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP TABLE IF EXISTS graft_trg_work") // also drops its triggers
      run("DROP TABLE IF EXISTS graft_trg_audit")
      run("""CREATE TABLE graft_trg_work AS
             SELECT n_nationkey AS k, n_name AS name FROM nation""")
      run("CREATE TABLE graft_trg_audit (ev TEXT, k INTEGER)")
      run("""CREATE TRIGGER graft_trg_upd AFTER UPDATE OF name
             ON graft_trg_work WHEN NEW.k % 2 = 0 BEGIN
               INSERT INTO graft_trg_audit VALUES ('upd', NEW.k);
               INSERT INTO graft_trg_audit VALUES ('old', OLD.k);
             END""")
      run("""CREATE TRIGGER graft_trg_del AFTER DELETE ON graft_trg_work
             BEGIN INSERT INTO graft_trg_audit VALUES ('del', OLD.k); END""")
      run("UPDATE graft_trg_work SET name = name || '!' WHERE k < 10")
      run("DELETE FROM graft_trg_work WHERE k >= 20")
      run("DROP TRIGGER graft_trg_del")
      run("DELETE FROM graft_trg_work WHERE k = 15") // fires nothing
      run("""SELECT ev, k FROM graft_trg_audit ORDER BY ev, k""")
    }),

    // INSTEAD OF triggers make a view writable: INSERT/UPDATE/DELETE
    // against the view route through its trigger program, the base
    // stays untouched. The audit end state is closed-form, so the key
    // is fully oracle-verified even though DuckDB has no triggers.
    "ddl_instead_of_trigger_sql" -> ((s, d) => {
      Tables.registerAll(s, d)
      def run(q: String) =
        graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP VIEW IF EXISTS graft_iot_v")
      run("DROP TABLE IF EXISTS graft_iot_base")
      run("DROP TABLE IF EXISTS graft_iot_audit")
      run("""CREATE TABLE graft_iot_base AS
             SELECT n_nationkey AS k, n_name AS name FROM nation""")
      run("CREATE TABLE graft_iot_audit (ev TEXT, k INTEGER)")
      run("""CREATE VIEW graft_iot_v AS
             SELECT k, name FROM graft_iot_base WHERE k < 20""")
      run("""CREATE TRIGGER graft_iot_ins INSTEAD OF INSERT
             ON graft_iot_v BEGIN
               INSERT INTO graft_iot_audit VALUES ('ins', NEW.k); END""")
      run("""CREATE TRIGGER graft_iot_upd INSTEAD OF UPDATE OF name
             ON graft_iot_v WHEN OLD.k % 2 = 0 BEGIN
               INSERT INTO graft_iot_audit VALUES ('upd', OLD.k); END""")
      run("""CREATE TRIGGER graft_iot_del INSTEAD OF DELETE
             ON graft_iot_v BEGIN
               INSERT INTO graft_iot_audit VALUES ('del', OLD.k); END""")
      run("INSERT INTO graft_iot_v VALUES (101, 'new'), (102, 'newer')")
      run("UPDATE graft_iot_v SET name = name || '!' WHERE k < 6")
      run("DELETE FROM graft_iot_v WHERE k >= 18")
      // the 'cnt' row proves the base stayed untouched
      run("""SELECT ev, k FROM graft_iot_audit
             UNION ALL SELECT 'cnt', (SELECT count(*) FROM graft_iot_v)
             ORDER BY ev, k""")
    }),

    // RAISE(ABORT) end-to-end (exec.Triggers + exec.Atomic): a
    // validation trigger aborts the violating batch WHOLE — the DML
    // and the audit row its body wrote before the raise both roll
    // back (copy-on-write binding restore), and the surfaced error is
    // exactly the raise message. The post-session state is
    // closed-form, so the key is fully oracle-verified even though
    // DuckDB has no triggers.
    "ddl_raise_trigger_sql" -> ((s, d) => {
      Tables.registerAll(s, d)
      def run(q: String) =
        graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP TABLE IF EXISTS graft_rz_work") // also drops its trigger
      run("DROP TABLE IF EXISTS graft_rz_audit")
      run("""CREATE TABLE graft_rz_work AS
             SELECT n_nationkey AS k, n_name AS name FROM nation""")
      run("CREATE TABLE graft_rz_audit (ev TEXT, k INTEGER)")
      run("""CREATE TRIGGER graft_rz_guard BEFORE INSERT ON graft_rz_work
             BEGIN
               INSERT INTO graft_rz_audit VALUES ('try', NEW.k);
               SELECT RAISE(ABORT, 'negative key') WHERE NEW.k < 0;
             END""")
      val msg =
        try {
          run("INSERT INTO graft_rz_work VALUES (100, 'ok'), (-1, 'bad')")
          "no-error"
        } catch { case e: graft.functions.GraftRaiseAbort => e.getMessage }
      run("INSERT INTO graft_rz_work VALUES (200, 'fine')") // no violation
      run(s"""SELECT ev, k FROM graft_rz_audit
             UNION ALL SELECT 'cnt', (SELECT count(*) FROM graft_rz_work)
             UNION ALL SELECT 'err',
               ${if (msg == "negative key") 1 else 0}
             ORDER BY ev, k""")
    }),

    "sink_upsert_sql" -> ((s, d) => {
      Tables.t(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .createOrReplaceTempView("graft_upsert_sql_t")
      val dml =
        """INSERT OR REPLACE INTO graft_upsert_sql_t
             (n_nationkey, n_name, n_regionkey)
           SELECT n_nationkey, 'UPD_' || n_name, n_regionkey
             FROM graft_upsert_sql_t WHERE n_nationkey % 2 = 0
           UNION ALL
           SELECT n_nationkey + 100, n_name, n_regionkey
             FROM graft_upsert_sql_t WHERE n_nationkey < 5"""
      graft.exec.Runner.runSql(s, SqlDialect.translate(dml))
        .orderBy("n_nationkey")
    }),

    // plain INSERT INTO (no OR REPLACE) as SQLite executes it against
    // a no-PRIMARY-KEY table: a pure APPEND — the inserted rows
    // include an id that already exists, and BOTH rows must survive
    // (the upsert path would have replaced it)
    "sink_insert_sql" -> ((s, d) => {
      Tables.t(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .createOrReplaceTempView("graft_insert_sql_t")
      val dml =
        """INSERT INTO graft_insert_sql_t (n_nationkey, n_name, n_regionkey)
           SELECT n_nationkey + 200, 'NEW_' || n_name, n_regionkey
             FROM graft_insert_sql_t WHERE n_nationkey < 3
           UNION ALL
           SELECT n_nationkey, 'DUP_' || n_name, n_regionkey
             FROM graft_insert_sql_t WHERE n_nationkey = 0"""
      graft.exec.Runner.runSql(s, SqlDialect.translate(dml))
        .orderBy("n_nationkey", "n_name")
    }),

    // SQLite's upsert clause end-to-end: DO NOTHING skips conflicting
    // keys, OR IGNORE implies the same action, and the second
    // statement sequences against the first's re-bound state (401
    // exists only because statement 1 appended it)
    "sink_insert_ignore_sql" -> ((s, d) => {
      Tables.t(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .createOrReplaceTempView("graft_ignore_sql_t")
      graft.exec.Runner.runSql(s, SqlDialect.translate(
        """INSERT OR IGNORE INTO graft_ignore_sql_t
           SELECT n_nationkey, 'IGN_' || n_name, n_regionkey
             FROM graft_ignore_sql_t WHERE n_nationkey < 5
           UNION ALL
           SELECT n_nationkey + 400, 'NEW_' || n_name, n_regionkey
             FROM graft_ignore_sql_t WHERE n_nationkey < 2"""))
      graft.exec.Runner.runSql(s, SqlDialect.translate(
        """INSERT INTO graft_ignore_sql_t
           SELECT n_nationkey, 'CONF_' || n_name, n_regionkey
             FROM graft_ignore_sql_t WHERE n_nationkey IN (1, 401)
           UNION ALL
           SELECT n_nationkey + 500, n_name, n_regionkey
             FROM graft_ignore_sql_t WHERE n_nationkey = 3
           ON CONFLICT DO NOTHING"""))
      s.table("graft_ignore_sql_t").orderBy("n_nationkey")
    }),

    // ON CONFLICT (key) DO UPDATE with excluded.* scoping and a
    // conditional WHERE gate: conflicting even keys update (old row
    // bare, incoming as excluded), odd keys keep the old row, new
    // keys append — one statement driving the whole MERGE surface
    "sink_upsert_conflict_sql" -> ((s, d) => {
      Tables.t(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .createOrReplaceTempView("graft_conflict_sql_t")
      graft.exec.Runner.runSql(s, SqlDialect.translate(
        """INSERT INTO graft_conflict_sql_t (n_nationkey, n_name, n_regionkey)
           SELECT n_nationkey, 'X_' || n_name, n_regionkey + 100
             FROM graft_conflict_sql_t WHERE n_nationkey < 10
           UNION ALL
           SELECT n_nationkey + 300, n_name, n_regionkey
             FROM graft_conflict_sql_t WHERE n_nationkey < 3
           ON CONFLICT (n_nationkey) DO UPDATE
             SET n_name = excluded.n_name || '/' || n_name,
                 n_regionkey = n_regionkey + excluded.n_regionkey
           WHERE n_nationkey % 2 = 0"""))
        .orderBy("n_nationkey")
    }),

    // SQLite UPDATE as a model emits it (pandasqlite.py:245-247 runs
    // it verbatim) — two sequential statements through the full
    // Runner path: a conditional multi-assignment rewrite, then a
    // lenient-cast assignment whose miss must yield NULL (the non-ANSI
    // window — under ANSI the second statement would ERROR, so a green
    // row also proves evaluation semantics held on the DML path)
    "sink_update_sql" -> ((s, d) => {
      Tables.t(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .createOrReplaceTempView("graft_update_sql_t")
      graft.exec.Runner.runSql(s, SqlDialect.translate(
        """UPDATE graft_update_sql_t
             SET n_name = 'UPD_' || n_name, n_regionkey = n_regionkey + 10
           WHERE n_nationkey % 2 = 0"""))
      graft.exec.Runner.runSql(s, SqlDialect.translate(
        """UPDATE graft_update_sql_t
             SET n_regionkey = CAST(substr(n_name, 1, 2) AS INTEGER)
           WHERE n_nationkey = 1"""))
      s.table("graft_update_sql_t").orderBy("n_nationkey")
    }),

    // SQLite DELETE with a self-referential WHERE subquery: the
    // predicate reads the OLD table state (the copy-on-write rewrite
    // resolves the whole statement against one binding)
    "sink_delete_sql" -> ((s, d) => {
      Tables.t(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .createOrReplaceTempView("graft_delete_sql_t")
      graft.exec.Runner.runSql(s, SqlDialect.translate(
        """DELETE FROM graft_delete_sql_t
           WHERE n_regionkey IN (SELECT n_regionkey
                                 FROM graft_delete_sql_t
                                 WHERE n_nationkey >= 22)"""))
      s.table("graft_delete_sql_t").orderBy("n_nationkey")
    }),

    // SQLite's implicit rowid, addressed the way models actually use
    // it — the classic keep-first dedup idiom. The fixture plants
    // duplicate contents (50 re-keyed copies appended after the
    // originals, single partition in doc_id order so rowid 1..N is
    // deterministic); the DELETE keeps MIN(rowid) per content, i.e.
    // the original rows. Runs through [[graft.exec.Rowid]]: lazy
    // enablement, alias normalization, star hiding.
    "fn_rowid_dedup" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.t(s, d, "documents")
        .select("doc_id", "text", "lang").where(col("doc_id") < 200)
      val dups = docs.where(col("doc_id") < 50)
        .select((col("doc_id") + 1000).as("doc_id"), col("text"),
          col("lang"))
      docs.unionAll(dups).repartition(1).sortWithinPartitions("doc_id")
        .createOrReplaceTempView("graft_rowid_dedup_t")
      graft.exec.Runner.runSql(s, SqlDialect.translate(
        """DELETE FROM graft_rowid_dedup_t
           WHERE rowid NOT IN (SELECT MIN(rowid)
                               FROM graft_rowid_dedup_t
                               GROUP BY text)"""))
      graft.exec.Runner.runSql(s, SqlDialect.translate(
        """SELECT doc_id, text, lang FROM graft_rowid_dedup_t
           ORDER BY doc_id"""))
    }),

    // rowid as a first-class SELECT surface: projection, predicate
    // arithmetic, ordering — the emulated column must number 1..N in
    // the fixture's row order to hash-match the oracle's row_number
    "fn_rowid_select" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      Tables.t(s, d, "documents")
        .select("doc_id", "lang").where(col("doc_id") < 300)
        .repartition(1).sortWithinPartitions("doc_id")
        .createOrReplaceTempView("graft_rowid_sel_t")
      graft.exec.Runner.runSql(s, SqlDialect.translate(
        """SELECT rowid, doc_id, lang FROM graft_rowid_sel_t
           WHERE rowid % 3 = 1 ORDER BY rowid"""))
    }),

    // the DML LIMIT form (SQLITE_ENABLE_UPDATE_DELETE_LIMIT — enabled
    // in the Python-bundled SQLite the reference runs on): delete the
    // 2nd and 3rd highest keys of region 2 — ORDER BY + LIMIT + OFFSET
    // together, deterministic because n_nationkey is unique
    "sink_delete_limit_sql" -> ((s, d) => {
      Tables.t(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .createOrReplaceTempView("graft_dellim_t")
      graft.exec.Runner.runSql(s, SqlDialect.translate(
        """DELETE FROM graft_dellim_t WHERE n_regionkey = 2
           ORDER BY n_nationkey DESC LIMIT 2 OFFSET 1"""))
      s.table("graft_dellim_t").orderBy("n_nationkey")
    }),

    // SQLite's UPDATE-FROM join form (3.33+, lang_update.html §2):
    // enrich the target from a joined source — the assignment reads
    // BOTH the old target row and the joined row. The region side is
    // unique per key, so the many-to-one join is deterministic and
    // oracle-expressible in closed form; unmatched rows (odd keys)
    // stay untouched.
    "sink_update_from_sql" -> ((s, d) => {
      Tables.t(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .createOrReplaceTempView("graft_updfrom_t")
      Tables.t(s, d, "region")
        .select("r_regionkey", "r_name")
        .createOrReplaceTempView("graft_updfrom_r")
      graft.exec.Runner.runSql(s, SqlDialect.translate(
        """UPDATE graft_updfrom_t
             SET n_name = n_name || '@' || r_name
           FROM graft_updfrom_r
           WHERE graft_updfrom_t.n_regionkey = graft_updfrom_r.r_regionkey
             AND n_nationkey % 2 = 0"""))
      s.table("graft_updfrom_t").orderBy("n_nationkey")
    }),

    // INSERT … RETURNING (SQLite 3.35): the statement's RESULT is the
    // affected slice with final values — here an OR IGNORE where one
    // incoming row conflicts (dropped from the result) and the rest
    // append with NULL-padded unlisted columns
    "sink_insert_returning_sql" -> ((s, d) => {
      Tables.t(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .createOrReplaceTempView("graft_insret_t")
      graft.exec.Runner.runSql(s, SqlDialect.translate(
        """INSERT OR IGNORE INTO graft_insret_t (n_nationkey, n_name)
           SELECT n_nationkey + 600, 'RET_' || n_name
             FROM graft_insret_t WHERE n_nationkey < 4
           UNION ALL
           SELECT n_nationkey, n_name FROM graft_insret_t
            WHERE n_nationkey = 2
           RETURNING n_nationkey, n_name, n_regionkey"""))
        .orderBy("n_nationkey")
    }),

    // session DDL with column definitions: an empty typed table whose
    // declared (non-leading!) PRIMARY KEY drives later upsert
    // resolution — SQLite's own rule, not the leading-column
    // convention for constraint-less ingested tables
    "ddl_create_table_sql" -> ((s, d) => {
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP TABLE IF EXISTS graft_ddl_ct")
      run("""CREATE TABLE graft_ddl_ct (
              label TEXT NOT NULL, k INTEGER PRIMARY KEY, score REAL)""")
      run("INSERT INTO graft_ddl_ct VALUES ('a', 1, 1.5), ('b', 2, 2.5)")
      run("INSERT OR REPLACE INTO graft_ddl_ct VALUES ('B', 2, 9.0), ('c', 3, 3.5)")
      s.table("graft_ddl_ct").orderBy("k")
    }),

    // CREATE UNIQUE INDEX declares the conflict key (n_name, not the
    // leading n_nationkey) that the following OR REPLACE resolves
    // against; the plain index is a registered no-op (SQLite: indexes
    // never change results)
    "ddl_create_index_sql" -> ((s, d) => {
      Tables.t(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .createOrReplaceTempView("graft_ddl_ix_t")
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP INDEX IF EXISTS graft_ddl_ix")
      run("DROP INDEX IF EXISTS graft_ddl_ix_plain")
      run("CREATE INDEX graft_ddl_ix_plain ON graft_ddl_ix_t (n_regionkey)")
      run("CREATE UNIQUE INDEX graft_ddl_ix ON graft_ddl_ix_t (n_name)")
      run("""INSERT OR REPLACE INTO graft_ddl_ix_t
             SELECT n_nationkey + 700, n_name, n_regionkey + 50
               FROM graft_ddl_ix_t WHERE n_nationkey < 5""")
      // drop so reruns in a shared session start clean
      run("DROP INDEX graft_ddl_ix")
      run("DROP INDEX graft_ddl_ix_plain")
      s.table("graft_ddl_ix_t").orderBy("n_nationkey")
    }),

    // SQLite changes() after executed DML: the count of rows the most
    // recent INSERT/UPDATE/DELETE touched (recorded lazily by the
    // copy-on-write executors — exec.SessionChanges; a natural model
    // follow-up to "remove the X rows"). changes() is statement-scoped
    // so the key is deterministic in a shared session; total_changes()
    // (session-cumulative) is spec-covered as a before/after delta.
    "fn_changes_sql" -> ((s, d) => {
      import s.implicits._
      Tables.t(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .createOrReplaceTempView("graft_chg_t")
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DELETE FROM graft_chg_t WHERE n_regionkey = 2")
      val del = run("SELECT changes() AS n").first().getLong(0)
      run("UPDATE graft_chg_t SET n_name = n_name || '!' WHERE n_nationkey < 10")
      val upd = run("SELECT changes() AS n").first().getLong(0)
      Seq((del, upd)).toDF("del_n", "upd_n")
    }),

    // declared column DEFAULTs end-to-end: partial-column INSERTs
    // fill the registered default (literal and parenthesized-
    // expression forms), fully-listed rows don't — SQLite's rule
    // `INSERT INTO t DEFAULT VALUES` (SQLite): one full-default row
    // per statement; listed-column inserts still fill the rest from
    // their declared defaults
    "sink_insert_default_sql" -> ((s, d) => {
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP TABLE IF EXISTS graft_dv_t")
      run("""CREATE TABLE graft_dv_t (k INTEGER DEFAULT 5,
             tag TEXT DEFAULT 'n/a', score REAL DEFAULT (2 + 0.5))""")
      run("INSERT INTO graft_dv_t DEFAULT VALUES")
      run("INSERT INTO graft_dv_t DEFAULT VALUES")
      run("INSERT INTO graft_dv_t (k, tag) VALUES (9, 'x')")
      s.table("graft_dv_t").orderBy("k", "tag", "score")
    }),

    // UNIQUE / PRIMARY KEY enforcement end-to-end: OR REPLACE
    // displaces on BOTH declared keys at once, OR IGNORE skips a
    // second-key conflict, bare DO NOTHING appends a clean row —
    // error paths (plain-INSERT duplicates, re-keying UPDATEs,
    // DO-UPDATE collisions, batch dups) pinned in UniqueSpec
    "ddl_unique_sql" -> ((s, d) => {
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP TABLE IF EXISTS graft_un_t")
      run("CREATE TABLE graft_un_t (a INT PRIMARY KEY, b TEXT UNIQUE, v INT)")
      run("INSERT INTO graft_un_t VALUES (1, 'x', 10), (2, 'y', 20)")
      run("INSERT OR REPLACE INTO graft_un_t VALUES (2, 'x', 30)")
      run("INSERT OR IGNORE INTO graft_un_t VALUES (3, 'x', 40), (4, 'w', 50)")
      run("INSERT INTO graft_un_t VALUES (5, 'z', 60) ON CONFLICT DO NOTHING")
      s.table("graft_un_t").orderBy("a")
    }),

    // EXPRESSION unique index end-to-end: registers at CREATE INDEX,
    // enforces over the expression, and drives OR REPLACE displacement
    // and OR IGNORE skips (error text `UNIQUE constraint failed:
    // index 'name'` pinned in UniqueSpec)
    "ddl_expr_index_sql" -> ((s, d) => {
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP TABLE IF EXISTS graft_exi_t")
      run("DROP INDEX IF EXISTS graft_exi_ux")
      run("CREATE TABLE graft_exi_t (a TEXT, v INT)")
      run("CREATE UNIQUE INDEX graft_exi_ux ON graft_exi_t (lower(a))")
      run("INSERT INTO graft_exi_t VALUES ('Hello', 1)")
      run("INSERT OR REPLACE INTO graft_exi_t VALUES ('HELLO', 2)")
      run("INSERT OR IGNORE INTO graft_exi_t VALUES ('hello', 3), ('World', 4)")
      run("DROP INDEX graft_exi_ux")
      s.table("graft_exi_t").orderBy("v")
    }),

    // row-value SUBQUERY SET end-to-end: per-column correlated scalar
    // subqueries, each reading the OLD row (SqlDmlSpec pins the
    // no-match-NULL and FROM-less-swap edges against sqlite3)
    "sink_update_rowvalue_sql" -> ((s, d) => {
      Tables.t(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .createOrReplaceTempView("graft_rv_t")
      Tables.t(s, d, "region")
        .select("r_regionkey", "r_name")
        .createOrReplaceTempView("graft_rv_r")
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("""UPDATE graft_rv_t SET (n_name, n_regionkey) =
               (SELECT upper(r_name), n_regionkey + 100 FROM graft_rv_r
                WHERE graft_rv_r.r_regionkey = graft_rv_t.n_regionkey)
             WHERE n_nationkey < 10""")
      s.table("graft_rv_t").orderBy("n_nationkey")
    }),

    // Targeted expression / partial-index ON CONFLICT end-to-end: the
    // (lower(email)) target matches the declared expression index and
    // drives DO UPDATE; the (a) WHERE b > 0 target matches the partial
    // index — in-scope rows update, out-of-scope incoming rows append
    // (UniqueSpec pins the no-match error form against sqlite3)
    "sink_upsert_target_sql" -> ((s, d) => {
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP TABLE IF EXISTS graft_uct_t")
      run("CREATE TABLE graft_uct_t (id INT, email TEXT)")
      run("CREATE UNIQUE INDEX graft_uct_ux ON graft_uct_t (lower(email))")
      run("INSERT INTO graft_uct_t VALUES (1,'A@x.com'), (2,'b@y.com')")
      run("""INSERT INTO graft_uct_t VALUES (3,'a@X.COM'), (4,'c@z.org')
             ON CONFLICT (lower(email))
             DO UPDATE SET id = excluded.id + 100""")
      run("""INSERT INTO graft_uct_t VALUES (5,'B@Y.COM')
             ON CONFLICT (lower(email)) DO NOTHING""")
      run("DROP TABLE IF EXISTS graft_uct_p")
      run("CREATE TABLE graft_uct_p (a INT, b INT)")
      run("CREATE UNIQUE INDEX graft_uct_pux ON graft_uct_p (a) WHERE b > 0")
      run("INSERT INTO graft_uct_p VALUES (1, 5), (1, -1)")
      run("""INSERT INTO graft_uct_p VALUES (1, 7), (1, 0)
             ON CONFLICT (a) WHERE b > 0
             DO UPDATE SET b = excluded.b""")
      run("DROP INDEX graft_uct_ux")
      run("DROP INDEX graft_uct_pux")
      run("""SELECT CAST(id AS BIGINT) AS k1, email AS k2,
                    CAST(0 AS BIGINT) AS k3
             FROM graft_uct_t
             UNION ALL
             SELECT CAST(a AS BIGINT), 'p', CAST(b AS BIGINT)
             FROM graft_uct_p
             ORDER BY k1, k2, k3""")
    }),

    // SQLite 3.35 upsert-clause CHAINS end-to-end: a conflicting row
    // routes to the first clause (left to right) whose target it hits
    // and is consumed there; a trailing targetless clause covers every
    // declared key; targetless DO UPDATE resolves against whichever
    // key actually conflicted (clause-order and multi-hit edges pinned
    // in UpsertChainSpec against sqlite3 3.40.1)
    "sink_upsert_chain_sql" -> ((s, d) => {
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP TABLE IF EXISTS graft_chain_t")
      run("CREATE TABLE graft_chain_t (a INT PRIMARY KEY, b TEXT UNIQUE, v INT)")
      run("INSERT INTO graft_chain_t VALUES (1,'x',10),(2,'y',20),(3,'z',30)")
      // a-conflict updates, b-conflict skips, no-conflict appends
      run("""INSERT INTO graft_chain_t VALUES (1,'q',99),(4,'y',77),(5,'n',50)
             ON CONFLICT(a) DO UPDATE SET v = excluded.v
             ON CONFLICT(b) DO NOTHING""")
      // the targetless tail catches the PK conflict
      run("""INSERT INTO graft_chain_t VALUES (2,'m',60)
             ON CONFLICT(b) DO NOTHING
             ON CONFLICT DO UPDATE SET v = excluded.v""")
      // single targetless DO UPDATE resolves through the b key
      run("""INSERT INTO graft_chain_t VALUES (9,'z',111)
             ON CONFLICT DO UPDATE SET v = excluded.v""")
      run("""SELECT CAST(a AS BIGINT) AS a, b, CAST(v AS BIGINT) AS v
             FROM graft_chain_t ORDER BY a""")
    }),

    // UPDATE OR REPLACE end-to-end: a re-keyed row DELETES the row it
    // collides with and completes (PK displacement), an assigned NULL
    // in a NOT NULL column takes the declared DEFAULT, and two rows
    // re-keyed onto one key resolve to a single winner (fixture chosen
    // so the engine's deterministic stand-in equals sqlite3's
    // rowid-order outcome — UniqueSpec pins the edges)
    // UPDATE OR IGNORE on a unique-keyed table — the set-expressible
    // skip (exec.Mutate.runUpdateIgnoreKeys): a row re-keyed onto an
    // occupied key is skipped (keeps its old values), a row re-keyed
    // onto a free key applies; changes()/RETURNING cover only applied
    // rows. Values pinned against sqlite3 running the identical
    // statements (UniqueSpec); intra-statement collision chains
    // decline named (rowid-order dependent, measured).
    "sink_update_ignore_sql" -> ((s, d) => {
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP TABLE IF EXISTS graft_updign_t")
      run("CREATE TABLE graft_updign_t (a INT PRIMARY KEY, b TEXT)")
      run("INSERT INTO graft_updign_t VALUES (1,'x'), (2,'y'), (3,'z'), (4,'w')")
      run("UPDATE OR IGNORE graft_updign_t SET a = 2 WHERE a = 1")
      val applied = run(
        "UPDATE OR IGNORE graft_updign_t SET a = 9 WHERE a = 3 RETURNING a")
      val changed = run("SELECT changes() AS n")
      run("""SELECT CAST(a AS BIGINT) AS a, b,
             CAST((SELECT count(*) FROM graft_updign_t) AS BIGINT) AS total
             FROM graft_updign_t""")
        .crossJoin(applied.selectExpr("CAST(a AS BIGINT) AS applied_key"))
        .crossJoin(changed.selectExpr("CAST(n AS BIGINT) AS n_changed"))
        .orderBy("a")
    }),

    "sink_update_replace_sql" -> ((s, d) => {
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP TABLE IF EXISTS graft_updrep_t")
      run("""CREATE TABLE graft_updrep_t (a INT PRIMARY KEY, b TEXT,
             c INT NOT NULL DEFAULT 5)""")
      run("""INSERT INTO graft_updrep_t VALUES
             (1,'x',10), (2,'y',20), (3,'z',30), (4,'w',40)""")
      run("UPDATE OR REPLACE graft_updrep_t SET a = 2 WHERE a = 1")
      run("UPDATE OR REPLACE graft_updrep_t SET c = NULL WHERE a = 3")
      run("UPDATE OR REPLACE graft_updrep_t SET a = 9 WHERE a IN (2, 3)")
      run("""SELECT CAST(a AS BIGINT) AS a, b, CAST(c AS BIGINT) AS c
             FROM graft_updrep_t ORDER BY a""")
    }),

    // PRAGMA recursive_triggers = ON end-to-end: a self-inserting
    // trigger recurses level-by-level over the affected slices to
    // SQLite's exact multiset — (1),(2) chained under WHEN x < 4
    // yields 1,2,2,3,3,4,4 (measured; depth bounded at SQLite's 1000
    // with its error text, edges pinned in TriggerSpec)
    "ddl_recursive_trigger_sql" -> ((s, d) => {
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP TABLE IF EXISTS graft_rectr_t")
      run("CREATE TABLE graft_rectr_t (x INTEGER)")
      run("""CREATE TRIGGER IF NOT EXISTS graft_rectr_tr
             AFTER INSERT ON graft_rectr_t WHEN NEW.x < 4
             BEGIN INSERT INTO graft_rectr_t VALUES (NEW.x + 1); END""")
      run("PRAGMA recursive_triggers = ON")
      try run("INSERT INTO graft_rectr_t VALUES (1), (2)")
      finally run("PRAGMA recursive_triggers = 0")
      run("DROP TRIGGER graft_rectr_tr")
      s.table("graft_rectr_t").orderBy("x")
    }),

    // column-DECLARED collations end-to-end: NOCASE folds bare `=`,
    // CASE-WHEN comparisons, and GROUP BY; RTRIM ignores trailing
    // spaces — the declared rider registers at CREATE and
    // exec.Collations injects it on the query route so the dialect
    // translator's COLLATE machinery folds it (explicit-COLLATE
    // precedence and ALTER edges pinned in CollationSpec)
    "ddl_collate_sql" -> ((s, d) => {
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP TABLE IF EXISTS graft_coll_t")
      run("""CREATE TABLE graft_coll_t (k INTEGER,
             x TEXT COLLATE NOCASE, y TEXT COLLATE RTRIM)""")
      run("""INSERT INTO graft_coll_t VALUES
             (1,'Apple','pad '), (2,'apple','pad'), (3,'BANANA','q  '),
             (4,'banana','q'), (5,'cherry','r')""")
      run("""SELECT min(upper(x)) AS grp, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(CASE WHEN x = 'APPLE' THEN 1 ELSE 0 END)
                         AS BIGINT) AS eq_hits,
                    CAST(sum(CASE WHEN y = 'q' THEN 1 ELSE 0 END)
                         AS BIGINT) AS rt_hits
             FROM graft_coll_t GROUP BY x ORDER BY grp""")
    }),

    // Declared-collation propagation into IN / NOT IN / BETWEEN
    // operands (SQLite datatype3.html §7.1: every list member and both
    // bounds take the LHS column's collation) AND into the
    // IN (SELECT …) membership comparison (the translator wraps the
    // subquery as a one-column derived table and folds its result),
    // plus the canonical bare SELECT x … GROUP BY x idiom over a
    // NOCASE column — grouping and projection fold together, the
    // projected representative is the deterministic lowercased
    // stand-in. Values pinned against sqlite3 running the identical
    // statements (CollationSpec).
    "filter_collate_in" -> ((s, d) => {
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP TABLE IF EXISTS graft_collin_t")
      run("DROP TABLE IF EXISTS graft_collin_probe")
      run("""CREATE TABLE graft_collin_t (k INTEGER,
             x TEXT COLLATE NOCASE, y TEXT COLLATE RTRIM)""")
      run("""INSERT INTO graft_collin_t VALUES
             (1,'Apple','pad '), (2,'apple','pad'), (3,'BANANA','q  '),
             (4,'banana','q'), (5,'cherry','r')""")
      run("CREATE TABLE graft_collin_probe (v TEXT)")
      run("INSERT INTO graft_collin_probe VALUES ('APPLE'), ('Banana')")
      run("""SELECT x AS grp, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(CASE WHEN x IN ('APPLE','Banana')
                             THEN 1 ELSE 0 END) AS BIGINT) AS in_hits,
                    CAST(sum(CASE WHEN x NOT IN ('APPLE','Banana')
                             THEN 1 ELSE 0 END) AS BIGINT) AS notin_hits,
                    CAST(sum(CASE WHEN x BETWEEN 'B' AND 'c'
                             THEN 1 ELSE 0 END) AS BIGINT) AS btw_hits,
                    CAST(sum(CASE WHEN y IN ('pad   ')
                             THEN 1 ELSE 0 END) AS BIGINT) AS rt_in_hits,
                    CAST(sum(CASE WHEN x IN (SELECT v FROM
                             graft_collin_probe)
                             THEN 1 ELSE 0 END) AS BIGINT) AS insub_hits,
                    CAST(sum(CASE WHEN x NOT IN (SELECT v FROM
                             graft_collin_probe)
                             THEN 1 ELSE 0 END) AS BIGINT) AS notinsub_hits
             FROM graft_collin_t GROUP BY x ORDER BY grp""")
    }),

    // NOT NULL / CHECK constraint enforcement end-to-end: the fixture
    // ATTEMPTS violating writes — each must raise SQLite's exact error
    // (asserted in the catch; a non-raising write would land the row
    // and fail the post-state hash) — while OR IGNORE skips violating
    // rows and OR REPLACE substitutes the NOT NULL default. Error-text
    // and ordering edges pinned against sqlite3 in ConstraintSpec.
    "ddl_constraints_sql" -> ((s, d) => {
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      def mustFail(q: String, msg: String): Unit = {
        val e = try { run(q); null } catch { case ex: Exception => ex }
        if (e == null)
          throw new AssertionError(s"expected failure: $q")
        if (!e.getMessage.contains(msg))
          throw new AssertionError(
            s"wrong error for $q: wanted '$msg', got ${e.getMessage}")
      }
      run("DROP TABLE IF EXISTS graft_con_t")
      run("""CREATE TABLE graft_con_t (k INTEGER PRIMARY KEY,
             a INT NOT NULL DEFAULT 7, b INT CHECK (b > 0),
             c TEXT DEFAULT 'dc', CONSTRAINT amax CHECK (a < 100))""")
      run("INSERT INTO graft_con_t (k, a, b) VALUES (1, 10, 5)")
      mustFail("INSERT INTO graft_con_t (k, a, b) VALUES (2, NULL, 5)",
        "NOT NULL constraint failed: graft_con_t.a")
      mustFail("INSERT INTO graft_con_t (k, a, b) VALUES (2, 10, -1)",
        "CHECK constraint failed: b > 0")
      mustFail("INSERT INTO graft_con_t (k, a, b) VALUES (2, 200, 5)",
        "CHECK constraint failed: amax")
      mustFail("UPDATE graft_con_t SET b = -3 WHERE k = 1",
        "CHECK constraint failed: b > 0")
      // a NULL CHECK operand passes; the unlisted NOT NULL fills its
      // default; OR IGNORE skips the violating row, keeps the rest;
      // OR REPLACE substitutes the default for the NULL
      run("INSERT INTO graft_con_t (k, b) VALUES (2, NULL)")
      run("""INSERT OR IGNORE INTO graft_con_t (k, a, b)
             VALUES (3, NULL, 1), (4, 40, 4)""")
      run("INSERT OR REPLACE INTO graft_con_t (k, a, b) VALUES (1, NULL, 9)")
      s.table("graft_con_t").orderBy("k")
    }),

    // INTEGER PRIMARY KEY auto-assignment + AUTOINCREMENT
    // end-to-end: missing keys assign monotonically, the deleted max
    // is NOT reused under AUTOINCREMENT, explicit ids advance
    // sqlite_sequence, and the catalog row answers the join —
    // rename/drop/plain-table-reuse edges pinned in AutoincrementSpec
    "ddl_autoincrement_sql" -> ((s, d) => {
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP TABLE IF EXISTS graft_ainc_t")
      run("""CREATE TABLE graft_ainc_t (id INTEGER PRIMARY KEY AUTOINCREMENT,
             v TEXT)""")
      run("INSERT INTO graft_ainc_t (v) VALUES ('a'), ('b'), ('c')")
      run("DELETE FROM graft_ainc_t WHERE id = 3")
      run("INSERT INTO graft_ainc_t (v) VALUES ('d')")
      run("INSERT INTO graft_ainc_t (id, v) VALUES (100, 'e')")
      run("INSERT INTO graft_ainc_t (v) VALUES ('f')")
      run("""SELECT t.id, t.v, s.seq FROM graft_ainc_t t
             JOIN sqlite_sequence s ON s.name = 'graft_ainc_t'
             ORDER BY t.id""")
    }),

    // SQLite 3.37 STRICT + WITHOUT ROWID end-to-end: the whitelist
    // types enforce at every write with lossless-conversion coercion
    // ('12' text → 12 integer, 2.0 real → 2 integer, 7 → 7.0 real,
    // 5 → '5' text), the PK requirement and rowid suppression hold —
    // violation paths pinned against python sqlite3 in StrictTableSpec
    "ddl_strict_table_sql" -> ((s, d) => {
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP TABLE IF EXISTS graft_strict_t")
      run("""CREATE TABLE graft_strict_t (k INTEGER PRIMARY KEY,
             i INTEGER, r REAL, t TEXT) STRICT, WITHOUT ROWID""")
      run("INSERT INTO graft_strict_t VALUES (1, '  12  ', 7, 5)")
      run("INSERT INTO graft_strict_t VALUES (2, 2.0, '1.5', 'x')")
      run("UPDATE graft_strict_t SET i = '30' WHERE k = 2")
      s.table("graft_strict_t").orderBy("k")
    }),

    // SQLite generated columns end-to-end: VIRTUAL + STORED compute on
    // INSERT, recompute on UPDATE and upsert DO UPDATE, refuse direct
    // writes — the whole flow through translate-and-run
    // (GeneratedColsSpec pins the introspection + ALTER edges against
    // python sqlite3 3.40.1)
    "ddl_generated_cols_sql" -> ((s, d) => {
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP TABLE IF EXISTS graft_gen_t")
      run("""CREATE TABLE graft_gen_t (k INTEGER PRIMARY KEY, a INTEGER,
             dbl INTEGER GENERATED ALWAYS AS (a * 2) VIRTUAL,
             tag TEXT AS ('v' || a) STORED)""")
      run("INSERT INTO graft_gen_t (k, a) VALUES (1, 3), (2, 5), (3, 8)")
      run("UPDATE graft_gen_t SET a = 10 WHERE k = 2")
      run("""INSERT INTO graft_gen_t (k, a) VALUES (3, 11)
             ON CONFLICT(k) DO UPDATE SET a = excluded.a""")
      s.table("graft_gen_t").orderBy("k")
    }),

    "ddl_defaults_sql" -> ((s, d) => {
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      run("DROP TABLE IF EXISTS graft_dflt_t")
      run("""CREATE TABLE graft_dflt_t (k INTEGER PRIMARY KEY,
             tag TEXT DEFAULT 'n/a', score REAL DEFAULT (2 + 0.5))""")
      run("INSERT INTO graft_dflt_t (k) VALUES (1), (2)")
      run("INSERT INTO graft_dflt_t (k, tag, score) VALUES (3, 'x', 9.0)")
      s.table("graft_dflt_t").orderBy("k")
    }),

    // SQLite's full ALTER TABLE surface end-to-end: ADD COLUMN with a
    // default backfill, RENAME COLUMN, DROP COLUMN, RENAME TO — all
    // pure projection/metadata re-binds (no data rewrite); the final
    // state is closed-form over nation
    "ddl_alter_table_sql" -> ((s, d) => {
      Tables.t(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .createOrReplaceTempView("graft_alter_t")
      val run = (q: String) => graft.exec.Runner.runSql(s, SqlDialect.translate(q))
      // reruns in a shared session start clean (DeterminismSpec)
      run("DROP TABLE IF EXISTS graft_alter_t2")
      run("ALTER TABLE graft_alter_t ADD COLUMN src TEXT DEFAULT 'lake'")
      run("ALTER TABLE graft_alter_t RENAME COLUMN n_name TO nation_name")
      run("ALTER TABLE graft_alter_t DROP COLUMN n_regionkey")
      run("ALTER TABLE graft_alter_t RENAME TO graft_alter_t2")
      s.table("graft_alter_t2").orderBy("n_nationkey")
    }),

    // SQLite introspection as a model emits it for schema questions —
    // PRAGMA table_info through Runner (exec.Pragma renders catalog
    // rows); oracle pins the exact SQLite-shaped contract
    "meta_pragma_info" -> ((s, d) => {
      Tables.registerAll(s, d)
      graft.exec.Runner.runSql(s, "PRAGMA table_info(nation);").orderBy("cid")
    }),

    // the FOREIGN KEY declaration surface: FK clauses register at
    // CREATE TABLE and answer `PRAGMA foreign_key_list` in SQLite
    // 3.40.1's exact shape — ids in reverse declaration order, one
    // row per column of a composite key, NULL `to` for the short
    // form, declared actions, match always NONE
    "meta_foreign_keys" -> ((s, d) => {
      val R = graft.exec.Runner
      R.runSql(s, "DROP TABLE IF EXISTS fkl_child;")
      R.runSql(s, "DROP TABLE IF EXISTS fkl_parent;")
      R.runSql(s, "CREATE TABLE fkl_parent (id INTEGER PRIMARY KEY, nm TEXT)")
      R.runSql(s,
        """CREATE TABLE fkl_child (a INTEGER, b INTEGER REFERENCES fkl_parent,
           c INTEGER,
           FOREIGN KEY (a) REFERENCES fkl_parent(id)
             ON DELETE CASCADE ON UPDATE SET NULL,
           FOREIGN KEY (c, a) REFERENCES fkl_other(x, y))""")
      R.runSql(s, "PRAGMA foreign_key_list(fkl_child)").orderBy("id", "seq")
    }),

    // `PRAGMA foreign_key_check` as a DISTRIBUTED referential-integrity
    // audit over the real corpus: a curated parent key set (orders with
    // key % 3 <> 0), a child fact copy declaring the FK, and the check
    // reporting every orphaned row — one anti-join per FK, exactly the
    // orphan-detection pass a 100 TB lake runs before publishing a
    // join-dependent dataset. The child's INTEGER PRIMARY KEY aliases
    // the rowid surface, so the reported rowids are the declared rids
    // (deterministic under re-sharding); the oracle replays the same
    // anti-join in plain SQL.
    "meta_fk_check" -> ((s, d) => {
      Tables.registerAll(s, d)
      val R = graft.exec.Runner
      R.runSql(s, "DROP TABLE IF EXISTS fkq_child;")
      R.runSql(s, "DROP TABLE IF EXISTS fkq_parent;")
      R.runSql(s, "CREATE TABLE fkq_parent (k INTEGER PRIMARY KEY)")
      R.runSql(s,
        """INSERT INTO fkq_parent
           SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey % 3 <> 0""")
      R.runSql(s,
        """CREATE TABLE fkq_child (rid INTEGER PRIMARY KEY,
           ok INTEGER REFERENCES fkq_parent(k))""")
      R.runSql(s,
        """INSERT INTO fkq_child
           SELECT ROW_NUMBER() OVER
                    (ORDER BY l_orderkey, l_linenumber, l_quantity) AS rid,
                  l_orderkey AS ok
           FROM lineitem""")
      R.runSql(s, "PRAGMA foreign_key_check(fkq_child)")
    }),

    // the classic `SELECT … FROM sqlite_master` catalog probe; the IN
    // list pins the scope to the registered corpus so stray session
    // views from other keys can't perturb the row set
    "meta_sqlite_master" -> ((s, d) => {
      Tables.registerAll(s, d)
      graft.exec.Runner.runSql(s,
        """SELECT name, type, tbl_name, rootpage FROM sqlite_master
           WHERE type = 'table' AND name IN
             ('region','nation','customer','supplier','part','orders',
              'lineitem','events','documents','embeddings')
           ORDER BY name""")
    })
  )

  val oracle: Map[String, String] = Map(
    // props is uniformly '{"k": <int>}' in the testdata, so every
    // edited document can be stated by string surgery — the oracle is
    // independent of any DuckDB JSON-editor behavior
    "fn_json_modify" ->
      """SELECT event_id,
           '{"k":' || (props ->> 'k') || ',"e":' || event_id || '}' AS set_e,
           '{"k":"' || event_type || '"}' AS set_k,
           '{"k":' || (props ->> 'k') || '}' AS ins_noop,
           '{"k":' || event_id || '}' AS repl_k,
           '{}' AS rm_k,
           'object' AS t_doc,
           'integer' AS t_k,
           CAST(NULL AS VARCHAR) AS t_missing,
           '"' || event_type || '"' AS q_type,
           '{"p":1}' AS patched
         FROM events ORDER BY event_id LIMIT 2000""",

    "fn_json_each_tvf" ->
      """SELECT event_id, 'k' AS k, (props ->> 'k') AS v,
           'integer' AS ty, (props ->> 'k') AS atom,
           '$.k' AS fk, '$' AS p
         FROM events ORDER BY event_id LIMIT 2000""",

    // the TVF rows are deterministic functions of event_id, so the
    // oracle states SQLite 3.40.1's exact output as plain expressions
    "fn_json_tree_path" ->
      """WITH t AS (
           SELECT event_id, 'a' AS tk,
             '{"b":' || (event_id % 5) || '}' AS tv,
             'object' AS tty, '$.a' AS tfk, '$' AS tp
           FROM events
           UNION ALL
           SELECT event_id, 'b', CAST(event_id % 5 AS VARCHAR),
             'integer', '$.a.b', '$.a'
           FROM events)
         SELECT event_id, tk, tv, tty, tfk, tp,
           CAST(NULL AS VARCHAR) AS ek,
           CAST(event_id % 7 AS VARCHAR) AS ev,
           '$[#-1]' AS efk, '$[#-1]' AS ep
         FROM t ORDER BY event_id, tfk, efk LIMIT 2000""",

    // DuckDB strftime takes (value, fmt) — argument order is swapped vs
    // SQLite. dayofweek() is Sunday=0 in both DuckDB and the translated
    // Spark expression. Month shifts clamp in BOTH Spark and DuckDB
    // (SQLite normalizes — documented delta in SqlDialect).
    "fn_date_sqlite" ->
      """SELECT event_id,
           strftime(ts, '%Y') AS y,
           strftime(ts, '%Y-%m') AS ym,
           strftime(ts, '%H:%M:%S') AS hms,
           strftime(ts, '%I%p') AS hr12,
           lower(strftime(ts, '%p')) AS ampm_lc,
           lpad(CAST(day(ts) AS VARCHAR), 2, ' ') AS dom_sp,
           strftime(ts, '%j') AS doy,
           CAST(dayofweek(ts) AS VARCHAR) AS dow,
           strftime(ts, '%U') AS wk_sun,
           strftime(ts, '%W') AS wk_mon,
           strftime(ts, '%Y-W%W') AS yw,
           strftime(ts, '%V') AS wk_iso,
           strftime(ts, '%G') AS yr_iso,
           strftime(ts, '%u') AS dow_iso,
           CAST(CAST(FLOOR(epoch(ts)) AS BIGINT) AS VARCHAR) AS epoch_s,
           RTRIM(RTRIM(
             CAST(CAST(FLOOR((2440587.5 + epoch_us(ts) / 86400000000.0)
                             * 1000000000.0 + 0.5) AS BIGINT)
                  // 1000000000 AS VARCHAR)
             || '.' ||
             lpad(CAST(CAST(FLOOR((2440587.5 + epoch_us(ts) / 86400000000.0)
                                  * 1000000000.0 + 0.5) AS BIGINT)
                       % 1000000000 AS VARCHAR), 9, '0'),
             '0'), '.') AS jd_str,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_i,
           strftime(ts, '%Y-%m-%d') AS d,
           strftime(date_trunc('month', ts), '%Y-%m-%d') AS som,
           strftime(ts + INTERVAL 7 DAY, '%Y-%m-%d') AS plus7,
           strftime(ts - INTERVAL 1 MONTH, '%Y-%m-%d') AS minus1m,
           strftime(ts + to_days(CAST((1 - dayofweek(ts) + 7) % 7 AS INTEGER)), '%Y-%m-%d') AS next_mon,
           strftime(ts, '%H:%M:%S') AS tm,
           strftime(ts + INTERVAL 1 DAY + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS shifted,
           strftime(make_timestamp(CAST(1700000000 + event_id AS BIGINT) * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS from_epoch,
           strftime(make_timestamp(CAST(1700000000 + event_id AS BIGINT) * 1000000)
                      + INTERVAL 1 DAY, '%Y-%m-%d') AS from_epoch_p1,
           strftime(make_timestamp(CAST(round(
               ((2440587.5 + epoch_us(ts) / 86400000000.0) + 30 - 2440587.5)
               * 86400000.0) AS BIGINT) * 1000), '%Y-%m-%d') AS jd_plus30,
           strftime(make_timestamp(CAST(round(
               ((2440587.5 + epoch_us(ts) / 86400000000.0) - 2440587.5)
               * 86400000.0) AS BIGINT) * 1000),
             '%Y-%m-%d %H:%M:%S') AS jd_roundtrip
         FROM events ORDER BY event_id""",

    "fn_cond_iif" ->
      """SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS sgn,
           CASE WHEN c_acctbal < 0
                THEN (CASE WHEN c_custkey % 2 = 0 THEN 'ne' ELSE 'no' END)
                ELSE 'p' END AS nested,
           CAST(UNICODE(SUBSTR(c_name, 1, 1)) AS INTEGER) AS first_cp,
           CHR(71) || CHR(79) AS go_str,
           PRINTF('%s:%d', c_mktsegment, c_custkey) AS tagged,
           GREATEST(c_acctbal, 0.0) AS pos_bal,
           CAST(LEAST(c_custkey, 100) AS BIGINT) AS capped_id,
           CAST(c_custkey AS VARCHAR) AS id_str
         FROM customer ORDER BY c_custkey""",

    "agg_group_concat_fn" ->
      """SELECT l_returnflag,
           STRING_AGG(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
           STRING_AGG(l_linestatus, '|' ORDER BY l_linestatus) AS all_statuses,
           STRING_AGG(l_linestatus, '/' ORDER BY l_linestatus) AS sa,
           COALESCE(SUM(l_quantity), 0.0) AS tq
         FROM lineitem GROUP BY l_returnflag
         ORDER BY l_returnflag""",

    // DuckDB's 2-arg trims are (src, chars) like SQLite — direct; its
    // printf is C-flavored so the int directives get explicit casts;
    // DuckDB concat skips NULLs natively; typeof expectations are
    // written as literals; glob's operator form replaces the function
    // DuckDB has no soundex(); the oracle states the sqlite3-measured
    // code per segment value (the five-value domain is closed) — the
    // same stated-measured-output pattern fn_json_tree_path uses
    "fn_text_sqlite" ->
      """SELECT c_custkey,
           LTRIM(c_name, 'Customer#') AS id_digits,
           RTRIM(c_name, '0123456789') AS name_prefix,
           TRIM(c_mktsegment, 'AEIOU') AS seg_trim,
           PRINTF('%s has %.2f', c_name, c_acctbal) AS msg,
           PRINTF('%08d|%x', CAST(c_custkey AS BIGINT),
                  CAST(c_custkey AS BIGINT)) AS padded,
           c_name || '!' AS bang,
           CASE WHEN c_name GLOB 'Customer#*' THEN 1 ELSE 0 END AS is_cust,
           CASE c_mktsegment WHEN 'BUILDING' THEN 'B435'
                WHEN 'AUTOMOBILE' THEN 'A351' WHEN 'MACHINERY' THEN 'M256'
                WHEN 'HOUSEHOLD' THEN 'H243' WHEN 'FURNITURE' THEN 'F653'
                END AS seg_sdx
         FROM customer ORDER BY c_custkey""",

    "fn_math_sqlite" ->
      """SELECT l_orderkey, l_linenumber,
           ROUND(LOG10(l_quantity + 1), 6) AS lg,
           ROUND(LN(l_quantity + 1) / LN(2), 6) AS lg2,
           TRUNC(l_extendedprice) AS tr,
           TRUNC(-l_extendedprice) AS trn
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, lg, tr LIMIT 2000""",

    // DuckDB ILIKE = case-folding LIKE; the COLLATE NOCASE equality is
    // rendered as explicit LOWER() on both sides
    "filter_like_sqlite" ->
      """SELECT c_custkey, c_name, c_mktsegment
         FROM customer
         WHERE (c_mktsegment ILIKE 'build%'
                OR LOWER(c_mktsegment) = LOWER('automobile'))
           AND c_name NOT ILIKE '%0001'
           AND c_name ILIKE 'customer#%' ESCAPE '!'
         ORDER BY c_custkey""",

    // under case_sensitive_like: plain (case-sensitive) LIKE in
    // DuckDB, with the equality's NOCASE fold spelled out
    "filter_like_cs_sqlite" ->
      """SELECT c_custkey, c_name, c_mktsegment
         FROM customer
         WHERE (c_mktsegment LIKE 'BUILD%'
                OR c_mktsegment LIKE 'build%'
                OR LOWER(c_mktsegment) = LOWER('automobile'))
           AND c_name NOT LIKE '%0001'
         ORDER BY c_custkey""",

    // the trigger key's audit table, derived as plain SQL: the UPDATE
    // trigger fired for even keys below 10 (one 'upd' + one 'old' row
    // each), the DELETE trigger for keys >= 20 — the k = 15 delete
    // happened after DROP TRIGGER and left no rows
    "ddl_create_trigger_sql" ->
      """WITH nat AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation)
         SELECT * FROM (
           SELECT 'del' AS ev, k FROM nat WHERE k >= 20
           UNION ALL
           SELECT 'old' AS ev, k FROM nat WHERE k < 10 AND k % 2 = 0
           UNION ALL
           SELECT 'upd' AS ev, k FROM nat WHERE k < 10 AND k % 2 = 0
         ) ORDER BY ev, k""",

    // the INSTEAD OF session flow in closed form: trigger firings per
    // view DML plus the untouched-view row count
    "ddl_instead_of_trigger_sql" ->
      """WITH nat AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation)
         SELECT * FROM (
           SELECT 'ins' AS ev, CAST(v AS BIGINT) AS k
           FROM (VALUES (101), (102)) t(v)
           UNION ALL
           SELECT 'upd' AS ev, k FROM nat WHERE k < 6 AND k % 2 = 0
           UNION ALL
           SELECT 'del' AS ev, k FROM nat WHERE k >= 18 AND k < 20
           UNION ALL
           SELECT 'cnt' AS ev,
                  (SELECT CAST(count(*) AS BIGINT) FROM nat WHERE k < 20)
         ) ORDER BY ev, k""",

    // the RAISE session in closed form: the violating batch left
    // nothing (its 'try' audit rows rolled back with it), the passing
    // insert left one audit row and one table row on top of nation's
    // 25, and the caught error matched the raise message ('err' 1)
    "ddl_raise_trigger_sql" ->
      """SELECT * FROM (
           SELECT 'try' AS ev, CAST(200 AS BIGINT) AS k
           UNION ALL
           SELECT 'cnt' AS ev,
                  CAST((SELECT count(*) FROM nation) + 1 AS BIGINT) AS k
           UNION ALL
           SELECT 'err' AS ev, CAST(1 AS BIGINT) AS k
         ) ORDER BY ev, k""",

    // the upsert statement's post-state as a plain SELECT: updates win
    // on key, untouched base rows survive, appends land — the same
    // merge SQL shape as the sink_upsert oracle
    "sink_upsert_sql" ->
      """WITH base AS (SELECT n_nationkey, n_name, n_regionkey FROM nation),
         upd AS (
           SELECT n_nationkey, 'UPD_' || n_name AS n_name, n_regionkey
           FROM base WHERE n_nationkey % 2 = 0
           UNION ALL
           SELECT n_nationkey + 100, n_name, n_regionkey
           FROM base WHERE n_nationkey < 5)
         SELECT n_nationkey, n_name, n_regionkey FROM upd
         UNION ALL
         SELECT b.n_nationkey, b.n_name, b.n_regionkey FROM base b
         WHERE b.n_nationkey NOT IN (SELECT n_nationkey FROM upd)
         ORDER BY n_nationkey""",

    // DuckDB's json_group_* are macros (no ORDER BY) — the oracle
    // renders the same compact JSON by hand in sorted order; keys are
    // single plain letters, values BIGINT, so no escaping applies
    "fn_json_agg" ->
      """WITH per AS (SELECT l_returnflag, l_linestatus,
                        CAST(COUNT(*) AS BIGINT) AS cnt
                      FROM lineitem GROUP BY 1, 2)
         SELECT l_returnflag,
           '[' || STRING_AGG('"' || l_linestatus || '"', ',' ORDER BY l_linestatus)
               || ']' AS statuses,
           '{' || STRING_AGG('"' || l_linestatus || '":' || cnt,
                             ',' ORDER BY l_linestatus, cnt)
               || '}' AS status_counts
         FROM per GROUP BY l_returnflag
         ORDER BY l_returnflag""",

    // the JSON key rendered with DuckDB's JSON operators: a JSON
    // number's text and JSON representations coincide, so k_txt /
    // k_ext / k_json share one expression; `->` on a string field is
    // rendered by quoting by hand (values are plain event types, no
    // escapes apply). Constructor results cast to VARCHAR (DuckDB
    // returns typed JSON), lengths to INTEGER (Spark's
    // json_array_length is INT, DuckDB's UBIGINT).
    "fn_json_sqlite" ->
      """SELECT event_id,
           props ->> 'k' AS k_txt,
           props ->> 'k' AS k_ext,
           props ->> 'k' AS k_json,
           '"' || event_type || '"' AS s_json,
           event_type AS s_txt,
           json_valid(props) AS ok,
           CAST(json_array(event_id, event_type) AS VARCHAR) AS arr,
           CAST(json_object('id', event_id, 'type', event_type) AS VARCHAR) AS obj,
           CAST(json_array_length(json_array(event_id, event_type)) AS INTEGER) AS alen,
           '[' || (props ->> 'k') || ',null]' AS multi
         FROM events ORDER BY event_id LIMIT 2000""",

    // append semantics in closed form: base rows all survive (incl.
    // the duplicated key 0), inserted rows ride along
    "sink_insert_sql" ->
      """WITH base AS (SELECT n_nationkey, n_name, n_regionkey FROM nation)
         SELECT n_nationkey, n_name, n_regionkey FROM base
         UNION ALL
         SELECT n_nationkey + 200, 'NEW_' || n_name, n_regionkey
         FROM base WHERE n_nationkey < 3
         UNION ALL
         SELECT n_nationkey, 'DUP_' || n_name, n_regionkey
         FROM base WHERE n_nationkey = 0
         ORDER BY n_nationkey, n_name""",

    // the storage classes are static facts of the lake schema — the
    // oracle pins them as literals (only the mixed column varies)
    "fn_typeof" ->
      """SELECT c_custkey,
           'integer' AS t_int, 'text' AS t_text, 'real' AS t_real,
           'null' AS t_null,
           CASE WHEN c_custkey % 2 = 0 THEN 'null' ELSE 'text' END AS t_mixed
         FROM customer ORDER BY c_custkey""",

    // statement 1 skips every conflicting IGN_ row and appends 400/401;
    // statement 2's CONF_ rows conflict against the post-statement-1
    // state (401 included) and are skipped; 503 appends
    "sink_insert_ignore_sql" ->
      """WITH base AS (SELECT n_nationkey, n_name, n_regionkey FROM nation)
         SELECT n_nationkey, n_name, n_regionkey FROM base
         UNION ALL
         SELECT n_nationkey + 400, 'NEW_' || n_name, n_regionkey
         FROM base WHERE n_nationkey < 2
         UNION ALL
         SELECT n_nationkey + 500, n_name, n_regionkey
         FROM base WHERE n_nationkey = 3
         ORDER BY n_nationkey""",

    // conflicting even keys take the assignments (excluded = incoming:
    // name 'X_'||n_name, regionkey +100), odd conflicts keep the old
    // row, 300-302 append
    "sink_upsert_conflict_sql" ->
      """WITH base AS (SELECT n_nationkey, n_name, n_regionkey FROM nation)
         SELECT n_nationkey,
           CASE WHEN n_nationkey < 10 AND n_nationkey % 2 = 0
                THEN 'X_' || n_name || '/' || n_name ELSE n_name END AS n_name,
           CASE WHEN n_nationkey < 10 AND n_nationkey % 2 = 0
                THEN n_regionkey + n_regionkey + 100 ELSE n_regionkey
                END AS n_regionkey
         FROM base
         UNION ALL
         SELECT n_nationkey + 300, n_name, n_regionkey
         FROM base WHERE n_nationkey < 3
         ORDER BY n_nationkey""",

    // the two UPDATE statements' post-state as CASE projections; the
    // TRY_CAST mirrors graft's documented lenient-cast-miss → NULL
    // (statement 2 runs after statement 1, but key 1 is odd so its
    // n_name is untouched when substr reads it)
    "sink_update_sql" ->
      """SELECT n_nationkey,
           CASE WHEN n_nationkey % 2 = 0 THEN 'UPD_' || n_name
                ELSE n_name END AS n_name,
           CASE WHEN n_nationkey = 1
                  THEN TRY_CAST(substr(n_name, 1, 2) AS INTEGER)
                WHEN n_nationkey % 2 = 0 THEN n_regionkey + 10
                ELSE n_regionkey END AS n_regionkey
         FROM nation ORDER BY n_nationkey""",

    "sink_delete_sql" ->
      """WITH base AS (SELECT n_nationkey, n_name, n_regionkey FROM nation)
         SELECT n_nationkey, n_name, n_regionkey FROM base
         WHERE n_regionkey NOT IN
           (SELECT n_regionkey FROM base WHERE n_nationkey >= 22)
         ORDER BY n_nationkey""",

    // rowid assignment order == doc_id order by construction, so
    // MIN(rowid)-per-content ≡ MIN(doc_id)-per-content in closed form
    // (doc_id is unique in the fixture: originals < 200, copies +1000)
    "fn_rowid_dedup" ->
      """WITH base AS (
           SELECT doc_id, text, lang FROM documents WHERE doc_id < 200
           UNION ALL
           SELECT doc_id + 1000, text, lang FROM documents
           WHERE doc_id < 50)
         SELECT doc_id, text, lang FROM base
         WHERE doc_id IN (SELECT min(doc_id) FROM base GROUP BY text)
         ORDER BY doc_id""",

    "fn_rowid_select" ->
      """WITH base AS (
           SELECT row_number() OVER (ORDER BY doc_id) AS rowid,
                  doc_id, lang
           FROM documents WHERE doc_id < 300)
         SELECT rowid, doc_id, lang FROM base
         WHERE rowid % 3 = 1 ORDER BY rowid""",

    // DELETE-LIMIT post-state in closed form: rank region-2 rows by
    // key descending; ranks 2-3 are the deleted slice
    "sink_delete_limit_sql" ->
      """WITH base AS (SELECT n_nationkey, n_name, n_regionkey FROM nation),
         ranked AS (SELECT n_nationkey,
                      row_number() OVER (ORDER BY n_nationkey DESC) AS rn
                    FROM base WHERE n_regionkey = 2)
         SELECT n_nationkey, n_name, n_regionkey FROM base
         WHERE n_nationkey NOT IN
           (SELECT n_nationkey FROM ranked WHERE rn > 1 AND rn <= 3)
         ORDER BY n_nationkey""",

    // UPDATE-FROM post-state in closed form: the region join is
    // many-to-one, so the "arbitrary" SQLite pick is unique; odd keys
    // never match the WHERE and stay untouched
    "sink_update_from_sql" ->
      """SELECT n_nationkey,
           CASE WHEN n_nationkey % 2 = 0 THEN n_name || '@' || r_name
                ELSE n_name END AS n_name,
           n_regionkey
         FROM nation JOIN region ON n_regionkey = r_regionkey
         ORDER BY n_nationkey""",

    // the RETURNING slice: appended rows only (the conflicting key-2
    // row is ignored), unlisted n_regionkey NULL-padded
    "sink_insert_returning_sql" ->
      """SELECT n_nationkey + 600 AS n_nationkey, 'RET_' || n_name AS n_name,
           CAST(NULL AS BIGINT) AS n_regionkey
         FROM nation WHERE n_nationkey < 4
         ORDER BY n_nationkey""",

    // the created table's post-state: k=2 replaced on the declared
    // (non-leading) PRIMARY KEY, k=3 appended
    "ddl_create_table_sql" ->
      """SELECT * FROM (VALUES
           ('a', CAST(1 AS BIGINT), CAST(1.5 AS DOUBLE)),
           ('B', CAST(2 AS BIGINT), CAST(9.0 AS DOUBLE)),
           ('c', CAST(3 AS BIGINT), CAST(3.5 AS DOUBLE)))
         AS t(label, k, score) ORDER BY k""",

    // OR REPLACE resolved on the UNIQUE-indexed n_name: nations 0-4
    // are replaced by their +700/+50 images, the rest survive
    "ddl_create_index_sql" ->
      """WITH base AS (SELECT n_nationkey, n_name, n_regionkey FROM nation),
         upd AS (SELECT n_nationkey + 700 AS n_nationkey, n_name,
                        n_regionkey + 50 AS n_regionkey
                 FROM base WHERE n_nationkey < 5)
         SELECT n_nationkey, n_name, n_regionkey FROM upd
         UNION ALL
         SELECT n_nationkey, n_name, n_regionkey FROM base
         WHERE n_name NOT IN (SELECT n_name FROM upd)
         ORDER BY n_nationkey""",

    // DuckDB executes window FILTER natively — the oracle IS the
    // untranslated form
    "win_filter_clause" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
           count(*) FILTER (WHERE c_acctbal > 0)
             OVER (PARTITION BY c_mktsegment) AS n_pos,
           round(sum(c_acctbal) FILTER (WHERE c_acctbal > 0)
             OVER (PARTITION BY c_mktsegment), 4) AS pos_bal,
           round(avg(c_acctbal) FILTER (WHERE c_acctbal < 0)
             OVER (PARTITION BY c_mktsegment ORDER BY c_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS neg_run
         FROM customer ORDER BY c_custkey""",

    // hex/quote in closed form: DuckDB's hex() matches SQLite's only
    // for text (bytes), so the numeric column hexes its TEXT rendering
    // explicitly; quote() is emulated with replace-doubling
    "fn_hex_quote" ->
      """SELECT c_custkey,
           hex(c_name) AS h_text,
           hex(CAST(c_custkey AS VARCHAR)) AS h_int,
           '''' || replace(c_name, '''', '''''') || '''' AS q_text,
           CAST(c_acctbal AS VARCHAR) AS q_real,
           'NULL' AS q_null,
           '' AS h_null
         FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey""",

    // changes() deltas in closed form: region-2 nations deleted, then
    // the surviving keys < 10 updated
    "fn_changes_sql" ->
      """WITH del AS (SELECT count(*) AS n FROM nation WHERE n_regionkey = 2),
         upd AS (SELECT count(*) AS n FROM nation
                 WHERE n_regionkey <> 2 AND n_nationkey < 10)
         SELECT CAST(del.n AS BIGINT) AS del_n, CAST(upd.n AS BIGINT) AS upd_n
         FROM del, upd""",

    // defaults post-state in closed form
    // closed-form post-state: two all-default rows + one listed-column
    // insert whose unlisted score takes the default
    "sink_insert_default_sql" ->
      """SELECT * FROM (VALUES
           (CAST(5 AS BIGINT), 'n/a', CAST(2.5 AS DOUBLE)),
           (CAST(5 AS BIGINT), 'n/a', CAST(2.5 AS DOUBLE)),
           (CAST(9 AS BIGINT), 'x', CAST(2.5 AS DOUBLE)))
         AS t(k, tag, score) ORDER BY k, tag, score""",

    // uniqueness post-states pinned against sqlite3 running the
    // identical statement sequences
    "ddl_unique_sql" ->
      """SELECT * FROM (VALUES
           (CAST(2 AS BIGINT), 'x', CAST(30 AS BIGINT)),
           (CAST(4 AS BIGINT), 'w', CAST(50 AS BIGINT)),
           (CAST(5 AS BIGINT), 'z', CAST(60 AS BIGINT)))
         AS t(a, b, v) ORDER BY a""",

    "ddl_expr_index_sql" ->
      """SELECT * FROM (VALUES
           ('HELLO', CAST(2 AS BIGINT)), ('World', CAST(4 AS BIGINT)))
         AS t(a, v) ORDER BY v""",

    // the row-value subquery splits replay as the equivalent LEFT
    // JOIN + CASE over the OLD state
    "sink_update_rowvalue_sql" ->
      """SELECT n_nationkey,
                CASE WHEN n_nationkey < 10 THEN upper(r_name)
                     ELSE n_name END AS n_name,
                CASE WHEN n_nationkey < 10 THEN n_regionkey + 100
                     ELSE n_regionkey END AS n_regionkey
         FROM nation LEFT JOIN region ON r_regionkey = n_regionkey
         ORDER BY n_nationkey""",

    // post-state pinned against sqlite3 running the identical
    // statements: the expression target folds 'a@X.COM' onto row 1
    // (id 3+100), DO NOTHING skips the B@Y.COM conflict; the partial
    // target updates the in-scope (1,5)→(1,7) while (1,0) appends
    "sink_upsert_target_sql" ->
      """SELECT * FROM (VALUES
           (CAST(1 AS BIGINT), 'p', CAST(-1 AS BIGINT)),
           (CAST(1 AS BIGINT), 'p', CAST(0 AS BIGINT)),
           (CAST(1 AS BIGINT), 'p', CAST(7 AS BIGINT)),
           (CAST(2 AS BIGINT), 'b@y.com', CAST(0 AS BIGINT)),
           (CAST(4 AS BIGINT), 'c@z.org', CAST(0 AS BIGINT)),
           (CAST(103 AS BIGINT), 'A@x.com', CAST(0 AS BIGINT)))
         AS t(k1, k2, k3) ORDER BY k1, k2, k3""",

    // post-state pinned against sqlite3 3.40.1 running the identical
    // statements: the chain updates a-conflicts, skips b-conflicts,
    // appends the rest; the targetless forms resolve via whichever
    // key fired
    "sink_upsert_chain_sql" ->
      """SELECT * FROM (VALUES
           (CAST(1 AS BIGINT), 'x', CAST(99 AS BIGINT)),
           (CAST(2 AS BIGINT), 'y', CAST(60 AS BIGINT)),
           (CAST(3 AS BIGINT), 'z', CAST(111 AS BIGINT)),
           (CAST(5 AS BIGINT), 'n', CAST(50 AS BIGINT)))
         AS t(a, b, v) ORDER BY a""",

    // post-state pinned against sqlite3 running the identical
    // statements: (1,x,10) re-keys onto 2 displacing (2,y,20); c=NULL
    // takes DEFAULT 5; the double re-key onto 9 leaves one winner
    // pinned against sqlite3 running the identical statements: the
    // 1->2 re-key skips (occupied), the 3->9 re-key applies,
    // changes() reports 1, RETURNING yields the applied key
    "sink_update_ignore_sql" ->
      """SELECT * FROM (VALUES
           (CAST(1 AS BIGINT), 'x', CAST(4 AS BIGINT),
            CAST(9 AS BIGINT), CAST(1 AS BIGINT)),
           (CAST(2 AS BIGINT), 'y', CAST(4 AS BIGINT),
            CAST(9 AS BIGINT), CAST(1 AS BIGINT)),
           (CAST(4 AS BIGINT), 'w', CAST(4 AS BIGINT),
            CAST(9 AS BIGINT), CAST(1 AS BIGINT)),
           (CAST(9 AS BIGINT), 'z', CAST(4 AS BIGINT),
            CAST(9 AS BIGINT), CAST(1 AS BIGINT)))
         AS t(a, b, total, applied_key, n_changed) ORDER BY a""",

    "sink_update_replace_sql" ->
      """SELECT * FROM (VALUES
           (CAST(4 AS BIGINT), 'w', CAST(40 AS BIGINT)),
           (CAST(9 AS BIGINT), 'z', CAST(5 AS BIGINT)))
         AS t(a, b, c) ORDER BY a""",

    // recursive-trigger multiset pinned against sqlite3 running the
    // identical statements
    "ddl_recursive_trigger_sql" ->
      """SELECT * FROM (VALUES
           (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(2 AS BIGINT)),
           (CAST(3 AS BIGINT)), (CAST(3 AS BIGINT)), (CAST(4 AS BIGINT)),
           (CAST(4 AS BIGINT))) AS t(x) ORDER BY x""",

    // declared-collation folds pinned against sqlite3 running the
    // identical statements (the oracle spells the folds explicitly)
    "ddl_collate_sql" ->
      """SELECT * FROM (VALUES
           ('APPLE', CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(0 AS BIGINT)),
           ('BANANA', CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(2 AS BIGINT)),
           ('CHERRY', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)))
         AS t(grp, n, eq_hits, rt_hits) ORDER BY grp""",

    // pinned against sqlite3 running the identical fixture: IN list /
    // IN (SELECT …) membership / BETWEEN bounds fold under the
    // declared NOCASE (RTRIM for y); the grouped bare column projects
    // its lowercased representative
    "filter_collate_in" ->
      """SELECT * FROM (VALUES
           ('apple',  CAST(2 AS BIGINT), CAST(2 AS BIGINT),
            CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(2 AS BIGINT),
            CAST(2 AS BIGINT), CAST(0 AS BIGINT)),
           ('banana', CAST(2 AS BIGINT), CAST(2 AS BIGINT),
            CAST(0 AS BIGINT), CAST(2 AS BIGINT), CAST(0 AS BIGINT),
            CAST(2 AS BIGINT), CAST(0 AS BIGINT)),
           ('cherry', CAST(1 AS BIGINT), CAST(0 AS BIGINT),
            CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
            CAST(0 AS BIGINT), CAST(1 AS BIGINT)))
         AS t(grp, n, in_hits, notin_hits, btw_hits, rt_in_hits,
              insub_hits, notinsub_hits)
         ORDER BY grp""",

    // constraint-enforcement post-state pinned against sqlite3 running
    // the identical statement sequence (violating writes raise and
    // land nothing; OR IGNORE skips; OR REPLACE fills the default)
    "ddl_constraints_sql" ->
      """SELECT * FROM (VALUES
           (CAST(1 AS BIGINT), CAST(7 AS BIGINT), CAST(9 AS BIGINT), 'dc'),
           (CAST(2 AS BIGINT), CAST(7 AS BIGINT), CAST(NULL AS BIGINT), 'dc'),
           (CAST(4 AS BIGINT), CAST(40 AS BIGINT), CAST(4 AS BIGINT), 'dc'))
         AS t(k, a, b, c) ORDER BY k""",

    "ddl_autoincrement_sql" ->
      """SELECT * FROM (VALUES
           (CAST(1 AS BIGINT), 'a', CAST(101 AS BIGINT)),
           (CAST(2 AS BIGINT), 'b', CAST(101 AS BIGINT)),
           (CAST(4 AS BIGINT), 'd', CAST(101 AS BIGINT)),
           (CAST(100 AS BIGINT), 'e', CAST(101 AS BIGINT)),
           (CAST(101 AS BIGINT), 'f', CAST(101 AS BIGINT)))
         AS t(id, v, seq) ORDER BY id""",

    "ddl_strict_table_sql" ->
      """SELECT * FROM (VALUES
           (CAST(1 AS BIGINT), CAST(12 AS BIGINT), CAST(7.0 AS DOUBLE), '5'),
           (CAST(2 AS BIGINT), CAST(30 AS BIGINT), CAST(1.5 AS DOUBLE), 'x'))
         AS t(k, i, r, t) ORDER BY k""",

    "ddl_generated_cols_sql" ->
      """SELECT * FROM (VALUES
           (CAST(1 AS BIGINT), CAST(3 AS BIGINT), CAST(6 AS BIGINT), 'v3'),
           (CAST(2 AS BIGINT), CAST(10 AS BIGINT), CAST(20 AS BIGINT), 'v10'),
           (CAST(3 AS BIGINT), CAST(11 AS BIGINT), CAST(22 AS BIGINT), 'v11'))
         AS t(k, a, dbl, tag) ORDER BY k""",

    "ddl_defaults_sql" ->
      """SELECT * FROM (VALUES
           (CAST(1 AS BIGINT), 'n/a', CAST(2.5 AS DOUBLE)),
           (CAST(2 AS BIGINT), 'n/a', CAST(2.5 AS DOUBLE)),
           (CAST(3 AS BIGINT), 'x', CAST(9.0 AS DOUBLE)))
         AS t(k, tag, score) ORDER BY k""",

    // ALTER TABLE post-state in closed form: src backfilled with the
    // default, n_name renamed, n_regionkey gone
    "ddl_alter_table_sql" ->
      """SELECT n_nationkey, n_name AS nation_name, 'lake' AS src
         FROM nation ORDER BY n_nationkey""",

    // hand-pinned introspection contracts (DuckDB has no Spark catalog
    // to reflect — the VALUES lists ARE the expected surface)
    "meta_pragma_info" ->
      """SELECT * FROM (VALUES
           (0, 'n_nationkey', 'INTEGER', 0, CAST(NULL AS VARCHAR), 0),
           (1, 'n_name',      'TEXT',    0, CAST(NULL AS VARCHAR), 0),
           (2, 'n_regionkey', 'INTEGER', 0, CAST(NULL AS VARCHAR), 0))
         AS t(cid, name, type, "notnull", dflt_value, pk)
         ORDER BY cid""",

    // the measured sqlite3 3.40.1 foreign_key_list rows, literal
    "meta_foreign_keys" ->
      """SELECT * FROM (VALUES
           (0, 0, 'fkl_other',  'c', 'x',
            'NO ACTION', 'NO ACTION', 'NONE'),
           (0, 1, 'fkl_other',  'a', 'y',
            'NO ACTION', 'NO ACTION', 'NONE'),
           (1, 0, 'fkl_parent', 'a', 'id',
            'SET NULL', 'CASCADE', 'NONE'),
           (2, 0, 'fkl_parent', 'b', CAST(NULL AS VARCHAR),
            'NO ACTION', 'NO ACTION', 'NONE'))
         AS t(id, seq, "table", "from", "to", on_update, on_delete, "match")
         ORDER BY id, seq""",

    // the identical orphan anti-join in closed form
    "meta_fk_check" ->
      """WITH c AS (
           SELECT ROW_NUMBER() OVER
                    (ORDER BY l_orderkey, l_linenumber, l_quantity) AS rid,
                  l_orderkey AS ok
           FROM lineitem),
         p AS (SELECT DISTINCT o_orderkey AS k FROM orders
               WHERE o_orderkey % 3 <> 0)
         SELECT 'fkq_child' AS "table", CAST(rid AS BIGINT) AS rowid,
                'fkq_parent' AS parent, CAST(0 AS BIGINT) AS fkid
         FROM c WHERE ok NOT IN (SELECT k FROM p)
         ORDER BY rowid""",

    "meta_sqlite_master" ->
      """SELECT name, 'table' AS type, name AS tbl_name, 0 AS rootpage
         FROM (VALUES ('region'),('nation'),('customer'),('supplier'),
                      ('part'),('orders'),('lineitem'),('events'),
                      ('documents'),('embeddings')) AS t(name)
         ORDER BY name""",

    // the RTRIM collation rendered explicitly: rtrim both sides
    // (two-arg form pins the trimmed set to the 0x20 space, exactly
    // SQLite's RTRIM collation and Spark's one-arg rtrim)
    "filter_collate_rtrim" ->
      """SELECT c_custkey, c_name, c_mktsegment
         FROM customer
         WHERE RTRIM(c_mktsegment || '   ', ' ') = RTRIM('BUILDING', ' ')
            OR RTRIM(c_mktsegment, ' ') = RTRIM('FURNITURE  ', ' ')
            OR RTRIM(c_mktsegment || ' ', ' ') = RTRIM('MACHINERY', ' ')
         ORDER BY RTRIM(c_name || '  ', ' '), c_custkey""",
  )
}
