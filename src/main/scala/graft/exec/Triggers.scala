package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.text2sql.SqlDml

/** SQLite `CREATE TRIGGER` — the supported subset, executed
  * SET-BASED (reference delegation: pandasqlite.py:245-247 hands any
  * generated statement to SQLite, triggers included).
  *
  * SQLite fires row triggers once per affected row, sequentially.
  * A distributed engine cannot loop rows on the driver, so each body
  * statement is re-expressed as ONE relational statement over the
  * affected-row slice (struct columns `old`/`new`, so the body's
  * `NEW.x`/`OLD.x` resolve naturally):
  *
  *  - `INSERT … VALUES (exprs)`  → `INSERT … SELECT exprs FROM slice`
  *    (one inserted row per affected row, exactly SQLite — including
  *    bodies with no NEW/OLD reference, which insert once per row);
  *  - `INSERT … SELECT …`        → the source becomes
  *    `SELECT s.* FROM slice, LATERAL (source) s` (per-row
  *    correlation, Spark's spelling of the implicit trigger scope);
  *  - `UPDATE t SET … WHERE …`   → the existing UPDATE-FROM rewrite
  *    with the slice as the FROM source; several slice rows matching
  *    one target row resolve to the deterministic minimum of the
  *    assigned row image — the same documented "arbitrarily chosen"
  *    policy as sink_update_from_sql (SQLite applies them
  *    sequentially in rowid order, an order a distributed batch does
  *    not have). Bodies with no NEW/OLD reference decline at CREATE:
  *    their per-row repetition (`SET c = c + 1` runs N times) has no
  *    set-based equivalent;
  *  - `DELETE FROM t WHERE p`    → `WHERE EXISTS (SELECT 1 FROM
  *    slice WHERE p)` (deletion is idempotent, so set semantics match
  *    row-at-a-time exactly);
  *  - `SELECT …`                 → executed per slice row and
  *    discarded (SQLite runs and discards; only RAISE would make the
  *    result visible, and RAISE declines at CREATE).
  *
  * Timing: AFTER bodies run after the triggering statement's
  * copy-on-write rebind; BEFORE (SQLite's default when no timing is
  * written) runs them before it, and declines at CREATE when a body
  * targets the trigger's own table (the row-interleaved semantics are
  * not representable set-based). INSTEAD OF declines (no view-trigger
  * surface). Documented divergence: a BEFORE body's effects on OTHER
  * tables are not visible to the triggering statement's own
  * subqueries (set-based evaluation reads a consistent pre-state).
  *
  * Validation is CREATE-time and strict where SQLite is lazy: OLD in
  * an INSERT trigger or NEW in a DELETE trigger, RAISE(), RETURNING
  * in a body, and non-DML body verbs all fail at CREATE with a named
  * error (SQLite parses some of these and fails at first fire —
  * fail-fast beats a landmine). Error message shapes mirror SQLite
  * where one exists ("trigger X already exists", "no such table: X",
  * "cannot use RETURNING in a trigger").
  *
  * Cascading: body DML runs through [[Upsert]]/[[Mutate]], so
  * triggers on OTHER tables fire naturally. A trigger already on the
  * firing stack is skipped — exactly `PRAGMA recursive_triggers =
  * OFF`, SQLite's default. Firing happens only on the generated-SQL
  * path (Runner/Upsert/Mutate); writes through the raw Spark API
  * bypass triggers, like any engine-external write.
  */
object Triggers {

  final case class Trig(name: String, timing: String, event: String,
                        ofCols: Seq[String], table: String,
                        when: Option[String], body: Seq[String],
                        sql: String, seq: Long)

  private final class State {
    // lowercased trigger name -> descriptor; creation order in seq
    val trigs = scala.collection.mutable.LinkedHashMap.empty[String, Trig]
    var nextSeq = 0L
  }

  private val states =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, State]())

  private def state(spark: SparkSession): State =
    states.synchronized {
      var s = states.get(spark)
      if (s == null) { s = new State; states.put(spark, s) }
      s
    }

  /** Trigger names currently firing on this thread — re-entrant
    * firings are skipped (recursive_triggers OFF, SQLite's default). */
  private val active = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue() = scala.collection.mutable.Set.empty[String]
  }

  private val sliceCounter = new java.util.concurrent.atomic.AtomicLong()

  // --------------------------------------------------------- create

  /** Case-insensitive scan (outside quotes) for `NEW.` / `OLD.`. */
  private def refersTo(sqlText: String, qualifier: String): Boolean = {
    var i = 0
    val q = qualifier.toLowerCase
    while (i < sqlText.length) {
      val c = sqlText.charAt(i)
      if (c == '\'' || c == '"' || c == '`')
        i = graft.text2sql.SqlDialect.endOfQuoted(sqlText, i, c)
      else if (graft.text2sql.SqlDialect.keywordAt(sqlText, i, q)) {
        var j = i + q.length
        while (j < sqlText.length && sqlText.charAt(j).isWhitespace) j += 1
        if (j < sqlText.length && sqlText.charAt(j) == '.') return true
        i += q.length
      } else i += 1
    }
    false
  }

  private def containsRaise(sqlText: String): Boolean = {
    var i = 0
    while (i < sqlText.length) {
      val c = sqlText.charAt(i)
      if (c == '\'' || c == '"' || c == '`')
        i = graft.text2sql.SqlDialect.endOfQuoted(sqlText, i, c)
      else if (graft.text2sql.SqlDialect.keywordAt(sqlText, i, "raise")) {
        var j = i + 5
        while (j < sqlText.length && sqlText.charAt(j).isWhitespace) j += 1
        if (j < sqlText.length && sqlText.charAt(j) == '(') return true
        i += 5
      } else i += 1
    }
    false
  }

  private def decline(msg: String): Nothing =
    throw new UnsupportedOperationException(msg)

  def create(spark: SparkSession, t: SqlDml.CreateTrigger): DataFrame = {
    val s = state(spark)
    s.synchronized {
      if (s.trigs.contains(t.name.toLowerCase)) {
        if (t.ifNotExists) return spark.emptyDataFrame
        throw new IllegalArgumentException(s"trigger ${t.name} already exists")
      }
    }
    if (t.timing == "instead of")
      decline("INSTEAD OF triggers are not supported (no view-trigger " +
        "surface); use BEFORE or AFTER on the base table")
    // the target table must exist (SQLite checks at CREATE)
    try spark.table(Ddl.quote(t.table))
    catch { case e: Exception =>
      throw new IllegalArgumentException(s"no such table: ${t.table}", e) }
    (t.when.toSeq ++ t.body).foreach { frag =>
      if (containsRaise(frag))
        decline("RAISE() in a trigger is not supported; triggers here " +
          "run set-based side effects, not per-row aborts")
      if (t.event == "insert" && refersTo(frag, "old"))
        decline("OLD is not valid in an INSERT trigger")
      if (t.event == "delete" && refersTo(frag, "new"))
        decline("NEW is not valid in a DELETE trigger")
    }
    t.body.foreach { b =>
      SqlDml.detect(b) match {
        case Some(u: SqlDml.Upsert) =>
          if (u.returning.isDefined)
            decline("cannot use RETURNING in a trigger")
        case Some(u: SqlDml.Update) =>
          if (u.returning.isDefined)
            decline("cannot use RETURNING in a trigger")
          if (u.from.isDefined || u.limit.isDefined)
            decline("trigger UPDATE bodies with FROM or LIMIT are not " +
              "supported")
          if (!refersTo(b, "new") && !refersTo(b, "old"))
            decline("a trigger UPDATE body with no NEW/OLD reference " +
              "repeats per affected row, which has no set-based " +
              "equivalent; correlate the body with NEW/OLD")
        case Some(d: SqlDml.Delete) =>
          if (d.returning.isDefined)
            decline("cannot use RETURNING in a trigger")
          if (d.limit.isDefined)
            decline("trigger DELETE bodies with LIMIT are not supported")
        case None if b.trim.toLowerCase.startsWith("select") => // run+discard
        case other =>
          val verb = b.trim.split("\\s+").headOption.getOrElse("").toUpperCase
          decline(s"trigger bodies may contain INSERT/UPDATE/DELETE/" +
            s"SELECT statements only; got $verb")
      }
      if ((t.timing == "before" || t.timing.isEmpty) &&
          bodyTarget(b).exists(_.equalsIgnoreCase(t.table)))
        decline("a BEFORE trigger whose body modifies its own table is " +
          "not supported set-based; use AFTER")
    }
    s.synchronized {
      val seq = s.nextSeq; s.nextSeq += 1
      s.trigs(t.name.toLowerCase) = Trig(t.name, t.timing, t.event,
        t.ofCols, t.table, t.when, t.body, t.sql, seq)
    }
    spark.emptyDataFrame
  }

  private def bodyTarget(b: String): Option[String] =
    SqlDml.detect(b) match {
      case Some(u: SqlDml.Upsert) => Some(u.table)
      case Some(u: SqlDml.Update) => Some(u.table)
      case Some(d: SqlDml.Delete) => Some(d.table)
      case _ => None
    }

  def dropTrigger(spark: SparkSession, d: SqlDml.DropTrigger): DataFrame = {
    val s = state(spark)
    s.synchronized {
      if (s.trigs.remove(d.name.toLowerCase).isEmpty && !d.ifExists)
        throw new IllegalArgumentException(s"no such trigger: ${d.name}")
    }
    spark.emptyDataFrame
  }

  /** DROP TABLE drops the table's triggers (SQLite's rule). */
  def dropForTable(spark: SparkSession, table: String): Unit = {
    val s = state(spark)
    s.synchronized {
      s.trigs.filterInPlace((_, t) => !t.table.equalsIgnoreCase(table))
    }
  }

  /** ALTER TABLE … RENAME TO: trigger table references follow
    * (SQLite rewrites them). */
  def renameTable(spark: SparkSession, from: String, to: String): Unit = {
    val s = state(spark)
    s.synchronized {
      s.trigs.mapValuesInPlace { (_, t) =>
        if (t.table.equalsIgnoreCase(from)) t.copy(table = to) else t
      }
    }
  }

  /** sqlite_master rows: (name, tbl_name, sql) per trigger. */
  def masterRows(spark: SparkSession): Seq[(String, String, String)] = {
    val s = state(spark)
    s.synchronized {
      s.trigs.values.toSeq.sortBy(_.seq).map(t => (t.name, t.table, t.sql))
    }
  }

  // ----------------------------------------------------------- fire

  private def matching(spark: SparkSession, table: String, event: String,
                       setCols: Seq[String], timing: String): Seq[Trig] = {
    val s = state(spark)
    val all = s.synchronized { s.trigs.values.toSeq.sortBy(_.seq) }
    val setLc = setCols.map(_.toLowerCase).toSet
    all.filter { t =>
      t.table.equalsIgnoreCase(table) && t.event == event &&
        (t.ofCols.isEmpty || t.ofCols.exists(setLc)) &&
        (if (timing == "after") t.timing == "after"
         else t.timing == "before" || t.timing.isEmpty) &&
        !active.get().contains(t.name.toLowerCase)
    }
  }

  /** Any trigger (either timing) that the statement would fire. */
  def anyFor(spark: SparkSession, table: String, event: String,
             setCols: Seq[String] = Nil): Boolean =
    matching(spark, table, event, setCols, "after").nonEmpty ||
      matching(spark, table, event, setCols, "before").nonEmpty

  /** Fire the matching triggers of one timing over the affected-row
    * slice (struct columns `old`/`new` as the event provides). The
    * caller builds `slice` against the PRE-statement binding; lazy
    * plans stay valid because every rebind is copy-on-write. No-op
    * when nothing matches or the slice is empty (SQLite fires
    * per-row: zero rows, zero firings). */
  def fire(spark: SparkSession, table: String, event: String,
           setCols: Seq[String], timing: String, slice: => DataFrame): Unit = {
    val trigs = matching(spark, table, event, setCols, timing)
    if (trigs.isEmpty) return
    val df = slice.persist()
    try {
      if (df.isEmpty) return
      val view = s"graft_trig_${sliceCounter.incrementAndGet()}"
      df.createOrReplaceTempView(view)
      try trigs.foreach { t =>
        val rel = t.when match {
          case Some(w) => s"(SELECT * FROM $view WHERE $w)"
          case None    => s"$view"
        }
        active.get() += t.name.toLowerCase
        try t.body.foreach(runBody(spark, rel, _))
        finally active.get() -= t.name.toLowerCase
      } finally spark.catalog.dropTempView(view)
    } finally df.unpersist()
  }

  private def runBody(spark: SparkSession, rel: String, stmt: String): Unit =
    SqlDml.detect(stmt) match {
      case Some(u: SqlDml.Upsert) =>
        // parseUpsert re-wraps a VALUES source as `SELECT * FROM
        // (VALUES …)`; Spark cannot correlate an outer reference into
        // an inline table, so unwrap and emit per-row SELECTs instead
        val src0 = u.sourceSql.trim
        val wrappedValues =
          "(?is)^\\s*SELECT \\* FROM \\((values\\b.*)\\)\\s*$".r
        val src = src0 match {
          case wrappedValues(inner) => valuesToSelect(inner.trim, rel)
          case _ if src0.toLowerCase.startsWith("values") =>
            valuesToSelect(src0, rel)
          case _ =>
            s"SELECT graft_body.* FROM $rel graft_trig_row, " +
              s"LATERAL ($src0) graft_body"
        }
        Upsert.run(spark, u.copy(sourceSql = src))
      case Some(u: SqlDml.Update) =>
        Mutate.runUpdate(spark, u.copy(from = Some(s"$rel graft_trig_row")))
      case Some(d: SqlDml.Delete) =>
        val wrapped = d.where.map(w =>
          s"EXISTS (SELECT 1 FROM $rel graft_trig_row WHERE $w)")
        Mutate.runDelete(spark, d.copy(where = wrapped))
      case _ => // validated SELECT body: execute per slice row, discard
        spark.sql(s"SELECT graft_body.* FROM $rel graft_trig_row, " +
          s"LATERAL ($stmt) graft_body").count()
    }

  /** `VALUES (a,b),(c,d)` → `SELECT a, b FROM rel UNION ALL SELECT
    * c, d FROM rel` — each VALUES row inserts once per slice row,
    * SQLite's per-row body semantics. Quote/paren-aware row split. */
  private def valuesToSelect(values: String, rel: String): String = {
    var i = "values".length
    val rows = Seq.newBuilder[String]
    while (i < values.length) {
      values.charAt(i) match {
        case '(' =>
          val e = graft.text2sql.SqlDialect.closeParen(values, i)
          if (e < 0) throw new IllegalArgumentException(
            s"malformed VALUES in trigger body: $values")
          rows += values.substring(i + 1, e)
          i = e + 1
        case c if c.isWhitespace || c == ',' => i += 1
        case _ => throw new IllegalArgumentException(
          s"malformed VALUES in trigger body: $values")
      }
    }
    rows.result().map(r => s"SELECT $r FROM $rel graft_trig_row")
      .mkString(" UNION ALL ")
  }
}
