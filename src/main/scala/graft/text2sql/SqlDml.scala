package graft.text2sql

/** DML in generated SQL.
  *
  * The reference executes whatever the model emits verbatim against
  * SQLite (reference pandasqlite/pandasqlite.py:245-247, test.py:50),
  * so "remove the returned orders" can legally come back as
  * `DELETE FROM 'hash' …`. This engine's lake-backed tables are
  * immutable; the one DML form with a sound distributed re-expression
  * is SQLite's upsert:
  *
  *   INSERT OR REPLACE INTO t [(cols)] (SELECT … | VALUES …)
  *   REPLACE INTO t [(cols)] …            -- SQLite alias, same verb
  *
  * which [[graft.exec.Upsert]] rewrites as a copy-on-write merge
  * (updates ∪ base-anti-updates on the key, materialized, temp view
  * re-bound — last write wins, the same observable table state SQLite
  * leaves). `UPDATE t SET … [WHERE p]` and `DELETE FROM t [WHERE p]`
  * (with optional `RETURNING`) re-express the same way
  * ([[graft.exec.Mutate]]): an UPDATE is a full-width CASE-WHEN
  * projection (assignments applied where p holds, old row otherwise),
  * a DELETE keeps the rows where p is NOT true — each materialized and
  * re-bound, the table-state transition SQLite performs in place.
  * Verbs with no sound lake re-expression — conflict-action
  * `UPDATE OR …`, join-`UPDATE … FROM`, DML `ORDER BY`/`LIMIT` — raise
  * a targeted read-only-engine error instead of Spark's generic
  * `ParseException`/`AnalysisException`.
  *
  * This object only CLASSIFIES and PARSES; execution lives in
  * `graft.exec` so the text2sql layer stays side-effect free.
  */
object SqlDml {
  import SqlDialect.{keywordAt, isWordChar, endOfQuoted, closeParen}

  sealed trait Stmt

  /** `INSERT OR REPLACE INTO table [(cols)] <source>`. `sourceSql` is
    * a complete runnable SELECT (a leading `WITH` prefix from the
    * statement is carried into it; a `VALUES …` source is wrapped as
    * `SELECT * FROM (VALUES …)`). `cols` empty = positional against
    * the full target schema, as in SQLite. `conflict` carries a parsed
    * upsert clause (`ON CONFLICT …`), or the equivalent implied by
    * `INSERT OR IGNORE`; when set it overrides `replace`.
    */
  final case class Upsert(table: String, cols: Seq[String],
                          sourceSql: String,
                          replace: Boolean = true,
                          conflict: Option[OnConflict] = None) extends Stmt

  /** SQLite's upsert clause: `ON CONFLICT [(cols)] DO NOTHING` (empty
    * `assigns`) or `ON CONFLICT (cols) DO UPDATE SET … [WHERE p]`.
    * Expression texts are raw translated SQL; `excluded.col`
    * references (the would-be-inserted row) are resolved at execution
    * via [[rewriteExcluded]]. Empty `keyCols` = the target's leading
    * column, the same id-column convention `INSERT OR REPLACE` uses
    * (ingested tables declare no constraints for SQLite to match). */
  final case class OnConflict(keyCols: Seq[String],
                              assigns: Seq[(String, String)],
                              updateWhere: Option[String])

  /** A DML verb this engine declines (read-only lake storage). */
  final case class Unsupported(verb: String) extends Stmt

  /** `UPDATE table SET col = expr, … [WHERE p] [RETURNING exprs]`.
    * Expression fields carry raw (already-translated) SQL text;
    * `withPrefix` is the statement's leading `WITH …` clause, kept so
    * CTE references inside WHERE/SET subqueries stay bound. Repeated
    * assignments to one column are legal; the rightmost wins (SQLite
    * lang_update.html). */
  final case class Update(table: String, assigns: Seq[(String, String)],
                          where: Option[String], returning: Option[String],
                          withPrefix: String) extends Stmt

  /** `DELETE FROM table [WHERE p] [RETURNING exprs]`. No WHERE =
    * delete every row (the schema survives, as in SQLite). */
  final case class Delete(table: String, where: Option[String],
                          returning: Option[String],
                          withPrefix: String) extends Stmt

  /** `CREATE [TEMP] VIEW name AS select` — executed as a session
    * (temporary) view; the reference's SQLite database is itself
    * session-scoped, so the lifetime matches. */
  final case class CreateView(name: String, ifNotExists: Boolean,
                              sourceSql: String) extends Stmt

  /** `CREATE [TEMP] TABLE name AS select` (CTAS) — materialized
    * (parquet) and registered as a session table. */
  final case class CreateTableAs(name: String, ifNotExists: Boolean,
                                 sourceSql: String) extends Stmt

  /** `DROP TABLE/VIEW [IF EXISTS] name` — unregisters the session
    * relation (lake files are immutable; only the binding drops). */
  final case class DropRelation(name: String, ifExists: Boolean) extends Stmt

  /** Classify a statement. None = not DML (run it as a query). */
  def detect(rawSql: String): Option[Stmt] = {
    // strip trailing statement terminators: models habitually emit
    // "…;" and a semicolon riding into a re-wrapped source (e.g.
    // `SELECT * FROM (VALUES (1);)`) is a parse error. Quote-safe: a
    // literal can't END the statement with a bare ';' outside quotes.
    val sql = rawSql.replaceAll("[;\\s]+$", "")
    var i = skipWs(sql, 0)
    var withPrefix = ""
    if (keywordAt(sql, i, "with")) {
      // SQLite allows `WITH … INSERT/UPDATE/DELETE`; capture the CTE
      // prefix so an upsert's source SELECT keeps its bindings
      skipCtes(sql, i) match {
        case Some(end) => withPrefix = sql.substring(i, end); i = skipWs(sql, end)
        case None      => return None // unparseable WITH: let spark.sql report
      }
    }
    if (keywordAt(sql, i, "update"))
      return Some(parseUpdate(sql, skipWs(sql, i + 6), withPrefix)
        .getOrElse(Unsupported("UPDATE")))
    if (keywordAt(sql, i, "delete"))
      return Some(parseDelete(sql, skipWs(sql, i + 6), withPrefix)
        .getOrElse(Unsupported("DELETE")))
    if (keywordAt(sql, i, "create")) return parseCreate(sql, skipWs(sql, i + 6))
    if (keywordAt(sql, i, "drop")) {
      var j = skipWs(sql, i + 4)
      if (!keywordAt(sql, j, "table") && !keywordAt(sql, j, "view"))
        return Some(Unsupported("DROP"))
      j = skipWs(sql, j + (if (keywordAt(sql, j, "table")) 5 else 4))
      var ifExists = false
      if (keywordAt(sql, j, "if")) {
        val k = skipWs(sql, j + 2)
        if (!keywordAt(sql, k, "exists")) return Some(Unsupported("DROP"))
        ifExists = true
        j = skipWs(sql, k + 6)
      }
      return parseIdent(sql, j) match {
        case Some((name, _)) => Some(DropRelation(name, ifExists))
        case None            => Some(Unsupported("DROP"))
      }
    }
    if (keywordAt(sql, i, "replace")) {
      val j = skipWs(sql, i + 7)
      // `REPLACE INTO` is the statement; `replace(` is a scalar function
      if (keywordAt(sql, j, "into"))
        return parseUpsert(sql, skipWs(sql, j + 4), withPrefix)
          .orElse(Some(Unsupported("REPLACE INTO")))
      return None
    }
    if (keywordAt(sql, i, "insert")) {
      var j = skipWs(sql, i + 6)
      if (keywordAt(sql, j, "or")) {
        j = skipWs(sql, j + 2)
        var k = j
        while (k < sql.length && isWordChar(sql.charAt(k))) k += 1
        val action = sql.substring(j, k).toLowerCase
        j = skipWs(sql, k)
        if (!keywordAt(sql, j, "into"))
          return Some(Unsupported(s"INSERT OR ${action.toUpperCase}"))
        val at = skipWs(sql, j + 4)
        return action match {
          case "replace" =>
            parseUpsert(sql, at, withPrefix)
              .orElse(Some(Unsupported("INSERT OR REPLACE")))
          // OR IGNORE = skip conflicting rows — the upsert clause's DO
          // NOTHING on the default (leading-column) key, same id
          // convention OR REPLACE resolves against
          case "ignore" =>
            parseUpsert(sql, at, withPrefix, replace = false,
                implied = Some(OnConflict(Nil, Nil, None)))
              .orElse(Some(Unsupported("INSERT OR IGNORE")))
          // OR ABORT / FAIL / ROLLBACK differ only in how a constraint
          // VIOLATION unwinds — ingested tables declare none (pandas
          // to_sql, reference pandasqlite.py:115), so on these tables
          // SQLite executes all three as a plain append. Exact, not a
          // divergence.
          case "abort" | "fail" | "rollback" =>
            parseUpsert(sql, at, withPrefix, replace = false)
              .orElse(Some(Unsupported(s"INSERT OR ${action.toUpperCase}")))
          case other =>
            Some(Unsupported(s"INSERT OR ${other.toUpperCase}"))
        }
      }
      // plain INSERT INTO: SQLite appends — routed onto the same
      // copy-on-write machinery with replacement (the key anti-join)
      // disabled: merged = base ∪ inserted, materialized, re-bound
      if (!keywordAt(sql, j, "into")) return Some(Unsupported("INSERT"))
      return parseUpsert(sql, skipWs(sql, j + 4), withPrefix, replace = false)
        .orElse(Some(Unsupported("INSERT")))
    }
    None
  }

  /** Parse `[OR action] table [INDEXED …] SET a = e, … [WHERE p]
    * [RETURNING r]` starting just after UPDATE. Conflict actions
    * (`UPDATE OR IGNORE …`) and the join form (`UPDATE … FROM`)
    * decline targeted — the lake schema declares no constraints to
    * resolve against, and the join form has no positional SQLite
    * semantics worth guessing at. */
  private def parseUpdate(sql: String, start: Int,
                          withPrefix: String): Option[Stmt] = {
    var j = start
    if (keywordAt(sql, j, "or")) {
      val k = skipWs(sql, j + 2)
      var e = k
      while (e < sql.length && isWordChar(sql.charAt(e))) e += 1
      if (e == k) return None
      return Some(Unsupported(s"UPDATE OR ${sql.substring(k, e).toUpperCase}"))
    }
    val (table, afterTable) = parseIdent(sql, j).getOrElse(return None)
    j = skipIndexedBy(sql, skipWs(sql, afterTable)).getOrElse(return None)
    if (!keywordAt(sql, j, "set")) return None
    j = skipWs(sql, j + 3)
    val assigns = Seq.newBuilder[(String, String)]
    var more = true
    var stopKw: Option[String] = None
    while (more) {
      if (j < sql.length && sql.charAt(j) == '(')
        // row-value form `SET (a, b) = (e1, e2)` — rare; decline named
        return Some(Unsupported("UPDATE with a column-name-list SET"))
      val (c, afterC) = parseIdent(sql, j).getOrElse(return None)
      j = skipWs(sql, afterC)
      if (j >= sql.length || sql.charAt(j) != '=') return None
      j = skipWs(sql, j + 1)
      val (expr, stop, stopped) = scanExpr(sql, j, dmlStops)
      if (expr.trim.isEmpty) return None
      assigns += ((unquoteIdent(c.trim), expr.trim))
      j = stop
      stopped match {
        case Some(",") => j = skipWs(sql, j + 1)
        case other     => stopKw = other; more = false
      }
    }
    finishDml(sql, j, stopKw, withPrefix, "UPDATE") {
      case (where, returning) =>
        Update(table, assigns.result(), where, returning, withPrefix)
    }
  }

  /** Parse `FROM table [INDEXED …] [WHERE p] [RETURNING r]` starting
    * just after DELETE. */
  private def parseDelete(sql: String, start: Int,
                          withPrefix: String): Option[Stmt] = {
    var j = start
    if (!keywordAt(sql, j, "from")) return None
    j = skipWs(sql, j + 4)
    val (table, afterTable) = parseIdent(sql, j).getOrElse(return None)
    j = skipIndexedBy(sql, skipWs(sql, afterTable)).getOrElse(return None)
    val stopKw =
      if (j >= sql.length) None
      else {
        // whatever word sits here must be a clause keyword
        var e = j
        while (e < sql.length && isWordChar(sql.charAt(e))) e += 1
        val w = sql.substring(j, e).toLowerCase
        if (!dmlStops(w)) return None
        Some(w)
      }
    finishDml(sql, j, stopKw, withPrefix, "DELETE") {
      case (where, returning) => Delete(table, where, returning, withPrefix)
    }
  }

  private val dmlStops = Set("where", "from", "returning", "order", "limit")

  /** Shared tail of UPDATE/DELETE: `[WHERE p] [RETURNING r]`, with
    * `ORDER BY`/`LIMIT` (SQLITE_ENABLE_UPDATE_DELETE_LIMIT builds) and
    * UPDATE-join `FROM` declined targeted. `at` points AT the stop
    * keyword when `stopKw` is set. */
  private def finishDml(sql: String, at: Int, stopKw: Option[String],
                        withPrefix: String, verb: String)
                       (mk: ((Option[String], Option[String])) => Stmt)
      : Option[Stmt] = {
    var where: Option[String] = None
    var returning: Option[String] = None
    var j = at
    var kw = stopKw
    while (kw.isDefined) kw match {
      case Some("from") =>
        return Some(Unsupported(s"$verb … FROM (join form)"))
      case Some("order") | Some("limit") =>
        return Some(Unsupported(s"$verb with ORDER BY/LIMIT"))
      case Some("where") =>
        if (where.isDefined) return None
        val (expr, stop, stopped) =
          scanExpr(sql, skipWs(sql, j + 5), dmlStops - "where")
        if (expr.trim.isEmpty || stopped.contains(",")) return None
        where = Some(expr.trim)
        j = stop
        kw = stopped
      case Some("returning") =>
        val rest = sql.substring(skipWs(sql, j + 9)).trim
        if (rest.isEmpty) return None
        returning = Some(rest)
        kw = None
      case _ => return None
    }
    Some(mk((where, returning)))
  }

  /** Skip an optional `INDEXED BY name` / `NOT INDEXED` access-path
    * hint (pure optimizer directives in SQLite — no semantics).
    * Returns the index after the hint, None on a malformed one. */
  private def skipIndexedBy(sql: String, start: Int): Option[Int] = {
    var j = start
    if (keywordAt(sql, j, "indexed")) {
      j = skipWs(sql, j + 7)
      if (!keywordAt(sql, j, "by")) return None
      j = skipWs(sql, j + 2)
      val (_, e) = parseIdent(sql, j).getOrElse(return None)
      Some(skipWs(sql, e))
    } else if (keywordAt(sql, j, "not")) {
      val k = skipWs(sql, j + 3)
      if (!keywordAt(sql, k, "indexed")) return None
      Some(skipWs(sql, k + 7))
    } else Some(j)
  }

  /** Raw expression text from `i` up to the first top-level `,` or
    * stop keyword — quote- and paren-aware, so keywords inside
    * subqueries, literals, and quoted identifiers never stop the scan.
    * Returns (text, index of the stopper, Some(",")/Some(keyword)/None
    * = end of statement). */
  private def scanExpr(sql: String, i: Int,
                       stops: Set[String]): (String, Int, Option[String]) = {
    var j = i
    while (j < sql.length) {
      val c = sql.charAt(j)
      c match {
        case '\'' | '"' | '`' => j = endOfQuoted(sql, j, c)
        case '(' =>
          val e = closeParen(sql, j)
          if (e < 0) return (sql.substring(i), sql.length, None)
          j = e + 1
        case ',' => return (sql.substring(i, j), j, Some(","))
        case _ =>
          if (isWordChar(c)) {
            var e = j
            while (e < sql.length && isWordChar(sql.charAt(e))) e += 1
            val w = sql.substring(j, e).toLowerCase
            if (stops(w)) return (sql.substring(i, j), j, Some(w))
            j = e
          } else j += 1
      }
    }
    (sql.substring(i), sql.length, None)
  }

  /** Parse `[TEMP|TEMPORARY] (VIEW|TABLE) [IF NOT EXISTS] name AS
    * select` starting just after CREATE. Anything else under CREATE
    * (INDEX, TRIGGER, column-def TABLE) declines with the verb named.
    */
  private def parseCreate(sql: String, start: Int): Option[Stmt] = {
    var j = start
    if (keywordAt(sql, j, "temp")) j = skipWs(sql, j + 4)
    else if (keywordAt(sql, j, "temporary")) j = skipWs(sql, j + 9)
    val isView = keywordAt(sql, j, "view")
    val isTable = keywordAt(sql, j, "table")
    if (!isView && !isTable) {
      var k = j
      while (k < sql.length && isWordChar(sql.charAt(k))) k += 1
      val kind = sql.substring(j, k).toUpperCase
      return Some(Unsupported(if (kind.isEmpty) "CREATE" else s"CREATE $kind"))
    }
    j = skipWs(sql, j + (if (isView) 4 else 5))
    var ifNotExists = false
    if (keywordAt(sql, j, "if")) {
      val k = skipWs(sql, j + 2)
      if (!keywordAt(sql, k, "not")) return Some(Unsupported("CREATE"))
      val m = skipWs(sql, k + 3)
      if (!keywordAt(sql, m, "exists")) return Some(Unsupported("CREATE"))
      ifNotExists = true
      j = skipWs(sql, m + 6)
    }
    val verb = if (isView) "CREATE VIEW" else "CREATE TABLE"
    val (name, afterName) = parseIdent(sql, j)
      .getOrElse(return Some(Unsupported(verb)))
    j = skipWs(sql, afterName)
    // a paren after the name: column DEFINITIONS for TABLE (lake
    // tables come from ingest, not DDL), a renaming column list for
    // VIEW — both declined (a visible error beats mis-binding)
    if (j < sql.length && sql.charAt(j) == '(')
      return Some(Unsupported(
        if (isTable) "CREATE TABLE with column definitions"
        else s"$verb with a column list"))
    if (!keywordAt(sql, j, "as"))
      return Some(Unsupported(
        if (isTable) "CREATE TABLE with column definitions" else verb))
    j = skipWs(sql, j + 2)
    if (j >= sql.length) return Some(Unsupported(verb))
    val source = sql.substring(j).trim
    Some(if (isView) CreateView(name, ifNotExists, source)
         else CreateTableAs(name, ifNotExists, source))
  }

  /** Parse `table [(col, …)] (SELECT …| VALUES …) [ON CONFLICT …]`
    * starting at `i`. `implied` is a conflict action the VERB already
    * selected (`INSERT OR IGNORE` = DO NOTHING); an explicit
    * `ON CONFLICT` clause overrides it. Returns the Upsert, a targeted
    * Unsupported for recognized-but-unsound clause forms, or None for
    * statements that don't parse at all (the caller supplies the
    * bare-verb decline). */
  private def parseUpsert(sql: String, i: Int, withPrefix: String,
                          replace: Boolean = true,
                          implied: Option[OnConflict] = None): Option[Stmt] = {
    val (table, afterTable) = parseIdent(sql, i).getOrElse(return None)
    var j = skipWs(sql, afterTable)
    var cols = Seq.empty[String]
    if (j < sql.length && sql.charAt(j) == '(') {
      val close = closeParen(sql, j)
      if (close < 0) return None
      cols = sql.substring(j + 1, close).split(",").toSeq
        .map(c => unquoteIdent(c.trim)).filter(_.nonEmpty)
      if (cols.isEmpty) return None
      j = skipWs(sql, close + 1)
    }
    // truncated statement ("INSERT OR REPLACE INTO t" and nothing
    // else): decline to the targeted Unsupported error, never an
    // index-out-of-bounds from charAt below
    if (j >= sql.length) return None
    // split the source from a trailing upsert clause: the first
    // top-level ON CONFLICT (quotes and parens skipped; a join's ON
    // is never followed by the word CONFLICT)
    val confAt = findOnConflict(sql, j)
    val srcEnd = if (confAt < 0) sql.length else confAt
    val conflict: Option[OnConflict] =
      if (confAt < 0) implied
      else {
        val afterOn = skipWs(sql, confAt + 2) // at CONFLICT
        parseConflict(sql, afterOn + 8) match {
          case Left(u) => return Some(u)
          case Right((c, end)) =>
            val rest = skipWs(sql, end)
            if (rest < sql.length) {
              // a second clause or a RETURNING tail — named decline
              return Some(Unsupported(
                if (findOnConflict(sql, rest) == rest)
                  "INSERT with multiple ON CONFLICT clauses"
                else if (keywordAt(sql, rest, "returning"))
                  "INSERT … RETURNING"
                else "INSERT … ON CONFLICT"))
            }
            Some(c)
        }
      }
    val rest = sql.substring(j, srcEnd).trim
    if (rest.isEmpty) return None
    val source =
      if (keywordAt(sql, j, "select") || sql.charAt(j) == '(')
        s"$withPrefix $rest".trim
      else if (keywordAt(sql, j, "values"))
        // VALUES can't reference CTEs, so the prefix is droppable
        s"SELECT * FROM ($rest)"
      else return None
    Some(Upsert(table, cols, source, replace, conflict))
  }

  /** Index of the first top-level `ON CONFLICT` at or after `i`
    * (outside quotes and parens), or -1. */
  private def findOnConflict(sql: String, i: Int): Int = {
    var j = i
    while (j < sql.length) {
      val c = sql.charAt(j)
      c match {
        case '\'' | '"' | '`' => j = endOfQuoted(sql, j, c)
        case '(' =>
          val e = closeParen(sql, j)
          if (e < 0) return -1
          j = e + 1
        case _ =>
          if (isWordChar(c)) {
            var e = j
            while (e < sql.length && isWordChar(sql.charAt(e))) e += 1
            if (e - j == 2 && sql.substring(j, e).equalsIgnoreCase("on") &&
                keywordAt(sql, skipWs(sql, e), "conflict"))
              return j
            j = e
          } else j += 1
      }
    }
    -1
  }

  /** Parse `[(cols) [WHERE …]] DO (NOTHING | UPDATE SET a = e, …
    * [WHERE p])` starting just after the CONFLICT keyword. Right =
    * (clause, end index); Left = targeted decline. */
  private def parseConflict(sql: String, start: Int)
      : Either[Unsupported, (OnConflict, Int)] = {
    var j = skipWs(sql, start)
    var cols = Seq.empty[String]
    if (j < sql.length && sql.charAt(j) == '(') {
      val close = closeParen(sql, j)
      if (close < 0) return Left(Unsupported("INSERT … ON CONFLICT"))
      val raw = sql.substring(j + 1, close).split(",").toSeq.map(_.trim)
      cols = raw.map(unquoteIdent).filter(_.nonEmpty)
      // an expression target (e.g. lower(email)) names an expression
      // index; only plain column lists key against the lake schema
      if (cols.isEmpty ||
          raw.exists(c => unquoteIdent(c) == c && !c.forall(isWordChar)))
        return Left(Unsupported("ON CONFLICT with an expression target"))
      j = skipWs(sql, close + 1)
      if (keywordAt(sql, j, "where"))
        return Left(Unsupported("ON CONFLICT with a partial-index WHERE"))
    }
    if (!keywordAt(sql, j, "do"))
      return Left(Unsupported("INSERT … ON CONFLICT"))
    j = skipWs(sql, j + 2)
    if (keywordAt(sql, j, "nothing"))
      return Right((OnConflict(cols, Nil, None), j + 7))
    if (!keywordAt(sql, j, "update"))
      return Left(Unsupported("INSERT … ON CONFLICT DO"))
    j = skipWs(sql, j + 6)
    if (!keywordAt(sql, j, "set"))
      return Left(Unsupported("ON CONFLICT DO UPDATE"))
    j = skipWs(sql, j + 3)
    // assignment list, stopping at a trailing WHERE / RETURNING / a
    // second ON CONFLICT (SQLite 3.35 chains; one clause is supported)
    val stops = Set("where", "on", "returning")
    val assigns = Seq.newBuilder[(String, String)]
    var stopKw: Option[String] = None
    var more = true
    while (more) {
      if (j < sql.length && sql.charAt(j) == '(')
        return Left(Unsupported("ON CONFLICT DO UPDATE with a column-name-list SET"))
      val (c, afterC) = parseIdent(sql, j)
        .getOrElse(return Left(Unsupported("ON CONFLICT DO UPDATE")))
      j = skipWs(sql, afterC)
      if (j >= sql.length || sql.charAt(j) != '=')
        return Left(Unsupported("ON CONFLICT DO UPDATE"))
      j = skipWs(sql, j + 1)
      val (expr, stop, stopped) = scanExpr(sql, j, stops)
      if (expr.trim.isEmpty) return Left(Unsupported("ON CONFLICT DO UPDATE"))
      assigns += ((unquoteIdent(c.trim), expr.trim))
      j = stop
      stopped match {
        case Some(",") => j = skipWs(sql, j + 1)
        case other     => stopKw = other; more = false
      }
    }
    stopKw match {
      case None => Right((OnConflict(cols, assigns.result(), None), j))
      case Some("where") =>
        val (expr, stop, stopped) =
          scanExpr(sql, skipWs(sql, j + 5), stops - "where")
        if (expr.trim.isEmpty)
          Left(Unsupported("ON CONFLICT DO UPDATE"))
        else if (stopped.isEmpty)
          Right((OnConflict(cols, assigns.result(), Some(expr.trim)), stop))
        else Left(Unsupported(
          if (stopped.contains("returning")) "INSERT … RETURNING"
          else "INSERT with multiple ON CONFLICT clauses"))
      case Some("returning") => Left(Unsupported("INSERT … RETURNING"))
      case Some("on") =>
        Left(Unsupported("INSERT with multiple ON CONFLICT clauses"))
      case _ => Left(Unsupported("INSERT … ON CONFLICT"))
    }
  }

  /** Rewrite `excluded.col` references — SQLite's upsert qualifier for
    * the would-be-inserted row — to flat `__excl_col` names, the
    * columns [[graft.exec.Upsert]] carries the incoming row under in
    * its update join. Quote-aware: `excluded` inside literals or
    * quoted identifiers is untouched; both bare and quoted column
    * forms rewrite. */
  private[graft] def rewriteExcluded(s: String): String = {
    val out = new StringBuilder
    var j = 0
    while (j < s.length) {
      val c = s.charAt(j)
      if (c == '\'' || c == '"' || c == '`') {
        val e = endOfQuoted(s, j, c)
        out.append(s.substring(j, e)); j = e
      } else if (isWordChar(c)) {
        var e = j
        while (e < s.length && isWordChar(s.charAt(e))) e += 1
        val w = s.substring(j, e)
        var k = skipWs(s, e)
        if (w.equalsIgnoreCase("excluded") && k < s.length &&
            s.charAt(k) == '.') {
          k = skipWs(s, k + 1)
          if (k < s.length &&
              (s.charAt(k) == '"' || s.charAt(k) == '`' || s.charAt(k) == '\'')) {
            val qe = endOfQuoted(s, k, s.charAt(k))
            val name = s.substring(k + 1, qe - 1)
            out.append("`__excl_").append(name.replace("`", "``")).append('`')
            j = qe
          } else if (k < s.length && isWordChar(s.charAt(k))) {
            var ke = k
            while (ke < s.length && isWordChar(s.charAt(ke))) ke += 1
            out.append("__excl_").append(s.substring(k, ke))
            j = ke
          } else { out.append(w); j = e }
        } else { out.append(w); j = e }
      } else { out.append(c); j += 1 }
    }
    out.toString
  }

  /** Identifier at `i`: bare word, or quoted with `` ` ``/`"`/`'`
    * (SQLite accepts all three around table names — the reference's
    * own generated SQL writes `FROM 'hash'`). Returns (name, end). */
  private def parseIdent(sql: String, i: Int): Option[(String, Int)] = {
    if (i >= sql.length) return None
    val c = sql.charAt(i)
    if (c == '`' || c == '"' || c == '\'') {
      val e = endOfQuoted(sql, i, c)
      if (e <= i + 2) None
      else Some((sql.substring(i + 1, e - 1).replace(s"$c$c", s"$c"), e))
    } else if (isWordChar(c)) {
      var e = i
      while (e < sql.length && (isWordChar(sql.charAt(e)) || sql.charAt(e) == '.'))
        e += 1
      Some((sql.substring(i, e), e))
    } else None
  }

  private def unquoteIdent(s: String): String =
    if (s.length >= 2 && (s.head == '`' || s.head == '"' || s.head == '\'') &&
        s.last == s.head)
      s.substring(1, s.length - 1).replace(s"${s.head}${s.head}", s"${s.head}")
    else s

  /** End index just past the last CTE's closing paren of a `WITH`
    * clause starting at `i` (which must point at the WITH keyword). */
  private def skipCtes(sql: String, i: Int): Option[Int] = {
    var j = skipWs(sql, i + 4)
    if (keywordAt(sql, j, "recursive")) j = skipWs(sql, j + 9)
    var done = false
    var end = -1
    while (!done) {
      val (_, afterName) = parseIdent(sql, j).getOrElse(return None)
      j = skipWs(sql, afterName)
      if (j < sql.length && sql.charAt(j) == '(') { // optional column list
        val c = closeParen(sql, j); if (c < 0) return None
        j = skipWs(sql, c + 1)
      }
      if (!keywordAt(sql, j, "as")) return None
      j = skipWs(sql, j + 2)
      if (j >= sql.length || sql.charAt(j) != '(') return None
      val close = closeParen(sql, j)
      if (close < 0) return None
      end = close + 1
      j = skipWs(sql, close + 1)
      if (j < sql.length && sql.charAt(j) == ',') j = skipWs(sql, j + 1)
      else done = true
    }
    Some(end)
  }

  private def skipWs(sql: String, i: Int): Int = {
    var j = i
    while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
    j
  }
}
