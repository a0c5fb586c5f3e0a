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
  * leaves). Every other verb — INSERT without OR REPLACE, UPDATE,
  * DELETE — raises a targeted read-only-engine error instead of
  * Spark's generic `ParseException`/`AnalysisException`.
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
    * the full target schema, as in SQLite.
    */
  final case class Upsert(table: String, cols: Seq[String],
                          sourceSql: String,
                          replace: Boolean = true) extends Stmt

  /** A DML verb this engine declines (read-only lake storage). */
  final case class Unsupported(verb: String) extends Stmt

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
    if (keywordAt(sql, i, "update")) return Some(Unsupported("UPDATE"))
    if (keywordAt(sql, i, "delete")) return Some(Unsupported("DELETE"))
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
        if (!keywordAt(sql, j, "replace")) {
          // OR IGNORE / OR ABORT / OR FAIL / OR ROLLBACK: conflict
          // actions over constraints the lake schema doesn't declare
          var k = j
          while (k < sql.length && isWordChar(sql.charAt(k))) k += 1
          return Some(Unsupported(s"INSERT OR ${sql.substring(j, k).toUpperCase}"))
        }
        j = skipWs(sql, j + 7)
        if (!keywordAt(sql, j, "into")) return Some(Unsupported("INSERT"))
        return parseUpsert(sql, skipWs(sql, j + 4), withPrefix)
          .orElse(Some(Unsupported("INSERT OR REPLACE")))
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

  /** Parse `table [(col, …)] (SELECT …| VALUES …)` starting at `i`. */
  private def parseUpsert(sql: String, i: Int, withPrefix: String,
                          replace: Boolean = true): Option[Upsert] = {
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
    val rest = sql.substring(j).trim
    val source =
      if (keywordAt(sql, j, "select") || sql.charAt(j) == '(')
        s"$withPrefix $rest".trim
      else if (keywordAt(sql, j, "values"))
        // VALUES can't reference CTEs, so the prefix is droppable
        s"SELECT * FROM ($rest)"
      else return None
    Some(Upsert(table, cols, source, replace))
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
