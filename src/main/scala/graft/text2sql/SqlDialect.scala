package graft.text2sql

import scala.util.matching.Regex

/** SQLite → Spark SQL dialect translation for generated SQL.
  *
  * The reference instructs its model to emit "SQL compliant to SQLite"
  * (reference pandasqlite/pandasqlite.py:220-225); this engine asks for
  * Spark SQL, but a model fed SQLite-era few-shots still produces
  * SQLite-isms. This post-processor rewrites the mechanical ones so a
  * reference user's existing prompts and cached curricula keep working:
  *
  *  - `x GLOB 'pat'`        → `x RLIKE '<anchored regex>'`
  *  - `julianday(x)`        → explicit noon-based Julian Date formula
  *  - `random()`            → `rand()` (seeded variants left alone)
  *  - `ifnull/instr/substr` → already valid Spark SQL (no-op)
  *
  * Double-quoted string literals (`WHERE survived="1"`, reference
  * curriculum example :161) already parse as literals under Spark's
  * default `spark.sql.ansi.doubleQuotedIdentifiers=false` — no rewrite.
  */
object SqlDialect {

  // the pattern literal honors SQL '' escaping ((?:[^']|'')*)
  private val globRe: Regex =
    """(?i)(\S+)\s+GLOB\s+'((?:[^']|'')*)'""".r

  private val randomRe: Regex =
    """(?i)\brandom\s*\(\s*\)""".r

  def translate(sql: String): String = {
    var out = sql
    out = globRe.replaceAllIn(out, m => {
      val col = Regex.quoteReplacement(m.group(1))
      val pattern = m.group(2).replace("''", "'") // un-escape SQL quotes
      val regex = Regex.quoteReplacement(
        graft.functions.Glob.toRegex(pattern)
          .replace("\\", "\\\\").replace("'", "''"))
      s"$col RLIKE '$regex'"
    })
    out = rewriteJulianday(out)
    out = randomRe.replaceAllIn(out, "rand()")
    out
  }

  /** Rewrite every julianday(...) call, scanning to the BALANCED
    * closing paren so nested calls like julianday(max(ts)) work
    * (a regex cannot match arbitrary nesting).
    */
  private def rewriteJulianday(sql: String): String = {
    val lower = sql.toLowerCase
    val idx = lower.indexOf("julianday")
    if (idx < 0) return sql
    var i = idx + "julianday".length
    while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
    if (i >= sql.length || sql.charAt(i) != '(') return sql
    var depth = 0
    var j = i
    var end = -1
    while (j < sql.length && end < 0) {
      sql.charAt(j) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) end = j
        case _ =>
      }
      j += 1
    }
    if (end < 0) return sql
    val arg = sql.substring(i + 1, end).trim
    // decimal literal would make the whole expression DECIMAL; the
    // SQLite function returns a float → force DOUBLE
    val repl = s"(CAST(2440587.5 AS DOUBLE) + (unix_micros(CAST($arg AS TIMESTAMP)) / 1000000.0) / 86400.0)"
    sql.substring(0, idx) + repl + rewriteJulianday(sql.substring(end + 1))
  }
}
