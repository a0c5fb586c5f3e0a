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

  private val globRe: Regex =
    """(?i)(\S+)\s+GLOB\s+'([^']*)'""".r

  private val julianRe: Regex =
    """(?i)julianday\s*\(([^()]*)\)""".r

  private val randomRe: Regex =
    """(?i)\brandom\s*\(\s*\)""".r

  def translate(sql: String): String = {
    var out = sql
    out = globRe.replaceAllIn(out, m => {
      val col = Regex.quoteReplacement(m.group(1))
      val regex = Regex.quoteReplacement(
        graft.functions.Glob.toRegex(m.group(2)).replace("\\", "\\\\"))
      s"$col RLIKE '$regex'"
    })
    out = julianRe.replaceAllIn(out, m => {
      val arg = Regex.quoteReplacement(m.group(1).trim)
      // decimal literal would make the whole expression DECIMAL; the
      // SQLite function returns a float → force DOUBLE
      s"(CAST(2440587.5 AS DOUBLE) + (unix_micros(CAST($arg AS TIMESTAMP)) / 1000000.0) / 86400.0)"
    })
    out = randomRe.replaceAllIn(out, "rand()")
    out
  }
}
