package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** Restores data-source filter pushdown for anchored regex filters.
  *
  * `x RLIKE '^literal...'` — the shape every GLOB→RLIKE translation
  * produces (`text2sql.SqlDialect.rewriteGlob`, `functions.Glob`) —
  * is opaque to the parquet/ORC readers: regex filters are never
  * pushed, so a `GLOB 'gre*'` that SQLite would serve with an index
  * becomes a full-scan-then-filter at 100 TB. This rule extracts the
  * regex's literal anchored prefix and adds a redundant
  * `StartsWith(x, prefix)` conjunct; StartsWith IS pushable
  * (`PushedFilters: [StringStartsWith(...)]` at the scan), so row
  * groups whose column statistics exclude the prefix are skipped
  * entirely. The original RLIKE stays — semantics are unchanged, the
  * conjunct only prunes.
  *
  * Conservative by construction: only `^` + a run of [A-Za-z0-9 _]
  * counts as prefix, and the run's last char is dropped when a
  * quantifier follows it (in `^gren?`, 'n' is optional — the safe
  * prefix is "gre"). Idempotent: skips when the same guard is already
  * present (the optimizer runs batches to fixpoint).
  */
object RegexPrefixPushdown extends Rule[LogicalPlan] {

  /** Longest prefix every match must start with, if any. */
  private[plans] def safePrefix(regex: String): Option[String] = {
    if (!regex.startsWith("^")) return None
    var i = 1
    while (i < regex.length && isSafe(regex.charAt(i))) i += 1
    var end = i
    // a quantifier makes the preceding char optional/repeatable
    if (i < regex.length && "*?{".indexOf(regex.charAt(i)) >= 0) end -= 1
    // '|' anywhere unanchors the tail: '^ab|cd' matches plain "cd"
    if (regex.indexOf('|') >= 0) return None
    if (end <= 1) None else Some(regex.substring(1, end))
  }

  private def isSafe(c: Char): Boolean =
    c.isLetterOrDigit && c < 128 || c == ' ' || c == '_'

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val guarded = cond.collect {
        case StartsWith(a, Literal(p, StringType)) if p != null =>
          (a.canonicalized, p.toString)
      }.toSet
      val rewritten = cond.transformUp {
        case r @ RLike(attr, Literal(p, StringType)) if p != null =>
          safePrefix(p.toString) match {
            case Some(pre) if !guarded((attr.canonicalized, pre)) =>
              And(StartsWith(attr, Literal(pre)), r)
            case _ => r
          }
      }
      if (rewritten fastEquals cond) f else f.copy(condition = rewritten)
  }
}
