package graft.functions

/** SQLite GLOB pattern → anchored Java regex (SURVEY.md §2B:
  * `GLOB` → `rlike` translation). GLOB matches the whole string,
  * case-sensitively: `*` = any run, `?` = any single char,
  * `[...]` = character class (`]` as the first member is a literal,
  * as in SQLite/fnmatch). Malformed patterns (unterminated class)
  * fall back to treating every `[` literally so the result is always
  * a valid regex rather than a runtime PatternSyntaxException.
  */
object Glob {

  def toRegex(glob: String): String =
    translate(glob, classesEnabled = true).getOrElse(
      translate(glob, classesEnabled = false).get)

  /** Returns None when classesEnabled and a class is unterminated. */
  private def translate(glob: String, classesEnabled: Boolean): Option[String] = {
    val sb = new StringBuilder("^")
    var i = 0
    var inClass = false
    var classPos = 0 // members emitted since '[' (after optional '^')
    while (i < glob.length) {
      val c = glob.charAt(i)
      if (inClass) {
        c match {
          case ']' if classPos > 0 => inClass = false; sb += ']'
          case ']' => sb ++= "\\]"; classPos += 1 // leading ] is literal
          case '^' if classPos == 0 && sb.last == '[' => sb += '^'
          case '-' => sb += '-'; classPos += 1
          case _ =>
            if ("\\[&".indexOf(c) >= 0) sb += '\\'
            sb += c; classPos += 1
        }
      } else c match {
        case '*' => sb ++= ".*"
        case '?' => sb += '.'
        case '[' if classesEnabled => inClass = true; classPos = 0; sb += '['
        case _ if "\\.[]{}()<>*+-=!?^$|".indexOf(c) >= 0 => sb += '\\' += c
        case _ => sb += c
      }
      i += 1
    }
    if (inClass) None else Some((sb += '$').result())
  }
}
