package graft.functions

/** SQLite GLOB pattern → anchored Java regex (SURVEY.md §2B:
  * `GLOB` → `rlike` translation). GLOB matches the whole string,
  * case-sensitively: `*` = any run, `?` = any single char,
  * `[...]` = character class (passed through).
  */
object Glob {
  def toRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    var inClass = false
    while (i < glob.length) {
      val c = glob.charAt(i)
      c match {
        case '*' if !inClass => sb ++= ".*"
        case '?' if !inClass => sb += '.'
        case '[' => inClass = true; sb += '['
        case ']' => inClass = false; sb += ']'
        case '^' if inClass => sb += '^'
        case _ if inClass => sb += c
        case _ if "\\.[]{}()<>*+-=!?^$|".indexOf(c) >= 0 => sb += '\\' += c
        case _ => sb += c
      }
      i += 1
    }
    sb += '$'
    sb.result()
  }
}
