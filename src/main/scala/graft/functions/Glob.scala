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
    var classStart = -1 // index in sb of the last '[' we emitted
    while (i < glob.length) {
      val c = glob.charAt(i)
      c match {
        case '*' if !inClass => sb ++= ".*"
        case '?' if !inClass => sb += '.'
        case '[' if !inClass => inClass = true; classStart = sb.length; sb += '['
        case ']' if inClass => inClass = false; sb += ']'
        case '^' | '-' if inClass => sb += c
        case _ if inClass =>
          // escape everything else inside the class (a backslash or
          // bracket would otherwise break the regex)
          if ("\\[]&".indexOf(c) >= 0) sb += '\\'
          sb += c
        case _ if "\\.[]{}()<>*+-=!?^$|".indexOf(c) >= 0 => sb += '\\' += c
        case _ => sb += c
      }
      i += 1
    }
    // unterminated class: treat the opening '[' as a literal, as GLOB
    // patterns must still be valid regexes rather than throw at runtime
    if (inClass) sb.insert(classStart, '\\')
    sb += '$'
    sb.result()
  }
}
