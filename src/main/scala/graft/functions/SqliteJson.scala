package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** SQLite JSON1 mutation surface (json_set / json_insert /
  * json_replace / json_remove / json_patch / json_type / json_quote)
  * as native Catalyst expressions — Spark has NO JSON mutation
  * functions at all, and a pure-SQL rewrite cannot express "edit this
  * path inside schemaless JSON text".
  *
  * The evaluator is a RAW-TOKEN-PRESERVING JSON tree, not a Jackson
  * round-trip: SQLite's editors minify whitespace but keep every
  * untouched scalar's source text byte-for-byte (`json('[1.50,2e2]')`
  * = `'[1.50,2e2]'`, `"é"` stays escaped) — a standard JSON
  * library would normalize `1.50` → `1.5` and silently diverge.
  * Scalars therefore store their raw source slice; only object KEYS
  * are unescaped (for path matching).
  *
  * Edit semantics pinned against SQLite 3.40 (see SqliteJsonSpec for
  * the golden matrix):
  *   - edits apply left-to-right; each pair sees the prior result
  *   - set/insert CREATE missing paths, recursively, but an array
  *     step only creates at index == length (append) — a gap is a
  *     silent no-op, as is descending into a scalar
  *   - insert never overwrites; replace never creates
  *   - `$[#]` appends; `$[#-n]` counts from the end
  *   - remove of `$` yields SQL NULL; removing a missing path is a
  *     no-op; `json_remove(x)` with no paths minifies
  *   - malformed JSON input raises (as SQLite does); NULL json/path
  *     arguments yield NULL
  */
object SqliteJson {

  final class JsonError(msg: String, val pos: Int = -1)
      extends IllegalArgumentException(msg)

  // ------------------------------------------------------------ tree

  /** (unescaped key, raw key token incl. quotes, value). */
  private type Field = (String, String, Node)

  sealed private[functions] trait Node
  private final case class JObj(fields: ArrayBuffer[Field]) extends Node
  private final case class JArr(items: ArrayBuffer[Node]) extends Node
  /** Number / string / true / false / null — raw source text. */
  private final case class JScalar(raw: String) extends Node

  // ---------------------------------------------------------- parser

  /** SQLite's nesting cap (SQLITE_JSON_MAX_DEPTH): beyond it the
    * document is "malformed JSON". Also what keeps the recursive
    * parse/render/walk inside the JVM stack — an uncapped adversarial
    * '[[[…' document would otherwise escape the JsonError totality
    * contract with a StackOverflowError. */
  private val MaxDepth = 1000

  private final class Parser(s: String) {
    private var i = 0
    private var depth = 0
    private def fail(): Nothing =
      throw new JsonError("malformed JSON", math.min(i, s.length - 1))
    private def enter(): Unit = {
      depth += 1
      if (depth > MaxDepth) fail()
    }
    private def ws(): Unit =
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1

    def parse(): Node = {
      ws(); val n = value(); ws()
      if (i != s.length) fail()
      n
    }

    private def value(): Node = {
      if (i >= s.length) fail()
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JScalar(rawString())
        case 't' => lit("true")
        case 'f' => lit("false")
        case 'n' => lit("null")
        case _   => number()
      }
    }

    private def lit(word: String): Node = {
      if (!s.startsWith(word, i)) fail()
      i += word.length
      JScalar(word)
    }

    private def obj(): Node = {
      enter()
      i += 1; ws()
      val fields = new ArrayBuffer[Field]()
      if (i < s.length && s.charAt(i) == '}') {
        i += 1; depth -= 1; return JObj(fields)
      }
      while (true) {
        ws()
        if (i >= s.length || s.charAt(i) != '"') fail()
        val rawKey = rawString()
        val key = unescape(rawKey)
        ws()
        if (i >= s.length || s.charAt(i) != ':') fail()
        i += 1; ws()
        fields += ((key, rawKey, value()))
        ws()
        if (i >= s.length) fail()
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; depth -= 1; return JObj(fields)
          case _   => fail()
        }
      }
      JObj(fields) // unreachable
    }

    private def arr(): Node = {
      enter()
      i += 1; ws()
      val items = new ArrayBuffer[Node]()
      if (i < s.length && s.charAt(i) == ']') {
        i += 1; depth -= 1; return JArr(items)
      }
      while (true) {
        ws()
        items += value()
        ws()
        if (i >= s.length) fail()
        s.charAt(i) match {
          case ',' => i += 1
          case ']' => i += 1; depth -= 1; return JArr(items)
          case _   => fail()
        }
      }
      JArr(items) // unreachable
    }

    /** Raw string token INCLUDING the quotes; escapes validated (the
      * strict JSON set — SQLite rejects `\q` and truncated `\uXXXX`)
      * but kept verbatim. */
    private def rawString(): String = {
      val start = i
      i += 1
      while (i < s.length) {
        s.charAt(i) match {
          case '"'  => i += 1; return s.substring(start, i)
          case '\\' =>
            if (i + 1 >= s.length) fail()
            s.charAt(i + 1) match {
              case '"' | '\\' | '/' | 'b' | 'f' | 'n' | 'r' | 't' =>
                i += 2
              case 'u' =>
                if (i + 5 >= s.length ||
                    !(2 to 5).forall(o => isHex(s.charAt(i + o)))) fail()
                i += 6
              case _ => fail()
            }
          case c if c < ' ' => fail()
          case _ => i += 1
        }
      }
      fail()
    }

    private def isHex(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

    /** Strict JSON number grammar — SQLite rejects `+5`, `.5`, `5.`,
      * and leading zeros like `01`, all of which a lenient scan would
      * accept and then declare "valid" against json_valid's verdict. */
    private def number(): Node = {
      val start = i
      if (i < s.length && s.charAt(i) == '-') i += 1
      if (i >= s.length || !s.charAt(i).isDigit) fail()
      if (s.charAt(i) == '0') i += 1
      else while (i < s.length && s.charAt(i).isDigit) i += 1
      if (i < s.length && s.charAt(i) == '.') {
        i += 1
        if (i >= s.length || !s.charAt(i).isDigit) fail()
        while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
        if (i >= s.length || !s.charAt(i).isDigit) fail()
        while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      JScalar(s.substring(start, i))
    }
  }

  /** Unescape a raw string token (with quotes) to its text value. */
  private def unescape(raw: String): String = {
    val sb = new java.lang.StringBuilder(raw.length - 2)
    var i = 1
    while (i < raw.length - 1) {
      val c = raw.charAt(i)
      if (c == '\\') {
        i += 1
        raw.charAt(i) match {
          case '"'  => sb.append('"')
          case '\\' => sb.append('\\')
          case '/'  => sb.append('/')
          case 'b'  => sb.append('\b')
          case 'f'  => sb.append('\f')
          case 'n'  => sb.append('\n')
          case 'r'  => sb.append('\r')
          case 't'  => sb.append('\t')
          case 'u'  =>
            if (i + 4 >= raw.length) throw new JsonError("malformed JSON")
            sb.append(Integer.parseInt(raw.substring(i + 1, i + 5), 16).toChar)
            i += 4
          case _ => throw new JsonError("malformed JSON")
        }
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def render(n: Node): String = {
    val sb = new java.lang.StringBuilder
    renderTo(n, sb)
    sb.toString
  }

  private def renderTo(n: Node, sb: java.lang.StringBuilder): Unit = n match {
    case JScalar(raw) => sb.append(raw)
    case JArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it =>
        if (!first) sb.append(','); first = false
        renderTo(it, sb)
      }
      sb.append(']')
    case JObj(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (_, rawKey, v) =>
        if (!first) sb.append(','); first = false
        sb.append(rawKey).append(':')
        renderTo(v, sb)
      }
      sb.append('}')
  }

  // ------------------------------------------------------------ path

  sealed private trait Step
  private final case class Key(name: String) extends Step
  private final case class Idx(i: Int) extends Step
  /** `[#-n]`; n == 0 is `[#]` (append position). */
  private final case class FromEnd(n: Int) extends Step

  private def pathError(p: String): Nothing =
    throw new JsonError(s"JSON path error near '$p'")

  /** Path steps share the document [[MaxDepth]] cap: the edit/build/
    * render recursion is one frame per step, so an uncapped
    * `'$'+'.a'*100000` path would escape the JsonError totality
    * contract with a StackOverflowError (a path deeper than the
    * deepest legal document can never address anything anyway). */
  private def parsePath(p: String): List[Step] = {
    if (p.isEmpty || p.charAt(0) != '$') pathError(p)
    val steps = List.newBuilder[Step]
    var nSteps = 0
    def step(s: Step): Unit = {
      nSteps += 1
      if (nSteps > MaxDepth) throw new JsonError("JSON path too deep")
      steps += s
    }
    var i = 1
    while (i < p.length) {
      p.charAt(i) match {
        case '.' =>
          i += 1
          if (i >= p.length) pathError(p)
          if (p.charAt(i) == '"') {
            val end = p.indexOf('"', i + 1)
            if (end < 0) pathError(p)
            step(Key(p.substring(i + 1, end)))
            i = end + 1
          } else {
            val start = i
            while (i < p.length && p.charAt(i) != '.' && p.charAt(i) != '[') i += 1
            if (i == start) pathError(p)
            step(Key(p.substring(start, i)))
          }
        case '[' =>
          val end = p.indexOf(']', i)
          if (end < 0) pathError(p)
          val body = p.substring(i + 1, end)
          if (body == "#") step(FromEnd(0))
          else if (body.startsWith("#-")) {
            val n = try body.substring(2).toInt
                    catch { case _: NumberFormatException => pathError(p) }
            if (n < 0) pathError(p)
            step(FromEnd(n))
          } else {
            val n = try body.toInt
                    catch { case _: NumberFormatException => pathError(p) }
            if (n < 0) pathError(p)
            step(Idx(n))
          }
          i = end + 1
        case _ => pathError(p)
      }
    }
    steps.result()
  }

  // ----------------------------------------------------------- edits

  /** Quote a plain text key for creation (keys created by an edit are
    * escaped the standard way; existing keys keep their raw form). */
  private def quoteKey(k: String): String = quoteText(k)

  /** JSON-escape arbitrary text into a quoted token — SQLite escapes
    * the two mandatory characters and controls, leaving non-ASCII
    * text raw. */
  def quoteText(t: String): String = {
    val sb = new java.lang.StringBuilder(t.length + 2)
    sb.append('"')
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    sb.toString
  }

  /** Apply ONE edit; returns the (possibly new) root, or the root
    * unchanged on the documented no-op cases. `mode`: 0=set 1=insert
    * 2=replace. */
  private def edit(root: Node, steps: List[Step], value: Node,
                   mode: Int): Node = steps match {
    case Nil => // root path `$`
      if (mode == 1) root // insert: root always exists → no-op
      else value          // set / replace: whole-document replace
    case _ =>
      descend(root, steps, value, mode)
      root
  }

  /** Recursive descent; mutates in place. Returns true iff the edit
    * landed (used only for recursion bookkeeping). */
  private def descend(node: Node, steps: List[Step], value: Node,
                      mode: Int): Unit = (node, steps) match {
    case (JObj(fields), Key(name) :: rest) =>
      val at = fields.indexWhere(_._1 == name)
      if (at >= 0) {
        if (rest.isEmpty) {
          if (mode != 1) fields(at) = (name, fields(at)._2, value) // set/replace
        } else descend(fields(at)._3, rest, value, mode)
      } else if (mode != 2) { // set / insert create
        build(rest, value).foreach { created =>
          fields += ((name, quoteKey(name), created))
        }
      }
    case (JArr(items), step :: rest) =>
      val idx = step match {
        case Idx(n)     => n
        case FromEnd(0) => items.length
        case FromEnd(n) => items.length - n
        case _          => return
      }
      if (idx >= 0 && idx < items.length) {
        if (rest.isEmpty) {
          if (mode != 1) items(idx) = value
        } else descend(items(idx), rest, value, mode)
      } else if (idx == items.length && mode != 2) { // append-create
        build(rest, value).foreach(items += _)
      }
    case _ => // scalar parent, or step kind mismatch → silent no-op
  }

  /** Materialize the remaining path around `value`: objects for key
    * steps, arrays for index-0/append steps; a gap index aborts the
    * whole creation (None → the edit is a no-op). */
  private def build(steps: List[Step], value: Node): Option[Node] =
    steps match {
      case Nil => Some(value)
      case Key(name) :: rest =>
        build(rest, value).map(v =>
          JObj(ArrayBuffer((name, quoteKey(name), v))))
      case (Idx(0) | FromEnd(0)) :: rest =>
        build(rest, value).map(v => JArr(ArrayBuffer(v)))
      case _ => None
    }

  /** Remove the path; Some(root) (mutated) or None when the root
    * itself was removed. */
  private def removePath(root: Node, steps: List[Step]): Option[Node] =
    steps match {
      case Nil => None
      case _   => removeIn(root, steps); Some(root)
    }

  private def removeIn(node: Node, steps: List[Step]): Unit =
    (node, steps) match {
      case (JObj(fields), Key(name) :: rest) =>
        val at = fields.indexWhere(_._1 == name)
        if (at >= 0) {
          if (rest.isEmpty) fields.remove(at)
          else removeIn(fields(at)._3, rest)
        }
      case (JArr(items), step :: rest) =>
        val idx = step match {
          case Idx(n)     => n
          case FromEnd(n) => items.length - n
          case Key(_)     => return
        }
        if (idx >= 0 && idx < items.length) {
          if (rest.isEmpty) items.remove(idx)
          else removeIn(items(idx), rest)
        }
      case _ =>
    }

  private def lookup(node: Node, steps: List[Step]): Option[Node] =
    steps match {
      case Nil => Some(node)
      case Key(name) :: rest =>
        node match {
          case JObj(fields) =>
            fields.find(_._1 == name).flatMap(f => lookup(f._3, rest))
          case _ => None
        }
      case step :: rest =>
        node match {
          case JArr(items) =>
            val idx = step match {
              case Idx(n)     => n
              case FromEnd(n) => items.length - n
              case _          => return None
            }
            if (idx >= 0 && idx < items.length) lookup(items(idx), rest)
            else None
          case _ => None
        }
    }

  // ---------------------------------------- static helpers (codegen)

  /** One set/insert/replace step. `value` is JSON TEXT (the builders
    * pre-render SQL values, including the subtype splice). */
  def editJson(json: UTF8String, path: UTF8String, value: UTF8String,
               mode: Int): UTF8String = {
    val root = new Parser(json.toString).parse()
    val v = new Parser(value.toString).parse()
    UTF8String.fromString(
      render(edit(root, parsePath(path.toString), v, mode)))
  }

  /** One remove step; null when the root itself is removed. */
  def removeJson(json: UTF8String, path: UTF8String): UTF8String = {
    val root = new Parser(json.toString).parse()
    removePath(root, parsePath(path.toString)) match {
      case Some(n) => UTF8String.fromString(render(n))
      case None    => null
    }
  }

  /** Validate + minify, preserving raw scalar text. */
  def minifyJson(json: UTF8String): UTF8String =
    UTF8String.fromString(render(new Parser(json.toString).parse()))

  /** json_type; null when the path selects nothing (a NULL path is
    * handled by the expression, which never calls in with one). */
  def typeJson(json: UTF8String, path: UTF8String): UTF8String = {
    val root = new Parser(json.toString).parse()
    val steps = parsePath(path.toString)
    lookup(root, steps) match {
      case None => null
      case Some(n) => UTF8String.fromString(n match {
        case JObj(_) => "object"
        case JArr(_) => "array"
        case JScalar(raw) =>
          if (raw == "true" || raw == "false" || raw == "null") raw
          else if (raw.charAt(0) == '"') "text"
          else if (raw.exists(c => c == '.' || c == 'e' || c == 'E')) "real"
          else "integer"
      })
    }
  }

  /** RFC-7386 merge patch (SQLite json_patch). */
  def patchJson(a: UTF8String, b: UTF8String): UTF8String = {
    val target = new Parser(a.toString).parse()
    val patch = new Parser(b.toString).parse()
    UTF8String.fromString(render(mergePatch(target, patch)))
  }

  private def mergePatch(target: Node, patch: Node): Node = patch match {
    case JObj(pf) =>
      val base = target match {
        case o: JObj => o
        case _       => JObj(new ArrayBuffer[Field]())
      }
      pf.foreach { case (key, rawKey, pv) =>
        val at = base.fields.indexWhere(_._1 == key)
        pv match {
          case JScalar("null") =>
            if (at >= 0) base.fields.remove(at)
          case _ =>
            val merged =
              if (at >= 0) mergePatch(base.fields(at)._3, pv)
              else mergePatch(JScalar("null"), pv)
            if (at >= 0) base.fields(at) = (key, base.fields(at)._2, merged)
            else base.fields += ((key, rawKey, merged))
        }
      }
      base
    case _ => patch
  }

  /** JSON-escape a text value (json_quote on TEXT). */
  def quoteString(s: UTF8String): UTF8String =
    UTF8String.fromString(quoteText(s.toString))

  /** Render an EXTRACTION result (get_json_object output) as an edit
    * value — the runtime face of SQLite's JSON subtype for extracted
    * values, which graft's string-typed extraction erases: containers
    * splice (json_extract of an object/array carries the subtype),
    * numeric text and true/false/null splice bare (SQLite's extracted
    * numbers/booleans are SQL values that render bare), anything else
    * quotes as text. Known divergence (README): an extracted STRING
    * whose text is exactly 'true'/'false'/a number, and `->>` of a
    * container (never subtyped in SQLite), splice here.
    */
  def spliceOrQuote(v: UTF8String): UTF8String = {
    val t = v.toString.trim
    // extracted booleans are SQL INTEGERs in SQLite and render bare 1/0
    if (t == "true") return UTF8String.fromString("1")
    if (t == "false") return UTF8String.fromString("0")
    if (t == "null") return UTF8String.fromString("null")
    val looksJson = t.nonEmpty && (t.charAt(0) match {
      case '{' | '[' => true
      case _ =>
        try { java.lang.Double.parseDouble(t); true }
        catch { case _: NumberFormatException => false }
    })
    if (looksJson)
      try SqliteJson.minifyJson(UTF8String.fromString(t))
      catch { case _: JsonError => quoteString(v) }
    else quoteString(v)
  }

  /** json_error_position (SQLite 3.42): 0 for well-formed input, else
    * the 1-based character position of the first detected error —
    * SQLite documents the position as approximate, and this parser's
    * first-failure index is exactly such an approximation. */
  def errorPosition(json: UTF8String): Int =
    try { new Parser(json.toString).parse(); 0 }
    catch { case e: JsonError => math.max(e.pos, 0) + 1 }

  // --------------------------------- json_each / json_tree row walk

  /** One row of the table-valued json_each/json_tree: (key, value,
    * type, atom, id, parent, fullkey, path) — value/atom rendered to
    * SQL as SQLite does (text unquoted, numbers raw, true/false →
    * 1/0, containers as JSON text, JSON null → SQL NULL). `id` and
    * `parent` are sequential DFS ordinals: SQLite documents its ids
    * as an implementation detail ("may change from one release to the
    * next"), so only the identify-your-parent role is preserved, not
    * the exact numbers (README divergence table).
    */
  final case class EachRow(key: String, value: String, tpe: String,
                           atom: String, id: Int, parent: Integer,
                           fullkey: String, path: String)

  private def bareKey(k: String): Boolean =
    k != null && k.nonEmpty && !k.head.isDigit &&
      k.forall(c => c.isLetterOrDigit || c == '_')

  private def childFullkey(parent: String, key: Either[String, Int]): String =
    key match {
      case Right(i) => s"$parent[$i]"
      case Left(k) if bareKey(k) => s"$parent.$k"
      case Left(k) => s"""$parent."$k""""
    }

  private def eachType(n: Node): String = n match {
    case JObj(_) => "object"
    case JArr(_) => "array"
    case JScalar(raw) =>
      if (raw == "true" || raw == "false" || raw == "null") raw
      else if (raw.charAt(0) == '"') "text"
      else if (raw.exists(c => c == '.' || c == 'e' || c == 'E')) "real"
      else "integer"
  }

  private def eachValue(n: Node): String = n match {
    case o: JObj => render(o)
    case a: JArr => render(a)
    case JScalar("true")  => "1"
    case JScalar("false") => "0"
    case JScalar("null")  => null
    case JScalar(raw) =>
      if (raw.charAt(0) == '"') unescape(raw) else raw
  }

  private def eachAtom(n: Node): String = n match {
    case _: JObj | _: JArr => null
    case s: JScalar        => eachValue(s)
  }

  /** How json_tree re-renders the PATH ARGUMENT's steps into its
    * fullkey/path columns (pinned against sqlite 3.40.1 in
    * SqliteJsonSpec): key steps canonicalize (a quoted-but-bare
    * `$."a"` prints `$.a`), and EVERY array step — `[1]`, `[#-1]`,
    * any index — prints `[0]`: SQLite renders those steps from its
    * iterator counter, which is always 0 for the seeded root chain
    * (`json_tree(x,'$[1][1]')` reports fullkey `$[0][0]`). json_each
    * does NOT re-render — its strings carry the argument verbatim. */
  private def renderTreeStep(sb: java.lang.StringBuilder, s: Step): Unit =
    s match {
      case Key(k) if bareKey(k) => sb.append('.').append(k)
      case Key(k)               => sb.append(".\"").append(k).append('"')
      case _                    => sb.append("[0]")
    }

  /** json_each (recursive=false): the children of the path node, or
    * one row for a scalar. json_tree (recursive=true): the path node
    * itself plus every descendant, DFS order. Missing path → empty.
    */
  def walk(json: String, path: String, recursive: Boolean): Seq[EachRow] = {
    val root = new Parser(json).parse()
    val steps = parsePath(path)
    val start = lookup(root, steps) match {
      case Some(n) => n
      case None    => return Nil
    }
    val out = Seq.newBuilder[EachRow]
    var nextId = 0
    def emit(key: Either[String, Int], n: Node, parent: Integer,
             fullkey: String, pathStr: String): Int = {
      val id = nextId
      nextId += 1
      out += EachRow(
        key match { case Left(k) => k; case Right(i) => i.toString },
        eachValue(n), eachType(n), eachAtom(n), id, parent, fullkey, pathStr)
      id
    }
    def children(n: Node, parent: Integer, fullkey: String): Unit = n match {
      case JObj(fields) =>
        fields.foreach { case (k, _, v) =>
          val fk = childFullkey(fullkey, Left(k))
          val id = emit(Left(k), v, parent, fk, fullkey)
          if (recursive) children(v, id, fk)
        }
      case JArr(items) =>
        items.zipWithIndex.foreach { case (v, i) =>
          val fk = childFullkey(fullkey, Right(i))
          val id = emit(Right(i), v, parent, fk, fullkey)
          if (recursive) children(v, id, fk)
        }
      case _ =>
    }
    if (recursive) {
      // json_tree root row (sqlite 3.40.1, golden-pinned in
      // SqliteJsonSpec): fullkey is the path argument RE-RENDERED
      // ([[renderTreeStep]] — array steps print [0]); path is the
      // parent prefix of that rendering ('$' for a one-step path);
      // key is the object key ONLY when the target is a container
      // reached through a key step — scalar targets and array-step
      // targets report NULL. Descendants build on the rendered root
      // fullkey with their REAL keys/indexes.
      val parentSb = new java.lang.StringBuilder("$")
      steps.dropRight(1).foreach(renderTreeStep(parentSb, _))
      val fullSb = new java.lang.StringBuilder(parentSb.toString)
      steps.lastOption.foreach(renderTreeStep(fullSb, _))
      val rootFullkey = fullSb.toString
      val rootKey: Either[String, Int] = (start, steps.lastOption) match {
        case (_: JObj | _: JArr, Some(Key(k))) => Left(k)
        case _                                 => Left(null)
      }
      val id = emit(rootKey, start, null, rootFullkey, parentSb.toString)
      children(start, id, rootFullkey)
    } else start match {
      // json_each carries the path argument VERBATIM ('$[#-1]' stays
      // unresolved) and a scalar target's single row has a NULL key.
      case _: JObj | _: JArr => children(start, null, path)
      case _ => emit(Left(null), start, null, path, path)
    }
    out.result()
  }
}

// --------------------------------------------------------- expressions

/** One set/insert/replace edit step (builders fold multi-pair calls
  * left-to-right, exactly SQLite's sequential-edit rule). `value` is
  * JSON text, pre-rendered by the builder. */
case class SqliteJsonEdit(json: Expression, path: Expression,
                          value: Expression, mode: Int)
    extends TernaryExpression {
  override def first: Expression = json
  override def second: Expression = path
  override def third: Expression = value
  override def dataType: DataType = StringType
  override def prettyName: String =
    Seq("json_set", "json_insert", "json_replace")(mode)

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(json, path, value).forall(_.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string arguments")

  override def nullSafeEval(j: Any, p: Any, v: Any): Any =
    SqliteJson.editJson(j.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String], v.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (j, p, v) =>
      s"graft.functions.SqliteJson.editJson($j, $p, $v, $mode)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(json = f, path = s, value = t)
}

/** One remove step; SQL NULL when the root itself is removed. */
case class SqliteJsonRemove(json: Expression, path: Expression)
    extends BinaryExpression {
  override def left: Expression = json
  override def right: Expression = path
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_remove"

  override def checkInputDataTypes(): TypeCheckResult =
    if (json.dataType == StringType && path.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("json_remove expects string arguments")

  override def nullSafeEval(j: Any, p: Any): Any =
    SqliteJson.removeJson(j.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, p) =>
      s"""${ev.value} = graft.functions.SqliteJson.removeJson($j, $p);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(json = l, path = r)
}

/** Validate + minify (raw scalar text preserved) — the zero-edit
  * forms `json_set(x)` / `json_remove(x)`. */
case class SqliteJsonMinify(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "json_minify"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("expects a string argument")

  override def nullSafeEval(j: Any): Any =
    SqliteJson.minifyJson(j.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, j => s"graft.functions.SqliteJson.minifyJson($j)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** json_type(json[, path]); NULL when the path selects nothing. The
  * 1-arg builder passes the root path `'$'`, so a genuine NULL path
  * argument yields NULL through ordinary null propagation. */
case class SqliteJsonType(json: Expression, path: Expression)
    extends BinaryExpression {
  override def left: Expression = json
  override def right: Expression = path
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_type"

  override def checkInputDataTypes(): TypeCheckResult =
    if (json.dataType == StringType && path.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("json_type expects string arguments")

  override def nullSafeEval(j: Any, p: Any): Any =
    SqliteJson.typeJson(j.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, p) =>
      s"""${ev.value} = graft.functions.SqliteJson.typeJson($j, $p);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(json = l, path = r)
}

/** RFC-7386 merge patch (SQLite json_patch). */
case class SqliteJsonPatch(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "json_patch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("json_patch expects string arguments")

  override def nullSafeEval(a: Any, b: Any): Any =
    SqliteJson.patchJson(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SqliteJson.patchJson($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Runtime face of the JSON subtype for EXTRACTED values feeding an
  * editor (see [[SqliteJson.spliceOrQuote]]): containers and JSON
  * scalars splice, text quotes. Built only around get_json_object
  * results, never plain text columns. */
case class SqliteJsonExtractedValue(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "json_extracted_value"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("expects a string argument")

  override def nullSafeEval(v: Any): Any =
    SqliteJson.spliceOrQuote(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.SqliteJson.spliceOrQuote($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** json_error_position: 0 for well-formed JSON, else the 1-based
  * character position of the first detected error — the one JSON
  * function whose OUTPUT is about malformed input, which makes it the
  * data-quality primitive ("how many docs carry broken JSON, and
  * where") rather than an editor. */
case class SqliteJsonErrorPos(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "json_error_position"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("expects a string argument")

  override def nullSafeEval(j: Any): Any =
    SqliteJson.errorPosition(j.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, j => s"graft.functions.SqliteJson.errorPosition($j)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SQLite's table-valued json_each / json_tree as a Spark Generator:
  * one output row per element (each: the path node's children; tree:
  * the node plus all descendants, DFS), columns (key, value, type,
  * atom, id, parent, fullkey, path). Reached via LATERAL VIEW — the
  * translator rewrites SQLite's `FROM t, json_each(t.col)` comma form
  * onto it. NULL json or path generates no rows (SQLite's behavior on
  * NULL arguments). Generators execute in GenerateExec's interpreted
  * path; the surrounding projections stay codegen'd.
  */
case class SqliteJsonEachGen(json: Expression, path: Expression,
                             recursive: Boolean)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  override def children: Seq[Expression] = Seq(json, path)
  override def prettyName: String = if (recursive) "json_tree" else "json_each"

  override def elementSchema: StructType = StructType(Seq(
    StructField("key", StringType), StructField("value", StringType),
    StructField("type", StringType), StructField("atom", StringType),
    StructField("id", IntegerType, nullable = false),
    StructField("parent", IntegerType),
    StructField("fullkey", StringType), StructField("path", StringType)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (json.dataType == StringType && path.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string arguments")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val j = json.eval(input)
    val p = path.eval(input)
    if (j == null || p == null) return Nil
    def s(x: String): UTF8String =
      if (x == null) null else UTF8String.fromString(x)
    SqliteJson.walk(j.toString, p.toString, recursive).map { r =>
      InternalRow(s(r.key), s(r.value), s(r.tpe), s(r.atom), r.id,
        if (r.parent == null) null else r.parent.intValue(),
        s(r.fullkey), s(r.path))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(json = newChildren(0), path = newChildren(1))
}

/** JSON-escape TEXT into a quoted JSON string (the runtime piece of
  * json_quote; numerics/NULL are rendered type-directed by the
  * builder). */
case class SqliteJsonQuoteString(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "json_quote"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("expects a string argument")

  override def nullSafeEval(s: Any): Any =
    SqliteJson.quoteString(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.SqliteJson.quoteString($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
