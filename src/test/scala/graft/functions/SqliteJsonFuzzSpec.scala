package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.unsafe.types.UTF8String

/** Property fuzz over the raw-preserving JSON engine — the parser,
  * renderer, path machinery, and editors behind the JSON1 surface:
  *
  *   1. minify is IDENTITY on already-minified documents (the
  *      raw-preservation contract: every scalar keeps its source
  *      text byte-for-byte);
  *   2. minify strips injected inter-token whitespace back to the
  *      original (whitespace is the ONLY thing minification drops);
  *   3. every editor is TOTAL over (valid doc × arbitrary path
  *      soup): it returns parseable JSON or throws JsonError — never
  *      a crash — and its output re-minifies to itself (fixpoint);
  *   4. json_remove(json_set(d, p, v), p) over a FRESH object key
  *      restores the original document;
  *   5. walk() row counts: json_tree visits exactly the node count
  *      of the document, json_each exactly the top-level arity.
  */
class SqliteJsonFuzzSpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)

  // ---- generator for MINIFIED JSON documents with varied scalars ----
  private val scalarTok: Gen[String] = Gen.oneOf(
    Gen.const("true"), Gen.const("false"), Gen.const("null"),
    Gen.chooseNum(-999999L, 999999L).map(_.toString),
    Gen.chooseNum(-9999.0, 9999.0).map(d =>
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))),
    Gen.oneOf("1.50", "2e2", "1e-3", "-0.0", "0.10"),
    Gen.alphaNumStr.map(s => SqliteJson.quoteText(s.take(8))),
    Gen.const(SqliteJson.quoteText("q\"w\\x\ny")))

  private val keyTok: Gen[String] = Gen.oneOf(
    Gen.identifier.map(_.take(6)), Gen.const("a b"), Gen.const("k\"q"),
    Gen.const(""), Gen.const("0len"))

  private def node(depth: Int): Gen[String] =
    if (depth <= 0) scalarTok
    else Gen.frequency(
      4 -> scalarTok,
      2 -> Gen.chooseNum(0, 3).flatMap(n =>
        Gen.listOfN(n, node(depth - 1)).map(_.mkString("[", ",", "]"))),
      2 -> Gen.chooseNum(0, 3).flatMap(n =>
        Gen.listOfN(n, Gen.zip(keyTok, node(depth - 1))).map(kvs =>
          kvs.map { case (k, v) => SqliteJson.quoteText(k) + ":" + v }
            .mkString("{", ",", "}"))))

  private val doc: Gen[String] = node(3)

  private val pathSoup: Gen[String] = Gen.oneOf(
    Gen.const("$"), Gen.identifier.map(i => s"$$.$i"),
    Gen.chooseNum(0, 5).map(i => s"$$[$i]"), Gen.const("$[#]"),
    Gen.const("$[#-1]"), Gen.identifier.map(i => s"$$.$i[0].x"),
    Gen.const("$.\"a b\""), Gen.const("no-dollar"), Gen.const("$.."),
    Gen.const("$["), Gen.const("$[x]"), Gen.const(""))

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(400), prop)
    assert(res.passed, s"$name: $res")
  }

  test("minify is identity on minified docs and strips injected whitespace") {
    check("identity", Prop.forAll(doc) { d =>
      SqliteJson.minifyJson(u(d)).toString == d
    })
    check("whitespace", Prop.forAll(doc, Gen.chooseNum(1L, Long.MaxValue)) {
      (d, seed) =>
        val rnd = new scala.util.Random(seed)
        // inject whitespace after structural tokens only (inside a
        // string literal it would change the value)
        val sb = new StringBuilder
        var inStr = false
        d.foreach { c =>
          sb.append(c)
          if (c == '"' && (sb.length < 2 || sb.charAt(sb.length - 2) != '\\'))
            inStr = !inStr
          if (!inStr && "{}[],:".contains(c) && rnd.nextBoolean())
            sb.append(if (rnd.nextBoolean()) " " else "\n")
        }
        SqliteJson.minifyJson(u(sb.toString)).toString == d
    })
  }

  test("editors are total and their output is a minification fixpoint") {
    val mode = Gen.chooseNum(0, 2)
    check("edit", Prop.forAll(doc, pathSoup, scalarTok, mode) { (d, p, v, m) =>
      try {
        val out = SqliteJson.editJson(u(d), u(p), u(v), m)
        SqliteJson.minifyJson(out).toString == out.toString
      } catch { case _: SqliteJson.JsonError => true }
    })
    check("remove", Prop.forAll(doc, pathSoup) { (d, p) =>
      try {
        val out = SqliteJson.removeJson(u(d), u(p))
        out == null || SqliteJson.minifyJson(out).toString == out.toString
      } catch { case _: SqliteJson.JsonError => true }
    })
    check("patch", Prop.forAll(doc, doc) { (a, b) =>
      val out = SqliteJson.patchJson(u(a), u(b))
      SqliteJson.minifyJson(out).toString == out.toString
    })
    check("type", Prop.forAll(doc, pathSoup) { (d, p) =>
      try { SqliteJson.typeJson(u(d), u(p)); true }
      catch { case _: SqliteJson.JsonError => true }
    })
  }

  test("set-then-remove of a fresh key restores an object document") {
    val objDoc = doc.suchThat(_.startsWith("{"))
    check("roundtrip", Prop.forAll(objDoc, scalarTok) { (d, v) =>
      // key chosen to be absent: parser-visible keys can't collide
      // with this sentinel (generated keys are ≤ 6 chars or fixed)
      val p = "$.__fresh_key__"
      val set = SqliteJson.editJson(u(d), u(p), u(v), 0)
      SqliteJson.removeJson(set, u(p)).toString == d
    })
  }

  test("walk row counts: tree visits every node, each visits the top level") {
    // exact arity is only statically countable for flat scalar arrays
    val flatArr = Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 99L).map(_.toString))
        .map(_.mkString("[", ",", "]")))
    check("each-arity", Prop.forAll(flatArr) { d =>
      val elems = if (d == "[]") 0 else d.count(_ == ',') + 1
      SqliteJson.walk(d, "$", recursive = false).size == elems
    })
    check("tree-count", Prop.forAll(flatArr) { d =>
      val elems = if (d == "[]") 0 else d.count(_ == ',') + 1
      SqliteJson.walk(d, "$", recursive = true).size == elems + 1
    })
  }
}
