package graft.text2sql

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property fuzz over the rowid rewriter: compose SELECTs from random
  * item lists, FROM shapes, and predicate soup, and require that
  *   1. expansion is TOTAL — it returns or throws the targeted
  *      UnsupportedOperationException, never anything else;
  *   2. expansion is IDEMPOTENT (the second pass changes nothing —
  *      the property that lets prepare() run on retried statements);
  *   3. statements whose select lists carry no star item pass through
  *      byte-identical (the rewriter's blast radius is stars only);
  *   4. normalizeAliases and cteNames are total and idempotent.
  */
class RowidRewriteFuzzSpec extends AnyFunSuite {

  private val enabled = Map("t" -> Seq("a", "b"), "u" -> Seq("k"))

  private val scalarItem = Gen.oneOf(
    "c1", "42", "'tx*t'", "c1 + c2", "count(*)", "sum(c1) AS s",
    "iif(c1 > 1, 2, 3) AS v", "'*'", "rowid", "t.rowid", "_rowid_",
    "max(c1, c2) AS m", "(SELECT 1) AS sq", "oid AS o")

  private val starItem = Gen.oneOf("*", "t.*", "x.*", "q.*", "`t`.*")

  private val itemList = Gen.oneOf(
    Gen.listOfN(2, scalarItem).map(_.mkString(", ")),
    Gen.zip(starItem, scalarItem).map { case (a, b) => s"$a, $b" },
    Gen.zip(scalarItem, starItem).map { case (a, b) => s"$a, $b" },
    starItem,
    Gen.listOfN(3, scalarItem).map(_.mkString(", ")))

  private val fromShape = Gen.oneOf(
    "FROM t", "FROM t x", "FROM t AS x", "FROM u", "FROM s",
    "FROM t JOIN s ON t.a = s.a", "FROM t, s y",
    "FROM (SELECT 1 AS z) q", "FROM (SELECT 1 AS z)",
    "FROM t NATURAL JOIN s", "FROM t JOIN s USING (a)",
    "FROM `t`", "FROM t x JOIN u y ON x.a = y.k", "")

  private val tail = Gen.oneOf(
    "", " WHERE c1 = 1", " WHERE rowid NOT IN (SELECT MIN(rowid) FROM t GROUP BY a)",
    " GROUP BY c1", " ORDER BY 1 LIMIT 5",
    " WHERE c1 = 'str with * and rowid'",
    " UNION ALL SELECT * FROM t")

  private val stmt: Gen[String] =
    Gen.zip(itemList, fromShape, tail).map { case (i, f, t) =>
      s"SELECT $i $f$t"
    }

  private val withWrap: Gen[String] = Gen.oneOf(
    stmt,
    stmt.map(s => s"WITH t AS (SELECT 9 AS w) $s"),
    stmt.map(s => s"WITH cte AS ($s) SELECT * FROM cte"),
    stmt.map(s => s"INSERT INTO s $s"))

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(400), prop)
    assert(res.passed, s"$name: $res")
  }

  test("expandStars is total, idempotent, and star-scoped") {
    check("expand", Prop.forAll(withWrap) { s =>
      val once =
        try Right(RowidRewrite.expandStars(s, enabled))
        catch { case e: UnsupportedOperationException => Left(e) }
      once match {
        case Left(_) => true // the targeted decline is a legal outcome
        case Right(o1) =>
          val o2 = RowidRewrite.expandStars(o1, enabled)
          val idem = o2 == o1
          if (!idem)
            println(s"NOT IDEMPOTENT:\n  in:    $s\n  once:  $o1\n  twice: $o2")
          idem
      }
    })
  }

  test("statements with no star select item pass through unchanged") {
    val noStar = Gen.zip(
      Gen.listOfN(2, scalarItem).map(_.mkString(", ")), fromShape, tail)
      .map { case (i, f, t) => s"SELECT $i $f$t" }
      .filterNot(_.contains(" * ")) // multiplication is fine; be strict
      .filterNot(s => s.contains("*,") || s.contains(", *") ||
        s.endsWith("*") || s.contains(".*"))
      .filterNot(_.contains("UNION ALL SELECT *"))
    check("identity", Prop.forAll(noStar) { s =>
      RowidRewrite.expandStars(s, enabled) == s
    })
  }

  test("normalizeAliases and cteNames are total and idempotent") {
    check("aliases", Prop.forAll(withWrap) { s =>
      val n1 = RowidRewrite.normalizeAliases(s, Set.empty)
      val n2 = RowidRewrite.normalizeAliases(n1, Set.empty)
      RowidRewrite.cteNames(s) // total
      RowidRewrite.referencesRowid(s) // total
      RowidRewrite.referencedTables(s, Set("t", "u", "s")) // total
      n1 == n2
    })
  }
}
