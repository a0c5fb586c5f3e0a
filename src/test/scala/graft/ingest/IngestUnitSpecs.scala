package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class SanitizeSpec extends AnyFunSuite {
  test("sanitize replaces non-alnum runs with single underscore") {
    assert(Sanitize.sanitize("Retailer code") == "Retailer_code")
    assert(Sanitize.sanitize("a  b--c") == "a_b_c")
    assert(Sanitize.sanitize("clean_name") == "clean_name")
    assert(Sanitize.sanitize("Üni-code!x") == "_ni_code_x")
  }

  test("sanitize is idempotent (property)") {
    val prop = Prop.forAll(Gen.asciiStr) { s =>
      val once = Sanitize.sanitize(s)
      Sanitize.sanitize(once) == once
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("reverseLookup maps lowercase back to real case") {
    val m = Sanitize.reverseLookup(Seq("Retailer_code", "Quantity"))
    assert(m("retailer_code") == "Retailer_code")
    assert(m("quantity") == "Quantity")
  }
}

class DdlSpec extends AnyFunSuite {
  test("createTable renders backticked hash and mapped types") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("price", DoubleType), StructField("day", DateType)))
    val ddl = Ddl.createTable("abc123", schema)
    assert(ddl.contains("CREATE TABLE `abc123`"))
    assert(ddl.contains("`id` BIGINT"))
    assert(ddl.contains("`name` TEXT"))
    assert(ddl.contains("`price` DOUBLE"))
    assert(ddl.contains("`day` DATE"))
  }
}

class JsonSpec extends AnyFunSuite {
  test("write matches python json.dumps compact separators") {
    val m = scala.collection.mutable.LinkedHashMap[String, Any](
      "sex" -> Seq("m", "m", "f"), "n" -> Seq(1L, 2L))
    assert(Json.write(m) == """{"sex":["m","m","f"],"n":[1,2]}""")
    assert(Json.write(scala.collection.mutable.LinkedHashMap("x" -> 1.5)) == """{"x":1.5}""")
    assert(Json.write(Seq(9.64)) == "[9.64]")
    assert(Json.write(Seq(1.0)) == "[1.0]")
    assert(Json.write(Seq(1.0e7)) == "[10000000.0]") // not "1.0E7"
    assert(Json.write(Seq(-3.0)) == "[-3.0]")
    assert(Json.write("a\"b") == "\"a\\\"b\"")
    assert(Json.write("café") == "\"caf\\u00e9\"") // python ensure_ascii
    assert(Json.write("a\nb") == "\"a\\nb\"")
    assert(Json.write("ab".getBytes("UTF-8")) == "\"YWI=\"") // base64, not [B@
  }

  test("parse round-trips objects preserving insertion order") {
    val parsed = Json.parseObject("""{"b":1,"a":"x","c":[1,2]}""")
    assert(parsed.keys.toSeq == Seq("b", "a", "c"))
    assert(parsed("b") == 1L)
    assert(parsed("c") == Vector(1L, 2L))
  }
}

class Text2SqlSubstSpec extends AnyFunSuite {
  test("binds standalone `table` only, never substrings or qualified names") {
    assert(Text2SqlSubst.bindTable("SELECT * FROM table", "h1") ==
      "SELECT * FROM `h1`")
    assert(Text2SqlSubst.bindTable("SELECT COUNT(*) FROM table WHERE x=1", "h1") ==
      "SELECT COUNT(*) FROM `h1` WHERE x=1")
    // the reference's substring replace would corrupt all of these
    assert(Text2SqlSubst.bindTable("SELECT tables FROM metatable", "h1") ==
      "SELECT tables FROM metatable")
    assert(Text2SqlSubst.bindTable("SELECT stable_col FROM table", "h1") ==
      "SELECT stable_col FROM `h1`")
    assert(Text2SqlSubst.bindTable("SELECT t.table_id FROM table t", "h1") ==
      "SELECT t.table_id FROM `h1` t")
  }

  test("binds the backtick-quoted placeholder without doubling backticks") {
    assert(Text2SqlSubst.bindTable("SELECT * FROM `table`", "h1") ==
      "SELECT * FROM `h1`")
    assert(Text2SqlSubst.bindTable("SELECT * FROM `table` JOIN table", "h1") ==
      "SELECT * FROM `h1` JOIN `h1`")
  }

  test("never rewrites inside single-quoted literals") {
    assert(Text2SqlSubst.bindTable(
      "SELECT * FROM table WHERE note LIKE '%table%'", "h1") ==
      "SELECT * FROM `h1` WHERE note LIKE '%table%'")
    assert(Text2SqlSubst.bindTable(
      "SELECT * FROM table WHERE x = 'it''s a table'", "h1") ==
      "SELECT * FROM `h1` WHERE x = 'it''s a table'")
  }
}

class HashingSpec extends SparkSpec {
  import spark.implicits._

  test("tableHash is stable and partition-order independent") {
    val df = (1 to 100).map(i => (i.toLong, s"name_$i")).toDF("id", "name")
    val h1 = Hashing.tableHash(df)
    val h2 = Hashing.tableHash(df.repartition(7))
    val h3 = Hashing.tableHash(df.repartition(2))
    assert(h1 == h2 && h2 == h3)
    assert(h1.matches("[0-9a-f]{32}"))
  }

  test("tableHash distinguishes content and schema changes") {
    val df = (1 to 10).map(i => (i.toLong, s"n$i")).toDF("id", "name")
    val dfOther = (1 to 10).map(i => (i.toLong, s"m$i")).toDF("id", "name")
    val dfRenamed = df.withColumnRenamed("name", "label")
    assert(Hashing.tableHash(df) != Hashing.tableHash(dfOther))
    assert(Hashing.tableHash(df) != Hashing.tableHash(dfRenamed))
  }

  test("ingestionHash depends on table order (reference concatenation)") {
    assert(Hashing.ingestionHash(Seq("a", "b")) != Hashing.ingestionHash(Seq("b", "a")))
  }
}

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot is deterministic, lowercased keys, 5 samples") {
    val df = (1 to 50).map(i => (i.toLong, s"V$i")).toDF("Id", "Name")
    val s1 = Snapshot.snapshot(df)
    val s2 = Snapshot.snapshot(df)
    assert(s1 == s2)
    assert(s1.keys.toSeq == Seq("id", "name"))
    assert(s1("id").size == 5)
  }

  test("snapshot shows distinct values on low-cardinality columns") {
    val df = ((1 to 500).map(_ => "0") ++ (1 to 500).map(_ => "1"))
      .toDF("survived")
    val s = Snapshot.snapshot(df)
    assert(s("survived").toSet == Set("0", "1")) // not 5 copies of one value
  }

  test("snapshot tolerates tables smaller than the sample size") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(Snapshot.snapshot(df)("id").size == 2) // reference :298 throws here
  }

  test("distinctValues returns sorted distincts with lowercased keys") {
    val df = Seq("b", "a", "b", "c").toDF("Flag")
    val dv = Snapshot.distinctValues(df, Seq("Flag"))
    assert(dv("flag") == Seq("a", "b", "c"))
  }

  test("distinctValues renders NULL as NaN, first") {
    val df = Seq(Some("b"), None, Some("a")).toDF("Flag")
    val dv = Snapshot.distinctValues(df, Seq("Flag"))
    assert(dv("flag") == Seq("NaN", "a", "b"))
  }

  test("snapshot keeps NULL among the samples") {
    val df = Seq(Some("x"), None, Some("y")).toDF("v")
    assert(Snapshot.snapshot(df)("v").contains(null))
  }

  test("snapshot runs one job regardless of column count") {
    val sc = spark.sparkContext
    val df = (1 to 200).map(i =>
      (i.toLong, s"a$i", s"b$i", s"c$i", s"d$i", s"e$i", s"f$i", s"g$i"))
      .toDF("c1", "c2", "c3", "c4", "c5", "c6", "c7", "c8")
    sc.setJobGroup("snap-jobs", "snapshot job-count probe")
    Snapshot.snapshot(df)
    val nSnap = sc.statusTracker.getJobIdsForGroup("snap-jobs").length
    sc.clearJobGroup()
    sc.setJobGroup("dv-jobs", "distinctValues job-count probe")
    Snapshot.distinctValues(df, df.columns.toSeq.take(6))
    val nDv = sc.statusTracker.getJobIdsForGroup("dv-jobs").length
    sc.clearJobGroup()
    // 8 columns, 6 enum columns: a constant number of jobs (the
    // bounded-prefix limit materializes as its own job before the
    // aggregate) — NOT one-plus per column, which was the regression
    // this guards against (2 jobs × N columns)
    assert(nSnap <= 2, s"snapshot ran $nSnap jobs for 8 columns")
    assert(nDv <= 2, s"distinctValues ran $nDv jobs for 6 columns")
  }
}
