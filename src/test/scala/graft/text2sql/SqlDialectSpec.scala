package graft.text2sql

import graft.SparkSpec
import graft.ops.Tables

class SqlDialectSpec extends SparkSpec {

  test("GLOB rewrites to an anchored RLIKE that executes in Spark") {
    val sql = SqlDialect.translate(
      "SELECT p_partkey FROM part WHERE p_name GLOB '*ge?r*' ORDER BY p_partkey")
    assert(sql.contains("RLIKE"))
    Tables.t(spark, sfDir, "part").createOrReplaceTempView("part")
    val viaGlob = spark.sql(sql).count()
    val direct = spark.sql(
      "SELECT p_partkey FROM part WHERE p_name LIKE '%ge_r%' ORDER BY p_partkey").count()
    assert(viaGlob == direct)
    assert(viaGlob > 0)
  }

  test("julianday rewrites to the noon-based formula and executes") {
    val sql = SqlDialect.translate("SELECT julianday(ts) AS jd FROM events")
    assert(!sql.toLowerCase.contains("julianday"))
    Tables.t(spark, sfDir, "events").createOrReplaceTempView("events")
    val jd = spark.sql(sql + " ORDER BY jd LIMIT 1").head().getDouble(0)
    assert(jd > 2460000 && jd < 2470000) // 2024 is ~JD 2460311
  }

  test("GLOB patterns with SQL-escaped quotes survive translation") {
    val sql = SqlDialect.translate("SELECT x FROM t WHERE x GLOB 'it''s*'")
    assert(sql.contains("RLIKE"))
    assert(!sql.toUpperCase.contains("GLOB"))
    // the translated predicate is lexable: one quoted literal
    assert(sql.count(_ == '\'') % 2 == 0)
  }

  test("julianday with nested calls rewrites via balanced-paren scan") {
    val sql = SqlDialect.translate(
      "SELECT julianday(max(ts)) - julianday(min(ts)) AS span FROM events")
    assert(!sql.toLowerCase.contains("julianday"))
    Tables.t(spark, sfDir, "events").createOrReplaceTempView("events")
    val span = spark.sql(sql).head().getDouble(0)
    assert(span > 0 && span < 60) // events span ~30 days
  }

  test("random() becomes rand(); Spark-valid functions untouched") {
    assert(SqlDialect.translate("SELECT random()") == "SELECT rand()")
    val passthrough = "SELECT ifnull(x, 0), instr(s, 'a'), substr(s, 1, 3) FROM t"
    assert(SqlDialect.translate(passthrough) == passthrough)
  }
}
