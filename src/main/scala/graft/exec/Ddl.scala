package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.text2sql.SqlDml

/** Session DDL from generated SQL (reference executes it against its
  * session-scoped SQLite database, pandasqlite.py:245-247):
  *
  *  - `CREATE [TEMP] VIEW v AS select` → a TEMPORARY view (the session
  *    is the engine's database, so lifetimes match);
  *  - `CREATE [TEMP] TABLE t AS select` → the select MATERIALIZES
  *    (parquet, copy-on-write generation dir — same discipline as
  *    [[Upsert]]) and registers as a session table, so downstream
  *    statements scan stored files instead of re-running the plan;
  *  - `DROP TABLE/VIEW [IF EXISTS] t` → unregisters the binding (lake
  *    files are immutable; only the name drops).
  *
  * SQLite's conflict semantics are kept: CREATE without IF NOT EXISTS
  * fails on an existing name, DROP without IF EXISTS fails on a
  * missing one — targeted errors, not generic analysis failures. All
  * statements return an empty result, exactly as SQLite's do.
  */
object Ddl {

  private def quote(name: String): String =
    "`" + name.replace("`", "``") + "`"

  private def exists(spark: SparkSession, name: String): Boolean =
    try { spark.table(quote(name)); true } catch { case _: Exception => false }

  def createView(spark: SparkSession, stmt: SqlDml.CreateView): DataFrame = {
    if (exists(spark, stmt.name)) {
      if (stmt.ifNotExists) return spark.emptyDataFrame
      throw new IllegalArgumentException(
        s"CREATE VIEW ${stmt.name}: relation already exists (SQLite " +
          s"semantics); add IF NOT EXISTS or DROP VIEW it first")
    }
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW ${quote(stmt.name)} AS ${stmt.sourceSql}")
    spark.emptyDataFrame
  }

  def createTableAs(spark: SparkSession, stmt: SqlDml.CreateTableAs): DataFrame = {
    if (exists(spark, stmt.name)) {
      if (stmt.ifNotExists) return spark.emptyDataFrame
      throw new IllegalArgumentException(
        s"CREATE TABLE ${stmt.name}: relation already exists (SQLite " +
          s"semantics); add IF NOT EXISTS or DROP TABLE it first")
    }
    val dir = "target/graft_tmp/ctas_" +
      stmt.name.replaceAll("[^A-Za-z0-9_]", "_") +
      "_g" + Upsert.nextGeneration()
    spark.sql(stmt.sourceSql).write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView(stmt.name)
    spark.emptyDataFrame
  }

  def drop(spark: SparkSession, stmt: SqlDml.DropRelation): DataFrame = {
    val dropped = spark.catalog.dropTempView(stmt.name)
    if (!dropped && !stmt.ifExists)
      throw new IllegalArgumentException(
        s"DROP: no such session table/view '${stmt.name}' " +
          s"(add IF EXISTS to make this a no-op)")
    spark.emptyDataFrame
  }
}
