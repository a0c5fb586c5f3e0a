package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2B/§2C);
  * each key has a matching DuckDB oracle in `oracleSql` (column names
  * and types aligned on both sides, deterministic total ordering).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's own flagship question ("what's the most popular
    * product?", reference test.py:24) rendered on the driver testdata:
    * lineitem ⋈ part, group by part, sum quantity, top 1. `part` is
    * SF-proportional (not a fixed-cardinality dim), so join strategy
    * is left to the optimizer + AQE — broadcast at this SF, shuffled
    * at the 100 TB design point; aggregation is partial+final.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables.t(spark, d, "lineitem")
    val part = Tables.t(spark, d, "part")
    li.join(part, li("l_partkey") === part("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .orderBy(desc("total_qty"), asc("p_partkey"))
      .limit(1)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.queries ++ QueriesJoins.queries ++ QueriesWindows.queries ++
      QueriesSql.queries ++ QueriesFunctions.queries ++ QueriesExt.queries ++
      QueriesOpt.queries ++ QueriesDialect.queries ++ QueriesTpch.queries ++
      QueriesTrain.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueriesCore.oracle ++ QueriesJoins.oracle ++ QueriesWindows.oracle ++
      QueriesSql.oracle ++ QueriesFunctions.oracle ++ QueriesExt.oracle ++
      QueriesOpt.oracle ++ QueriesDialect.oracle ++ QueriesTpch.oracle ++
      QueriesTrain.oracle
}
