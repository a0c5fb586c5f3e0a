package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC table ingestion — the Spark analog of the reference's
  * database-URL surface (reference setup.py:14-18 packages `sqlalchemy`
  * + `PyMySQL`, i.e. ingesting from live databases, even though the
  * reference code itself hardcodes `create_engine('sqlite:///...')` at
  * pandasqlite/pandasqlite.py:77).
  *
  * `spark.read.jdbc` is the engine-native path: the read is a real
  * datasource with filter pushdown into the database, and the
  * partitioned variant splits the table into `numPartitions` range
  * predicates executed by separate executors — the difference between
  * one connection streaming a 10 TB table and a parallel extract.
  */
object Jdbc {

  /** Read one table (or a `(SELECT …) alias` subquery) over JDBC. */
  def readTable(spark: SparkSession, url: String, table: String,
                props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Parallel range-partitioned read: `numPartitions` executors each
    * scan `[lower, upper]` stripes of `partitionColumn`. This is the
    * only JDBC shape that scales — the single-connection variant is a
    * driver-side bottleneck on any real table.
    */
  def readTablePartitioned(spark: SparkSession, url: String, table: String,
                           partitionColumn: String, lower: Long, upper: Long,
                           numPartitions: Int,
                           props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper,
      numPartitions, props)

  /** Ingest database tables through the standard pipeline (snapshot →
    * LLM metadata → hash-named temp views), exactly as CSV ingestion
    * does — the Spark rendering of "point pandasqlite at a database
    * URL".
    */
  def ingest(spark: SparkSession, url: String, tables: Seq[String],
             llm: graft.llm.LlmCallback,
             cacheDir: String = graft.ingest.Ingestor.defaultCacheDir,
             props: Properties = new Properties())
      : (Seq[graft.ingest.IngestResult], String) = {
    val dfs = tables.map(t => readTable(spark, url, t, props))
    graft.ingest.Ingestor.ingest(spark, dfs, llm, cacheDir)
  }
}
