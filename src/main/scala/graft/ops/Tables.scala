package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver test tables (TESTDATA.md).
  *
  * All tables are parquet under `$dir/<name>.parquet`. At 100 TB each
  * "file" would be a partitioned directory; `spark.read.parquet` handles
  * both transparently, and every query below relies on Catalyst pushing
  * filters/projections into the scan rather than pre-materializing.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every test table as a temp view so `spark.sql` queries
    * (subqueries, CTEs, SQL-dialect keys) can refer to them by name —
    * the Spark analog of the reference materializing every DataFrame
    * into one SQLite database (pandasqlite.py:77,115).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
