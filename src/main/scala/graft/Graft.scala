package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.exec.{Pragma, Runner}
import graft.ingest.{IngestResult, Ingestor}
import graft.llm.LlmCallback
import graft.text2sql.Text2Sql

/** Reference-shaped façade: the three calls a pandasqlite user makes
  * (ingest → text2sql → execute; reference README.md:35-49) with the
  * same names and flow, so switching is mechanical:
  *
  * {{{
  * val dfs  = Graft.readCsvDir(spark, "sample_data")       // test.py:20-39
  * val (ing, hash) = Graft.ingest(spark, dfs, myLlm)       // test.py:42
  * val sql  = Graft.text2sql("most popular product?", ing, myLlm) // test.py:47
  * val df   = Graft.sql(spark, sql)                        // test.py:50
  * }}}
  *
  * The SparkSession replaces the reference's SQLite engine handle:
  * ingested tables are temp views named by content hash.
  */
object Graft {

  /** Load every *.csv in a directory as its own DataFrame with header
    * + schema inference (reference test.py:33-39 loads sample_data/).
    */
  def readCsvDir(spark: SparkSession, dir: String): Seq[DataFrame] = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.toLowerCase.endsWith(".csv"))
      .sortBy(_.getName)
    files.toIndexedSeq.map(f => spark.read
      .option("header", "true").option("inferSchema", "true")
      .csv(f.getAbsolutePath))
  }

  def ingest(spark: SparkSession, dfs: Seq[DataFrame], llm: LlmCallback,
             cacheDir: String = Ingestor.defaultCacheDir,
             context: Option[String] = None): (Seq[IngestResult], String) =
    Ingestor.ingest(spark, dfs, llm, cacheDir, context)

  /** Re-enter a previous ingestion by hash (reference ingest("<hash>")). */
  def ingestByHash(spark: SparkSession, hash: String,
                   cacheDir: String = Ingestor.defaultCacheDir): (Seq[IngestResult], String) =
    Ingestor.ingestByHash(spark, hash, cacheDir)

  /** Sessionless form (the reference's own signature): translates
    * with the DEFAULT LIKE mode. If the session may have run `PRAGMA
    * case_sensitive_like`, use the SparkSession overload (or [[ask]],
    * which threads the flag) — this form cannot see session state. */
  def text2sql(question: String, ingestions: Seq[IngestResult],
               llm: LlmCallback): String =
    Text2Sql.text2sql(question, ingestions, llm)

  /** Session-aware form: honors `PRAGMA case_sensitive_like`. */
  def text2sql(spark: SparkSession, question: String,
               ingestions: Seq[IngestResult], llm: LlmCallback): String =
    Text2Sql.text2sql(question, ingestions, llm,
      Pragma.caseSensitiveLike(spark))

  def sql(spark: SparkSession, query: String): DataFrame =
    Runner.runSql(spark, query)

  /** question → executed result in one call. */
  def ask(spark: SparkSession, question: String,
          ingestions: Seq[IngestResult], llm: LlmCallback): DataFrame =
    Runner.ask(spark, question, ingestions, llm)
}
