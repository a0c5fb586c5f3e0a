package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ingest.IngestResult
import graft.llm.LlmCallback
import graft.text2sql.Text2Sql

/** Execution + result sampling (reference README.md:49, test.py:50-55):
  * generated SQL runs verbatim through spark.sql against the
  * hash-named temp views, and results sample to JSON rows.
  */
object Runner {
  def runSql(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)

  /** ≤5 sample rows as JSON (reference test.py:51-55). */
  def resultJson(df: DataFrame, n: Int = 5): Seq[String] =
    df.limit(n).toJSON.collect().toIndexedSeq

  /** Full question → answer pipeline over prior ingestions. */
  def ask(spark: SparkSession, question: String,
          ingestions: Seq[IngestResult], llm: LlmCallback): DataFrame =
    runSql(spark, Text2Sql.text2sql(question, ingestions, llm))
}
