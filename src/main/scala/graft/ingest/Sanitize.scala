package graft.ingest

import org.apache.spark.sql.DataFrame

/** Column-name compatibility layer.
  *
  * Mirrors the reference behavior (reference pandasqlite/pandasqlite.py:94):
  * every maximal run of characters outside [0-9a-zA-Z] becomes a single
  * underscore, e.g. "Retailer code" → "Retailer_code".
  */
object Sanitize {
  def sanitize(name: String): String =
    name.replaceAll("[^0-9a-zA-Z]+", "_")

  def sanitizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(sanitize).toIndexedSeq: _*)

  /** LLM responses address columns in lowercase; map them back to the
    * real column case (reference pandasqlite/pandasqlite.py:123).
    */
  def reverseLookup(columns: Seq[String]): Map[String, String] =
    columns.map(c => c.toLowerCase -> c).toMap
}
