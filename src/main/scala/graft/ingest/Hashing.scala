package graft.ingest

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-addressed table and ingestion identities.
  *
  * The reference hashes `df.to_string()` (reference
  * pandasqlite/pandasqlite.py:74-76, :97-99) — a full driver-side
  * materialization that cannot work at 100 TB. We define the content
  * hash distributively: md5 over (schema DDL, row count, and a
  * commutative combination of per-row hashes). Per-row hash =
  * xxhash64 of the canonical JSON of the row; the combiner is Long
  * addition (commutative + associative → partition-order independent,
  * computed as a single partial aggregate). Documented divergence:
  * our hex digests never equal the reference's (cache keys are not
  * interoperable across engines anyway).
  */
object Hashing {
  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Distributed, order-independent content hash of a DataFrame. */
  def tableHash(df: DataFrame): String = {
    val schemaPart = df.schema.map(f => s"${f.name}:${f.dataType.sql}").mkString(",")
    val agg = df.select(
        xxhash64(to_json(struct(df.columns.map(col).toIndexedSeq: _*)))
          .cast("decimal(38,0)").as("h"))
      .agg(count(lit(1)).as("n"), sum(col("h")).as("s"))
      .head()
    val n = agg.getLong(0)
    val s = if (agg.isNullAt(1)) "0" else agg.getDecimal(1).toBigInteger.toString
    md5Hex(s"$schemaPart|$n|$s")
  }

  /** Ingestion-set hash over all frames (order-sensitive, matching the
    * reference's concatenation semantics at :75).
    */
  def ingestionHash(tableHashes: Seq[String]): String =
    md5Hex(tableHashes.mkString(""))
}
