package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-column data probes used to build LLM prompts.
  *
  * Reference behavior (reference pandasqlite/pandasqlite.py:290-302):
  * 5 random samples per column, keys lowercased. Deliberate fixes
  * (SURVEY.md §7.3): sampling is SEEDED (deterministic prompts — the
  * reference resamples unseeded on every call), taken ONCE per ingest
  * and reused, and tables with fewer than 5 rows don't throw.
  */
object Snapshot {
  val sampleSize = 5

  /** Deterministic per-column samples: {lowercased col → 5 values}.
    * One pass per column over a pre-sampled fraction would be the
    * 100 TB path (sample pushdown); at driver-test scale we order by a
    * seeded per-row hash and take the first 5 — deterministic and
    * distributed (TakeOrdered, no full sort materialization).
    */
  def snapshot(df: DataFrame, seed: Long = 42L): collection.Map[String, Seq[Any]] = {
    val result = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Any]]
    df.columns.foreach { c =>
      // DISTINCT before the seeded-hash order: hashing the value alone
      // would make all equal-valued rows tie and collapse the sample to
      // copies of one value on low-cardinality columns; distinct values
      // are also more informative to the LLM
      val vals = df.select(col(c)).distinct()
        .orderBy(xxhash64(lit(seed), col(c).cast("string")))
        .limit(sampleSize)
        .collect()
        .map(r => if (r.isNullAt(0)) null else r.get(0))
      result += c.toLowerCase -> vals.toSeq
    }
    result
  }

  /** Distinct values for enum-typed columns (reference :283-287). */
  def distinctValues(df: DataFrame, cols: Seq[String]): collection.Map[String, Seq[String]] = {
    val result = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
    cols.foreach { c =>
      val vals = df.select(col(c).cast("string")).distinct()
        .orderBy(col(c)).collect()
        .map(r => if (r.isNullAt(0)) "NaN" else r.getString(0))
      result += c.toLowerCase -> vals.toSeq
    }
    result
  }
}
