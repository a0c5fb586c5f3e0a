package graft.ingest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Per-column data probes used to build LLM prompts.
  *
  * Reference behavior (reference pandasqlite/pandasqlite.py:290-302):
  * 5 random samples per column, keys lowercased. Deliberate fixes
  * (SURVEY.md §7.3): sampling is SEEDED (deterministic prompts — the
  * reference resamples unseeded on every call), taken ONCE per ingest
  * and reused, and tables with fewer than 5 rows don't throw.
  *
  * Both probes run ONE Spark job regardless of column count: a
  * 200-column table is one bounded scan with 200 aggregate columns,
  * not 200 scans — the difference between an O(1) and an O(columns)
  * ingest cost at 100 TB.
  */
object Snapshot {
  val sampleSize = 5

  /** Deterministic per-column samples: {lowercased col → 5 values}.
    *
    * One aggregate over a bounded prefix of the table: per column,
    * collect the distinct (seeded-hash, value) pairs and keep the 5
    * hash-smallest — the same 5 values, in the same order, as sorting
    * distinct values by seeded hash (the previous per-column
    * formulation), as long as the table fits the bounded prefix.
    * `maxSampleRows` bounds both the scan (LocalLimit early-exits:
    * a 100 TB table reads ~one partition) and the aggregation state;
    * prompt samples don't need corpus-uniform randomness.
    */
  def snapshot(df: DataFrame, seed: Long = 42L,
               maxSampleRows: Int = 10000): collection.Map[String, Seq[Any]] = {
    val result = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Any]]
    if (df.columns.isEmpty) return result
    // DISTINCT (via collect_set) before the seeded-hash order: hashing
    // the value alone makes equal-valued rows tie and collapse the
    // sample to copies of one value on low-cardinality columns;
    // distinct values are also more informative to the LLM
    val aggs = df.columns.map { c =>
      slice(array_sort(collect_set(struct(
        xxhash64(lit(seed), col(c).cast("string")).as("h"),
        col(c).as("v")))), 1, sampleSize).as(c)
    }
    val row = df.limit(maxSampleRows).agg(aggs.head, aggs.tail: _*).head()
    df.columns.zipWithIndex.foreach { case (c, i) =>
      val picks = row.getSeq[Row](i)
      result += c.toLowerCase ->
        picks.map(p => if (p.isNullAt(1)) null else p.get(1))
    }
    result
  }

  /** Distinct values for enum-typed columns (reference :283-287), all
    * columns in one aggregate. NULL renders as "NaN" first (the slot
    * ascending NULLS FIRST ordering put it in before). Ordering is by
    * the NATIVE column value, not its string rendering — a numeric
    * enum column lists 2 before 10, matching what sorted native values
    * (and any cached prompt built from them) look like; the struct is
    * sorted on its leading native field, then projected to strings.
    */
  def distinctValues(df: DataFrame, cols: Seq[String]): collection.Map[String, Seq[String]] = {
    val result = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
    if (cols.isEmpty) return result
    // the when() guard turns NULL column values into NULL elements,
    // which collect_set drops — NULL presence is carried by the n_
    // flag alone, exactly as the string formulation behaved
    val aggs = cols.flatMap(c => Seq(
      array_sort(collect_set(when(col(c).isNotNull, struct(
        col(c).as("nv"), col(c).cast("string").as("sv"))))).as(s"v_$c"),
      max(col(c).isNull.cast("int")).as(s"n_$c")))
    val row = df.agg(aggs.head, aggs.drop(1): _*).head()
    cols.zipWithIndex.foreach { case (c, i) =>
      val vals: Seq[String] =
        if (row.isNullAt(2 * i)) Seq.empty
        else row.getSeq[Row](2 * i).map(_.getString(1))
      val hasNull = !row.isNullAt(2 * i + 1) && row.getInt(2 * i + 1) == 1
      result += c.toLowerCase -> ((if (hasNull) Seq("NaN") else Nil) ++ vals)
    }
    result
  }
}
