package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** Sequence packing — assigning documents to fixed-capacity context
  * windows ("bins") for LLM pre-training batches. Every large-scale
  * training pipeline runs a packing pass between curation and
  * tokenized-shard writing; the reference has no analog (SURVEY §2C
  * extension surface).
  *
  * Exact greedy packing is inherently sequential (each bin decision
  * depends on the previous fill), so the distributed shape is the
  * standard one: shard the corpus into `groups` deterministic pack
  * groups, run the exact greedy scan INSIDE each group, and let groups
  * pack in parallel. Packing quality is within-group first-fit — the
  * accepted approximation at scale (a global sequential scan cannot
  * exist on a cluster), and group count tunes the tradeoff: at 100 TB
  * pick `groups` so a group holds ~10⁵–10⁶ docs; the per-group scan
  * stays bounded while thousands of groups saturate the executors.
  *
  * Group assignment is `id % groups` — deterministic and
  * engine-portable, so the DuckDB oracle replays the identical greedy
  * recursion (recursive CTE) and hash-matches bin-for-bin. The scan
  * itself is one `repartition` on the group key + an in-partition sort
  * + a single forward pass (`mapPartitions` over sorted rows — the
  * legitimate use: per-partition imperative state, no Catalyst
  * equivalent); no driver data path, no second shuffle.
  */
object Packing {

  /** Greedy first-fit-in-order packing.
    *
    * Within each group (rows ordered by `idCol`): a document joins the
    * current bin when it fits (`fill + toks <= capacity`), else opens
    * the next bin; an oversize document (`toks > capacity`) occupies a
    * bin alone — the caller decides whether to split or drop those
    * upstream. Returns (id, grp, bin, toks); `bin` is 0-based within
    * the group.
    */
  def packGreedy(docs: DataFrame, idCol: String, tokenCol: String,
                 capacity: Long, groups: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(groups > 0, "groups must be positive")
    val spark = docs.sparkSession
    val prepared = docs
      .filter(col(idCol).isNotNull && col(tokenCol).isNotNull)
      .select(col(idCol).cast(LongType).as("id"),
        col(tokenCol).cast(LongType).as("toks"),
        pmod(col(idCol).cast(LongType), lit(groups.toLong))
          .cast(IntegerType).as("grp"))
      .repartition(col("grp"))
      .sortWithinPartitions(col("grp"), col("id"))
    val outSchema = new StructType()
      .add("id", LongType, nullable = false)
      .add("grp", IntegerType, nullable = false)
      .add("bin", LongType, nullable = false)
      .add("toks", LongType, nullable = false)
    val packed = prepared.rdd.mapPartitions { it =>
      // one forward pass; state resets at each group boundary (the
      // sort co-locates and orders groups inside the partition)
      var curGrp = Int.MinValue
      var fill = 0L
      var bin = 0L
      it.map { r =>
        val id = r.getLong(0)
        val toks = r.getLong(1)
        val grp = r.getInt(2)
        if (grp != curGrp) { curGrp = grp; bin = 0L; fill = toks }
        else if (fill + toks <= capacity) fill += toks
        else { bin += 1L; fill = toks }
        Row(id, grp, bin, toks)
      }
    }
    spark.createDataFrame(packed, outSchema)
  }
}
