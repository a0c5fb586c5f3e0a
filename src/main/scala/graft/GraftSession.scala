package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration.
  *
  * Local mode here; on a cluster the same SQL confs apply (set master/
  * memory via spark-submit). The choices and why:
  *  - shuffle.partitions ≈ total cores locally; at 100 TB size so a
  *    post-shuffle partition is a few hundred MB (AQE coalesces
  *    small ones at runtime anyway).
  *  - AQE on: runtime re-planning (broadcast conversion, skew-join
  *    splitting, partition coalescing) is the safety net for every
  *    plan in this library.
  *  - skewJoin on: splits oversized shuffle partitions on join keys.
  *  - maxPartitionBytes 128 MB: scan tasks sized for executor memory;
  *    spill-aware rather than spill-prone.
  *  - UTC session timezone: deterministic date/time semantics.
  */
object GraftSession {
  def create(appName: String = "graft",
             cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      // SQLite-dialect native functions + regex-prefix pushdown rule
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
