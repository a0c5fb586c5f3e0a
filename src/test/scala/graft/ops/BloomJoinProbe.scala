package graft.ops

import graft.SparkSpec

/** Proves the engine-native runtime-filter mechanism engages for
  * `opt_bloom_join`: when the dimension side cannot broadcast (forced
  * shuffle join, as at 100 TB), InjectRuntimeFilter must plant a
  * bloom filter built from the filtered dimension keys into the fact
  * side's scan — `might_contain(...)` ahead of the shuffle — so
  * non-matching fact rows are dropped before they move.
  */
class BloomJoinProbe extends SparkSpec {

  private val tuning = Seq(
    // force the shuffled join (the filtered dim broadcasts at test SF)
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    // the fact scan is MBs at test SF, far under the 10 GB production
    // threshold that gates injection; scale the gate down, not off
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")

  test("forced-shuffle plan carries a bloom might_contain on the fact side") {
    // baseline under DEFAULT confs (dim side broadcasts, no bloom) —
    // this is the configuration the DuckDB oracle verifies
    val expected = graft.SparkEntry.queries("opt_bloom_join")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(expected.nonEmpty)
    val conf = spark.conf
    val saved = tuning.map { case (k, _) => k -> conf.getOption(k) }
    try {
      tuning.foreach { case (k, v) => conf.set(k, v) }
      val df = graft.SparkEntry.queries("opt_bloom_join")(spark, sfDir)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n${optimized.take(3000)}")
      // the bloom-filtered shuffle path must return EXACTLY the
      // broadcast path's rows — a false-negative filter would drop some
      val actual = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(actual == expected, s"forced-shuffle result diverged:\n$actual\n$expected")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
