package graft.ops

import graft.SparkSpec

/** Proves the engine-native skew mechanism actually engages: under
  * forced sort-merge thresholds, AQE must split the oversized flag
  * partitions of `opt_skew_aqe_join` (3-value join key, one partition
  * ~50% of the fact table) and mark the join `skew=true` in the final
  * adaptive plan. Complements the manual-salting keys, which prove the
  * same result can be produced when the engine mechanism is
  * unavailable (e.g. a downstream requirement forbids the split).
  */
class AqeSkewProbe extends SparkSpec {

  private val tuning = Seq(
    // force the shuffled join (the dim broadcasts otherwise at test SF)
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // the 3 join keys can hash into two ~equal-size partitions at test
    // SF, so nothing exceeds the default 5x-median factor that targets
    // real production skew; any-oversized-partition semantics (factor
    // below 1 + tiny byte threshold) scale the mechanism down to the
    // test corpus
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "0.5",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
    "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")

  test("AQE splits the hot flag partition: skew=true in the final plan") {
    val conf = spark.conf
    val saved = tuning.map { case (k, _) => k -> conf.getOption(k) }
    try {
      tuning.foreach { case (k, v) => conf.set(k, v) }
      val df = graft.SparkEntry.queries("opt_skew_aqe_join")(spark, sfDir)
      val rows = df.collect()
      assert(rows.length >= 3, "one output row per return flag")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"no skew-split join in the final adaptive plan:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("opt_skew_aqe_join matches the plain aggregation under defaults") {
    val viaJoin = graft.SparkEntry.queries("opt_skew_aqe_join")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val direct = Tables.t(spark, sfDir, "lineitem")
      .groupBy(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("flag_"),
        org.apache.spark.sql.functions.col("l_returnflag")).as("rf_label"))
      .count().orderBy("rf_label")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaJoin == direct)
  }
}
