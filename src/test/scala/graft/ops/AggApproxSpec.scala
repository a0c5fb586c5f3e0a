package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact") {
    val li = Tables.t(spark, sfDir, "lineitem")
    val exact = li.agg(countDistinct($"l_partkey")).as[Long].head()
    val approx = li.agg(approx_count_distinct($"l_partkey")).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("approx percentile brackets the exact median") {
    val li = Tables.t(spark, sfDir, "lineitem")
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    val approx = li.agg(
      percentile_approx($"l_extendedprice", lit(0.5), lit(10000)))
      .head().getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx $approx vs exact $exact")
  }
}
