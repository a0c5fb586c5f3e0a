package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: run one named query N times and print each wall time,
  * plus the formatted plan on request.
  *   runMain graft.tools.Prof <key> [n] [explain]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val n = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(key)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      println(f"PROF $key run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($c rows)")
    }
    if (args.contains("explain")) fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
