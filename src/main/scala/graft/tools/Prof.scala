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
    // job-boundary tracer: prints each job's [start, end] offset within the
    // run, so driver-side gaps (analysis / codegen compile) are visible as
    // the space BETWEEN jobs
    val base = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    val run = new java.util.concurrent.atomic.AtomicInteger(0)
    if (args.contains("jobs"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        // capture (start, epoch, run) at job START so a late job-end event
        // from a prior run prints against ITS OWN epoch, not the next run's
        private val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, Long, Int)]
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts(j.jobId) = (System.nanoTime(), base.get, run.get)
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t1 = System.nanoTime()
          val (t0, epoch, r) = starts.getOrElse(j.jobId, (t1, base.get, run.get))
          println(f"  run$r job ${j.jobId}%3d: start ${(t0 - epoch) / 1e9}%6.3f end ${(t1 - epoch) / 1e9}%6.3f (${(t1 - t0) / 1e9}%5.3f s)")
        }
      })
    val fn = graft.SparkEntry.queries(key)
    (1 to n).foreach { i =>
      run.set(i)
      base.set(System.nanoTime())
      val t0 = System.nanoTime()
      if (args.contains("phases")) {
        // driver-side phase split: construction / analysis+optimize /
        // physical planning / execution — pinpoints where between-job
        // gaps come from
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.optimizedPlan
        val t2 = System.nanoTime()
        df.queryExecution.executedPlan
        val t3 = System.nanoTime()
        val c = df.count()
        val t4 = System.nanoTime()
        println(f"PROF $key run$i phases: build ${(t1 - t0) / 1e9}%.3f " +
          f"optimize ${(t2 - t1) / 1e9}%.3f plan ${(t3 - t2) / 1e9}%.3f " +
          f"exec ${(t4 - t3) / 1e9}%.3f total ${(t4 - t0) / 1e9}%.3f ($c rows)")
      } else {
        val c = fn(spark, sfDir).count()
        println(f"PROF $key run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($c rows)")
      }
    }
    if (args.contains("explain")) fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
