ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pandasqlitespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// pass forked runMain output through raw (no [info]/[error] log tags)
// so graft.Bench's single JSON line is machine-parseable from stdout
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ---------------------------------------------------------------------
// Parallel forked test groups (r13). The suite is ~30 minutes run
// sequentially in one JVM — dominated by a handful of heavy suites
// (the full-surface determinism/execution sweeps and the DML
// machinery specs). Suites are packed greedily by measured cost into
// groups, each forked into its OWN JVM with its OWN working directory:
// every scratch path in the tree is CWD-relative (target/graft_tmp,
// target/ann_index, target/warehouse, spark-warehouse, derby.log), so
// per-group working directories give complete filesystem isolation —
// no shared fixture can race across JVMs, and each group's
// SparkSession/catalog is process-private. Test NAMES and counts are
// unchanged; only the packaging into JVMs is.
val measuredSuiteCost: Map[String, Int] = Map(
  // seconds, measured from a full -oD run at r13 start (idle host)
  "graft.DeterminismSpecA" -> 204, "graft.DeterminismSpecB" -> 204,
  "graft.QueriesSpecA" -> 123, "graft.QueriesSpecB" -> 123,
  "graft.ops.IvfAssignPerfProbe" -> 25, "graft.exec.ForeignKeySpec" -> 178,
  "graft.exec.UpsertChainSpec" -> 116, "graft.exec.UniqueSpec" -> 115,
  "graft.streaming.StreamingSpec" -> 115, "graft.exec.ConstraintSpec" -> 74,
  "graft.text2sql.SqlDmlSpec" -> 67, "graft.exec.TriggerSpec" -> 63,
  "graft.exec.AutoincrementSpec" -> 59, "graft.ops.SimilaritySpec" -> 58,
  "graft.ops.DedupSpec" -> 35, "graft.exec.StrictTableSpec" -> 23,
  "graft.exec.RowidSpec" -> 21, "graft.exec.TriggerRaiseSpec" -> 20,
  "graft.exec.GeneratedColsSpec" -> 20, "graft.PipelineSpec" -> 18,
  "graft.ops.MultimodalSpec" -> 18, "graft.text2sql.SqlDialectSpec" -> 14,
  "graft.exec.CollationSpec" -> 12, "graft.exec.SessionChangesSpec" -> 10,
  "graft.exec.PragmaSpec" -> 8, "graft.ops.MinHashPerfProbe" -> 8,
  "graft.ops.QueriesTrainSpec" -> 7,
)
val testGroupCount = 7
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val env = (Test / envVars).value
  val base = baseDirectory.value
  // greedy bin-packing: heaviest first into the lightest bin
  val bins = Array.fill(testGroupCount)(
    (scala.collection.mutable.ListBuffer.empty[sbt.TestDefinition], Array(0)))
  tests.sortBy(t => -measuredSuiteCost.getOrElse(t.name, 4)).foreach { t =>
    val (buf, load) = bins.minBy(_._2(0))
    buf += t
    load(0) += measuredSuiteCost.getOrElse(t.name, 4)
  }
  bins.zipWithIndex.toSeq.map { case ((buf, _), i) =>
    val wd = base / "target" / "testwork" / s"g$i"
    sbt.IO.createDirectory(wd)
    Tests.Group(s"g$i", buf.toSeq, Tests.SubProcess(
      ForkOptions()
        .withWorkingDirectory(Some(wd))
        .withRunJVMOptions(opts)
        .withEnvVars(env)))
  }
}
// sbt's default restriction runs ONE forked test group at a time —
// lift it to the group count (the whole point is concurrent JVMs)
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.limitAll(math.max(4, java.lang.Runtime.getRuntime.availableProcessors())))
