package graft.ops

import graft.SparkSpec

/** The compaction key's layout claims, verified from the filesystem:
  * the fragmented input really is splintered, the compacted output
  * hits the size-derived file count, and no rows are lost.
  */
class CompactSinkProbe extends SparkSpec {

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))

  test("compaction consolidates 64 splinter files to the size-derived count") {
    val df = graft.SparkEntry.queries("opt_compact_sink")(spark, sfDir)
    val nRows = df.count() // materializes both layouts on first run
    val tag = new java.io.File(sfDir).getName.replaceAll("[^0-9a-zA-Z]", "_")
    val frag = parquetFiles(s"target/warehouse/docs_fragmented_$tag")
    val comp = parquetFiles(s"target/warehouse/docs_compacted_$tag")
    assert(frag.length == 64, s"expected a splintered layout, got ${frag.length} files")
    val expected = QueriesOpt.compactTargetPartitions(
      spark, s"target/warehouse/docs_fragmented_$tag", 4L * 1024 * 1024)
    assert(comp.length == expected,
      s"compacted to ${comp.length} files, size math says $expected")
    assert(comp.length < frag.length, "compaction must reduce the file count")
    // content preserved
    val src = Tables.t(spark, sfDir, "documents").count()
    assert(nRows == src, s"row loss: $nRows vs $src")
    // and every compacted file is within sane bounds of the target
    // (small corpora land in one file; the guard matters for many)
    assert(comp.forall(_.length <= 8L * 1024 * 1024),
      "a compacted file exceeds 2x the target size")
  }
}
