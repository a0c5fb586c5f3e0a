package graft.ops

import graft.SparkSpec

/** Layout audit for `opt_zorder_sink`: the point of Z-ordering is that
  * every file covers a narrow range in BOTH clustering dimensions, so
  * min/max file skipping prunes 2-D box predicates. Measure it from
  * the files: normalized per-file key ranges must be well under the
  * full range in both dims, while a single-column sort (the control)
  * leaves the second dimension at full width per file.
  */
class ZorderSinkProbe extends SparkSpec {

  private def fileWidths(dir: java.io.File): Seq[(Double, Double)] = {
    val parts = dir.listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.length >= 4, s"expected several z-files, got ${parts.length}")
    val global = spark.read.parquet(dir.getAbsolutePath)
      .selectExpr("max(l_partkey)", "min(l_partkey)",
        "max(l_suppkey)", "min(l_suppkey)").head()
    val (pSpan, sSpan) = ((global.getLong(0) - global.getLong(1)).toDouble,
      (global.getLong(2) - global.getLong(3)).toDouble)
    parts.toSeq.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .selectExpr("max(l_partkey)", "min(l_partkey)",
          "max(l_suppkey)", "min(l_suppkey)").head()
      ((r.getLong(0) - r.getLong(1)) / pSpan, (r.getLong(2) - r.getLong(3)) / sSpan)
    }
  }

  test("z-ordered files are narrow in BOTH dims; linear sort is not") {
    graft.SparkEntry.queries("opt_zorder_sink")(spark, sfDir).count()
    val zDir = new java.io.File(
      s"target/warehouse/lineitem_zorder_${TableIds.idFor(sfDir)}")
    val z = fileWidths(zDir)
    val (zp, zs) = (z.map(_._1).sum / z.size, z.map(_._2).sum / z.size)

    // control: same data range-partitioned on l_partkey alone
    val linDir = "target/graft_tmp/lineitem_linear_probe"
    Tables.t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .repartitionByRange(8, org.apache.spark.sql.functions.col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linDir)
    val lin = fileWidths(new java.io.File(linDir))
    val (lp, ls) = (lin.map(_._1).sum / lin.size, lin.map(_._2).sum / lin.size)

    assert(zp < 0.7 && zs < 0.7,
      f"z-order files not narrow in both dims: partkey $zp%.2f suppkey $zs%.2f")
    assert(lp < 0.3, f"control should be narrow on its sort key, got $lp%.2f")
    assert(ls > 0.9, f"control should be full-width on the other dim, got $ls%.2f")
    // 8 files of 2-D slabs ≈ 3 z-bits of prefix → each dim narrows by
    // ~1-2 bits, not a full halving in both simultaneously
    assert(zs < ls * 0.7,
      f"z-order should clearly narrow the second dim's file width: $zs%.2f vs $ls%.2f")
  }
}
