package graft.ops

import graft.SparkSpec

/** Plan/layout audit for `opt_range_sorted_sink`: the point of a
  * range-partitioned sorted write is that every output file covers a
  * DISJOINT key range and is internally sorted — total order across
  * the dataset with no single-reducer sort. Assert exactly that from
  * the files on disk.
  */
class RangeSinkProbe extends SparkSpec {

  test("range-sorted sink writes disjoint, internally sorted files") {
    graft.SparkEntry.queries("opt_range_sorted_sink")(spark, sfDir).count()
    val dir = new java.io.File(
      s"target/warehouse/orders_ranged_${TableIds.idFor(sfDir)}")
    val parts = dir.listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.length >= 2,
      s"expected multiple range files, got ${parts.length}")

    implicit val ord: Ordering[(String, Long)] = Ordering.Tuple2
    val ranges = parts.toSeq.map { f =>
      val rows = spark.read.parquet(f.getAbsolutePath)
        .select("o_orderdate", "o_orderkey").collect()
        .map(r => (r.get(0).toString, r.getLong(1))).toSeq // NTZ ISO string — order-preserving
      assert(rows.nonEmpty, s"${f.getName} is empty")
      assert(rows == rows.sorted, s"${f.getName} not internally sorted")
      (rows.head, rows.last)
    }
    ranges.sortBy(_._1).sliding(2).foreach {
      case Seq((_, prevMax), (nextMin, _)) =>
        assert(ord.lt(prevMax, nextMin),
          s"file ranges overlap: $prevMax !< $nextMin")
      case _ => // single window at the end
    }
  }
}
