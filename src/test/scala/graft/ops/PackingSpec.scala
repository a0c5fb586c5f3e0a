package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sequence packing invariants ([[Packing.packGreedy]]). */
class PackingSpec extends SparkSpec {

  private def docs = Tables.t(spark, sfDir, "documents")

  test("every document lands in exactly one bin; capacity is respected") {
    val packed = Packing.packGreedy(docs, "doc_id", "n_chars", 8192L, 8)
      .persist()
    try {
      assert(packed.count() == docs.filter(col("doc_id").isNotNull &&
        col("n_chars").isNotNull).count())
      assert(packed.select("id").distinct().count() == packed.count())
      // a bin's fill exceeds capacity ONLY when it is a single
      // oversize document
      val over = packed.groupBy("grp", "bin")
        .agg(sum("toks").as("fill"), count(lit(1)).as("n"))
        .filter(col("fill") > 8192L && col("n") > 1)
      assert(over.count() == 0)
    } finally packed.unpersist()
  }

  test("greedy is exact within a group: no earlier bin could have held a doc") {
    // single group = a pure sequential scan; replay it on the driver
    // and compare bin-for-bin
    val packed = Packing.packGreedy(docs.limit(500), "doc_id", "n_chars",
        8192L, 1)
      .orderBy("id").collect()
    var fill = 0L; var bin = 0L; var first = true
    packed.foreach { r =>
      val toks = r.getLong(3)
      if (first) { fill = toks; first = false }
      else if (fill + toks <= 8192L) fill += toks
      else { bin += 1; fill = toks }
      assert(r.getLong(2) == bin, s"doc ${r.getLong(0)}")
    }
  }

  test("deterministic across runs and repartitionings") {
    val a = Packing.packGreedy(docs, "doc_id", "n_chars", 4096L, 16)
    val b = Packing.packGreedy(docs.repartition(7), "doc_id", "n_chars",
      4096L, 16)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("packing pays exactly one shuffle (the group repartition)") {
    // the scan runs behind an RDD transition, so audit the LINEAGE:
    // exactly one ShuffleDependency end-to-end
    val rdd = Packing.packGreedy(docs, "doc_id", "n_chars", 8192L, 16).rdd
    val seen = scala.collection.mutable.Set.empty[Int]
    def shuffles(r: org.apache.spark.rdd.RDD[_]): Int =
      if (!seen.add(r.id)) 0
      else r.dependencies.map {
        case s: org.apache.spark.ShuffleDependency[_, _, _] =>
          1 + shuffles(s.rdd)
        case d => shuffles(d.rdd)
      }.sum
    assert(shuffles(rdd) == 1)
  }

  test("oversize documents occupy a bin alone and do not poison the next") {
    import spark.implicits._
    val d = Seq((0L, 100L), (1L, 5000L), (2L, 100L), (3L, 200L))
      .toDF("doc_id", "n_toks")
    val out = Packing.packGreedy(d, "doc_id", "n_toks", 1000L, 1)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
    // 0 fills bin0; 1 is oversize -> bin1 alone; 2,3 share bin2
    assert(out.toSeq == Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 2L)))
  }
}
