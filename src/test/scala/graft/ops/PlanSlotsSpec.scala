package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Lifecycle contract of the per-invocation persists (PlanSlots):
  *  - re-invoking an entry point over the SAME corpus keeps one shared
  *    cache entry (the CacheManager plan-match reuse the bench's
  *    warm-run semantics declare — this also pins the r12 ADVICE
  *    concern that the census ScalarSubquery's embedded exprIds keep
  *    canonicalizing to the same cache key across invocations);
  *  - re-invoking over a DIFFERENT corpus releases the previous
  *    occupant's blocks, so a long-lived session holds at most one
  *    live intermediate per slot instead of one per corpus ever seen.
  */
class PlanSlotsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(tag: String) = (0L until 40L).map { i =>
    val unique = new scala.util.Random(i).alphanumeric.take(48).mkString
    (i, s"doc $tag number $i body $unique")
  }.toDF("doc_id", "text")

  test("same-corpus reinvocation shares one cache entry; different corpus " +
      "releases the previous occupant") {
    val slot = "dedup.minHashPairs.sigs"
    def run(df: org.apache.spark.sql.DataFrame): Long =
      Dedup.minHashPairs(df, "doc_id", "text", numHashes = 32, bands = 8,
        threshold = 0.5, maxShingleDf = 300, maxBucket = 64).count()

    run(corpus("a"))
    val first = PlanSlots.live(spark, slot).get
    assert(first.storageLevel == StorageLevel.MEMORY_ONLY)

    // same corpus again: the slot's occupant is replaced by an
    // equivalent plan and the FIRST invocation's blocks stay cached
    // (unpersisting them would drop the entry the second run reuses)
    run(corpus("a"))
    val second = PlanSlots.live(spark, slot).get
    assert(second ne first)
    assert(first.storageLevel == StorageLevel.MEMORY_ONLY,
      "same-plan reinvocation must NOT release the shared cache entry")
    assert(second.storageLevel == StorageLevel.MEMORY_ONLY)
    assert(second.queryExecution.analyzed
      .sameResult(first.queryExecution.analyzed),
      "reinvocation over the same corpus must canonicalize to the same " +
        "cache key (census subquery exprIds included)")

    // different corpus: previous occupant is unpersisted
    run(corpus("b"))
    val third = PlanSlots.live(spark, slot).get
    assert(third.storageLevel == StorageLevel.MEMORY_ONLY)
    assert(second.storageLevel == StorageLevel.NONE,
      "a different-plan invocation must release the previous occupant")
  }

  test("chainable persistSlot returns the persisted frame itself") {
    import graft.ops.PlanSlots.Slotted
    val df = Seq(1, 2, 3).toDF("x")
    val p = df.persistSlot("spec.scratch")
    assert(p.storageLevel == StorageLevel.MEMORY_ONLY)
    assert(p.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    PlanSlots.live(spark, "spec.scratch").foreach(_.unpersist(false))
  }
}
