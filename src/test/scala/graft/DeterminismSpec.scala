package graft

/** Runs every declared key TWICE at sf0.001 and requires byte-identical
  * row sequences. The driver's correctness gate hashes rows in output
  * order, so any nondeterminism — an under-specified ORDER BY, an
  * unsorted collect_list, a rand() without a seed, map-ordering leaks —
  * is a latent hash mismatch; this surfaces it as a named failure
  * instead of a flaky round.
  */
class DeterminismSpec extends SparkSpec {

  private def fingerprint(key: String): Seq[String] = {
    val df = SparkEntry.queries(key)(spark, sfDir)
    df.collect().map(_.toString).toSeq
  }

  SparkEntry.queries.keys.toSeq.sorted.foreach { key =>
    test(s"$key is run-to-run deterministic") {
      val a = fingerprint(key)
      val b = fingerprint(key)
      assert(a.size == b.size, s"$key row count varies: ${a.size} vs ${b.size}")
      val firstDiff = a.zip(b).indexWhere { case (x, y) => x != y }
      if (firstDiff >= 0)
        fail(s"$key differs at row $firstDiff:\n  run1: ${a(firstDiff)}\n  run2: ${b(firstDiff)}")
    }
  }
}
