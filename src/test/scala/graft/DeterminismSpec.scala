package graft

/** Runs every declared key TWICE at sf0.001 and requires byte-identical
  * row sequences. The driver's correctness gate hashes rows in output
  * order, so any nondeterminism — an under-specified ORDER BY, an
  * unsorted collect_list, a rand() without a seed, map-ordering leaks —
  * is a latent hash mismatch; this surfaces it as a named failure
  * instead of a flaky round.
  *
  * Split into two interleaved halves (r13): at ~7 minutes this was the
  * single longest suite and the whole run is wall-clock-bounded by its
  * largest sequential suite once suites fork in parallel groups (see
  * build.sbt testGrouping). The split changes packaging only — the
  * same 259 keys produce the same 259 test names; each forked group
  * runs in its own working directory, so the halves' scratch fixtures
  * cannot collide.
  */
abstract class DeterminismHalf(half: Int) extends SparkSpec {

  private def fingerprint(key: String): Seq[String] = {
    val df = SparkEntry.queries(key)(spark, sfDir)
    df.collect().map(_.toString).toSeq
  }

  SparkEntry.queries.keys.toSeq.sorted.zipWithIndex
    .filter(_._2 % 2 == half).map(_._1).foreach { key =>
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

class DeterminismSpecA extends DeterminismHalf(0)
class DeterminismSpecB extends DeterminismHalf(1)
