package graft

import org.apache.spark.sql.functions._

/** Every declared query key must execute at sf0.001 and produce a
  * stable, non-degenerate result. The DuckDB value oracle runs in the
  * driver (and in tools/check.py); this spec guards execution, schema
  * sanity, and the queries/oracle contract itself.
  *
  * Split into two interleaved halves (r13, same packaging move as
  * DeterminismSpec): the full-surface execution sweep was the largest
  * single suite once suites fork in parallel groups, so its wall time
  * bounded the whole run. Test names and counts are unchanged.
  */
abstract class QueriesHalf(half: Int) extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex
    .filter(_._2 % 2 == half).map(_._1).foreach { case (name, fn) =>
      test(s"query $name executes at sf0.001 with a sane schema") {
        val df = fn(spark, sfDir)
        val n = df.count()
        assert(df.columns.nonEmpty)
        assert(df.columns.distinct.length == df.columns.length,
          s"duplicate column names in $name: ${df.columns.mkString(",")}")
        assert(n >= 0)
        // keys that must be non-empty even at the smallest sf
        val mustHaveRows = !Set("agg_having").contains(name)
        if (mustHaveRows) assert(n > 0, s"$name returned no rows")
      }
    }
}

class QueriesSpecA extends QueriesHalf(0)
class QueriesSpecB extends QueriesHalf(1)

class QueriesSpec extends SparkSpec {

  // (orphan-oracle and module-disjointness contract checks live in
  // EntryContractSpec)

  test("entry (flagship) returns exactly one top product with positive qty") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Double]("total_qty") > 0)
  }

  test("queries are deterministic across two executions") {
    val twice = Seq("topk", "ext_sim_search", "win_rank", "ext_dedup_minhash")
    twice.foreach { k =>
      val a = SparkEntry.queries(k)(spark, sfDir).collect().toSeq
      val b = SparkEntry.queries(k)(spark, sfDir).collect().toSeq
      assert(a == b, s"$k not deterministic")
    }
  }
}
