package graft.ops

import graft.SparkSpec

/** Physical-plan audits for the window rewrite keys: the properties
  * that make them scale must be visible in the plan, not assumed.
  */
class PlanAuditProbe extends SparkSpec {
  private def plan(k: String): String =
    graft.SparkEntry.queries(k)(spark, sfDir).queryExecution.executedPlan.toString

  test("q5 shape broadcasts every dimension; only the fact join shuffles") {
    val p = plan("q_shape_q5")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    val smj = "SortMergeJoin".r.findAllIn(p).size
    val shj = "ShuffledHashJoin".r.findAllIn(p).size
    // customer, supplier, nation, region always broadcast; the
    // lineitem⋈orders fact join may also broadcast at tiny SF (orders
    // fits the threshold) but must never be a nested-loop/cartesian
    assert(bhj >= 4, s"$bhj broadcast joins\n${p.take(1500)}")
    assert(smj + shj <= 1, s"${smj + shj} shuffled joins")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("window rewrites share ONE partition exchange and prune columns") {
    for (k <- Seq("win_groups_frame", "win_exclude")) {
      val p = plan(k)
      // both window operators must consume the same hashpartitioning
      // exchange (the only other exchange is the final presentation
      // ORDER BY rangepartitioning)
      val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(hashExchanges == 1, s"$k: $hashExchanges hash exchanges\n${p.take(2000)}")
      // scan reads only the 4 referenced columns of lineitem's 11
      assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
        "l_quantity:double,l_returnflag:string>"), s"$k lost column pruning")
    }
  }
}
