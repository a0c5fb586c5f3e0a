package graft.ops

import graft.SparkSpec

/** Physical-plan audits for the window rewrite keys: the properties
  * that make them scale must be visible in the plan, not assumed.
  */
class PlanAuditProbe extends SparkSpec {
  private def plan(k: String): String =
    graft.SparkEntry.queries(k)(spark, sfDir).queryExecution.executedPlan.toString

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
