package graft.ops

import graft.SparkSpec

/** Physical-plan audits for the round-5 TPC-H shape keys: each key's
  * header comment claims a scale property (single fact scan, pushed
  * predicates, bounded broadcasts); these tests pin those claims to
  * the actual plan so a regression is a test failure, not a surprise
  * at the design scale.
  */
class TpchPlanAuditSpec extends SparkSpec {
  private def plan(k: String): String =
    graft.SparkEntry.queries(k)(spark, sfDir).queryExecution.executedPlan.toString

  private def factScans(p: String): Int =
    "lineitem\\.parquet".r.findAllIn(p).size

  test("q1: pushed shipdate filter, pruned scan, map-side combine, one hash exchange") {
    val p = plan("q_shape_q1")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p.take(1500))
    // 7 of lineitem's 11 columns referenced — the scan must read only
    // those (plan toString truncates the struct, so match the prefix)
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_tax:double"), "column pruning lost")
    assert(!p.contains("l_orderkey"), "unreferenced key column survived pruning")
    assert(p.contains("partial_sum") && p.contains("partial_avg"),
      "aggregate lost map-side combine")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"want exactly one agg exchange\n${p.take(1500)}")
  }

  test("q6: all three predicates reach the parquet reader; no join, no hash exchange") {
    val p = plan("q_shape_q6")
    val pushed = p.substring(p.indexOf("PushedFilters: ["))
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.take(400).contains(c), s"$c not pushed\n${pushed.take(400)}")
    assert(!p.contains("Join"), "scan-only query grew a join")
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      "global agg needs only the SinglePartition exchange")
  }

  test("q18: lineitem scans ONCE — pre-aggregation replaces the HAVING re-scan") {
    val p = plan("q_shape_q18")
    assert(factScans(p) == 1, s"${factScans(p)} lineitem scans\n${p.take(2000)}")
    // the quantity filter must apply to the aggregate BEFORE any join
    val aggIdx = p.indexOf("HashAggregate")
    val joinIdx = p.indexOf("Join")
    assert(aggIdx >= 0 && joinIdx >= 0 && p.indexOf("sum_qty") < joinIdx,
      "per-order aggregate did not precede the joins")
    assert(p.contains("TakeOrderedAndProject"), "top-100 lost the bounded sort")
  }

  test("q4: EXISTS decorrelates to left-semi with the date filter below the join") {
    val p = plan("q_shape_q4")
    assert(p.contains("LeftSemi"), p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      "orders date window not pushed to the scan")
  }

  test("q15: both consumers read the persisted aggregate — the fact never scans twice") {
    val p = plan("q_shape_q15")
    // both branches must read the cache (the plan prints the cached
    // relation's child under each consumer, so the textual scan count
    // stays 2 — the RUNTIME scan count is 1, which is what the
    // InMemoryTableScan nodes guarantee)
    assert("InMemoryTableScan".r.findAllIn(p).size == 2,
      s"join and max branches must both read the cached per-supplier aggregate\n${p.take(2000)}")
    assert(p.contains("InMemoryRelation"), "per-supplier aggregate lost its persist")
  }

  test("q17: correlated AVG computes as a window — one fact scan, one partkey exchange") {
    val p = plan("q_shape_q17")
    assert(factScans(p) == 1, s"${factScans(p)} lineitem scans\n${p.take(2000)}")
    assert(p.contains("Window ["), "per-part mean lost the window formulation")
    assert("Exchange hashpartitioning\\(l_partkey".r.findAllIn(p).size == 1,
      s"want exactly one partkey exchange\n${p.take(2000)}")
  }

  test("q19: the disjunction factors into pushed per-side predicates; join stays equi") {
    val p = plan("q_shape_q19")
    // Catalyst must derive the quantity envelope for the fact scan and
    // the brand/size envelope for the part scan out of the OR
    val liScan = p.substring(p.indexOf("FileScan parquet [l_partkey"))
    assert(liScan.take(900).contains("l_quantity"), "quantity bands not pushed to lineitem")
    val partScan = p.substring(p.indexOf("FileScan parquet [p_partkey"))
    assert(partScan.take(900).contains("p_brand"), "brand bands not pushed to part")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), "join degraded from equi-join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q22: anti join on filtered orders; the only nested-loop is the 1-row threshold") {
    val p = plan("q_shape_q22")
    assert(p.contains("LeftAnti"), p.take(1500))
    // priority filter must sit on the orders side below the anti join
    assert(p.contains("EqualTo(o_orderpriority,1-URGENT)"),
      "priority filter not pushed to the orders scan")
    // the scalar-average comparison is a broadcast of exactly one row —
    // the single permissible nested-loop
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1, p.take(2000))
    assert(p.contains("In(c_nationkey"), "nation band not pushed to the customer scan")
  }

  test("q3/q10: single fact scan, pushed dimension filters, bounded top-k") {
    for (k <- Seq("q_shape_q3", "q_shape_q10")) {
      val p = plan(k)
      assert(factScans(p) == 1, s"$k: ${factScans(p)} lineitem scans")
      assert(p.contains("TakeOrderedAndProject"), s"$k lost the bounded top-k")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    }
    // q3's segment filter and q10's returnflag filter must reach the scans
    assert(plan("q_shape_q3").contains("EqualTo(c_mktsegment,BUILDING)"))
    assert(plan("q_shape_q10").contains("EqualTo(l_returnflag,R)"))
  }

  test("q8: share is one conditional aggregate over one fact scan; hints on dims only") {
    val p = plan("q_shape_q8")
    assert(factScans(p) == 1, s"${factScans(p)} lineitem scans")
    val logical = graft.SparkEntry.queries("q_shape_q8")(spark, sfDir)
      .queryExecution.analyzed.toString
    assert("ResolvedHint".r.findAllIn(logical).size == 3,
      "only nation (twice) and region may carry forced broadcasts")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q12: one conditional aggregation, shipdate window pushed to the fact scan") {
    val p = plan("q_shape_q12")
    assert(factScans(p) == 1, s"${factScans(p)} lineitem scans")
    assert("HashAggregate".r.findAllIn(p).size == 2, // partial + final, ONE aggregate
      "both priority counts must come from a single conditional aggregation")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      "shipdate window not pushed to the lineitem scan")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q13: zero-order customers survive via the left join; priority filter below it") {
    val p = plan("q_shape_q13")
    assert(p.contains("LeftOuter"), p.take(1500))
    assert(p.contains("EqualTo(o_orderpriority,1-URGENT)") ||
      p.contains("Not(EqualTo(o_orderpriority,1-URGENT))") ||
      p.contains("o_orderpriority"), "priority filter lost")
    // the histogram rows actually include the zero bucket at this SF?
    // not guaranteed — what IS structural: count(o_orderkey), not
    // count(*), so unmatched customers aggregate to zero
    assert(p.contains("count(o_orderkey"), "must count the nullable join side")
  }

  test("q21: one fact pass — both existence tests read the persisted rollup") {
    val p = plan("q_shape_q21")
    // the census filter and the late-pair side must BOTH consume the
    // cached per-(order, supplier) rollup, never re-scan lineitem
    assert("InMemoryTableScan".r.findAllIn(p).size == 2,
      s"census and late-pair branches must read the cache\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("partial_"), "rollup lost map-side combine")
  }

  test("q2: correlated MIN is a window over the one rollup — single fact scan") {
    val p = plan("q_shape_q2")
    assert(factScans(p) == 1, s"${factScans(p)} lineitem scans\n${p.take(2000)}")
    assert(p.contains("Window ["), "per-part min lost the window formulation")
    assert(p.contains("TakeOrderedAndProject"), "top-10 lost the bounded sort")
    val logical = graft.SparkEntry.queries("q_shape_q2")(spark, sfDir)
      .queryExecution.analyzed.toString
    assert("ResolvedHint".r.findAllIn(logical).size == 2,
      "only fixed-cardinality nation/region may carry forced broadcasts")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q9: one fact scan; part-name filter prunes the part side below the join") {
    val p = plan("q_shape_q9")
    assert(factScans(p) == 1, s"${factScans(p)} lineitem scans")
    assert(p.contains("Contains(p_name,red)") || p.contains("contains(p_name"),
      "part-name filter not pushed to the part scan")
    assert(p.contains("partial_sum"), "profit aggregate lost map-side combine")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q11: both threshold and filter read the persisted rollup — one fact scan") {
    val p = plan("q_shape_q11")
    assert("InMemoryTableScan".r.findAllIn(p).size == 2,
      s"threshold and filter branches must both read the cached per-part value\n${p.take(2000)}")
    // the 1-row threshold comparison is the single permissible nested-loop
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1, p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q16: two-column fact projection before the distinct; null-safe anti join") {
    val p = plan("q_shape_q16")
    assert(factScans(p) == 1, s"${factScans(p)} lineitem scans")
    assert(p.contains("ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>"),
      "fact scan must read exactly the two join keys")
    assert(p.contains("LeftAnti"), "flagged-supplier exclusion lost the anti join")
    assert(p.contains("LessThan(s_acctbal,0.0)"),
      "balance filter not pushed to the supplier scan")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q20: correlated total is a window; date window pushed; one fact scan") {
    val p = plan("q_shape_q20")
    assert(factScans(p) == 1, s"${factScans(p)} lineitem scans\n${p.take(2000)}")
    assert(p.contains("Window ["), "per-part total lost the window formulation")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      "shipdate window not pushed to the fact scan")
    assert("LeftSemi".r.findAllIn(p).size == 2,
      "promo-part and excess-supplier qualifications must both be semi joins")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q7: exactly two broadcast hints (the two nation roles); no cartesian") {
    val logical = graft.SparkEntry.queries("q_shape_q7")(spark, sfDir)
      .queryExecution.analyzed.toString
    assert("ResolvedHint".r.findAllIn(logical).size == 2,
      "only the fixed-cardinality nation copies may carry forced broadcasts")
    val p = plan("q_shape_q7")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(factScans(p) == 1, s"${factScans(p)} lineitem scans")
  }
}
