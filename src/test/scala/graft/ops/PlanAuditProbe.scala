package graft.ops

import graft.SparkSpec

/** Physical-plan audits for the window rewrite keys: the properties
  * that make them scale must be visible in the plan, not assumed.
  */
class PlanAuditProbe extends SparkSpec {
  private def plan(k: String): String =
    graft.SparkEntry.queries(k)(spark, sfDir).queryExecution.executedPlan.toString

  test("q5 shape: fixed dims broadcast, no cartesian, bounded shuffled joins") {
    val p = plan("q_shape_q5")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    val smj = "SortMergeJoin".r.findAllIn(p).size
    val shj = "ShuffledHashJoin".r.findAllIn(p).size
    // region (5 rows) and nation (25 rows) carry explicit broadcast
    // hints — they must always be broadcast-hash joins regardless of
    // SF. customer/supplier are SF-proportional and deliberately
    // UN-hinted: at sf0.01 the size-based planner/AQE still
    // broadcasts them, at 100 TB it must be free to shuffle instead,
    // so the plan may carry up to 3 shuffled joins
    // (fact⋈orders, ⋈customer, ⋈supplier) and no more.
    assert(bhj >= 2, s"$bhj broadcast joins (region/nation hints lost)\n${p.take(1500)}")
    assert(smj + shj <= 3, s"${smj + shj} shuffled joins\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // exactly two explicit hints in the logical plan — region and
    // nation — so no forced broadcast of SF-proportional tables
    val logical = graft.SparkEntry.queries("q_shape_q5")(spark, sfDir)
      .queryExecution.analyzed.toString
    val hints = "ResolvedHint".r.findAllIn(logical).size
    assert(hints == 2, s"$hints broadcast hints (want region+nation only)")
  }

  test("decontamination broadcasts the eval side; no shuffled join") {
    val p = plan("ext_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus-side shuffle crept into the contamination check\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("row-local curation ops shuffle only for presentation order") {
    // redaction and hash-split are pure projections: the ONLY exchange
    // allowed is the final ORDER BY rangepartitioning
    for (k <- Seq("ext_pii_redact", "ext_split_hash", "ext_quality_classifier")) {
      val p = plan(k)
      val exchanges = "Exchange ".r.findAllIn(p).size
      assert(exchanges == 1, s"$k: $exchanges exchanges (want the ORDER BY only)\n${p.take(1500)}")
      assert(p.contains("Exchange rangepartitioning"), s"$k lost the sort exchange")
    }
    // packing adds exactly one hash exchange for the shard-local window
    val p = plan("ext_seq_pack")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1500))
  }

  test("date-partitioned sink is scanned with partition pruning") {
    val df = graft.SparkEntry.queries("opt_partition_prune")(spark, sfDir)
    df.collect() // materialize (also writes the layout on first run)
    val p = df.queryExecution.executedPlan.toString
    // the date range must land in PartitionFilters (file-index pruning,
    // zero I/O on excluded dates), not in post-scan Filter
    assert(p.contains("PartitionFilters: ["), p.take(1500))
    val pf = p.substring(p.indexOf("PartitionFilters: ["))
    assert(pf.take(300).contains("event_date"), pf.take(300))
  }

  test("line dedup removes boilerplate via broadcast anti-join; text never shuffles") {
    val df = graft.SparkEntry.queries("ext_dedup_lines")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // the hot-set removal must be a broadcast LeftAnti — shuffling the
    // exploded line table by line content would move the full corpus
    assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(p).isDefined
      || (p.contains("BroadcastHashJoin") && p.contains("LeftAnti")), p.take(2000))
    // the only hash exchanges: the digest census and the per-doc
    // reassembly — both keyed on doc_id/digest, never on line text
    val hashEx = "Exchange hashpartitioning\\(([a-z_#0-9]+)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(hashEx.nonEmpty && hashEx.forall(k =>
      k.startsWith("lfp") || k.startsWith("doc_id")),
      s"unexpected shuffle keys $hashEx\n${p.take(2000)}")
  }

  test("ORC scan pushes the filter to the reader") {
    val df = graft.SparkEntry.queries("scan_orc")(spark, sfDir)
    df.collect() // first run also writes the layout
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [") &&
      p.substring(p.indexOf("PushedFilters: [")).take(200).contains("n_chars"),
      p.take(1500))
  }

  test("correlated subqueries decorrelate: aggregate once, join once — never per-row") {
    // the scalar subquery must become ONE left-outer join against a
    // partially-aggregated orders side; the lateral must become joins
    // against a once-computed aggregate — no nested-loop of any kind
    for (k <- Seq("subq_scalar_corr", "subq_lateral")) {
      val p = plan(k)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$k: per-row subquery execution survived decorrelation\n${p.take(2000)}")
      assert(p.contains("partial_"), s"$k: aggregate lost map-side combine\n${p.take(2000)}")
    }
    val joins = "HashJoin|SortMergeJoin".r
    assert(joins.findAllIn(plan("subq_scalar_corr")).size == 1,
      "scalar subquery should plan exactly one join")
  }

  test("inline VALUES plans as a LocalTableScan broadcast, never a shuffled join") {
    val p = plan("values_inline")
    assert(p.contains("LocalTableScan"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"literal lookup table got shuffled\n${p.take(1500)}")
  }

  test("fuzzy-match projection is row-local: the only exchange is presentation order") {
    val p = plan("fn_fuzzy")
    assert("Exchange ".r.findAllIn(p).size == 1 && p.contains("Exchange rangepartitioning"),
      s"levenshtein projection should not shuffle\n${p.take(1500)}")
  }

  test("bigram counts: map-side combine then bounded TakeOrdered") {
    val p = plan("ext_ngram_counts")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1500))
    assert(p.contains("partial_count"), "bigram count lost map-side combine")
  }

  test("upsert sink: key-unique result, updates win, inserts land") {
    val df = graft.SparkEntry.queries("sink_upsert")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 30) // 25 base (evens replaced in place) + 5 inserts
    assert(rows.map(_.getAs[Any]("n_nationkey")).distinct.length == rows.length,
      "INSERT OR REPLACE must keep the key unique")
    val byKey = rows.map(r => r.getAs[Number]("n_nationkey").longValue() ->
      r.getAs[String]("n_name")).toMap
    assert(byKey(0L).startsWith("UPD_") && !byKey(1L).startsWith("UPD_"))
    assert(byKey.contains(100L) && !byKey(100L).startsWith("UPD_"))
  }

  test("as-of joins (backward and forward) plan with NO join node and one hash exchange") {
    for (k <- Seq("join_asof", "join_asof_fwd")) {
      val p = plan(k)
      // the union+window composition replaces the equi+range join — the
      // O(|L|·|R|) pairwise intermediate must not exist in any form
      assert(!p.contains("Join"), s"$k: join node crept into the as-of plan\n${p.take(2000)}")
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
        s"$k: expected exactly one hash exchange\n${p.take(2000)}")
    }
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
