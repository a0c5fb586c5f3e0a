package graft

/** Structural scale guard: no declared key may read a source table
  * more than once UNLESS the repetition is inherent to its semantics
  * (self-joins, corpus-vs-derived-subset anti-joins, unions of two
  * projections of the same table) — those are allowlisted below with
  * the reason. Everything else must share one scan, usually via a
  * persisted narrow intermediate (the q15 / q21 / bm25 / curation
  * pattern). A new key that silently re-scans shows up here as a
  * named failure, not as a 2× I/O surprise at the design scale.
  */
class MultiScanAuditSpec extends SparkSpec {

  /** key -> reason the extra scan is inherent, not accidental. */
  private val allowed: Map[String, String] = Map(
    "ext_dataset_mix" -> "3-row class census reads only the source column; pruned scan beats caching text",
    "ext_decontaminate" -> "corpus vs its own eval-overlap subset (anti-join of a derived set)",
    "ext_decontaminate_report" -> "corpus vs its own eval subset (eval is an external table in production)",
    "ext_dedup_exact" -> "corpus unioned with its planted-duplicate projection",
    "ext_dedup_incremental" -> "history fingerprints vs new-batch union (two filters of the source)",
    "ext_dedup_lines" -> "digest census pass + reassembly pass read different columns",
    "join_asof" -> "probes and updates are two projections of the same events table",
    "join_asof_fwd" -> "probes and updates are two projections of the same events table",
    "join_range" -> "self-join by definition",
    "opt_salted_join" -> "salted self-join demonstration",
    "opt_skew_aqe_join" -> "skewed self-join demonstration",
    "subq_scalar" -> "scalar subquery and outer query share the source by definition",
  )

  test("every key shares its source scans unless allowlisted (with reason)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (k, fn) =>
      val p = fn(spark, sfDir).queryExecution.executedPlan.toString
      val cached = "InMemoryTableScan".r.findAllIn(p).size
      val multi = "(documents|lineitem|orders|events|embeddings)\\.parquet".r
        .findAllIn(p).toSeq.groupBy(identity).exists(_._2.size > 1)
      if (multi && cached == 0 && !allowed.contains(k)) Some(k) else None
    }
    assert(offenders.isEmpty,
      s"uncached multi-scan keys (persist a narrow intermediate or allowlist " +
        s"with a reason): ${offenders.mkString(", ")}")
    // the allowlist must not rot: every entry still names a real key
    val stale = allowed.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"allowlist entries for deleted keys: $stale")
  }
}
