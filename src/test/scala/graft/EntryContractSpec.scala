package graft

/** The driver-contract invariants that once silently broke (round-4
  * advice: a module's keys were authored but never concatenated into
  * SparkEntry, so the harness never executed them).
  */
class EntryContractSpec extends SparkSpec {

  test("every oracle belongs to a declared key; no key shadows another") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("module maps are disjoint — a duplicate key would silently drop one impl") {
    import graft.ops._
    val maps = Seq(
      "Core" -> QueriesCore.queries, "Joins" -> QueriesJoins.queries,
      "Windows" -> QueriesWindows.queries, "Sql" -> QueriesSql.queries,
      "Functions" -> QueriesFunctions.queries, "Ext" -> QueriesExt.queries,
      "Opt" -> QueriesOpt.queries, "Dialect" -> QueriesDialect.queries,
      "Tpch" -> QueriesTpch.queries, "Train" -> QueriesTrain.queries)
    val dupes = maps.flatMap { case (m, q) => q.keys.map(_ -> m) }
      .groupBy(_._1).filter(_._2.size > 1)
      .map { case (k, ms) => s"$k in ${ms.map(_._2).mkString("+")}" }
    assert(dupes.isEmpty, s"keys declared in multiple modules: $dupes")
    // and the union IS what SparkEntry serves
    assert(maps.map(_._2.keySet).reduce(_ ++ _) == SparkEntry.queries.keySet,
      "a module's keys are not reachable through SparkEntry")
  }
}
