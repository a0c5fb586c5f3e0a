package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Set operations, subqueries and CTEs (SURVEY.md §2B). These run
  * through `spark.sql` over temp views — the exact execution path the
  * engine's text2sql layer uses (generated SQL → spark.sql), so these
  * keys double as end-to-end coverage of that path. Catalyst rewrites
  * IN/EXISTS subqueries to semi-joins and decorrelates scalar
  * subqueries; nothing here is driver-side.
  */
object QueriesSql {
  type Q = (SparkSession, String) => DataFrame

  private def sql(q: String): Q = (s, d) => {
    Tables.registerAll(s, d)
    s.sql(q)
  }

  /** Queries whose text is valid in BOTH Spark SQL and DuckDB — the
    * oracle is the same string, which is itself a demonstration that
    * the engine executes the delegated SQL dialect surface verbatim.
    */
  private val common: Map[String, String] = Map(
    "set_union" ->
      """SELECT c_nationkey AS nk FROM customer
         UNION SELECT s_nationkey AS nk FROM supplier
         ORDER BY nk""",
    "set_union_all" ->
      """SELECT nk, CAST(COUNT(*) AS BIGINT) AS n FROM (
           SELECT c_nationkey AS nk FROM customer
           UNION ALL SELECT s_nationkey AS nk FROM supplier)
         GROUP BY nk ORDER BY nk""",
    "set_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
         INTERSECT SELECT s_nationkey AS nk FROM supplier
         ORDER BY nk""",
    "set_except" ->
      """SELECT c_nationkey AS nk FROM customer
         EXCEPT SELECT s_nationkey AS nk FROM supplier
         ORDER BY nk""",
    "subq_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
         ORDER BY o_orderkey, o_totalprice""",
    "subq_in" ->
      """SELECT c_custkey FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 30000)
         ORDER BY c_custkey""",
    "subq_exists" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey
             AND o_orderdate >= TIMESTAMP '2001-01-01')
         ORDER BY c_custkey""",
    "subq_derived" ->
      """SELECT nk, n_cust FROM (
           SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_cust
           FROM customer GROUP BY c_nationkey) t
         WHERE n_cust > 3 ORDER BY nk""",
    "cte" ->
      """WITH seg AS (
           SELECT c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS n_cust
           FROM customer GROUP BY c_mktsegment),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM customer)
         SELECT seg, n_cust, total FROM seg CROSS JOIN tot
         ORDER BY seg""",
    "cte_recursive" ->
      """WITH RECURSIVE seq(x) AS (
           SELECT 1 UNION ALL SELECT x + 1 FROM seq WHERE x < 10)
         SELECT x, x * x AS sq FROM seq ORDER BY x""",
    // correlated scalar subquery in the SELECT list — Catalyst
    // decorrelates it to ONE left-outer aggregate join (no per-row
    // re-execution; `.explain` shows a single Aggregate + Join), the
    // rewrite that makes this shape viable at 100 TB fact sizes
    "subq_scalar_corr" ->
      """SELECT c_custkey,
           (SELECT MAX(o_totalprice) FROM orders
             WHERE o_custkey = c_custkey) AS max_order
         FROM customer ORDER BY c_custkey""",
    // LATERAL correlated derived table (per-row subquery over another
    // table) — same decorrelation story: Spark plans the aggregate once
    // and joins, it does not loop. Aggregate-only lateral ⇒ exactly one
    // row per outer row in both engines (COUNT over empty group = 0).
    "subq_lateral" ->
      """SELECT n_name, t.n_cust, t.max_bal
         FROM nation, LATERAL (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_cust, MAX(c_acctbal) AS max_bal
           FROM customer WHERE c_nationkey = n_nationkey) t
         ORDER BY n_name""",
    // inline VALUES table joined as a dimension — the canonical "tiny
    // literal lookup" pattern (label maps, rate tables). Planned as a
    // LocalRelation: broadcast side for free, never a shuffle.
    "values_inline" ->
      """SELECT m.label, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(o.o_totalprice) AS DOUBLE), 2) AS sum_price
         FROM orders o
         JOIN (VALUES ('1-URGENT', 'urgent'), ('2-HIGH', 'high'),
                      ('3-MEDIUM', 'medium')) AS m(pri, label)
           ON o.o_orderpriority = m.pri
         GROUP BY m.label ORDER BY label""",
  )

  val queries: Map[String, Q] = common.map { case (k, q) => k -> sql(q) }
  val oracle: Map[String, String] = common
}
