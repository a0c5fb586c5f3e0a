package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composite analytical queries in the classic TPC-H shapes — the
  * multi-join + aggregate + top-k plans an LLM actually generates for
  * business questions, exercised end-to-end rather than one operator
  * at a time. Plan hygiene at 100 TB: only the FIXED-cardinality
  * dimensions (`region` 5 rows, `nation` 25 rows) carry an explicit
  * `broadcast()` hint; `customer`/`supplier` grow with SF (tens of GB
  * at the 100 TB design point, past the 8 GB broadcast hard limit),
  * so their join strategy is left to the optimizer + AQE, which
  * broadcasts them at small SF and falls back to a shuffled join at
  * scale. The fact table is scanned once with pushed date filters;
  * aggregation is partial+final on the group keys; top-k is
  * TakeOrderedAndProject.
  */
object QueriesTpch {
  type Q = (SparkSession, String) => DataFrame
  private def t(n: String)(s: SparkSession, d: String) = Tables.t(s, d, n)

  val queries: Map[String, Q] = Map(
    // Q3 shape: shipping-priority — 3-way join, grouped revenue, top 10
    "q_shape_q3" -> ((s, d) => {
      val cust = t("customer")(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = t("orders")(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t("lineitem")(s, d)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("revenue"),
          col("o_orderdate"), col("o_orderpriority"))
    }),

    // Q5 shape: local-supplier revenue by nation within one region —
    // 6-way join with the customer/supplier same-nation constraint
    "q_shape_q5" -> ((s, d) => {
      val li = t("lineitem")(s, d)
      val ord = t("orders")(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val cust = t("customer")(s, d)
      val supp = t("supplier")(s, d)
      val nat = t("nation")(s, d)
      val reg = t("region")(s, d).filter(col("r_name") === "ASIA")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(supp, li("l_suppkey") === supp("s_suppkey") &&
          cust("c_nationkey") === supp("s_nationkey"))
        .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), asc("n_name"))
    }),

    // Q10 shape: returned-item customer ranking — join + filter on the
    // fact side, top 20 customers by lost revenue
    "q_shape_q10" -> ((s, d) => {
      val li = t("lineitem")(s, d).filter(col("l_returnflag") === "R")
      val ord = t("orders")(s, d)
      val cust = t("customer")(s, d)
      val nat = t("nation")(s, d)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_shape_q3" ->
      """SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q_shape_q5" ->
      """SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1999-01-01'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name""",
    "q_shape_q10" ->
      """SELECT c_custkey, c_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
  )
}
