package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2B "Window functions") plus the
  * batch-expressible streaming analogs (tumbling / sliding / session
  * time windows — Structured Streaming runs the same expressions over
  * an unbounded source; see graft.streaming for the streaming wiring).
  *
  * Determinism: every window ORDER BY ends in a unique tie-break key so
  * rank/ntile/lag assignments match the oracle row-for-row. Running
  * aggregates over doubles are rounded (frame-summation order differs
  * between engines).
  *
  * Scale notes: all windows partition by a key (no global windows →
  * no single-task sort). Time windows shuffle once on (window, key).
  */
object QueriesWindows {
  type Q = (SparkSession, String) => DataFrame
  private def t(n: String)(s: SparkSession, d: String) = Tables.t(s, d, n)

  val queries: Map[String, Q] = Map(
    "win_row_number" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(asc("o_orderdate"), asc("o_orderkey"))
      t("orders")(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn", "o_orderkey")
    }),

    "win_rank" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment").orderBy(desc("c_acctbal"), asc("c_custkey"))
      t("customer")(s, d)
        .select(col("c_mktsegment"), col("c_custkey"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          round(percent_rank().over(w), 8).as("prnk"),
          round(cume_dist().over(w), 8).as("cdist"),
          ntile(4).over(w).as("quartile"))
        .orderBy("c_mktsegment", "rnk", "c_custkey")
    }),

    "win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      t("events")(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1, -1.0).over(w).as("next_value"))
        .orderBy("user_id", "event_id")
    }),

    "win_first_last" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t("customer")(s, d)
        .select(col("c_mktsegment"), col("c_custkey"),
          first(col("c_acctbal")).over(w).as("top_bal"),
          last(col("c_acctbal")).over(w).as("bottom_bal"),
          nth_value(col("c_acctbal"), 2).over(w).as("second_bal"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    "win_agg_frame" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(asc("o_orderdate"), asc("o_orderkey"))
      t("orders")(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running_total"),
          round(avg(col("o_totalprice"))
            .over(w.rowsBetween(-2, Window.currentRow)), 4)
            .as("moving_avg3"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // RANGE frame: value-based window — running sum over the last 30
    // days of orders per customer (order key = integer day offset)
    "win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("day_off"))
        .rangeBetween(-30, Window.currentRow)
      t("orders")(s, d)
        .withColumn("day_off",
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")))
        .select(col("o_custkey"), col("o_orderkey"), col("day_off"),
          round(sum(col("o_totalprice")).over(w), 2).as("sum_30d"))
        .orderBy("o_custkey", "day_off", "o_orderkey")
    }),

    // GROUPS frame rewrite — SQLite/DuckDB `GROUPS BETWEEN 1 PRECEDING
    // AND 1 FOLLOWING` has no Spark frame type, but is exactly a RANGE
    // frame over dense_rank(): peer groups collapse to consecutive
    // dense-rank values, so rank distance = group distance. Summed
    // measure is integer-valued l_quantity → exact, no rounding.
    "win_groups_frame" -> ((s, d) => {
      val wRank = Window.partitionBy("l_returnflag")
        .orderBy(asc_nulls_first("l_quantity"))
      val wFrame = Window.partitionBy("l_returnflag").orderBy("dr")
        .rangeBetween(-1, 1)
      t("lineitem")(s, d)
        .withColumn("dr", dense_rank().over(wRank))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"),
          sum(col("l_quantity")).over(wFrame).as("grp_sum"))
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
          "grp_sum")
    }),

    // EXCLUDE clause rewrite — SQLite/DuckDB window EXCLUDE CURRENT
    // ROW / GROUP / TIES over a full-partition frame, as arithmetic on
    // aggregates Spark does have: partition sum minus the excluded
    // piece (current row / the peer group / peers-except-current).
    "win_exclude" -> ((s, d) => {
      val part = Window.partitionBy("l_returnflag")
      val peers = Window.partitionBy("l_returnflag", "l_quantity")
      t("lineitem")(s, d)
        .withColumn("part_sum", sum(col("l_quantity")).over(part))
        .withColumn("peer_sum", sum(col("l_quantity")).over(peers))
        .withColumn("part_n", count(lit(1)).over(part))
        .withColumn("peer_n", count(lit(1)).over(peers))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"),
          // an excluded-to-empty frame sums to NULL, not 0
          when(col("part_n") === 1, lit(null))
            .otherwise(col("part_sum") - col("l_quantity")).as("excl_current"),
          when(col("part_n") === col("peer_n"), lit(null))
            .otherwise(col("part_sum") - col("peer_sum")).as("excl_group"),
          (col("part_sum") - col("peer_sum") + col("l_quantity")).as("excl_ties"))
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    }),

    // SQLite ≥ 3.28 named-window clause (WINDOW w AS ...), executed
    // through Spark's OWN SQL parser — every window function shares
    // the one named spec, so the plan has a single sort+window pass
    // (same dedup the Column API keys get from identical WindowSpecs).
    "win_named" -> ((s, d) => {
      t("customer")(s, d).createOrReplaceTempView("cust_wn")
      s.sql("""SELECT c_custkey, c_mktsegment,
                 ROW_NUMBER() OVER w AS rn,
                 COUNT(*) OVER w AS n_seen,
                 MIN(c_acctbal) OVER w AS min_seen,
                 ROUND(SUM(c_acctbal) OVER w, 2) AS run_bal
               FROM cust_wn
               WINDOW w AS (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey)
               ORDER BY c_custkey""")
    }),

    // --- streaming analogs (same expressions run under readStream) ---

    "win_tumbling" -> ((s, d) =>
      t("events")(s, d)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").as("win_start"), col("n_events"), col("sum_value"))
        .orderBy("win_start")),

    "win_sliding" -> ((s, d) =>
      t("events")(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").as("win_start"), col("n_events"), col("sum_value"))
        .orderBy("win_start")),

    "win_session" -> ((s, d) =>
      t("events")(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("user_id"), col("session_window.start").as("sess_start"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "sess_start")),
  )

  val oracle: Map[String, String] = Map(
    "win_named" ->
      """SELECT c_custkey, c_mktsegment,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_seen,
           MIN(c_acctbal) OVER w AS min_seen,
           ROUND(CAST(SUM(c_acctbal) OVER w AS DOUBLE), 2) AS run_bal
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal DESC, c_custkey)
         ORDER BY c_custkey""",
    // this DuckDB build lacks GROUPS frames too — the oracle states the
    // same semantics an independent way: peer-group totals windowed with
    // a ROWS frame over the DISTINCT groups, joined back to rows
    "win_groups_frame" ->
      """WITH g AS (
           SELECT l_returnflag, l_quantity, SUM(l_quantity) AS gsum
           FROM lineitem GROUP BY 1, 2),
         w AS (
           SELECT l_returnflag, l_quantity,
             SUM(gsum) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
               ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS grp_sum
           FROM g)
         SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_quantity,
                w.grp_sum
         FROM lineitem l
         JOIN w ON l.l_returnflag = w.l_returnflag
               AND l.l_quantity = w.l_quantity
         ORDER BY l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_quantity,
                  w.grp_sum""",
    "win_exclude" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           SUM(l_quantity) OVER (PARTITION BY l_returnflag
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE CURRENT ROW) AS excl_current,
           SUM(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE GROUP) AS excl_group,
           SUM(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             EXCLUDE TIES) AS excl_ties
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity""",
    "win_row_number" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
           SELECT o_custkey, o_orderkey, CAST(ROW_NUMBER() OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS INTEGER) AS rn
           FROM orders) WHERE rn <= 3
         ORDER BY o_custkey, rn, o_orderkey""",
    "win_rank" ->
      """SELECT c_mktsegment, c_custkey,
           CAST(RANK() OVER w AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
           ROUND(PERCENT_RANK() OVER w, 8) AS prnk,
           ROUND(CUME_DIST() OVER w, 8) AS cdist,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
         ORDER BY c_mktsegment, rnk, c_custkey""",
    "win_lag_lead" ->
      """SELECT user_id, event_id, value,
           LAG(value, 1) OVER w AS prev_value,
           LEAD(value, 1, -1.0) OVER w AS next_value
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
         ORDER BY user_id, event_id""",
    "win_first_last" ->
      """SELECT c_mktsegment, c_custkey,
           FIRST_VALUE(c_acctbal) OVER w AS top_bal,
           LAST_VALUE(c_acctbal) OVER w AS bottom_bal,
           NTH_VALUE(c_acctbal, 2) OVER w AS second_bal
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment
           ORDER BY c_acctbal DESC, c_custkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY c_mktsegment, c_custkey""",
    "win_agg_frame" ->
      """SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           ROUND(AVG(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "win_range_frame" ->
      """SELECT o_custkey, o_orderkey,
           CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS day_off,
           ROUND(SUM(o_totalprice) OVER
             (PARTITION BY o_custkey
              ORDER BY DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
              RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS sum_30d
         FROM orders
         ORDER BY o_custkey, day_off, o_orderkey""",
    "win_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(value) AS DOUBLE), 2) AS sum_value
         FROM events GROUP BY 1 ORDER BY win_start""",
    "win_sliding" ->
      """SELECT win_start, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(value) AS DOUBLE), 2) AS sum_value
         FROM (
           SELECT time_bucket(INTERVAL '15 minutes', ts)
                    - k.k * INTERVAL '15 minutes' AS win_start, value
           FROM events
           CROSS JOIN (SELECT UNNEST(range(4)) AS k) k)
         GROUP BY 1 ORDER BY win_start""",
    "win_session" ->
      """WITH g AS (
           SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
           FROM events),
         s AS (
           SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM g)
         SELECT user_id, MIN(ts) AS sess_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(value) AS DOUBLE), 2) AS sum_value
         FROM s GROUP BY user_id, sid
         ORDER BY user_id, sess_start""",
  )
}
