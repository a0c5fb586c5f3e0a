package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational surface: scans, projection, filters, scalar
  * conditionals, aggregation, sort/limit/top-k, distinct.
  *
  * Inventory keys from SURVEY.md §2B. Every query is deterministic
  * (total ORDER BY with unique tie-break keys) and every floating
  * aggregate is rounded so the DuckDB oracle hash-matches despite
  * summation-order differences between engines.
  *
  * Scale notes (100 TB): all queries are single-pass scans with
  * partial aggregation (HashAggregateExec partial/final) or
  * TakeOrderedAndProject for top-k — no driver-side loops, no
  * collect, filters/projections push into the parquet scan.
  */
object QueriesCore {
  type Q = (SparkSession, String) => DataFrame
  private def li(s: SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables.t(s, d, "orders")

  /** CWD-relative scratch dir for round-trip fixture keys (matches the
    * opt_compact_sink convention) — never an absolute checkout path,
    * so the keys run from any working directory.
    */
  private def tmpDir(key: String, d: String): String =
    s"target/graft_tmp/${key}_${new java.io.File(d).getName}"

  val queries: Map[String, Q] = Map(
    "scan_parquet" -> ((s, d) =>
      li(s, d).select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity").limit(100)),

    "scan_table" -> ((s, d) => {
      // named-table scan through the session catalog, the Spark analog
      // of the reference's FROM '<hash>' (pandasqlite.py:247)
      Tables.t(s, d, "region").createOrReplaceTempView("region")
      s.table("region").orderBy("r_regionkey")
    }),

    "sink_table" -> ((s, d) => {
      // replace-mode materialization (pandasqlite.py:115 if_exists='replace')
      Tables.t(s, d, "region").createOrReplaceTempView("graft_sink_t")
      // second registration replaces the first (if_exists='replace')
      Tables.t(s, d, "nation").createOrReplaceTempView("graft_sink_t")
      s.table("graft_sink_t").orderBy("n_nationkey")
    }),

    // NOTE: no round() on per-row computed doubles — both engines do the
    // same IEEE ops on identical inputs, so raw doubles match bitwise,
    // while round() at half-boundaries is NOT portable across engines.
    // header-CSV scan with schema inference (reference test.py:35):
    // round-trip nation through CSV, then read it back inferring types
    "scan_csv" -> ((s, d) => {
      val csvDir = tmpDir("scan_csv", d)
      Tables.t(s, d, "nation").orderBy("n_nationkey")
        .coalesce(1).write.mode("overwrite").option("header", "true").csv(csvDir)
      s.read.option("header", "true").option("inferSchema", "true").csv(csvDir)
        .orderBy("n_nationkey")
    }),

    // JSONL (newline-delimited JSON) scan — the de-facto interchange
    // format for web-scale text corpora: round-trip documents through
    // a JSONL sink, read back with explicit schema (inference costs an
    // extra full pass at 100 TB; a curated corpus declares its schema),
    // and verify content. The write is splittable multi-file (no
    // coalesce) — exactly the layout a distributed reader wants.
    "scan_jsonl" -> ((s, d) => {
      val dir = tmpDir("scan_jsonl", d)
      if (!Tables.writeComplete(dir))
        Tables.t(s, d, "documents").select("doc_id", "text")
          .write.mode("overwrite").json(dir)
      s.read.schema("doc_id BIGINT, text STRING").json(dir)
        .select(col("doc_id"), length(col("text")).as("n_chars_m"),
          md5(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // ORC scan — the other columnar lake format Spark reads natively.
    // Same round-trip shape as scan_jsonl: write documents as ORC
    // (splittable, predicate-pushdown-capable like parquet), read back,
    // and verify content against the oracle's view of the source table.
    "scan_orc" -> ((s, d) => {
      val dir = tmpDir("scan_orc", d)
      if (!Tables.writeComplete(dir))
        Tables.t(s, d, "documents").select("doc_id", "text", "n_chars")
          .write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .filter(col("n_chars") >= 100) // pushed to the ORC reader
        .select(col("doc_id"), col("n_chars"), md5(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // raw-file binary scan — Spark's `binaryFile` source, the ingest
    // path for media directories (images/audio/video as opaque bytes +
    // file metadata) feeding the multimodal decode stages. The fixture
    // models an EXTERNAL media landing zone: 20 files written once
    // driver-side (bounded by construction); production reads the
    // directory in place, splittable across executors, with
    // pathGlobFilter pruning non-media files at listing time.
    "scan_binary" -> ((s, d) => {
      val dir = new java.io.File(tmpDir("scan_binary", d))
      if (!Tables.writeComplete(dir.toString)) {
        dir.mkdirs()
        Tables.t(s, d, "documents").filter(col("doc_id") < 20)
          .select("doc_id", "text").collect()
          .foreach { r =>
            java.nio.file.Files.write(
              new java.io.File(dir, s"doc_${r.getLong(0)}.bin").toPath,
              r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        new java.io.File(dir, "_SUCCESS").createNewFile()
      }
      s.read.format("binaryFile").option("pathGlobFilter", "*.bin")
        .load(dir.toString)
        .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
          col("length").as("n_bytes"), md5(col("content")).as("fp"))
        .orderBy("fname")
    }),

    // XML scan — Spark 4's built-in XML source (the format enterprise
    // document feeds still arrive in). Round-trip shape like scan_orc:
    // a typed slice writes as <doc> rows (the writer escapes markup;
    // free text rides as an md5 fingerprint so escaping can never
    // perturb verified bytes), reads back with an EXPLICIT schema —
    // XML inference is a full extra pass at 100 TB, and a landed feed
    // declares its schema. Multi-file, splittable by row tag.
    "scan_xml" -> ((s, d) => {
      val dir = tmpDir("scan_xml", d)
      if (!Tables.writeComplete(dir))
        Tables.t(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"),
            md5(col("text")).as("fp"))
          .write.mode("overwrite").option("rowTag", "doc")
          .format("xml").save(dir)
      s.read.schema("doc_id BIGINT, lang STRING, n_chars BIGINT, fp STRING")
        .option("rowTag", "doc").format("xml").load(dir)
        .filter(col("n_chars") >= 100)
        .orderBy("doc_id")
    }),

    // line-oriented raw-text scan — `spark.read.text`, the lowest
    // common denominator for web-scale text drops (one record per
    // line, no schema, splittable). The fixture writes one
    // tab-separated line per document (id \t lang \t text-fingerprint
    // — the id keys the line, the fingerprint carries content), then
    // the scan parses lines back into typed columns the way a raw-drop
    // ingest stage would: split_part projections, row-local, pushed on
    // top of a plain text scan with no decode cost beyond UTF-8.
    "scan_text" -> ((s, d) => {
      val dir = tmpDir("scan_text", d)
      if (!Tables.writeComplete(dir))
        Tables.t(s, d, "documents")
          .select(concat_ws("\t", col("doc_id"), col("lang"),
            md5(col("text"))).as("value"))
          .write.mode("overwrite").text(dir)
      s.read.text(dir)
        .select(
          expr("CAST(split_part(value, '\t', 1) AS BIGINT)").as("doc_id"),
          expr("split_part(value, '\t', 2)").as("lang"),
          expr("split_part(value, '\t', 3)").as("fp"))
        .orderBy("doc_id")
    }),

    // upsert sink — SQLite `INSERT OR REPLACE` semantics (last write
    // wins by primary key) expressed as updates ∪ (base ⟕anti updates),
    // materialized and read back. At 100 TB this is the copy-on-write
    // MERGE shape: the anti-join shuffles on the key (or broadcasts the
    // update set when it is small — AQE decides), and only rewritten
    // files are produced; no driver-side row handling anywhere.
    "sink_upsert" -> ((s, d) => {
      val base = Tables.t(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      val upd = base.filter(col("n_nationkey") % 2 === 0)
        .select(col("n_nationkey"),
          concat(lit("UPD_"), col("n_name")).as("n_name"), col("n_regionkey"))
        .unionAll(base.filter(col("n_nationkey") < 5)
          .select((col("n_nationkey") + 100).as("n_nationkey"),
            col("n_name"), col("n_regionkey")))
      // ONE merge implementation: the same updates ∪ anti-joined-base
      // shape the DML route executes (no drift between the bench key
      // and the statement path)
      val merged = graft.exec.Upsert.merge(base, upd, Seq("n_nationkey"))
      val dir = tmpDir("sink_upsert", d)
      merged.write.mode("overwrite").parquet(dir)
      s.read.parquet(dir).orderBy("n_nationkey")
    }),

    // result rows → JSON strings (reference test.py:53-55 to_json path)
    "sink_json" -> ((s, d) =>
      Tables.t(s, d, "nation")
        .select(col("n_nationkey"),
          to_json(struct(col("n_nationkey"), col("n_name"), col("n_regionkey")))
            .as("json_row"))
        .orderBy("n_nationkey")),

    "project" -> ((s, d) =>
      li(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("disc_price"))
        .orderBy("l_orderkey", "l_linenumber", "disc_price").limit(1000)),

    "project_star" -> ((s, d) =>
      Tables.t(s, d, "nation").select(col("*")).orderBy("n_nationkey")),

    "filter_eq" -> ((s, d) =>
      li(s, d).filter(col("l_returnflag") === lit("R"))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber").limit(500)),

    "filter_range" -> ((s, d) =>
      li(s, d)
        .filter(col("l_quantity").between(10, 20) &&
          col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate").limit(500)),

    "filter_in" -> ((s, d) =>
      ord(s, d).filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey").limit(500)),

    "filter_like" -> ((s, d) =>
      Tables.t(s, d, "part").filter(col("p_name").like("%gear%"))
        .select("p_partkey", "p_name").orderBy("p_partkey")),

    "filter_null" -> ((s, d) =>
      li(s, d).select(expr("nullif(l_returnflag, 'N')").as("x"))
        .agg(
          sum(when(col("x").isNull, 1).otherwise(0)).cast("long").as("n_null"),
          sum(when(col("x").isNotNull, 1).otherwise(0)).cast("long").as("n_notnull"))),

    "filter_bool" -> ((s, d) =>
      li(s, d)
        .filter((col("l_discount") > 0.05 && col("l_tax") < 0.04) ||
          !(col("l_returnflag") === "A"))
        .agg(count(lit(1)).as("n"))),

    "case_when" -> ((s, d) =>
      ord(s, d).select(
        when(col("o_totalprice") < 1000, "low")
          .when(col("o_totalprice") < 10000, "mid")
          .otherwise("high").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")),

    "cast" -> ((s, d) =>
      li(s, d).select(
        col("l_orderkey").cast("string").as("ok_str"),
        col("l_quantity").cast("int").as("qty_int"),
        col("l_linenumber").cast("double").as("ln_dbl"),
        col("l_shipdate").cast("date").as("ship_day"))
        .orderBy("ok_str", "qty_int", "ln_dbl", "ship_day").limit(500)),

    "agg_count" -> ((s, d) =>
      li(s, d).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"), count(col("l_partkey")).as("n_part"))
        .orderBy("l_returnflag")),

    "agg_sum_avg_min_max" -> ((s, d) =>
      // TPC-H Q1 shape: partial aggregation map-side, tiny shuffle.
      li(s, d).groupBy("l_returnflag", "l_linestatus").agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    "agg_having" -> ((s, d) =>
      // round before filtering/reporting so fractional-quantity input
      // can't flip the HAVING boundary via summation-order ULPs
      li(s, d).groupBy("l_partkey")
        .agg(round(sum(col("l_quantity")), 4).as("total_qty"), count(lit(1)).as("n"))
        .where(col("total_qty") > 300)
        .orderBy("l_partkey")),

    "agg_groupby_multi" -> ((s, d) =>
      ord(s, d).groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy("o_orderstatus", "o_orderpriority")),

    "agg_count_distinct" -> ((s, d) =>
      li(s, d).groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")),

    // pivot with EXPLICIT values — letting Spark infer pivot values
    // costs a full extra distinct pass over the fact table; declaring
    // them keeps it one scan + one partial/final agg (same plan as
    // the equivalent conditional-aggregation SQL)
    "agg_pivot" -> ((s, d) =>
      li(s, d).groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(round(sum("l_quantity"), 2))
        .orderBy("l_linestatus")),

    // unpivot (melt): wide metric columns → (metric, val) rows,
    // row-local expansion, no shuffle
    "agg_unpivot" -> ((s, d) =>
      li(s, d).select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount")
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "val")
        .orderBy("l_orderkey", "l_linenumber", "metric", "val")),

    "sort" -> ((s, d) =>
      Tables.t(s, d, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .orderBy(asc("c_mktsegment"), desc("c_acctbal"), asc("c_custkey"))),

    "sort_nulls" -> ((s, d) =>
      Tables.t(s, d, "customer")
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, null).otherwise(col("c_acctbal")).as("bal"))
        .orderBy(asc_nulls_last("bal"), asc("c_custkey"))
        .limit(200)),

    "limit" -> ((s, d) =>
      ord(s, d).select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey").offset(100).limit(50)),

    "topk" -> ((s, d) =>
      // top 10 customers by turnover (README.md:44 flagship shape) —
      // TakeOrderedAndProject after partial agg: no full sort at scale.
      ord(s, d).groupBy("o_custkey")
        .agg(round(sum(col("o_totalprice")), 2).as("turnover"))
        .orderBy(desc("turnover"), asc("o_custkey")).limit(10)),

    "distinct" -> ((s, d) =>
      li(s, d).select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")),
  )

  val oracle: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 100",
    "scan_table" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "sink_table" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "scan_csv" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "scan_jsonl" ->
      """SELECT doc_id, CAST(LENGTH(text) AS INTEGER) AS n_chars_m,
           MD5(text) AS fp
         FROM documents ORDER BY doc_id""",
    "scan_orc" ->
      """SELECT doc_id, n_chars, MD5(text) AS fp
         FROM documents WHERE n_chars >= 100 ORDER BY doc_id""",
    "scan_binary" ->
      """SELECT 'doc_' || doc_id || '.bin' AS fname,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           MD5(text) AS fp
         FROM documents WHERE doc_id < 20 ORDER BY fname""",
    "scan_xml" ->
      """SELECT doc_id, lang, n_chars, MD5(text) AS fp
         FROM documents WHERE n_chars >= 100 ORDER BY doc_id""",
    "scan_text" ->
      """SELECT doc_id, lang, MD5(text) AS fp
         FROM documents ORDER BY doc_id""",
    "sink_upsert" ->
      """WITH base AS (SELECT n_nationkey, n_name, n_regionkey FROM nation),
         upd AS (
           SELECT n_nationkey, 'UPD_' || n_name AS n_name, n_regionkey
           FROM base WHERE n_nationkey % 2 = 0
           UNION ALL
           SELECT n_nationkey + 100, n_name, n_regionkey
           FROM base WHERE n_nationkey < 5)
         SELECT n_nationkey, n_name, n_regionkey FROM upd
         UNION ALL
         SELECT b.n_nationkey, b.n_name, b.n_regionkey FROM base b
         WHERE b.n_nationkey NOT IN (SELECT n_nationkey FROM upd)
         ORDER BY n_nationkey""",
    "sink_json" ->
      "SELECT n_nationkey, CAST(TO_JSON(STRUCT_PACK(n_nationkey := n_nationkey, n_name := n_name, n_regionkey := n_regionkey)) AS VARCHAR) AS json_row FROM nation ORDER BY n_nationkey",
    "project" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS disc_price FROM lineitem ORDER BY l_orderkey, l_linenumber, disc_price LIMIT 1000",
    "project_star" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "filter_eq" ->
      "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber LIMIT 500",
    "filter_range" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem WHERE l_quantity BETWEEN 10 AND 20 AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' ORDER BY l_orderkey, l_linenumber, l_quantity, l_shipdate LIMIT 500",
    "filter_in" ->
      "SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH') ORDER BY o_orderkey LIMIT 500",
    "filter_like" ->
      "SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%gear%' ORDER BY p_partkey",
    "filter_null" ->
      "SELECT CAST(SUM(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, CAST(SUM(CASE WHEN x IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_notnull FROM (SELECT NULLIF(l_returnflag,'N') AS x FROM lineitem)",
    "filter_bool" ->
      "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem WHERE (l_discount > 0.05 AND l_tax < 0.04) OR NOT (l_returnflag = 'A')",
    "case_when" ->
      "SELECT CASE WHEN o_totalprice < 1000 THEN 'low' WHEN o_totalprice < 10000 THEN 'mid' ELSE 'high' END AS bucket, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1 ORDER BY bucket ASC NULLS FIRST",
    "cast" ->
      // TRUNC mirrors Spark's truncate-toward-zero double→int cast
      // (DuckDB's bare CAST rounds to nearest instead)
      "SELECT CAST(l_orderkey AS VARCHAR) AS ok_str, CAST(TRUNC(l_quantity) AS INTEGER) AS qty_int, CAST(l_linenumber AS DOUBLE) AS ln_dbl, CAST(l_shipdate AS DATE) AS ship_day FROM lineitem ORDER BY ok_str, qty_int, ln_dbl, ship_day LIMIT 500",
    "agg_count" ->
      "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(COUNT(l_partkey) AS BIGINT) AS n_part FROM lineitem GROUP BY 1 ORDER BY l_returnflag ASC NULLS FIRST",
    "agg_sum_avg_min_max" ->
      "SELECT l_returnflag, l_linestatus, ROUND(CAST(SUM(l_quantity) AS DOUBLE), 4) AS sum_qty, ROUND(CAST(SUM(l_extendedprice) AS DOUBLE), 2) AS sum_price, ROUND(AVG(l_quantity), 6) AS avg_qty, MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST",
    "agg_having" ->
      "SELECT l_partkey, ROUND(CAST(SUM(l_quantity) AS DOUBLE), 4) AS total_qty, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1 HAVING ROUND(CAST(SUM(l_quantity) AS DOUBLE), 4) > 300 ORDER BY l_partkey",
    "agg_groupby_multi" ->
      "SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n, ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS sum_price FROM orders GROUP BY 1, 2 ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST",
    "agg_count_distinct" ->
      "SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps FROM lineitem GROUP BY 1 ORDER BY l_returnflag ASC NULLS FIRST",
    "agg_pivot" ->
      """SELECT l_linestatus,
           ROUND(CAST(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS DOUBLE), 2) AS "A",
           ROUND(CAST(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS DOUBLE), 2) AS "N",
           ROUND(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS DOUBLE), 2) AS "R"
         FROM lineitem GROUP BY 1 ORDER BY l_linestatus ASC NULLS FIRST""",
    "agg_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, val FROM (
           SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem)
         ORDER BY l_orderkey, l_linenumber, metric, val""",
    "sort" ->
      "SELECT c_custkey, c_mktsegment, c_acctbal FROM customer ORDER BY c_mktsegment ASC NULLS FIRST, c_acctbal DESC NULLS LAST, c_custkey ASC",
    "sort_nulls" ->
      "SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal FROM customer ORDER BY bal ASC NULLS LAST, c_custkey ASC LIMIT 200",
    "limit" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100",
    "topk" ->
      "SELECT o_custkey, ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS turnover FROM orders GROUP BY 1 ORDER BY turnover DESC, o_custkey ASC LIMIT 10",
    "distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST",
  )
}
