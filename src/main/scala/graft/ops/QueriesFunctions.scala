package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function packs (SQLite core/date/math/json1 → Spark SQL,
  * SURVEY.md §2B "Scalar functions") plus the remaining aggregate
  * keys (group_concat, Σ-formula correlation, cube/rollup).
  *
  * The Σ-formula correlation mirrors the reference's prompt directive
  * "When computing a correlation, avoid using CORR or AVG"
  * (reference pandasqlite/pandasqlite.py:225): generated SQL computes
  * correlation from raw sums, so the engine must evaluate that exact
  * shape efficiently (one scan, partial aggregation — it does).
  */
object QueriesFunctions {
  type Q = (SparkSession, String) => DataFrame
  private def t(n: String)(s: SparkSession, d: String) = Tables.t(s, d, n)

  val queries: Map[String, Q] = Map(
    "fn_string" -> ((s, d) =>
      t("part")(s, d).select(
        col("p_partkey"),
        length(col("p_name")).as("name_len"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        substring(col("p_name"), 1, 3).as("pre"),
        regexp_replace(col("p_name"), " ", "_").as("und"),
        instr(col("p_name"), "e").as("e_pos"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        format_string("%s#%d", col("p_type"), col("p_size")).as("fmt"),
        ascii(substring(col("p_name"), 1, 1)).as("first_code"))
        .orderBy("p_partkey")),

    "fn_date" -> ((s, d) =>
      t("events")(s, d).select(
        col("event_id"),
        year(col("ts")).as("y"),
        month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("dom"),
        hour(col("ts")).as("h"),
        // date_trunc always yields TimestampType; restore the input's
        // wall-clock (NTZ) semantics for oracle parity
        date_trunc("day", col("ts")).cast("timestamp_ntz").as("day_start"),
        (col("ts") + expr("INTERVAL 1 DAY")).cast("timestamp_ntz").as("next_day"),
        last_day(col("ts").cast("date")).as("month_end"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("days_in"),
        unix_timestamp(col("ts")).as("epoch_s"),
        to_date(lit("06/02/2018"), "dd/MM/yyyy").as("go_date"))
        .orderBy("event_id")),

    "fn_math" -> ((s, d) =>
      t("lineitem")(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_d"),
        floor(col("l_extendedprice")).as("floor_p"),
        ceil(col("l_extendedprice")).as("ceil_p"),
        signum(col("l_discount") - 0.05).cast("int").as("sgn"),
        expr("l_orderkey % 7").as("mod7"),
        sqrt(col("l_quantity")).as("sqrt_q"),
        pow(col("l_quantity"), 2).as("q_sq"),
        round(log(col("l_quantity") + 1), 6).as("ln_q"))
        .orderBy("l_orderkey", "l_linenumber", "abs_d", "mod7", "sqrt_q")
        .limit(2000)),

    "fn_cond" -> ((s, d) =>
      t("customer")(s, d).select(
        col("c_custkey"),
        expr("coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER')").as("seg2"),
        expr("ifnull(nullif(c_mktsegment, 'MACHINERY'), 'MACH')").as("seg3"),
        expr("if(c_acctbal < 0, 'neg', 'pos')").as("bal_sign"),
        expr("nvl(nullif(c_name, ''), 'unnamed')").as("nm"))
        .orderBy("c_custkey")),

    "fn_json" -> ((s, d) =>
      t("events")(s, d).select(
        col("event_id"),
        // extract as DOUBLE: decimal-string parsing is identical in
        // both engines, while int casts diverge (Spark ANSI throws on
        // '1.9', DuckDB rounds it)
        get_json_object(col("props"), "$.k").cast("double").as("k_val"),
        to_json(struct(col("event_id").as("id"), col("event_type").as("et")))
          .as("obj"))
        .orderBy("event_id")),

    // json_each analog (SURVEY §2B fn_json): explode a JSON object
    // into (key, value) rows via from_json to a map type
    "fn_json_each" -> ((s, d) =>
      t("events")(s, d)
        .select(col("event_id"),
          explode(from_json(col("props"), org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType))))
        .withColumnRenamed("key", "k").withColumnRenamed("value", "v")
        .orderBy("event_id", "k")),

    // SQLite julianday (noon-based continuous Julian Date): the one
    // dialect function with no Spark builtin — explicit arithmetic,
    // identical expression on the oracle side (DuckDB's julian() uses
    // midnight-based day numbers, so neither engine's builtin matches
    // SQLite; the formula is the contract)
    "fn_julianday" -> ((s, d) =>
      t("events")(s, d).select(
        col("event_id"),
        (lit(2440587.5) +
          (unix_micros(col("ts").cast("timestamp")) / 1000000.0) / 86400.0)
          .as("jd"))
        .orderBy("event_id")),

    // GLOB pattern filtering via translation to an anchored regex
    "filter_glob" -> ((s, d) =>
      t("part")(s, d)
        .filter(col("p_name").rlike(graft.functions.Glob.toRegex("*ge?r*")))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")),

    // approximate aggregates — the perf options a 100 TB deployment
    // substitutes for exact distinct/percentile (HLL / KLL sketches,
    // one pass, mergeable partials). Rows-only keys: approximation is
    // engine-specific by design; AggApproxSpec bounds the error vs
    // the exact answers.
    "agg_approx_count_distinct" -> ((s, d) =>
      Tables.t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_orderkey")).as("approx_orders"))
        .orderBy("l_returnflag")),

    "agg_approx_percentile" -> ((s, d) =>
      Tables.t(s, d, "lineitem").agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99"))),

    "agg_group_concat" -> ((s, d) =>
      t("lineitem")(s, d).groupBy("l_returnflag")
        // all-NULL group → NULL (as STRING_AGG does), not ""
        .agg(when(size(collect_set(col("l_linestatus"))) === 0, lit(null))
          .otherwise(array_join(array_sort(collect_set(col("l_linestatus"))), ","))
          .as("statuses"))
        .orderBy(asc_nulls_first("l_returnflag"))),

    "agg_corr" -> ((s, d) => {
      // Σ-formula correlation (no CORR/AVG), one scan + partial agg
      val base = t("lineitem")(s, d).agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("l_quantity")).as("sx"),
        sum(col("l_extendedprice")).as("sy"),
        sum(col("l_quantity") * col("l_extendedprice")).as("sxy"),
        sum(col("l_quantity") * col("l_quantity")).as("sxx"),
        sum(col("l_extendedprice") * col("l_extendedprice")).as("syy"))
      base.select(round(
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6)
        .as("corr_qty_price"))
    }),

    "agg_cube" -> ((s, d) =>
      t("lineitem")(s, d).cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    "agg_rollup" -> ((s, d) =>
      t("orders")(s, d).rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))),

    // explicit grouping sets (the general form cube/rollup specialize):
    // one Expand + one aggregate, same single-shuffle plan
    "agg_grouping_sets" -> ((s, d) =>
      t("orders")(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))),

    // regexp scalar pack (SQLite exposes REGEXP via the operator; the
    // reference's LLM-generated SQL can emit it freely). Patterns stay in
    // the RE2 ∩ java.util.regex common subset (classes, anchors, groups,
    // greedy quantifiers — no lookaround/backrefs) so Spark and the
    // oracle agree byte-for-byte. All row-local, codegen'd, zero shuffle.
    "fn_regexp" -> ((s, d) =>
      t("part")(s, d).select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "[a-z]+", 0).as("first_word"),
        regexp_count(col("p_name"), lit("[aeiou]+")).cast("int").as("n_vowel_runs"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"),
        col("p_type").rlike("COPPER$").as("is_copper"))
        .orderBy("p_partkey")),

    // edit-distance fuzzy matching — the short-string near-match
    // primitive (titles, entity names) complementing the set-based
    // dedup family. Row-local codegen'd levenshtein, zero shuffle; the
    // similarity ratio is one double division on integer inputs
    // (IEEE-exact on both engines). At scale a fuzzy JOIN would first
    // block candidates (prefix/LSH — see ops/Dedup) and only then pay
    // O(len²) per surviving pair, exactly like the exact-verify stages.
    "fn_fuzzy" -> ((s, d) => {
      val stripped = regexp_replace(col("p_name"), "[aeiou]", "")
      t("part")(s, d).select(
        col("p_partkey"),
        levenshtein(col("p_name"), stripped).as("lev_vowels"),
        levenshtein(col("p_brand"), col("p_type")).as("lev_bt"),
        (lit(1.0) - levenshtein(col("p_name"), stripped).cast("double") /
          greatest(length(col("p_name")), length(stripped))).as("sim_ratio"))
        .orderBy("p_partkey")
    }),

    // array/list function surface over the tokenized documents column —
    // the column shape every curation operator works on. All row-local
    // HOF/array expressions (codegen'd, zero shuffle); outputs are
    // scalars so the oracle compare stays type-exact (array columns
    // round-trip differently through pandas on the two sides).
    "fn_array" -> ((s, d) =>
      t("documents")(s, d)
        .select(col("doc_id"),
          expr("split(trim(lower(text)), '\\\\s+')").as("toks"))
        .select(col("doc_id"),
          size(col("toks")).as("n_toks"),
          element_at(col("toks"), 1).as("first_tok"),
          element_at(col("toks"), -1).as("last_tok"),
          size(array_distinct(col("toks"))).as("n_uniq"),
          array_contains(col("toks"), "the").as("has_the"),
          array_position(col("toks"), "the").as("the_pos"),
          array_min(col("toks")).as("alpha_first"),
          array_max(col("toks")).as("alpha_last"))
        .orderBy("doc_id")),

    // SQLite bitwise operator surface (& | << >> ~): row-local, codegen'd.
    // DuckDB's ^ is exponentiation, so the oracle spells xor() — the Spark
    // side uses the Column API, no dialect ambiguity.
    "fn_bit" -> ((s, d) =>
      t("lineitem")(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey").bitwiseAND(lit(255L))).as("and_255"),
        (col("l_orderkey").bitwiseOR(lit(4096L))).as("or_4096"),
        (col("l_orderkey").bitwiseXOR(col("l_linenumber").cast("bigint"))).as("xor_ln"),
        shiftleft(col("l_linenumber"), 3).as("shl3"),
        shiftright(col("l_orderkey"), 2).as("shr2"),
        bitwise_not(col("l_linenumber")).as("not_ln"))
        .orderBy("l_orderkey", "l_linenumber")),

    // boolean + bitwise aggregates (SQLite reaches these via min/max over
    // 0/1 and no native bit aggs; both engines here support them
    // natively): all partial+final — one shuffle of tiny per-group state.
    "agg_bool_bit" -> ((s, d) =>
      t("lineitem")(s, d).groupBy("l_returnflag")
        .agg(
          bool_and(col("l_discount") <= 0.1).as("all_low_disc"),
          bool_or(col("l_quantity") >= 49).as("any_big_qty"),
          count_if(col("l_tax") > 0.05).as("n_taxed"),
          bit_and(col("l_linenumber")).as("band_ln"),
          bit_or(col("l_linenumber")).as("bor_ln"),
          bit_xor(col("l_linenumber")).as("bxor_ln"))
        .orderBy("l_returnflag")),

    // SQLite ≥ 3.30 FILTER clause on aggregates (SELECT agg(x) FILTER
    // (WHERE p) ...): identical syntax in Spark SQL — one hash
    // aggregate, each filtered aggregate a conditional update, NOT one
    // scan per condition (the hand-rolled CASE WHEN equivalent plans
    // the same; the syntax is the surface being covered).
    "agg_filter_clause" -> ((s, d) => {
      Tables.t(s, d, "lineitem").createOrReplaceTempView("li_fc")
      s.sql("""SELECT l_returnflag,
                 COUNT(*) AS n,
                 COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
                 ROUND(SUM(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2)
                   AS disc_rev,
                 MAX(l_quantity) FILTER (WHERE l_linestatus = 'F') AS max_f_qty
               FROM li_fc GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),

    // exact interpolated median / quartiles: one partial+final sort-based
    // aggregate per group — at scale the per-group value multiset must fit
    // an executor (exact percentile is inherently a gather); the bounded
    // alternative is agg_approx_percentile (KLL-sketch, mergeable).
    "agg_median" -> ((s, d) =>
      t("lineitem")(s, d).groupBy("l_returnflag")
        .agg(
          median(col("l_quantity")).as("med_qty"),
          percentile(col("l_extendedprice"), lit(0.25)).as("p25_price"),
          percentile(col("l_extendedprice"), lit(0.75)).as("p75_price"),
          percentile(col("l_linenumber"), lit(0.5)).as("med_line"))
        .orderBy("l_returnflag")),

    // higher statistical moments in ONE partial+final hash aggregate —
    // the distribution-shape profile (spread, asymmetry, tail weight) a
    // data-quality pass computes per stratum before sampling decisions.
    // Spark's skewness/kurtosis are the POPULATION g1 / excess-g2
    // moments; the oracle states the same algebra over exact power
    // sums, and round() absorbs the two engines' summation-order and
    // update-formula noise (both ≤1e-9 here). All five aggregates ride
    // the same codegen'd aggregate — one scan, one shuffle of 3 rows.
    "agg_stats_moments" -> ((s, d) =>
      t("lineitem")(s, d).groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(skewness(col("l_quantity")), 4).as("skew_qty"),
          round(kurtosis(col("l_quantity")), 4).as("kurt_qty"))
        .orderBy("l_returnflag")),

    // mode with DETERMINISTIC tie-break (Spark's mode(expr, true) —
    // lowest value among the most frequent): the label-consensus
    // aggregate (majority vote per group) that re-shard order must not
    // flip. One hash aggregate carrying a per-group value→count map;
    // at scale the value domain per group must be bounded (priorities,
    // labels, categories — exactly where mode is meaningful).
    "agg_mode" -> ((s, d) =>
      t("orders")(s, d).groupBy("o_orderstatus")
        .agg(
          expr("mode(o_orderpriority, true)").as("mode_prio"),
          expr("mode(CAST(month(o_orderdate) AS INT), true)").as("mode_month"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),
  )

  val oracle: Map[String, String] = Map(
    "fn_string" ->
      """SELECT p_partkey,
           CAST(LENGTH(p_name) AS INTEGER) AS name_len,
           UPPER(p_name) AS up, LOWER(p_brand) AS lo,
           SUBSTR(p_name, 1, 3) AS pre,
           REPLACE(p_name, ' ', '_') AS und,
           CAST(INSTR(p_name, 'e') AS INTEGER) AS e_pos,
           TRIM('  ' || p_name || '  ') AS trimmed,
           CONCAT_WS('|', p_brand, p_type) AS joined,
           PRINTF('%s#%d', p_type, p_size) AS fmt,
           CAST(ASCII(SUBSTR(p_name, 1, 1)) AS INTEGER) AS first_code
         FROM part ORDER BY p_partkey""",
    "fn_date" ->
      """SELECT event_id,
           CAST(YEAR(ts) AS INTEGER) AS y,
           CAST(MONTH(ts) AS INTEGER) AS m,
           CAST(DAY(ts) AS INTEGER) AS dom,
           CAST(HOUR(ts) AS INTEGER) AS h,
           DATE_TRUNC('day', ts) AS day_start,
           ts + INTERVAL '1 day' AS next_day,
           LAST_DAY(CAST(ts AS DATE)) AS month_end,
           CAST(DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS days_in,
           CAST(DATE_DIFF('second', TIMESTAMP '1970-01-01', ts) AS BIGINT) AS epoch_s,
           CAST(STRPTIME('06/02/2018', '%d/%m/%Y') AS DATE) AS go_date
         FROM events ORDER BY event_id""",
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS abs_d,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_p,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_p,
           CAST(SIGN(l_discount - 0.05) AS INTEGER) AS sgn,
           l_orderkey % 7 AS mod7,
           SQRT(l_quantity) AS sqrt_q,
           POW(l_quantity, 2) AS q_sq,
           ROUND(LN(l_quantity + 1), 6) AS ln_q
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, abs_d, mod7, sqrt_q LIMIT 2000""",
    "fn_cond" ->
      """SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg2,
           IFNULL(NULLIF(c_mktsegment, 'MACHINERY'), 'MACH') AS seg3,
           CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS bal_sign,
           COALESCE(NULLIF(c_name, ''), 'unnamed') AS nm
         FROM customer ORDER BY c_custkey""",
    "fn_json" ->
      """SELECT event_id,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS DOUBLE) AS k_val,
           CAST(TO_JSON(STRUCT_PACK(id := event_id, et := event_type)) AS VARCHAR) AS obj
         FROM events ORDER BY event_id""",
    "fn_json_each" ->
      """SELECT event_id, k.key AS k,
           JSON_EXTRACT_STRING(props, '$."' || k.key || '"') AS v
         FROM events, UNNEST(JSON_KEYS(props)) AS k(key)
         ORDER BY event_id, k""",
    "fn_julianday" ->
      """SELECT event_id,
           2440587.5 + (CAST(DATE_DIFF('microsecond', TIMESTAMP '1970-01-01', ts) AS DOUBLE) / 1000000.0) / 86400.0 AS jd
         FROM events ORDER BY event_id""",
    "filter_glob" ->
      """SELECT p_partkey, p_name FROM part
         WHERE p_name GLOB '*ge?r*' ORDER BY p_partkey""",
    "agg_group_concat" ->
      """SELECT l_returnflag,
           STRING_AGG(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag ASC NULLS FIRST""",
    "agg_corr" ->
      """SELECT ROUND(
           (n * sxy - sx * sy) /
             SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_price
         FROM (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(l_quantity) AS DOUBLE) AS sx,
             CAST(SUM(l_extendedprice) AS DOUBLE) AS sy,
             CAST(SUM(l_quantity * l_extendedprice) AS DOUBLE) AS sxy,
             CAST(SUM(l_quantity * l_quantity) AS DOUBLE) AS sxx,
             CAST(SUM(l_extendedprice * l_extendedprice) AS DOUBLE) AS syy
           FROM lineitem)""",
    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(l_quantity) AS DOUBLE), 4) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "agg_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS sum_price
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS sum_price
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
         ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "fn_regexp" ->
      """SELECT p_partkey,
           REGEXP_EXTRACT(p_name, '[a-z]+') AS first_word,
           CAST(LEN(REGEXP_EXTRACT_ALL(p_name, '[aeiou]+')) AS INTEGER) AS n_vowel_runs,
           REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS no_vowels,
           REGEXP_MATCHES(p_type, 'COPPER$') AS is_copper
         FROM part ORDER BY p_partkey""",
    "fn_fuzzy" ->
      """WITH w AS (SELECT p_partkey, p_name, p_brand, p_type,
             REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS stripped
           FROM part)
         SELECT p_partkey,
           CAST(LEVENSHTEIN(p_name, stripped) AS INTEGER) AS lev_vowels,
           CAST(LEVENSHTEIN(p_brand, p_type) AS INTEGER) AS lev_bt,
           1.0 - CAST(LEVENSHTEIN(p_name, stripped) AS DOUBLE)
               / GREATEST(LENGTH(p_name), LENGTH(stripped)) AS sim_ratio
         FROM w ORDER BY p_partkey""",
    "fn_array" ->
      """WITH w AS (SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents)
         SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_toks,
           toks[1] AS first_tok,
           toks[len(toks)] AS last_tok,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_uniq,
           list_contains(toks, 'the') AS has_the,
           CAST(COALESCE(list_position(toks, 'the'), 0) AS BIGINT) AS the_pos,
           list_aggregate(toks, 'min') AS alpha_first,
           list_aggregate(toks, 'max') AS alpha_last
         FROM w ORDER BY doc_id""",
    "fn_bit" ->
      """SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS and_255,
           l_orderkey | 4096 AS or_4096,
           XOR(l_orderkey, CAST(l_linenumber AS BIGINT)) AS xor_ln,
           CAST(l_linenumber << 3 AS INTEGER) AS shl3,
           l_orderkey >> 2 AS shr2,
           CAST(~l_linenumber AS INTEGER) AS not_ln
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "agg_bool_bit" ->
      """SELECT l_returnflag,
           BOOL_AND(l_discount <= 0.1) AS all_low_disc,
           BOOL_OR(l_quantity >= 49) AS any_big_qty,
           CAST(COUNT_IF(l_tax > 0.05) AS BIGINT) AS n_taxed,
           CAST(BIT_AND(l_linenumber) AS INTEGER) AS band_ln,
           CAST(BIT_OR(l_linenumber) AS INTEGER) AS bor_ln,
           CAST(BIT_XOR(l_linenumber) AS INTEGER) AS bxor_ln
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_filter_clause" ->
      """SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (WHERE l_quantity >= 25) AS BIGINT) AS n_bulk,
           ROUND(CAST(SUM(l_extendedprice) FILTER (WHERE l_discount > 0.05)
             AS DOUBLE), 2) AS disc_rev,
           MAX(l_quantity) FILTER (WHERE l_linestatus = 'F') AS max_f_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_median" ->
      """SELECT l_returnflag,
           MEDIAN(l_quantity) AS med_qty,
           QUANTILE_CONT(l_extendedprice, 0.25) AS p25_price,
           QUANTILE_CONT(l_extendedprice, 0.75) AS p75_price,
           QUANTILE_CONT(l_linenumber, 0.5) AS med_line
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // skew/kurt re-derived from exact power sums (DuckDB's built-ins
    // are the SAMPLE-corrected G1/G2 — a different statistic from
    // Spark's population g1/g2, so the oracle states Spark's algebra)
    "agg_stats_moments" ->
      """WITH s AS (
           SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(COUNT(*) AS BIGINT) AS nn,
             SUM(l_quantity) AS s1,
             SUM(l_quantity * l_quantity) AS s2,
             SUM(l_quantity * l_quantity * l_quantity) AS s3,
             SUM(l_quantity * l_quantity * l_quantity * l_quantity) AS s4,
             STDDEV_SAMP(l_quantity) AS sd,
             VAR_SAMP(l_quantity) AS vr
           FROM lineitem GROUP BY l_returnflag),
         m AS (
           SELECT l_returnflag, nn, sd, vr, n, s1 / n AS mu,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3 * (s1 / n) * s2 / n + 2 * (s1/n)*(s1/n)*(s1/n) AS m3,
             s4 / n - 4 * (s1 / n) * s3 / n
               + 6 * (s1/n)*(s1/n) * s2 / n
               - 3 * (s1/n)*(s1/n)*(s1/n)*(s1/n) AS m4
           FROM s)
         SELECT l_returnflag, nn AS n,
           ROUND(sd, 4) AS sd_qty,
           ROUND(vr, 4) AS var_qty,
           ROUND(m3 / POW(m2, 1.5), 4) AS skew_qty,
           ROUND(m4 / (m2 * m2) - 3, 4) AS kurt_qty
         FROM m ORDER BY l_returnflag""",
    // deterministic mode: lowest value among the most frequent —
    // exactly Spark's mode(expr, true) tie-break, stated as a ranked
    // count (DuckDB's mode() leaves ties unspecified)
    "agg_mode" ->
      """WITH c1 AS (
           SELECT o_orderstatus, o_orderpriority AS v, COUNT(*) AS cnt
           FROM orders GROUP BY 1, 2),
         r1 AS (
           SELECT o_orderstatus, v,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY cnt DESC, v ASC) AS rn
           FROM c1),
         c2 AS (
           SELECT o_orderstatus, CAST(MONTH(o_orderdate) AS INTEGER) AS v,
             COUNT(*) AS cnt
           FROM orders GROUP BY 1, 2),
         r2 AS (
           SELECT o_orderstatus, v,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY cnt DESC, v ASC) AS rn
           FROM c2),
         n AS (SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
               FROM orders GROUP BY 1)
         SELECT n.o_orderstatus, r1.v AS mode_prio, r2.v AS mode_month, n.n
         FROM n JOIN r1 ON r1.o_orderstatus = n.o_orderstatus AND r1.rn = 1
                JOIN r2 ON r2.o_orderstatus = n.o_orderstatus AND r2.rn = 1
         ORDER BY n.o_orderstatus""",
  )
}
