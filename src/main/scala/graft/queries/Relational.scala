package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The relational query surface the reference's pipelines exercise
  * (SURVEY.md §2.7, reference docs/09 + docs/12), declared as
  * (name, DataFrame query, DuckDB oracle SQL) triples over the raw test
  * tables.
  *
  * Determinism rules (both sides of every pair):
  *   - double aggregates go through DECIMAL(18,2) (exact, order-independent
  *     sums) and surface as DOUBLE, so shuffle/aggregation order can never
  *     flip a low bit;
  *   - every result is fully ordered by its key columns;
  *   - `events.ts` is compared only at DATE/day granularity (the raw column
  *     is nanos in parquet, micros in Spark — see [[Tables]]).
  *
  * Scale notes are per-query below: these run on Catalyst/Tungsten — filters
  * and projections push into the parquet scan, aggregates are partial+final
  * hash aggregates, joins pick broadcast vs shuffle via AQE.
  */
object Relational {

  // the one decimal(18,2)-sum determinism rule, shared with the table-ops
  // suite — two drifting copies would desync cross-engine parity
  private def dsum(c: org.apache.spark.sql.Column) = TableOps.dsum(c)

  /** scale-4 variant for products of 2-decimal columns (exact, no rounding). */
  private def dsum4(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,4)")).cast("double")

  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(

    // Q3/Q5: TPC-H Q1-style pricing summary — partial+final hash agg, 6 groups.
    // At 100 TB: map-side combine reduces the shuffle to (#tasks × 6) rows.
    ("q1_pricing_summary",
      (s: SparkSession, d: String) => {
        val l = Tables.lineitem(s, d).filter(col("l_shipdate") <= lit("1998-09-02"))
        l.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Q1/Q2: filter (range + LIKE) + projection. Filters/columns push into
    // the parquet scan (PushedFilters + ReadSchema pruning).
    ("q2_filter_project",
      (s: SparkSession, d: String) =>
        Tables.orders(s, d)
          .filter(col("o_orderstatus") === "O" &&
            col("o_totalprice") > 200000.0 &&
            col("o_orderpriority").like("%URGENT%"))
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy("o_orderkey"),
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'O' AND o_totalprice > 200000.0
        |  AND o_orderpriority LIKE '%URGENT%'
        |ORDER BY o_orderkey""".stripMargin),

    // Q7: fk equi-join chain + group-by. customer is the small side —
    // broadcast it explicitly (at 100 TB the fact side never shuffles).
    ("q3_join_agg",
      (s: SparkSession, d: String) => {
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("order_count"), dsum(col("o_totalprice")).as("total_price"))
          .orderBy("c_mktsegment")
      },
      """SELECT c_mktsegment, count(*) AS order_count,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Q4: COUNT(DISTINCT) per day (the reference's gold aggregate,
    // docs/12:109-117). Exact distinct = Spark's two-phase expand; the
    // 100 TB path swaps in approx_count_distinct.
    ("q4_daily_distinct",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
          .agg(count(lit(1)).as("event_count"),
            countDistinct(col("user_id")).as("unique_users"))
          .orderBy("event_date", "event_type"),
      """SELECT CAST(ts AS DATE) AS event_date, event_type,
        |  count(*) AS event_count, count(DISTINCT user_id) AS unique_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Q6: scalar subquery (docs/12:104). The threshold is an exact
    // decimal-sum / count division, so both engines compare against the
    // bit-identical double.
    ("q5_scalar_subquery",
      (s: SparkSession, d: String) => {
        val l = Tables.lineitem(s, d)
        val thresh = l.agg((dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"))
        l.crossJoin(broadcast(thresh))
          .filter(col("l_extendedprice") > col("avg_price"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("above_avg_count"), dsum(col("l_quantity")).as("qty"))
          .orderBy("l_returnflag")
      },
      """SELECT l_returnflag, count(*) AS above_avg_count,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |WHERE l_extendedprice > (
        |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |  FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Q8: UNION ALL of hot+cold slices (docs/12:169-172).
    ("q6_union_all",
      (s: SparkSession, d: String) => {
        val o = Tables.orders(s, d)
        val hot = o.filter(col("o_orderdate") >= lit("2000-01-01"))
        val cold = o.filter(col("o_orderdate") < lit("2000-01-01"))
        hot.unionByName(cold)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("o_orderstatus")
      },
      """WITH u AS (
        |  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
        |  UNION ALL
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01')
        |SELECT o_orderstatus, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin),

    // Q9: VARIANT-style JSON path extraction + cast (docs/12:98-102).
    ("q7_json_extract",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy((col("k") % 10).as("k_mod"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy("k_mod"),
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    // Q10: date/time scalars — trunc to month, interval arithmetic
    // (docs/12:111, docs/10:169).
    ("q8_date_functions",
      (s: SparkSession, d: String) =>
        Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("2001-01-01")) - expr("INTERVAL 365 DAYS"))
          .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("order_month"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("order_month"),
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
        |  count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2001-01-01' - INTERVAL 365 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Q7 at depth: 5-way join along the full fk chain. Dims broadcast;
    // only lineitem⋈orders is a real shuffle at scale.
    ("q9_star_join",
      (s: SparkSession, d: String) => {
        val l = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("lineitem_count"),
            dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy("r_name")
      },
      """SELECT r_name, count(*) AS lineitem_count,
        |  CAST(SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Window top-N (not required for parity — SURVEY §2.7 notes the
    // reference never exercises windows — included as a cheap superset).
    ("q10_window_topn",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_orderpriority", "rn")
      },
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin),

    // Q11: incremental high-watermark predicate (docs/12:96-104): "rows
    // newer than everything already loaded".
    ("q11_high_watermark",
      (s: SparkSession, d: String) => {
        val e = Tables.events(s, d)
        val wm = e.filter(col("ts") < lit("2024-01-20"))
          .agg(max(to_date(col("ts"))).as("wm_date"))
        e.crossJoin(broadcast(wm))
          .filter(to_date(col("ts")) > col("wm_date"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("new_rows"), countDistinct(col("user_id")).as("new_users"))
          .orderBy("event_type")
      },
      """SELECT event_type, count(*) AS new_rows,
        |  count(DISTINCT user_id) AS new_users
        |FROM events
        |WHERE CAST(ts AS DATE) > (
        |  SELECT max(CAST(ts AS DATE)) FROM events WHERE ts < TIMESTAMP '2024-01-20')
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Semi/anti joins: customers with no open orders (superset padding —
    // exercises Catalyst's LeftAnti strategy).
    ("q12_anti_join",
      (s: SparkSession, d: String) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("inactive_customers"))
          .orderBy("c_mktsegment")
      },
      """SELECT c_mktsegment, count(*) AS inactive_customers
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Skew-salted join (SURVEY §4 "salting for skew"): the salted plan must
    // produce exactly the plain join's result — the oracle is the unsalted
    // SQL join, so correctness of the salt/explode/drop dance is hash-checked.
    ("q13_salted_join",
      (s: SparkSession, d: String) => {
        val l = Tables.lineitem(s, d)
        val sup = Tables.supplier(s, d).withColumnRenamed("s_suppkey", "l_suppkey")
        graft.functions.ScaleFunctions
          .saltedJoin(l, sup, "l_suppkey", col("l_orderkey"), 8)
          .groupBy("s_name")
          .agg(count(lit(1)).as("items"), dsum(col("l_extendedprice")).as("total"))
          .orderBy("s_name")
      },
      """SELECT s_name, count(*) AS items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Q9 via Spark 4's native VARIANT type (SURVEY §1.3): parse once into a
    // variant, path-extract with variant_get — the engine-native analogue of
    // Snowflake's payload:field::type (docs/12:98-102). Same oracle as the
    // string-path q7, proving the two extraction routes agree.
    ("q14_variant_type",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .withColumn("v", parse_json(col("props")))
          .withColumn("k", variant_get(col("v"), "$.k", "int"))
          .groupBy((col("k") % 10).as("k_mod"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy("k_mod"),
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    // EXISTS correlated subquery (semi-join plan shape): orders that have at
    // least one high-quantity line item, counted per status.
    ("q15_exists_subquery",
      (s: SparkSession, d: String) => {
        val o = Tables.orders(s, d)
        val hi = Tables.lineitem(s, d).filter(col("l_quantity") >= 45)
          .select(col("l_orderkey")).distinct()
        o.join(hi, o("o_orderkey") === hi("l_orderkey"), "left_semi")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("o_orderstatus")
      },
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ROLLUP with grouping indicators — subtotal + grand-total rows in one
    // aggregation pass (partial aggregation per grouping set).
    ("q16_rollup",
      (s: SparkSession, d: String) =>
        Tables.lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"),
            grouping(col("l_returnflag")).cast("long").as("g_flag"),
            grouping(col("l_linestatus")).cast("long").as("g_status"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),

    // Q13: PIVOT — long-to-wide reshaping with an EXPLICIT value list (the
    // no-list overload runs a distinct-collect on the driver to discover
    // columns; at scale the caller names the columns, so the plan is one
    // hash aggregate of conditional counts — exactly the CASE expansion the
    // oracle spells out). Absent combinations surface as 0, not NULL.
    ("q17_pivot",
      (s: SparkSession, d: String) =>
        Tables.events(s, d)
          .withColumn("day", to_date(col("ts")))
          .groupBy("day")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("day"),
      """SELECT CAST(ts AS DATE) AS day,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    // Q14: UNPIVOT — wide-to-long reshaping (the inverse of q17_pivot) via
    // the native Dataset.unpivot (plans as Expand: one pass, rows x
    // measures, no join); the oracle spells out the UNION ALL expansion it
    // is sugar for. Measures follow the dsum DECIMAL-exact convention.
    ("q18_unpivot",
      (s: SparkSession, d: String) => {
        val wide = Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"))
        wide.unpivot(Array(col("l_returnflag")),
            Array(col("sum_qty"), col("sum_price")), "measure", "value")
          .orderBy("l_returnflag", "measure")
      },
      """WITH a AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
        |UNION ALL
        |SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM a
        |ORDER BY 1, 2""".stripMargin),

    // Q15: GROUPING SETS — an explicit set list including a shape ROLLUP
    // cannot express (the status-only subtotal WITHOUT a flag subtotal's
    // companion), still one aggregation pass (Expand + hash agg, one
    // exchange — never N unioned scans). grouping() indicators distinguish
    // a subtotal's NULL from a data NULL, the same contract as q16_rollup.
    ("q19_grouping_sets",
      (s: SparkSession, d: String) => {
        val li = Tables.lineitem(s, d)
        li.groupingSets(
            Seq(Seq(col("l_returnflag"), col("l_linestatus")),
              Seq(col("l_linestatus")), Seq.empty),
            col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"),
            grouping(col("l_returnflag")).cast("long").as("g_flag"),
            grouping(col("l_linestatus")).cast("long").as("g_status"))
          .orderBy(asc_nulls_first("l_returnflag"),
            asc_nulls_first("l_linestatus"), col("g_flag"))
      },
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST,
        |  g_flag""".stripMargin)
  )
}
