package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Full relational surface over the star schema (SURVEY.md §2.2–§2.8).
  * The reference itself only performs projections/filters/unions and
  * dict-shaped joins (§2.3: P8 semi-join at `ml_model/predict_from_vm4.py:53`,
  * P3 anti-join at `data_collection/fetch_stock.py:57`); the rest of the
  * surface is the north-star query capability, all Spark built-ins so
  * Catalyst handles pushdown/pruning/join-selection.
  *
  * Determinism-by-construction for the DuckDB oracle:
  *   - Money doubles carry exactly 2 decimals → aggregate in integer cents
  *     (`round(x*100)::long`), divide back at the end. Integer sums are
  *     order-independent, so results are bit-identical under ANY
  *     partitioning — Spark partial aggs at 32 or 1000 shuffle partitions
  *     give the same answer as DuckDB's sequential sum.
  *   - Dates/timestamps are emitted as formatted strings.
  *   - Every query ends in a total-order `orderBy`.
  */
object RelationalQueries extends QueryPack {

  /** Integer-cents view of a 2-decimal money double. */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  // ---------------------------------------------------------------- q02
  /** TPC-H Q1-shaped pricing summary: filter + 8-way agg, map-side
    * partial aggregation, 6-row result. */
  private def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .withColumn("ext_c", cents(col("l_extendedprice")))
      .withColumn("disc_p", round(col("l_discount") * 100).cast("long"))
      .withColumn("tax_p", round(col("l_tax") * 100).cast("long"))
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(sum(col("ext_c")) / 100.0, 2).as("sum_base_price"),
        round(sum(col("ext_c") * (lit(100) - col("disc_p"))) / 10000.0, 2).as("sum_disc_price"),
        round(sum(col("ext_c") * (lit(100) - col("disc_p")) * (lit(100) + col("tax_p"))) / 1000000.0, 2).as("sum_charge"),
        // Averages stay un-rounded: numerator is an exact integer (or
        // integer-valued double) sum, so num/den is the same IEEE double in
        // Spark and DuckDB; rounding would reintroduce the half-point
        // ambiguity (Spark rounds the decimal repr, DuckDB the binary).
        (sum("l_quantity") / count(lit(1))).as("avg_qty"),
        (sum(col("ext_c")) / 100.0 / count(lit(1))).as("avg_price"),
        (sum(col("disc_p")) / 100.0 / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // ---------------------------------------------------------------- q03
  /** TPC-H Q3-shaped: selective dim filter broadcast into a big-big join,
    * top-10 revenue. `broadcast(customer)` keeps the orders side
    * shuffle-free; orders⋈lineitem shuffles on the join key only. */
  private def topRevenueOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).where(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir).where(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir).where(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .agg(round(sum(cents(col("l_extendedprice")) * (lit(100) - round(col("l_discount") * 100).cast("long"))) / 10000.0, 2).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  // ---------------------------------------------------------------- q04
  /** TPC-H Q4-shaped: EXISTS as a conditioned left-semi join (P8's
    * distributed generalization), count per priority. */
  private def latePriorities(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_late"))
      .orderBy("o_orderpriority")
  }

  // ---------------------------------------------------------------- q05
  /** TPC-H Q5-shaped: 6-table join; dims (region/nation/supplier/customer)
    * broadcast, facts shuffle once on orderkey. */
  private def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).where(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
             col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
                             col("c_nationkey") === col("s_nationkey"), "inner")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(cents(col("l_extendedprice")) * (lit(100) - round(col("l_discount") * 100).cast("long"))) / 10000.0, 2).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  // ---------------------------------------------------------------- q06
  /** TPC-H Q6-shaped: pure scan + pushed filters + single exact sum. */
  private def forecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
             col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
             col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
             col("l_quantity") < 24)
      .agg(round(sum(cents(col("l_extendedprice")) * round(col("l_discount") * 100).cast("long")) / 10000.0, 2).as("promo_revenue"))
  }

  // ---------------------------------------------------------------- q07
  /** Left-semi join (P8, `predict_from_vm4.py:53-55` generalized):
    * customers in a segment that have at least one recent order. */
  private def activeCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).where(col("c_mktsegment") === "MACHINERY")
    val ord = Tables.orders(spark, dir).where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- q08
  /** Left-anti join (P3's batch form, `fetch_stock.py:57`): customers
    * that never ordered. */
  private def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- q09
  /** Left-outer join preserving zero-order customers; null-safe counts. */
  private def orderCounts(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    // Pre-aggregate the fact side to one row per key BEFORE the join — the
    // join then moves |customers| + |custkeys| rows instead of every order.
    val perCust = ord.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("__n"), sum(cents(col("o_totalprice"))).as("__s"))
    cust.join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("__n"), lit(0L)).as("n_orders"),
        round(coalesce(col("__s"), lit(0L)) / 100.0, 2).as("total_spent"))
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- q10
  /** Distinct (A2) + multi-agg per event type over the tick stand-in. */
  private def eventStats(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("users"),
        round(sum(cents(col("value"))) / 100.0, 2).as("sum_value"),
        (sum(cents(col("value"))) / 100.0 / count(lit(1))).as("avg_value"),
        min("value").as("min_value"),
        max("value").as("max_value"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q11
  /** Union (U1, `kafka_producer.py:71,99`): tag two filtered subsets,
    * unionByName, re-aggregate. */
  private def unionTagged(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val high = ord.where(col("o_totalprice") > 400000).withColumn("tag", lit("high_value"))
    val urgent = ord.where(col("o_orderpriority") === "1-URGENT").withColumn("tag", lit("urgent"))
    high.unionByName(urgent)
      .groupBy("tag")
      .agg(count(lit(1)).as("n"),
        round(sum(cents(col("o_totalprice"))) / 100.0, 2).as("total"))
      .orderBy("tag")
  }

  // ---------------------------------------------------------------- q12
  /** Rollup (engine-side extension, SURVEY.md §2.4): region→nation
    * customer counts with subtotal rows. */
  private def rollupCustomers(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
    df.rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_customers"))
      .orderBy("region", "nation")
  }

  // ---------------------------------------------------------------- q13
  /** Top-k per group (SURVEY.md §2.6): rank-window + filter. */
  private def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  // ---------------------------------------------------------------- q14
  /** Running/rolling windows (§2.5): cumulative sum + 5-row moving average
    * per key, exact via integer cents. */
  private def runningWindows(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val last5 = byUser.rowsBetween(-4, 0)
    Tables.events(spark, dir)
      .withColumn("vc", cents(col("value")))
      .select(
        col("user_id"), col("event_id"), col("value"),
        (sum(col("vc")).over(run) / 100.0).as("running_sum"),
        (sum(col("vc")).over(last5) / 100.0 / count(lit(1)).over(last5)).as("moving_avg5"))
      .orderBy("user_id", "event_id")
  }

  // ---------------------------------------------------------------- q15
  /** Lag returns (§2.5; pct-change semantics of `predict_from_vm4.py:61`
    * applied across consecutive bars). */
  private def lagReturns(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    Tables.events(spark, dir)
      .withColumn("prev", lag(col("value"), 1).over(byUser))
      .withColumn("ret_pct",
        when(col("prev").isNotNull && col("prev") =!= 0.0,
          round((col("value") - col("prev")) / col("prev") * 100.0, 2)))
      .select("user_id", "event_id", "value", "prev", "ret_pct")
      .orderBy("user_id", "event_id")
  }

  // ---------------------------------------------------------------- q16
  /** Sort + limit (§2.6) with the wire timestamp format F1. */
  private def topEvents(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .orderBy(desc("value"), asc("event_id"))
      .limit(20)
      .select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        col("event_type"), col("value"))
  }

  // ---------------------------------------------------------------- q17
  /** JSON decode with schema (F3, `features_engineering.py:38-40`):
    * from_json over `props`, then aggregate the extracted field. */
  private def jsonExtractAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("k",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"), count(col("k")).as("n_k"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q18
  /** CASE-WHEN bucketing (F5's conditional logic generalized). */
  private def priceBuckets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .withColumn("bucket",
        when(col("o_totalprice") < 100000, "small")
          .when(col("o_totalprice") < 300000, "medium")
          .otherwise("large"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(sum(cents(col("o_totalprice"))) / 100.0, 2).as("total"))
      .orderBy("bucket")
  }

  // ---------------------------------------------------------------- q19
  /** String function surface (F7 family). */
  private def stringFunctions(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 12).as("name_pfx"),
        length(col("p_name")).as("name_len"),
        concat_ws("#", col("p_brand"), col("p_size").cast("string")).as("brand_size"),
        regexp_replace(col("p_type"), " ", "_").as("type_slug"))
      .orderBy("p_partkey")
  }

  // ---------------------------------------------------------------- q20
  /** Date arithmetic surface (F1/F4): extract, interval add, datediff. */
  private def shipDelays(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("delay"))
      .groupBy("o_year", "o_month")
      .agg(count(lit(1)).as("n_lines"),
        (sum(col("delay")) / count(lit(1)).cast("double")).as("avg_delay"),
        max(col("delay")).as("max_delay"))
      .orderBy("o_year", "o_month")
  }

  /** q151: broadcast bloom-filter join pre-filter ([[graft.ops.BloomJoin]])
    * — a selective dim (urgent+finished orders, ~10% of keys) builds a
    * bloom that rides the fact SCAN as the codegen'd
    * `might_contain(xxhash64(key))` predicate, so at scale the join
    * shuffles only the matching share of lineitem instead of all of it
    * (the explicit form of Spark's InjectRuntimeFilter, not subject to
    * its size thresholds). No false negatives; the join removes false
    * positives — the result is exactly the plain join, which is the
    * oracle. */
  private def bloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.orders(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderstatus") === "F")
      .select("o_orderkey")
    // sizing is a hint (an undersized bloom only raises fpp, never
    // drops a key) — a generous constant avoids paying a whole count
    // scan of orders just to size the sketch
    val pre = graft.ops.BloomJoin.bloomPrefilter(
      Tables.lineitem(spark, dir), "l_orderkey", dim, "o_orderkey",
      expectedDimKeys = 1L << 20)
    pre.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_cents"),
        countDistinct("l_orderkey").as("n_orders"))
      .orderBy("l_returnflag")
  }

  /** q279: PARETO FRONTIER (2-D skyline, Börzsönyi et al. ICDE'01 —
    * public) — the multi-objective "best tradeoffs" operator classic
    * analytics suites ship and none of the prior 278 queries covers:
    * per order-priority class, the orders minimizing BOTH value and
    * date (no other order in the class is ≤ in both dimensions and <
    * in one). The 2-D case needs NO pairwise join: over DISTINCT
    * (cents, day) pairs sorted (cents asc, day asc), a pair is
    * dominated iff the running min of day over the strict prefix is
    * ≤ its own day — preceding rows have (cents <, any day) or
    * (cents =, day <), which is exactly the dominator set, and
    * equal-equal pairs can't occur after the distinct. One sort + one
    * window pass per class; the frontier is the classic staircase
    * (cents increasing, day strictly decreasing — the spec pins it).
    * At 100 TB: groupBy-distinct with map-side combine, then a
    * per-class window — no self-join, no quadratic anything. */
  private def paretoFrontier(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderpriority").as("prio"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      expr("CAST(datediff(o_orderdate, DATE'1970-01-01') AS BIGINT)").as("day"))
    val pairs = o.groupBy("prio", "cents", "day")
      .agg(count(lit(1)).as("n_orders"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("prio").orderBy("cents", "day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    pairs.withColumn("mprec", min("day").over(w))
      .where(col("mprec").isNull || col("mprec") > col("day"))
      .withColumn("frontier_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("prio").orderBy("cents", "day")))
      .select(col("prio"), col("frontier_rank").cast("long").as("frontier_rank"),
        col("cents"), col("day"), col("n_orders"))
      .orderBy("prio", "frontier_rank")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q279_pareto_frontier" -> paretoFrontier,
    "q151_bloom_join" -> bloomJoin,
    "q02_pricing_summary" -> pricingSummary,
    "q03_top_revenue_orders" -> topRevenueOrders,
    "q04_late_priorities" -> latePriorities,
    "q05_local_supplier_volume" -> localSupplierVolume,
    "q06_forecast_revenue" -> forecastRevenue,
    "q07_active_customers_semi" -> activeCustomers,
    "q08_customers_without_orders_anti" -> customersWithoutOrders,
    "q09_order_counts_outer" -> orderCounts,
    "q10_event_stats" -> eventStats,
    "q11_union_tagged" -> unionTagged,
    "q12_rollup_customers" -> rollupCustomers,
    "q13_top_orders_per_customer" -> topOrdersPerCustomer,
    "q14_running_windows" -> runningWindows,
    "q15_lag_returns" -> lagReturns,
    "q16_top_events" -> topEvents,
    "q17_json_extract_agg" -> jsonExtractAgg,
    "q18_price_buckets" -> priceBuckets,
    "q19_string_functions" -> stringFunctions,
    "q20_ship_delays" -> shipDelays
  )

  override def oracles: Map[String, String] = Map(
    // distinct pairs, strict-prefix running min, dominance filter and
    // the staircase rank replayed with the same window frames
    "q279_pareto_frontier" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS prio,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |           AS day
        |  FROM orders),
        |p AS (SELECT prio, cents, day, count(*) AS n_orders
        |      FROM o GROUP BY 1, 2, 3),
        |m AS (SELECT *, min(day) OVER (PARTITION BY prio
        |        ORDER BY cents, day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mprec
        |      FROM p),
        |f AS (SELECT * FROM m WHERE mprec IS NULL OR mprec > day)
        |SELECT prio,
        |       CAST(row_number() OVER (PARTITION BY prio
        |         ORDER BY cents, day) AS BIGINT) AS frontier_rank,
        |       cents, day, CAST(n_orders AS BIGINT) AS n_orders
        |FROM f ORDER BY prio, frontier_rank""".stripMargin,
    // the bloom is a pure pre-filter (no false negatives, join removes
    // false positives) — the plain selective join IS the semantics
    "q151_bloom_join" ->
      """SELECT l.l_returnflag,
        |       count(*) AS n_items,
        |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_cents,
        |       count(DISTINCT l.l_orderkey) AS n_orders
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'F'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q02_pricing_summary" ->
      """WITH l AS (
        |  SELECT l_returnflag, l_linestatus, l_quantity,
        |         CAST(round(l_extendedprice*100) AS BIGINT) AS ext_c,
        |         CAST(round(l_discount*100) AS BIGINT) AS disc_p,
        |         CAST(round(l_tax*100) AS BIGINT) AS tax_p
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02')
        |SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       round(sum(ext_c)/CAST(100 AS DOUBLE), 2) AS sum_base_price,
        |       round(sum(ext_c*(100-disc_p))/CAST(10000 AS DOUBLE), 2) AS sum_disc_price,
        |       round(sum(ext_c*(100-disc_p)*(100+tax_p))/CAST(1000000 AS DOUBLE), 2) AS sum_charge,
        |       sum(l_quantity)/count(*) AS avg_qty,
        |       sum(ext_c)/CAST(100 AS DOUBLE)/count(*) AS avg_price,
        |       sum(disc_p)/CAST(100 AS DOUBLE)/count(*) AS avg_disc,
        |       count(*) AS count_order
        |FROM l GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q03_top_revenue_orders" ->
      """SELECT l_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |       o_orderpriority,
        |       round(sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |                 * (100 - CAST(round(l_discount*100) AS BIGINT)))/CAST(10000 AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |  AND l_shipdate > TIMESTAMP '1999-01-01'
        |GROUP BY 1,2,3
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q04_late_priorities" ->
      """SELECT o_orderpriority, count(*) AS n_late
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_local_supplier_volume" ->
      """SELECT n_name,
        |       round(sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |                 * (100 - CAST(round(l_discount*100) AS BIGINT)))/CAST(10000 AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "q06_forecast_revenue" ->
      """SELECT round(sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |                 * CAST(round(l_discount*100) AS BIGINT))/CAST(10000 AS DOUBLE), 2) AS promo_revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q07_active_customers_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_mktsegment = 'MACHINERY'
        |  AND EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_orderdate >= TIMESTAMP '2000-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "q08_customers_without_orders_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q09_order_counts_outer" ->
      """SELECT c_custkey,
        |       count(o_orderkey) AS n_orders,
        |       round(coalesce(sum(CAST(round(o_totalprice*100) AS BIGINT)), 0)/CAST(100 AS DOUBLE), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_event_stats" ->
      """SELECT event_type,
        |       count(*) AS n,
        |       count(DISTINCT user_id) AS users,
        |       round(sum(CAST(round(value*100) AS BIGINT))/CAST(100 AS DOUBLE), 2) AS sum_value,
        |       sum(CAST(round(value*100) AS BIGINT))/CAST(100 AS DOUBLE)/count(*) AS avg_value,
        |       min(value) AS min_value,
        |       max(value) AS max_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_union_tagged" ->
      """WITH u AS (
        |  SELECT *, 'high_value' AS tag FROM orders WHERE o_totalprice > 400000
        |  UNION ALL
        |  SELECT *, 'urgent' AS tag FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT tag, count(*) AS n,
        |       round(sum(CAST(round(o_totalprice*100) AS BIGINT))/CAST(100 AS DOUBLE), 2) AS total
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_rollup_customers" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
        |       coalesce(n_name, 'ALL') AS nation,
        |       count(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY 1, 2""".stripMargin,
    "q13_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q14_running_windows" ->
      """SELECT user_id, event_id, value,
        |       sum(vc) OVER w_run/CAST(100 AS DOUBLE) AS running_sum,
        |       sum(vc) OVER w5/CAST(100 AS DOUBLE)/count(*) OVER w5 AS moving_avg5
        |FROM (SELECT user_id, event_id, value,
        |             CAST(round(value*100) AS BIGINT) AS vc FROM events)
        |WINDOW w_run AS (PARTITION BY user_id ORDER BY event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |       w5 AS (PARTITION BY user_id ORDER BY event_id
        |              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q15_lag_returns" ->
      """SELECT user_id, event_id, value, prev,
        |       CASE WHEN prev IS NOT NULL AND prev <> 0
        |            THEN round((value - prev)/prev*100, 2) END AS ret_pct
        |FROM (SELECT user_id, event_id, value,
        |             lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
        |      FROM events)
        |ORDER BY user_id, event_id""".stripMargin,
    "q16_top_events" ->
      """SELECT event_id,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |       event_type, value
        |FROM events ORDER BY value DESC, event_id ASC LIMIT 20""".stripMargin,
    "q17_json_extract_agg" ->
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |       max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
        |       count(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_price_buckets" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
        |            WHEN o_totalprice < 300000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |       count(*) AS n,
        |       round(sum(CAST(round(o_totalprice*100) AS BIGINT))/CAST(100 AS DOUBLE), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q19_string_functions" ->
      """SELECT p_partkey,
        |       upper(p_brand) AS brand_u,
        |       substr(p_name, 1, 12) AS name_pfx,
        |       length(p_name) AS name_len,
        |       p_brand || '#' || CAST(p_size AS VARCHAR) AS brand_size,
        |       replace(p_type, ' ', '_') AS type_slug
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q20_ship_delays" ->
      """SELECT year(o_orderdate) AS o_year,
        |       month(o_orderdate) AS o_month,
        |       count(*) AS n_lines,
        |       sum(date_diff('day', o_orderdate, l_shipdate))
        |             / CAST(count(*) AS DOUBLE) AS avg_delay,
        |       max(date_diff('day', o_orderdate, l_shipdate)) AS max_delay
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin
  )
}
