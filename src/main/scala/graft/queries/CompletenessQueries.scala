package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** SQL-surface completeness pack: the set operations beyond union,
  * correlated subqueries, event-time RANGE window frames, and the
  * positional window functions — each a distinct Catalyst operator
  * family, each fully oracle-checked. */
object CompletenessQueries extends QueryPack {

  /** q82: INTERSECT / EXCEPT — users who both signed up and purchased,
    * and users who signed up but never purchased, tagged and unioned. */
  private def intersectExcept(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def users(t: String) =
      ev.where(col("event_type") === t).select("user_id").distinct()
    val both = users("signup").intersect(users("purchase"))
      .withColumn("kind", lit("both"))
    val signupOnly = users("signup").except(users("purchase"))
      .withColumn("kind", lit("signup_only"))
    both.unionByName(signupOnly)
      .select("kind", "user_id")
      .orderBy("kind", "user_id")
  }

  /** q83: correlated scalar subquery through the SQL entry point —
    * suppliers above their own nation's average balance. Averages run on
    * exact integer cents so the comparison is engine-identical. */
  private def correlatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.supplier(spark, dir).createOrReplaceTempView("supplier_v")
    spark.sql(
      """SELECT s.s_suppkey, s.s_nationkey, s.s_acctbal
        |FROM supplier_v s
        |WHERE CAST(round(s.s_acctbal * 100) AS BIGINT) >
        |      (SELECT avg(CAST(round(s2.s_acctbal * 100) AS BIGINT))
        |       FROM supplier_v s2 WHERE s2.s_nationkey = s.s_nationkey)
        |ORDER BY s.s_suppkey""".stripMargin)
  }

  /** q84: event-time RANGE frame — per user, rolling 1-hour sums over the
    * epoch-second order (peers at equal timestamps all included; integer
    * cents keep it exact at any partitioning). */
  private def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("value") * 100).cast("long")
    val w = Window.partitionBy("user_id").orderBy(col("ts").cast("long"))
      .rangeBetween(-3600, 0)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        sum(cents).over(w).as("sum_1h_c"),
        count(lit(1)).over(w).as("n_1h"))
      .orderBy("user_id", "event_id")
  }

  /** q85: positional window functions — first/last/nth event value per
    * user over the full partition frame. */
  private def positionalWindows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        first(col("value")).over(w).as("first_v"),
        last(col("value")).over(w).as("last_v"),
        nth_value(col("value"), 3).over(w).as("third_v"))
      .orderBy("user_id", "event_id")
  }

  /** q88: rank-distribution window functions — percent_rank, cume_dist,
    * ntile. Deterministic: the order key (event_id) is unique per user,
    * and both engines compute the same rank arithmetic. */
  private def rankDistributions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        ntile(4).over(w).as("quartile"))
      .orderBy("user_id", "event_id")
  }

  /** q89: calendar functions over order dates. Convention bridges are
    * explicit: Spark dayofweek (Sunday=1) = DuckDB dow + 1; weekofyear is
    * ISO week in both. */
  private def calendarFunctions(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        dayofweek(col("o_orderdate")).as("dow1"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"))
      .orderBy("o_orderkey")

  /** q90: boolean aggregates — every/any per group (DuckDB bool_and /
    * bool_or). */
  private def boolAggs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(every(col("value") > 0).as("all_positive"),
        some(col("value") > 100).as("any_over_100"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** q190: correlated LATERAL subquery — "for each nation, run this
    * dependent top-2 query" declared literally. The naive reading is a
    * per-outer-row re-execution; Catalyst DECORRELATES it
    * (DecorrelateInnerQuery rewrites the correlated ORDER BY/LIMIT into a
    * partitioned rank over ONE customer scan joined back to nation), so
    * the declarative form survives a 100 TB outer side where per-row
    * subquery execution would not. Balance ranks on exact cents with a
    * custkey tiebreak so the top-2 set is engine-identical. */
  private def lateralTopN(spark: SparkSession, dir: String): DataFrame = {
    Tables.nation(spark, dir).createOrReplaceTempView("nation_v")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_lat_v")
    spark.sql(
      """SELECT n.n_name, t.c_custkey, t.bal_cents
        |FROM nation_v n
        |JOIN LATERAL (
        |  SELECT c.c_custkey,
        |         CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer_lat_v c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY CAST(round(c.c_acctbal * 100) AS BIGINT) DESC, c.c_custkey
        |  LIMIT 2) t
        |ORDER BY n.n_name, t.c_custkey""".stripMargin)
  }

  /** q195: null-aware anti join — NOT IN against a subquery whose column
    * is NOT provably non-null (`nullif` keeps static nullability open, no
    * runtime null exists for the -1 sentinel). NOT IN's three-valued
    * logic differs from NOT EXISTS (one list NULL empties the result), so
    * Spark plans the dedicated single-column null-aware anti join — a
    * BROADCAST build with an isNullAware flag — instead of q08's plain
    * LeftAnti. The build side is the dim (customer subset); the 100 TB
    * fact side streams through unshuffled. */
  private def nullAwareAnti(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_naaj_v")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_naaj_v")
    spark.sql(
      """SELECT o.o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_cents
        |FROM orders_naaj_v o
        |WHERE o.o_custkey NOT IN
        |      (SELECT nullif(c.c_custkey, -1) FROM customer_naaj_v c
        |       WHERE c.c_mktsegment = 'BUILDING')
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin)
  }

  /** q194: RECURSIVE CTE (Spark 4's UnionLoop operator) — per-row
    * unbounded iteration declared in SQL. A synthetic decimal ancestry
    * tree over the REAL customer keys (parent(k) = k DIV 10) is walked
    * from every customer to the root in one recursive union; the
    * aggregate pins every frontier (depth) exactly. Scale shape: each
    * recursion step is ONE map over the previous frontier (no driver
    * loop, no lineage blow-up — the engine materializes per-step
    * frontiers), depth is bounded by the key's digit count, and the
    * final aggregate is map-side combinable. DuckDB replays the same
    * recursion verbatim. */
  private def recursiveCte(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_rec_v")
    spark.sql(
      """WITH RECURSIVE chain AS (
        |  SELECT c_custkey AS start_key, c_custkey AS cur, 0 AS depth
        |  FROM customer_rec_v
        |  UNION ALL
        |  SELECT start_key, cur DIV 10, depth + 1 FROM chain WHERE cur > 0)
        |SELECT depth, count(*) AS n_nodes,
        |       CAST(sum(cur) AS BIGINT) AS sum_keys,
        |       count(DISTINCT cur) AS n_distinct
        |FROM chain GROUP BY depth ORDER BY depth""".stripMargin)
  }

  /** q197: higher-order array functions — transform / filter /
    * aggregate / zip_with / exists over the embedding vectors, entirely
    * inside the scan projection: per-row array programs with ZERO
    * shuffle and no UDF (every lambda is a codegen'd Catalyst
    * expression — the idiomatic replacement for an explode→groupBy
    * round-trip, which at 100 TB would shuffle dims× the table to
    * compute a per-row reduction). Arithmetic rides exact milli-unit
    * longs so every engine agrees bit-for-bit; DuckDB's list lambdas
    * replay each program. */
  private def higherOrderArrays(spark: SparkSession, dir: String): DataFrame = {
    val milli = transform(col("embedding"),
      x => round(x.cast("double") * 1000).cast("long"))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), milli.as("m"))
      .select(col("vec_id"),
        size(col("m")).as("n_dims"),
        size(filter(col("m"), x => x > 0)).as("n_pos"),
        aggregate(col("m"), lit(0L), (acc, x) => acc + x * x).as("sumsq_milli"),
        aggregate(col("m"), lit(0L), (acc, x) => acc + abs(x)).as("l1_milli"),
        aggregate(zip_with(col("m"), reverse(col("m")), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("pal_dot_milli"),
        exists(col("m"), x => abs(x) >= lit(900L)).as("has_extreme"))
      .orderBy("vec_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_intersect_except" -> intersectExcept,
    "q83_correlated_subquery" -> correlatedSubquery,
    "q190_lateral_topn" -> lateralTopN,
    "q194_recursive_cte" -> recursiveCte,
    "q195_null_aware_anti" -> nullAwareAnti,
    "q197_higher_order_arrays" -> higherOrderArrays,
    "q84_range_frame" -> rangeFrame,
    "q85_positional_windows" -> positionalWindows,
    "q88_rank_distributions" -> rankDistributions,
    "q89_calendar_functions" -> calendarFunctions,
    "q90_bool_aggs" -> boolAggs
  )

  override def oracles: Map[String, String] = Map(
    "q194_recursive_cte" ->
      """WITH RECURSIVE chain AS (
        |  SELECT c_custkey AS start_key, c_custkey AS cur, 0 AS depth
        |  FROM customer
        |  UNION ALL
        |  SELECT start_key, cur // 10, depth + 1 FROM chain WHERE cur > 0)
        |SELECT depth, count(*) AS n_nodes,
        |       CAST(sum(cur) AS BIGINT) AS sum_keys,
        |       count(DISTINCT cur) AS n_distinct
        |FROM chain GROUP BY depth ORDER BY depth""".stripMargin,
    "q197_higher_order_arrays" ->
      """WITH m AS (
        |  SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS m
        |  FROM embeddings)
        |SELECT vec_id,
        |       CAST(len(m) AS INTEGER) AS n_dims,
        |       CAST(len(list_filter(m, x -> x > 0)) AS INTEGER) AS n_pos,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT), m),
        |                   (a, x) -> a + x * x) AS sumsq_milli,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT), m),
        |                   (a, x) -> a + abs(x)) AS l1_milli,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           list_transform(range(1, len(m) + 1),
        |                          i -> m[i] * m[len(m) + 1 - i])),
        |         (a, x) -> a + x) AS pal_dot_milli,
        |       len(list_filter(m, x -> abs(x) >= 900)) > 0 AS has_extreme
        |FROM m ORDER BY vec_id""".stripMargin,
    "q190_lateral_topn" ->
      """SELECT n.n_name, t.c_custkey, t.bal_cents
        |FROM nation n
        |JOIN LATERAL (
        |  SELECT c.c_custkey,
        |         CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY CAST(round(c.c_acctbal * 100) AS BIGINT) DESC, c.c_custkey
        |  LIMIT 2) t ON true
        |ORDER BY n.n_name, t.c_custkey""".stripMargin,
    "q195_null_aware_anti" ->
      """SELECT o.o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_cents
        |FROM orders o
        |WHERE o.o_custkey NOT IN
        |      (SELECT nullif(c.c_custkey, -1) FROM customer c
        |       WHERE c.c_mktsegment = 'BUILDING')
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin,
    "q82_intersect_except" ->
      """WITH s AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'),
        |     p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |SELECT 'both' AS kind, user_id FROM (SELECT user_id FROM s INTERSECT SELECT user_id FROM p)
        |UNION ALL
        |SELECT 'signup_only' AS kind, user_id FROM (SELECT user_id FROM s EXCEPT SELECT user_id FROM p)
        |ORDER BY kind, user_id""".stripMargin,
    "q83_correlated_subquery" ->
      """SELECT s.s_suppkey, s.s_nationkey, s.s_acctbal
        |FROM supplier s
        |WHERE CAST(round(s.s_acctbal * 100) AS BIGINT) >
        |      (SELECT avg(CAST(round(s2.s_acctbal * 100) AS BIGINT))
        |       FROM supplier s2 WHERE s2.s_nationkey = s.s_nationkey)
        |ORDER BY s.s_suppkey""".stripMargin,
    "q84_range_frame" ->
      """SELECT user_id, event_id,
        |       CAST(sum(CAST(round(value*100) AS BIGINT)) OVER win AS BIGINT) AS sum_1h_c,
        |       count(*) OVER win AS n_1h
        |FROM events
        |WINDOW win AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q88_rank_distributions" ->
      """SELECT user_id, event_id,
        |       percent_rank() OVER win AS pct_rank,
        |       cume_dist() OVER win AS cume,
        |       ntile(4) OVER win AS quartile
        |FROM events
        |WINDOW win AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q89_calendar_functions" ->
      """SELECT o_orderkey,
        |       year(o_orderdate) AS y,
        |       quarter(o_orderdate) AS q,
        |       month(o_orderdate) AS m,
        |       day(o_orderdate) AS d,
        |       dayofweek(o_orderdate) + 1 AS dow1,
        |       weekofyear(o_orderdate) AS iso_week,
        |       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q90_bool_aggs" ->
      """SELECT event_type,
        |       bool_and(value > 0) AS all_positive,
        |       bool_or(value > 100) AS any_over_100,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q85_positional_windows" ->
      """SELECT user_id, event_id, value,
        |       first_value(value) OVER win AS first_v,
        |       last_value(value) OVER win AS last_v,
        |       nth_value(value, 3) OVER win AS third_v
        |FROM events
        |WINDOW win AS (PARTITION BY user_id ORDER BY event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin
  )
}
