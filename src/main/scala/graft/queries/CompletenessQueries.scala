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

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_intersect_except" -> intersectExcept,
    "q83_correlated_subquery" -> correlatedSubquery,
    "q84_range_frame" -> rangeFrame,
    "q85_positional_windows" -> positionalWindows,
    "q88_rank_distributions" -> rankDistributions,
    "q89_calendar_functions" -> calendarFunctions,
    "q90_bool_aggs" -> boolAggs
  )

  override def oracles: Map[String, String] = Map(
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
