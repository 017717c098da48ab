package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables
import graft.timeseries.TimeSeries

/** Time-series layer queries (SURVEY.md §2.5 + build plan phase 2). */
object TimeSeriesQueries extends QueryPack {

  /** Event-time bar resample (T6): 1-hour OHLC bars per event type. */
  private def hourlyBars(spark: SparkSession, dir: String): DataFrame =
    TimeSeries.resampleBars(Tables.events(spark, dir),
        key = "event_type", ts = "ts", value = "value",
        orderCol = "event_id", width = "1 hour")
      .select(col("event_type"),
        date_format(col("bar_start"), "yyyy-MM-dd HH:mm:ss").as("bar_start_str"),
        col("open"), col("high"), col("low"), col("close"), col("n_ticks"))
      .orderBy("event_type", "bar_start_str")

  /** 10-row simple moving average per event type (exact via integer cents). */
  private def sma10(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"))
    TimeSeries.sma(ev, key = "event_type", orderCol = "event_id",
        value = round(col("value") * 100).cast("long"), n = 10, out = "sma_c")
      .withColumn("sma10", col("sma_c") / lit(100))
      .select("event_type", "event_id", "value", "sma10")
      .orderBy("event_type", "event_id")
  }

  /** Exponential moving average per user; the DuckDB twin is a recursive
    * CTE running the identical double arithmetic step-by-step. */
  private def ema02(spark: SparkSession, dir: String): DataFrame =
    TimeSeries.ema(Tables.events(spark, dir),
        key = "user_id", orderCol = "event_id", value = "value",
        alpha = 0.2, out = "ema")
      .orderBy("user_id", "event_id")

  /** As-of join: each error event aligned to the user's most recent click
    * at-or-before it (backward-looking stream alignment). */
  private def asofErrorClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val errors = ev.where(col("event_type") === "error")
      .select("event_id", "user_id", "ts", "value")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("click_value"),
        col("event_id"))
    TimeSeries.asofJoin(errors, clicks, key = "user_id",
        leftTs = "ts", rightTs = "ts", payload = Seq("click_value"),
        rightOrder = "event_id")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        col("value"), col("click_value"))
      .orderBy("event_id")
  }

  /** Nearest-as-of join: each error event aligned to the user's CLOSEST
    * click within ±5 minutes, either direction (tolerance alignment —
    * the variant where the relevant reading may arrive just after the
    * event). Backward wins delta ties. */
  private def asofNearestClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val errors = ev.where(col("event_type") === "error")
      .select("event_id", "user_id", "ts", "value")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("click_value"),
        col("event_id").as("click_id"))
    TimeSeries.asofNearest(errors, clicks, key = "user_id",
        leftTs = "ts", rightTs = "ts", payload = Seq("click_value"),
        rightOrder = "click_id", toleranceUs = 300L * 1000 * 1000)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        col("value"), col("click_id"), col("click_value"),
        col("delta_us"), col("direction"))
      .orderBy("event_id")
  }

  /** Range join: signup/purchase pairs of the same user within 30 minutes. */
  private def rangePairs(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val signups = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
    TimeSeries.rangeJoin(signups, purchases, key = "user_id",
        leftTs = "ts", rightTs = "p_ts", tolerance = "30 MINUTES")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_hourly_bars" -> hourlyBars,
    "q28_sma10" -> sma10,
    "q29_ema" -> ema02,
    "q30_asof_error_click" -> asofErrorClick,
    "q31_range_pairs" -> rangePairs,
    "q102_asof_nearest" -> asofNearestClick
  )

  override def oracles: Map[String, String] = Map(
    "q27_hourly_bars" ->
      """SELECT event_type,
        |       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bar_start_str,
        |       arg_min(value, event_id) AS open,
        |       max(value) AS high,
        |       min(value) AS low,
        |       arg_max(value, event_id) AS close,
        |       count(*) AS n_ticks
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q28_sma10" ->
      """SELECT event_type, event_id, value,
        |       sum(vc) OVER w/count(*) OVER w/100 AS sma10
        |FROM (SELECT event_type, event_id, value,
        |             CAST(round(value*100) AS BIGINT) AS vc FROM events)
        |WINDOW w AS (PARTITION BY event_type ORDER BY event_id
        |             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, event_id""".stripMargin,
    "q29_ema" ->
      """WITH RECURSIVE src AS (
        |  SELECT user_id, event_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events),
        |e AS (
        |  SELECT user_id, event_id, value, rn, value AS ema
        |  FROM src WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.event_id, s.value, s.rn,
        |         0.2*s.value + 0.8*e.ema
        |  FROM src s JOIN e ON s.user_id = e.user_id AND s.rn = e.rn + 1)
        |SELECT user_id, event_id, value, ema
        |FROM e ORDER BY user_id, event_id""".stripMargin,
    "q30_asof_error_click" ->
      """SELECT l.event_id, l.user_id,
        |       strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |       l.value, r.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'error') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    "q31_range_pairs" ->
      """SELECT s.user_id, count(*) AS n_pairs
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') s
        |JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
        |  ON s.user_id = p.user_id
        | AND p.ts >= s.ts - INTERVAL 30 MINUTE
        | AND p.ts <= s.ts + INTERVAL 30 MINUTE
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Tie-break mirror of asofNearest: delta ASC, backward before forward,
    // then latest backward click / earliest forward click.
    "q102_asof_nearest" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'error'),
        |r AS (SELECT event_id AS click_id, user_id, ts,
        |             value AS click_value
        |      FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT l.event_id, r.click_id, r.click_value,
        |         abs(epoch_us(r.ts) - epoch_us(l.ts)) AS delta_us,
        |         CASE WHEN r.ts <= l.ts THEN 'backward'
        |              ELSE 'forward' END AS direction,
        |         row_number() OVER (PARTITION BY l.event_id ORDER BY
        |           abs(epoch_us(r.ts) - epoch_us(l.ts)),
        |           CASE WHEN r.ts <= l.ts THEN 0 ELSE 1 END,
        |           CASE WHEN r.ts <= l.ts THEN -r.click_id
        |                ELSE r.click_id END) AS rn
        |  FROM l JOIN r ON l.user_id = r.user_id
        |   AND abs(epoch_us(r.ts) - epoch_us(l.ts)) <= 300000000)
        |SELECT l.event_id, l.user_id,
        |       strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts_str, l.value,
        |       p.click_id, p.click_value, p.delta_us, p.direction
        |FROM l LEFT JOIN (SELECT * FROM p WHERE rn = 1) p
        |  ON l.event_id = p.event_id
        |ORDER BY l.event_id""".stripMargin
  )
}
