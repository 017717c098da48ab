package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.StockOps
import graft.tables.Tables

/** The reference's own operators (SURVEY.md §2.2), each as a driver-visible
  * query over the `events` tick stand-in (user_id ≙ symbol). */
object StockQueries extends QueryPack {

  /** P1+F1 (`fetch_stock.py:54-58`): close-only wire projection. */
  private def wireProjection(spark: SparkSession, dir: String): DataFrame =
    StockOps.projectCloseOnly(
        Tables.events(spark, dir), ts = "ts", symbol = "user_id", close = "value")
      .orderBy("symbol", "timestamp", "close_price")

  /** P3 (`fetch_stock.py:43,57,64`): incremental high-watermark filter —
    * rows strictly newer than each key's max seen timestamp. */
  private def incrementalFilter(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val seen = ev.where(col("ts") < lit("2024-01-20").cast("timestamp"))
    StockOps.incrementalFilter(ev, seen, key = "user_id", ts = "ts")
      .select(col("event_id"), col("user_id"),
        StockOps.wireTimestamp(col("ts")).as("ts_str"))
      .orderBy("event_id")
  }

  /** P7 (`mongo_stream_etl.py:34-39`): history/realtime routing split,
    * re-aggregated per route for a compact compare. */
  private def routeSplit(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("source",
      when(col("event_type").isin("view", "click", "purchase"), "history")
        .otherwise("realtime"))
    val (history, realtime) = StockOps.routeBySource(ev)
    history.withColumn("route", lit("history"))
      .unionByName(realtime.withColumn("route", lit("realtime")))
      .groupBy("route", "event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("route", "event_type")
  }

  /** P6 (`mongo_stream_etl.py:23-32`): default-on-missing projection —
    * null symbol becomes "UNKNOWN". Nulls are synthesized via nullif since
    * the fixture has none. */
  private def symbolUnknown(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("lang_or_unknown",
        StockOps.symbolOrUnknown(nullif(col("lang"), lit("en"))))
      .groupBy("lang_or_unknown")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang_or_unknown")

  /** P8 (`predict_from_vm4.py:53-55`): semi-join guard against the trained
    * key set (keys with enough history to have a model). */
  private def trainedGuard(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val trained = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .where(col("n") >= 70).select("user_id")
    StockOps.trainedOnly(ev, trained, "user_id")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum(round(col("value") * 100).cast("long")) / 100.0, 2).as("sum_value"))
      .orderBy("user_id")
  }

  /** q105: max drawdown per symbol — the classic risk metric the
    * reference's trend model gestures at. Running peak via a sorted
    * window, drawdown in integer CENTS (exact at any partitioning), the
    * fractional form as a per-row double division whose max is
    * order-independent. One key shuffle + one window pass — q65's plan
    * shape, any key cardinality. */
  private def maxDrawdown(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("run_max", max(col("cents")).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_ticks"),
        max(col("run_max") - col("cents")).as("max_dd_c"),
        max((col("run_max") - col("cents")).cast("double")
          / nullif(col("run_max"), lit(0L)).cast("double")).as("max_dd_frac"))
      .orderBy("user_id")
  }

  /** q106: pairwise correlation of daily closes across a FIXED symbol
    * panel (portfolio correlation matrix). The moment sums (n, Σx, Σy,
    * Σxy, Σx², Σy²) are integer cents — exact under any partitioning and
    * merge order, unlike a double `corr` aggregate whose partial sums
    * round partition-order-dependently — and the Pearson formula is one
    * identical double expression tree on both engines.
    *
    * Scale note: all-pairs correlation is inherently O(symbols²); the
    * bounded panel keeps the day-join broadcastable (panel × days rows),
    * the same boundedness contract as the ANN query set (q41). */
  private def panelCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .where(col("user_id") < 20)
      .groupBy(col("user_id"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(max_by(round(col("value") * 100).cast("long"), col("event_id"))
        .as("close_c"))
    val a = daily.select(col("user_id").as("sym_a"), col("day"),
      col("close_c").as("ca"))
    val b = daily.select(col("user_id").as("sym_b"), col("day"),
      col("close_c").as("cb"))
    a.join(b, Seq("day")).where(col("sym_a") < col("sym_b"))
      .groupBy("sym_a", "sym_b")
      .agg(count(lit(1)).as("n_days"),
        sum("ca").as("sx"), sum("cb").as("sy"),
        sum(col("ca") * col("cb")).as("sxy"),
        sum(col("ca") * col("ca")).as("sxx"),
        sum(col("cb") * col("cb")).as("syy"))
      .select(col("sym_a"), col("sym_b"), col("n_days"),
        ((col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (sqrt(nullif(col("n_days") * col("sxx") - col("sx") * col("sx"),
              lit(0L)).cast("double"))
            * sqrt(nullif(col("n_days") * col("syy") - col("sy") * col("sy"),
              lit(0L)).cast("double")))).as("corr"))
      .orderBy("sym_a", "sym_b")
  }

  /** A1 (`fetch_stock.py:64`): per-key last timestamp. */
  private def lastTimestamps(spark: SparkSession, dir: String): DataFrame =
    StockOps.lastTimestamps(Tables.events(spark, dir), "user_id", "ts")
      .select(col("user_id"), StockOps.wireTimestamp(col("last_ts")).as("last_ts_str"))
      .orderBy("user_id")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_wire_projection" -> wireProjection,
    "q22_incremental_filter" -> incrementalFilter,
    "q23_route_split" -> routeSplit,
    "q24_symbol_unknown" -> symbolUnknown,
    "q25_trained_guard" -> trainedGuard,
    "q26_last_timestamps" -> lastTimestamps,
    "q105_max_drawdown" -> maxDrawdown,
    "q106_panel_correlation" -> panelCorrelation
  )

  override def oracles: Map[String, String] = Map(
    "q21_wire_projection" ->
      """SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS timestamp,
        |       user_id AS symbol, value AS close_price
        |FROM events ORDER BY symbol, timestamp, close_price""".stripMargin,
    "q22_incremental_filter" ->
      """SELECT e.event_id, e.user_id,
        |       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_str
        |FROM events e
        |LEFT JOIN (SELECT user_id, max(ts) AS hwm FROM events
        |           WHERE ts < TIMESTAMP '2024-01-20'
        |           GROUP BY user_id) s
        |  ON e.user_id = s.user_id
        |WHERE s.hwm IS NULL OR e.ts > s.hwm
        |ORDER BY e.event_id""".stripMargin,
    "q23_route_split" ->
      """SELECT CASE WHEN event_type IN ('view','click','purchase')
        |            THEN 'history' ELSE 'realtime' END AS route,
        |       event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q24_symbol_unknown" ->
      """SELECT coalesce(nullif(lang, 'en'), 'UNKNOWN') AS lang_or_unknown,
        |       count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q25_trained_guard" ->
      """SELECT user_id, count(*) AS n_events,
        |       round(sum(CAST(round(value*100) AS BIGINT))/CAST(100 AS DOUBLE), 2) AS sum_value
        |FROM events
        |WHERE user_id IN (SELECT user_id FROM events
        |                  GROUP BY user_id HAVING count(*) >= 70)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q26_last_timestamps" ->
      """SELECT user_id, strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts_str
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q105_max_drawdown" ->
      """WITH c AS (
        |  SELECT user_id, event_id,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT user_id, cents,
        |         max(cents) OVER (PARTITION BY user_id ORDER BY event_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING
        |                                   AND CURRENT ROW) AS run_max
        |  FROM c)
        |SELECT user_id, count(*) AS n_ticks,
        |       max(run_max - cents) AS max_dd_c,
        |       max(CAST(run_max - cents AS DOUBLE)
        |           / CAST(nullif(run_max, 0) AS DOUBLE)) AS max_dd_frac
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q106_panel_correlation" ->
      """WITH d AS (
        |  SELECT user_id,
        |         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |         arg_max(CAST(round(value * 100) AS BIGINT), event_id) AS close_c
        |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
        |m AS (
        |  SELECT a.user_id AS sym_a, b.user_id AS sym_b,
        |         count(*) AS n_days,
        |         sum(a.close_c) AS sx, sum(b.close_c) AS sy,
        |         sum(a.close_c * b.close_c) AS sxy,
        |         sum(a.close_c * a.close_c) AS sxx,
        |         sum(b.close_c * b.close_c) AS syy
        |  FROM d a JOIN d b ON a.day = b.day AND a.user_id < b.user_id
        |  GROUP BY 1, 2)
        |SELECT sym_a, sym_b, n_days,
        |       CAST(n_days * sxy - sx * sy AS DOUBLE)
        |         / (sqrt(CAST(nullif(n_days * sxx - sx * sx, 0) AS DOUBLE))
        |            * sqrt(CAST(nullif(n_days * syy - sy * sy, 0) AS DOUBLE)))
        |         AS corr
        |FROM m ORDER BY sym_a, sym_b""".stripMargin
  )
}
