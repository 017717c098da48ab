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
    "q26_last_timestamps" -> lastTimestamps
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
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
