package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.StockOps
import graft.tables.Tables

/** The reference's core question — "did each symbol's price move up, and by
  * how much?" (SURVEY.md §7 minimum slice) — over the `events` stand-in
  * table (ts/user/value ≙ timestamp/symbol/close, FIXTURES.md §B).
  *
  * Reproduces: scan S2, projections P1/P2, scalar fns F1/F5/F6
  * (`ml_model/predict_from_vm4.py:31,61`), per-key agg A1.
  */
object CoreQueries extends QueryPack {

  /** Daily OHLC-style movement per symbol. `event_id` is the tiebreak-free
    * time order (monotone with ts in the fixtures) so first/last bar of the
    * day is deterministic on both engines. */
  def dailyMovement(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.groupBy(
        col("event_type").as("symbol"),
        date_format(col("ts"), "yyyy-MM-dd").as("trade_date"))
      .agg(
        min_by(col("value"), col("event_id")).as("open"),
        max_by(col("value"), col("event_id")).as("close"),
        count(lit(1)).as("n_bars"))
      .withColumn("movement", StockOps.movement(col("close"), col("open")))
      .withColumn("pct_change", StockOps.pctChange(col("close"), col("open")))
      .orderBy("symbol", "trade_date")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_daily_movement" -> dailyMovement
  )

  override def oracles: Map[String, String] = Map(
    "q01_daily_movement" ->
      """SELECT event_type AS symbol,
        |       strftime(date_trunc('day', ts), '%Y-%m-%d') AS trade_date,
        |       arg_min(value, event_id) AS open,
        |       arg_max(value, event_id) AS close,
        |       count(*) AS n_bars,
        |       CASE WHEN arg_max(value, event_id) > arg_min(value, event_id)
        |            THEN 1 ELSE 0 END AS movement,
        |       CASE WHEN arg_min(value, event_id) <> 0 THEN
        |         round((arg_max(value, event_id) - arg_min(value, event_id))
        |               / arg_min(value, event_id) * 100, 2)
        |       END AS pct_change
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin
  )
}
