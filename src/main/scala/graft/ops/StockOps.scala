package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's per-record transformations, re-expressed as columnar
  * combinators so Catalyst can push/prune/codegen them.
  *
  * Each member cites the reference behavior it reproduces
  * (file:line into /root/reference/).
  */
object StockOps {

  /** Movement label: did the bar close above its open?
    * `ml_model/predict_from_vm4.py:31` — `(close > open).astype(int)`. */
  def movement(close: Column, open: Column): Column =
    (close > open).cast("int")

  /** Percent change, rounded to 2dp: `ml_model/predict_from_vm4.py:61` —
    * `((close-open)/open*100).round(2)`. The reference would emit inf on
    * open == 0; the engine defines that case as NULL (FIXTURES.md A5). */
  def pctChange(close: Column, open: Column): Column =
    when(open =!= 0.0, round((close - open) / open * 100.0, 2))

  /** Wire-format timestamp string, `'%Y-%m-%d %H:%M:%S'`:
    * `data_collection/fetch_stock.py:55`, `kafka_producer.py:80,108`. */
  def wireTimestamp(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd HH:mm:ss")

  /** Close-only wire projection (P1): OHLCV → {timestamp, symbol,
    * close_price} — `data_collection/fetch_stock.py:54-58`. */
  def projectCloseOnly(df: DataFrame, ts: String, symbol: String,
                       close: String): DataFrame =
    df.select(
      wireTimestamp(col(ts)).as("timestamp"),
      col(symbol).as("symbol"),
      col(close).as("close_price"))

  /** Default-on-missing projection (P6): `full_doc.get("symbol",
    * "UNKNOWN")` — `streaming_processing/mongo_stream_etl.py:23-32`. */
  def symbolOrUnknown(symbol: Column): Column =
    coalesce(symbol, lit("UNKNOWN"))

  /** Incremental filter (P3), batch form: keep only rows strictly newer
    * than each key's high watermark. The reference holds the watermark in
    * a driver-local dict (`fetch_stock.py:43,57,64`); the distributed
    * form is a broadcast anti-condition join against per-key max(ts).
    *
    * Scale note: `seen` aggregates to one row per key, so the join side
    * is small (cardinality = #symbols) and is broadcast — the big `incoming`
    * side never shuffles.
    */
  def incrementalFilter(incoming: DataFrame, seen: DataFrame,
                        key: String, ts: String): DataFrame = {
    val wm = seen.groupBy(col(key)).agg(max(col(ts)).as("__hwm"))
    incoming.join(broadcast(wm), Seq(key), "left")
      .where(col("__hwm").isNull || col(ts) > col("__hwm"))
      .drop("__hwm")
  }

  /** Routing split (P7): `source == "history"` → history, else realtime —
    * `mongo_stream_etl.py:34-39`. Returns (history, realtime). */
  def routeBySource(df: DataFrame, source: String = "source"): (DataFrame, DataFrame) =
    (df.where(col(source) === "history"),
     df.where(col(source) =!= "history" || col(source).isNull))

  /** Semi-join guard (P8): keep only rows whose key has a trained model —
    * `predict_from_vm4.py:53-55` (`if symbol not in models: skip`).
    * `trained` is tiny (one row per key) → broadcast left_semi. */
  def trainedOnly(df: DataFrame, trained: DataFrame, key: String): DataFrame =
    df.join(broadcast(trained.select(col(key)).distinct()), Seq(key), "left_semi")

  /** Per-key last timestamp (A1): `last_timestamps[symbol] = index[-1]` —
    * `fetch_stock.py:64`. */
  def lastTimestamps(df: DataFrame, key: String, ts: String): DataFrame =
    df.groupBy(col(key)).agg(max(col(ts)).as("last_ts"))
}
