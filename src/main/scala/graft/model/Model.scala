package graft.model

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed API boundary (SURVEY.md §1: `Dataset[T]` case classes at API
  * boundaries; §2.10: custom aggregates as `Aggregator[IN, BUF, OUT]`). */

/** One tick of the stand-in stream (ts pre-bucketed to a day string). */
case class Tick(user_id: Long, event_id: Long, day: String, value: Double)

/** An OHLC bar with tick count. */
case class Bar(open: Double, high: Double, low: Double, close: Double,
               n_ticks: Long)

/** Mergeable OHLC state: first/last are tracked by the monotone event id,
  * so merge order across partitions cannot change the result. */
case class BarBuf(openId: Long, open: Double, high: Double, low: Double,
                  closeId: Long, close: Double, n: Long)

/** One-pass typed OHLC aggregation — the `Aggregator` form of the
  * min_by/max_by/min/max/count bar (same semantics as
  * `TimeSeries.resampleBars`, checked against the same arg_min/arg_max
  * oracle). Commutative + associative merge → safe under any shuffle. */
object OhlcAggregator extends Aggregator[Tick, BarBuf, Bar] {
  override def zero: BarBuf =
    BarBuf(Long.MaxValue, 0.0, Double.MinValue, Double.MaxValue,
      Long.MinValue, 0.0, 0L)
  override def reduce(b: BarBuf, t: Tick): BarBuf = BarBuf(
    if (t.event_id < b.openId) t.event_id else b.openId,
    if (t.event_id < b.openId) t.value else b.open,
    math.max(b.high, t.value),
    math.min(b.low, t.value),
    if (t.event_id > b.closeId) t.event_id else b.closeId,
    if (t.event_id > b.closeId) t.value else b.close,
    b.n + 1)
  override def merge(a: BarBuf, b: BarBuf): BarBuf = BarBuf(
    if (a.openId <= b.openId) a.openId else b.openId,
    if (a.openId <= b.openId) a.open else b.open,
    math.max(a.high, b.high),
    math.min(a.low, b.low),
    if (a.closeId >= b.closeId) a.closeId else b.closeId,
    if (a.closeId >= b.closeId) a.close else b.close,
    a.n + b.n)
  override def finish(b: BarBuf): Bar = Bar(b.open, b.high, b.low, b.close, b.n)
  override def bufferEncoder: Encoder[BarBuf] = Encoders.product[BarBuf]
  override def outputEncoder: Encoder[Bar] = Encoders.product[Bar]
}

object TypedOps {
  /** events DataFrame → typed tick stream (day-bucketed). */
  def ticks(events: org.apache.spark.sql.DataFrame): Dataset[Tick] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"), col("value"))
      .as[Tick]
  }

  /** Daily bars per user via the typed aggregator. */
  def dailyBars(events: org.apache.spark.sql.DataFrame): Dataset[((Long, String), Bar)] = {
    val spark = events.sparkSession
    import spark.implicits._
    ticks(events).groupByKey(t => (t.user_id, t.day))
      .agg(OhlcAggregator.toColumn.name("bar"))
  }
}
