package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.StockOps

/** Edge cases from FIXTURES.md §A5. */
class StockOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bars = Seq(
    ("AAPL", "2025-07-24 15:58:00", 10.0, 11.0),
    ("AAPL", "2025-07-24 15:59:00", 11.0, 10.5),
    ("MSFT", "2025-07-24 15:59:00", 0.0, 5.0),
    ("GOOG", "2025-07-24 15:59:00", 2.0, 2.0)
  ).toDF("symbol", "ts", "open", "close")
    .withColumn("ts", to_timestamp(col("ts")))

  test("movement: close > open → 1 else 0 (predict_from_vm4.py:31)") {
    val got = bars.select(col("symbol"), StockOps.movement(col("close"), col("open")).as("m"))
      .as[(String, Int)].collect().toMap
    assert(got == Map("AAPL" -> 0, "MSFT" -> 1, "GOOG" -> 0))
    // first AAPL row overwritten by second in toMap; check full list too
    val all = bars.select(StockOps.movement(col("close"), col("open"))).as[Int].collect()
    assert(all.toSeq == Seq(1, 0, 1, 0))
  }

  test("pctChange: rounds to 2dp; open==0 → null (FIXTURES A5)") {
    val got = bars.select(StockOps.pctChange(col("close"), col("open"))).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(10.0), Some(-4.55), None, Some(0.0)))
  }

  test("symbolOrUnknown defaults missing symbol (mongo_stream_etl.py:25)") {
    val df = Seq(Some("AAPL"), None).toDF("symbol")
    val got = df.select(StockOps.symbolOrUnknown(col("symbol"))).as[String].collect()
    assert(got.toSeq == Seq("AAPL", "UNKNOWN"))
  }

  test("incrementalFilter keeps only rows past each key's watermark, all rows for unseen keys") {
    val seen = Seq(("AAPL", 100L), ("AAPL", 200L)).toDF("symbol", "t")
      .withColumn("ts", timestamp_seconds(col("t"))).drop("t")
    val incoming = Seq(("AAPL", 150L), ("AAPL", 200L), ("AAPL", 250L), ("NEW", 50L))
      .toDF("symbol", "t").withColumn("ts", timestamp_seconds(col("t"))).drop("t")
    val got = StockOps.incrementalFilter(incoming, seen, "symbol", "ts")
      .select(col("symbol"), unix_timestamp(col("ts"))).as[(String, Long)]
      .collect().toSet
    assert(got == Set(("AAPL", 250L), ("NEW", 50L)))
  }

  test("incrementalFilter on empty incoming batch yields empty (FIXTURES A5 empty fetch)") {
    val seen = Seq(("AAPL", 100L)).toDF("symbol", "t")
      .withColumn("ts", timestamp_seconds(col("t"))).drop("t")
    val empty = seen.where(lit(false))
    assert(StockOps.incrementalFilter(empty, seen, "symbol", "ts").isEmpty)
  }

  test("routeBySource splits history vs everything-else incl null (mongo_stream_etl.py:34)") {
    val df = Seq(Some("history"), Some("realtime"), Some("other"), None).toDF("source")
    val (h, r) = StockOps.routeBySource(df)
    assert(h.count() == 1 && r.count() == 3)
  }

  test("trainedOnly drops untrained symbols (predict_from_vm4.py:53-55)") {
    val data = Seq("AAPL", "MSFT", "NEW").toDF("symbol")
    val trained = Seq("AAPL", "MSFT").toDF("symbol")
    val got = StockOps.trainedOnly(data, trained, "symbol").as[String].collect().toSet
    assert(got == Set("AAPL", "MSFT"))
  }
}
