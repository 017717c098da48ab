package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.timeseries.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ema: seeded with first value, then alpha-blended") {
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0), (2L, 1L, 5.0))
      .toDF("k", "o", "v")
    val got = TimeSeries.ema(df, "k", "o", "v", alpha = 0.5, out = "ema")
      .orderBy("k", "o").select("ema").as[Double].collect()
    // k=1: 10, 0.5*20+0.5*10=15, 0.5*30+0.5*15=22.5 ; k=2: 5
    assert(got.toSeq == Seq(10.0, 15.0, 22.5, 5.0))
  }

  test("asofJoin: picks latest right <= left ts per key, null when none") {
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (2L, 50L, "l3"))
      .toDF("k", "t", "tag").withColumn("ts", timestamp_seconds(col("t")))
    val right = Seq((1L, 90L, 9.0, 1L), (1L, 150L, 15.0, 2L), (1L, 200L, 20.0, 3L))
      .toDF("k", "t", "payload", "rid").withColumn("ts", timestamp_seconds(col("t")))
    val got = TimeSeries.asofJoin(left, right, "k", "ts", "ts",
        payload = Seq("payload"), rightOrder = "rid")
      .select(col("tag"), col("payload")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // l1@100 → right@90; l2@200 → right@200 (<= semantics); l3 key 2 → none
    assert(got == Map("l1" -> Some(9.0), "l2" -> Some(20.0), "l3" -> None))
  }

  test("asofNearest: closest within tolerance either way, backward wins ties") {
    val left = Seq((1L, 100L, "back"), (1L, 200L, "fwd"), (1L, 300L, "tie"),
        (1L, 400L, "far"), (2L, 50L, "nokey"))
      .toDF("k", "t", "tag").withColumn("ts", timestamp_seconds(col("t")))
    val right = Seq(
        (1L, 95L, 1.0, 1L),   // 5s before "back" (fwd candidate is 9s away)
        (1L, 209L, 2.0, 2L),  // 9s after "fwd" (back candidate is 105s away)
        (1L, 290L, 3.0, 3L),  // 10s before "tie"
        (1L, 310L, 4.0, 4L))  // 10s after "tie" — backward must win
      .toDF("k", "rt", "payload", "rid")
      .withColumn("rts", timestamp_seconds(col("rt")))
    val got = TimeSeries.asofNearest(left, right, "k", "ts", "rts",
        payload = Seq("payload"), rightOrder = "rid", toleranceUs = 60L * 1000000)
      .select(col("tag"), col("rid"), col("direction")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getString(2))))).toMap
    assert(got == Map(
      "back" -> Some((1L, "backward")),
      "fwd" -> Some((2L, "forward")),
      "tie" -> Some((3L, "backward")),
      "far" -> None,     // nearest right is 90s away > 60s tolerance
      "nokey" -> None))  // no rights for key 2
  }

  test("sma over last-n window") {
    val df = Seq((1L, 1L, 2.0), (1L, 2L, 4.0), (1L, 3L, 6.0)).toDF("k", "o", "v")
    val got = TimeSeries.sma(df, "k", "o", col("v"), n = 2, out = "s")
      .orderBy("o").select("s").as[Double].collect()
    assert(got.toSeq == Seq(2.0, 3.0, 5.0))
  }

  test("resampleBars: OHLC by first/last order within the window") {
    val df = Seq(
      ("A", 10L, 1L, 5.0), ("A", 20L, 2L, 9.0), ("A", 30L, 3L, 1.0),
      ("A", 3700L, 4L, 7.0))
      .toDF("k", "t", "oid", "v").withColumn("ts", timestamp_seconds(col("t")))
    val got = TimeSeries.resampleBars(df, "k", "ts", "v", "oid", "1 hour")
      .orderBy("bar_start")
      .select("open", "high", "low", "close", "n_ticks")
      .as[(Double, Double, Double, Double, Long)].collect()
    assert(got.toSeq == Seq((5.0, 9.0, 1.0, 1.0, 3L), (7.0, 7.0, 7.0, 7.0, 1L)))
  }

  test("rangeJoin pairs within tolerance only") {
    val l = Seq((1L, 1000L, "a")).toDF("k", "t", "ltag")
      .withColumn("ts", timestamp_seconds(col("t")))
    val r = Seq((1L, 1500L, "near"), (1L, 5000L, "far")).toDF("k", "rt", "rtag")
      .withColumn("rts", timestamp_seconds(col("rt")))
    val got = TimeSeries.rangeJoin(l, r, "k", "ts", "rts", "10 MINUTES")
      .select("rtag").as[String].collect()
    assert(got.toSeq == Seq("near"))
  }

  test("asofForward: first right >= left ts inclusive, min-order ties, null tail") {
    val left = Seq((1L, 100L, "l1"), (1L, 150L, "l2"), (1L, 300L, "l3"))
      .toDF("k", "t", "tag").withColumn("ts", timestamp_seconds(col("t")))
    val right = Seq((1L, 150L, 15.0, 2L), (1L, 200L, 20.0, 1L), (1L, 200L, 21.0, 3L))
      .toDF("k", "rt", "payload", "rid").withColumn("rts", timestamp_seconds(col("rt")))
    val got = TimeSeries.asofForward(left, right, "k", "ts", "rts",
        payload = Seq("payload"), rightOrder = "rid")
      .select(col("tag"), col("payload")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // l1@100 → right@150; l2@150 → right@150 (inclusive >=);
    // l3@300 → none (past the last right)
    assert(got == Map("l1" -> Some(15.0), "l2" -> Some(15.0), "l3" -> None), got)
    // tie at rts=200: min rid wins
    val tie = TimeSeries.asofForward(
        Seq((1L, 180L, "x")).toDF("k", "t", "tag")
          .withColumn("ts", timestamp_seconds(col("t"))),
        right, "k", "ts", "rts", Seq("payload"), "rid")
      .select("payload").as[Double].collect()
    assert(tie.toSeq == Seq(20.0), s"tie broke to ${tie.toSeq}")
  }

  test("indicators: RSI pins to 100/0 on monotone series, null before n moves") {
    import graft.timeseries.Indicators
    import org.apache.spark.sql.expressions.Window
    val up = (1L to 20L).map(i => (1L, i, 100L + i))
    val dn = (1L to 20L).map(i => (2L, i, 100L - i))
    val df = (up ++ dn).toDF("k", "o", "c")
    val byKey = Window.partitionBy("k").orderBy("o")
    val got = df.select(col("k"), col("o"),
        Indicators.rsi(col("c"), byKey, byKey.rowsBetween(-13, 0), 14).as("rsi"))
      .orderBy("k", "o").collect()
    got.foreach { r =>
      val (k, o) = (r.getLong(0), r.getLong(1))
      if (o < 15) assert(r.isNullAt(2), s"row $k/$o should be null")
      else assert(r.getDouble(2) == (if (k == 1L) 100.0 else 0.0), s"row $k/$o")
    }
  }

  test("indicators: Bollinger collapses to the mean on a constant series") {
    import graft.timeseries.Indicators
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 25L).map(i => (1L, i, 4200L)).toDF("k", "o", "c")
    val w = Window.partitionBy("k").orderBy("o").rowsBetween(-19, 0)
    val (mid, sd, upC, loC) = Indicators.bollinger(col("c"), w, 20, 2)
    val r = df.select(mid.as("m"), sd.as("s"), upC.as("u"), loC.as("l"))
      .orderBy(col("o").desc).limit(1).collect().head
    assert(r.getDouble(0) == 42.0 && r.getDouble(1) == 0.0 &&
      r.getDouble(2) == 42.0 && r.getDouble(3) == 42.0)
  }

  test("indicators: anomalyFlag fires on a spike, not on its flat baseline") {
    import graft.timeseries.Indicators
    import org.apache.spark.sql.expressions.Window
    // 10-row trailing frame: 12 flat ticks at 100, then a spike to 200,
    // then flat again — only the spike row clears 3σ (baseline σ = 0)
    val rows = (1L to 12L).map(i => (1L, i, 100L)) ++
      Seq((1L, 13L, 200L)) ++ (14L to 16L).map(i => (1L, i, 100L))
    val w = Window.partitionBy("k").orderBy("o").rowsBetween(-10, -1)
    val got = rows.toDF("k", "o", "c")
      .withColumn("a", Indicators.anomalyFlag(col("c"), w, 10, 3))
      .where(col("a")).select("o").as[Long].collect().toSet
    // 13 spikes; 14-16 do NOT: their trailing window contains the spike,
    // inflating σ enough that a return to 100 is within 3σ
    assert(got == Set(13L), s"flagged $got")
  }

  test("indicators: rollingBeta recovers an exact linear slope") {
    import graft.timeseries.Indicators
    import org.apache.spark.sql.expressions.Window
    // y = 3x + 7 exactly → beta = 3 once the 30-row frame fills
    val df = (1L to 40L).map(i => (1L, i, i * 10L, i * 30L + 7L))
      .toDF("k", "o", "x", "y")
    val w = Window.partitionBy("k").orderBy("o").rowsBetween(-29, 0)
    val got = df.select(col("o"),
        Indicators.rollingBeta(col("y"), col("x"), w, 30).as("b"))
      .orderBy("o").collect()
    got.foreach { r =>
      if (r.getLong(0) < 30) assert(r.isNullAt(1))
      else assert(r.getDouble(1) == 3.0, s"row ${r.getLong(0)}")
    }
  }
}
