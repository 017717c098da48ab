package graft.timeseries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators the reference's `features_engineering.py` promises
  * by name but never implements (SURVEY.md §2.5): bar resampling, rolling
  * features, and stream alignment. All are single-shuffle-by-key designs —
  * at 100 TB the only shuffle is the hash partition on the series key, and
  * per-key work is a sorted window pass (Spark sorts within partitions,
  * spilling as needed; no per-key materialization except [[ema]]).
  */
object TimeSeries {

  /** Resample ticks into fixed-width OHLCV bars per key — the event-time
    * window the reference's streaming job was meant to produce
    * (`features_engineering.py:30-46` parses and prints but computes no
    * features). `orderCol` breaks ties deterministically (monotone ids).
    * Batch twin of `groupBy(window(ts, width), key)` — identical semantics
    * to the streaming version in graft.streaming. */
  def resampleBars(df: DataFrame, key: String, ts: String, value: String,
                   orderCol: String, width: String): DataFrame =
    df.groupBy(col(key), window(col(ts), width).as("w"))
      .agg(
        min_by(col(value), col(orderCol)).as("open"),
        max(col(value)).as("high"),
        min(col(value)).as("low"),
        max_by(col(value), col(orderCol)).as("close"),
        count(lit(1)).as("n_ticks"))
      .select(col(key), col("w.start").as("bar_start"), col("open"),
        col("high"), col("low"), col("close"), col("n_ticks"))

  /** Simple moving average over the last `n` rows per key. */
  def sma(df: DataFrame, key: String, orderCol: String, value: Column,
          n: Int, out: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol)).rowsBetween(-(n - 1), 0)
    df.withColumn(out, sum(value).over(w) / count(lit(1)).over(w))
  }

  /** Exponential moving average per key: e_t = α·v_t + (1−α)·e_{t−1},
    * seeded with the first value.
    *
    * EMA is inherently sequential per key, but nothing is materialized:
    * `groupByKey → flatMapSortedGroups` secondary-sorts within the single
    * key shuffle (Spark sorts partitions, spilling as needed) and the fold
    * streams the iterator — O(1) memory per key, any key cardinality or
    * series length. Keys group on their string form (works for symbol
    * strings and numeric ids alike) and the output key column is cast back
    * to the input key type. */
  def ema(df: DataFrame, key: String, orderCol: String, value: String,
          alpha: Double, out: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyType = df.schema(key).dataType
    val beta = 1.0 - alpha
    df.select(col(key).cast("string").as("k"),
        col(orderCol).cast("long").as("o"),
        col(value).cast("double").as("v"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapSortedGroups($"o") { (k: String, it: Iterator[(String, Long, Double)]) =>
        var e = 0.0
        var first = true
        it.map { case (_, o, v) =>
          e = if (first) { first = false; v } else alpha * v + beta * e
          (k, o, v, e)
        }
      }
      .toDF(key, orderCol, value, out)
      .withColumn(key, col(key).cast(keyType))
  }

  /** As-of join: for each left row, the latest right row of the same key
    * with `right.ts <= left.ts` (backward-looking alignment of two symbol
    * streams, SURVEY.md §2.3).
    *
    * Implementation is the union+last-window composition rather than a
    * cross/range join: one shuffle on `key`, one sorted window pass, O(n)
    * per partition — survives 100× scale-up where a per-key cross join
    * would not. Right rows sort before left rows at equal ts (<= semantics);
    * `rightOrder` breaks right-side ties.
    *
    * Right payload columns arrive nulled for left rows with no prior right
    * row (left-outer semantics). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, payload: Seq[String],
               rightOrder: String): DataFrame = {
    val pay = struct((payload :+ rightOrder).map(col): _*)
    val r2 = right.select(col(key), col(rightTs).as("__t"),
      col(rightOrder).as("__ro"), pay.as("__pay")).withColumn("__side", lit(0))
    val l2 = left.withColumn("__t", col(leftTs))
      .withColumn("__ro", lit(null).cast(r2.schema("__ro").dataType))
      .withColumn("__side", lit(1))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc, col("__ro").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = u.withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val withPayload = payload.foldLeft(joined) { (d, p) =>
      d.withColumn(p, col("__asof").getField(p))
    }
    withPayload.drop("__t", "__ro", "__side", "__pay", "__asof")
  }

  /** Forward as-of join: for each left row, the FIRST right row of the
    * same key with `right.ts >= left.ts` (ties on the right broken by min
    * `rightOrder`) — the label-generation shape: shift the left timestamp
    * by the label horizon BEFORE calling and the payload is "the first
    * observation at or after t + h", with no backward leakage by
    * construction. Same scale shape as [[asofJoin]]: one union, one key
    * shuffle, one sorted window pass — O(n) per partition. Left rows past
    * the last right observation keep null payloads (the un-labelable
    * tail a horizon split must drop — q125's purge, seen from the label
    * side). */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String, payload: Seq[String],
                  rightOrder: String): DataFrame = {
    val pay = struct((payload :+ rightOrder).map(col): _*)
    val r2 = right.select(col(key), col(rightTs).as("__t"),
      col(rightOrder).as("__ro"), pay.as("__pay")).withColumn("__side", lit(0))
    val l2 = left.withColumn("__t", col(leftTs))
      .withColumn("__ro", lit(null).cast(r2.schema("__ro").dataType))
      .withColumn("__side", lit(1))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    // DESCENDING time + the RUNNING frame: "first right with ts >= t" is
    // the last preceding right when rows walk from latest to earliest —
    // Spark evaluates unboundedPreceding..currentRow frames in O(n) per
    // partition, whereas a currentRow..unboundedFollowing `first`
    // (UnboundedFollowingWindowFunctionFrame) re-scans the tail per row,
    // O(n²) on a hot key. At equal ts, rights (side 0) sort before the
    // left so >= stays inclusive; among equal-ts rights the MIN
    // rightOrder must win, so rights order by __ro DESC (last = min).
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").desc, col("__side").asc, col("__ro").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = u.withColumn("__asof",
        last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val withPayload = payload.foldLeft(joined) { (d, p) =>
      d.withColumn(p, col("__asof").getField(p))
    }
    withPayload.drop("__t", "__ro", "__side", "__pay", "__asof")
  }

  /** Nearest-as-of join: for each left row, the right row of the same key
    * whose timestamp is CLOSEST to the left timestamp within `toleranceUs`
    * microseconds, looking both directions (sensor/stream alignment where
    * the match may arrive just after). Ties prefer the backward match;
    * ties within a direction break on `rightOrder` (max for backward —
    * "latest wins" — min for forward).
    *
    * Same scale shape as [[asofJoin]]: one union, one shuffle on `key`,
    * two sorted window passes (backward last / forward first) instead of a
    * per-key range join — O(n) per partition at any tolerance, where the
    * naive pairs-within-tolerance join degrades with key×window density.
    * Left rows with no right row in tolerance keep null payloads
    * (left-outer semantics). */
  def asofNearest(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String, payload: Seq[String],
                  rightOrder: String, toleranceUs: Long): DataFrame = {
    val pay = struct((payload :+ rightOrder).map(col) :+
      col(rightTs).as("__rt"): _*)
    val r2 = right.select(col(key), col(rightTs).as("__t"),
      col(rightOrder).as("__ro"), pay.as("__pay")).withColumn("__side", lit(0))
    val l2 = left.withColumn("__t", col(leftTs))
      .withColumn("__ro", lit(null).cast(r2.schema("__ro").dataType))
      .withColumn("__side", lit(1))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    // Rights sort before lefts at equal ts, so the backward window already
    // owns the delta-0 match; the forward window then only sees t > leftTs.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc, col("__ro").asc_nulls_last)
    val back = last(col("__pay"), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val fwd = first(col("__pay"), ignoreNulls = true)
      .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val lt = unix_micros(col(leftTs))
    val db = lt - unix_micros(col("__back").getField("__rt"))
    val df = unix_micros(col("__fwd").getField("__rt")) - lt
    val backOk = col("__back").isNotNull && db <= toleranceUs
    val fwdOk = col("__fwd").isNotNull && df <= toleranceUs
    val useBack = backOk && (!fwdOk || db <= df)
    val chosen = u.withColumn("__back", back).withColumn("__fwd", fwd)
      .where(col("__side") === 1)
      .withColumn("__pick",
        when(useBack, col("__back")).when(fwdOk, col("__fwd")))
      .withColumn("delta_us",
        when(useBack, db).when(fwdOk, df).cast("long"))
      .withColumn("direction",
        when(useBack, lit("backward")).when(fwdOk, lit("forward")))
    val withPayload = (payload :+ rightOrder).foldLeft(chosen) { (d, p) =>
      d.withColumn(p, col("__pick").getField(p))
    }
    withPayload.drop("__t", "__ro", "__side", "__pay", "__back", "__fwd", "__pick")
  }

  /** Range join: all (left, right) pairs of the same key whose timestamps
    * fall within `tolerance`. Spark plans this as a key-equi join with a
    * range residual — the equi part shuffles/broadcasts as usual and the
    * residual filters pairs, so skew is bounded by per-key×window density. */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftTs: String, rightTs: String, tolerance: String): DataFrame = {
    // The key is renamed on the right rather than referenced as
    // `right(key)`: when both inputs derive from the same scan (the
    // common self-join case), df(col) yields the SAME attribute on both
    // sides and only Spark's dataset-id disambiguation saves the join
    // from becoming trivially true. `leftTs` and `rightTs` must be
    // distinct column names.
    require(leftTs != rightTs, "rangeJoin needs distinct ts column names")
    val r2 = right.withColumnRenamed(key, "__rjk")
    left.join(r2,
      col(key) === col("__rjk") &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $tolerance") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $tolerance"))
      .drop("__rjk")
  }
}
