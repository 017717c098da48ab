package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.timeseries.Indicators
import graft.tables.Tables

/** Feature-engineering queries for the reference's ML leg: the technical
  * indicators its trend model consumes (`ml_model/predict_from_vm4.py`
  * reads close-price history; `dashboard/plot_utils.py:12-40` charts
  * SMA/price overlays) and the leakage-safe time-series split its
  * train/predict boundary implies. All window math is exact-integer-sum
  * (see [[graft.timeseries.Indicators]]) so every query carries a full
  * DuckDB oracle. */
object FinanceQueries extends QueryPack {

  /** q124: Bollinger(20, 2σ) + Cutler RSI(14) per symbol — one key
    * shuffle + one sort, both indicators ride the SAME sorted window
    * pass (two ROWS frames over one partitionBy/orderBy, so Spark plans
    * a single Window node — no second exchange). */
  private def techIndicators(spark: SparkSession, dir: String): DataFrame = {
    val byKey = Window.partitionBy("user_id").orderBy("event_id")
    val w20 = byKey.rowsBetween(-19, 0)
    val w14 = byKey.rowsBetween(-13, 0)
    val src = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val (mid, sd, up, lo) = Indicators.bollinger(col("cents"), w20, 20, 2)
    // one select, not chained withColumn: the repeated window expressions
    // inside up/lo are structurally identical to mid/sd, so
    // ExtractWindowExpressions dedups them into one Window node per frame
    // — all riding a single exchange + sort.
    src.select(col("user_id"), col("event_id"), col("cents"),
        mid.as("boll_mid"), sd.as("boll_sd"),
        up.as("boll_up"), lo.as("boll_lo"),
        Indicators.rsi(col("cents"), byKey, w14, 14).as("rsi14"))
      .orderBy("user_id", "event_id")
  }

  /** q125: leakage-safe time-series split — the boundary the reference
    * implicitly draws between its training history and live prediction
    * (`predict_from_vm4.py` scores ticks after the model's train range).
    * Rows whose LABEL horizon (24 h forward return) crosses the cutoff
    * are PURGED (their label peeks across the boundary), and an embargo
    * gap after the cutoff is dropped so serial correlation can't leak
    * backward (the purged-CV shape from the financial-ML literature).
    * Pure map-side classification + one small aggregate — no shuffle
    * grows with symbols. */
  private def purgedSplit(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-20").cast("timestamp")
    val split =
      when(col("ts") + expr("INTERVAL 24 HOURS") <= cutoff, "train")
        .when(col("ts") <= cutoff, "purged")
        .when(col("ts") <= cutoff + expr("INTERVAL 48 HOURS"), "embargo")
        .otherwise("test")
    Tables.events(spark, dir)
      .withColumn("split", split)
      .groupBy("split")
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("user_id")).as("n_symbols"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts_str"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts_str"))
      .orderBy("split")
  }

  /** q126: rolling 30-bar beta of each symbol's hourly close against the
    * market composite (sum of all symbols' closes that hour, in exact
    * cents). ONE raw scan: hourly bars (one key shuffle on the full
    * data), then the composite as a window over the BARS — a join-free
    * formulation (a market-side self-aggregate would scan the raw events
    * twice); every post-scan stage moves bar-sized data (symbols ×
    * hours), not the tick corpus. Finally the per-symbol sorted window
    * derives beta from exact int64 sums. */
  /** q227: classical additive seasonal decomposition (moving-average
    * method) of the per-type daily flow — value = trend + seasonal +
    * residual, the series screen run before any forecasting. ALL
    * INTEGER via common-denominator scaling: trend×7 is the centered
    * 7-day window SUM (full windows only), dev7 = 7·value − trend×7,
    * the weekday seasonal rides as its (Σdev7, n) pair, and the
    * residual is dev7·n − Σdev7 — no division anywhere, which matters
    * doubly because Spark's DIV truncates toward zero while DuckDB's
    * // floors (they diverge exactly on the negative deviations this
    * query produces). One shuffle to daily keys, one sorted window
    * pass, one weekday-sized aggregate broadcast back. */
  private def seasonalDecomposition(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
      .withColumn("dn", datediff(col("day"), lit("1970-01-01").cast("date")))
    // RANGE on the day NUMBER, not ROWS on the day sequence: with a
    // calendar gap a 7-ROW frame would silently span >7 days while
    // n7 = 7 still passed; the RANGE frame keeps the window calendar-
    // true and n7 = 7 then certifies all 7 days are present
    val w7 = Window.partitionBy("event_type").orderBy("dn")
      .rangeBetween(-3, 3)
    val t = daily
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("trend_x7", sum(col("v")).over(w7))
      .where(col("n7") === 7)
      .withColumn("dev7", col("v") * 7 - col("trend_x7"))
      .withColumn("wd", dayofweek(col("day")).cast("long"))
    val seas = t.groupBy("event_type", "wd")
      .agg(sum(col("dev7")).as("ssum7"), count(lit(1)).as("sn"))
    t.join(seas, Seq("event_type", "wd"))
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day_str"),
        col("v"), col("trend_x7"), col("dev7"), col("wd"),
        col("sn"), col("ssum7"),
        (col("dev7") * col("sn") - col("ssum7")).as("resid_sc"))
      .orderBy("event_type", "day_str")
  }

  /** q228: lead–lag cross-correlation — Pearson r between the click
    * and purchase daily flows at lags −2..+2 days, the signal-timing
    * scan a quant pipeline runs to find which series LEADS (max |r| at
    * a nonzero lag ⇒ predictive offset). Per lag: one date-shifted
    * equi-join pairs the days, then five exact int64 sums (Σx, Σy,
    * Σxy, Σx², Σy²) feed the textbook r = (nΣxy − ΣxΣy) /
    * (√(nΣx²−Σx²)·√(nΣy²−Σy²)) with the q174 float discipline — the
    * only float steps are two IEEE sqrts, one multiply, one divide,
    * quantized to micro-units. The 5-row lag frame explodes from a
    * literal array; everything else is one aggregation per lag over
    * day-keyed joins — no windows, no collects. */
  private def leadLagCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables.events(spark, dir)
      .select(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"),
        round(col("value") * 100).cast("long").as("c"))
    def series(t: String) = cents.where(col("event_type") === t)
      .groupBy("day").agg(sum(col("c")).as("v"))
    val x = series("click").select(col("day").as("xday"), col("v").as("x"))
    val y = series("purchase").select(col("day").as("yday"), col("v").as("y"))
    x.crossJoin(spark.range(1).select(explode(
        array((-2 to 2).map(l => lit(l)): _*)).as("lag")))
      .withColumn("yday", expr("date_add(xday, lag)"))
      .join(y, Seq("yday"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("dxx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("dyy", col("n") * col("syy") - col("sy") * col("sy"))
      // a zero-variance series at some lag (dxx or dyy == 0) would make
      // the divide NaN and the ANSI cast throw; null the lag instead
      .withColumn("r_micro",
        when(col("dxx") > 0 && col("dyy") > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            * 1e6 /
            (sqrt(col("dxx").cast("double")) * sqrt(col("dyy").cast("double"))))
            .cast("long")))
      .select(col("lag").cast("long").as("lag"), col("n"), col("r_micro"))
      .orderBy("lag")
  }

  private def rollingBeta(spark: SparkSession, dir: String): DataFrame = {
    val bars = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hour"),
        col("event_id"), round(col("value") * 100).cast("long").as("cents"))
      .groupBy("user_id", "hour")
      .agg(max_by(col("cents"), col("event_id")).as("close_c"))
    val wH = Window.partitionBy("hour")
    val w30 = Window.partitionBy("user_id").orderBy("hour").rowsBetween(-29, 0)
    bars
      .select(col("user_id"), col("hour"), col("close_c"),
        sum("close_c").over(wH).as("mkt_c"),
        count(lit(1)).over(wH).as("n_sym"))
      .withColumn("beta30",
        Indicators.rollingBeta(col("close_c"), col("mkt_c"), w30, 30))
      .select(col("user_id"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour_str"),
        col("close_c"), col("mkt_c"), col("n_sym"), col("beta30"))
      .orderBy("user_id", "hour_str")
  }

  /** q131: rolling z-score anomaly gate — ticks deviating more than 3σ
    * from their own TRAILING 50-tick baseline (current tick excluded, so
    * a spike can't normalize itself). The gate is division-free int64
    * arithmetic (see [[Indicators.anomalyFlag]]): no float epsilon, no
    * accumulation order, bit-portable to the oracle. One key shuffle +
    * one window pass; emits only the flagged ticks, so output is
    * anomaly-sized, not corpus-sized. */
  private def anomalyFlags(spark: SparkSession, dir: String): DataFrame = {
    val w50 = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(-50, -1)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("is_anomaly",
        Indicators.anomalyFlag(col("cents"), w50, 50, 3))
      .where(col("is_anomaly"))
      .select("user_id", "event_id", "cents")
      .orderBy("user_id", "event_id")
  }

  /** q234: tabular CUSUM changepoint detection (Page 1954, "Continuous
    * inspection schemes" — public algorithm), INTEGER-EXACT — the
    * regime-change signal the quant-curation pack (q131 spike anomaly,
    * q227 seasonal, q228 lead-lag) lacked: a spike detector flags
    * single outliers, CUSUM accumulates small persistent drifts.
    *
    * Two-sided scheme over integer cents, everything scaled by the
    * per-key count n so no division ever happens (the q227
    * common-denominator discipline): with reference μ = Sx/n, allowance
    * k = 25¢ and threshold h = 400¢,
    *   d⁺_i = n·x_i − Sx − n·k  (n·(x_i − μ − k), exact int64)
    * and the recursion S⁺_i = max(0, S⁺_{i-1} + d⁺_i) is REPLAYED
    * CLOSED-FORM as a running-min window over the prefix sum:
    * S_i = P_i − min(0, min_{j≤i} P_j) — the textbook max-recursion ↔
    * prefix-extrema identity, which is what makes a recursive filter
    * oracle-expressible in one window pass (and shuffle-once at scale:
    * both sides ride the SAME key-sorted window, no self-joins, no
    * iteration). Output is the key-sized alarm summary. */
  /** Per-row n-scaled two-sided CUSUM sums over (user_id, event_id,
    * cents): adds n, su, sd (each = n·S_i of the textbook recursion).
    * `private[graft]` so the spec can drive an injected-shift series
    * through the SAME expressions the query runs. */
  private[graft] def cusumSums(src: DataFrame, kAllow: Long): DataFrame = {
    val wAll = Window.partitionBy("user_id")
    val wRun = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    src
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("sx", sum("cents").over(wAll))
      .withColumn("pu", sum(col("n") * col("cents") - col("sx")
        - col("n") * lit(kAllow)).over(wRun))
      .withColumn("pd", sum(col("sx") - col("n") * col("cents")
        - col("n") * lit(kAllow)).over(wRun))
      .withColumn("su", col("pu") - least(lit(0L), min("pu").over(wRun)))
      .withColumn("sd", col("pd") - least(lit(0L), min("pd").over(wRun)))
  }

  private def cusumChangepoints(spark: SparkSession, dir: String): DataFrame = {
    val hThresh = 400L
    cusumSums(Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents")),
        kAllow = 25L)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_ticks"),
        max("su").as("max_su"), max("sd").as("max_sd"),
        sum(when(col("su") > col("n") * lit(hThresh), 1L).otherwise(0L))
          .as("n_up_alarms"),
        sum(when(col("sd") > col("n") * lit(hThresh), 1L).otherwise(0L))
          .as("n_dn_alarms"),
        min(when(col("su") > col("n") * lit(hThresh), col("event_id")))
          .as("first_up_event"),
        min(when(col("sd") > col("n") * lit(hThresh), col("event_id")))
          .as("first_dn_event"))
      .orderBy("user_id")
  }

  /** q140: calendar-grid gap fill — every symbol's hourly series
    * completed onto its own [min, max] hour grid, missing bars
    * forward-filled from the last observation, plus gaps-and-islands
    * stats (longest consecutive gap run — the classic islands trick: the
    * island id is the running count of NON-gaps, so one sorted window
    * pass labels every run). The shape data-completion takes before a
    * model trains on "regular" series: grid size is keys × calendar
    * (never corpus rows), the fill is one key-sorted window, and the
    * run-length stats ride the same sort. Aggregated per symbol so the
    * result is key-sized. */
  private def gapFfill(spark: SparkSession, dir: String): DataFrame = {
    val bars = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hour"),
        col("event_id"), round(col("value") * 100).cast("long").as("cents"))
      .groupBy("user_id", "hour")
      .agg(max_by(col("cents"), col("event_id")).as("close_c"))
    val grid = bars.groupBy("user_id")
      .agg(min("hour").as("h0"), max("hour").as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR")))
          .as("hour"))
    val w = Window.partitionBy("user_id").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = grid.join(bars, Seq("user_id", "hour"), "left")
      .withColumn("filled_c", last("close_c", ignoreNulls = true).over(w))
      .withColumn("isl", count("close_c").over(w))
    val runs = filled.where(col("close_c").isNull)
      .groupBy("user_id", "isl").agg(count(lit(1)).as("run_len"))
      .groupBy("user_id").agg(max("run_len").as("max_gap_run"))
    filled.groupBy("user_id")
      .agg(count(lit(1)).as("n_hours"),
        count("close_c").as("n_bars"),
        sum(when(col("close_c").isNull, 1L).otherwise(0L)).as("n_gaps"),
        sum("filled_c").as("sum_filled_c"))
      .join(runs, Seq("user_id"), "left")
      .withColumn("max_gap_run", coalesce(col("max_gap_run"), lit(0L)))
      .orderBy("user_id")
  }

  /** q259: LINEAR-INTERPOLATION gap fill — the lerp twin of q140's
    * forward fill: a missing hourly bar gets the straight line between
    * its bracketing known bars, the imputation an ML feature pipeline
    * prefers when a series drifts (ffill injects a step artifact at
    * every gap; lerp spreads the move). Segment form, not an
    * ignore-nulls scan: each known bar pairs with its NEXT known bar
    * via one `lead` (per-key ordered window, the q15 shape), segments
    * with interior hours explode ONLY the gap hours, and the
    * interpolant is exact integer arithmetic —
    * v₀ + (v₁−v₀)(h−h₀) div (h₁−h₀), truncating toward zero in both
    * engines (verified: Spark `div` and DuckDB `//` agree on negative
    * numerators, so falling segments round identically). Boundary
    * hours are always known (the spine spans min..max known bars), so
    * every gap has both brackets by construction. Output is per-user:
    * spine length, known bars, gap count, the lerped total, and a
    * position-weighted checksum Σ interp·(h−h₀) that pins WHERE in
    * each gap every value landed (a sum alone can't).
    *
    * Scale shape: one per-key window + an explode bounded by gap
    * length (never spine length) + map-side-combinable rollups; no
    * global sort, no grid join — at 100 TB the dense-spine grid of
    * q140 is the expensive half, and this variant skips it entirely
    * for the interpolation path. */
  private def gapLerp(spark: SparkSession, dir: String): DataFrame = {
    val bars = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hour"),
        col("event_id"), round(col("value") * 100).cast("long").as("cents"))
      .groupBy("user_id", "hour")
      .agg(max_by(col("cents"), col("event_id")).as("close_c"))
      .withColumn("hidx", expr("CAST(hour AS LONG) div 3600"))
    val wU = Window.partitionBy("user_id").orderBy("hidx")
    val seg = bars
      .withColumn("nx_h", lead("hidx", 1).over(wU))
      .withColumn("nx_c", lead("close_c", 1).over(wU))
      .where(col("nx_h").isNotNull && col("nx_h") > col("hidx") + 1)
    val gapRows = seg.select(col("user_id"), col("hidx").as("h0"),
        col("close_c").as("v0"), col("nx_h").as("h1"), col("nx_c").as("v1"),
        explode(sequence(col("hidx") + 1, col("nx_h") - 1)).as("h"))
      .withColumn("interp_c",
        expr("v0 + ((v1 - v0) * (h - h0)) div (h1 - h0)"))
    val gapAgg = gapRows.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sum("interp_c").as("gap_sum"),
        sum(col("interp_c") * (col("h") - col("h0"))).as("gap_chk"))
    val barAgg = bars.groupBy("user_id")
      .agg(count(lit(1)).as("n_bars"), sum("close_c").as("bar_sum"),
        (max("hidx") - min("hidx") + 1).as("n_hours"))
    barAgg.join(gapAgg, Seq("user_id"), "left")
      .select(col("user_id"), col("n_hours"), col("n_bars"),
        coalesce(col("n_gaps"), lit(0L)).as("n_gaps"),
        (col("bar_sum") + coalesce(col("gap_sum"), lit(0L)))
          .as("sum_interp_c"),
        coalesce(col("gap_chk"), lit(0L)).as("gap_chk"))
      .orderBy("user_id")
  }

  /** q269: MANN–KENDALL TREND TEST over the daily revenue series — the
    * nonparametric twin of q248's OLS trend (Mann 1945, Kendall's S):
    * is the series monotonically trending, judged by sign agreements
    * alone, immune to outliers and any monotone transform. S =
    * Σ_{i<j} sign(x_j − x_i) over the DAY domain (calendar-bounded —
    * the pair stage is a broadcast nested loop over ~2.4k daily rows
    * at ANY corpus size, the q265 domain-bounded discipline);
    * Var(S)·18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) with the exact tie
    * correction; the statistic is the signed square z² = 18·S²/Var·18
    * in micro (decimal/HUGEINT-widened numerator — S² alone reaches
    * 10¹³), compared against χ²₁'s 95% critical value as an exact
    * integer to emit the trend verdict. Zero variance (all-equal
    * series) short-circuits to 0 on both engines. */
  private def mannKendall(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    val p = daily.as("a")
      .join(broadcast(daily.as("b")), col("a.d") < col("b.d"))
      .select(signum(col("b.x") - col("a.x")).cast("long").as("sgn"))
    val sAgg = p.agg(count(lit(1)).as("n0"), sum("sgn").as("s"),
      sum(when(col("sgn") === 0, 1L).otherwise(0L)).as("tie_pairs"))
    val ties = daily.groupBy("x").agg(count(lit(1)).as("t"))
      .where(col("t") > 1)
      .agg(coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L))
        .as("tie18"))
    val n = daily.agg(count(lit(1)).as("n"))
    sAgg.crossJoin(broadcast(n)).crossJoin(broadcast(ties))
      .withColumn("var18", expr("n * (n - 1) * (2 * n + 5) - tie18"))
      .select(col("n").as("n_days"), col("n0"), col("s"), col("tie_pairs"),
        col("var18"),
        expr("CASE WHEN var18 = 0 THEN CAST(0 AS BIGINT) " +
          "WHEN s >= 0 THEN " +
          "(CAST(18000000 AS DECIMAL(38,0)) * s * s) div var18 " +
          "ELSE -((CAST(18000000 AS DECIMAL(38,0)) * s * s) div var18) " +
          "END").as("z2_signed_micro"))
      .withColumn("trend",
        expr("CASE WHEN abs(z2_signed_micro) < 3841459 THEN 'none' " +
          "WHEN z2_signed_micro > 0 THEN 'up' ELSE 'down' END"))
  }

  /** q270: FORECAST BACKTEST with MASE — the evaluation half of the
    * forecasting tier (q248 fits a trend, q269 tests for one, this
    * scores a forecaster): the seasonal-naive-7 model (predict today =
    * same weekday last week) backtested against the one-step naive
    * baseline (predict today = yesterday) over the daily revenue
    * series, graded by Hyndman's MASE = MAE(model)/MAE(naive) — the
    * scale-free forecast metric that never divides by a near-zero
    * actual (the MAPE failure mode). Both error sums are exact integer
    * cents via two `lag`s over the calendar-bounded day domain; MASE
    * and both MAEs publish as micro-unit truncating ratios (squared
    * errors are deliberately NOT shipped — daily-cent e² sums brush
    * int64 and ANSI Spark would throw; MAE is the MASE ingredient
    * anyway). Scored only on days where BOTH lags exist, so the two
    * MAEs cover the identical day set.
    *
    * Scale shape: one corpus pass to the day frame, one ordered window
    * over ~2.4k daily rows at ANY corpus size, one 1-row rollup. */
  private def forecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    val w = Window.orderBy("d")
    val scored = daily
      .withColumn("f1", lag("x", 1).over(w))
      .withColumn("f7", lag("x", 7).over(w))
      .where(col("f1").isNotNull && col("f7").isNotNull)
      .select(abs(col("x") - col("f1")).as("e1"),
        abs(col("x") - col("f7")).as("e7"))
    scored.agg(count(lit(1)).as("n_scored"),
        sum("e1").as("sae_naive1"), sum("e7").as("sae_seasonal7"))
      .select(col("n_scored"),
        expr("sae_naive1 div n_scored").as("mae_naive1_c"),
        expr("sae_seasonal7 div n_scored").as("mae_seasonal7_c"),
        expr("CASE WHEN sae_naive1 = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (1000000 * sae_seasonal7) div sae_naive1 END")
          .as("mase_micro"))
  }

  /** q144: forward-label generation — for every tick, the close at the
    * FIRST observation ≥ 24 h ahead ([[graft.timeseries.TimeSeries
    * .asofForward]] on the horizon-shifted timestamp), the label the
    * reference's trend model trains against (predicting movement IS
    * predicting this forward return; its wire label F5 is the same sign
    * taken backward). No leakage by construction: the label reads only
    * t ≥ t+24h, and the un-labelable tail (no observation that far
    * ahead) stays null — exactly the rows q125's purge drops. One key
    * shuffle + one sorted window; per-symbol label-balance aggregate
    * keeps the output key-sized. */
  private def forwardLabels(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
    val left = src.withColumn("target_ts",
      col("ts") + expr("INTERVAL 24 HOURS"))
    val labeled = graft.timeseries.TimeSeries.asofForward(
      left, src.withColumnRenamed("cents", "label_c"),
      key = "user_id", leftTs = "target_ts", rightTs = "ts",
      payload = Seq("label_c"), rightOrder = "event_id")
    labeled.groupBy("user_id")
      .agg(count(lit(1)).as("n_ticks"),
        count("label_c").as("n_labeled"),
        sum(when(col("label_c") > col("cents"), 1L).otherwise(0L)).as("n_up"),
        sum(when(col("label_c") < col("cents"), 1L).otherwise(0L)).as("n_down"),
        sum(when(col("label_c") === col("cents"), 1L).otherwise(0L)).as("n_flat"),
        sum("label_c").as("sum_label_c"))
      .orderBy("user_id")
  }

  /** q147: candlestick pattern detection — daily OHLC bars per symbol
    * (open/close by first/last tick order, the q27 resample shape), then
    * the classic pattern predicates as pure integer-cents comparisons
    * over a lag window: doji (body ≤ 10% of range), bullish/bearish
    * engulfing (opposite-color bar whose body contains yesterday's),
    * hammer (long lower shadow, short upper). The visual vocabulary of
    * the reference's dashboard leg (`dashboard/plot_utils.py` — a stub
    * there; real here), as data: one key shuffle for the bars, one
    * sorted window, a per-symbol pattern census. Integer predicates —
    * no float thresholds to diverge on. */
  private def candlestickPatterns(spark: SparkSession, dir: String): DataFrame = {
    val bars = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_id"), round(col("value") * 100).cast("long").as("cents"))
      .groupBy("user_id", "day")
      .agg(min_by(col("cents"), col("event_id")).as("open_c"),
        max("cents").as("high_c"), min("cents").as("low_c"),
        max_by(col("cents"), col("event_id")).as("close_c"))
    val w = Window.partitionBy("user_id").orderBy("day")
    val body = abs(col("close_c") - col("open_c"))
    val flagged = bars
      .withColumn("p_open", lag("open_c", 1).over(w))
      .withColumn("p_close", lag("close_c", 1).over(w))
      .withColumn("doji",
        body * 10 <= col("high_c") - col("low_c") &&
          col("high_c") > col("low_c"))
      .withColumn("bull_engulf",
        col("p_close") < col("p_open") && col("close_c") > col("open_c") &&
          col("open_c") <= col("p_close") && col("close_c") >= col("p_open"))
      .withColumn("bear_engulf",
        col("p_close") > col("p_open") && col("close_c") < col("open_c") &&
          col("open_c") >= col("p_close") && col("close_c") <= col("p_open"))
      .withColumn("hammer",
        least(col("open_c"), col("close_c")) - col("low_c") >= body * 2 &&
          col("high_c") - greatest(col("open_c"), col("close_c")) <= body)
    flagged.groupBy("user_id")
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("doji"), 1L).otherwise(0L)).as("n_doji"),
        sum(when(col("bull_engulf"), 1L).otherwise(0L)).as("n_bull_engulf"),
        sum(when(col("bear_engulf"), 1L).otherwise(0L)).as("n_bear_engulf"),
        sum(when(col("hammer"), 1L).otherwise(0L)).as("n_hammer"))
      .orderBy("user_id")
  }

  /** q248: per-(symbol, user) ORDINARY-LEAST-SQUARES trend line — the
    * reference's "stock trend" (`ml_model/predict_from_vm4.py` learns an
    * up/down signal from OHLCV history) as a CLOSED-FORM learner whose
    * every fitted coefficient goes through the oracle. All sufficient
    * statistics (n, Σx, Σy, Σxy, Σx², Σy²) are exact int64 over integer-
    * cent closes and 1-based day indices, so the normal-equation slope
    * numerator S = nΣxy − ΣxΣy and denominator D = nΣx² − (Σx)² are
    * exact integers and trend = sign(S) needs NO division or float
    * anywhere (D > 0 whenever n ≥ 2 because the x's are distinct).
    * R² = S²/(D·Vy) with Vy = nΣy² − (Σy)² is emitted in micro-units
    * from ONE double expression over those exact ints — every node a
    * single correctly-rounded IEEE op, identical across engines (the
    * q92 BM25 determinism contract; S ≈ 1e9 and each product ≈ 1e18
    * stay below any double-precision cliff that could differ, because
    * both engines round the SAME exact products); constant-price groups
    * (Vy = 0) emit NULL R² on both sides.
    *
    * Scale shape: bars are one map-side-combining groupBy over the
    * scan; the day index is a window on the SAME (symbol, user) key, so
    * the sufficient-statistics groupBy reuses that exchange — one
    * shuffle total, no joins, no iteration, O(1) math per group. At
    * 100 TB of ticks the output is |symbol × user|-sized and each
    * group's fit cost is independent of history length beyond the
    * aggregate itself. */
  private def olsTrend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("symbol", "user_id").orderBy("day")
    val bars = graft.ml.TrendModel.dailyBars(Tables.events(spark, dir))
      .select(col("symbol"), col("user_id"), col("day"),
        round(col("close") * 100).cast("long").as("y"))
      .withColumn("x", row_number().over(w).cast("long"))
    bars.groupBy("symbol", "user_id")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .where(col("n") >= 2)
      .withColumn("slope_num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("slope_den", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("var_y", col("n") * col("syy") - col("sy") * col("sy"))
      .withColumn("trend",
        when(col("slope_num") > 0, 1L).when(col("slope_num") < 0, -1L)
          .otherwise(0L))
      .withColumn("r2_micro",
        when(col("var_y") === 0, lit(null).cast("long"))
          .otherwise(round(
            col("slope_num").cast("double") * col("slope_num").cast("double")
              / (col("slope_den").cast("double") * col("var_y").cast("double"))
              * 1e6).cast("long")))
      .select("symbol", "user_id", "n", "slope_num", "slope_den", "trend",
        "r2_micro")
      .orderBy("symbol", "user_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q147_candlestick_patterns" -> candlestickPatterns,
    "q248_ols_trend" -> olsTrend,
    "q227_seasonal_decomposition" -> seasonalDecomposition,
    "q228_lead_lag_correlation" -> leadLagCorrelation,
    "q144_forward_labels" -> forwardLabels,
    "q124_tech_indicators" -> techIndicators,
    "q125_purged_split" -> purgedSplit,
    "q126_rolling_beta" -> rollingBeta,
    "q131_anomaly_flags" -> anomalyFlags,
    "q140_gap_ffill" -> gapFfill,
    "q259_gap_lerp" -> gapLerp,
    "q269_mann_kendall" -> mannKendall,
    "q270_forecast_backtest" -> forecastBacktest,
    "q234_cusum_changepoints" -> cusumChangepoints
  )

  override def oracles: Map[String, String] = Map(
    // OLS sufficient statistics replayed as exact BIGINTs over the same
    // bar frame; R² mirrors the Spark double expression node for node
    // (S·S) / (D·Vy) · 1e6 — all operands exact integers, each op
    // correctly rounded, so the rounding is engine-independent.
    "q248_ols_trend" ->
      """WITH bars AS (
        |  SELECT event_type AS symbol, user_id,
        |         strftime(ts, '%Y-%m-%d') AS day,
        |         CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2, 3),
        |xy AS (
        |  SELECT symbol, user_id, y,
        |         CAST(row_number() OVER (PARTITION BY symbol, user_id
        |                                 ORDER BY day) AS BIGINT) AS x
        |  FROM bars),
        |s AS (
        |  SELECT symbol, user_id,
        |         count(*) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM xy GROUP BY 1, 2),
        |fit AS (
        |  SELECT symbol, user_id, n,
        |         n * sxy - sx * sy AS slope_num,
        |         n * sxx - sx * sx AS slope_den,
        |         n * syy - sy * sy AS var_y
        |  FROM s WHERE n >= 2)
        |SELECT symbol, user_id, n, slope_num, slope_den,
        |       CAST(CASE WHEN slope_num > 0 THEN 1
        |                 WHEN slope_num < 0 THEN -1 ELSE 0 END AS BIGINT)
        |         AS trend,
        |       CASE WHEN var_y = 0 THEN NULL
        |            ELSE CAST(round(
        |              CAST(slope_num AS DOUBLE) * CAST(slope_num AS DOUBLE)
        |                / (CAST(slope_den AS DOUBLE) * CAST(var_y AS DOUBLE))
        |                * 1e6) AS BIGINT) END AS r2_micro
        |FROM fit ORDER BY symbol, user_id""".stripMargin,
    // the CUSUM recursion replayed closed-form: S_i = P_i − min(0,
    // running-min P) over the n-scaled integer deviations; window sums
    // CAST to BIGINT immediately (DuckDB HUGEINT guard, the q97 lesson)
    "q234_cusum_changepoints" ->
      """WITH src AS (
        |  SELECT user_id, event_id,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |st AS (
        |  SELECT user_id, event_id, cents,
        |         count(*) OVER (PARTITION BY user_id) AS n,
        |         CAST(sum(cents) OVER (PARTITION BY user_id) AS BIGINT) AS sx
        |  FROM src),
        |p AS (
        |  SELECT user_id, event_id, n,
        |         CAST(sum(n * cents - sx - n * 25) OVER w AS BIGINT) AS pu,
        |         CAST(sum(sx - n * cents - n * 25) OVER w AS BIGINT) AS pd
        |  FROM st
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |               ROWS UNBOUNDED PRECEDING)),
        |s AS (
        |  SELECT user_id, event_id, n,
        |         pu - least(0, CAST(min(pu) OVER w AS BIGINT)) AS su,
        |         pd - least(0, CAST(min(pd) OVER w AS BIGINT)) AS sd
        |  FROM p
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |               ROWS UNBOUNDED PRECEDING))
        |SELECT user_id, count(*) AS n_ticks,
        |       CAST(max(su) AS BIGINT) AS max_su,
        |       CAST(max(sd) AS BIGINT) AS max_sd,
        |       CAST(sum(CASE WHEN su > n * 400 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_up_alarms,
        |       CAST(sum(CASE WHEN sd > n * 400 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_dn_alarms,
        |       min(CASE WHEN su > n * 400 THEN event_id END)
        |         AS first_up_event,
        |       min(CASE WHEN sd > n * 400 THEN event_id END)
        |         AS first_dn_event
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // all-integer decomposition (scaled by 7 and by the weekday count,
    // so no division — Spark DIV truncates, DuckDB // floors, and dev7
    // goes negative); Spark dayofweek (Sun=1) = DuckDB dayofweek + 1
    "q227_seasonal_decomposition" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  -- RANGE on the day number: calendar-true centered week (the
        |  -- Spark twin's rangeBetween on datediff-from-epoch)
        |  SELECT event_type, day, v,
        |         count(*) OVER w AS n7,
        |         CAST(sum(v) OVER w AS BIGINT) AS trend_x7
        |  FROM (SELECT *, day - DATE '1970-01-01' AS dn FROM daily) d
        |  WINDOW w AS (PARTITION BY event_type ORDER BY dn
        |               RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |f AS (
        |  SELECT event_type, day, v, trend_x7, v * 7 - trend_x7 AS dev7,
        |         CAST(dayofweek(day) + 1 AS BIGINT) AS wd
        |  FROM t WHERE n7 = 7),
        |seas AS (
        |  SELECT event_type, wd, CAST(sum(dev7) AS BIGINT) AS ssum7,
        |         count(*) AS sn
        |  FROM f GROUP BY 1, 2)
        |SELECT f.event_type, strftime(f.day, '%Y-%m-%d') AS day_str,
        |       f.v, f.trend_x7, f.dev7, f.wd, s.sn, s.ssum7,
        |       f.dev7 * s.sn - s.ssum7 AS resid_sc
        |FROM f JOIN seas s ON s.event_type = f.event_type AND s.wd = f.wd
        |ORDER BY f.event_type, day_str""".stripMargin,
    // five exact integer sums per lag; the float tail mirrors the Spark
    // tree node for node (double mult, two IEEE sqrts, divide, round)
    "q228_lead_lag_correlation" ->
      """WITH cents AS (
        |  SELECT event_type,
        |         CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events),
        |x AS (SELECT day AS xday, CAST(sum(c) AS BIGINT) AS x
        |      FROM cents WHERE event_type = 'click' GROUP BY 1),
        |y AS (SELECT day AS yday, CAST(sum(c) AS BIGINT) AS y
        |      FROM cents WHERE event_type = 'purchase' GROUP BY 1),
        |l AS (SELECT CAST(unnest([-2, -1, 0, 1, 2]) AS BIGINT) AS lag),
        |p AS (
        |  SELECT l.lag, x.x, y.y
        |  FROM x CROSS JOIN l
        |  JOIN y ON y.yday = x.xday + CAST(l.lag AS INTEGER)),
        |s AS (
        |  SELECT lag, count(*) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM p GROUP BY 1)
        |SELECT lag, n,
        |       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |         CAST(round(CAST(n * sxy - sx * sy AS DOUBLE) * 1e6
        |                    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |                       * sqrt(CAST(n * syy - sy * sy AS DOUBLE))))
        |              AS BIGINT) END AS r_micro
        |FROM s ORDER BY lag""".stripMargin,
    // Window sums are CAST to BIGINT immediately (DuckDB sums BIGINT →
    // HUGEINT — the q97 lesson); every double is derived from the exact
    // sums by the same expression shape as the Spark side.
    "q124_tech_indicators" ->
      """WITH src AS (
        |  SELECT user_id, event_id, CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events),
        |d AS (
        |  SELECT user_id, event_id, cents,
        |         cents - lag(cents) OVER (PARTITION BY user_id ORDER BY event_id) AS dc
        |  FROM src),
        |w AS (
        |  SELECT user_id, event_id, cents,
        |         count(*) OVER wb AS nb,
        |         CAST(sum(cents) OVER wb AS BIGINT) AS sb,
        |         CAST(sum(cents*cents) OVER wb AS BIGINT) AS s2b,
        |         count(dc) OVER wr AS nd,
        |         CAST(sum(CASE WHEN dc > 0 THEN dc ELSE 0 END) OVER wr AS BIGINT) AS sg,
        |         CAST(sum(CASE WHEN dc < 0 THEN -dc ELSE 0 END) OVER wr AS BIGINT) AS sl
        |  FROM d
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY event_id
        |                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
        |         wr AS (PARTITION BY user_id ORDER BY event_id
        |                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
        |b AS (
        |  SELECT user_id, event_id, cents,
        |         CASE WHEN nb = 20 THEN CAST(sb AS DOUBLE)/nb/100 END AS boll_mid,
        |         CASE WHEN nb = 20 THEN
        |           sqrt(CAST(nb*s2b - sb*sb AS DOUBLE)/(nb*(nb-1)))/100 END AS boll_sd,
        |         CASE WHEN nd = 14 AND sg + sl > 0 THEN
        |           100*CAST(sg AS DOUBLE)/(sg+sl) END AS rsi14
        |  FROM w)
        |SELECT user_id, event_id, cents, boll_mid, boll_sd,
        |       boll_mid + boll_sd*2 AS boll_up,
        |       boll_mid - boll_sd*2 AS boll_lo,
        |       rsi14
        |FROM b ORDER BY user_id, event_id""".stripMargin,
    "q147_candlestick_patterns" ->
      """WITH bars AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |         arg_min(CAST(round(value*100) AS BIGINT), event_id) AS open_c,
        |         max(CAST(round(value*100) AS BIGINT)) AS high_c,
        |         min(CAST(round(value*100) AS BIGINT)) AS low_c,
        |         arg_max(CAST(round(value*100) AS BIGINT), event_id) AS close_c
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT *,
        |         lag(open_c) OVER w AS p_open,
        |         lag(close_c) OVER w AS p_close,
        |         abs(close_c - open_c) AS body
        |  FROM bars
        |  WINDOW w AS (PARTITION BY user_id ORDER BY day))
        |SELECT user_id, count(*) AS n_days,
        |       CAST(sum(CASE WHEN body*10 <= high_c - low_c AND high_c > low_c
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_doji,
        |       CAST(sum(CASE WHEN p_close < p_open AND close_c > open_c
        |                      AND open_c <= p_close AND close_c >= p_open
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bull_engulf,
        |       CAST(sum(CASE WHEN p_close > p_open AND close_c < open_c
        |                      AND open_c >= p_close AND close_c <= p_open
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bear_engulf,
        |       CAST(sum(CASE WHEN least(open_c, close_c) - low_c >= body*2
        |                      AND high_c - greatest(open_c, close_c) <= body
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hammer
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,
    // DuckDB ASOF with <= is the forward variant: first f.ts satisfying
    // l.ts + 24h <= f.ts (ties impossible — (user_id, ts) is unique).
    // ts truncates to MICROSECONDS first: the engine reads the parquet
    // nanos as µs timestamps (Tables.events), so a ns-precision compare
    // here could pick a different label for a tick in the sub-µs window
    // at the exact 24 h boundary.
    "q144_forward_labels" ->
      """WITH src AS (
        |  SELECT user_id, event_id,
        |         date_trunc('microseconds', ts) AS ts,
        |         CAST(round(value*100) AS BIGINT) AS c
        |  FROM events),
        |lbl AS (
        |  SELECT l.user_id, l.c, f.c AS label_c
        |  FROM src l ASOF LEFT JOIN src f
        |    ON l.user_id = f.user_id AND l.ts + INTERVAL 24 HOUR <= f.ts)
        |SELECT user_id, count(*) AS n_ticks,
        |       count(label_c) AS n_labeled,
        |       CAST(sum(CASE WHEN label_c > c THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
        |       CAST(sum(CASE WHEN label_c < c THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
        |       CAST(sum(CASE WHEN label_c = c THEN 1 ELSE 0 END) AS BIGINT) AS n_flat,
        |       CAST(sum(label_c) AS BIGINT) AS sum_label_c
        |FROM lbl GROUP BY 1 ORDER BY 1""".stripMargin,
    // The day frame, both lags, the shared scored-day gate and every
    // integer error aggregate replayed.
    "q270_forecast_backtest" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |l AS (
        |  SELECT x, lag(x, 1) OVER (ORDER BY d) AS f1,
        |         lag(x, 7) OVER (ORDER BY d) AS f7
        |  FROM daily),
        |s AS (
        |  SELECT abs(x - f1) AS e1, abs(x - f7) AS e7
        |  FROM l WHERE f1 IS NOT NULL AND f7 IS NOT NULL),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_scored,
        |         CAST(sum(e1) AS BIGINT) AS sae1,
        |         CAST(sum(e7) AS BIGINT) AS sae7
        |  FROM s)
        |SELECT n_scored,
        |       sae1 // n_scored AS mae_naive1_c,
        |       sae7 // n_scored AS mae_seasonal7_c,
        |       CASE WHEN sae1 = 0 THEN 0
        |            ELSE (1000000 * sae7) // sae1 END AS mase_micro
        |FROM a""".stripMargin,
    // The daily series, the sign-pair census, the exact tie correction
    // and the HUGEINT-widened signed square replayed.
    "q269_mann_kendall" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |p AS (
        |  SELECT CAST(sign(b.x - a.x) AS BIGINT) AS sgn
        |  FROM daily a JOIN daily b ON a.d < b.d),
        |sa AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n0,
        |         CAST(sum(sgn) AS BIGINT) AS s,
        |         CAST(sum(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS tie_pairs
        |  FROM p),
        |ties AS (
        |  SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
        |    AS BIGINT) AS tie18
        |  FROM (SELECT count(*) AS t FROM daily GROUP BY x
        |        HAVING count(*) > 1)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |w AS (
        |  SELECT n, n0, s, tie_pairs,
        |         n * (n - 1) * (2 * n + 5) - tie18 AS var18
        |  FROM sa CROSS JOIN nn CROSS JOIN ties),
        |z AS (
        |  SELECT n AS n_days, n0, s, tie_pairs, var18,
        |         CAST(CASE WHEN var18 = 0 THEN 0 WHEN s >= 0 THEN
        |           (CAST(18000000 AS HUGEINT) * s * s) // var18
        |         ELSE -((CAST(18000000 AS HUGEINT) * s * s) // var18)
        |         END AS BIGINT) AS z2_signed_micro
        |  FROM w)
        |SELECT n_days, n0, s, tie_pairs, var18, z2_signed_micro,
        |       CASE WHEN abs(z2_signed_micro) < 3841459 THEN 'none'
        |            WHEN z2_signed_micro > 0 THEN 'up'
        |            ELSE 'down' END AS trend
        |FROM z""".stripMargin,
    // Segments, gap explosion, the truncating lerp and both rollups
    // replayed; epoch(hour)//3600 is exact (hour-truncated timestamps
    // have integer epochs well under 2^53).
    "q259_gap_lerp" ->
      """WITH bars AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour,
        |         arg_max(CAST(round(value*100) AS BIGINT), event_id)
        |           AS close_c
        |  FROM events GROUP BY 1, 2),
        |b2 AS (
        |  SELECT user_id, CAST(epoch(hour) AS BIGINT) // 3600 AS hidx,
        |         close_c
        |  FROM bars),
        |seg AS (
        |  SELECT user_id, hidx AS h0, close_c AS v0,
        |         lead(hidx) OVER wu AS h1, lead(close_c) OVER wu AS v1
        |  FROM b2
        |  WINDOW wu AS (PARTITION BY user_id ORDER BY hidx)),
        |g AS (
        |  SELECT user_id, h0, v0, h1, v1,
        |         unnest(generate_series(h0 + 1, h1 - 1)) AS h
        |  FROM seg WHERE h1 IS NOT NULL AND h1 > h0 + 1),
        |gi AS (
        |  SELECT user_id, v0 + ((v1 - v0) * (h - h0)) // (h1 - h0)
        |           AS interp_c,
        |         h - h0 AS off
        |  FROM g),
        |ga AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |         CAST(sum(interp_c) AS BIGINT) AS gap_sum,
        |         CAST(sum(interp_c * off) AS BIGINT) AS gap_chk
        |  FROM gi GROUP BY 1),
        |ba AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_bars,
        |         CAST(sum(close_c) AS BIGINT) AS bar_sum,
        |         max(hidx) - min(hidx) + 1 AS n_hours
        |  FROM b2 GROUP BY 1)
        |SELECT ba.user_id, n_hours, n_bars,
        |       CAST(coalesce(n_gaps, 0) AS BIGINT) AS n_gaps,
        |       CAST(bar_sum + coalesce(gap_sum, 0) AS BIGINT)
        |         AS sum_interp_c,
        |       CAST(coalesce(gap_chk, 0) AS BIGINT) AS gap_chk
        |FROM ba LEFT JOIN ga USING (user_id)
        |ORDER BY ba.user_id""".stripMargin,
    "q140_gap_ffill" ->
      """WITH bars AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour,
        |         arg_max(CAST(round(value*100) AS BIGINT), event_id) AS close_c
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |  FROM (SELECT user_id, min(hour) AS h0, max(hour) AS h1
        |        FROM bars GROUP BY 1)),
        |g AS (
        |  SELECT grid.user_id, grid.hour, b.close_c
        |  FROM grid LEFT JOIN bars b USING (user_id, hour)),
        |f AS (
        |  SELECT user_id, hour, close_c,
        |         last_value(close_c IGNORE NULLS) OVER wf AS filled_c,
        |         count(close_c) OVER wf AS isl
        |  FROM g
        |  WINDOW wf AS (PARTITION BY user_id ORDER BY hour
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |runs AS (
        |  SELECT user_id, CAST(max(run_len) AS BIGINT) AS max_gap_run
        |  FROM (SELECT user_id, isl, count(*) AS run_len
        |        FROM f WHERE close_c IS NULL GROUP BY 1, 2)
        |  GROUP BY 1),
        |agg AS (
        |  SELECT user_id, count(*) AS n_hours,
        |         count(close_c) AS n_bars,
        |         CAST(sum(CASE WHEN close_c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_gaps,
        |         CAST(sum(filled_c) AS BIGINT) AS sum_filled_c
        |  FROM f GROUP BY 1)
        |SELECT a.user_id, a.n_hours, a.n_bars, a.n_gaps, a.sum_filled_c,
        |       coalesce(r.max_gap_run, 0) AS max_gap_run
        |FROM agg a LEFT JOIN runs r USING (user_id)
        |ORDER BY a.user_id""".stripMargin,
    "q131_anomaly_flags" ->
      """WITH src AS (
        |  SELECT user_id, event_id, CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id, cents,
        |         count(*) OVER tr AS n,
        |         CAST(sum(cents) OVER tr AS BIGINT) AS s,
        |         CAST(sum(cents*cents) OVER tr AS BIGINT) AS s2
        |  FROM src
        |  WINDOW tr AS (PARTITION BY user_id ORDER BY event_id
        |                ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id, cents
        |FROM w
        |WHERE n = 50
        |  AND (n-1)*(n*cents - s)*(n*cents - s) > 9*n*(n*s2 - s*s)
        |ORDER BY user_id, event_id""".stripMargin,
    "q125_purged_split" ->
      """SELECT CASE
        |         WHEN ts + INTERVAL 24 HOUR <= TIMESTAMP '2024-01-20' THEN 'train'
        |         WHEN ts <= TIMESTAMP '2024-01-20' THEN 'purged'
        |         WHEN ts <= TIMESTAMP '2024-01-20' + INTERVAL 48 HOUR THEN 'embargo'
        |         ELSE 'test' END AS split,
        |       count(*) AS n_rows,
        |       count(DISTINCT user_id) AS n_symbols,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts_str,
        |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts_str
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q126_rolling_beta" ->
      """WITH bars AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour,
        |         arg_max(CAST(round(value*100) AS BIGINT), event_id) AS close_c
        |  FROM events GROUP BY 1, 2),
        |market AS (
        |  SELECT hour, CAST(sum(close_c) AS BIGINT) AS mkt_c,
        |         count(*) AS n_sym
        |  FROM bars GROUP BY 1),
        |j AS (
        |  SELECT b.user_id, b.hour, b.close_c, m.mkt_c, m.n_sym
        |  FROM bars b JOIN market m USING (hour)),
        |w AS (
        |  SELECT user_id, hour, close_c, mkt_c, n_sym,
        |         count(*) OVER w30 AS n,
        |         CAST(sum(mkt_c) OVER w30 AS BIGINT) AS sx,
        |         CAST(sum(close_c) OVER w30 AS BIGINT) AS sy,
        |         CAST(sum(mkt_c*close_c) OVER w30 AS BIGINT) AS sxy,
        |         CAST(sum(mkt_c*mkt_c) OVER w30 AS BIGINT) AS sx2
        |  FROM j
        |  WINDOW w30 AS (PARTITION BY user_id ORDER BY hour
        |                 ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
        |SELECT user_id, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour_str,
        |       close_c, mkt_c, n_sym,
        |       CASE WHEN n = 30 AND n*sx2 - sx*sx <> 0 THEN
        |         CAST(n*sxy - sx*sy AS DOUBLE)/(n*sx2 - sx*sx) END AS beta30
        |FROM w ORDER BY user_id, hour_str""".stripMargin
  )
}
