package graft.timeseries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Technical-indicator columns over an integer-cents price series — the
  * feature set the reference's trend model gestures at
  * (`ml_model/predict_from_vm4.py` consumes close-price history;
  * `dashboard/plot_utils.py` charts the series these annotate).
  *
  * Determinism discipline (same as q28/q105): every windowed accumulation
  * is an EXACT int64 sum over integer cents — float window sums are
  * partition-order-dependent and not even run-to-run stable on a cluster —
  * and each indicator is derived from those sums by a fixed-shape double
  * expression (one division / one sqrt), so results are bit-reproducible
  * at any partitioning and replicable in ANSI SQL. All window frames are
  * ROWS frames over a per-key sort: one key-shuffle + one sort per query,
  * any key cardinality, no driver state.
  *
  * Int64 headroom: cents ≤ ~5.6e4 on the fixture ⇒ c² ≤ 3.2e9, a 20-row
  * sum ≤ 6.4e10, n·Σc² ≤ 1.3e12 — ~6 orders below 2⁶³ even at 1000× the
  * price scale. */
object Indicators {

  /** n-row count / Σc / Σc² over `w` — the shared exact-sum triple. */
  private def sums(cents: Column, w: WindowSpec): (Column, Column, Column) =
    (count(lit(1)).over(w), sum(cents).over(w), sum(cents * cents).over(w))

  /** Bollinger bands over an n-row frame: (mid, sd, upper, lower), null
    * until the frame is full. mid = mean/100; sd = sample std dev from the
    * exact sums: sqrt((n·Σc² − (Σc)²)/(n(n−1)))/100. */
  def bollinger(cents: Column, w: WindowSpec, n: Int, k: Int)
      : (Column, Column, Column, Column) = {
    val (cnt, s, s2) = sums(cents, w)
    val full = cnt === n
    val mid = when(full, s.cast("double") / cnt / 100)
    val sd = when(full,
      sqrt((cnt * s2 - s * s).cast("double") / (cnt * (cnt - lit(1L)))) / 100)
    (mid, sd, mid + sd * k, mid - sd * k)
  }

  /** RSI over n one-step moves (simple-average a.k.a. Cutler's RSI — the
    * windowed form; Wilder's recursive smoothing is the q29-EMA shape and
    * deliberately not duplicated here). Up/down moves accumulate as exact
    * integer sums; RSI = 100·Σgain/(Σgain+Σloss) — algebraically equal to
    * 100 − 100/(1+RS) but reached by ONE double division. Null until n
    * moves exist or when the window never moved. */
  def rsi(cents: Column, diffW: WindowSpec, sumW: WindowSpec, n: Int)
      : Column = {
    val d = cents - lag(cents, 1).over(diffW)
    val gain = when(d > 0, d).otherwise(lit(0L))
    val loss = when(d < 0, -d).otherwise(lit(0L))
    val nd = count(d).over(sumW)
    val sg = sum(gain).over(sumW)
    val sl = sum(loss).over(sumW)
    when(nd === n && (sg + sl) > 0, lit(100) * sg.cast("double") / (sg + sl))
  }

  /** Rolling z-score anomaly flag over a TRAILING n-row frame (current
    * row excluded — a spike must not contaminate its own baseline):
    * true iff (c − mean)² > k²·variance. The comparison is cleared of
    * divisions — (n−1)·(n·c − Σc)² > k²·n·(n·Σc² − (Σc)²) — so the gate
    * is PURE int64 arithmetic: bit-portable, no epsilon, no float
    * accumulation order to match. Null until the trailing frame is full.
    *
    * Headroom at fixture scale (c ≤ 5.6e4, n = 50): LHS ≤ 49·(2.8e6)² ≈
    * 3.9e14, RHS ≤ 9·50·7.8e12 ≈ 3.5e15 — both ~3 orders under 2⁶³. */
  def anomalyFlag(cents: Column, w: WindowSpec, n: Int, k: Int): Column = {
    val cnt = count(lit(1)).over(w)
    val s = sum(cents).over(w)
    val s2 = sum(cents * cents).over(w)
    val dev = cnt * cents - s
    when(cnt === n,
      (cnt - lit(1L)) * dev * dev > lit(k.toLong * k) * cnt * (cnt * s2 - s * s))
  }

  /** Rolling OLS slope (beta) of series y against series x over an n-row
    * frame: (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²), numerator and denominator
    * exact int64, one double division. Null until the frame is full or
    * when x is constant over it. */
  def rollingBeta(y: Column, x: Column, w: WindowSpec, n: Int): Column = {
    val cnt = count(lit(1)).over(w)
    val sx = sum(x).over(w)
    val sy = sum(y).over(w)
    val sxy = sum(x * y).over(w)
    val sx2 = sum(x * x).over(w)
    val den = cnt * sx2 - sx * sx
    when(cnt === n && den =!= 0, (cnt * sxy - sx * sy).cast("double") / den)
  }
}
