package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Otsu's method (Otsu 1979 — public algorithm) over a distributed
  * histogram: pick the threshold that maximizes between-class variance,
  * the standard way to turn a quality-score distribution into a
  * data-derived keep/drop gate without hand-tuning.
  *
  * Scale shape: the corpus contributes ONE map-combinable histogram
  * aggregate (B rows to the driver — the bounded-collect discipline);
  * the argmax over ≤ B−1 candidate thresholds happens driver-side in
  * exact BigInt arithmetic, so no distributed float reduction and no
  * overflow for any corpus size. Between-class variance is evaluated on
  * the bin-index domain: σ²_b(k) · N² · n0 · n1 = (s0·n1 − s1·n0)² —
  * the output score is that rational floor-quantized to micro-units,
  * bit-reproducible across engines (the oracle replays it in HUGEINT).
  */
object Otsu {

  /** Per-candidate-threshold Otsu table for `valueCol` (LONG-castable):
    * k (class 0 = bins ≤ k), n0, n1, score_micro, is_best (max score,
    * ties to the smallest k). Only candidates with both classes
    * non-empty appear. */
  def otsuTable(spark: SparkSession, df: DataFrame, valueCol: String,
      bins: Int = 16): DataFrame = {
    require(bins >= 2 && bins <= 4096, s"bins out of range: $bins")
    val vals = df.select(col(valueCol).cast("long").as("v"))
      .where(col("v").isNotNull)
    val Array(b0) = vals.agg(min("v").as("lo"), max("v").as("hi"),
      count(lit(1)).as("n")).collect()
    val n = b0.getLong(2)
    require(n > 0, "otsu over an empty column")
    val (lo, hi) = (b0.getLong(0), b0.getLong(1))
    require(hi - lo >= 0, "value span exceeds the signed-long range")
    val w = (hi - lo) / bins + 1
    val hist = vals
      .groupBy(expr(s"(v - ${lo}L) DIV ${w}L").as("k"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val counts = (0 until bins).map(k => hist.getOrElse(k.toLong, 0L))
    val total = BigInt(n)
    val sTotal = counts.zipWithIndex.map { case (c, k) => BigInt(c) * k }.sum
    var n0 = BigInt(0); var s0 = BigInt(0)
    val rows = (0 until bins - 1).flatMap { k =>
      n0 += counts(k); s0 += BigInt(counts(k)) * k
      val n1 = total - n0
      if (n0 > 0 && n1 > 0) {
        val d = s0 * n1 - (sTotal - s0) * n0
        val score = (d * d * 1000000) / (n0 * n1 * total * total)
        Some((k.toLong, n0.toLong, n1.toLong, score.toLong))
      } else None
    }
    require(rows.nonEmpty,
      "otsu needs at least two non-empty bins (constant column?)")
    val best = rows.maxBy { case (k, _, _, s) => (s, -k) }._1
    import spark.implicits._
    rows.map { case (k, c0, c1, s) => (k, c0, c1, s, k == best) }
      .toDF("k", "n0", "n1", "score_micro", "is_best")
  }
}
