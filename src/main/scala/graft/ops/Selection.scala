package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed order statistics WITHOUT a global sort: iterative
  * range narrowing (distributed quickselect on a histogram).
  *
  * `percentile`/`median` in both Spark and DuckDB materialize per-group
  * sorted state; at 100 TB a global exact median that way is a
  * single-partition sort of the corpus. This operator finds the exact
  * k-th smallest of a LONG column in O(log_B(range)) passes, each pass
  * a full scan + ONE B-bucket histogram aggregate (map-side
  * combinable, B rows to the driver — the bounded-collect discipline):
  * cumulative counts locate the bucket containing rank k, the value
  * range narrows to that bucket, and k is rebased. When the surviving
  * value range is ≤ B the histogram IS per-value exact and the answer
  * falls out directly — no tail sort of any kind, so the worst case
  * (all rows equal, adversarial skew) still terminates in ≤
  * ceil(64 / log2 B) passes.
  */
object Selection {

  /** Exact k-th smallest (1-based) of `valueCol` cast to LONG, nulls
    * ignored. Returns None on empty input or k out of range. */
  def exactKth(df: DataFrame, valueCol: String, k: Long,
      buckets: Int = 1024): Option[Long] = {
    require(buckets >= 2 && buckets <= 65536, s"buckets out of range: $buckets")
    val vals = df.select(col(valueCol).cast("long").as("v"))
      .where(col("v").isNotNull)
    val Array(b0) = vals.agg(count(lit(1)).as("n"),
      min("v").as("lo"), max("v").as("hi")).collect()
    val n = b0.getLong(0)
    if (n == 0L || k < 1L || k > n) return None
    var lo = b0.getLong(1)
    var hi = b0.getLong(2)
    var rank = k
    // A full-width value range would overflow (hi - lo) — and ANSI mode
    // makes (v - lo) a runtime error, not a silent wrap. One sign-split
    // pass (count of negatives) picks the half containing rank; either
    // half's span then fits in a signed long.
    if (lo < 0 && hi > 0 && hi - lo < 0) {
      val nNeg = vals.where(col("v") < 0).agg(count(lit(1))).head().getLong(0)
      if (rank <= nNeg) hi = -1L
      else { lo = 0L; rank -= nNeg }
    }
    var guard = 0
    while (lo < hi) {
      guard += 1
      require(guard <= 64, s"selection failed to converge on [$lo, $hi]")
      // ceil-div width so (hi-lo)/w < buckets always holds; w ≥ 1 keeps
      // every pass strictly narrowing.
      val span = hi - lo // both bounds finite; span ≥ 1 here
      val w = span / buckets + 1
      // exact long DIV, not `/` (double division rounds (2^63-2)/2^61
      // up to 4.0 — an out-of-range bucket index)
      val hist = vals.where(col("v").between(lo, hi))
        .groupBy(expr(s"(v - ${lo}L) DIV ${w}L").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var below = 0L
      var idx = 0
      while (below + hist(idx)._2 < rank) { below += hist(idx)._2; idx += 1 }
      val b = hist(idx)._1
      rank -= below
      val newLo = lo + b * w
      val newHi = math.min(hi, newLo + w - 1)
      lo = newLo; hi = newHi
      if (w == 1L) return Some(lo) // per-value exact histogram
    }
    Some(lo)
  }

  /** Exact lower median: k = ceil(n/2) = (n+1)/2. Returns (n, median). */
  def exactMedian(df: DataFrame, valueCol: String,
      buckets: Int = 1024): Option[(Long, Long)] = {
    val vals = df.select(col(valueCol).cast("long").as("v"))
      .where(col("v").isNotNull)
    val n = vals.count()
    if (n == 0) None
    else exactKth(df, valueCol, (n + 1) / 2, buckets).map(m => (n, m))
  }

  /** Exact order statistics for SEVERAL quantiles at once, sharing the
    * narrowing passes: per pass, each still-active quantile contributes
    * a (percent, bucket) pair via a literal-bounds projection (a
    * `when(v BETWEEN lo_p AND hi_p)` per quantile, exploded) — no join
    * of any kind, one map-combinable histogram for ALL quantiles, ≤
    * |percents| × B rows to the driver. Rank for percent p is the
    * lower quantile ceil(p·n/100). Returns (percent, n, value) rows. */
  def exactQuantiles(df: DataFrame, valueCol: String, percents: Seq[Int],
      buckets: Int = 1024): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be 1..100, got $percents")
    require(buckets >= 2 && buckets <= 65536, s"buckets out of range: $buckets")
    val spark = df.sparkSession
    val vals = df.select(col(valueCol).cast("long").as("v"))
      .where(col("v").isNotNull)
    val Array(b0) = vals.agg(count(lit(1)).as("n"),
      min("v").as("lo"), max("v").as("hi")).collect()
    val n = b0.getLong(0)
    require(n > 0, "exactQuantiles over an empty column")
    val (lo0, hi0) = (b0.getLong(1), b0.getLong(2))
    // shared sign-split (one count) if the full span overflows
    lazy val nNeg = vals.where(col("v") < 0).agg(count(lit(1)))
      .head().getLong(0)
    val state = scala.collection.mutable.Map[Int, (Long, Long, Long)]()
    percents.distinct.foreach { p =>
      var (lo, hi) = (lo0, hi0)
      var rank = (p.toLong * n + 99) / 100
      if (lo < 0 && hi > 0 && hi - lo < 0) {
        if (rank <= nNeg) hi = -1L else { lo = 0L; rank -= nNeg }
      }
      state(p) = (lo, hi, rank)
    }
    var guard = 0
    while (state.exists { case (_, (lo, hi, _)) => lo < hi }) {
      guard += 1
      require(guard <= 64, "quantile narrowing failed to converge")
      val active = state.filter { case (_, (lo, hi, _)) => lo < hi }.toSeq
      val probes = active.map { case (p, (lo, hi, _)) =>
        val w = (hi - lo) / buckets + 1
        struct(lit(p).as("p"),
          when(col("v").between(lo, hi),
            expr(s"(v - ${lo}L) DIV ${w}L")).as("b"))
      }
      val hist = vals
        .select(explode(array(probes: _*)).as("s"))
        .where(col("s.b").isNotNull)
        .groupBy(col("s.p").as("p"), col("s.b").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (p, rows) =>
          p -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
        }
      active.foreach { case (p, (lo, hi, rank)) =>
        val w = (hi - lo) / buckets + 1
        val h = hist(p)
        var below = 0L; var idx = 0
        while (below + h(idx)._2 < rank) { below += h(idx)._2; idx += 1 }
        val b = h(idx)._1
        val newLo = lo + b * w
        val newHi = math.min(hi, newLo + w - 1)
        state(p) = (newLo, if (w == 1L) newLo else newHi, rank - below)
      }
    }
    import spark.implicits._
    state.toSeq.sortBy(_._1)
      .map { case (p, (lo, _, _)) => (p, n, lo) }
      .toDF("percent", "n", "value")
  }

  /** Exact lower median PER GROUP, all groups narrowed simultaneously:
    * each pass joins the corpus against a broadcast of per-group
    * [lo, hi] bounds and takes ONE (group × bucket) histogram — so the
    * number of full scans stays O(log_B(range)) regardless of how many
    * groups there are, where a per-group `exactKth` loop would scan per
    * group. Driver state is (groups × few longs) and each collect is ≤
    * groups × B rows; `maxGroups` fails loudly before that stops being
    * the bounded-collect discipline. Returns (group, n, median) rows. */
  def exactMedianByGroup(df: DataFrame, groupCol: String, valueCol: String,
      buckets: Int = 1024, maxGroups: Int = 4096): DataFrame = {
    require(buckets >= 2 && buckets <= 65536, s"buckets out of range: $buckets")
    val spark = df.sparkSession
    val base = df
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
    val init = base.groupBy("g")
      .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .collect()
    require(init.length <= maxGroups,
      s"${init.length} groups exceed maxGroups=$maxGroups — driver state " +
        "would stop being bounded; raise the cap deliberately or pre-aggregate")
    // g -> (lo, hi, remaining rank); median rank = (n+1)/2 within group
    val state = scala.collection.mutable.Map[String, (Long, Long, Long)]()
    val nBy = init.map(r => r.getString(0) -> r.getLong(1)).toMap
    init.foreach { r =>
      var (lo, hi) = (r.getLong(2), r.getLong(3))
      var rank = (r.getLong(1) + 1) / 2
      // same full-width-span guard as exactKth: sign-split via one
      // per-group negative count
      if (lo < 0 && hi > 0 && hi - lo < 0) {
        val nNeg = base.where(col("g") === r.getString(0) && col("v") < 0)
          .count()
        if (rank <= nNeg) hi = -1L else { lo = 0L; rank -= nNeg }
      }
      state(r.getString(0)) = (lo, hi, rank)
    }
    var guard = 0
    while (state.exists { case (_, (lo, hi, _)) => lo < hi }) {
      guard += 1
      require(guard <= 64, "per-group selection failed to converge")
      val active = state.filter { case (_, (lo, hi, _)) => lo < hi }.toSeq
      import spark.implicits._
      val bounds = active.map { case (g, (lo, hi, _)) =>
        (g, lo, hi, (hi - lo) / buckets + 1)
      }.toDF("g", "lo", "hi", "w")
      val hist = base
        .join(broadcast(bounds), Seq("g"))
        .where(col("v").between(col("lo"), col("hi")))
        .groupBy(col("g"), expr("(v - lo) DIV w").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getString(0))
        .map { case (g, rows) =>
          g -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
        }
      active.foreach { case (g, (lo, hi, rank)) =>
        val w = (hi - lo) / buckets + 1
        val h = hist(g)
        var below = 0L; var idx = 0
        while (below + h(idx)._2 < rank) { below += h(idx)._2; idx += 1 }
        val b = h(idx)._1
        val newLo = lo + b * w
        val newHi = math.min(hi, newLo + w - 1)
        state(g) = (newLo, if (w == 1L) newLo else newHi, rank - below)
      }
    }
    import spark.implicits._
    state.toSeq.sortBy(_._1)
      .map { case (g, (lo, _, _)) => (g, nBy(g), lo) }
      .toDF("g", "n", "median")
  }
}
