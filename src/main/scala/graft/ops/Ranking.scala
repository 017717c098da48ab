package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact order statistics: dense 1-based ranks over a LONG
  * column without ever sorting the data through one partition — the
  * naive `row_number() OVER (ORDER BY c)` moves the corpus to a single
  * task (Spark warns, and at 100 TB it simply doesn't run). Classic
  * two-level ranking instead:
  *
  *   1. rows bucket by a fixed integer range split of the value domain
  *      (pure map-side);
  *   2. per-(scope, bucket) counts aggregate to a TINY table
  *      (scopes × buckets rows), whose running sum yields each bucket's
  *      global OFFSET — broadcast back;
  *   3. rank = bucket offset + row_number within the (scope, bucket)
  *      partition — every window is bucket-sized, so parallelism is
  *      buckets × scopes regardless of data size.
  *
  * Ranks are exactly `row_number() OVER (PARTITION BY scope ORDER BY c)`
  * up to tie order WITHIN equal values — any computation that depends
  * only on the value at a rank (quantile picks, quantile normalization)
  * is tie-insensitive and therefore bit-stable. */
object Ranking {

  /** Add `rankCol` = 1-based rank of `valueCol` (a long) within each
    * `scope` group (empty scope = global rank). `bucketWidth` splits the
    * value domain; any positive width is correct — width tunes only the
    * bucket-count/parallelism trade. `tieCols` break ties WITHIN equal
    * values (append a unique key to get a fully deterministic total
    * order — required when downstream joins on the rank itself, e.g.
    * sorted-neighborhood dedup); ties never cross buckets (equal values
    * share a bucket), so the offsets are unaffected. */
  def distributedRank(df: DataFrame, valueCol: String, scope: Seq[String],
                      bucketWidth: Long, rankCol: String,
                      tieCols: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // Pure long floor division (Math.floorDiv): a double cast loses
    // precision past 2^53, which could order-invert buckets near a
    // boundary. Truncating `div` + adjust-on-negative-remainder never
    // leaves long arithmetic and has no overflow edge (q-1 only fires
    // when q <= 0).
    val v = col(valueCol).cast("long")
    val q = org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.Bridge.expression(v),
        org.apache.spark.sql.catalyst.expressions.Literal(bucketWidth)))
    val r = v % lit(bucketWidth)
    val bucket = when(r < 0, q - 1).otherwise(q)
    val withB = df.withColumn("__bkt", bucket)
    val scopeCols = scope.map(col)
    val counts = withB.groupBy(scopeCols :+ col("__bkt"): _*)
      .agg(count(lit(1)).as("__n"))
    val wOff = {
      val base = if (scope.isEmpty) Window.partitionBy()
        else Window.partitionBy(scopeCols: _*)
      base.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    }
    val offsets = counts
      .withColumn("__off", coalesce(sum("__n").over(wOff), lit(0L)))
      .drop("__n")
    val wIn = Window
      .partitionBy(scopeCols :+ col("__bkt"): _*)
      .orderBy(col(valueCol) +: tieCols.map(col): _*)
    withB.join(broadcast(offsets), scope :+ "__bkt")
      .withColumn(rankCol, col("__off") + row_number().over(wIn))
      .drop("__bkt", "__off")
  }
}
