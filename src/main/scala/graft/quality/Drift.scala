package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution drift between two table versions — the promote-gate that
  * catches a silently shifted feature before it ships: histogram both
  * sides on a SHARED fixed-width integer grid and compare per-bin counts.
  * The drift statistic is total variation in EXACT integers
  * (`sum |n_old - n_new|`), so the gate is bit-reproducible at any
  * partitioning — no KL/PSI logarithms, which diverge in the last ulp
  * across engines and partition orders (the q92/q114 lesson).
  *
  * Scale shape: grid bounds come from ONE min/max aggregation over the
  * union, broadcast back as a single row; binning is in-scan arithmetic;
  * the histogram is one 16-ary aggregation (map-side combinable). Cost =
  * two scans + one tiny shuffle regardless of table size. Complements
  * [[Profile]] (one version's shape) and `Reconcile.diff` (row-level
  * delta): this is the DISTRIBUTION-level delta.
  */
object Drift {

  /** Per-bin histogram comparison of `valueCol` (integer-scaled) between
    * `oldDf` and `newDf`, with a shared grid derived from the union's
    * min/max. Returns one row per occupied bin: counts for both sides,
    * the global total-variation numerator, and the drift verdict
    * `tv * 10 >= thresholdTenths * total` evaluated in integers. */
  def histogramDrift(oldDf: DataFrame, newDf: DataFrame, valueCol: String,
                     nBins: Int, thresholdTenths: Int): DataFrame = {
    val tagged = oldDf.select(col(valueCol).as("__v")).withColumn("__side", lit(0))
      .unionByName(newDf.select(col(valueCol).as("__v")).withColumn("__side", lit(1)))
    val bounds = tagged.agg(min("__v").as("__mn"), max("__v").as("__mx"))
    val binned = tagged.crossJoin(broadcast(bounds))
      .withColumn("bin",
        when(col("__mx") === col("__mn"), lit(0L)).otherwise(
          floor((col("__v") - col("__mn")).cast("long") * lit(nBins.toLong)
            / (col("__mx") - col("__mn") + 1L).cast("long")).cast("long")))
    val hist = binned.groupBy("bin")
      .agg(sum(when(col("__side") === 0, 1L).otherwise(0L)).as("n_old"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("n_new"))
    import org.apache.spark.sql.expressions.Window
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .withColumn("tv", sum(abs(col("n_old") - col("n_new"))).over(all))
      .withColumn("total", sum(col("n_old") + col("n_new")).over(all))
      .withColumn("drifted",
        col("tv") * 10 >= col("total") * thresholdTenths)
      .select("bin", "n_old", "n_new", "tv", "total", "drifted")
  }
}
