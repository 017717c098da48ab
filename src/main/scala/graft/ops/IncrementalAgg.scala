package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — a materialized rollup kept current
  * by MERGING partial-aggregate states instead of rescanning history.
  * The same algebra every distributed aggregation already relies on
  * (partial ⊎ partial across partitions), applied across TIME: the
  * stored MV is the partial state of the history; each new drop
  * contributes its own partial state; merge is a tiny key-wise
  * aggregation over the two. At 100 TB this is the difference between
  * O(delta) per refresh and O(history).
  *
  * State carried per key: n / sum / min / max — every algebraic derived
  * metric (avg = sum/n, range, …) is computed at read time. Non-algebraic
  * metrics (exact distinct, median) need sketch states instead — the HLL
  * and CMS partials of q68/q69 are the drop-in mergeable versions. */
object IncrementalAgg {

  /** Partial-aggregate state of `df` per `keys` over an exact (long)
    * measure. The result frame IS the stored MV segment. */
  def partials(df: DataFrame, keys: Seq[String], measure: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(measure).as("sum_m"),
        min(measure).as("min_m"), max(measure).as("max_m"))

  /** Merge any number of partial states (associative + commutative — the
    * MV refresh). */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum("n").as("n"), sum("sum_m").as("sum_m"),
        min("min_m").as("min_m"), max("max_m").as("max_m"))
}
