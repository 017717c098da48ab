package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the data-diff between two versions of a
  * keyed table (yesterday's drop vs today's): which keys were added,
  * removed, changed, unchanged. The audit step a pipeline runs before
  * promoting a new snapshot (complements [[Merge.upsertLatest]], which
  * APPLIES changes, and the q95 SCD-2 build, which RECORDS them).
  *
  * One full-outer join on the key — a single key shuffle; the change
  * predicate is evaluated row-at-a-time with no extra pass. At 100 TB
  * both sides bucket/partition on the key and the join co-locates. */
object Reconcile {

  /** Per-key diff of `oldDf` vs `newDf`. `compareCols` decide "changed"
    * (null-safe equality on each). Returns one row per key with a
    * `diff_status` of added / removed / changed / unchanged plus the old
    * and new values of each compared column. */
  def diff(oldDf: DataFrame, newDf: DataFrame, key: String,
           compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((key +: compareCols).map(c =>
      col(c).as(if (c == key) "__ko" else s"old_$c")): _*)
    val n = newDf.select((key +: compareCols).map(c =>
      col(c).as(if (c == key) "__kn" else s"new_$c")): _*)
    val same: Column = compareCols
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduce(_ && _)
    o.join(n, col("__ko") === col("__kn"), "full_outer")
      .withColumn("diff_status",
        when(col("__ko").isNull, lit("added"))
          .when(col("__kn").isNull, lit("removed"))
          .when(same, lit("unchanged"))
          .otherwise(lit("changed")))
      .withColumn(key, coalesce(col("__ko"), col("__kn")))
      .drop("__ko", "__kn")
  }
}
