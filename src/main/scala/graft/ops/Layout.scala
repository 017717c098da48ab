package graft.ops

import org.apache.spark.sql.DataFrame

/** Parquet layout maintenance — the small-files problem. A streaming
  * ingest (q64/q103's sinks, the reference's per-batch inserts) leaves
  * thousands of tiny files per partition; at 100 TB an uncompacted table
  * turns every scan into a file-listing and task-scheduling storm (one
  * task per tiny file) and wrecks row-group pruning.
  *
  * Compaction is Spark-first: a single `REBALANCE` shuffle whose output
  * partitioning AQE sizes to `spark.sql.adaptive.advisoryPartitionSizeInBytes`
  * — no driver-side row counting, no second pass; skewed partitions are
  * split and small ones coalesced by the same mechanism (the engine-native
  * answer PlanAuditSpec's skew test exercises for joins). One file per
  * sized partition.
  */
object Layout {

  /** Rewrite `df` into `outDir` as size-targeted parquet files: one
    * AQE-rebalanced shuffle, `advisoryBytes` per output partition. */
  def compact(df: DataFrame, outDir: String, advisoryBytes: Long): Unit = {
    val spark = df.sparkSession
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> advisoryBytes.toString)
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try df.hint("rebalance").write.mode("overwrite").parquet(outDir)
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
