package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-located join (SURVEY.md "Optimize for scale":
  * "repartition()/bucketing for co-located joins").
  *
  * Writing both join sides bucketed by the join key with the SAME bucket
  * count pre-materializes the shuffle: each side's scan reports
  * HashPartitioning(key, n) to Catalyst, the join's distribution
  * requirement is already satisfied, and the plan carries NO Exchange —
  * the join runs scan→(sort)→merge. At 100 TB this converts every
  * repeated fact⋈fact join on the same key from a full two-sided shuffle
  * into a local merge per bucket; the shuffle cost is paid once at write
  * time and amortized over every subsequent join, aggregation, or
  * window on that key (those also skip their Exchange).
  *
  * `sortBy(key)` additionally persists bucket-local order; with one file
  * per bucket Spark elides the merge sort too. */
object Bucketing {

  /** Write `df` as a bucketed (and bucket-sorted) parquet table rooted at
    * `path`, registered as `table` in the session catalog; returns the
    * catalog-backed frame whose scan carries the bucketing info. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: String): DataFrame = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
    spark.table(table)
  }

  def drop(spark: SparkSession, tables: String*): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
}
