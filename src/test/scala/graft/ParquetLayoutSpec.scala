package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Tables

/** Data layout vs scan pruning: parquet predicate pushdown skips row
  * groups by min/max stats, so a key-sorted layout turns a selective
  * filter into a near-point read while a scattered layout reads
  * everything. The write-side discipline (repartitionByRange +
  * sortWithinPartitions before fact-table writes) is what makes
  * pushdown PAY at 100 TB — this spec measures the difference rather
  * than asserting the conf. */
class ParquetLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves()
    scans.map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
  }

  test("key-sorted layout prunes row groups; scattered layout reads everything") {
    val ev = Tables.events(spark, dir).select("event_id", "user_id", "value")
    val total = ev.count()
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout_").toString

    // range-partitioned + sorted: each file covers a narrow user_id range
    ev.repartitionByRange(8, col("user_id")).sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(s"$tmp/sorted")
    // scattered: every file covers the whole user_id domain
    ev.repartition(8, col("event_id"))
      .write.mode("overwrite").parquet(s"$tmp/scattered")

    val probe = Tables.events(spark, dir)
      .agg(min("user_id")).head().getLong(0)
    def filtered(path: String) =
      spark.read.parquet(path).where(col("user_id") === probe)

    val sortedRows = scanOutputRows(filtered(s"$tmp/sorted"))
    val scatteredRows = scanOutputRows(filtered(s"$tmp/scattered"))

    // same answer either way...
    assert(filtered(s"$tmp/sorted").count() ==
      filtered(s"$tmp/scattered").count())
    // ...but the sorted layout's scan must emit far fewer rows: the
    // pushed filter skips row groups whose [min,max] excludes the probe.
    assert(sortedRows < total / 4,
      s"sorted layout did not prune: scan emitted $sortedRows of $total")
    assert(sortedRows < scatteredRows,
      s"expected sorted ($sortedRows) < scattered ($scatteredRows)")
  }
}
