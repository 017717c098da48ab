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

  test("bloom filters + column indexes write into the footer and the bloom answers membership") {
    import graft.ops.Layout
    val ev = Tables.events(spark, dir).select("event_id", "user_id", "value")
    val total = ev.count()
    val tmp = java.nio.file.Files.createTempDirectory("graft_bloom_").toString
    ev.repartitionByRange(4, col("user_id")).sortWithinPartitions("user_id")
      .write
      .option("parquet.bloom.filter.enabled#user_id", "true")
      .option("parquet.bloom.filter.expected.ndv#user_id", "200000")
      .option("parquet.enable.dictionary#user_id", "false")
      .mode("overwrite").parquet(tmp)
    // every row group carries BOTH structures, read back (not just
    // offset-checked) through the parquet metadata API
    val (bloom, colIdx, rows) = Layout.skippingStructures(spark, tmp, "user_id")
    assert(bloom, "a row group is missing its bloom filter")
    assert(colIdx, "a row group is missing its column index")
    assert(rows == total, s"footer row count $rows != $total")
    // the bloom's contract: no false negatives for a present key; a key
    // far outside the domain answers definitely-absent (skippable
    // without touching row data)
    val present = Tables.events(spark, dir)
      .agg(min("user_id")).head().getLong(0)
    assert(Layout.bloomMightContain(spark, tmp, "user_id", present),
      "bloom false-negative on a present key")
    assert(!Layout.bloomMightContain(spark, tmp, "user_id", 987654321098L),
      "bloom did not exclude an absent key")
    // and the point-predicate scan through this layout decodes a
    // fraction of the table (min/max range files + page indexes)
    val scanRows = scanOutputRows(
      spark.read.parquet(tmp).where(col("user_id") === present))
    assert(scanRows < total / 2,
      s"skipping ineffective: scan emitted $scanRows of $total")
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

    // Layout.excludableRows derives the layout-licensed pruning bound
    // (the q232 gate): the sorted layout has row groups whose [min,max]
    // excludes the probe, and the scan respects the implied bound; the
    // scattered layout licenses nothing (every file spans the domain).
    import graft.ops.Layout
    val exSorted = Layout.excludableRows(spark, s"$tmp/sorted", "user_id", probe)
    assert(exSorted > 0, "sorted layout should have excludable row groups")
    assert(sortedRows <= total - exSorted,
      s"scan decoded rows a stats-pruner must skip: $sortedRows > $total - $exSorted")
    assert(Layout.excludableRows(spark, s"$tmp/scattered", "user_id", probe) == 0L,
      "scattered layout spans the domain in every file; nothing is excludable")
  }

  test("page index prunes DATA PAGES inside one row group: decoded rows < total on a globally-sorted single file") {
    import graft.ops.Layout
    val ev = Tables.events(spark, dir).select("event_id", "user_id", "value")
    val total = ev.count()
    val tmp = java.nio.file.Files.createTempDirectory("graft_pageidx_").toString
    // ONE file, globally sorted by user_id, tiny 100-row pages → one row
    // group whose ONLY pruning handle is the page index
    ev.repartition(1).sortWithinPartitions("user_id")
      .write.option("parquet.page.row.count.limit", "100")
      .mode("overwrite").parquet(tmp)
    val files = new java.io.File(tmp).listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(files == 1, s"fixture must be a single file, got $files")
    val probe = ev.agg(min("user_id")).head().getLong(0)
    // row-group tier licenses NOTHING here (one group spans the domain)…
    assert(Layout.excludableRows(spark, tmp, "user_id", probe) == 0L,
      "single-row-group fixture should have no excludable row groups")
    // …but the page tier does: most 100-row pages exclude the min key
    val (pages, exPages, exRows) =
      Layout.pageLevelPruning(spark, tmp, "user_id", probe)
    assert(pages >= 5, s"expected >=5 data pages, got $pages")
    assert(exPages > 0 && exPages < pages,
      s"expected some-but-not-all pages excludable: $exPages of $pages")
    assert(exRows > total / 2,
      s"sorted layout should page-exclude most rows: $exRows of $total")
    // and the scan actually decodes within the page-index bound —
    // STRICTLY fewer rows than the table (SPARK-26345 row-range reads)
    val scanRows = scanOutputRows(
      spark.read.parquet(tmp).where(col("user_id") === probe))
    assert(scanRows <= total - exRows,
      s"scan decoded rows the page index excludes: $scanRows > $total - $exRows")
    assert(scanRows < total,
      s"page pruning ineffective: scan decoded all $total rows")
  }

  test("z-order layout bounds EVERY dimension per file; linear sort bounds only its leading column") {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder_").toString

    graft.ops.Layout.writeZOrdered(li, Seq("l_partkey", "l_suppkey"),
      bits = 16, nFiles = 8, outDir = s"$tmp/zorder")
    li.repartitionByRange(8, col("l_partkey")).sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/linear")

    // rows are exactly preserved (z-order only permutes); l_orderkey is
    // not unique, so order on the full tuple
    val allCols = Seq("l_orderkey", "l_partkey", "l_suppkey")
    assert(spark.read.parquet(s"$tmp/zorder")
        .orderBy(allCols.map(col): _*).collect().toSeq ==
      li.orderBy(allCols.map(col): _*).collect().toSeq)

    val Seq(gMinP, gMaxP, gMinS, gMaxS) = li
      .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
      .head().toSeq.map(_.asInstanceOf[Number].doubleValue())
    val (rangeP, rangeS) = (gMaxP - gMinP, gMaxS - gMinS)

    // per-file normalized width of each dim, summed over both dims —
    // the pruning figure of merit: a predicate box on either dim skips a
    // file iff the file's width on that dim excludes it
    def meanBoxWidth(path: String): Double = {
      val files = new java.io.File(path).listFiles
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      assert(files.length == 8, s"expected 8 files at $path")
      val widths = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("l_partkey"), max("l_partkey"),
            min("l_suppkey"), max("l_suppkey")).head()
        val Seq(np, xp, ns, xs) = r.toSeq.map(_.asInstanceOf[Number].doubleValue())
        (xp - np) / rangeP + (xs - ns) / rangeS
      }
      widths.sum / widths.length
    }

    val zWidth = meanBoxWidth(s"$tmp/zorder")
    val linWidth = meanBoxWidth(s"$tmp/linear")
    // linear: partkey width ~ 1/8 but suppkey width ~ 1.0 per file
    // (sum ~ 1.1); z-order: each file is a box, BOTH dims bounded
    // (sum well under 1). The margin is wide enough to be noise-proof.
    assert(zWidth < 0.85 * linWidth,
      s"z-order mean box width $zWidth not < 0.85 * linear $linWidth")
    assert(linWidth > 1.0, s"linear layout should leave suppkey unbounded, got $linWidth")
  }

  test("Layout.compact: small-files storm rebalanced into few sized files, rows intact") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir).select("event_id", "user_id", "value")
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    // simulate a streaming sink's debris: 64 files for 1k rows
    ev.repartition(64).write.mode("overwrite").parquet(s"$tmp/small")
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles.count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$tmp/small") == 64)

    val scattered = spark.read.parquet(s"$tmp/small")
    graft.ops.Layout.compact(scattered, s"$tmp/compacted",
      advisoryBytes = 4L * 1024 * 1024)
    // ~25 KB of data at a 4 MB advisory size → AQE coalesces the
    // rebalance shuffle to very few partitions (one file each)
    val nOut = parquetFiles(s"$tmp/compacted")
    assert(nOut >= 1 && nOut <= 4, s"expected <=4 compacted files, got $nOut")
    // content is exactly preserved
    val a = spark.read.parquet(s"$tmp/compacted")
      .orderBy("event_id").collect().toSeq
    val b = ev.orderBy("event_id").collect().toSeq
    assert(a == b)
  }
}
