package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bm25Index

/** Commit-protocol and probe-IO pins for the persisted BM25 index —
  * the same bar IndexedDedupSpec holds the dedup indexes to:
  * crash-injected atomicity (readers stay on the pre-batch snapshot of
  * ALL THREE indexes, replay converges bit-identically) and
  * SparkListener proof that query IO tracks the query's terms, not the
  * index size. */
class Bm25IndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def mkDocs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def boot(docs: DataFrame, cap: Long, rowCap: Long = 64L) =
    Bm25Index.bootstrap(spark, docs, cap, tmp("b25s_t_"), tmp("b25s_d_"),
      tmp("b25s_g_"), tmp("b25s_m_"), rowCap)

  /** Full state fingerprint: every row of all three indexes through the
    * committed manifest, plus (version, batchSeq). */
  private def snapshot(idx: Bm25Index.Indexes) = {
    val st = idx.manifest.read().get
    (st.version, st.batchSeq,
      idx.term.allRows(st.buckets("term"))
        .as[(String, String, Long, Long)].collect().toSet,
      idx.doc.allRows(st.buckets("doc")).as[(Long, Long)].collect().toSet,
      idx.stats.allRows(st.buckets("stats"))
        .as[(String, Long, Long)].collect().toSet)
  }

  private def queryRows(idx: Bm25Index.Indexes): Seq[(Long, Long, Double)] =
    Bm25Index.query(spark, idx, Seq("alpha", "beta", "hot"), k = 8)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)

  private def crashCase(arm: (() => Unit) => Unit,
                        reset: () => Unit): Unit = {
    // 'hot' crosses cap 3 when the batch lands, so the term rewrite
    // both tombstones and inserts, and the doc + stats rewrites follow
    val keep = mkDocs(Seq(
      1L -> "alpha beta hot w1 w2", 2L -> "alpha hot w3 w4",
      3L -> "beta hot w5 w6"))
    val b1 = mkDocs(Seq(
      11L -> "alpha hot x1 x2", 12L -> "beta x3 x4 x5"))
    val control = boot(keep, cap = 3L)
    Bm25Index.mergeBatch(spark, control, b1, 1L, maxTermDf = 3L)
    val ctrlState = snapshot(control)
    val ctrlQuery = queryRows(control)
    assert(ctrlState._3.exists(_._3 == -1L),
      "fixture must cross the df cap so the tombstone path runs")

    val crashed = boot(keep, cap = 3L)
    val preState = snapshot(crashed)
    final class InjectedCrash extends RuntimeException("injected")
    arm(() => throw new InjectedCrash)
    try {
      intercept[InjectedCrash] {
        Bm25Index.mergeBatch(spark, crashed, b1, 1L, maxTermDf = 3L)
      }
    } finally reset()
    // the manifest never moved: readers see the pre-batch snapshot of
    // all three indexes, whatever was half-written on disk
    assert(snapshot(crashed) == preState,
      "a crashed attempt leaked into the committed snapshot")
    // replay converges bit-identically to the uncrashed control
    Bm25Index.mergeBatch(spark, crashed, b1, 1L, maxTermDf = 3L)
    val rs = snapshot(crashed)
    assert(rs._2 == ctrlState._2 && rs._3 == ctrlState._3 &&
        rs._4 == ctrlState._4 && rs._5 == ctrlState._5,
      "post-crash replay state differs from the uncrashed control")
    assert(queryRows(crashed) == ctrlQuery,
      "post-crash replay query results differ")
  }

  test("Bm25Index: crash BETWEEN the term and doc rewrites — manifest " +
    "holds the pre-batch snapshot of all three indexes, replay " +
    "converges bit-identically") {
    crashCase(
      hook => Bm25Index.testCrashBetweenIndexWrites = hook,
      () => Bm25Index.testCrashBetweenIndexWrites = () => ())
  }

  test("Bm25Index: crash AFTER all rewrites, BEFORE the manifest " +
    "rename — same guarantee (the rename is the only commit point)") {
    crashCase(
      hook => Bm25Index.testCrashBeforeManifestCommit = hook,
      () => Bm25Index.testCrashBeforeManifestCommit = () => ())
  }

  // ------------------------------------------------ probe IO
  private def recordsRead(body: => Unit): Long = {
    val recs = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null)
          recs.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      var last = -1L
      var waited = 0
      while (recs.get() != last && waited < 50) {
        last = recs.get(); Thread.sleep(100); waited += 1
      }
      recs.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("Bm25Index: query IO is bucket-slack-bounded, not corpus-" +
    "tracking — records read PLATEAU as the index grows with " +
    "UNRELATED terms") {
    // base: 50 docs carrying the query terms + per-doc filler terms
    def doc(i: Int, extra: String) =
      (i.toLong, s"alpha beta $extra f${i}a f${i}b f${i}c")
    val base = mkDocs((1 to 50).map(i => doc(i, s"s$i")))
    val idx = boot(base, cap = 65536L, rowCap = 128L)
    def grow(from: Int, n: Int, seq: Long): Unit = {
      Bm25Index.mergeBatch(spark, idx,
        mkDocs((from until from + n).map(i =>
          (i.toLong, s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f"))),
        seq, maxTermDf = 65536L)
    }
    def q(): Long = recordsRead {
      Bm25Index.query(spark, idx, Seq("alpha", "beta"), k = 5).count()
      ()
    }
    grow(1001, 800, 1L) // 17x the base rows
    val buckets1 = idx.manifest.read().get.buckets("term").size
    val r1 = q()
    grow(10001, 800, 2L) // 33x the base rows
    val buckets2 = idx.manifest.read().get.buckets("term").size
    val r2 = q()
    assert(buckets2 > buckets1,
      "the second growth must split more buckets for the pin to bind")
    // the query touches <= |terms|*16 posting buckets of <= rowCap rows
    // plus the matched docs' length buckets and the stats row: a hard
    // index-size-independent cap. Doubling the index again must NOT
    // move records read materially (a corpus-tracking scan would 2x).
    assert(r2 <= (r1 * 3) / 2,
      s"query IO tracked the corpus: $r1 records (17x) -> $r2 (33x)")
    val hardCap = (2 * Bm25Index.Shards + 10) * 128L
    assert(r2 <= hardCap, s"probe read $r2 > slack bound $hardCap")
  }
}
