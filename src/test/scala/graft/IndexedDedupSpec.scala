package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{Dedup, IndexManifest, IndexedDedup, LinearHashIndex}

/** Pins for the persistent-dedup-index work (VERDICT r10 #1, r11 #1):
  * linear-hash bucket splitting under generational directories,
  * PROBE-PROPORTIONAL keep-side IO, exact verdict parity with
  * [[Dedup.incrementalDedup]] across batches (including df-cap
  * tombstone crossings), whole-batch replay idempotence, and the
  * ATOMIC MANIFEST COMMIT protocol — crash-injected between the two
  * index rewrites and before the manifest rename, proving verdicts and
  * both indexes converge bit-identically on replay. */
class IndexedDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Sum of task input records (file-scan rows) while `body` runs;
    * waits for the async listener bus to drain. */
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
      while (recs.get() != last && waited < 5000) {
        last = recs.get(); Thread.sleep(200); waited += 200
      }
      recs.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  // ------------------------------------------------ IndexManifest
  test("IndexManifest: empty read is None; commits version, batch id " +
    "and bucket sets atomically; cleans tmp leftovers and stale versions") {
    val root = tmp("graft_mf_")
    val mf = new IndexManifest(spark, root)
    assert(mf.read().isEmpty)
    mf.commit(0L, Map("a" -> Set("L1I0G0", "L1I1G0"), "b" -> Set("L0I0G0")))
    val s1 = mf.read().get
    assert(s1.version == 1L && s1.batchSeq == 0L)
    assert(s1.buckets == Map("a" -> Set("L1I0G0", "L1I1G0"), "b" -> Set("L0I0G0")))
    // a crashed commit's temp file must not confuse or survive the next
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, ".tmp-deadbeef"), "batchSeq=9\n")
    mf.commit(1L, Map("a" -> Set("L1I0G1", "L1I1G0"), "b" -> Set("L0I0G0")))
    val s2 = mf.read().get
    assert(s2.version == 2L && s2.batchSeq == 1L)
    assert(s2.buckets("a") == Set("L1I0G1", "L1I1G0"))
    val names = new java.io.File(root).listFiles.map(_.getName).toSet
    assert(!names.exists(_.startsWith(".tmp-")), s"tmp leftover survives: $names")
    // retention: current + previous only
    mf.commit(2L, Map("a" -> Set("L1I0G2", "L1I1G0"), "b" -> Set("L0I0G0")))
    val vs = new java.io.File(root).listFiles.map(_.getName)
      .filter(_.startsWith("manifest-")).sorted.toSeq
    assert(vs == Seq("manifest-000000002", "manifest-000000003"), vs.toString)
  }

  // ------------------------------------------------ LinearHashIndex
  test("LinearHashIndex: bootstrap + rewrite preserve all rows, " +
    "overflowing buckets split, old generations stay readable until gc, " +
    "probes stay exact") {
    val root = tmp("graft_lhi_")
    val ix = new LinearHashIndex(spark, root, "s", "s STRING, doc_id BIGINT",
      rowCap = 16L)
    val seed = (0 until 40).map(i => (s"k$i", i.toLong)).toDF("s", "doc_id")
    val live0 = ix.bootstrap(seed)
    assert(live0.nonEmpty)
    // every key resolvable; probe returns its row
    val got = ix.probe(Seq("k7").toDF("s"), live0).where(col("s") === "k7")
      .as[(String, Long)].collect().toSet
    assert(got == Set(("k7", 7L)))
    // grow 6x through the touched-bucket rewrite path -> splits
    val more = (0 until 200).map(i => (s"m$i", 1000L + i)).toDF("s", "doc_id")
    val live1 = ix.rewrite(more.select("s"), live0) { old =>
      old.unionByName(more).distinct()
    }
    def maxLevel(live: Set[String]): Int =
      live.map(_.drop(1).takeWhile(_.isDigit).toInt).max
    assert(maxLevel(live1) > maxLevel(live0),
      s"no split happened: $live0 -> $live1")
    // the OLD snapshot is still fully readable (nothing in place changed)
    val oldRows = ix.allRows(live0).as[(String, Long)].collect()
    assert(oldRows.length == 40 && oldRows.toSet.size == 40,
      "pre-rewrite snapshot no longer readable through its pinned set")
    // all 240 rows reachable through the new set, none duplicated
    val all = ix.allRows(live1).as[(String, Long)].collect()
    assert(all.length == 240 && all.toSet.size == 240)
    // no live bucket above cap after the split cascade
    live1.foreach { id =>
      val n = spark.read.schema("s STRING, doc_id BIGINT")
        .parquet(s"$root/__lb=$id").count()
      assert(n <= 16L, s"bucket $id holds $n > cap rows")
    }
    // gc retires exactly the unreferenced directories
    ix.gc(live1)
    val dirs = new java.io.File(root).listFiles
      .filter(_.getName.startsWith("__lb=")).map(_.getName.stripPrefix("__lb="))
      .toSet
    assert(dirs == live1, s"gc left $dirs, expected $live1")
    // probes still exact after gc
    val g2 = ix.probe(Seq("m5").toDF("s"), live1).where(col("s") === "m5")
      .as[(String, Long)].collect().toSet
    assert(g2 == Set(("m5", 1005L)))
    // empty pinned set is an explicit contract error, not empty.max
    val bare = new LinearHashIndex(spark, tmp("graft_lhi_empty_"), "s",
      "s STRING, doc_id BIGINT", rowCap = 16L)
    val err = intercept[IllegalArgumentException] {
      bare.probe(Seq("k0").toDF("s"), Set.empty[String])
    }
    assert(err.getMessage.contains("bootstrap first"))
  }

  test("LinearHashIndex: probe IO tracks the probe set, not the index " +
    "size (records read for a 3-key probe are flat across an 16x larger " +
    "index, and a small fraction of the big index)") {
    def build(n: Int): (LinearHashIndex, Set[String]) = {
      val ix = new LinearHashIndex(spark, tmp("graft_lhi_sz_"), "s",
        "s STRING, doc_id BIGINT", rowCap = 64L)
      val live = ix.bootstrap(
        (0 until n).map(i => (s"k$i", i.toLong)).toDF("s", "doc_id"))
      (ix, live)
    }
    val (small, liveSmall) = build(512)
    val (big, liveBig) = build(8192)
    val keys = Seq("k3", "k77", "k401").toDF("s")
    def probed(ix: LinearHashIndex, live: Set[String]): Long =
      recordsRead { ix.probe(keys, live).where(col("doc_id") >= 0).count(); () }
    val rSmall = probed(small, liveSmall)
    val rBig = probed(big, liveBig)
    assert(rBig <= rSmall * 4 + 64,
      s"probe IO grew with index size: small=$rSmall big=$rBig")
    assert(rBig < 8192 / 4,
      s"probe read a large fraction of the big index: $rBig")
  }

  // ------------------------------------------------ verdict parity
  private def mkDocs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def boot(keep: DataFrame, maxDf: Int, rowCap: Long = 64L)
      : IndexedDedup.Indexes =
    IndexedDedup.bootstrap(spark, keep, k = 3, maxShingleDf = maxDf,
      tmp("graft_xd_si_"), tmp("graft_xd_di_"), tmp("graft_xd_mf_"), rowCap)

  /** Reference: incrementalDedup run the q274 way (recompute against
    * the full keep corpus). */
  private def ref(keep: DataFrame, batch: DataFrame, maxDf: Int)
      : Map[Long, (String, Long)] =
    Dedup.incrementalDedup(keep, batch, "doc_id", "text", k = 3,
        threshold = 0.3, maxShingleDf = maxDf)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  private def got(spark0: org.apache.spark.sql.SparkSession,
                  idx: IndexedDedup.Indexes, batch: DataFrame, seq: Long,
                  maxDf: Int): Map[Long, (String, Long)] = {
    val v = IndexedDedup.processBatch(spark0, idx, batch, seq, k = 3,
      threshold = 0.3, maxShingleDf = maxDf)
    val out = v.as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(v)
    out
  }

  /** Full content snapshot of both indexes through the committed
    * manifest, plus the manifest batch id. */
  private def snapshot(idx: IndexedDedup.Indexes)
      : (Set[(String, Long)], Set[(Long, Long, Long)], Long) = {
    val st = idx.manifest.read().get
    (idx.shingle.allRows(st.buckets("shingle"))
        .as[(String, Long)].collect().toSet,
      idx.doc.allRows(st.buckets("doc"))
        .as[(Long, Long, Long)].collect().toSet,
      st.batchSeq)
  }

  test("IndexedDedup: verdicts match incrementalDedup across batches — " +
    "cross-batch dup_of_keep, dup_in_drop clusters, df-cap tombstone " +
    "crossing with keep-doc size decrements") {
    // keep corpus: 3 distinct docs + a COMMON 3-shingle ("c c c ...")
    // present in 2 keep docs; maxDf = 3 so one more kept occurrence
    // crosses the cap and tombstones the common shingle.
    val keep = mkDocs(Seq(
      1L -> "a b c d e f g h i j k l",
      2L -> "m n o p q r s t u v w x",
      3L -> "z z y c c c c w1 w2 w3 w4 w5",
      4L -> "z z q2 c c c c w6 w7 w8 w9 w10"))
    val idx = boot(keep, maxDf = 3)
    // batch 1: exact dup of keep doc 1 (dup_of_keep), two dups of each
    // other (kept + dup_in_drop), and TWO kept carriers of the common
    // shingle — keep-side df goes 2 -> 4 > maxDf, tombstoning "c c c"
    // and decrementing every keep doc that holds it
    val b1 = mkDocs(Seq(
      101L -> "a b c d e f g h i j k l",
      102L -> "f1 f2 f3 f4 f5 f6 f7 f8 f9 f10 f11 f12",
      103L -> "f1 f2 f3 f4 f5 f6 f7 f8 f9 f10 f11 f12",
      104L -> "h1 h2 c c c c h3 h4 h5 h6 h7 h8",
      105L -> "g1 g2 c c c c g3 g4 g5 g6 g7 g8"))
    val exp1 = ref(keep, b1, maxDf = 3)
    val got1 = got(spark, idx, b1, seq = 1L, maxDf = 3)
    assert(got1 == exp1, s"batch1: $got1 vs $exp1")
    assert(got1(101L)._1 == "dup_of_keep" && got1(103L)._1 == "dup_in_drop"
      && got1(102L)._1 == "kept" && got1(104L)._1 == "kept"
      && got1(105L)._1 == "kept")
    // reference keep after batch 1 = keep + kept batch docs
    val keep1 = keep.unionByName(
      b1.where(col("doc_id").isin(
        exp1.filter(_._2._1 == "kept").keys.toSeq.map(Long.box): _*)))
    // batch 2: dup of a doc KEPT IN BATCH 1 (the cross-batch case) plus
    // a doc matching keep doc 3 through surviving shingles while the
    // common shingle is now past the cap on the keep side alone
    val b2 = mkDocs(Seq(
      201L -> "f1 f2 f3 f4 f5 f6 f7 f8 f9 f10 f11 f12",
      202L -> "z z y c c c c w1 w2 w3 w4 w5"))
    val exp2 = ref(keep1, b2, maxDf = 3)
    val got2 = got(spark, idx, b2, seq = 2L, maxDf = 3)
    assert(got2 == exp2, s"batch2: $got2 vs $exp2")
    assert(got2(201L)._1 == "dup_of_keep" && got2(201L)._2 == 102L,
      s"cross-batch dup must resolve to the batch-1 kept doc: $got2")
    assert(got2(202L)._1 == "dup_of_keep" && got2(202L)._2 == 3L)
    // the common shingle is tombstoned on the keep side
    val st = idx.manifest.read().get
    val si = idx.shingle.allRows(st.buckets("shingle"))
      .as[(String, Long)].collect()
    val commonRows = si.filter(_._1 == "c c c")
    assert(commonRows.toSeq == Seq(("c c c", -1L)),
      s"expected a single tombstone for the crossed shingle: ${commonRows.toSeq}")
  }

  test("IndexedDedup: whole-batch replay is idempotent — same verdicts, " +
    "bit-identical index state (a committed batch replays read-only)") {
    val keep = mkDocs((1 to 30).map(i =>
      i.toLong -> s"p$i q$i r$i s$i t$i c c c c u$i v$i"))
    val idx = boot(keep, maxDf = 35)
    // the batch pushes the shared "c c c" family past maxDf when its
    // kept docs land -> crossing decrements on all 30 keep docs
    val b1 = mkDocs((1 to 8).map(i =>
      (100L + i) -> s"n$i o$i c c c c g$i h$i j$i k$i l$i"))
    val exp = ref(keep, b1, maxDf = 35)
    val first = got(spark, idx, b1, seq = 1L, maxDf = 35)
    assert(first == exp)
    val s1 = snapshot(idx)
    // crossing actually happened (tombstones present, counts decremented)
    assert(s1._1.exists(_._2 == -1L), "expected tombstones after crossing")
    val replay = got(spark, idx, b1, seq = 1L, maxDf = 35)
    assert(replay == first, s"replayed verdicts differ: $replay vs $first")
    assert(snapshot(idx) == s1, "replay mutated index state")
  }

  // ------------------------------------------------ crash injection
  /** Run the crash-injection protocol with `arm` installing the failure
    * hook: process a batch that crashes at the injected point, assert
    * readers stay on the pre-batch snapshot, then replay to completion
    * and compare verdicts + full index state against an uncrashed
    * control instance over the same fixture. */
  private def crashCase(arm: (() => Unit) => Unit, reset: () => Unit): Unit = {
    val keep = mkDocs((1 to 24).map(i =>
      i.toLong -> s"p$i q$i r$i s$i t$i c c c c u$i v$i"))
    val b1 = mkDocs((1 to 6).map(i =>
      (100L + i) -> s"n$i o$i c c c c g$i h$i j$i k$i l$i"))
    val control = boot(keep, maxDf = 28)
    val expected = got(spark, control, b1, seq = 1L, maxDf = 28)
    val ctrlState = snapshot(control)
    assert(ctrlState._1.exists(_._2 == -1L),
      "fixture must cross the df cap so BOTH indexes rewrite")

    val crashed = boot(keep, maxDf = 28)
    val preState = snapshot(crashed)
    final class InjectedCrash extends RuntimeException("injected")
    arm(() => throw new InjectedCrash)
    try {
      intercept[InjectedCrash] {
        got(spark, crashed, b1, seq = 1L, maxDf = 28); ()
      }
    } finally reset()
    // the manifest never moved: readers (and the replay) see the
    // pre-batch snapshot of BOTH indexes, whatever was half-written
    assert(snapshot(crashed) == preState,
      "a crashed attempt leaked into the committed snapshot")
    // replay converges: same verdicts, bit-identical index content
    val replay = got(spark, crashed, b1, seq = 1L, maxDf = 28)
    assert(replay == expected,
      s"post-crash replay verdicts differ: $replay vs $expected")
    val replayState = snapshot(crashed)
    assert(replayState._1 == ctrlState._1 && replayState._2 == ctrlState._2
        && replayState._3 == ctrlState._3,
      "post-crash replay index state differs from the uncrashed control")
  }

  test("IndexedDedup: crash BETWEEN the two index rewrites — manifest " +
    "holds the pre-batch snapshot, replay converges bit-identically") {
    crashCase(
      hook => IndexedDedup.testCrashBetweenIndexWrites = hook,
      () => IndexedDedup.testCrashBetweenIndexWrites = () => ())
  }

  test("IndexedDedup: crash AFTER both rewrites, BEFORE the manifest " +
    "rename — same guarantee (the rename is the only commit point)") {
    crashCase(
      hook => IndexedDedup.testCrashBeforeManifestCommit = hook,
      () => IndexedDedup.testCrashBeforeManifestCommit = () => ())
  }

  test("IndexedDedup: keep-side IO tracks the batch — a 2-doc batch " +
    "against an 800-doc keep-set reads a fraction of incrementalDedup's " +
    "recompute volume") {
    val keepRows = (1 to 800).map(i =>
      i.toLong -> s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h")
    val keepDir = tmp("graft_xio_keep_")
    mkDocs(keepRows).write.mode("overwrite").parquet(keepDir)
    val keep = spark.read.parquet(keepDir)
    val idx = IndexedDedup.bootstrap(spark, keep, k = 3, maxShingleDf = 20,
      tmp("graft_xio_si_"), tmp("graft_xio_di_"), tmp("graft_xio_mf_"),
      rowCap = 256L)
    val b = mkDocs(Seq(
      9001L -> "w5a w5b w5c w5d w5e w5f w5g w5h", // dup of keep doc 5
      9002L -> "x1 x2 x3 x4 x5 x6 x7 x8"))
    val rIndexed = recordsRead {
      val v = IndexedDedup.processBatch(spark, idx, b, 1L, k = 3,
        threshold = 0.3, maxShingleDf = 20)
      v.count()
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(v)
      ()
    }
    val rRecompute = recordsRead {
      Dedup.incrementalDedup(keep, b, "doc_id", "text", k = 3,
        threshold = 0.3, maxShingleDf = 20).count()
      ()
    }
    assert(rIndexed * 2 < rRecompute,
      s"indexed path read $rIndexed records vs recompute $rRecompute")
  }
}
