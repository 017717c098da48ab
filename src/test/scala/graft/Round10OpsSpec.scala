package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 pins: loop-shape discipline (q252 HITS materialize-and-
  * evict) and the new batched-BPE / sampled-blocking / char-exact-span
  * / streaming-dedup queries. */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Counts Spark jobs started while `body` runs (async listener bus —
    * waits until the count is stable before returning). */
  private def countJobs(body: => Unit): Int = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      var last = -1
      var waited = 0
      while (jobs.get() != last && waited < 5000) {
        last = jobs.get(); Thread.sleep(200); waited += 200
      }
      jobs.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  // ---------------------------------------------------- q252 job shape
  test("q252: HITS derives the edge frame ONCE (job count pinned; " +
    "laziness re-running the edge join per half-step can't creep back)") {
    // With AQE off the job layout is deterministic (observed via stage
    // names): 1 broadcast job for the orders JOIN lineitem edge join +
    // 3 eager-checkpoint jobs (edges, h0, a0) + per half-step exactly 4
    // jobs (2 auto-broadcasts of the node-sized score frame — main
    // lineage + max-subquery lineage — 1 max-aggregate execution, 1
    // checkpoint; 3 rounds x 2 half-steps = 24) + 2 collect jobs (sort
    // sample + result) = 30. The point of the pin: the EDGE DERIVATION
    // (both parquet scans + the distinct shuffle) appears in exactly
    // one job — every later job reads the edges checkpoint. The r9
    // plan-lazy shape re-derived the edge frame inside every broadcast
    // subquery and the final action (measured 12.1 s -> 2.9 s isolated
    // at sf0.1); a count drift in either direction means the loop
    // shape changed and must be re-audited.
    val tmp = java.nio.file.Files.createTempDirectory("graft_hits_jobs_").toString
    Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.parquet(s"$tmp/orders.parquet")
    Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 10L))
      .toDF("l_orderkey", "l_suppkey")
      .coalesce(1).write.parquet(s"$tmp/lineitem.parquet")
    val confs = Seq("spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val n = countJobs {
        val rows = SparkEntry.queries("q252_hits")(spark, tmp).collect()
        assert(rows.length == 5) // 2 hubs + 3 authorities, bounded top-10
      }
      assert(n == 30,
        s"expected 1 edge-broadcast + 3 ckpt + 6 half-steps x 4 + 2 collect = 30 jobs, got $n")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // ---------------------------------------------------- q271 fixture
  /** Pure-Scala reference replay of batch-greedy BPE: per round, count
    * weighted adjacent pairs, greedily select up to `cap` pairs with
    * pairwise-disjoint symbol sets in (count DESC, pair ASC) order,
    * apply all left-to-right, emit (seq, round, pos, l, r, count,
    * round-end Σ freq·|syms|). */
  private def refBatchedBpe(words: Seq[(String, Long)], rounds: Int,
      cap: Int): Seq[(Long, Long, Long, String, String, Long, Long)] = {
    def greedyMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
      val out = scala.collection.mutable.Buffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toVector
    }
    var segs = words.map { case (w, f) => (f, w.split("").toVector) }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, String, String, Long, Long)]
    var seq = 0L
    for (round <- 1 to rounds) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      for ((f, syms) <- segs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      val ordered = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }
      val used = scala.collection.mutable.Set.empty[String]
      val batch = scala.collection.mutable.Buffer.empty[(String, String, Long)]
      for (((l, r), c) <- ordered if batch.size < cap)
        if (!used(l) && !used(r)) { used += l; used += r; batch += ((l, r, c)) }
      for ((l, r, _) <- batch)
        segs = segs.map { case (f, syms) => (f, greedyMerge(syms, l, r)) }
      val total = segs.map { case (f, syms) => f * syms.length }.sum
      batch.zipWithIndex.foreach { case ((l, r, c), j) =>
        seq += 1
        out += ((seq, round.toLong, (j + 1).toLong, l, r, c, total))
      }
    }
    out.toSeq
  }

  test("q271: batched BPE on a constructed corpus matches the pure-Scala " +
    "reference; symbol-sharing pairs defer to later rounds; empty rounds " +
    "emit nothing") {
    // words: the x5, she x3, cat x4. Round 1 pairs: he:8 th:5 at:4 ca:4
    // sh:3 — greedy selects he{h,e} and at{a,t}; th (shares h), ca
    // (shares a), sh (shares h) all DEFER. Round 2: (t,he):5 (c,at):4
    // both select; (s,he) defers again. Round 3: (s,he):3. Rounds 4-5:
    // no pairs left -> no rows (the empty-round path on both engines).
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_batch_").toString
    Seq((1L, "the the the the the"), (2L, "she she she"),
        (3L, "cat cat cat cat"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fixture"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q271_bpe_batched_train")(spark, tmp)
      .as[(Long, Long, Long, String, String, Long, Long)].collect().toSeq
    val expect = refBatchedBpe(
      Seq("the" -> 5L, "she" -> 3L, "cat" -> 4L), rounds = 5, cap = 8)
    assert(got == expect, s"got $got\nexpect $expect")
    // the deferral structure itself, pinned explicitly
    assert(got.filter(_._2 == 1L).map(r => (r._4, r._5)) ==
      Seq(("h", "e"), ("a", "t")))
    assert(got.filter(_._2 == 2L).map(r => (r._4, r._5)) ==
      Seq(("t", "he"), ("c", "at")))
    assert(got.filter(_._2 == 3L).map(r => (r._4, r._5)) == Seq(("s", "he")))
    assert(!got.exists(_._2 >= 4L), "rounds with no pairs must emit nothing")
  }

  // ---------------------------------------------------- q271 job shape
  test("q271: job count scales with COUNT ROUNDS, not merges (>=16 " +
    "merges trained in under one job per merge)") {
    // The q213 sequential trainer pays >= 2 driver-blocking jobs per
    // merge; the batched trainer pays ~4 per ROUND (pair-table sort
    // sample + collect, checkpoint materialization via the round
    // checksum, initial ckpt amortized). With 5 rounds the bound is
    // rounds-shaped: <= 5*5 + 5 = 30 regardless of how many merges the
    // batches carry — on sf0.001 that is >= 16 merges, i.e. strictly
    // fewer jobs than merges where the sequential shape needs 2x.
    val confs = Seq("spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      var merges = 0L
      val n = countJobs {
        merges = SparkEntry.queries("q271_bpe_batched_train")(
          spark, "/root/testdata/sf0.001").count()
      }
      assert(merges >= 16L, s"expected >= 16 merges, got $merges")
      assert(n <= 30, s"job count must be rounds-shaped (<= 30), got $n")
      assert(n < merges, s"jobs ($n) must undercut merges ($merges) — " +
        "the sequential shape can't")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
