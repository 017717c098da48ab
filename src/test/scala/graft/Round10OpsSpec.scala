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
}
