package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the physical plans, not just the results: no accidental
  * cartesian products, and pushdown/pruning actually reaching the scans
  * on representative queries (SURVEY.md "Optimize for scale"). */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  // Streaming queries execute on .start(), not a batch plan; RF trains on
  // collect. Audit the batch-planned queries.
  private val batchQueries = SparkEntry.queries.keys.toSeq.sorted
    .filterNot(Set("q44_streaming_bars", "q45_streaming_dedup",
      "q46_rf_accuracy", "q56_stream_stream_join"))

  test("no query plans a CartesianProduct") {
    batchQueries.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString()
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }

  test("filters are pushed to the parquet scan (q06)") {
    val plan = SparkEntry.queries("q06_forecast_revenue")(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      plan.contains("GreaterThanOrEqual(l_shipdate"), plan.take(2000))
  }

  test("column pruning reaches the scan (q02 reads only needed lineitem columns)") {
    val plan = SparkEntry.queries("q02_pricing_summary")(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("l_orderkey"),
      "q02 should not read l_orderkey")
  }

  test("dimension joins broadcast (q05)") {
    val plan = SparkEntry.queries("q05_local_supplier_volume")(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("whole-stage codegen covers the scan-agg pipeline (q02)") {
    // AQE hides codegen wrappers until the final plan exists — execute
    // first, then inspect.
    val df = SparkEntry.queries("q02_pricing_summary")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    // codegen stages print as "*(n) Operator" in the final plan
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan.take(2000))
  }
}
