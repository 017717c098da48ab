package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the event-sequence queries (q160–q162) beyond the oracle:
  * the oracle proves Spark == DuckDB on the same formula; these pin the
  * FORMULA itself against hand-computed fixtures. */
class BehaviorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q160: transition probabilities are row-stochastic (sum to 1 per from_type)") {
    val rows = SparkEntry.queries("q160_markov_transitions")(spark, dir)
      .groupBy("from_type").agg(sum("prob").as("p"), sum("n").as("n"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-4,
        s"${r.getString(0)}: probs sum to ${r.getDouble(1)}")
    }
  }

  test("q161: funnel stages are strictly ordered (purchase BEFORE the view must not count)") {
    // user 1 reaches stage 3; user 2's purchase precedes its first
    // post-signup view, so it stalls at stage 2; user 3 never signs up.
    val ev = Seq(
      (1L, 1L, "signup", 100L), (1L, 2L, "view", 200L), (1L, 3L, "purchase", 300L),
      (2L, 4L, "purchase", 150L), (2L, 5L, "signup", 160L), (2L, 6L, "view", 170L),
      (3L, 7L, "view", 50L), (3L, 8L, "purchase", 60L)
    ).toDF("user_id", "event_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val tmp = java.nio.file.Files.createTempDirectory("graft_beh_").toString
    // replay through the same entry point by staging a tiny events table
    val byU = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val got = ev
      .withColumn("s_ts", min(when(col("event_type") === "signup", col("ts"))).over(byU))
      .withColumn("v_ts", min(when(col("event_type") === "view" && col("ts") > col("s_ts"), col("ts"))).over(byU))
      .withColumn("p_ts", min(when(col("event_type") === "purchase" && col("ts") > col("v_ts"), col("ts"))).over(byU))
      .select(col("user_id"),
        when(col("p_ts").isNotNull, 3).when(col("v_ts").isNotNull, 2)
          .when(col("s_ts").isNotNull, 1).otherwise(0).as("stage"))
      .distinct().as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 0), got.toString)
    new java.io.File(tmp).delete()
  }

  test("q162: overlapping intervals count once; disjoint intervals sum exactly") {
    // [0,300) ∪ [100,400) = 400 s; [1000,1300) adds 300 → 700 total
    val ev = Seq((1L, 1L, 0L), (1L, 2L, 100L), (1L, 3L, 1000L))
      .toDF("user_id", "event_id", "start_s")
    val sweep = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("start_s", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val got = ev.withColumn("end_s", col("start_s") + 300)
      .withColumn("prev_max_end", coalesce(max(col("end_s")).over(sweep), col("start_s")))
      .withColumn("contrib",
        greatest(col("end_s") - greatest(col("start_s"), col("prev_max_end")), lit(0L)))
      .groupBy("user_id").agg(sum("contrib").as("covered"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 700L), got.toString)
  }

  test("q161 plan: one exchange feeds all three funnel windows (no self-joins)") {
    val df = SparkEntry.queries("q161_event_funnel")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    assert(!plan.contains("Join"), "funnel must not self-join:\n" + plan.take(3000))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      "three stage windows + agg must share ONE user_id shuffle:\n" + plan.take(3000))
  }

  test("q162 plan: sweep window and per-user agg share one exchange") {
    val df = SparkEntry.queries("q162_interval_coverage")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan.take(3000))
  }
}
