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

  test("q172 sweep formula: island merge, expiry after 7 days, mid-island day counted") {
    // u1 active days 1,3 (one merged island [1..9]); u2 active day 1
    // only (island [1..7]); day 8: u2 expired, u1 still covered by the
    // day-3 contribution; day 10: everyone expired but u3 appears
    def d(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val ev = Seq(
      (1L, d(1)), (1L, d(3)), (2L, d(1)), (1L, d(8)), (3L, d(10))
    ).toDF("user_id", "ts")
    // same pipeline as the query, against the fixture
    import org.apache.spark.sql.expressions.Window
    val ud = ev.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val isl = ud
      .withColumn("gap", when(lag("day", 1).over(w).isNull
        || datediff(col("day"), lag("day", 1).over(w)) > 6, 1L).otherwise(0L))
      .withColumn("island", sum("gap").over(w))
    val iv = isl.groupBy("user_id", "island")
      .agg(min("day").as("s"), date_add(max("day"), 6).as("e"))
    val deltas = iv.select(col("s").as("day"), lit(1L).as("d"))
      .unionAll(iv.select(date_add(col("e"), 1).as("day"), lit(-1L).as("d")))
      .unionAll(ud.select(col("day"), lit(0L).as("d")).distinct())
      .groupBy("day").agg(sum("d").as("delta"))
    val got = deltas.withColumn("n",
        sum("delta").over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(ud.select("day").distinct(), Seq("day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"))
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "2024-01-01" -> 2L, // u1 + u2
      "2024-01-03" -> 2L, // both still in-window
      "2024-01-08" -> 1L, // u2's day-1 expired; u1 re-upped day 8 (merged island)
      "2024-01-10" -> 2L  // u1 (day 8 still covers) + u3
    ), got.toString)
  }
}
