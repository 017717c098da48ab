package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Event-sequence analytics over `events`: the behavioral queries a
  * training-data/product pipeline runs on interaction logs (reference
  * consumes the same per-user event stream in `streaming/consumer.py`).
  *
  * Determinism note shared by all three: per-user event order is
  * `(ts, event_id)`. The parquet carries nanosecond timestamps (Spark
  * reads them truncated to µs, DuckDB natively) — verified across all
  * three SFs that no two same-user events share a microsecond, so the
  * truncation cannot reorder; `event_id` is still there as the total-
  * order tiebreak. Second-granularity arithmetic floors on both sides
  * (Spark `cast(ts as long)`, DuckDB `floor(epoch(ts))`).
  */
object BehaviorQueries extends QueryPack {

  /** q160: first-order Markov transition matrix over per-user event
    * sequences — `lead` over (user_id; ts, event_id), then one count
    * shuffle on (from, to). The row-probability denominator rides the
    * SAME grouped output via a tiny window over the from-type (at most
    * |event_type|² rows reach it — nothing corpus-sized is windowed).
    * Probabilities are ratios of exact counts, rounded on both sides. */
  private def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(seq))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .withColumn("prob", round(
        col("n") / sum(col("n")).over(Window.partitionBy("from_type")), 6))
      .orderBy("from_type", "to_type")
  }

  /** q161: ordered conversion funnel signup → view → purchase. Each
    * stage's gate is "first qualifying event STRICTLY AFTER the prior
    * stage" — three chained conditional-min windows over the same
    * `user_id` partitioning, so the plan carries ONE exchange and three
    * Window nodes (no self-joins, no per-stage scans). Emits one row per
    * user with the stage reached and floor-second conversion latency. */
  private def eventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val byU = Window.partitionBy("user_id")
    Tables.events(spark, dir)
      .withColumn("s_ts",
        min(when(col("event_type") === "signup", col("ts"))).over(byU))
      .withColumn("v_ts",
        min(when(col("event_type") === "view" && col("ts") > col("s_ts"),
          col("ts"))).over(byU))
      .withColumn("p_ts",
        min(when(col("event_type") === "purchase" && col("ts") > col("v_ts"),
          col("ts"))).over(byU))
      .groupBy("user_id")
      .agg(first(col("s_ts")).as("s0"), first(col("v_ts")).as("v0"),
        first(col("p_ts")).as("p0"))
      .select(col("user_id"),
        when(col("p0").isNotNull, 3).when(col("v0").isNotNull, 2)
          .when(col("s0").isNotNull, 1).otherwise(0).as("funnel_stage"),
        (col("p0").cast("long") - col("s0").cast("long")).as("secs_to_convert"))
      .orderBy("user_id")
  }

  /** q162: interval-union coverage — each event claims [sec, sec+300);
    * covered seconds per user without double-counting overlaps. The
    * classic one-pass sweep: sort by start within the user, clamp each
    * interval's start to the running max end of everything before it.
    * One exchange + one window + one agg — never materializes the
    * pairwise overlap join a naive formulation would (O(n²) per hot
    * user at log scale). All arithmetic is integer seconds. */
  private def intervalCoverage(spark: SparkSession, dir: String): DataFrame = {
    val sweep = Window.partitionBy("user_id").orderBy("start_s", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("start_s"))
      .withColumn("end_s", col("start_s") + 300)
      .withColumn("prev_max_end",
        coalesce(max(col("end_s")).over(sweep), col("start_s")))
      .withColumn("contrib",
        greatest(col("end_s") - greatest(col("start_s"), col("prev_max_end")),
          lit(0L)))
      .groupBy("user_id")
      .agg(sum(col("contrib")).as("covered_secs"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** q172: rolling 7-day distinct active users per day — the DAU/WAU
    * retention metric. The naive shape (each day joins its trailing
    * week, COUNT DISTINCT per day — the oracle) recounts every user up
    * to 7×; this plans the sweep-line rewrite instead: per user, merge
    * overlapping [day, day+6] contribution intervals (gaps-and-islands,
    * one user-key window), emit ±1 boundary deltas, and take a running
    * sum over days. No count-distinct anywhere, no 7× row blowup, and
    * the only global window runs over DAY-cardinality rows (bounded by
    * the calendar, never by event volume). Equality with the per-day
    * COUNT DISTINCT oracle is the proof of the rewrite. */
  private def rollingActiveUsers(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val isl = ud
      .withColumn("gap", when(lag("day", 1).over(w).isNull
        || datediff(col("day"), lag("day", 1).over(w)) > 6, 1L).otherwise(0L))
      .withColumn("island", sum("gap").over(w))
    val iv = isl.groupBy("user_id", "island")
      .agg(min("day").as("s"), date_add(max("day"), 6).as("e"))
    // seed every EVENT day with a zero delta: the running sum must be
    // evaluated at all observation days, not only at island boundaries
    val deltas = iv.select(col("s").as("day"), lit(1L).as("d"))
      .unionAll(iv.select(date_add(col("e"), 1).as("day"), lit(-1L).as("d")))
      .unionAll(ud.select(col("day"), lit(0L).as("d")).distinct())
      .groupBy("day").agg(sum("d").as("delta"))
    val act = deltas.withColumn("active_users_7d",
      sum("delta").over(Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    act.join(ud.select("day").distinct(), Seq("day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("active_users_7d"))
      .orderBy("day")
  }

  /** q176: weekly retention cohort matrix — users grouped by first-seen
    * week, activity tracked by week offset. Week index is a raw integer
    * division of epoch seconds (no ISO-week convention to bridge across
    * engines). One user-key window finds each user's cohort; the
    * per-(cohort, offset) distinct-user count is a map-combinable
    * aggregate; the cohort-size denominator rides a window over the
    * already-aggregated matrix (≤ weeks² rows — calendar-bounded, never
    * event-bounded). Retention is a ratio of exact counts, rounded
    * identically on both sides. */
  private def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    val cells = Tables.events(spark, dir)
      .select(col("user_id"), (col("ts").cast("long") / 604800).cast("long").as("wk"))
      .withColumn("cohort_wk", min("wk").over(byUser))
      .withColumn("week_offset", col("wk") - col("cohort_wk"))
      .select("user_id", "cohort_wk", "week_offset").distinct()
      .groupBy("cohort_wk", "week_offset")
      .agg(count(lit(1)).as("active_users"))
    cells
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("active_users")))
          .over(Window.partitionBy("cohort_wk")))
      .withColumn("retention", round(col("active_users") / col("cohort_size"), 6))
      .orderBy("cohort_wk", "week_offset")
  }

  /** q177: last-touch revenue attribution — each purchase's value is
    * credited to the user's most recent PRECEDING non-purchase event
    * type (the touch "channel"); purchases with no prior touch fall to
    * 'direct'. One user-key window (`last(..., ignoreNulls)` over the
    * strictly-preceding frame — an O(n)-per-partition running carry,
    * not a per-row rescan), then one tiny channel aggregate. Values sum
    * in exact integer micro-units; doubles never accumulate. */
  private def lastTouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val carry = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(carry))
      .where(col("event_type") === "purchase")
      .select(coalesce(col("touch"), lit("direct")).as("channel"),
        round(col("value") * 1000000).cast("long").as("value_micro"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        sum("value_micro").as("attributed_micro"))
      .orderBy("channel")
  }

  /** q179: per-user activity bitmap — day-presence packed into ONE int64
    * (bit i = active on day i of a 64-day window) via `bit_or`
    * aggregation, distinct active days read back with `bit_count`. The
    * roaring-bitmap primitive at engine scale: per-user state is 8
    * bytes however many events they have, the aggregate is fully
    * map-side combinable, and bitmap intersections/unions across
    * cohorts become bitwise ops instead of set joins. The oracle
    * derives active_days via an independent COUNT(DISTINCT day) — the
    * popcount must match it user for user. */
  private def activityBitmap(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01")).as("idx"))
      .where(col("idx").between(0, 63))
      .select(col("user_id"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(idx AS INT))").as("bit"))
      .groupBy("user_id")
      .agg(expr("bit_or(bit)").as("bitmap"))
      .select(col("user_id"), col("bitmap"),
        bit_count(col("bitmap")).cast("bigint").as("active_days"))
      .orderBy("user_id")
  }

  /** q185: frequent-path mining — the top order-3 event-type paths
    * across all user journeys (the "common flows" product query;
    * order-3 where q160's Markov matrix is order-1). Two `lead`s ride
    * ONE user-key window exchange; the path census that follows groups
    * ≤ |event_type|³ keys, so the top-k sort sees a bounded input no
    * matter the corpus. Boundary ties break on path text — a total
    * order, same on both engines. */
  private def pathTrigrams(spark: SparkSession, dir: String): DataFrame = {
    val seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("t1"))
      .withColumn("t2", lead("t1", 1).over(seq))
      .withColumn("t3", lead("t1", 2).over(seq))
      .where(col("t3").isNotNull)
      .select(concat_ws(">", col("t1"), col("t2"), col("t3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(20)
  }

  /** q188: out-of-orderness profile — the stats that size a watermark.
    * Arrival order is event_id (the ingest sequence); an event is LATE
    * by how far the running max event time of everything that arrived
    * BEFORE it exceeds its own event time. One key-ordered window +
    * one aggregate; all integer seconds, the late fraction in exact
    * micro-units. */
  private def disorderProfile(spark: SparkSession, dir: String): DataFrame = {
    val arr = Window.partitionBy("event_type").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        col("ts").cast("long").as("t"))
      .withColumn("late_s",
        greatest(coalesce(max("t").over(arr) - col("t"), lit(0L)), lit(0L)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_s") > 0, 1L).otherwise(0L)).as("n_late"),
        max("late_s").as("max_late_s"),
        sum("late_s").as("sum_late_s"))
      .withColumn("late_frac_micro",
        expr("(1000000 * n_late) DIV n_events"))
      .orderBy("event_type")
  }

  /** q191: gaps-and-islands — longest consecutive-DAY activity streak per
    * user, the classic engagement metric. Distinct (user, day), then the
    * island key `day − row_number` is constant exactly across consecutive
    * days: two window functions over one `user_id` exchange, aggregates
    * over day-sized data. No self-join, no sequence materialization —
    * the shape that survives a 100 TB event log is exactly this
    * dedup → window → two tiny aggregates chain. */
  private def dailyStreaks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("d")
    Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .withColumn("island",
        datediff(col("d"), lit("2024-01-01").cast("date")) -
          row_number().over(w))
      .groupBy("user_id", "island").agg(count(lit(1)).as("streak"))
      .groupBy("user_id")
      .agg(sum("streak").as("n_days"), max("streak").as("best_streak"),
        count(lit(1)).as("n_streaks"))
      .orderBy("user_id")
  }

  /** q193: market-basket association rules at brand granularity —
    * support / confidence / lift for brand pairs co-bought in one order.
    * The pair generator self-joins the DISTINCT (order, brand) set on the
    * order key, so fan-out is bounded by (brands-per-order choose 2) —
    * never |lineitem|² — and the brand-marginal and total-order counts
    * broadcast (≤ |brands| rows) onto the pair aggregate. Confidence and
    * lift are integral-divide micro-units of exact counts: no float ever
    * forms, so the hash matches at any partitioning. */
  private def brandRules(spark: SparkSession, dir: String): DataFrame = {
    val ob = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
      .distinct()
    val totals = ob.agg(countDistinct("okey").as("n_orders"))
    val sup = ob.groupBy("brand").agg(count(lit(1)).as("sup"))
    val pairs = ob.as("a")
      .join(ob.as("b"),
        col("a.okey") === col("b.okey") && col("a.brand") < col("b.brand"))
      .groupBy(col("a.brand").as("brand_a"), col("b.brand").as("brand_b"))
      .agg(count(lit(1)).as("sup_ab"))
      .where(col("sup_ab") >= 5)
    pairs
      .join(broadcast(sup.select(col("brand").as("brand_a"),
        col("sup").as("sup_a"))), Seq("brand_a"))
      .join(broadcast(sup.select(col("brand").as("brand_b"),
        col("sup").as("sup_b"))), Seq("brand_b"))
      .crossJoin(broadcast(totals))
      .select(col("brand_a"), col("brand_b"), col("sup_ab"),
        expr("(1000000 * sup_ab) DIV sup_a").as("conf_ab_micro"),
        expr("(1000000 * sup_ab) DIV sup_b").as("conf_ba_micro"),
        expr("(1000000 * sup_ab * n_orders) DIV (sup_a * sup_b)")
          .as("lift_micro"))
      .orderBy("brand_a", "brand_b")
  }

  /** q249: association-rule mining (Agrawal–Srikant Apriori level 2) —
    * frequent item PAIRS with support / confidence (both directions) /
    * lift over (user, day) baskets of event types, the market-basket
    * census a behavioral pipeline derives recommendations from. Every
    * metric is an exact-integer ratio emitted in micro-units via
    * TRUNCATING division of positives (`div` / DuckDB `//` agree there
    * — the q227 no-float-division discipline); no ln, no doubles
    * anywhere on the surface.
    *
    * Scale shape: baskets are one distinct over the scan; the pair
    * stage self-joins WITHIN a basket only, and participation is gated
    * to baskets with ≤ 64 distinct items (the q170 quadratic-stage
    * guard — here the item domain is |event_type| so the cap never
    * binds, but at 100 TB it is what keeps one pathological basket from
    * emitting 10⁸ pairs). Pair counts aggregate with map-side combine
    * to an |items|²-bounded frame; item counts and the basket total are
    * broadcast back. Level-3 itemsets are the same plan with one more
    * bounded self-join. */
  private def associationRules(spark: SparkSession, dir: String): DataFrame = {
    val items = Tables.events(spark, dir)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type").as("item"))
      .distinct()
    val keep = items.groupBy("user_id", "day")
      .agg(count(lit(1)).as("sz")).where(col("sz") <= 64)
      .select("user_id", "day")
    val basketItems = items.join(keep, Seq("user_id", "day"), "left_semi")
    val nB = keep.agg(count(lit(1)).as("n_baskets"))
    val ic = basketItems.groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairs = basketItems.as("a").join(basketItems.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.day") === col("b.day") && col("a.item") < col("b.item"))
      .select(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= 5)
    pairs
      .join(broadcast(ic.select(col("item").as("item_a"),
        col("n_item").as("n_a"))), "item_a")
      .join(broadcast(ic.select(col("item").as("item_b"),
        col("n_item").as("n_b"))), "item_b")
      .crossJoin(broadcast(nB))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_ab"), col("n_baskets"),
        expr("1000000 * n_ab div n_baskets").as("support_micro"),
        expr("1000000 * n_ab div n_a").as("conf_ab_micro"),
        expr("1000000 * n_ab div n_b").as("conf_ba_micro"),
        expr("(1000000 * n_ab * n_baskets) div (n_a * n_b)").as("lift_micro"))
      .orderBy("item_a", "item_b")
  }

  /** q267: A/B TWO-PROPORTION Z-TEST — the experiment-analysis primitive:
    * users split 50/50 into variants by bit 33 of
    * fmix64(fnv1a64("ab:userId")) (the q262 hash discipline — the
    * assignment itself is deterministic and SQL-replayable, which a
    * production experiment system needs for re-analysis), outcome =
    * "user ever purchased", and the pooled two-proportion statistic
    * published as the SIGNED SQUARE (z² is χ²₁ — the q265 move, no
    * sqrt): z² = (k₁n₂−k₂n₁)²·N / (n₁n₂K(N−K)), emitted in micro with
    * the numerator and denominator widened to decimal(38,0)/HUGEINT
    * (d² alone brushes int64 at sf0.1 user counts). significant_95
    * compares against the χ²₁ 95% critical value 3.841459 in micro —
    * an exact integer comparison. On this fixture the split is null by
    * construction (assignment is independent of behavior), so the
    * expected verdict is NOT significant — the operator contract is
    * the exact arithmetic and the honest null.
    *
    * Scale shape: one pass to per-user conversion flags (map-side
    * combinable distinct-ish aggregate), one 2-group rollup, one 1-row
    * statistic. */
  private def abZtest(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashFunctions.{fmix64, fnv1a}
    // outcome: a heavy purchaser (>= 14 purchase events) — ">= 1" is
    // degenerate on this fixture (every user purchases → K = N and the
    // pooled variance is zero); 14 sits at the per-user purchase mean
    // (~13, SF-invariant by fixture construction) so both classes are
    // populated at every SF
    val users = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        >= 14L).cast("long").as("converted"))
      .withColumn("variant",
        shiftrightunsigned(fmix64(fnv1a(
          concat(lit("ab:"), col("user_id").cast("string")))), 33) % 2)
    val v = users.groupBy("variant")
      .agg(count(lit(1)).as("n"), sum("converted").as("k"))
    val wide = v.where(col("variant") === 0)
      .select(col("n").as("n1"), col("k").as("k1"))
      .crossJoin(broadcast(v.where(col("variant") === 1)
        .select(col("n").as("n2"), col("k").as("k2"))))
      .withColumn("d", col("k1") * col("n2") - col("k2") * col("n1"))
      .withColumn("nn", col("n1") + col("n2"))
      .withColumn("kk", col("k1") + col("k2"))
    wide.select(col("n1"), col("k1"), col("n2"), col("k2"),
        expr("(1000000 * k1) div n1").as("p1_micro"),
        expr("(1000000 * k2) div n2").as("p2_micro"),
        expr("CASE WHEN kk = 0 OR kk = nn THEN CAST(0 AS BIGINT) " +
          "WHEN d >= 0 THEN " +
          "(CAST(1000000 AS DECIMAL(38,0)) * d * d * nn) div " +
          "(CAST(n1 AS DECIMAL(38,0)) * n2 * kk * (nn - kk)) " +
          "ELSE -((CAST(1000000 AS DECIMAL(38,0)) * d * d * nn) div " +
          "(CAST(n1 AS DECIMAL(38,0)) * n2 * kk * (nn - kk))) END")
          .as("z2_signed_micro"))
      .withColumn("significant_95",
        abs(col("z2_signed_micro")) >= lit(3841459L))
  }

  /** q277: POPULATION STABILITY INDEX — the industry drift metric next
    * to q264's pairwise KL (PSI is what model-monitoring dashboards
    * actually alert on; Siddiqi's scorecard canon, same source as
    * q266's WOE): the purchase-value distribution of the first half of
    * the month (days 1–15, the "expected"/training window) against the
    * second half (days 16–30, "actual"/scoring), over 10 FIXED $50
    * cent bins (data-independent edges; the top bin absorbs the tail),
    * PSI = Σ_bins (pA − pB)·ln(pA/pB) with add-one smoothing over the
    * full bin domain (a domain frame makes empty bins count — the
    * q257/q264 move). The ln appears only at micro-nat quantization of
    * a ratio of exact integer products (the q266 WOE contract); the
    * distributions are micro-unit truncating ratios and every term is
    * the exact pico-unit product — the oracle replays everything, no
    * tolerance. On this fixture the split is calendar-arbitrary, so
    * PSI ≈ 0 is the honest expected reading (the q267 null-holds
    * discipline); the fixture spec drives a constructed drift.
    *
    * Scale shape: one map-side-combinable (side, bin) count + a
    * 10-row domain frame — the q257 one-pass profile shape. */
  private def psiDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .select(dayofmonth(col("ts")).as("d"),
        round(col("value") * 100).cast("long").as("cents"))
    val binned = ev.select(
      when(col("d") <= 15, "A").otherwise("B").as("side"),
      least(expr("cents div 5000"), lit(9L)).as("bin"))
    val counts = spark.range(0, 10).select(col("id").as("bin"))
      .join(binned.groupBy("bin").agg(
        sum(when(col("side") === "A", 1L).otherwise(0L)).as("ca"),
        sum(when(col("side") === "B", 1L).otherwise(0L)).as("cb")),
        Seq("bin"), "left")
      .select(col("bin"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = counts.agg(sum("ca").as("na"), sum("cb").as("nb"))
    // every count×count / 1e6×count product rides decimal(38,0) (HUGEINT
    // in the replay) before any divide or double-cast — in BIGINT the
    // ln arguments (ca+1)·(nb+10) wrap silently once a side holds a few
    // billion purchases while DuckDB raises (the q282 d_micro pattern)
    val terms = counts.crossJoin(broadcast(tot))
      .withColumn("pa_micro", expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0)) * (ca + 1))" +
          " DIV (na + 10) AS BIGINT)"))
      .withColumn("pb_micro", expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0)) * (cb + 1))" +
          " DIV (nb + 10) AS BIGINT)"))
      .withColumn("ln_micro", expr(
        "CAST(round(ln(CAST(CAST(ca + 1 AS DECIMAL(38,0)) * (nb + 10) AS DOUBLE) " +
          "/ CAST(CAST(cb + 1 AS DECIMAL(38,0)) * (na + 10) AS DOUBLE)) * 1e6) AS BIGINT)"))
      .withColumn("psi_term_pico",
        (col("pa_micro") - col("pb_micro")) * col("ln_micro"))
    terms.crossJoin(broadcast(
        terms.agg(sum("psi_term_pico").as("psi_total_pico"))))
      .select(col("bin"), col("ca"), col("cb"), col("pa_micro"),
        col("pb_micro"), col("ln_micro"), col("psi_term_pico"),
        col("psi_total_pico"))
      .orderBy("bin")
  }

  /** q280: KAPLAN–MEIER SURVIVAL (product-limit estimator, Kaplan &
    * Meier 1958 — public) in exact LOG space — the time-to-event tier
    * the funnel/retention family (q161/q176) stops short of: days from
    * each user's FIRST signup to their first purchase at-or-after it,
    * right-censored at the corpus horizon (max event day — users who
    * never convert contribute at-risk time, which a naive mean-delay
    * over converters gets wrong; that bias is the whole reason KM
    * exists). Per event day t: n_t = users still at risk (observation
    * time ≥ t, where T_u = delay if converted else horizon − signup),
    * d_t = conversions at t, and the survival curve as CUMULATIVE
    * micro-nat log: ls_cum(t) = Σ_{s ≤ t} round(ln((n_s−d_s)/n_s)·10⁶)
    * — the ln appears only at per-day quantization of a ratio of exact
    * integers (the q266/q277 contract) and the cumulative is an exact
    * integer sum, so the curve is hash-reproducible where the float
    * product Π(1−d/n) is not. A day with n = d sends survival to
    * exact zero (log −∞): such days are excluded from the curve and
    * surfaced in the `zero_tail` boolean instead — the honest
    * encoding. At-risk counts come from one censused (T, converted)
    * rollup + a strict-prefix window subtraction; every window runs
    * over the DAY domain (≤ the calendar span — the q261
    * domain-bounded move), never over users. */
  private def survivalKm(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      col("event_type"),
      expr("CAST(datediff(CAST(ts AS DATE), DATE'1970-01-01') AS BIGINT)")
        .as("day"))
    val s = ev.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min("day").as("sday"))
    val conv = s.join(
        ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("day").as("pday")), Seq("user_id"))
      .where(col("pday") >= col("sday"))
      .groupBy("user_id").agg(min(col("pday") - col("sday")).as("te"))
    val h = ev.agg(max("day").as("hday"))
    val obs = s.join(conv, Seq("user_id"), "left").crossJoin(broadcast(h))
      .select(col("user_id"),
        coalesce(col("te"), col("hday") - col("sday")).as("tt"),
        col("te").isNotNull.as("converted"))
    val ct = obs.groupBy("tt").agg(count(lit(1)).as("c"),
      sum(when(col("converted"), 1L).otherwise(0L)).as("d"))
    val wPrev = Window.orderBy("tt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = ct.crossJoin(broadcast(obs.agg(count(lit(1)).as("cohort"))))
      .withColumn("n_at_risk",
        col("cohort") - coalesce(sum("c").over(wPrev), lit(0L)))
      .where(col("d") > 0)
    // an n = d day absorbs every remaining at-risk user, so it is
    // necessarily the LAST event day — excluding it leaves a clean
    // prefix curve and the boolean carries the exact-zero tail
    val zero = risk.agg(
      (coalesce(max(when(col("n_at_risk") === col("d"), 1L).otherwise(0L)),
        lit(0L)) === 1L).as("zero_tail"))
    risk.where(col("n_at_risk") > col("d"))
      .withColumn("ls_step_micro", expr(
        "CAST(round(ln(CAST(n_at_risk - d AS DOUBLE) " +
          "/ CAST(n_at_risk AS DOUBLE)) * 1e6) AS BIGINT)"))
      .withColumn("ls_cum_micro", sum("ls_step_micro").over(
        Window.orderBy("tt").rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(zero))
      .select(col("tt").as("t"), col("cohort"), col("n_at_risk"),
        col("d").as("d_events"), col("ls_step_micro"), col("ls_cum_micro"),
        col("zero_tail"))
      .orderBy("t")
  }

  /** q282: TWO-SAMPLE KOLMOGOROV–SMIRNOV — the unbinned, exact
    * distribution-equality test completing the drift family (χ² q258
    * for categories, PSI q277 over fixed bins, KL q264 over models):
    * D = max_v |F_A(v) − F_B(v)| between the same calendar halves as
    * q277, computed EXACTLY as max |cumA·N_B − cumB·N_A| over the
    * distinct cent values (one value-key rollup + one cumulative
    * window over the ≤ max-cents value DOMAIN — the q261 bound; no
    * row-level global sort). Significance at α = 0.05 via the usual
    * squared comparison (the q251/q265/q269 move — no sqrt ever
    * evaluates): reject iff D² > c²·(N_A+N_B)/(N_A·N_B) with
    * c² = −ln(α/2)/2 = 1.8444 carried as the exact-enough integer
    * 18444/10⁴, cross-multiplied in decimal(38,0)/HUGEINT. On this
    * calendar-arbitrary split the honest expected verdict is
    * insignificant (the q267/q277 null-holds discipline); the fixture
    * spec drives a full shift to significance. */
  private def ksTwoSample(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .select(dayofmonth(col("ts")).as("d"),
        round(col("value") * 100).cast("long").as("cents"))
    val sided = ev.select(
      when(col("d") <= 15, 1L).otherwise(0L).as("isa"), col("cents"))
    val perV = sided.groupBy("cents").agg(
      sum(col("isa")).as("nav"), sum(lit(1L) - col("isa")).as("nbv"))
    val w = Window.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = sided.agg(sum("isa").as("na"),
      (count(lit(1)) - sum(col("isa"))).as("nb"))
    val dmax = perV
      .withColumn("cuma", sum("nav").over(w))
      .withColumn("cumb", sum("nbv").over(w))
      .crossJoin(broadcast(tot))
      .select(abs(col("cuma") * col("nb") - col("cumb") * col("na")).as("dn"))
      .agg(max("dn").as("d_num"))
    tot.crossJoin(broadcast(dmax))
      .select(col("na"), col("nb"), col("d_num"),
        // widened before the multiply: 1e6·d_num and na·nb both pass
        // through decimal(38,0) — BIGINT would wrap silently once
        // na·nb > ~9.2e12 (a few million purchases per side) while the
        // DuckDB replay raises; same discipline as ks_significant
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * d_num)
               | DIV (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"""
          .stripMargin).as("d_micro"),
        expr("""CAST(d_num AS DECIMAL(38,0)) * d_num * 10000
               | > CAST(18444 AS DECIMAL(38,0)) * na * nb * (na + nb)"""
          .stripMargin).as("ks_significant"))
  }

  /** q289: DETERMINISTIC NEGATIVE SAMPLING — the contrastive-training
    * data op (word2vec/recsys style) the sampling family (q94 rate,
    * q115 mixture, q278 weighted) is still missing: for every user's
    * positive set (distinct purchase days-of-month), draw up to 2
    * NEGATIVE days by hashed rejection — candidate c ∈ 0..7 maps to
    * day = fmix64(fnv1a("neg:user:c")) >>33 mod 31 + 1 (the q253/q262
    * finalized-hash discipline: raw FNV bits on sequential keys are
    * biased), candidates landing on a positive day or on an
    * already-drawn day are rejected, survivors rank by candidate
    * sequence. Fully deterministic: re-runs, retries, and the oracle
    * all draw the identical negatives — the property that makes
    * training-data generation reproducible and incrementally
    * extendable (a re-sampled shard is bit-identical).
    *
    * Scale shape: one distinct-rollup on (user, day), an 8-way
    * per-user candidate expansion (constant), one anti-join back on
    * (user, day), two user-keyed windows — no global sort, no
    * driver state. */
  private def negativeSampling(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashFunctions.{fmix64, fnv1a}
    val pos = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), dayofmonth(col("ts")).cast("long").as("day"))
      .distinct()
    val users = pos.groupBy("user_id").agg(count(lit(1)).as("n_pos_days"))
    val cand = users
      .select(col("user_id"), col("n_pos_days"),
        explode(sequence(lit(0), lit(7))).as("c"))
      .withColumn("day",
        shiftrightunsigned(fmix64(fnv1a(concat(lit("neg:"),
          col("user_id").cast("string"), lit(":"),
          col("c").cast("string")))), 33) % 31 + 1)
    val wDay = Window.partitionBy("user_id", "day").orderBy("c")
    val wUser = Window.partitionBy("user_id").orderBy("c")
    cand.join(pos, Seq("user_id", "day"), "left_anti")
      .withColumn("rn", row_number().over(wDay))
      .where(col("rn") === 1) // two candidates on the same day: first wins
      .withColumn("neg_rank", row_number().over(wUser).cast("long"))
      .where(col("neg_rank") <= 2)
      .select(col("user_id"), col("neg_rank"), col("c").cast("long")
        .as("cand_seq"), col("day").as("neg_day"), col("n_pos_days"))
      .orderBy("user_id", "neg_rank")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q289_negative_sampling" -> negativeSampling,
    "q282_ks_two_sample" -> ksTwoSample,
    "q280_survival_km" -> survivalKm,
    "q277_psi_drift" -> psiDrift,
    "q267_ab_ztest" -> abZtest,
    "q249_association_rules" -> associationRules,
    "q160_markov_transitions" -> markovTransitions,
    "q191_daily_streaks" -> dailyStreaks,
    "q193_brand_rules" -> brandRules,
    "q185_path_trigrams" -> pathTrigrams,
    "q188_disorder_profile" -> disorderProfile,
    "q176_cohort_retention" -> cohortRetention,
    "q177_last_touch_attribution" -> lastTouchAttribution,
    "q179_activity_bitmap" -> activityBitmap,
    "q161_event_funnel" -> eventFunnel,
    "q162_interval_coverage" -> intervalCoverage,
    "q172_rolling_active_users" -> rollingActiveUsers
  )

  override def oracles: Map[String, String] = Map(
    // positives, the fmix64 candidate chain (split-32/32 mulmod), the
    // rejection anti-join, same-day dedupe, and ranking replayed
    "q289_negative_sampling" -> {
      def fnv(e: String): String =
        s"""list_reduce(
           |    list_prepend(CAST(14695981039346656037 AS UBIGINT),
           |      list_transform(regexp_split_to_array($e, ''),
           |                     c -> CAST(unicode(c) AS UBIGINT))),
           |    (a, b) -> CAST((CAST(xor(a, b) AS HUGEINT) * 1099511628211)
           |                   % 18446744073709551616 AS UBIGINT))""".stripMargin
      def mulmod(x: String, cHi: Long, cLo: Long) =
        s"CAST(((CAST($x AS HUGEINT) * $cLo) % 18446744073709551616" +
          s" + ((($x % 4294967296) * $cHi) % 4294967296) * 4294967296)" +
          s" % 18446744073709551616 AS UBIGINT)"
      def xs33(x: String) = s"xor($x, $x // 8589934592)"
      def fmixed(e: String) = xs33(mulmod(xs33(mulmod(xs33(fnv(e)),
        4283543511L, 3981806797L)), 3301882366L, 444984403L))
      val h = fmixed("'neg:' || CAST(u.user_id AS VARCHAR)" +
        " || ':' || CAST(c.c AS VARCHAR)")
      s"""WITH pos AS (
         |  SELECT DISTINCT user_id,
         |         CAST(day(CAST(ts AS TIMESTAMP)) AS BIGINT) AS day
         |  FROM events WHERE event_type = 'purchase'),
         |u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_pos_days
         |      FROM pos GROUP BY 1),
         |cand AS (
         |  SELECT u.user_id, u.n_pos_days, c.c,
         |         CAST(($h) // 8589934592 % 31 + 1 AS BIGINT) AS day
         |  FROM u, (SELECT unnest(range(0, 8)) AS c) c),
         |np AS (
         |  SELECT cand.* FROM cand
         |  LEFT JOIN pos ON pos.user_id = cand.user_id
         |               AND pos.day = cand.day
         |  WHERE pos.user_id IS NULL),
         |fd AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id, day
         |                               ORDER BY c) AS rn
         |  FROM np),
         |rk AS (
         |  SELECT user_id, n_pos_days, c, day,
         |         row_number() OVER (PARTITION BY user_id ORDER BY c)
         |           AS neg_rank
         |  FROM fd WHERE rn = 1)
         |SELECT user_id, CAST(neg_rank AS BIGINT) AS neg_rank,
         |       CAST(c AS BIGINT) AS cand_seq, day AS neg_day, n_pos_days
         |FROM rk WHERE neg_rank <= 2
         |ORDER BY user_id, neg_rank""".stripMargin
    },
    // per-value census, cumulative ECDF numerators, the exact D
    // numerator and the cross-multiplied squared-z verdict replayed
    "q282_ks_two_sample" ->
      """WITH e AS (
        |  SELECT day(CAST(ts AS TIMESTAMP)) AS d,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT CASE WHEN d <= 15 THEN 1 ELSE 0 END AS isa, cents FROM e),
        |v AS (SELECT cents, CAST(sum(isa) AS BIGINT) AS nav,
        |             CAST(sum(1 - isa) AS BIGINT) AS nbv
        |      FROM s GROUP BY 1),
        |c AS (SELECT cents, nav, nbv,
        |        CAST(sum(nav) OVER (ORDER BY cents
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cuma,
        |        CAST(sum(nbv) OVER (ORDER BY cents
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cumb
        |      FROM v),
        |t AS (SELECT CAST(sum(isa) AS BIGINT) AS na,
        |             CAST(count(*) - sum(isa) AS BIGINT) AS nb FROM s),
        |m AS (SELECT CAST(max(abs(cuma * nb - cumb * na)) AS BIGINT) AS d_num
        |      FROM c, t)
        |SELECT na, nb, d_num,
        |       CAST((CAST(1000000 AS HUGEINT) * d_num)
        |            // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS d_micro,
        |       CAST(d_num AS HUGEINT) * d_num * 10000
        |         > CAST(18444 AS HUGEINT) * na * nb * (na + nb)
        |         AS ks_significant
        |FROM t, m""".stripMargin,
    // cohort, first-signup/first-conversion delays, horizon censoring,
    // at-risk census via the strict-prefix window, per-day quantized
    // log terms and the cumulative curve replayed
    "q280_survival_km" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
        |  FROM events),
        |s AS (SELECT user_id, min(day) AS sday FROM e
        |      WHERE event_type = 'signup' GROUP BY 1),
        |cv AS (SELECT s.user_id, min(p.day - s.sday) AS te
        |       FROM s JOIN e p ON p.user_id = s.user_id
        |        AND p.event_type = 'purchase' AND p.day >= s.sday
        |       GROUP BY 1),
        |h AS (SELECT max(day) AS hday FROM e),
        |obs AS (SELECT s.user_id,
        |          coalesce(cv.te, h.hday - s.sday) AS tt,
        |          cv.te IS NOT NULL AS converted
        |        FROM s LEFT JOIN cv ON cv.user_id = s.user_id, h),
        |ct AS (SELECT tt, count(*) AS c,
        |         CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS d
        |       FROM obs GROUP BY 1),
        |coh AS (SELECT count(*) AS cohort FROM obs),
        |risk0 AS (
        |  SELECT ct.tt, ct.d, coh.cohort,
        |         coh.cohort - CAST(coalesce(sum(ct.c) OVER (ORDER BY ct.tt
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS n_at_risk
        |  FROM ct, coh),
        |risk AS (SELECT * FROM risk0 WHERE d > 0),
        |z AS (SELECT coalesce(max(CASE WHEN n_at_risk = d THEN 1 ELSE 0 END), 0)
        |        = 1 AS zero_tail FROM risk),
        |curve AS (
        |  SELECT tt, cohort, n_at_risk, d,
        |         CAST(round(ln(CAST(n_at_risk - d AS DOUBLE)
        |           / CAST(n_at_risk AS DOUBLE)) * 1e6) AS BIGINT)
        |           AS ls_step_micro
        |  FROM risk WHERE n_at_risk > d)
        |SELECT tt AS t, CAST(cohort AS BIGINT) AS cohort, n_at_risk,
        |       d AS d_events, ls_step_micro,
        |       CAST(sum(ls_step_micro) OVER (ORDER BY tt
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS ls_cum_micro,
        |       (SELECT zero_tail FROM z) AS zero_tail
        |FROM curve ORDER BY t""".stripMargin,
    // bins, domain join, smoothed micro distributions, quantized
    // ln terms and both rollups replayed; sums CAST from HUGEINT
    "q277_psi_drift" ->
      """WITH e AS (
        |  SELECT day(CAST(ts AS TIMESTAMP)) AS d,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT CASE WHEN d <= 15 THEN 'A' ELSE 'B' END AS side,
        |             least(cents // 5000, 9) AS bin FROM e),
        |dom AS (SELECT unnest(range(0, 10)) AS bin),
        |c AS (SELECT dom.bin,
        |        CAST(coalesce(sum(CASE WHEN side = 'A' THEN 1 ELSE 0 END), 0)
        |          AS BIGINT) AS ca,
        |        CAST(coalesce(sum(CASE WHEN side = 'B' THEN 1 ELSE 0 END), 0)
        |          AS BIGINT) AS cb
        |      FROM dom LEFT JOIN b ON b.bin = dom.bin GROUP BY 1),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |             CAST(sum(cb) AS BIGINT) AS nb FROM c),
        |x AS (SELECT c.bin, c.ca, c.cb,
        |        CAST((CAST(1000000 AS HUGEINT) * (ca + 1))
        |             // (na + 10) AS BIGINT) AS pa_micro,
        |        CAST((CAST(1000000 AS HUGEINT) * (cb + 1))
        |             // (nb + 10) AS BIGINT) AS pb_micro,
        |        CAST(round(ln(CAST(CAST(ca + 1 AS HUGEINT) * (nb + 10) AS DOUBLE)
        |          / CAST(CAST(cb + 1 AS HUGEINT) * (na + 10) AS DOUBLE)) * 1e6)
        |          AS BIGINT) AS ln_micro
        |      FROM c, t),
        |y AS (SELECT *, (pa_micro - pb_micro) * ln_micro AS psi_term_pico
        |      FROM x)
        |SELECT CAST(bin AS BIGINT) AS bin, ca, cb,
        |       CAST(pa_micro AS BIGINT) AS pa_micro,
        |       CAST(pb_micro AS BIGINT) AS pb_micro,
        |       ln_micro,
        |       CAST(psi_term_pico AS BIGINT) AS psi_term_pico,
        |       (SELECT CAST(sum(psi_term_pico) AS BIGINT) FROM y)
        |         AS psi_total_pico
        |FROM y ORDER BY bin""".stripMargin,
    // Hash assignment (fnv + fmix64 in UBIGINT/HUGEINT, the q262
    // replay), per-variant rollup and the signed-square statistic
    // replayed exactly.
    "q267_ab_ztest" -> {
      def fnv(e: String): String =
        s"""list_reduce(
           |    list_prepend(CAST(14695981039346656037 AS UBIGINT),
           |      list_transform(regexp_split_to_array($e, ''),
           |                     c -> CAST(unicode(c) AS UBIGINT))),
           |    (a, b) -> CAST((CAST(xor(a, b) AS HUGEINT) * 1099511628211)
           |                   % 18446744073709551616 AS UBIGINT))""".stripMargin
      def mulmod(x: String, cHi: Long, cLo: Long) =
        s"CAST(((CAST($x AS HUGEINT) * $cLo) % 18446744073709551616" +
          s" + ((($x % 4294967296) * $cHi) % 4294967296) * 4294967296)" +
          s" % 18446744073709551616 AS UBIGINT)"
      def xs33(x: String) = s"xor($x, $x // 8589934592)"
      def fmixed(e: String) = xs33(mulmod(xs33(mulmod(xs33(fnv(e)),
        4283543511L, 3981806797L)), 3301882366L, 444984403L))
      s"""WITH u AS (
         |  SELECT user_id,
         |         CASE WHEN sum(CASE WHEN event_type = 'purchase'
         |                            THEN 1 ELSE 0 END) >= 14
         |              THEN 1 ELSE 0 END AS converted,
         |         CAST((${fmixed("'ab:' || CAST(user_id AS VARCHAR)")})
         |           // 8589934592 % 2 AS BIGINT) AS variant
         |  FROM events GROUP BY user_id),
         |v AS (
         |  SELECT variant, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(converted) AS BIGINT) AS k
         |  FROM u GROUP BY 1),
         |w AS (
         |  SELECT a.n AS n1, a.k AS k1, b.n AS n2, b.k AS k2,
         |         a.k * b.n - b.k * a.n AS d,
         |         a.n + b.n AS nn, a.k + b.k AS kk
         |  FROM (SELECT * FROM v WHERE variant = 0) a
         |  CROSS JOIN (SELECT * FROM v WHERE variant = 1) b)
         |SELECT n1, k1, n2, k2,
         |       (1000000 * k1) // n1 AS p1_micro,
         |       (1000000 * k2) // n2 AS p2_micro,
         |       CAST(CASE WHEN kk = 0 OR kk = nn THEN 0 WHEN d >= 0 THEN
         |         (CAST(1000000 AS HUGEINT) * d * d * nn)
         |           // (CAST(n1 AS HUGEINT) * n2 * kk * (nn - kk))
         |       ELSE -((CAST(1000000 AS HUGEINT) * d * d * nn)
         |           // (CAST(n1 AS HUGEINT) * n2 * kk * (nn - kk))) END
         |         AS BIGINT) AS z2_signed_micro,
         |       abs(CAST(CASE WHEN kk = 0 OR kk = nn THEN 0 WHEN d >= 0 THEN
         |         (CAST(1000000 AS HUGEINT) * d * d * nn)
         |           // (CAST(n1 AS HUGEINT) * n2 * kk * (nn - kk))
         |       ELSE -((CAST(1000000 AS HUGEINT) * d * d * nn)
         |           // (CAST(n1 AS HUGEINT) * n2 * kk * (nn - kk))) END
         |         AS BIGINT)) >= 3841459 AS significant_95
         |FROM w""".stripMargin
    },
    // Baskets, the ≤64-item gate, pair/item/basket counts, and every
    // micro-unit ratio replayed; `//` on positive BIGINTs truncates
    // exactly like Spark's `div`.
    "q249_association_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day,
        |                  event_type AS item
        |  FROM events),
        |keep AS (
        |  SELECT user_id, day FROM items
        |  GROUP BY 1, 2 HAVING count(*) <= 64),
        |bi AS (
        |  SELECT items.* FROM items JOIN keep USING (user_id, day)),
        |nb AS (SELECT count(*) AS n_baskets FROM keep),
        |ic AS (SELECT item, count(*) AS n_item FROM bi GROUP BY 1),
        |pairs AS (
        |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
        |  FROM bi a JOIN bi b
        |    ON a.user_id = b.user_id AND a.day = b.day AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT item_a, item_b,
        |       ia.n_item AS n_a, ib.n_item AS n_b, n_ab, nb.n_baskets,
        |       1000000 * n_ab // nb.n_baskets AS support_micro,
        |       1000000 * n_ab // ia.n_item AS conf_ab_micro,
        |       1000000 * n_ab // ib.n_item AS conf_ba_micro,
        |       (1000000 * n_ab * nb.n_baskets) // (ia.n_item * ib.n_item)
        |         AS lift_micro
        |FROM pairs
        |JOIN ic ia ON ia.item = pairs.item_a
        |JOIN ic ib ON ib.item = pairs.item_b
        |CROSS JOIN nb
        |ORDER BY item_a, item_b""".stripMargin,
    "q191_daily_streaks" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |i AS (
        |  SELECT user_id, d,
        |         d - DATE '2024-01-01'
        |           - row_number() OVER (PARTITION BY user_id ORDER BY d)
        |           AS island
        |  FROM d),
        |s AS (
        |  SELECT user_id, island, count(*) AS streak
        |  FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(streak) AS BIGINT) AS n_days,
        |       max(streak) AS best_streak, count(*) AS n_streaks
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q193_brand_rules" ->
      """WITH ob AS (
        |  SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |t AS (SELECT count(DISTINCT okey) AS n_orders FROM ob),
        |sup AS (SELECT brand, count(*) AS sup FROM ob GROUP BY 1),
        |pairs AS (
        |  SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS sup_ab
        |  FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT p.brand_a, p.brand_b, p.sup_ab,
        |       (1000000 * p.sup_ab) // sa.sup AS conf_ab_micro,
        |       (1000000 * p.sup_ab) // sb.sup AS conf_ba_micro,
        |       (1000000 * p.sup_ab * t.n_orders) // (sa.sup * sb.sup)
        |         AS lift_micro
        |FROM pairs p
        |JOIN sup sa ON sa.brand = p.brand_a
        |JOIN sup sb ON sb.brand = p.brand_b
        |CROSS JOIN t
        |ORDER BY brand_a, brand_b""".stripMargin,
    "q188_disorder_profile" ->
      """WITH a AS (
        |  SELECT event_type, event_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |         max(CAST(floor(epoch(ts)) AS BIGINT))
        |           OVER (PARTITION BY event_type ORDER BY event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING
        |                   AND 1 PRECEDING) AS runmax
        |  FROM events),
        |l AS (
        |  SELECT event_type,
        |         greatest(coalesce(runmax - t, 0), 0) AS late_s
        |  FROM a),
        |g AS (
        |  SELECT event_type, count(*) AS n_events,
        |         CAST(sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_late,
        |         max(late_s) AS max_late_s,
        |         CAST(sum(late_s) AS BIGINT) AS sum_late_s
        |  FROM l GROUP BY 1)
        |SELECT event_type, n_events, n_late, max_late_s, sum_late_s,
        |       (1000000 * n_late) // n_events AS late_frac_micro
        |FROM g ORDER BY event_type""".stripMargin,
    "q185_path_trigrams" ->
      """WITH s AS (
        |  SELECT event_type AS t1,
        |         lead(event_type, 1) OVER (PARTITION BY user_id
        |                                   ORDER BY ts, event_id) AS t2,
        |         lead(event_type, 2) OVER (PARTITION BY user_id
        |                                   ORDER BY ts, event_id) AS t3
        |  FROM events),
        |c AS (
        |  SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS n
        |  FROM s WHERE t3 IS NOT NULL GROUP BY 1)
        |SELECT path, n FROM c ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "q176_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
        |  FROM events),
        |c AS (
        |  SELECT user_id, wk,
        |         min(wk) OVER (PARTITION BY user_id) AS cohort_wk
        |  FROM e),
        |m AS (
        |  SELECT cohort_wk, wk - cohort_wk AS week_offset,
        |         count(DISTINCT user_id) AS active_users
        |  FROM c GROUP BY 1, 2),
        |s AS (
        |  SELECT *, max(CASE WHEN week_offset = 0 THEN active_users END)
        |              OVER (PARTITION BY cohort_wk) AS cohort_size
        |  FROM m)
        |SELECT cohort_wk, week_offset, active_users, cohort_size,
        |       round(CAST(active_users AS DOUBLE) / cohort_size, 6) AS retention
        |FROM s ORDER BY cohort_wk, week_offset""".stripMargin,
    "q177_last_touch_attribution" ->
      """WITH t AS (
        |  SELECT user_id, event_type, value,
        |         last_value(CASE WHEN event_type <> 'purchase'
        |                         THEN event_type END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS touch
        |  FROM events)
        |SELECT coalesce(touch, 'direct') AS channel,
        |       count(*) AS n_purchases,
        |       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
        |         AS attributed_micro
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY channel""".stripMargin,
    // active_days via an INDEPENDENT COUNT(DISTINCT day) — hash equality
    // proves the engine's popcount-over-bit_or path.
    "q179_activity_bitmap" ->
      """WITH d AS (
        |  SELECT user_id,
        |         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS idx
        |  FROM events
        |  WHERE date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |          BETWEEN 0 AND 63)
        |SELECT user_id,
        |       bit_or(CAST(1 AS BIGINT) << CAST(idx AS INTEGER)) AS bitmap,
        |       count(DISTINCT idx) AS active_days
        |FROM d GROUP BY 1 ORDER BY user_id""".stripMargin,
    // the naive trailing-week COUNT DISTINCT — the sweep-line result
    // must equal it day for day
    "q172_rolling_active_users" ->
      """WITH ud AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |d AS (SELECT DISTINCT day FROM ud)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day,
        |       count(DISTINCT ud.user_id) AS active_users_7d
        |FROM d JOIN ud ON ud.day BETWEEN d.day - 6 AND d.day
        |GROUP BY d.day ORDER BY day""".stripMargin,
    "q160_markov_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |       round(CAST(n AS DOUBLE)
        |             / sum(n) OVER (PARTITION BY from_type), 6) AS prob
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "q161_event_funnel" ->
      """WITH a AS (
        |  SELECT *, min(CASE WHEN event_type = 'signup' THEN ts END)
        |              OVER (PARTITION BY user_id) AS s_ts
        |  FROM events),
        |b AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' AND ts > s_ts THEN ts END)
        |              OVER (PARTITION BY user_id) AS v_ts
        |  FROM a),
        |c AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > v_ts THEN ts END)
        |              OVER (PARTITION BY user_id) AS p_ts
        |  FROM b)
        |SELECT DISTINCT user_id,
        |       CASE WHEN p_ts IS NOT NULL THEN 3
        |            WHEN v_ts IS NOT NULL THEN 2
        |            WHEN s_ts IS NOT NULL THEN 1 ELSE 0 END AS funnel_stage,
        |       CAST(floor(epoch(p_ts)) AS BIGINT)
        |         - CAST(floor(epoch(s_ts)) AS BIGINT) AS secs_to_convert
        |FROM c ORDER BY user_id""".stripMargin,
    "q162_interval_coverage" ->
      """WITH iv AS (
        |  SELECT user_id, event_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS start_s,
        |         CAST(floor(epoch(ts)) AS BIGINT) + 300 AS end_s
        |  FROM events),
        |sw AS (
        |  SELECT user_id, start_s, end_s,
        |         coalesce(max(end_s) OVER (PARTITION BY user_id
        |                                   ORDER BY start_s, event_id
        |                                   ROWS BETWEEN UNBOUNDED PRECEDING
        |                                     AND 1 PRECEDING),
        |                  start_s) AS prev_max_end
        |  FROM iv)
        |SELECT user_id,
        |       CAST(sum(greatest(end_s - greatest(start_s, prev_max_end), 0))
        |            AS BIGINT) AS covered_secs,
        |       count(*) AS n_events
        |FROM sw GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
