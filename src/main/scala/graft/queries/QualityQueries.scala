package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.quality.{Otsu, Profile}
import graft.tables.Tables

/** Data-quality queries (round 3): the profiling gate a pipeline runs on
  * every new data drop before it reaches training (see
  * [[graft.quality.Profile]]). */
object QualityQueries extends QueryPack {

  /** q100: full column profile of `orders` — counts, nulls, exact
    * cardinality, typed min/max — in one scan + one aggregation. */
  private def ordersProfile(spark: SparkSession, dir: String): DataFrame =
    Profile.profile(Tables.orders(spark, dir), profiledCols)

  private val profiledCols = Seq(
    "o_orderkey" -> true,
    "o_custkey" -> true,
    "o_totalprice" -> true,
    "o_orderstatus" -> false,
    "o_orderpriority" -> false)

  /** q110: the 100 TB profile path driver-visibly exercised —
    * [[Profile.profileApprox]] (HLL++, NO Expand anywhere in the plan)
    * validated in-query against an Expand-free exact distinct: the
    * profiled columns are STACKED into (col_name, value) rows by an
    * explicit explode, after which ONE single-distinct-column aggregate
    * covers every column (a single distinct set plans as two ordinary
    * hash aggregations — partial dedup on (col_name, value), then count —
    * never an Expand). Output carries the exact metrics (hash-checked)
    * plus a q55-style tolerance boolean on the HLL estimate; the oracle
    * asserts TRUE, so the driver fails if Spark's sketch ever drifts
    * outside ±10%. (HLL rsd is 5%; estimates on this fixture land within
    * 1–2%, and the small-cardinality columns resolve exactly in sparse
    * mode — 10% is the standard ~2-sigma guard band.) */
  private def ordersProfileApprox(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, dir)
    val ap = Profile.profileApprox(orders, profiledCols)
      .withColumnRenamed("n_distinct", "nd_approx")
    val stacked = orders.select(explode(array(profiledCols.map { case (c, _) =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v")) }: _*)).as("s"))
      .select("s.col_name", "s.v")
    val exact = stacked.groupBy("col_name")
      .agg(count_distinct(col("v")).as("n_distinct"))
    ap.join(exact, "col_name") // 5 rows vs 5 rows — broadcast
      .select(col("col_name"), col("n_rows"), col("n_nonnull"), col("n_null"),
        col("n_distinct"), col("min_num"), col("max_num"),
        col("min_str"), col("max_str"),
        (abs(col("nd_approx") - col("n_distinct")).cast("double")
          / col("n_distinct") <= 0.10).as("approx_ok"))
      .orderBy("col_name")
  }

  /** q108: snapshot reconciliation — diff two synthetic versions of
    * `orders` (old = keys not divisible by 11; new = keys not divisible
    * by 13, price doubled where divisible by 7) and aggregate per
    * status. One full-outer key join; integer cents keep the sums exact. */
  private def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"))
    val oldSnap = base.where(col("o_orderkey") % 11 =!= 0)
    val newSnap = base.where(col("o_orderkey") % 13 =!= 0)
      .withColumn("price_c",
        when(col("o_orderkey") % 7 === 0, col("price_c") * 2)
          .otherwise(col("price_c")))
    graft.ops.Reconcile.diff(oldSnap, newSnap, "o_orderkey", Seq("price_c"))
      .groupBy("diff_status")
      .agg(count(lit(1)).as("n_keys"),
        min("o_orderkey").as("first_key"),
        sum(coalesce(col("new_price_c"), lit(0L))).as("sum_new_c"))
      .orderBy("diff_status")
  }

  /** q116: incremental aggregate maintenance — the per-status orders
    * rollup refreshed by MERGING the stored history partials with the new
    * drop's partials (o_orderkey % 5 == 4 plays the delta), never
    * rescanning history rows into the final agg. The oracle recomputes
    * the rollup from scratch, so the hash-match IS the proof that
    * partial-merge == full recompute (see [[graft.ops.IncrementalAgg]]). */
  private def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.ops.IncrementalAgg
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"))
    val keys = Seq("o_orderstatus")
    val mv = IncrementalAgg.merge(Seq(
      IncrementalAgg.partials(orders.where(col("o_orderkey") % 5 =!= 4),
        keys, col("price_c")),
      IncrementalAgg.partials(orders.where(col("o_orderkey") % 5 === 4),
        keys, col("price_c"))), keys)
    mv.select(col("o_orderstatus"), col("n").as("n_orders"),
        round(col("sum_m") / 100.0, 2).as("sum_price"),
        (col("min_m") / 100.0).as("min_price"),
        (col("max_m") / 100.0).as("max_price"),
        ((col("sum_m").cast("double") / col("n")) / 100.0).as("avg_price"))
      .orderBy("o_orderstatus")
  }

  /** q173: incremental JOIN-view maintenance — q116's partial-merge
    * discipline applied to a two-table join view. The enriched-orders
    * view V = orders ⋈ customer is refreshed from append deltas
    * (ΔO = every 10th order, ΔC = every 20th customer) by the standard
    * delta algebra: V_new = V_old ∪ (ΔO ⋈ C_new) ∪ (O_old ⋈ ΔC) —
    * three DISJOINT legs, so the refresh joins only delta-sized inputs
    * against the full sides (broadcast-able deltas at scale); the
    * already-materialized V_old is reused, never recomputed. The
    * oracle recomputes the full join from scratch — the hash-match IS
    * the proof that the delta algebra loses and duplicates nothing. */
  private def incrementalJoinView(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, dir).select(col("o_orderkey"),
      col("o_custkey"), round(col("o_totalprice") * 100).cast("long").as("pc"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val (oNew, oOld) =
      (o.where(col("o_orderkey") % 10 === 0), o.where(col("o_orderkey") % 10 =!= 0))
    val (cNew, cOld) =
      (c.where(col("c_custkey") % 20 === 0), c.where(col("c_custkey") % 20 =!= 0))
    val vOld = oOld.join(cOld, col("o_custkey") === col("c_custkey"))
    val legNewOrders = oNew.join(c, col("o_custkey") === col("c_custkey"))
    val legNewCust = oOld.join(broadcast(cNew), col("o_custkey") === col("c_custkey"))
    vOld.unionAll(legNewOrders).unionAll(legNewCust)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"), sum(col("pc")).as("total_cents"))
      .orderBy("c_nationkey")
  }

  /** q123: distribution-drift gate ([[graft.quality.Drift]]) between two
    * event snapshots — the "new" version doubles every 10th event's
    * value, shifting ~10% of mass to higher bins. Values histogram in
    * integer cents on a shared 16-bin grid; total variation and the
    * verdict are exact integers (no PSI/KL logarithms — engine-portable
    * by construction). The oracle replays grid, histogram, and verdict. */
  private def histogramDriftGate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = Tables.events(spark, dir)
      .select(round(col("value") * 100).cast("long").as("value_c"),
        col("event_id"))
    val newer = base.withColumn("value_c",
      when(col("event_id") % 10 === 0, col("value_c") * 2)
        .otherwise(col("value_c")))
    graft.quality.Drift.histogramDrift(
        base, newer, "value_c", nBins = 16, thresholdTenths = 1)
      .orderBy("bin")
  }

  /** q134: join-key skew profiler — the diagnostic that DECIDES the
    * salting/AQE-skew treatment (q54/q66 are the treatments; this is the
    * triage): per-key counts (one map-side-combinable aggregation — the
    * only pass over the data), then all statistics are computed on the
    * KEY-STATS table, which is key-cardinality-sized, never
    * corpus-sized: top-10 heavy hitters, their share of all rows, and
    * their ratio to the median key's count (rank-pick median — exact,
    * interpolation-free). The global windows here order key-stats rows,
    * not data rows. */
  private def keySkewProfile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val g = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = g.agg(sum("cnt").as("total"), count(lit(1)).as("n_keys"))
    val byCnt = g.withColumn("rn",
      row_number().over(Window.orderBy(col("cnt"), col("key"))))
    val med = byCnt.crossJoin(broadcast(tot))
      .agg(min(when(col("rn") === floor(lit(0.5) * (col("n_keys") - 1)) + 1,
        col("cnt"))).as("med_cnt"))
    g.withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("key"))))
      .where(col("rank") <= 10)
      .crossJoin(broadcast(tot)).crossJoin(broadcast(med))
      .select(col("rank"), col("key"), col("cnt"),
        (lit(100) * col("cnt").cast("double") / col("total")).as("share_pct"),
        (col("cnt").cast("double") / col("med_cnt")).as("x_median"))
      .orderBy("rank")
  }

  /** q135: referential-integrity audit — orphan counts for every FK edge
    * of the star schema in one union of LEFT-JOIN aggregates. Each edge
    * is one key shuffle (or broadcast when the parent is small); the
    * audit output is one row per edge. The gate a pipeline runs before
    * trusting joins downstream. */
  private def fkAudit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    def edge(name: String, child: DataFrame, childKey: String,
             parent: DataFrame, parentKey: String): DataFrame =
      // join on DISTINCT parent keys: a duplicated parent PK (itself a
      // defect this audit coexists with) must not fan out child rows and
      // inflate n_child / deflate orphan_pct
      child.select(col(childKey).as("ck"))
        .join(parent.select(col(parentKey).as("pk")).distinct(),
          col("ck") === col("pk"), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("pk").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("fk"), col("n_child"), col("n_orphans"),
          (lit(100) * col("n_orphans").cast("double") / col("n_child"))
            .as("orphan_pct"))
    val orders = Tables.orders(spark, dir)
    edge("lineitem->orders", Tables.lineitem(spark, dir), "l_orderkey",
        orders, "o_orderkey")
      .unionByName(edge("lineitem->part", Tables.lineitem(spark, dir),
        "l_partkey", Tables.part(spark, dir), "p_partkey"))
      .unionByName(edge("orders->customer", orders, "o_custkey",
        Tables.customer(spark, dir), "c_custkey"))
      .orderBy("fk")
  }

  /** q153: pipeline telemetry via `Dataset.observe` (CollectMetrics) —
    * production jobs attach metrics to a pass they're ALREADY making
    * (row counts, checksums, freshness) instead of paying a second scan
    * for monitoring. The metrics ride the task stream as accumulator-
    * style partial aggregates (no shuffle, no extra action); the driver
    * reads ONE bounded row per named observation. The oracle recomputes
    * the same aggregates in SQL — proving the piggybacked metrics equal
    * a dedicated aggregation pass. */
  private def observedMetrics(spark: SparkSession, dir: String): DataFrame = {
    val obs = Tables.lineitem(spark, dir)
      .where(col("l_quantity") > 0)
      .observe("scan_metrics",
        count(lit(1)).as("n_rows"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_cents"),
        max(col("l_orderkey")).as("max_orderkey"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss")
          .as("first_ship"))
    // drive THIS frame's own QueryExecution (a write/count would build a
    // NEW one and leave these metrics accumulators empty); the rows are
    // consumed on the executors, nothing returns to the driver
    obs.queryExecution.toRdd.foreach(_ => ())
    val row = obs.queryExecution.observedMetrics("scan_metrics")
    spark.createDataFrame(java.util.Arrays.asList(row), row.schema)
  }

  /** q182: data-derived quality threshold via Otsu's method over the
    * doc-length distribution (`Otsu.otsuTable`): one histogram
    * aggregate, exact-BigInt argmax on the driver, every candidate row
    * emitted with its micro-quantized between-class variance. The
    * oracle replays bins, cumulative moments, score, and the argmax
    * tie-break in HUGEINT. */
  private def otsuThreshold(spark: SparkSession, dir: String): DataFrame =
    Otsu.otsuTable(spark, Tables.documents(spark, dir), "n_chars", bins = 16)
      .orderBy("k")

  /** q261: CONCENTRATION AUDIT — exact Gini coefficient + top-1% share
    * of the (binned) order-value distribution, the inequality numbers a
    * curation pipeline tracks per domain/source (a corpus where 1% of
    * sources hold 60% of the tokens needs the q128 domain cap; this is
    * the metric that says so). Computed on the hundred-dollar-binned
    * variable (the q256 declared-binning discipline — scale cancels in
    * Gini, so bin INDEX is the value), entirely from the bin histogram:
    * with bins ascending and S_prev the count below, the classic
    * sorted-rank identity 2·Σᵢ i·xᵢ = Σ_b v_b·(2·S_prev·c_b + c_b(c_b+1))
    * turns the O(n log n) sort form into ONE pass over the bin domain;
    * G = (2Σi·xᵢ − (n+1)Σx)/(n·Σx) ≥ 0 by the Chebyshev sum inequality,
    * so micro-unit truncation is sign-safe. The top-1% share finds the
    * one bin where the descending cumulative count crosses
    * max(n div 100, 1) and takes the partial bin exactly. All windows
    * run over the BIN domain (≤ ~6000 rows at any corpus size); the
    * only corpus-sized work is the binning groupBy — one
    * map-side-combinable pass. The 10⁶·numerator product reaches
    * ~10²⁰, widened to decimal(38,0)/HUGEINT (the q257 rule); every
    * other intermediate fits int64 with ≥10⁴ headroom. */
  private def giniConcentration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = Tables.orders(spark, dir)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT) div 10000")
        .as("v"))
      .groupBy("v").agg(count(lit(1)).as("c"))
    val wAsc = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wDesc = Window.orderBy(desc("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = bins
      .withColumn("sp", coalesce(sum("c").over(wAsc), lit(0L)))
      .withColumn("cdp", coalesce(sum("c").over(wDesc), lit(0L)))
      .withColumn("cup",
        coalesce(sum(col("c") * col("v")).over(wDesc), lit(0L)))
    val tot = cum.agg(
      sum("c").as("n"), count(lit(1)).as("n_bins"),
      sum(col("c") * col("v")).as("su"),
      sum(col("v") * (lit(2L) * col("sp") * col("c")
        + col("c") * (col("c") + 1))).as("a2"))
    val top = cum.crossJoin(broadcast(tot.select("n")))
      .withColumn("kn", expr("greatest(n div 100, CAST(1 AS BIGINT))"))
      .where(col("cdp") < col("kn") && col("kn") <= col("cdp") + col("c"))
      .select((col("cup") + (col("kn") - col("cdp")) * col("v"))
        .as("top_units"))
    tot.crossJoin(broadcast(top))
      .select(col("n"), col("n_bins"), col("su").as("sum_units"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * (a2 - (n + 1) * su)) " +
          "div (n * su)").as("gini_micro"),
        col("top_units"),
        expr("(1000000 * top_units) div su").as("top1pct_share_micro"))
  }

  /** q265: KENDALL τ-b RANK CONCORDANCE between two per-nation metrics
    * (customer count vs total order revenue) — the robust,
    * outlier-immune twin of the Pearson panel correlation (q106): do
    * the two metrics RANK the nations the same way? Exact pair census
    * over the 25-nation domain: concordant / discordant / tied-in-x /
    * tied-in-y counts from the i<j pair join, and because τ-b's
    * denominator √((n₀−n₁)(n₀−n₂)) would force a float sqrt, the
    * published statistic is the SIGNED SQUARE
    * sign(C−D)·10⁶·(C−D)²/((n₀−n₁)(n₀−n₂)) — monotone in τ-b, exact
    * integer, zero/sign-identical (the q251 cross-multiplied-α move:
    * never evaluate the irrational, publish the comparison-equivalent
    * rational). All raw counts ride along so a reader can reconstruct
    * τ-b to any precision.
    *
    * Scale shape: the metric frame is nation-sized (25 rows at ANY
    * corpus size — the pair stage is a 300-pair broadcast nested loop
    * by construction, domain-bounded exactly like q249's ≤64 gate);
    * the corpus-sized work is one aggregation each. */
  private def kendallTau(spark: SparkSession, dir: String): DataFrame = {
    val perNation = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_nationkey").as("nk"))
      .agg(countDistinct("c_custkey").as("x"),
        sum(coalesce(expr("CAST(round(o_totalprice * 100) AS BIGINT)"),
          lit(0L))).as("y"))
    // broadcast the 25-row frame so the non-equi pair join plans as a
    // broadcast nested loop (domain-bounded), never a CartesianProduct
    val p = perNation.as("a")
      .join(broadcast(perNation.as("b")), col("a.nk") < col("b.nk"))
      .select((col("a.x") - col("b.x")).as("dx"),
        (col("a.y") - col("b.y")).as("dy"))
    p.agg(
        count(lit(1)).as("n0"),
        sum(when(col("dx") > 0 && col("dy") > 0
          || col("dx") < 0 && col("dy") < 0, 1L).otherwise(0L)).as("c"),
        sum(when(col("dx") > 0 && col("dy") < 0
          || col("dx") < 0 && col("dy") > 0, 1L).otherwise(0L)).as("d"),
        sum(when(col("dx") === 0, 1L).otherwise(0L)).as("tx"),
        sum(when(col("dy") === 0, 1L).otherwise(0L)).as("ty"))
      .select(col("n0"), col("c"), col("d"), col("tx"), col("ty"),
        expr("CASE WHEN c >= d THEN " +
          "(1000000 * (c - d) * (c - d)) div ((n0 - tx) * (n0 - ty)) " +
          "ELSE -((1000000 * (d - c) * (d - c)) " +
          "div ((n0 - tx) * (n0 - ty))) END").as("tau_b_sq_signed_micro"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q261_gini_concentration" -> giniConcentration,
    "q265_kendall_tau" -> kendallTau,
    "q182_otsu_threshold" -> otsuThreshold,
    "q153_observed_metrics" -> observedMetrics,
    "q134_key_skew_profile" -> keySkewProfile,
    "q135_fk_audit" -> fkAudit,
    "q100_column_profile" -> ordersProfile,
    "q108_snapshot_diff" -> snapshotDiff,
    "q110_profile_approx" -> ordersProfileApprox,
    "q116_incremental_agg" -> incrementalAgg,
    "q123_histogram_drift" -> histogramDriftGate,
    "q173_incremental_join_view" -> incrementalJoinView
  )

  override def oracles: Map[String, String] = Map(
    // The nation metric frame, the i<j pair census and the signed-square
    // statistic replayed in exact integers.
    "q265_kendall_tau" ->
      """WITH m AS (
        |  SELECT c_nationkey AS nk,
        |         CAST(count(DISTINCT c_custkey) AS BIGINT) AS x,
        |         CAST(coalesce(sum(CAST(round(o_totalprice * 100)
        |           AS BIGINT)), 0) AS BIGINT) AS y
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1),
        |p AS (
        |  SELECT a.x - b.x AS dx, a.y - b.y AS dy
        |  FROM m a JOIN m b ON a.nk < b.nk),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n0,
        |         CAST(sum(CASE WHEN dx > 0 AND dy > 0
        |                         OR dx < 0 AND dy < 0
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |         CAST(sum(CASE WHEN dx > 0 AND dy < 0
        |                         OR dx < 0 AND dy > 0
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |         CAST(sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS tx,
        |         CAST(sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS ty
        |  FROM p)
        |SELECT n0, c, d, tx, ty,
        |       CASE WHEN c >= d THEN
        |         (1000000 * (c - d) * (c - d)) // ((n0 - tx) * (n0 - ty))
        |       ELSE -((1000000 * (d - c) * (d - c))
        |         // ((n0 - tx) * (n0 - ty))) END AS tau_b_sq_signed_micro
        |FROM s""".stripMargin,
    // Bin histogram, both cumulative scans, the rank identity, the
    // HUGEINT-widened Gini ratio and the partial top-bin replayed.
    "q261_gini_concentration" ->
      """WITH b AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 10000 AS v,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |cum AS (
        |  SELECT v, c,
        |         coalesce(sum(c) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS sp,
        |         coalesce(sum(c) OVER (ORDER BY v DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS cdp,
        |         coalesce(sum(c * v) OVER (ORDER BY v DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS cup
        |  FROM b),
        |tot AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |         CAST(count(*) AS BIGINT) AS n_bins,
        |         CAST(sum(c * v) AS BIGINT) AS su,
        |         CAST(sum(v * (2 * sp * c + c * (c + 1))) AS BIGINT) AS a2
        |  FROM cum),
        |top AS (
        |  SELECT CAST(cup + (greatest(n // 100, 1) - cdp) * v AS BIGINT)
        |           AS top_units
        |  FROM cum, tot
        |  WHERE cdp < greatest(n // 100, 1)
        |    AND greatest(n // 100, 1) <= cdp + c)
        |SELECT n, n_bins, su AS sum_units,
        |       CAST((CAST(1000000 AS HUGEINT) * (a2 - (n + 1) * su))
        |         // (n * su) AS BIGINT) AS gini_micro,
        |       top_units,
        |       (1000000 * top_units) // su AS top1pct_share_micro
        |FROM tot, top""".stripMargin,
    // full replay: bin width, cumulative class moments, the HUGEINT
    // variance rational floor-quantized to micro-units, argmax with
    // smallest-k tie-break
    "q182_otsu_threshold" ->
      """WITH v AS (
        |  SELECT CAST(n_chars AS BIGINT) AS v FROM documents
        |  WHERE n_chars IS NOT NULL),
        |b AS (SELECT min(v) AS lo, max(v) AS hi, count(*) AS n FROM v),
        |h AS (
        |  SELECT (v.v - b.lo) // ((b.hi - b.lo) // 16 + 1) AS k,
        |         count(*) AS c
        |  FROM v, b GROUP BY 1),
        |tot AS (SELECT (SELECT n FROM b) AS n,
        |               (SELECT CAST(sum(k * c) AS BIGINT) FROM h) AS s),
        |cand AS (SELECT unnest(range(0, 15)) AS k),
        |cum AS (
        |  SELECT cand.k,
        |         (SELECT CAST(coalesce(sum(c), 0) AS BIGINT)
        |          FROM h WHERE h.k <= cand.k) AS n0,
        |         (SELECT CAST(coalesce(sum(h.k * c), 0) AS BIGINT)
        |          FROM h WHERE h.k <= cand.k) AS s0
        |  FROM cand),
        |sc AS (
        |  SELECT k, n0, (SELECT n FROM tot) - n0 AS n1,
        |         CAST(s0 AS HUGEINT) * ((SELECT n FROM tot) - n0)
        |           - (CAST((SELECT s FROM tot) AS HUGEINT) - s0) * n0 AS d,
        |         CAST((SELECT n FROM tot) AS HUGEINT) AS nn
        |  FROM cum
        |  WHERE n0 > 0 AND (SELECT n FROM tot) - n0 > 0),
        |fin AS (
        |  SELECT k, n0, n1,
        |         CAST((d * d * 1000000)
        |              // (CAST(n0 AS HUGEINT) * n1 * nn * nn) AS BIGINT)
        |           AS score_micro
        |  FROM sc)
        |SELECT k, n0, n1, score_micro,
        |       row_number() OVER (ORDER BY score_micro DESC, k) = 1 AS is_best
        |FROM fin ORDER BY k""".stripMargin,
    // full recompute from scratch — delta-algebra refresh must equal it
    "q173_incremental_join_view" ->
      """SELECT c.c_nationkey,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
        |            AS BIGINT) AS total_cents
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin,
    // the piggybacked observe metrics must equal a dedicated aggregation
    "q153_observed_metrics" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_cents,
        |       max(l_orderkey) AS max_orderkey,
        |       strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS first_ship
        |FROM lineitem WHERE l_quantity > 0""".stripMargin,
    "q134_key_skew_profile" ->
      """WITH g AS (
        |  SELECT l_suppkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS n_keys FROM g),
        |r AS (
        |  SELECT cnt, row_number() OVER (ORDER BY cnt, key) AS rn FROM g),
        |med AS (
        |  SELECT min(CASE WHEN rn = CAST(floor(0.5*(n_keys-1)) AS BIGINT)+1
        |             THEN cnt END) AS med_cnt
        |  FROM r CROSS JOIN tot)
        |SELECT rank, key, cnt,
        |       100*CAST(cnt AS DOUBLE)/total AS share_pct,
        |       CAST(cnt AS DOUBLE)/med_cnt AS x_median
        |FROM (SELECT key, cnt,
        |             row_number() OVER (ORDER BY cnt DESC, key) AS rank
        |      FROM g)
        |CROSS JOIN tot CROSS JOIN med
        |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "q135_fk_audit" ->
      """WITH e1 AS (
        |  SELECT 'lineitem->orders' AS fk, count(*) AS n_child,
        |         CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_orphans
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |       ON l.l_orderkey = o.o_orderkey),
        |e2 AS (
        |  SELECT 'lineitem->part' AS fk, count(*) AS n_child,
        |         CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_orphans
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
        |       ON l.l_partkey = p.p_partkey),
        |e3 AS (
        |  SELECT 'orders->customer' AS fk, count(*) AS n_child,
        |         CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_orphans
        |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |       ON o.o_custkey = c.c_custkey),
        |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2
        |      UNION ALL SELECT * FROM e3)
        |SELECT fk, n_child, n_orphans,
        |       100*CAST(n_orphans AS DOUBLE)/n_child AS orphan_pct
        |FROM u ORDER BY fk""".stripMargin,
    // Shared integer grid from the union's min/max, 16-bin histogram per
    // side, exact-integer total variation and verdict.
    "q123_histogram_drift" ->
      """WITH b AS (
        |  SELECT CAST(round(value*100) AS BIGINT) AS vc, event_id, 0 AS side
        |  FROM events
        |  UNION ALL
        |  SELECT CASE WHEN event_id % 10 = 0
        |              THEN CAST(round(value*100) AS BIGINT) * 2
        |              ELSE CAST(round(value*100) AS BIGINT) END AS vc,
        |         event_id, 1 AS side
        |  FROM events),
        |m AS (SELECT min(vc) AS mn, max(vc) AS mx FROM b),
        |h AS (
        |  SELECT CASE WHEN m.mx = m.mn THEN 0
        |              ELSE CAST(floor((b.vc - m.mn) * 16 / (m.mx - m.mn + 1)) AS BIGINT)
        |         END AS bin,
        |         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
        |         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
        |  FROM b CROSS JOIN m GROUP BY 1),
        |t AS (
        |  SELECT CAST(sum(abs(n_old - n_new)) AS BIGINT) AS tv,
        |         CAST(sum(n_old + n_new) AS BIGINT) AS total
        |  FROM h)
        |SELECT h.bin, h.n_old, h.n_new, t.tv, t.total,
        |       t.tv * 10 >= t.total * 1 AS drifted
        |FROM h CROSS JOIN t ORDER BY h.bin""".stripMargin,
    // One aggregate scan, then one projection per profiled column — the
    // same metrics Spark computes from its single exploded agg row.
    "q100_column_profile" ->
      """WITH s AS (
        |  SELECT count(*) AS n_rows,
        |         count(o_orderkey) AS nn1, count(DISTINCT o_orderkey) AS nd1,
        |         CAST(min(o_orderkey) AS DOUBLE) AS mn1,
        |         CAST(max(o_orderkey) AS DOUBLE) AS mx1,
        |         count(o_custkey) AS nn2, count(DISTINCT o_custkey) AS nd2,
        |         CAST(min(o_custkey) AS DOUBLE) AS mn2,
        |         CAST(max(o_custkey) AS DOUBLE) AS mx2,
        |         count(o_totalprice) AS nn3, count(DISTINCT o_totalprice) AS nd3,
        |         min(o_totalprice) AS mn3, max(o_totalprice) AS mx3,
        |         count(o_orderstatus) AS nn4, count(DISTINCT o_orderstatus) AS nd4,
        |         min(o_orderstatus) AS ms4, max(o_orderstatus) AS mxs4,
        |         count(o_orderpriority) AS nn5, count(DISTINCT o_orderpriority) AS nd5,
        |         min(o_orderpriority) AS ms5, max(o_orderpriority) AS mxs5
        |  FROM orders)
        |SELECT col_name, n_rows, n_nonnull, n_rows - n_nonnull AS n_null,
        |       n_distinct, min_num, max_num, min_str, max_str
        |FROM (
        |  SELECT 'o_orderkey' AS col_name, n_rows, nn1 AS n_nonnull,
        |         nd1 AS n_distinct, mn1 AS min_num, mx1 AS max_num,
        |         CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |  FROM s
        |  UNION ALL
        |  SELECT 'o_custkey', n_rows, nn2, nd2, mn2, mx2, NULL, NULL FROM s
        |  UNION ALL
        |  SELECT 'o_totalprice', n_rows, nn3, nd3, mn3, mx3, NULL, NULL FROM s
        |  UNION ALL
        |  SELECT 'o_orderstatus', n_rows, nn4, nd4, NULL, NULL, ms4, mxs4 FROM s
        |  UNION ALL
        |  SELECT 'o_orderpriority', n_rows, nn5, nd5, NULL, NULL, ms5, mxs5 FROM s)
        |ORDER BY col_name""".stripMargin,
    "q108_snapshot_diff" ->
      """WITH b AS (
        |  SELECT o_orderkey,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        |  FROM orders),
        |o AS (SELECT * FROM b WHERE o_orderkey % 11 <> 0),
        |n AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 7 = 0 THEN price_c * 2
        |              ELSE price_c END AS price_c
        |  FROM b WHERE o_orderkey % 13 <> 0),
        |d AS (
        |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
        |         n.price_c AS new_price_c,
        |         CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |              WHEN n.o_orderkey IS NULL THEN 'removed'
        |              WHEN o.price_c = n.price_c THEN 'unchanged'
        |              ELSE 'changed' END AS diff_status
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |SELECT diff_status, count(*) AS n_keys,
        |       min(k) AS first_key,
        |       CAST(sum(coalesce(new_price_c, 0)) AS BIGINT) AS sum_new_c
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    // Same exact metrics as q100 (the stacked exact leg reproduces them
    // bit-for-bit) plus the constant-TRUE tolerance verdict on the HLL
    // estimate — the q55 pattern.
    "q110_profile_approx" ->
      """WITH s AS (
        |  SELECT count(*) AS n_rows,
        |         count(o_orderkey) AS nn1, count(DISTINCT o_orderkey) AS nd1,
        |         CAST(min(o_orderkey) AS DOUBLE) AS mn1,
        |         CAST(max(o_orderkey) AS DOUBLE) AS mx1,
        |         count(o_custkey) AS nn2, count(DISTINCT o_custkey) AS nd2,
        |         CAST(min(o_custkey) AS DOUBLE) AS mn2,
        |         CAST(max(o_custkey) AS DOUBLE) AS mx2,
        |         count(o_totalprice) AS nn3, count(DISTINCT o_totalprice) AS nd3,
        |         min(o_totalprice) AS mn3, max(o_totalprice) AS mx3,
        |         count(o_orderstatus) AS nn4, count(DISTINCT o_orderstatus) AS nd4,
        |         min(o_orderstatus) AS ms4, max(o_orderstatus) AS mxs4,
        |         count(o_orderpriority) AS nn5, count(DISTINCT o_orderpriority) AS nd5,
        |         min(o_orderpriority) AS ms5, max(o_orderpriority) AS mxs5
        |  FROM orders)
        |SELECT col_name, n_rows, n_nonnull, n_rows - n_nonnull AS n_null,
        |       n_distinct, min_num, max_num, min_str, max_str,
        |       TRUE AS approx_ok
        |FROM (
        |  SELECT 'o_orderkey' AS col_name, n_rows, nn1 AS n_nonnull,
        |         nd1 AS n_distinct, mn1 AS min_num, mx1 AS max_num,
        |         CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |  FROM s
        |  UNION ALL
        |  SELECT 'o_custkey', n_rows, nn2, nd2, mn2, mx2, NULL, NULL FROM s
        |  UNION ALL
        |  SELECT 'o_totalprice', n_rows, nn3, nd3, mn3, mx3, NULL, NULL FROM s
        |  UNION ALL
        |  SELECT 'o_orderstatus', n_rows, nn4, nd4, NULL, NULL, ms4, mxs4 FROM s
        |  UNION ALL
        |  SELECT 'o_orderpriority', n_rows, nn5, nd5, NULL, NULL, ms5, mxs5 FROM s)
        |ORDER BY col_name""".stripMargin,
    // Full recompute — deliberately NOT the split-and-merge shape: equality
    // with the engine's merged partials is the semantic claim.
    "q116_incremental_agg" ->
      """WITH b AS (
        |  SELECT o_orderstatus,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        |  FROM orders)
        |SELECT o_orderstatus, count(*) AS n_orders,
        |       round(CAST(sum(price_c) AS BIGINT) / CAST(100 AS DOUBLE), 2)
        |         AS sum_price,
        |       min(price_c) / CAST(100 AS DOUBLE) AS min_price,
        |       max(price_c) / CAST(100 AS DOUBLE) AS max_price,
        |       (CAST(CAST(sum(price_c) AS BIGINT) AS DOUBLE) / count(*))
        |         / CAST(100 AS DOUBLE) AS avg_price
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
