package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.MlQueries

/** Round-9 breadth pins: the relationally-trained Naive Bayes (q247),
  * closed-form OLS trend (q248), association-rule mining (q249) and RRF
  * hybrid retrieval (q250) — constructed fixtures with hand-computed
  * expectations plus structural invariants on the real sf0.001 corpus. */
class Round9LearnersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def stageDocs(rows: Seq[(Long, String, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_r9l_").toString
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("fixture"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  /** Events staged as raw µs-long ts (unannotated int64 → the reader's
    * magnitude CASE treats < 1e17 as µs — the documented fallback). */
  private def stageEvents(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_r9e_").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  private def dayUs(day: Int): Long = // 2024-01-<day> 12:00 UTC in µs
    (java.time.LocalDate.of(2024, 1, day).toEpochDay * 86400L + 43200L) * 1000000L

  // ---------------------------------------------------- q247 fixture
  test("q247: NB trained on %5!=0 docs routes held-out docs to the " +
    "language owning their words; symmetric fixture → symmetric scores") {
    // vocab gate needs train count ≥ 5: 'foo' appears 12× in xx train
    // docs, 'bar' 12× in yy. Docs 5/10 are held out (doc_id % 5 == 0).
    val dir = stageDocs(Seq(
      (1L, "foo foo foo", "xx"), (2L, "foo foo foo", "xx"),
      (3L, "foo foo foo", "xx"), (4L, "foo foo foo", "xx"),
      (5L, "foo foo", "xx"),
      (6L, "bar bar bar", "yy"), (7L, "bar bar bar", "yy"),
      (8L, "bar bar bar", "yy"), (9L, "bar bar bar", "yy"),
      (10L, "bar bar", "yy")))
    val got = SparkEntry.queries("q247_naive_bayes")(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq(("xx", "xx", 1L), ("yy", "yy", 1L)), got.toString)
    // the fixture is exactly symmetric under xx↔yy, foo↔bar: winning
    // scores must match, and each is prior + 2·weight < 0
    assert(got(0)._4 == got(1)._4 && got(0)._4 < 0L, got.toString)
  }

  test("q247 covers every held-out doc exactly once on sf0.001 and is " +
    "deterministic") {
    val dir = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("q247_naive_bayes")(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq
    val b = SparkEntry.queries("q247_naive_bayes")(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(a == b, "NB argmax not deterministic across runs")
    val held = graft.tables.Tables.documents(spark, dir)
      .where(col("doc_id") % 5 === 0).count()
    assert(a.map(_._3).sum == held,
      s"confusion matrix covers ${a.map(_._3).sum} docs, expected $held")
  }

  // ---------------------------------------------------- q248 fixture
  test("q248: a perfect line fits with r2 = 1e6 and exact slope ratio; " +
    "a constant series gets trend 0 / NULL r2; singletons are dropped") {
    val dir = stageEvents(Seq(
      // user 1: close cents 100,200,300,400 on days 1..4 → slope 100 c/d
      (1L, dayUs(1), 1L, "AAPL", 1.00), (2L, dayUs(2), 1L, "AAPL", 2.00),
      (3L, dayUs(3), 1L, "AAPL", 3.00), (4L, dayUs(4), 1L, "AAPL", 4.00),
      // user 2: flat at 5.00 over 3 days
      (5L, dayUs(1), 2L, "AAPL", 5.00), (6L, dayUs(2), 2L, "AAPL", 5.00),
      (7L, dayUs(3), 2L, "AAPL", 5.00),
      // user 3: single day → n < 2, excluded
      (8L, dayUs(1), 3L, "AAPL", 9.00)))
    val got = SparkEntry.queries("q248_ols_trend")(spark, dir)
      .select("symbol", "user_id", "n", "slope_num", "slope_den", "trend",
        "r2_micro")
      .as[(String, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      ("AAPL", 1L, 4L, 2000L, 20L, 1L, Some(1000000L)),
      ("AAPL", 2L, 3L, 0L, 6L, 0L, None)), got.toString)
  }

  test("q248 on sf0.001: slope sign agrees with a driver-side exact " +
    "rational refit for every group") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q248_ols_trend")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toSeq
    assert(rows.nonEmpty)
    // recompute the fit independently from the bar frame in Scala
    val bars = graft.ml.TrendModel.dailyBars(
        graft.tables.Tables.events(spark, dir))
      .select(col("symbol"), col("user_id"), col("day"),
        round(col("close") * 100).cast("long").as("y"))
      .as[(String, Long, String, Long)].collect()
      .groupBy(t => (t._1, t._2))
    rows.foreach { case (sym, uid, n, sNum, sDen, trend, r2) =>
      val ys = bars((sym, uid)).sortBy(_._3).map(_._4).zipWithIndex
        .map { case (y, i) => (BigInt(i + 1), BigInt(y)) }
      assert(ys.size == n)
      val (sx, sy) = (ys.map(_._1).sum, ys.map(_._2).sum)
      val sxy = ys.map(t => t._1 * t._2).sum
      val sxx = ys.map(t => t._1 * t._1).sum
      val syy = ys.map(t => t._2 * t._2).sum
      assert(BigInt(sNum) == n * sxy - sx * sy, s"$sym/$uid slope_num")
      assert(BigInt(sDen) == n * sxx - sx * sx, s"$sym/$uid slope_den")
      assert(trend == (n * sxy - sx * sy).signum, s"$sym/$uid trend")
      assert(r2.isEmpty == (n * syy - sy * sy == 0), s"$sym/$uid r2 null")
      r2.foreach(v => assert(v >= 0L && v <= 1000000L, s"$sym/$uid r2=$v"))
    }
  }

  // ---------------------------------------------------- q249 fixture
  test("q249: pair support/confidence/lift come out exactly on a " +
    "hand-computed basket set; sub-support pairs are absent") {
    // baskets: 5×{A,B}, 1×{A,B,C}, 1×{C} → only (A,B) reaches n_ab ≥ 5.
    // duplicate events inside one basket must not double-count (distinct).
    val rows = (1 to 5).flatMap { u =>
      Seq((u * 10L, dayUs(1), u.toLong, "A", 1.0),
        (u * 10L + 1, dayUs(1), u.toLong, "B", 1.0),
        (u * 10L + 2, dayUs(1), u.toLong, "A", 2.0)) // dup A, same basket
    } ++ Seq(
      (100L, dayUs(1), 6L, "A", 1.0), (101L, dayUs(1), 6L, "B", 1.0),
      (102L, dayUs(1), 6L, "C", 1.0),
      (103L, dayUs(1), 7L, "C", 1.0))
    val dir = stageEvents(rows)
    val got = SparkEntry.queries("q249_association_rules")(spark, dir)
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // N=7, n_A=6, n_B=6, n_AB=6: support=857142, conf both 10^6,
    // lift=(1e6·6·7)//36=1166666
    assert(got == Seq(("A", "B", 6L, 6L, 6L, 7L, 857142L, 1000000L,
      1000000L, 1166666L)), got.toString)
  }

  test("q249 on sf0.001: every pair respects min-support, symmetric " +
    "metrics are consistent, and lift matches its definition") {
    val got = SparkEntry.queries("q249_association_rules")(
        spark, "/root/testdata/sf0.001")
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (a, b, na, nb, nab, nB, sup, cab, cba, lift) =>
      assert(a < b && nab >= 5 && nab <= math.min(na, nb) &&
        math.max(na, nb) <= nB)
      assert(sup == 1000000L * nab / nB)
      assert(cab == 1000000L * nab / na && cba == 1000000L * nab / nb)
      assert(lift == 1000000L * nab * nB / (na * nb))
    }
  }

  // ---------------------------------------------------- q251 fixtures
  test("bestSplitsW: weights move the argmin away from the unweighted " +
    "split on a hand-computed frame") {
    // one varying feature (close); weighted Gini costs by threshold:
    // v=1→990, v=2→18990, v=3→18880, v=4→880 (unique min at v=4);
    // unweighted the same frame ties v=1/v=4 → tie-break picks v=1.
    def frame(ws: Seq[Long]) =
      Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, 1L), (5L, 0L))
        .zip(ws).map { case ((cc, y), w) => (7L, 7L, 7L, cc, 7L, y, w, w * y) }
        .toDF("oc", "hc", "lc", "cc", "vol", "y", "w", "wy")
    val weighted = MlQueries.bestSplitsW(frame(Seq(3L, 50L, 1L, 60L, 2L)))
      .select("feat", "v", "nl", "kl", "nn", "kk")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(weighted == Seq(("close", 4L, 114L, 110L, 116L, 110L)), weighted)
    val uniform = MlQueries.bestSplitsW(frame(Seq(1L, 1L, 1L, 1L, 1L)))
      .select("feat", "v").as[(String, Long)].collect().toSeq
    assert(uniform == Seq(("close", 1L)), uniform)
  }

  test("q251 on sf0.001: round 1 IS q240's root; the reweighting mass " +
    "identity W = 2·e1·c1 holds; the α predicate matches its integers") {
    val r = SparkEntry.queries("q251_adaboost_stumps")(
        spark, "/root/testdata/sf0.001")
      .collect().head
    val q240 = SparkEntry.queries("q240_decision_stump")(
        spark, "/root/testdata/sf0.001")
      .select("root_feat", "root_thr").collect().head
    assert(r.getAs[String]("f1") == q240.getString(0) &&
      r.getAs[Long]("t1") == q240.getLong(1),
      "boosting round 1 must equal the q240 root stump")
    val (e1, c1) = (r.getAs[Long]("e1"), r.getAs[Long]("c1"))
    val (e2w, wTot) = (r.getAs[Long]("e2w"), r.getAs[Long]("w_tot"))
    assert(e1 > 0 && e1 < c1, s"generic position violated: e1=$e1 c1=$c1")
    assert(wTot == 2 * e1 * c1, s"weight mass $wTot != 2*$e1*$c1")
    assert(e2w > 0 && e2w < wTot)
    val use2 = BigInt(e1) * BigInt(wTot - e2w) > BigInt(c1) * BigInt(e2w)
    assert(r.getAs[Long]("use2") == (if (use2) 1L else 0L))
    assert(r.getAs[Long]("n_correct_boost") <= r.getAs[Long]("n_test"))
  }

  // ---------------------------------------------------- q252 fixture
  test("q252: HITS on a hand-built bipartite graph matches an exact " +
    "BigInt replay; top hub/authority pin at the fixed-point scale") {
    // c1→{10,20,30}, c2→{10}: c1 is the stronger hub, supp 10 the
    // stronger authority; 20/30 tie and break by entity_id.
    val tmp = java.nio.file.Files.createTempDirectory("graft_hits_").toString
    Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.parquet(s"$tmp/orders.parquet")
    Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 10L))
      .toDF("l_orderkey", "l_suppkey")
      .coalesce(1).write.parquet(s"$tmp/lineitem.parquet")
    val got = SparkEntry.queries("q252_hits")(spark, tmp)
      .as[(String, Long, Long, Int)].collect().toSeq
    // independent exact replay of 3 rounds of max-scaled integer HITS
    val edges = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L))
    val S = BigInt(1) << 20
    var h = Map(1L -> S, 2L -> S)
    var a = Map.empty[Long, BigInt]
    for (_ <- 1 to 3) {
      val ar = edges.groupBy(_._2).map { case (s2, es) =>
        s2 -> es.map(e => h(e._1)).sum }
      val am = ar.values.max
      a = ar.map { case (k, v) => k -> v * S / am }
      val hr = edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => a(e._2)).sum }
      val hm = hr.values.max
      h = hr.map { case (k, v) => k -> v * S / hm }
    }
    val expect =
      a.toSeq.sortBy(t => (-t._2, t._1)).zipWithIndex
        .map { case ((id, sc), i) => ("authority", id, sc.toLong, i + 1) } ++
      h.toSeq.sortBy(t => (-t._2, t._1)).zipWithIndex
        .map { case ((id, sc), i) => ("hub", id, sc.toLong, i + 1) }
    assert(got == expect, s"got $got expect $expect")
    assert(got.filter(_._4 == 1).map(_._3).forall(_ == S.toLong),
      "rank-1 of each role must sit exactly at the fixed-point scale")
    assert(got.find(r => r._1 == "hub" && r._4 == 1).get._2 == 1L &&
      got.find(r => r._1 == "authority" && r._4 == 1).get._2 == 10L)
  }

  // ---------------------------------------------------- q254 structure
  test("q254 on sf0.001: exactly one row per feature, rank-1 equals the " +
    "q240 root stump, and costs are non-decreasing in rank") {
    val rows = SparkEntry.queries("q254_feature_ranking")(
        spark, "/root/testdata/sf0.001").collect().toSeq
    assert(rows.map(_.getAs[String]("feat")).sorted ==
      Seq("close", "high", "low", "open", "volume"))
    assert(rows.map(_.getAs[Int]("feat_rank")) == (1 to 5))
    val costs = rows.sortBy(_.getAs[Int]("feat_rank")).map(_.getAs[Long]("cost"))
    assert(costs == costs.sorted, s"costs not rank-ordered: $costs")
    val top = rows.find(_.getAs[Int]("feat_rank") == 1).get
    val q240 = SparkEntry.queries("q240_decision_stump")(
        spark, "/root/testdata/sf0.001")
      .select("root_feat", "root_thr").collect().head
    assert(top.getAs[String]("feat") == q240.getString(0) &&
      top.getAs[Long]("best_thr") == q240.getLong(1),
      "rank-1 feature/threshold must be the q240 root split")
  }

  // ---------------------------------------------------- q253 / fmix64
  test("Fmix64 expression matches an independent BigInt mod-2^64 replay " +
    "of murmur3's finalizer, through codegen, including negative longs") {
    def ref(h0: Long): Long = {
      val M = BigInt(1) << 64
      def u(x: Long) = (BigInt(x) + M) % M
      def step(x: BigInt, c: BigInt) = ((x ^ (x >> 33)) * c) % M
      val a = step(u(h0), BigInt("18397679294719823053")) // 0xff51afd7ed558ccd
      val b = step(a, BigInt("14181476777654086739"))     // 0xc4ceb9fe1a85ec53
      (b ^ (b >> 33)).longValue
    }
    val ins = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue,
      3101789163359397495L)
    val got = ins.toDF("x")
      .select(graft.functions.HashFunctions.fmix64(col("x")).as("m"))
      .as[Long].collect().toSeq
    assert(got == ins.map(ref), s"$got vs ${ins.map(ref)}")
    assert(ref(0L) == 0L, "fmix64(0) must be 0 (murmur3 property)")
  }

  test("q253 on sf0.001: the planner choice is the min-estimate choice, " +
    "correctness column is consistent, and the fmix-KMV estimates land " +
    "within 2x of the exact join sizes") {
    val r = SparkEntry.queries("q253_join_order_choice")(
        spark, "/root/testdata/sf0.001").collect().head
    val (eo, xo) = (r.getAs[Long]("est_ol"), r.getAs[Long]("exact_ol"))
    val (el, xl) = (r.getAs[Long]("est_lp"), r.getAs[Long]("exact_lp"))
    val planned = r.getAs[String]("planned_first")
    assert(planned ==
      (if (eo <= el) "orders_lineitem_first" else "lineitem_part_first"))
    assert(r.getAs[Boolean]("planner_correct") ==
      (planned == r.getAs[String]("optimal_first")))
    assert(eo <= 2 * xo && xo <= 2 * eo, s"orderkey estimate $eo vs $xo")
    assert(el <= 2 * xl && xl <= 2 * el, s"partkey estimate $el vs $xl")
  }

  // ---------------------------------------------------- q250 structure
  test("q250 on sf0.001: fused ranks are 1..20 over distinct docs, the " +
    "RRF score matches its formula from the leg ranks, and ordering is " +
    "the (rrf DESC, doc_id ASC) contract") {
    val got = SparkEntry.queries("q250_rrf_hybrid")(
        spark, "/root/testdata/sf0.001")
      .select("fused_rank", "doc_id", "rrf_micro", "rank_lex", "rank_sem")
      .as[(Int, Long, Long, Option[Int], Option[Int])].collect().toSeq
    assert(got.map(_._1) == (1 to 20) && got.map(_._2).distinct.size == 20)
    got.foreach { case (_, id, rrf, rl, rs) =>
      assert(id != 0L, "query doc must be excluded from both universes")
      assert(rl.isDefined || rs.isDefined, s"doc $id in neither top-50")
      val expected = rl.map(r => 1000000L / (60 + r)).getOrElse(0L) +
        rs.map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(rrf == expected, s"doc $id rrf $rrf != $expected")
    }
    got.sliding(2).foreach {
      case Seq((_, id1, s1, _, _), (_, id2, s2, _, _)) =>
        assert(s1 > s2 || (s1 == s2 && id1 < id2), "fusion order violated")
      case _ => ()
    }
  }
}
