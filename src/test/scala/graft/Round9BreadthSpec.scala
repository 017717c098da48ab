package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 breadth pins: exact ROC-AUC (q256), the Benford first-digit
  * audit (q257) and χ² categorical feature ranking (q258) — each
  * cross-validated by an independent in-memory BigInt replay over the
  * sf0.001 fixture (the oracle checks DuckDB agreement; these check the
  * MATH, with no SQL engine in the loop). */
class Round9BreadthSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---------------------------------------------------------- q256
  test("q256: engine AUC equals a brute-force O(bins^2) pair count, and " +
    "the Mann-Whitney identity holds") {
    val row = SparkEntry.queries("q256_roc_auc")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val (nPos, nNeg, nBins, pairsWon, tiedPairs, aucMicro) = row
    // independent replay: collect (score, y), count pairs exhaustively
    val sy = graft.tables.Tables.lineitem(spark, sf)
      .selectExpr("CAST(round(l_extendedprice * 100) AS BIGINT) div 100000",
        "CAST(l_returnflag = 'R' AS LONG)")
      .as[(Long, Long)].collect()
    val pos = sy.filter(_._2 == 1L).map(_._1)
    val neg = sy.filter(_._2 == 0L).map(_._1)
    assert(nPos == pos.length && nNeg == neg.length)
    assert(nBins == sy.map(_._1).distinct.length)
    var won = 0L; var tied = 0L
    // bin-level histogram product, not row pairs: still exact
    val ph = pos.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nh = neg.groupBy(identity).view.mapValues(_.length.toLong).toMap
    for ((sp, cp) <- ph; (sn, cn) <- nh) {
      if (sp > sn) won += cp * cn
      else if (sp == sn) tied += cp * cn
    }
    assert(pairsWon == won, s"pairs_won $pairsWon vs replay $won")
    assert(tiedPairs == tied)
    val expect = (BigInt(1000000) * (2 * won + tied) /
      (BigInt(2) * pos.length * neg.length)).toLong
    assert(aucMicro == expect)
    assert(aucMicro >= 0L && aucMicro <= 1000000L)
  }

  // ---------------------------------------------------------- q257
  test("q257: Benford micro constants partition 1e6 exactly; every row " +
    "replays against an in-memory digit census") {
    val rows = SparkEntry.queries("q257_benford_digits")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == (1L to 9L), "one row per digit 1..9")
    assert(rows.map(_._5).sum == 1000000L, "exp_micro must sum to 1e6")
    val cents = graft.tables.Tables.orders(spark, sf)
      .selectExpr("CAST(round(o_totalprice * 100) AS BIGINT)")
      .as[Long].collect()
    val census = cents.map(_.toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = cents.length.toLong
    rows.foreach { case (d, nD, nTot, obsMicro, expMicro, term) =>
      assert(nTot == n)
      assert(nD == census.getOrElse(d, 0L), s"digit $d count")
      assert(obsMicro == 1000000L * nD / n)
      val dev = BigInt(nD) * 1000000 - BigInt(n) * expMicro
      assert(term == (dev * dev / (BigInt(n) * expMicro)).toLong,
        s"digit $d chi2 term")
    }
  }

  // ---------------------------------------------------------- q258
  test("q258: per-feature chi2 replays from an in-memory contingency " +
    "grid (zero cells included) and the rank order is by chi2 desc") {
    val got = SparkEntry.queries("q258_chi2_feature_rank")(spark, sf)
      .as[(String, Long, Long, Long, Int)].collect().toSeq
    assert(got.map(_._1).sorted == Seq("brand", "linestatus", "priority"))
    assert(got.map(_._5) == (1 to 3), "ranks are 1..3 in order")
    assert(got.sortBy(-_._4).map(_._4) == got.map(_._4),
      "output ordered by chi2 desc")
    val base = graft.tables.Tables.lineitem(spark, sf)
      .join(graft.tables.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.tables.Tables.part(spark, sf),
        col("l_partkey") === col("p_partkey"))
      .selectExpr("o_orderpriority", "p_brand", "l_linestatus",
        "CAST(l_returnflag = 'R' AS INT) AS y")
      .collect()
    def chi2Of(fv: org.apache.spark.sql.Row => String): (Long, Long, Long) = {
      val rows = base.map(r => (fv(r), r.getInt(3)))
      val n = BigInt(rows.length)
      val rm = rows.groupBy(_._1).view.mapValues(v => BigInt(v.length)).toMap
      val cm = rows.groupBy(_._2).view.mapValues(v => BigInt(v.length)).toMap
      val ob = rows.groupBy(identity).view.mapValues(v => BigInt(v.length))
        .toMap
      var chi2 = BigInt(0)
      for ((f, r) <- rm; (y, c) <- cm) {
        val o = ob.getOrElse((f, y), BigInt(0))
        val dev = o * n - r * c
        chi2 += BigInt(1000000) * dev * dev / (r * c * n)
      }
      ((rm.size.toLong * cm.size), (rm.size - 1).toLong * (cm.size - 1),
        chi2.toLong)
    }
    val expect = Map(
      "priority" -> chi2Of(_.getString(0)),
      "brand" -> chi2Of(_.getString(1)),
      "linestatus" -> chi2Of(_.getString(2)))
    got.foreach { case (feature, nCells, dof, chi2, _) =>
      val (en, ed, ec) = expect(feature)
      assert(nCells == en, s"$feature n_cells")
      assert(dof == ed, s"$feature dof")
      assert(chi2 == ec, s"$feature chi2 $chi2 vs replay $ec")
    }
  }

  // ---------------------------------------------------------- q259
  /** Events staged as raw µs-long ts (unannotated int64 → the reader's
    * magnitude CASE treats < 1e17 as µs — the documented fallback). */
  private def stageEvents(rows: Seq[(Long, Long, Long, String, Double)])
      : String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_r9b_").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("q259: hand-computed lerp — a rising 3-hour gap splits the move " +
    "into thirds; a falling gap truncates toward zero (963, not 962)") {
    val h0 = 1704067200L * 1000000L // 2024-01-01 00:00 UTC in µs
    def h(i: Int) = h0 + i * 3600L * 1000000L
    val dir = stageEvents(Seq(
      // user 1: bars at hours 0 and 3 (values 10.00 → 16.00) → gaps at
      // 1, 2 lerped to 12.00, 14.00
      (1L, h(0), 1L, "t", 10.00), (2L, h(3), 1L, "t", 16.00),
      // user 2: bars at hours 0 and 2 (10.00 → 9.25): gap at 1 is
      // 1000 + (-75 * 1) div 2 = 1000 - 37 = 963 — truncation toward
      // zero on a NEGATIVE numerator, the cross-engine agreement the
      // scaladoc pins
      (3L, h(0), 2L, "t", 10.00), (4L, h(2), 2L, "t", 9.25)))
    val got = SparkEntry.queries("q259_gap_lerp")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 2L, 2L, 1000L + 1600L + 1200L + 1400L, 1200L + 2 * 1400L),
      (2L, 3L, 2L, 1L, 1000L + 925L + 963L, 963L)), got.toString)
  }

  test("q259 on sf0.001: every interpolant is bracketed by its segment " +
    "ends (consistency vs an in-memory replay of the whole query)") {
    val got = SparkEntry.queries("q259_gap_lerp")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    // replay: hourly bars by max event_id, then segment lerp
    val bars = graft.tables.Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(date_trunc('hour', ts) AS LONG) div 3600",
        "event_id", "CAST(round(value * 100) AS LONG)")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2))
      .map { case ((u, hx), g) => (u, hx, g.maxBy(_._3)._4) }.toSeq
    val byUser = bars.groupBy(_._1)
    got.foreach { case (u, nHours, nBars, nGaps, sumI, chk) =>
      val series = byUser(u).map(r => (r._2, r._3)).sortBy(_._1)
      assert(nBars == series.size)
      assert(nHours == series.last._1 - series.head._1 + 1)
      var gaps = 0L; var gsum = 0L; var gchk = 0L
      series.sliding(2).foreach {
        case Seq((ha, va), (hb, vb)) =>
          ((ha + 1) until hb).foreach { hh =>
            gaps += 1
            val v = va + (vb - va) * (hh - ha) / (hb - ha)
            assert(v >= math.min(va, vb) && v <= math.max(va, vb),
              s"user $u hour $hh lerp $v outside [$va, $vb]")
            gsum += v; gchk += v * (hh - ha)
          }
        case _ => ()
      }
      assert(nGaps == gaps, s"user $u gap count")
      assert(sumI == series.map(_._2).sum + gsum, s"user $u lerp sum")
      assert(chk == gchk, s"user $u position checksum")
    }
  }

  // ---------------------------------------------------------- q260
  test("q260: recall rows are internally consistent and amplification " +
    "monotone — 8 OR-ed tables never recall less than the measured 2") {
    import graft.similarity.Similarity
    import graft.tables.Tables
    val got = SparkEntry.queries("q260_ann_recall")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == (0L until 10L), "one row per query 0..9")
    got.foreach { case (q, nTrue, nHit, micro) =>
      assert(nTrue == 5L, s"query $q n_true")
      assert(nHit >= 0L && nHit <= nTrue)
      assert(micro == 1000000L * nHit / nTrue, s"query $q recall formula")
    }
    // per-query monotonicity: hits(8 tables) >= hits(2 tables)
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
    def hitsAt(tables: Int): Map[Long, Long] =
      exact.join(
          Similarity.lshTopK(emb, qs, "vec_id", "embedding", 5, 2, 64, tables)
            .select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").count()
        .as[(Long, Long)].collect().toMap
    val h8 = hitsAt(8)
    got.foreach { case (q, _, nHit, _) =>
      assert(h8.getOrElse(q, 0L) >= nHit,
        s"query $q: 8-table recall below the 2-table measurement")
    }
  }

  // ---------------------------------------------------------- q261
  test("q261: Gini and top-1% share replay from an in-memory sorted " +
    "census of the binned order values") {
    val row = SparkEntry.queries("q261_gini_concentration")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val (n, nBins, sumU, giniMicro, topUnits, topShare) = row
    val vs = graft.tables.Tables.orders(spark, sf)
      .selectExpr("CAST(round(o_totalprice * 100) AS BIGINT) div 10000")
      .as[Long].collect().sorted
    assert(n == vs.length && nBins == vs.distinct.length)
    assert(sumU == vs.sum)
    // rank identity on the raw sorted values, no bins
    val a2 = vs.zipWithIndex.map { case (v, i) =>
      BigInt(2) * (i + 1) * v }.sum
    val gini = (BigInt(1000000) * (a2 - BigInt(n + 1) * sumU) /
      (BigInt(n) * sumU)).toLong
    assert(giniMicro == gini, s"gini $giniMicro vs replay $gini")
    assert(giniMicro >= 0L && giniMicro < 1000000L)
    val kn = math.max(n / 100, 1L)
    val top = vs.reverse.take(kn.toInt).sum
    assert(topUnits == top, s"top-1% units $topUnits vs replay $top")
    assert(topShare == 1000000L * top / sumU)
    // concentration sanity: the top 1% of orders holds >= 1% of value
    assert(topShare * 100 >= 1000000L)
  }

  // ---------------------------------------------------------- q262
  test("q262: every replicate weight replays from the repo FNV hash, " +
    "pseudo-sample sizes concentrate around n, and the replicate means " +
    "bracket the full-sample mean") {
    import graft.functions.Hashing
    val got = SparkEntry.queries("q262_bootstrap_ci")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == (0L until 32L), "one row per replicate")
    val orders = graft.tables.Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "CAST(round(o_totalprice * 100) AS BIGINT)")
      .as[(Long, Long)].collect()
    val n = orders.length.toLong
    val fullMeanMilli = 1000L * orders.map(_._2).sum / n
    got.foreach { case (b, nB, sumC, meanMilli) =>
      var en = 0L; var es = 0L
      orders.foreach { case (okey, cents) =>
        val m = ((Hashing.fmix64(
          Hashing.fnv1a64(s"$okey:$b".getBytes)) >>> 33) & 1L) * 2L
        en += m; es += m * cents
      }
      assert(nB == en, s"replicate $b pseudo-size")
      assert(sumC == es, s"replicate $b weighted sum")
      assert(meanMilli == 1000L * es / en)
      // 2*Binomial(n, 1/2): sd = sqrt(n); allow 6 sigma
      assert(math.abs(nB - n) <= 6 * math.sqrt(n.toDouble).toLong + 6,
        s"replicate $b size $nB implausibly far from n=$n")
    }
    val means = got.map(_._4)
    assert(means.min <= fullMeanMilli && fullMeanMilli <= means.max,
      s"replicate means [${means.min}, ${means.max}] do not bracket " +
        s"the full-sample mean $fullMeanMilli")
  }

  // ---------------------------------------------------------- q263
  test("q263: every reliability bucket replays from an in-memory " +
    "train-split frequency model; test rows are fully covered") {
    val got = SparkEntry.queries("q263_calibration")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val rows = graft.tables.Tables.lineitem(spark, sf)
      .selectExpr("CAST(round(l_extendedprice * 100) AS BIGINT) div 100000",
        "CAST(l_returnflag = 'R' AS LONG)", "l_orderkey % 5 = 0")
      .as[(Long, Long, Boolean)].collect()
    val tr = rows.filterNot(_._3)
    val p0 = 1000000L * tr.map(_._2).sum / tr.length
    val pm = tr.groupBy(_._1).view.mapValues { g =>
      1000000L * g.map(_._2).sum / g.length }.toMap
    val te = rows.filter(_._3)
      .map { case (bin, y, _) => (pm.getOrElse(bin, p0), y) }
    val expect = te.groupBy(_._1 / 10000).toSeq.sortBy(_._1).map {
      case (b, g) =>
        val n = g.length.toLong
        val sp = g.map(_._1).sum
        val k = g.map(_._2).sum
        (b, n, sp / n, 1000000L * k / n, 1000000L * k / n - sp / n)
    }
    assert(got == expect, s"got $got\nexpect $expect")
    assert(got.map(_._2).sum == te.length, "test rows fully covered")
  }

  // ---------------------------------------------------------- q264
  test("q264: identical-distribution sources sit at ~0 KL, a skewed " +
    "source is strictly positive from it, and quantized KL is never " +
    "below -1 micro-nat") {
    // src a and b: the same 6-token distribution; src c: heavily skewed
    val rows = (1L to 12L).map { i =>
      val src = if (i <= 4) "a" else if (i <= 8) "b" else "c"
      val text = if (src == "c") "xx xx xx xx xx yy"
        else "xx yy zz ww xx yy"
      (i, text, "en", src)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_r9kl_").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q264_kl_source_drift")(spark, tmp)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => ((r._1, r._2), r._6)).toMap
    assert(got.keySet == Set(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
      ("b", "c"), ("c", "b")))
    assert(math.abs(got(("a", "b"))) <= 1 && math.abs(got(("b", "a"))) <= 1,
      s"identical sources should be ~0: ${got(("a", "b"))}")
    assert(got(("a", "c"))> 1000L && got(("c", "a")) > 1000L,
      s"skew must show: ${got(("a", "c"))}, ${got(("c", "a"))}")
    got.values.foreach(v => assert(v >= -1L,
      s"quantized KL below the -1 micro quantization floor: $v"))
  }

  test("q264 on sf0.001: full in-memory replay of the model and the " +
    "divergence sum") {
    val got = SparkEntry.queries("q264_kl_source_drift")(spark, sf)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    val toks = graft.tables.Tables.documents(spark, sf)
      .selectExpr("source", "explode(split(lower(text), '[^a-z]+')) AS w")
      .where(col("w") =!= "")
      .as[(String, String)].collect()
    val vocab = toks.groupBy(_._2).filter(_._2.length >= 5).keySet
    val tv = toks.filter(t => vocab(t._2))
    val top8 = tv.groupBy(_._1).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (s, t) => (-t, s) }.take(8)
    val ts = top8.toMap
    val v = vocab.size.toLong
    val csw = tv.filter(t => ts.contains(t._1)).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    def w(s: String, word: String): Long =
      math.round(math.log((csw.getOrElse((s, word), 0L) + 1).toDouble
        / (ts(s) + v).toDouble) * 1e6)
    got.foreach { case (a, b, nVocab, tA, vv, klMicro) =>
      assert(nVocab == v && vv == v && tA == ts(a))
      val scaled = vocab.toSeq.map { word =>
        (csw.getOrElse((a, word), 0L) + 1) * (w(a, word) - w(b, word))
      }.sum
      assert(klMicro == scaled / (ts(a) + v), s"KL($a||$b)")
    }
    assert(got.size == ts.size * (ts.size - 1))
  }

  // ---------------------------------------------------------- q265
  test("q265: pair census replays from the collected nation metrics " +
    "and the signed square is comparison-equivalent to tau-b") {
    val row = SparkEntry.queries("q265_kendall_tau")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val (n0, c, d, tx, ty, tau2) = row
    val m = graft.tables.Tables.customer(spark, sf)
      .join(graft.tables.Tables.orders(spark, sf),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_nationkey")
      .agg(countDistinct("c_custkey").as("x"),
        sum(coalesce(expr("CAST(round(o_totalprice * 100) AS BIGINT)"),
          lit(0L))).as("y"))
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    val pairs = for {
      i <- m.indices; j <- (i + 1) until m.length
    } yield (m(i)._2 - m(j)._2, m(i)._3 - m(j)._3)
    assert(n0 == pairs.size && n0 == m.length.toLong * (m.length - 1) / 2)
    assert(c == pairs.count(p => p._1 > 0 && p._2 > 0
      || p._1 < 0 && p._2 < 0))
    assert(d == pairs.count(p => p._1 > 0 && p._2 < 0
      || p._1 < 0 && p._2 > 0))
    assert(tx == pairs.count(_._1 == 0) && ty == pairs.count(_._2 == 0))
    val num = BigInt(1000000) * (c - d) * (c - d) *
      (if (c >= d) 1 else -1)
    assert(tau2 == (num / (BigInt(n0 - tx) * (n0 - ty))).toLong ||
      // negative truncating division: both engines truncate toward zero
      tau2 == -((BigInt(1000000) * (d - c) * (d - c)) /
        (BigInt(n0 - tx) * (n0 - ty))).toLong)
    // sign agreement with float tau-b
    val tauB = (c - d).toDouble /
      math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    assert(math.signum(tauB) == math.signum(tau2.toDouble))
  }

  // ---------------------------------------------------------- q266
  test("q266: WOE/IV replays in-memory; WOE sign tracks whether the " +
    "category is good-heavier than the corpus; IV terms are nonnegative") {
    val got = SparkEntry.queries("q266_woe_encoding")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val base = graft.tables.Tables.lineitem(spark, sf)
      .join(graft.tables.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .selectExpr("o_orderpriority", "CAST(l_returnflag = 'R' AS LONG)")
      .as[(String, Long)].collect()
    val cc = base.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2 == 0L).toLong, g.count(_._2 == 1L).toLong) }.toMap
    val g = cc.values.map(_._1).sum; val b = cc.values.map(_._2).sum
    val k = cc.size.toLong
    assert(got.map(_._1).sorted == cc.keys.toSeq.sorted)
    got.foreach { case (cat, good, bad, dg, db, woe, iv) =>
      val (eg, eb) = cc(cat)
      assert(good == eg && bad == eb, s"$cat counts")
      assert(dg == 1000000L * (good + 1) / (g + k))
      assert(db == 1000000L * (bad + 1) / (b + k))
      val ew = math.round(math.log(
        ((good + 1) * (b + k)).toDouble / ((bad + 1) * (g + k)).toDouble)
        * 1e6)
      assert(woe == ew, s"$cat woe $woe vs $ew")
      assert(iv == (dg - db) * woe, s"$cat iv term")
      // same-direction: dg > db ⟺ the exact ln argument > 1 ⟺ woe > 0
      // (both compare (good+1)(b+k) vs (bad+1)(g+k); quantization can
      // only zero a near-1 ratio, so allow woe == 0)
      if (dg != db) assert(math.abs(woe) <= 2L || (dg > db) == (woe > 0L),
        s"$cat woe sign")
      // IV terms are products of same-sign factors up to quantization
      assert(iv >= -1000000L, s"$cat iv term implausibly negative: $iv")
    }
  }

  // ---------------------------------------------------------- q267
  test("q267: assignment, rollup and the signed-square statistic replay " +
    "in-memory; the null fixture is not significant") {
    import graft.functions.Hashing
    val row = SparkEntry.queries("q267_ab_ztest")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().head
    val (n1, k1, n2, k2, p1, p2, z2, sig) = row
    val users = graft.tables.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("np"))
      .as[(Long, Long)].collect()
    val byVariant = users.groupBy { case (u, _) =>
      (Hashing.fmix64(Hashing.fnv1a64(s"ab:$u".getBytes)) >>> 33) & 1L }
    def nk(v: Long) = {
      val g = byVariant.getOrElse(v, Array.empty)
      (g.length.toLong, g.count(_._2 >= 14L).toLong)
    }
    val ((en1, ek1), (en2, ek2)) = (nk(0L), nk(1L))
    assert((n1, k1, n2, k2) == ((en1, ek1, en2, ek2)), "rollup mismatch")
    assert(k1 > 0 && k1 < n1 && k2 > 0 && k2 < n2,
      "outcome must populate both classes in both variants")
    assert(p1 == 1000000L * k1 / n1 && p2 == 1000000L * k2 / n2)
    val d = BigInt(k1) * n2 - BigInt(k2) * n1
    val nn = BigInt(n1 + n2); val kk = BigInt(k1 + k2)
    val mag = (BigInt(1000000) * d * d * nn /
      (BigInt(n1) * n2 * kk * (nn - kk))).toLong
    assert(z2 == (if (d >= 0) mag else -mag), s"z2 $z2 vs replay")
    assert(sig == (math.abs(z2) >= 3841459L))
    // assignment is independent of behavior by construction: the null
    // must hold (a significant result here would indicate hash bias —
    // the q262 lesson as an assertion)
    assert(!sig, s"null A/B split came out significant: z2=$z2")
  }

  // ---------------------------------------------------------- q268
  test("q268: the posterior mean replays in-memory and always lies " +
    "between the raw rate and the prior (within 1 micro of truncation)") {
    val got = SparkEntry.queries("q268_eb_shrinkage")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    val base = graft.tables.Tables.lineitem(spark, sf)
      .join(graft.tables.Tables.part(spark, sf),
        col("l_partkey") === col("p_partkey"))
      .selectExpr("p_brand", "CAST(l_returnflag = 'R' AS LONG)")
      .as[(String, Long)].collect()
    val p0 = 1000000L * base.map(_._2).sum / base.length
    val cc = base.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    got.foreach { case (brand, n, k, gotP0, raw, eb, shrink) =>
      val (en, ek) = cc(brand)
      assert((n, k, gotP0) == ((en, ek, p0)), s"$brand inputs")
      assert(raw == 1000000L * k / n)
      assert(eb == (1000000L * k + 20L * p0) / (n + 20L), s"$brand eb")
      assert(shrink == eb - raw)
      // shrinkage moves toward the prior, never past it (±1 micro
      // truncation slack on each of the two divisions)
      val (lo, hi) = (math.min(raw, p0) - 1, math.max(raw, p0) + 1)
      assert(eb >= lo && eb <= hi, s"$brand eb $eb outside [$lo, $hi]")
    }
  }

  // ---------------------------------------------------------- q269
  test("q269: S, ties, the variance and the signed square replay from " +
    "an in-memory pair census of the daily series") {
    val row = SparkEntry.queries("q269_mann_kendall")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, String)].collect().head
    val (nDays, n0, s, tiePairs, var18, z2, trend) = row
    val daily = graft.tables.Tables.orders(spark, sf)
      .selectExpr("CAST(o_orderdate AS DATE)",
        "CAST(round(o_totalprice * 100) AS BIGINT)")
      .as[(java.sql.Date, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(_._1.getTime)
    assert(nDays == daily.length)
    var es = 0L; var eTies = 0L; var en0 = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      en0 += 1
      val d = daily(j)._2 - daily(i)._2
      if (d > 0) es += 1 else if (d < 0) es -= 1 else eTies += 1
    }
    assert((n0, s, tiePairs) == ((en0, es, eTies)), "pair census")
    val n = BigInt(daily.length)
    val tie18 = daily.groupBy(_._2).values.map(_.size.toLong)
      .filter(_ > 1).map(t => t * (t - 1) * (2 * t + 5)).sum
    assert(var18 == (n * (n - 1) * (2 * n + 5) - tie18).toLong)
    val mag = (BigInt(18000000) * es * es / var18).toLong
    assert(z2 == (if (es >= 0) mag else -mag))
    assert(trend == (if (math.abs(z2) < 3841459L) "none"
      else if (z2 > 0) "up" else "down"))
  }

  // ---------------------------------------------------------- q270
  test("q270: both MAEs and MASE replay from an in-memory backtest of " +
    "the daily series over the identical scored-day set") {
    val row = SparkEntry.queries("q270_forecast_backtest")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().head
    val (nScored, mae1, mae7, mase) = row
    val daily = graft.tables.Tables.orders(spark, sf)
      .selectExpr("CAST(o_orderdate AS DATE)",
        "CAST(round(o_totalprice * 100) AS BIGINT)")
      .as[(java.sql.Date, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(_._1.getTime).map(_._2)
    val scored = (7 until daily.length).map { i =>
      (math.abs(daily(i) - daily(i - 1)), math.abs(daily(i) - daily(i - 7)))
    }
    assert(nScored == scored.size)
    val (sae1, sae7) = (scored.map(_._1).sum, scored.map(_._2).sum)
    assert(mae1 == sae1 / nScored && mae7 == sae7 / nScored)
    assert(mase == (if (sae1 == 0) 0L
      else (BigInt(1000000) * sae7 / sae1).toLong))
    // a sane backtest: seasonal-naive should not be orders of magnitude
    // off the one-step baseline on a stationary-ish synthetic series
    assert(mase > 100000L && mase < 10000000L, s"implausible MASE $mase")
  }
}
