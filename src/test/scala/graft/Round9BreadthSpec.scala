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
}
