package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Selection, Skyline}

/** Semantics of the grid-pruned skyline and the range-narrowing exact
  * selection beyond their oracles: the oracle proves Spark == DuckDB on
  * the production data; these pin the operators against brute-force
  * re-derivations on adversarial fixtures (the dual-sweep oracle shares
  * no code with the quadratic dominance definition used here). */
class OpsSelectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def naiveSkyline(pts: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val d = pts.distinct
    d.filter { case (x, y) =>
      !d.exists { case (a, b) => a >= x && b >= y && (a > x || b > y) }
    }.toSet
  }

  test("skyline == naive quadratic dominance on seeded random points") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(500)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val got = Skyline.skylineMax(pts.toDF("x", "y"), "x", "y", buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naiveSkyline(pts))
  }

  test("skyline keeps multiplicity and survives degenerate shapes") {
    // all points collinear-dominated except the single maximum; the max
    // appears 3 times so n must be 3
    val pts = Seq((1L, 1L), (2L, 2L), (9L, 9L), (9L, 9L), (9L, 9L))
    val rows = Skyline.skylineMax(pts.toDF("x", "y"), "x", "y", buckets = 4)
      .collect()
    assert(rows.length == 1)
    assert((rows(0).getLong(0), rows(0).getLong(1), rows(0).getLong(2))
      == (9L, 9L, 3L))
    // anti-chain: nothing dominates anything — every point survives
    val anti = Seq((1L, 5L), (2L, 4L), (3L, 3L), (4L, 2L), (5L, 1L))
    assert(Skyline.skylineMax(anti.toDF("x", "y"), "x", "y", buckets = 2)
      .count() == 5)
    // single dimension ties: (5, 9) dominates (5, 1)
    val ties = Seq((5L, 9L), (5L, 1L))
    assert(Skyline.skylineMax(ties.toDF("x", "y"), "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((5L, 9L)))
  }

  test("exactKth matches the sorted order statistic for every k") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(300)(rnd.nextLong() % 1000000L)
    val sorted = vals.sorted
    val df = vals.toDF("v")
    for (k <- Seq(1, 2, 150, 299, 300)) {
      assert(Selection.exactKth(df, "v", k, buckets = 16)
        == Some(sorted(k - 1)), s"k=$k")
    }
    assert(Selection.exactKth(df, "v", 0) == None)
    assert(Selection.exactKth(df, "v", 301) == None)
  }

  test("exactKth converges on adversarial distributions") {
    // all-equal column: first histogram pass collapses the range
    assert(Selection.exactKth(Seq.fill(50)(77L).toDF("v"), "v", 25)
      == Some(77L))
    // extreme range (forces multiple narrowing passes)
    val wide = Seq(Long.MinValue + 1, -1L, 0L, 1L, Long.MaxValue - 1)
    assert(Selection.exactKth(wide.toDF("v"), "v", 3, buckets = 4)
      == Some(0L))
    assert(Selection.exactKth(wide.toDF("v"), "v", 1, buckets = 4)
      == Some(Long.MinValue + 1))
    assert(Selection.exactKth(wide.toDF("v"), "v", 5, buckets = 4)
      == Some(Long.MaxValue - 1))
    // nulls ignored
    val withNulls = Seq(Some(5L), None, Some(1L), None, Some(3L))
      .toDF("v")
    assert(Selection.exactMedian(withNulls, "v") == Some((3L, 3L)))
  }

  test("exactMedianByGroup == per-group sorted lower median") {
    val rnd = new scala.util.Random(13)
    // uneven group sizes, one constant group, one full-width-span group
    val data =
      (0 until 301).map(i => ("a", rnd.nextLong() % 100000L)) ++
      (0 until 40).map(_ => ("b", rnd.nextLong())) ++
      (0 until 7).map(_ => ("c", 42L)) ++
      Seq(("d", Long.MinValue + 1), ("d", -5L), ("d", 9L),
        ("d", Long.MaxValue - 1), ("d", 10L))
    val got = Selection
      .exactMedianByGroup(data.toDF("g", "v"), "g", "v", buckets = 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val want = data.groupBy(_._1).map { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      g -> (sorted.size.toLong, sorted(((sorted.size + 1) / 2) - 1))
    }
    assert(got == want)
    assert(got("d")._2 == 9L) // sign-split path exercised
  }

  test("exactQuantiles == sorted rank pick for every percent at once") {
    val rnd = new scala.util.Random(7)
    val vals = (0 until 317).map(_ => rnd.nextLong() % 1000000L) ++
      Seq(Long.MinValue + 1, Long.MaxValue - 1, 0L, 0L, -1L)
    val sorted = vals.sorted
    val n = vals.size.toLong
    val ps = Seq(1, 10, 25, 50, 75, 95, 99, 100)
    val got = Selection.exactQuantiles(vals.toDF("v"), "v", ps, buckets = 16)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    ps.foreach { p =>
      val rank = ((p.toLong * n + 99) / 100).toInt
      assert(got(p) == (n, sorted(rank - 1)), s"p=$p")
    }
  }

  test("exactQuantiles handles constants, duplicates in percents, nulls") {
    val const = Seq.fill(40)(9L).toDF("v")
    assert(Selection.exactQuantiles(const, "v", Seq(50, 50, 95))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
      == Set((50, 9L), (95, 9L)))
    val withNulls = (Seq(5L, 1L, 3L).map(Option(_)) ++ Seq(None, None))
      .toDF("v")
    assert(Selection.exactQuantiles(withNulls, "v", Seq(50))
      .head().getLong(2) == 3L)
    intercept[IllegalArgumentException] {
      Selection.exactQuantiles(const, "v", Seq(0))
    }
  }

  test("exactMedianByGroup fails loudly past the group cap") {
    val many = (0 until 50).map(i => (s"g$i", i.toLong))
    val e = intercept[IllegalArgumentException] {
      Selection.exactMedianByGroup(many.toDF("g", "v"), "g", "v",
        maxGroups = 10)
    }
    assert(e.getMessage.contains("maxGroups"))
  }
}
