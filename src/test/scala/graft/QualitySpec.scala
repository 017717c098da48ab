package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.quality.Profile
import graft.similarity.Similarity

class QualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("profile: nulls, cardinality, typed min/max per column") {
    val df = Seq(
      (Some(1L), Some("a"), Some(2.5)),
      (Some(2L), None, Some(7.5)),
      (None, Some("b"), Some(2.5)))
      .toDF("id", "s", "x")
    val got = Profile.profile(df, Seq("id" -> true, "s" -> false, "x" -> true))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("id").getLong(1) == 3)          // n_rows
    assert(got("id").getLong(3) == 1)          // n_null
    assert(got("id").getLong(4) == 2)          // n_distinct
    assert(got("id").getDouble(5) == 1.0 && got("id").getDouble(6) == 2.0)
    assert(got("s").getLong(3) == 1)
    assert(got("s").getString(7) == "a" && got("s").getString(8) == "b")
    assert(got("s").isNullAt(5) && got("s").isNullAt(6)) // no numeric min/max
    assert(got("x").getLong(4) == 2)           // distinct counts values, not rows
  }

  test("quantizeInt8: codes bounded, reconstruction within one step") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(3.0f, 3.0f, -3.0f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    // amax correct, codes within the int8 envelope
    assert(rows(0).getDouble(2) == 1.0 && rows(1).getDouble(2) == 3.0)
    rows.foreach { r =>
      assert(r.getLong(3) >= -128 && r.getLong(4) <= 127,
        s"codes out of int8 envelope: $r")
    }
    // vec 2: codes floor(±127.0) → 127, 127, -127; sum 127
    assert(rows(1).getLong(5) == 127L)
  }

  test("Reconcile.diff: added/removed/changed/unchanged with null-safe compare") {
    val oldSnap = Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
      .toDF("k", "v")
    val newSnap = Seq((2L, None: Option[String]), (3L, Some("x")), (4L, Some("d")))
      .toDF("k", "v")
    val got = graft.ops.Reconcile.diff(oldSnap, newSnap, "k", Seq("v"))
      .select("k", "diff_status").as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "removed",
      2L -> "unchanged", // null <=> null — null-safe equality, not SQL =
      3L -> "changed",
      4L -> "added"))
  }

  test("observe(): in-flight quality metrics ride the job, no extra scan") {
    // The zero-cost counterpart of the q100 profile: quality counters
    // attached to a production job via df.observe — computed inside the
    // same pass (no second aggregation job), collected on the driver
    // through the query-execution listener path.
    val df = Seq((1L, "ok"), (2L, null), (3L, "ok"), (4L, null))
      .toDF("id", "s")
    val observed = df.observe("gate",
      count(lit(1)).as("n_rows"),
      sum(col("s").isNull.cast("long")).as("n_null_s"))
      .where(col("id") =!= 999) // downstream work rides the same job
    observed.collect()
    val metrics = observed.queryExecution.observedMetrics("gate")
    assert(metrics.getLong(metrics.fieldIndex("n_rows")) == 4)
    assert(metrics.getLong(metrics.fieldIndex("n_null_s")) == 2)
  }

  test("quantizeInt8: all-zero vector yields null codes, not NaN") {
    val df = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Similarity.quantizeInt8(df, "vec_id", "embedding").collect()(0)
    assert(r.getDouble(2) == 0.0) // amax
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }

  test("otsu: bimodal distribution thresholds between the modes") {
    // 100 values at 10, 80 at 100 → the best split must put exactly the
    // low mode in class 0
    val vals = Seq.fill(100)(10L) ++ Seq.fill(80)(100L)
    val df = vals.toDF("v")
    val rows = graft.quality.Otsu.otsuTable(spark, df, "v", bins = 16)
      .collect()
    val best = rows.filter(_.getBoolean(4))
    assert(best.length == 1)
    assert(best(0).getLong(1) == 100L && best(0).getLong(2) == 80L)
    // every candidate here yields the same split (middle bins are
    // empty) — the tie must break to the SMALLEST k, matching the
    // oracle's row_number order
    assert(best(0).getLong(0) == 0L)
    val bs = best(0).getLong(3)
    rows.filterNot(_.getBoolean(4)).foreach(r => assert(r.getLong(3) <= bs))
    // three-mode fixture where splits genuinely differ: the best
    // threshold must separate the two heavy modes (10s vs 100s),
    // putting the light middle mode (55) with the low side — and must
    // be strictly better than splitting inside a mode
    val tri = Seq.fill(90)(10L) ++ Seq.fill(20)(55L) ++ Seq.fill(90)(100L)
    val rows3 = graft.quality.Otsu.otsuTable(spark, tri.toDF("v"), "v", 16)
      .collect()
    val best3 = rows3.filter(_.getBoolean(4)).head
    assert(best3.getLong(1) == 110L && best3.getLong(2) == 90L)
  }

  test("otsu: uniform single-value column is rejected loudly") {
    val df = Seq.fill(10)(5L).toDF("v")
    // all mass in bin 0 → no candidate with both classes non-empty →
    // maxBy on empty must not silently succeed
    val e = intercept[Exception] {
      graft.quality.Otsu.otsuTable(spark, df, "v").collect()
    }
    assert(e != null)
  }
}
