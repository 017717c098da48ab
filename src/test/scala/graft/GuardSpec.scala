package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.{Clustering, Pq}

/** Misuse must fail loudly with the contract in the message — not an
  * IndexOutOfBounds from a builder body, not a driver-OOM collect from an
  * unbounded centroid update. */
class GuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tinyVecs = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 4.0)))
    .toDF("id", "vec")

  test("seedCentroids rejects a driver-unboundable k*dim") {
    val e = intercept[IllegalArgumentException] {
      Clustering.seedCentroids(tinyVecs, "id", "vec", 1 << 20)
    }
    assert(e.getMessage.contains("k*dim"), e.getMessage)
    intercept[IllegalArgumentException] {
      Clustering.seedCentroids(tinyVecs, "id", "vec", 0)
    }
  }

  test("Pq.fit rejects codebook dimensions past the driver bound") {
    val e = intercept[IllegalArgumentException] {
      Pq.fit(tinyVecs, "id", "vec", m = 1024, sub = 64, k = 1024)
    }
    assert(e.getMessage.contains("driver-held"), e.getMessage)
    intercept[IllegalArgumentException] {
      Pq.fit(tinyVecs, "id", "vec", m = 0, sub = 2, k = 2)
    }
  }

  test("adcLut on a codebook with an empty subspace fails with the refit hint") {
    val cb = Pq.Codebooks(m = 1, sub = 2, books = Seq(Seq.empty))
    val e = intercept[IllegalArgumentException] {
      Pq.adcLut(Array(0.5, 0.5), cb)
    }
    assert(e.getMessage.contains("refit"), e.getMessage)
  }

  test("fixedPointCentroids caps the (cell, dim) collect") {
    // a raw 60k-distinct value passed as the cell column must trip the
    // bounded-collect require, not materialize on the driver — build a
    // frame with more (cell, dim) groups than the cap admits via a
    // synthetic range (cheap: the limit stops the scan early)
    val n = Clustering.MaxDriverCentroidScalars.toInt + 8
    val df = spark.range(n).select(col("id").as("c"),
      array(lit(1.0)).as("vec"))
    val e = intercept[IllegalArgumentException] {
      Clustering.fixedPointCentroids(df, "c", "vec")
    }
    assert(e.getMessage.contains("bounded cluster assignment"), e.getMessage)
  }

  test("top_k_longs SQL builder reports arity and literal misuse clearly") {
    graft.functions.GraftFunctions.register(spark)
    Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
      .createOrReplaceTempView("guard_topk")
    val e1 = intercept[Exception] {
      spark.sql("SELECT g, top_k_longs(v) FROM guard_topk GROUP BY g").collect()
    }
    assert(e1.getMessage.contains("expects 2 argument"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT g, top_k_longs(v, v) AS t FROM guard_topk GROUP BY g")
        .collect()
    }
    assert(e2.getMessage.contains("integer literal"), e2.getMessage)
  }
}
