package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline (maximize both dimensions) with coarse-grid
  * pruning — the multi-criteria "best offers" operator (best
  * price×recency, quality×coverage, …) a curation pipeline runs to pick
  * non-dominated candidates.
  *
  * Scale shape: the naive skyline is an all-pairs dominance test
  * (corpus²). Here each distinct point is bucketed onto a B×B grid
  * (integer arithmetic off one bounded min/max aggregate); a grid cell
  * is discarded when some non-empty cell dominates it STRICTLY on both
  * axes — every point of the dominating cell then dominates every point
  * of the discarded one, because bucket ranges are disjoint and
  * monotone. The surviving anti-chain band (≤ 2B−1 cells of the ≤ B²
  * non-empty ones) is what reaches the exact pass, so the final
  * single-partition running-max sweep sees band-sized input, not the
  * corpus: at 100 TB the corpus-sized work is one scan + one
  * map-combinable distinct, and the driver holds ≤ B² cell ids
  * (the bounded-collect discipline used by the Lloyd fits).
  *
  * The exact pass sorts the band by (x DESC, y DESC) and keeps a point
  * iff its y strictly exceeds the running max y of all earlier rows:
  * earlier rows have strictly greater x (or equal x and strictly
  * greater y), which is exactly the dominance predicate on distinct
  * points.
  */
object Skyline {

  /** Distinct non-dominated (x, y) points, maximizing both. Input cols
    * must be integral (LONG-castable); output: x, y, n (multiplicity of
    * the point in the input). */
  def skylineMax(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 32): DataFrame = {
    require(buckets >= 2 && buckets <= 4096, s"buckets out of range: $buckets")
    val pts = df
      .select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .groupBy("x", "y").agg(count(lit(1)).as("n"))

    // One bounded aggregate → 4 longs on the driver.
    val Array(bounds) = pts.agg(
      min("x").as("xmin"), max("x").as("xmax"),
      min("y").as("ymin"), max("y").as("ymax")).collect()
    if (bounds.isNullAt(0)) return pts.select("x", "y", "n") // empty input
    val (xmin, xmax) = (bounds.getLong(0), bounds.getLong(1))
    val (ymin, ymax) = (bounds.getLong(2), bounds.getLong(3))
    // (v - min) rides ANSI long arithmetic below — fail loudly rather
    // than overflow on a full-width coordinate range.
    require(xmax - xmin >= 0 && ymax - ymin >= 0,
      "coordinate span exceeds the signed-long range")
    // Disjoint monotone integer ranges: width ≥ 1, index = (v-min)/w.
    val xw = math.max(1L, (xmax - xmin) / buckets + 1)
    val yw = math.max(1L, (ymax - ymin) / buckets + 1)

    // exact long DIV, not `/`: double division can round a quotient at
    // the top of the range up to an out-of-grid bucket index
    val cells = pts
      .select(expr(s"(x - ${xmin}L) DIV ${xw}L").as("cx"),
        expr(s"(y - ${ymin}L) DIV ${yw}L").as("cy"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(cells.length <= buckets * buckets,
      s"grid produced ${cells.length} cells (> ${buckets * buckets})")
    // A cell survives unless a non-empty cell strictly dominates it.
    val keep = cells.filter { case (cx, cy) =>
      !cells.exists { case (dx, dy) => dx > cx && dy > cy }
    }.toSet
    val keepDf = df.sparkSession
      .createDataFrame(keep.toSeq.map(c => Tuple2(c._1, c._2)))
      .toDF("cx", "cy")

    val band = pts
      .withColumn("cx", expr(s"(x - ${xmin}L) DIV ${xw}L"))
      .withColumn("cy", expr(s"(y - ${ymin}L) DIV ${yw}L"))
      .join(broadcast(keepDf), Seq("cx", "cy"))
    // Exact sweep over the band only (documented single partition — the
    // grid prune bounds what reaches it; not a corpus-sized sort).
    import org.apache.spark.sql.expressions.Window
    val sweep = Window.orderBy(col("x").desc, col("y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    band
      .withColumn("runmax", max("y").over(sweep))
      .where(col("runmax").isNull || col("y") > col("runmax"))
      .select("x", "y", "n")
  }
}
