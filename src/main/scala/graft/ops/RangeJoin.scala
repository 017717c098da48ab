package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned (bucketized) range join — the scale-safe plan for
  * point-in-interval joins, which Spark would otherwise execute as a
  * broadcast-nested-loop or cartesian-with-filter (quadratic at 100 TB;
  * PlanAuditSpec forbids both).
  *
  * Both sides map their range coordinate onto integer bins of width
  * `binWidth`: a point lands in exactly one bin, an interval is exploded
  * to every bin it overlaps. The join then runs as a plain shuffled
  * EQUI-join on the bin id, and the exact `lo <= p <= hi` predicate
  * filters bin-collisions after the match. Each (interval, point) pair
  * meets at most once — in the point's single bin — so no dedup pass is
  * needed.
  *
  * Cost model: interval replication = len/binWidth + 1 rows, join input
  * per bin = points(bin) × intervals-overlapping(bin). Pick binWidth on
  * the order of the MAX interval length: replication stays O(1) per
  * interval while bins stay selective. Degenerate inputs (an interval
  * spanning the whole domain) replicate domain/binWidth times — cap
  * interval length upstream, same discipline as the dedup block caps.
  */
object RangeJoin {

  /** Inner-join `points` to every interval of `intervals` containing the
    * point (inclusive ends). `pointCol`, `loCol`, `hiCol` must be
    * integral (cents/epoch-style exact coordinates). Output carries all
    * columns of both inputs. */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", expr(s"$pointCol DIV $binWidth"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(expr(s"$loCol DIV $binWidth"), expr(s"$hiCol DIV $binWidth"))))
    p.join(iv, Seq("__bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
