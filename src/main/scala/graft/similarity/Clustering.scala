package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means (Lloyd) steps — the clustering leg of
  * semantic dedup / corpus organization (SemDeDup-style: cluster the
  * embedding space, then dedup or budget WITHIN cells). MLlib's KMeans
  * fits the IVF index (q72/q109) where only the PARTITIONING matters; here
  * the assignments themselves are the result, so every step is fully
  * deterministic and engine-reproducible:
  *
  *   - seeding is by lowest ids, not kmeans|| randomness;
  *   - assignment is an in-scan argmin over driver-held centroid literals
  *     (`‖c‖² − 2x·c`, the `‖x‖²` term is rank-constant), ties to the
  *     lower cell id — no shuffle;
  *   - centroid recomputation accumulates in FIXED-POINT (Σ round(x·2²⁴)
  *     as exact int64): float partial sums are partitioning-order-
  *     dependent, so a float mean is not even run-to-run stable on a
  *     cluster — the fixed-point sum is exact and order-free, which is
  *     what makes a distributed Lloyd step bit-reproducible. One
  *     posexplode + one (cell, dim) aggregation shuffle (map-side
  *     combinable), k×dim longs to the driver — the same driver-held-
  *     centroid discipline as the IVF probe list.
  *
  * Scale bound: |x|·2²⁴·members-per-cell must fit int64 — ~2⁸ headroom at
  * a trillion rows per cell for unit-scale embeddings; lower the scale
  * bits if your vectors are larger. */
object Clustering {

  /** Hard ceiling on driver-held centroid state: every collect here is
    * k×dim (or cells×dim) scalars BY CONSTRUCTION, but nothing stops a
    * caller passing k=10⁷ — these bounds make that misuse fail with a
    * message instead of materializing a multi-GB driver array. 2¹⁸
    * doubles = 2 MB, ~64× any sane codebook and far below heap. */
  private[graft] val MaxDriverCentroidScalars: Long = 1L << 18

  /** Deterministic seed centroids: the vectors of the `k` lowest-id rows,
    * as (cellId, centroid) pairs. Driver-held k×dim doubles. */
  def seedCentroids(df: DataFrame, id: String, vec: String,
                    k: Int): Seq[(Int, Array[Double])] = {
    require(k > 0, s"k must be positive, got $k")
    // the driver cost is k×dim, not k — probe dim with a 1-row scan so
    // k=60000 over 4096-dim vectors fails HERE, not as a driver OOM
    // inside the collect
    val dim = df.select(size(Similarity.vecDouble(col(vec)))).limit(1)
      .collect().headOption.map(_.getInt(0)).getOrElse(0)
    require(k.toLong * math.max(dim, 1) <= MaxDriverCentroidScalars,
      s"k*dim = ${k.toLong * dim} exceeds $MaxDriverCentroidScalars " +
        "driver-held doubles")
    df.select(col(id), Similarity.vecDouble(col(vec)).as("v"))
      .orderBy(col(id)).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Double](1).toArray }.toSeq
  }

  /** Cell-assignment column: argmin over the driver-held centroids, ties
    * to the lower cell id. Pure expression — pipelines inside the scan.
    *
    * Runs as the codegen'd [[graft.functions.ArgMinSqDist]] loop: the
    * equivalent composed form (k distance subtrees + array_sort, or a
    * `transform` lambda over centroid literals) costs O(k·dim) Catalyst
    * nodes and evaluates interpreted — at the PQ configuration (k=64,
    * m=8 subspaces) that was ~70 µs/row and dominated the whole fit.
    * The loop computes the IDENTICAL arithmetic (driver-folded ‖c‖²,
    * sequential dot, d = csq − 2·dot, strict-< tie to the lower cell),
    * so assignments — and every oracle replicating them in SQL — are
    * unchanged bit for bit. */
  def assignCell(vec: Column, centroids: Seq[(Int, Array[Double])]): Column = {
    val sorted = centroids.sortBy(_._1)
    val dim = sorted.head._2.length
    require(sorted.forall(_._2.length == dim), "ragged centroids")
    graft.functions.HashFunctions.argmin_sqdist(
      Similarity.vecDouble(vec),
      cells = sorted.map(_._1).toArray,
      csq = sorted.map(_._2.map(x => x * x).sum).toArray,
      ctrs = sorted.flatMap(_._2).toArray,
      dim = dim)
  }

  /** One Lloyd mean-update in fixed point: per (cell, dim) exact integer
    * sums, divided back on the driver. Cells with no members simply have
    * no centroid in the result (k shrinks — the deterministic analogue of
    * MLlib dropping an empty cluster). */
  def fixedPointCentroids(assigned: DataFrame, cell: String, vec: String,
                          scaleBits: Int = 24): Seq[(Int, Array[Double])] = {
    val scale = (1L << scaleBits).toDouble
    // The aggregate is cells×dim rows by construction; the limit+require
    // turns a mis-partitioned input (e.g. a raw value passed as `cell`)
    // into a loud failure instead of a driver-OOM collect.
    val maxRows = MaxDriverCentroidScalars.toInt
    val rows = assigned
      .select(col(cell).as("__cell"),
        posexplode(Similarity.vecDouble(col(vec))))
      .groupBy("__cell", "pos")
      .agg(sum(round(col("col") * lit(scale)).cast("long")).as("sfix"),
        count(lit(1)).as("n"))
      .limit(maxRows + 1)
      .collect()
    require(rows.length <= maxRows,
      s"centroid update exceeds $maxRows (cell, dim) rows — the cell " +
        "column does not look like a bounded cluster assignment")
    rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (c, rs) =>
      val dim = rs.map(_.getInt(1)).max + 1
      val arr = new Array[Double](dim)
      rs.foreach { r =>
        arr(r.getInt(1)) = (r.getLong(2).toDouble / r.getLong(3)) / scale
      }
      c -> arr
    }
  }
}
