package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic PageRank in pure integer arithmetic — link analysis
  * for web-crawl curation (rank-weighted sampling of a crawl graph is a
  * standard training-data signal). Floating-point PageRank is not
  * reproducible on a cluster (per-node contribution sums are
  * partitioning-order-dependent), so ranks here are int64 fixed point
  * and every step is exact and order-free, the same discipline as the
  * Lloyd fit in [[graft.similarity.Clustering]]:
  *
  *   - init: every node starts at `S = 2^scaleBits`;
  *   - contribution: `r div out_deg` (integral division — exact, the
  *     truncation loss is deterministic);
  *   - update: `r' = (S·(100−damp)) div 100 + (damp · Σ contrib) div 100`
  *     with integer sums (order-independent) and integral divisions.
  *
  * Each iteration is ONE join of the edge list with the (node-sized)
  * rank table plus ONE aggregation — edges shuffle by src once per
  * iteration, ranks are node-sized (dimension-scale, not fact-scale).
  * Dangling mass is dropped, not redistributed (deterministic and
  * SQL-replicable; the classic redistribution variant adds one
  * node-sized aggregate if needed). */
object PageRank {

  private def idiv(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))

  /** Ranks after `iters` exact integer iterations over the DIRECTED
    * edge list (symmetrize upstream for an undirected walk). Returns
    * (node, rank_fixed). `damp` is the damping numerator out of 100.
    *
    * Iteration shape — measured, not assumed: the whole bounded-depth
    * loop stays LAZY in one plan, because whole-plan optimization
    * reuses the edge/degree/node exchanges across iterations
    * (`ReusedExchange`), and at iters ≤ 16 that beats checkpointing —
    * both the up-front `localCheckpoint` of the edge list and the
    * per-iteration checkpoint-and-evict loop benched ~2× SLOWER here
    * (eager materialization + cache traffic outweigh the re-derivation
    * they avoid). For the high-iteration / unbounded regime — where
    * plan depth, not data volume, becomes the limit — switch to the
    * [[graft.dedup.Dedup.connectedComponents]] checkpoint-and-evict
    * loop; the `iters <= 16` require marks that boundary. */
  def integerPageRank(edges: DataFrame, src: String, dst: String,
                      iters: Int, scaleBits: Int = 20,
                      damp: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters in [1,16], got $iters")
    require(damp >= 0 && damp <= 100, s"damp in [0,100], got $damp")
    require(scaleBits >= 10 && scaleBits <= 40, "scaleBits in [10,40]")
    val s = 1L << scaleBits
    val teleport = s * (100L - damp) / 100L
    val e = edges.select(col(src).as("__src"), col(dst).as("__dst"))
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
    val deg = e.groupBy("__src").agg(count(lit(1)).as("__deg"))
    var ranks = nodes.withColumn("r", lit(s))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "__src"), "__src")
        .join(deg, "__src")
        .select(col("__dst").as("node"), idiv(col("r"), col("__deg")).as("c"))
        .groupBy("node").agg(sum("c").as("__in"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            idiv(lit(damp.toLong) * coalesce(col("__in"), lit(0L)), lit(100L)))
            .as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_fixed"))
  }
}
