package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded k-core peeling (Seidman 1983, "Network structure and minimum
  * degree" — the k-core; distributed peel-by-rounds as in Montresor et
  * al. 2013 — public algorithms): repeatedly delete nodes of degree < k
  * together with their incident edges. The surviving subgraph after
  * enough rounds is the k-core — the standard graph-curation densifier
  * (spam/link-farm filtering keeps the cohesive core, drops tendrils).
  *
  * Rounds are BOUNDED (the q155/q212 bounded-iteration discipline): the
  * op is used as a fixed-depth peel whose oracle unrolls the same rounds
  * relationally; full-fixpoint callers pick `rounds` ≥ graph degeneracy
  * diameter. Determinism: each round is a pure function of the previous
  * edge set (no node ordering anywhere), so the result is a pure
  * function of (graph, k, rounds).
  *
  * Scale shape per round: ONE degree aggregation (node-sized) and TWO
  * broadcast-or-shuffle semi-joins of the edge list against the alive
  * set — edge-sized data flows through hash joins only; no windows, no
  * collects. Rounds run through the checkpoint-and-evict loop
  * ([[graft.dedup.Dedup.connectedComponents]] contract) so a chain holds
  * O(1) cached frames; the returned frame pins only the final
  * edge-sized checkpoint. */
object KCore {

  /** Degree table (node, deg) of the subgraph surviving `rounds` peels
    * at threshold `k`, over the DIRECTED edge list (pass a symmetrized
    * list for undirected degree, as the graph queries do). A node whose
    * neighbors all died carries no edge in the surviving list and thus
    * drops out of the output — it would be peeled next round anyway. */
  def peel(edges: DataFrame, src: String, dst: String, k: Int,
           rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1 && rounds <= 16, s"rounds in [1,16], got $rounds")
    var e = edges.select(col(src).as("__src"), col(dst).as("__dst"))
      .localCheckpoint(true)
    var prevCp = e
    for (_ <- 1 to rounds) {
      val deg = e.groupBy(col("__src").as("node"))
        .agg(count(lit(1)).as("deg"))
      val alive = deg.where(col("deg") >= k).select("node")
      val next = e
        .join(alive.withColumnRenamed("node", "__src"), "__src", "left_semi")
        .join(alive.withColumnRenamed("node", "__dst"), "__dst", "left_semi")
        .select("__src", "__dst")
        .localCheckpoint(false)
      next.count() // materialize, then drop the previous round's blocks
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(prevCp)
      prevCp = next
      e = next
    }
    e.groupBy(col("__src").as("node")).agg(count(lit(1)).as("deg"))
  }
}
