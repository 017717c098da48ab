package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic synchronous label propagation (LPA, Raghavan et al.
  * 2007, "Near linear time algorithm to detect community structures in
  * large-scale networks" — public algorithm) — the community-detection
  * curation signal next to CC ([[graft.dedup.Dedup.connectedComponents]]),
  * PageRank ([[PageRank]]), BFS ([[Bfs]]) and triangles ([[Triangles]]).
  *
  * The classic algorithm is NONdeterministic twice over (random node
  * order, random tie-break) — unusable as a cluster-reproducible
  * curation signal. This variant removes both sources:
  *
  *   - SYNCHRONOUS rounds: every node updates from the same previous
  *     frame (no order dependence), the Jacobi-style discipline the
  *     integer PageRank already uses;
  *   - INTEGER tie-break: a node adopts the label with the highest
  *     vote count, ties broken by SMALLEST label — a total order, so
  *     the result is a pure function of (graph, rounds);
  *   - SELF-VOTE: the node's own current label counts one vote. This
  *     damps the 2-cycle oscillation synchronous LPA exhibits on
  *     bipartite structure (with neighbor-only votes, the two sides
  *     can swap label sets forever) and preserves singleton labels for
  *     isolated nodes.
  *
  * Rounds are BOUNDED (the q155/q194 bounded-iteration discipline):
  * LPA is used as a fixed-depth smoothing of the label space, and the
  * oracle replays the exact rounds in SQL; no convergence detection is
  * needed for determinism.
  *
  * Scale shape per round: ONE edge⋈label join (edges shuffle on dst
  * once), ONE (node, label) count aggregation, ONE node-partitioned
  * window for the arg-max — all state is node-sized, never edge- or
  * corpus-sized. Rounds run through the
  * [[graft.dedup.Dedup.connectedComponents]] checkpoint-and-evict loop
  * (materialize round i, drop round i−1's blocks) so a long chain
  * holds O(1) cached frames, not O(rounds). */
object LabelPropagation {

  /** Labels after `rounds` synchronous votes over the DIRECTED edge
    * list (labels flow src→dst along each edge; pass a symmetrized
    * list for undirected propagation, as the graph queries do).
    * Returns (node, label).
    *
    * Checkpoint contract — same as `connectedComponents`: the returned
    * frame reads from the FINAL round's localCheckpoint, which stays
    * pinned (node-sized) until the session ends; the edge list and all
    * intermediate rounds are evicted here. A caller that invokes this
    * repeatedly in one session accumulates one node-sized block set per
    * call — consume and drop the result promptly if that matters. */
  def propagate(edges: DataFrame, src: String, dst: String,
                rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds in [1,16], got $rounds")
    val e = edges.select(col(src).as("__src"), col(dst).as("__dst"))
      .localCheckpoint(true)
    var labels = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint(true)
    val byVotes = Window.partitionBy("node")
      .orderBy(desc("votes"), asc("lbl"))
    var prevCp = labels
    for (_ <- 1 to rounds) {
      val nbrVotes = e
        .join(labels.withColumnRenamed("node", "__src"), "__src")
        .select(col("__dst").as("node"), col("lbl"))
      val next = nbrVotes.unionByName(labels.select("node", "lbl"))
        .groupBy("node", "lbl").agg(count(lit(1)).as("votes"))
        .withColumn("__rn", row_number().over(byVotes))
        .where(col("__rn") === 1)
        .select("node", "lbl")
        .localCheckpoint(false)
      next.count() // materialize: completes the checkpoint, truncates lineage
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(prevCp)
      prevCp = next
      labels = next
    }
    org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(e)
    labels.select(col("node"), col("lbl").as("label"))
  }
}
