package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components of a DIRECTED graph — the directed-
  * topology signal the undirected family (CC/BFS/triangles/PageRank/
  * LPA/k-core/k-truss) can't express — via bounded forward-backward
  * COLORING rounds (Fleischer et al. 2000 divide-and-conquer FW-BW;
  * Orzan 2004 / Slota et al. 2014 coloring variant — public
  * algorithms), the relational formulation:
  *
  * Per phase over the remaining nodes R:
  *   1. FORWARD min-label propagation (`rounds` synchronous Jacobi
  *      steps, the q155/q212 discipline): color(v) = min node id that
  *      reaches v within `rounds` hops inside R (including v).
  *   2. The color value is its own class's pivot (c(c) = c: were a
  *      smaller node to reach c, every node c reaches would have
  *      inherited it). BACKWARD reachability of the pivot restricted
  *      to SAME-COLOR nodes: v is assigned iff v →* c(v) through
  *      color-c(v) nodes within `rounds` hops.
  *   3. Assigned nodes leave R; the next phase re-colors the residue.
  *
  * Why the color restriction is LOSSLESS for SCC membership: members
  * of one SCC have identical ancestor sets inside R (each reaches the
  * others), so an SCC is entirely one color; and every intermediate
  * node on a path between two same-SCC nodes lies on a cycle through
  * both, hence in the same SCC and color. So each phase's assigned
  * classes are EXACTLY the SCCs of their pivots — provided `rounds`
  * covers the propagation distances involved (for bounded rounds the
  * result is still a pure deterministic function of (graph, rounds,
  * phases), which is what the SQL oracle replays; callers size
  * `rounds` to the expected component diameter, the bounded-iteration
  * contract PageRank/BFS/LPA already carry).
  *
  * Scale shape per round: ONE edge⋈label join + ONE aggregation + ONE
  * node-sized left join — state is node-sized, never edge-sized; each
  * phase's edge list is semi-join-restricted to the residue. All
  * iteration runs through the connectedComponents checkpoint-and-evict
  * loop (materialize round i, release round i−1), so a long chain
  * holds O(1) cached frames.
  *
  * Returns (node, scc_id, phase): scc_id = the component's minimum
  * node id; phase = the peeling phase that assigned it; nodes still
  * unresolved after `phases` phases come back with NULL scc_id/phase
  * (deterministic — the oracle replays the same bound).
  *
  * Memory contract: before returning, the per-phase `done` frames and
  * the residue frame are UNIONED INTO ONE fresh node-sized
  * localCheckpoint and individually released — the returned frame
  * reads through exactly that one pinned checkpoint (not
  * O(phases) of them). Callers that are done with the result free the
  * last block via [[release]] (the q213 collect-then-unpersist
  * pattern). */
object Scc {

  /** Frees the single localCheckpoint backing a [[components]] result.
    * Safe only after the caller has materialized everything it needs
    * from the frame. */
  def release(result: DataFrame): Unit =
    org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(result)

  def components(edges: DataFrame, src: String, dst: String,
                 rounds: Int, phases: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds in [1,16], got $rounds")
    require(phases >= 1 && phases <= 6, s"phases in [1,6], got $phases")
    val unpersist = org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint _
    def cp(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(false); c.count(); c
    }
    val e0 = edges.select(col(src).as("a"), col(dst).as("b")).distinct()
      .localCheckpoint(true)
    var nodes = cp(e0.select(col("a").as("node"))
      .union(e0.select(col("b").as("node"))).distinct())
    var eCur = e0
    var assigned = List.empty[DataFrame] // one checkpointed frame per phase
    for (phase <- 1 to phases) {
      // 1. forward min-color
      var c = cp(nodes.withColumn("c", col("node")))
      for (_ <- 1 to rounds) {
        val mins = eCur.join(c.withColumnRenamed("node", "a"), "a")
          .groupBy(col("b").as("node")).agg(min("c").as("mc"))
        val next = cp(c.join(mins, Seq("node"), "left")
          .select(col("node"),
            least(col("c"), coalesce(col("mc"), col("c"))).as("c")))
        unpersist(c); c = next
      }
      // 2. backward same-color reach to the pivot
      var r = cp(c.withColumn("r", col("c") === col("node")))
      unpersist(c)
      for (_ <- 1 to rounds) {
        val hits = eCur
          .join(r.where(col("r")).select(col("node").as("b"), col("c")), Seq("b"))
          .select(col("a").as("node"), col("c")).distinct()
          .withColumn("hit", lit(true))
        val next = cp(r.join(hits, Seq("node", "c"), "left")
          .select(col("node"), col("c"),
            (col("r") || coalesce(col("hit"), lit(false))).as("r")))
        unpersist(r); r = next
      }
      val done = cp(r.where(col("r"))
        .select(col("node"), col("c").as("scc_id"),
          lit(phase).as("phase")))
      unpersist(r)
      assigned = done :: assigned
      // 3. peel: restrict nodes and edges to the residue
      val nodesNext = cp(nodes.join(done, Seq("node"), "left_anti"))
      unpersist(nodes); nodes = nodesNext
      val eNext = cp(e0
        .join(nodes.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(nodes.withColumnRenamed("node", "b"), Seq("b"), "left_semi"))
      if (eCur ne e0) unpersist(eCur)
      eCur = eNext
    }
    if (eCur ne e0) unpersist(eCur)
    unpersist(e0)
    val unresolved = nodes
      .select(col("node"), lit(null).cast("long").as("scc_id"),
        lit(null).cast("int").as("phase"))
    // Collapse the O(phases) pinned frames (per-phase `done` + residue
    // `nodes`) into ONE fresh node-sized checkpoint and release them,
    // so repeated calls don't accumulate pinned storage blocks; the
    // caller frees this last block via release().
    val out = cp(assigned.reduce(_ unionByName _).unionByName(unresolved))
    assigned.foreach(unpersist)
    unpersist(nodes)
    out
  }
}
