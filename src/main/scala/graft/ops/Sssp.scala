package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round single-source shortest paths over a weighted directed
  * graph — synchronous Bellman–Ford (Bellman 1958) relaxation rounds,
  * the WEIGHTED tier of the graph family (BFS q163 counts hops, this
  * accumulates integer edge weights).
  *
  * dist(v) after K rounds = the weight of the lightest path source→v
  * among paths of ≤ K edges — the same bounded-iteration contract as
  * PageRank/BFS/LPA/SCC/DagLayers (q155/q163/q212/q233/q244): for
  * K ≥ the hop radius of the true shortest-path tree the result is
  * exact; below it, a deterministic K-capped function of
  * (graph, source, K) that the SQL oracle replays round by round.
  * Nodes unreached within K edges are simply absent (no +∞ sentinel to
  * overflow or to disagree on). Negative weights are rejected: with
  * non-negative weights every K-capped prefix is already a valid upper
  * bound and monotone in K, so the cap never UNDER-reports a distance
  * it claims.
  *
  * Scale shape per round: ONE edge⋈dist join + ONE per-dst min — the
  * dist frame stays reached-set-sized, so when the source's K-hop
  * neighborhood is small Spark broadcasts it and each round is one
  * scan of the (checkpointed-once) edge frame with NO shuffle of the
  * big side; when the neighborhood is graph-sized the same plan
  * degrades gracefully to a shuffle join on dst. Iteration runs
  * through the checkpoint-and-evict loop (materialize round i, release
  * round i−1) so a long chain holds O(1) cached frames. The returned
  * frame reads through ONE pinned localCheckpoint; callers free it via
  * [[Scc.release]].
  *
  * Reference anchor: the reference's pipeline has no graph tier at all
  * (`predict_from_vm4.py` is per-symbol, relationships unmodeled);
  * this is part of the engine's curation surface (influence /
  * proximity signals over entity graphs at 100 TB).
  */
object Sssp {

  /** (s = node, d = lightest ≤`rounds`-edge path weight from `source`)
    * for every node reached within `rounds` relaxations over `edges`
    * (src/dst/weight column names; weights must be non-negative —
    * enforced with a cheap aggregate up front). */
  def bellmanFord(edges: DataFrame, src: String, dst: String, w: String,
                  source: Long, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds in [1,16], got $rounds")
    val unpersist = org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint _
    def cp(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(false); c.count(); c
    }
    val e = edges.select(col(src).cast("long").as("sa"),
        col(dst).cast("long").as("sb"), col(w).cast("long").as("w"))
      .localCheckpoint(true)
    val minW = e.agg(min("w")).head()
    require(minW.isNullAt(0) || minW.getLong(0) >= 0L,
      s"negative edge weight: ${minW.getLong(0)} (bounded Bellman-Ford " +
        "here requires non-negative weights)")
    var dist = cp(e.sparkSession.range(1)
      .select(lit(source).as("s"), lit(0L).as("d")))
    for (_ <- 1 to rounds) {
      val relaxed = e.join(dist.withColumnRenamed("s", "sa"), "sa")
        .select(col("sb").as("s"), (col("d") + col("w")).as("d"))
      val next = cp(dist.unionByName(relaxed)
        .groupBy("s").agg(min("d").as("d")))
      unpersist(dist); dist = next
    }
    unpersist(e)
    dist
  }
}
