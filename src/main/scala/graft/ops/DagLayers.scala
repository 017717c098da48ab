package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded longest-path layering of a DAG — the topology step that
  * completes the directed family ([[Scc]] finds the components, the
  * CONDENSATION contracts them to an acyclic graph, this assigns each
  * condensed node its dependency depth; Kahn 1962's level semantics,
  * computed as synchronous Jacobi rounds instead of a frontier queue).
  *
  * layer(v) after K rounds = the length of the longest path ending at v
  * among paths of ≤ K edges — the same bounded-iteration contract as
  * PageRank/BFS/LPA/SCC (q155/q163/q212/q233): for K ≥ DAG depth the
  * result is the exact longest-path layering; below it, a deterministic
  * K-capped function of (graph, K) that the SQL oracle replays round by
  * round. On a true DAG the sequence is monotone and converges; cycles
  * (a non-DAG caller error) simply saturate toward K instead of looping
  * forever — the bound is also the safety net.
  *
  * Scale shape per round: ONE edge⋈layer join + ONE per-dst max + ONE
  * node-sized left join — state stays node-sized; iteration runs through
  * the checkpoint-and-evict loop (materialize round i, release i−1) so a
  * long chain holds O(1) cached frames. The returned frame reads through
  * ONE pinned localCheckpoint; callers free it via [[Scc.release]]. */
object DagLayers {

  /** (s, l) for every node of `nodes` (single-column frame `nodeCol`,
    * which must cover the edge endpoints — isolated nodes land in layer
    * 0), after `rounds` synchronous longest-path updates over `edges`
    * (src/dst column names). */
  def layers(nodes: DataFrame, nodeCol: String,
             edges: DataFrame, src: String, dst: String,
             rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds in [1,16], got $rounds")
    val unpersist = org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint _
    def cp(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(false); c.count(); c
    }
    val e = edges.select(col(src).as("sa"), col(dst).as("sb")).distinct()
      .localCheckpoint(true)
    var layer = cp(nodes.select(col(nodeCol).as("s")).distinct()
      .withColumn("l", lit(0)))
    for (_ <- 1 to rounds) {
      val upd = e.join(layer.withColumnRenamed("s", "sa"), "sa")
        .groupBy(col("sb").as("s")).agg(max(col("l") + 1).as("nl"))
      val next = cp(layer.join(upd, Seq("s"), "left")
        .select(col("s"),
          greatest(col("l"), coalesce(col("nl"), col("l"))).as("l")))
      unpersist(layer); layer = next
    }
    unpersist(e)
    layer
  }
}
