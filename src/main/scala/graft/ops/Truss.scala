package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded k-truss peeling (Cohen 2008, "Trusses: cohesive subgraphs
  * for social network analysis" — public algorithm): repeatedly delete
  * edges that sit in fewer than k−2 triangles. Where the k-core
  * ([[KCore]]) peels NODES by degree, the truss peels EDGES by triangle
  * support — the stricter cohesion filter (every surviving edge is
  * embedded in triangles, so loosely attached hubs that survive a core
  * cut are still dropped).
  *
  * Rounds are BOUNDED (the q155/q212/q218 discipline) and each round is
  * a pure function of the previous edge set: support is computed
  * synchronously over E_{i−1}, then every edge below `minSupport` is
  * removed at once. Deterministic; the oracle unrolls the same rounds.
  *
  * Scale shape per round: support = one common-neighbor equi-join —
  * canonical (a<b) edges joined twice against the symmetrized adjacency
  * on the shared third node, i.e. the [[Triangles]] wedge-join shape
  * billed per edge — followed by one edge-keyed count and one semi-join
  * filter. No windows, no collects; rounds run through the
  * checkpoint-and-evict loop so a chain holds O(1) cached frames. */
object Truss {

  /** Surviving canonical edges (a < b) after `rounds` support peels,
    * with the support that qualified them (computed over the previous
    * round's edge set). `edges` must be canonical a < b, one row per
    * undirected edge. */
  def peel(edges: DataFrame, a: String, b: String, minSupport: Int,
           rounds: Int): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(rounds >= 1 && rounds <= 16, s"rounds in [1,16], got $rounds")
    var e = edges.select(col(a).as("__a"), col(b).as("__b"))
      .localCheckpoint(true)
    var prevCp = e
    var out: DataFrame = null
    for (_ <- 1 to rounds) {
      val sym = e.select(col("__a").as("u"), col("__b").as("w"))
        .union(e.select(col("__b").as("u"), col("__a").as("w")))
      // support(a,b) = |N(a) ∩ N(b)| over the current edge set
      val supp = e
        .join(sym.select(col("u").as("__a"), col("w")), Seq("__a"))
        .join(sym.select(col("u").as("__b"), col("w")), Seq("__b", "w"))
        .groupBy("__a", "__b").agg(count(lit(1)).as("support"))
      val next = e.join(supp, Seq("__a", "__b"))
        .where(col("support") >= minSupport)
        .localCheckpoint(false)
      next.count() // materialize, then drop the previous round's blocks
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(prevCp)
      prevCp = next
      out = next
      e = next.select("__a", "__b")
    }
    out.select(col("__a").as(a), col("__b").as(b), col("support"))
  }
}
