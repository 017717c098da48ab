package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded multi-source BFS: exact min-hop distance from a seed set —
  * the graph-proximity signal crawl curation uses next to PageRank
  * (distance-from-trusted-seeds is the classic TrustRank-style input).
  *
  * Production frontier shape: each round expands ONLY the previous
  * round's frontier (one equi-join with the edge list) and prunes
  * already-reached nodes with a LEFT ANTI join against the accumulated
  * distance table, so a hub node's neighborhood is expanded exactly
  * once no matter how many paths reach it. Per round: one join + one
  * distinct + one anti-join; everything keys on the node id, so AQE
  * reuses the node-hash partitioning across rounds. All values are
  * integers — no float order-dependence anywhere.
  *
  * Like [[PageRank.integerPageRank]] the bounded-depth loop stays LAZY
  * in one plan (exchange reuse beats eager checkpointing at small
  * depth — measured there); for unbounded-depth traversal switch to
  * the [[graft.dedup.Dedup.connectedComponents]] checkpoint-and-evict
  * loop. The `maxHops <= 8` require marks that boundary. */
object Bfs {

  /** (node, hop) for every node within `maxHops` of `seeds` over the
    * DIRECTED edge list (symmetrize upstream for undirected). Seeds are
    * hop 0 and need not appear in the edge list (isolated seeds keep
    * their row). */
  def hopDistance(edges: DataFrame, src: String, dst: String,
                  seeds: DataFrame, seedCol: String,
                  maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 8,
      s"maxHops in [1,8] (lazy-plan regime), got $maxHops")
    val e = edges.select(col(src).as("__src"), col(dst).as("__dst"))
    var dist = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("hop", lit(0))
    var frontier = dist.select("node")
    for (h <- 1 to maxHops) {
      val next = e
        .join(frontier.withColumnRenamed("node", "__src"), "__src")
        .select(col("__dst").as("node")).distinct()
        .join(dist.select("node"), Seq("node"), "left_anti")
      dist = dist.union(next.withColumn("hop", lit(h)))
      frontier = next
    }
    dist
  }
}
