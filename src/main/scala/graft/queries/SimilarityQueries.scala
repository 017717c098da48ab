package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.Similarity
import graft.tables.Tables

/** Similarity-search queries over `embeddings` (north-star ANN ops).
  * q40/q41 carry DuckDB oracles (list-comprehension dot products with the
  * same sequential fold); q42's LSH buckets depend on seeded hyperplanes →
  * rows-only check, recall cross-validated against q41 in unit tests. */
object SimilarityQueries extends QueryPack {

  /** Embedding-cosine near-dup pairs within label blocks. */
  private def cosineNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.blockedCosinePairs(Tables.embeddings(spark, dir),
        id = "vec_id", vec = "embedding", blockCol = "label", threshold = 0.45)
      .orderBy("id_a", "id_b")

  /** Brute-force exact cosine top-5 for the first 10 vectors. */
  private def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 10),
        id = "vec_id", vec = "embedding", k = 5)
      .orderBy("query_id", "rank")
  }

  /** Sign-LSH bucketed ANN (8 hyperplanes): the 100 TB path. */
  private def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.lshTopK(emb, emb.where(col("vec_id") < 10),
        id = "vec_id", vec = "embedding", k = 5, numPlanes = 8, dim = 64)
      .orderBy("query_id", "rank")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_cosine_neardup" -> cosineNearDup,
    "q41_cosine_topk" -> bruteForceTopK,
    "q42_ann_lsh_topk" -> lshTopK
  )

  override def oracles: Map[String, String] = Map(
    "q40_cosine_neardup" ->
      """WITH v AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS dv
        |  FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         list_sum([a.dv[i] * b.dv[i] for i in range(1, len(a.dv) + 1)])
        |           / (sqrt(list_sum([a.dv[i] * a.dv[i] for i in range(1, len(a.dv) + 1)]))
        |              * sqrt(list_sum([b.dv[i] * b.dv[i] for i in range(1, len(b.dv) + 1)]))) AS cosine
        |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT id_a, id_b, cosine FROM p
        |WHERE cosine >= 0.45 ORDER BY id_a, id_b""".stripMargin,
    "q41_cosine_topk" ->
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings),
        |s AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         list_sum([q.dv[i] * c.dv[i] for i in range(1, len(q.dv) + 1)])
        |           / (sqrt(list_sum([q.dv[i] * q.dv[i] for i in range(1, len(q.dv) + 1)]))
        |              * sqrt(list_sum([c.dv[i] * c.dv[i] for i in range(1, len(c.dv) + 1)]))) AS cosine
        |  FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |r AS (
        |  SELECT query_id, neighbor_id, cosine,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM s)
        |SELECT query_id, neighbor_id, cosine, rank
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  )
}
