package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Vector similarity / ANN over an embedding column (`array<float>`),
  * north-star "similarity search".
  *
  * Vector math: elements are cast to double once (float→double widening is
  * exact), dot products run in the codegen'd [[graft.functions.DotProductD]]
  * expression — a tight loop whose sequential fold is bit-identical to the
  * HOF `aggregate(zip_with(...))` formulation and to DuckDB's `list_sum`,
  * but ~an order of magnitude faster on the pair-scoring hot path.
  * Norms are computed once per vector BEFORE any pair join, so an n·m
  * scoring stage does one dot per pair instead of three. */
object Similarity {

  def vecDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product (codegen'd). */
  def dot(a: Column, b: Column): Column = HashFunctions.dot_d(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** id, double vector, precomputed norm — the per-vector frame every
    * pair stage starts from. */
  private def withNorm(df: DataFrame, id: String, vec: String,
                       idOut: String, vecOut: String, normOut: String): DataFrame =
    df.select(col(id).as(idOut), vecDouble(col(vec)).as(vecOut))
      .withColumn(normOut, norm(col(vecOut)))

  /** Exact top-k neighbors for a (small) query set: broadcast the queries
    * against the corpus scan, rank per query. One shuffle of
    * |corpus|×|queries| scored rows hash-partitioned by query id; corpus
    * itself is never re-partitioned. This is the correctness baseline —
    * [[lshTopK]] is the scale path. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: String,
                     vec: String, k: Int): DataFrame = {
    val q = withNorm(queries, id, vec, "query_id", "qv", "qn")
    val c = withNorm(corpus, id, vec, "neighbor_id", "cv", "cn")
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Deterministic random hyperplanes (seeded) for sign-LSH bucketing. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: bit i = sign of dot(plane_i, v). Cosine-similar
    * vectors collide with high probability. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN via sign-LSH: bucket both sides on `numPlanes` hyperplane signs,
    * rank only within buckets. At scale this turns the all-pairs score
    * into per-bucket joins — one shuffle on the bucket id; recall is
    * tuned by numPlanes (fewer planes → bigger buckets → higher recall). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, id: String,
              vec: String, k: Int, numPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val q = withNorm(queries, id, vec, "query_id", "qv", "qn")
      .withColumn("bucket", lshBucket(col("qv"), planes))
    val c = withNorm(corpus, id, vec, "neighbor_id", "cv", "cn")
      .withColumn("bucket", lshBucket(col("cv"), planes))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Embedding-cosine near-dup pairs within a blocking column (label,
    * LSH bucket, …): all block-local pairs above a cosine threshold. */
  def blockedCosinePairs(df: DataFrame, id: String, vec: String,
                         blockCol: String, threshold: Double): DataFrame = {
    val v = df.select(col(blockCol).as("__blk"), col(id).as("vid"),
        vecDouble(col(vec)).as("dv"))
      .withColumn("nrm", norm(col("dv")))
    val a = v.select(col("__blk"), col("vid").as("id_a"), col("dv").as("v_a"),
      col("nrm").as("n_a"))
    val b = v.select(col("__blk"), col("vid").as("id_b"), col("dv").as("v_b"),
      col("nrm").as("n_b"))
    a.join(b, Seq("__blk"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
