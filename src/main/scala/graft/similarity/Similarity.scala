package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity / ANN over an embedding column (`array<float>`),
  * north-star "similarity search".
  *
  * Vector math is pure higher-order column expressions (zip_with +
  * aggregate) — no UDF, stays inside codegen. Elements are cast to double
  * first: float→double widening is exact, and the sequential left-fold sum
  * then matches any engine that sums a list in order (the DuckDB oracle).
  */
object Similarity {

  def vecDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for a (small) query set: broadcast the queries
    * against the corpus scan, rank per query. One shuffle of
    * |corpus|×|queries| scored rows hash-partitioned by query id; corpus
    * itself is never re-partitioned. This is the correctness baseline —
    * [[lshTopK]] is the scale path. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: String,
                     vec: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("query_id"), vecDouble(col(vec)).as("qv"))
    val c = corpus.select(col(id).as("neighbor_id"), vecDouble(col(vec)).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Deterministic random hyperplanes (seeded splitmix64 via
    * scala.util.Random) for sign-LSH bucketing. */
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
    val q = queries.select(col(id).as("query_id"), vecDouble(col(vec)).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), planes))
    val c = corpus.select(col(id).as("neighbor_id"), vecDouble(col(vec)).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), planes))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
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
    val a = v.select(col("__blk"), col("vid").as("id_a"), col("dv").as("v_a"))
    val b = v.select(col("__blk"), col("vid").as("id_b"), col("dv").as("v_b"))
    a.join(b, Seq("__blk"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
