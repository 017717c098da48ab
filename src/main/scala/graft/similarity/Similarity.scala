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

  /** Symmetric int8 scalar quantization per vector — the storage-side
    * compression step of an embedding pipeline (4× smaller than f32, 8×
    * smaller than the widened f64): `code_i = floor(x_i · 127 / amax)`
    * with `amax = max|x_i|`. Emits per-vector summary columns (dims,
    * scale, code min/max/sum) rather than the code array itself so the
    * result stays narrow. Purely element-wise — no shuffle at all; at
    * 100 TB this runs entirely inside the scan stage. An all-zero vector
    * has no scale → null codes (nullif guard) rather than a NaN. */
  def quantizeInt8(df: DataFrame, id: String, vec: String): DataFrame =
    df.select(col(id), vecDouble(col(vec)).as("xd"))
      .withColumn("amax", array_max(transform(col("xd"), x => abs(x))))
      .withColumn("codes",
        transform(col("xd"), x => floor(x * lit(127.0) / nullif(col("amax"), lit(0.0)))))
      .select(col(id),
        size(col("codes")).cast("long").as("n_dims"),
        col("amax"),
        array_min(col("codes")).cast("long").as("code_min"),
        array_max(col("codes")).cast("long").as("code_max"),
        aggregate(col("codes"), lit(0L), (acc, x) => acc + x.cast("long"))
          .as("code_sum"))

  /** The stored int8 representation behind [[quantizeInt8]]'s summaries:
    * (id, codes array<tinyint>, amax). `array<tinyint>` is the honest 4×
    * storage win over f32 (8× over the widened f64) — this is the column
    * a 100 TB embedding corpus persists; [[ivfTopKQuantized]] searches it
    * directly. All-zero vectors have no scale → dropped (they have no
    * direction, so no cosine ranking is defined for them anyway). */
  def quantizeCodes(df: DataFrame, id: String, vec: String): DataFrame =
    df.select(col(id), vecDouble(col(vec)).as("xd"))
      .withColumn("amax", array_max(transform(col("xd"), x => abs(x))))
      .where(col("amax") > 0.0)
      .select(col(id),
        transform(col("xd"), x => floor(x * lit(127.0) / col("amax"))
          .cast("tinyint")).as("codes"),
        col("amax"))

  /** Deterministic random hyperplanes (seeded) for sign-LSH bucketing. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: bit i = sign of dot(plane_i, v). Cosine-similar
    * vectors collide with high probability. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.toIndexedSeq.map(lit): _*)
      when(dot(vec, planeLit) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** The per-table (tableId, bucket) structs for a vector, computed in one
    * pass over the scan — explode turns them into rows for the bucket
    * shuffle. OR-amplification: a pair is a candidate if it collides in
    * ANY table. */
  private def tableBuckets(vec: Column, tables: Array[Array[Array[Double]]]): Column =
    array(tables.zipWithIndex.toIndexedSeq.map { case (p, t) =>
      struct(lit(t).as("tbl"), lshBucket(vec, p).as("bucket"))
    }: _*)

  /** ANN via sign-LSH: bucket both sides on `numPlanes` hyperplane signs,
    * rank only within buckets. At scale this turns the all-pairs score
    * into per-bucket joins — one shuffle on the bucket id; recall is
    * tuned by numPlanes (fewer planes → bigger buckets → higher recall)
    * and `numTables` (independent seeded plane sets, OR-ed: a true
    * neighbor missed by one table is caught by another — recall
    * 1-(1-p^planes)^tables, the standard LSH amplification). Candidate
    * (query, neighbor) pairs are deduped before scoring so each pair is
    * scored once regardless of how many tables it collides in. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, id: String,
              vec: String, k: Int, numPlanes: Int, dim: Int,
              numTables: Int = 1, seed: Long = 42L): DataFrame = {
    val tables = Array.tabulate(numTables)(t => hyperplanes(numPlanes, dim, seed + t))
    def bucketed(df: DataFrame, idOut: String, vecOut: String, normOut: String) =
      withNorm(df, id, vec, idOut, vecOut, normOut)
        .select(col(idOut), col(vecOut), col(normOut),
          explode(tableBuckets(col(vecOut), tables)).as("bb"))
        .select(col(idOut), col(vecOut), col(normOut),
          col("bb.tbl").as("tbl"), col("bb.bucket").as("bucket"))
    val q = bucketed(queries, "query_id", "qv", "qn")
    val c = bucketed(corpus, "neighbor_id", "cv", "cn")
    // Score BEFORE the pair dedup: one extra dot per duplicate collision is
    // far cheaper than shuffling both embedding vectors through the
    // dedup exchange (the cosine is identical in every table, so deduping
    // the scored scalars is equivalent).
    val scored = c.join(broadcast(q), Seq("tbl", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .select("query_id", "neighbor_id", "cosine")
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Coarse-to-fine retrieval on PREFIX dimensions — the Matryoshka-
    * representation trick (Kusupati et al., NeurIPS 2022): embeddings
    * trained front-loaded carry most of the signal in their first dims,
    * so stage 1 scores every candidate on only the first `prefixDim`
    * dims and stage 2 exact-reranks the per-query `shortlist` on full
    * vectors. At 100 TB the win is bandwidth, not pair count: the
    * stage-1 join moves prefixDim/dim of the float volume (the slice is
    * projected IN THE SCAN, before the broadcast join), and full
    * vectors are read only for shortlist×queries rows — the same
    * "heavy side never shuffles floats" shape as [[graft.similarity.Pq]]'s
    * rerank. Both stages are plain deterministic arithmetic, so the
    * oracle replays them exactly (list_slice + the q41 fold). */
  def prefixRerankTopK(corpus: DataFrame, queries: DataFrame, id: String,
                       vec: String, k: Int, prefixDim: Int,
                       shortlist: Int): DataFrame = {
    require(prefixDim > 0 && shortlist >= k,
      s"need prefixDim > 0 and shortlist >= k, got $prefixDim/$shortlist/$k")
    def prefixed(df: DataFrame, idOut: String, pOut: String, nOut: String) =
      df.select(col(id).as(idOut),
          slice(vecDouble(col(vec)), 1, prefixDim).as(pOut))
        .withColumn(nOut, norm(col(pOut)))
    val qp = prefixed(queries, "query_id", "qp", "qpn")
    val cp = prefixed(corpus, "neighbor_id", "cp", "cpn")
    val wShort = Window.partitionBy("query_id")
      .orderBy(desc("pcos"), asc("neighbor_id"))
    val short = cp.join(broadcast(qp), col("query_id") =!= col("neighbor_id"))
      .withColumn("pcos", dot(col("qp"), col("cp")) / (col("qpn") * col("cpn")))
      .withColumn("srn", row_number().over(wShort))
      .where(col("srn") <= shortlist)
      .select("query_id", "neighbor_id")
    val cv = withNorm(corpus, id, vec, "neighbor_id", "cv", "cn")
    val qv = withNorm(queries, id, vec, "query_id", "qv", "qn")
    val wFull = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), asc("neighbor_id"))
    cv.join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wFull))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * corpus into `nCells` cells over L2-NORMALIZED vectors (unit-sphere
    * L2 is monotone in cosine, so cells respect angular locality); each
    * query probes only its `nProbe` nearest cells. Cell assignment is one
    * MLlib transform in the scan; the probe list is computed per query
    * from the (tiny, driver-held) centroid array as a sorted literal
    * struct — no extra shuffle. `nProbe == nCells` degenerates to exact
    * brute force (asserted in spec); recall/cost is tuned by the ratio.
    * At 100 TB: corpus partitioned by cell (the inverted file), queries
    * broadcast, per-cell scoring only — the standard IVF-flat layout. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, id: String,
              vec: String, k: Int, nCells: Int, nProbe: Int,
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    def unit(vecCol: Column, normCol: Column): Column =
      transform(vecCol, x => x / normCol)
    val c = withNorm(corpus, id, vec, "neighbor_id", "cv", "cn")
      .withColumn("fv", array_to_vector(unit(col("cv"), col("cn"))))
    val km = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("cell")
    val model = km.fit(c)
    val cAssigned = model.transform(c).select("neighbor_id", "cv", "cn", "cell")
    val centroids = model.clusterCenters.map(_.toArray)
    // ||u - ctr||² = ||u||² + ||ctr||² - 2·u·ctr with ||u|| = 1 constant →
    // rank cells by (||ctr||² - 2·u·ctr). Sorted literal structs, probe
    // the first nProbe.
    // Normalize the query vector ONCE (uq); each of the nCells dist
    // entries reuses it instead of re-running the O(dim) transform.
    val q = withNorm(queries, id, vec, "query_id", "qv", "qn")
      .withColumn("uq", unit(col("qv"), col("qn")))
    val cellDists = array(centroids.zipWithIndex.toIndexedSeq.map { case (ctr, i) =>
      val ctrLit = array(ctr.toIndexedSeq.map(lit): _*)
      struct(
        (lit(ctr.map(x => x * x).sum) - dot(col("uq"), ctrLit) * 2).as("d"),
        lit(i).as("cell"))
    }: _*)
    val qProbed = q
      .withColumn("probe", explode(slice(array_sort(cellDists), 1, nProbe)))
      .select(col("query_id"), col("qv"), col("qn"),
        col("probe.cell").as("cell"))
    val scored = cAssigned.join(broadcast(qProbed), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** IVF search over the INT8-QUANTIZED corpus — the search leg the
    * storage compression exists for: the corpus side of the scoring join
    * carries only `array<tinyint>` codes (4× less IO than f32, 8× less
    * than f64), while queries stay float. No dequantization is needed:
    * cosine is invariant in the per-vector scale `amax/127`, so
    * `cos(q, x̂) = dot(q, codes) / (‖q‖·‖codes‖)` on the raw integer
    * codes — amax never reaches the scoring path at all.
    *
    * Index build (k-means on unit float vectors + quantization) runs once
    * here; at 100 TB both are amortized — the codes + cell assignment ARE
    * the persisted index, floats are read only at build time. The probe
    * path is [[ivfTopK]]'s: driver-held centroids, sorted-literal probe
    * list, corpus partitioned by cell, queries broadcast.
    * `nProbe == nCells` makes the search exhaustive over the quantized
    * corpus — exact top-k under quantized scoring (the oracle config);
    * ranking vs FLOAT brute force then differs only by quantization
    * error (recall characterized in spec). */
  def ivfTopKQuantized(corpus: DataFrame, queries: DataFrame, id: String,
                       vec: String, k: Int, nCells: Int, nProbe: Int,
                       seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    def unit(vecCol: Column, normCol: Column): Column =
      transform(vecCol, x => x / normCol)
    // Coarse quantizer: fit on unit FLOAT vectors (quantizing first would
    // distort the centroids); assignment rides the same scan that emits
    // the codes, so floats are touched exactly once.
    val cf = withNorm(corpus, id, vec, "neighbor_id", "cv", "cn")
      .withColumn("fv", array_to_vector(unit(col("cv"), col("cn"))))
    val km = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("cell")
    val model = km.fit(cf)
    // Codes are derived INLINE from the same scan that carries the cell
    // assignment (same arithmetic as [[quantizeCodes]], including the
    // tinyint round-trip) — quantizing via a second corpus read would add
    // a full scan plus a corpus-by-id shuffle join for nothing.
    val cAssigned = model.transform(cf)
      .withColumn("amax", array_max(transform(col("cv"), x => abs(x))))
      .where(col("amax") > 0.0)
      .withColumn("cd", transform(col("cv"),
        x => floor(x * lit(127.0) / col("amax")).cast("tinyint").cast("double")))
      .withColumn("cqn", norm(col("cd")))
      .select("neighbor_id", "cell", "cd", "cqn")
    val centroids = model.clusterCenters.map(_.toArray)
    val q = withNorm(queries, id, vec, "query_id", "qv", "qn")
      .withColumn("uq", unit(col("qv"), col("qn")))
    val cellDists = array(centroids.zipWithIndex.toIndexedSeq.map { case (ctr, i) =>
      val ctrLit = array(ctr.toIndexedSeq.map(lit): _*)
      struct(
        (lit(ctr.map(x => x * x).sum) - dot(col("uq"), ctrLit) * 2).as("d"),
        lit(i).as("cell"))
    }: _*)
    val qProbed = q
      .withColumn("probe", explode(slice(array_sort(cellDists), 1, nProbe)))
      .select(col("query_id"), col("qv"), col("qn"),
        col("probe.cell").as("cell"))
    val scored = cAssigned.join(broadcast(qProbed), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qv"), col("cd")) / (col("qn") * col("cqn")))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Embedding-cosine near-dup pairs within a blocking column (label,
    * LSH bucket, …): all block-local pairs above a cosine threshold.
    *
    * EXACT within a block, so blocks must be bounded: `maxBlock` excludes
    * any block whose size would make in-block all-pairs quadratic (at
    * 100 TB a low-cardinality block column puts millions of vectors in
    * one block). Oversized blocks are dropped, not silently truncated —
    * route them through [[lshCosinePairs]], the probabilistic path whose
    * block key includes an LSH bucket. */
  def blockedCosinePairs(df: DataFrame, id: String, vec: String,
                         blockCol: String, threshold: Double,
                         maxBlock: Int = 4096): DataFrame = {
    val v = df.select(col(blockCol).as("__blk"), col(id).as("vid"),
        vecDouble(col(vec)).as("dv"))
      .withColumn("nrm", norm(col("dv")))
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy("__blk")))
      .where(col("__bn") <= maxBlock)
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

  /** Near-dup cosine pairs at unbounded block sizes: the block key is
    * (blockCol, table, signLshBucket), so no block is ever all-pairs over
    * the full column value — the LSH bucket splits it ~2^numPlanes ways.
    * OR-ed over `numTables` seeded tables for recall (candidates deduped,
    * each surviving pair verified by exact cosine >= threshold, so
    * precision is exact; only recall is probabilistic). */
  def lshCosinePairs(df: DataFrame, id: String, vec: String,
                     blockCol: String, threshold: Double,
                     numPlanes: Int, dim: Int, numTables: Int = 4,
                     seed: Long = 42L): DataFrame = {
    val tables = Array.tabulate(numTables)(t => hyperplanes(numPlanes, dim, seed + t))
    val v = df.select(col(blockCol).as("__blk"), col(id).as("vid"),
        vecDouble(col(vec)).as("dv"))
      .withColumn("nrm", norm(col("dv")))
      .select(col("__blk"), col("vid"), col("dv"), col("nrm"),
        explode(tableBuckets(col("dv"), tables)).as("bb"))
      .select(col("__blk"), col("bb.tbl").as("__tbl"), col("bb.bucket").as("__bkt"),
        col("vid"), col("dv"), col("nrm"))
    val a = v.select(col("__blk"), col("__tbl"), col("__bkt"),
      col("vid").as("id_a"), col("dv").as("v_a"), col("nrm").as("n_a"))
    val b = v.select(col("__blk"), col("__tbl"), col("__bkt"),
      col("vid").as("id_b"), col("dv").as("v_b"), col("nrm").as("n_b"))
    // Verify by exact cosine BEFORE the cross-table pair dedup: the
    // threshold kills almost every candidate in-bucket, so only the
    // (tiny) surviving scalar rows reach the dedup shuffle — never the
    // embedding vectors themselves.
    a.join(b, Seq("__blk", "__tbl", "__bkt"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      .dropDuplicates("id_a", "id_b")
  }
}
