package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the storage-compression leg of ANN at
  * 100 TB: each embedding is encoded as `m` small integers (one codebook
  * cell per subspace), shrinking a 64-float vector to m bytes, and
  * queries score against codes via an Asymmetric Distance Computation
  * (ADC) lookup table instead of touching floats. This is the classic
  * IVF-PQ decomposition (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) re-expressed Spark-first:
  *
  *   - codebooks are fit with the SAME deterministic Lloyd machinery as
  *     [[Clustering]] (lowest-id seeding, in-scan argmin, exact
  *     fixed-point mean update) so the fit, the codes, and the ADC
  *     scores are all bit-reproducible and SQL-replicable;
  *   - the fit is FUSED across subspaces: one corpus scan assigns all m
  *     subvectors, one (subspace, cell, dim) aggregation computes every
  *     mean update — cost is independent of m;
  *   - encoding is a pure in-scan expression (no shuffle, no join);
  *   - ADC scoring broadcasts per-query LUTs (m×k doubles each) and
  *     reduces each candidate to m array lookups + (m−1) adds — no
  *     per-candidate float vector reads, which is the entire point at
  *     scale: the float corpus stays on disk.
  *
  * Driver state is codebooks (m×k×sub doubles) + query LUTs — both
  * probe-set-bounded, never corpus-bounded. */
object Pq {

  /** Per-subspace codebooks; `books(s)` = (cellId, centroid) pairs,
    * sorted by cellId. Cells that lost all members in the mean update are
    * absent (same contract as [[Clustering.fixedPointCentroids]]). */
  case class Codebooks(m: Int, sub: Int, books: Seq[Seq[(Int, Array[Double])]])

  /** Fit m codebooks of k centroids each: lowest-id seeds, one exact
    * fixed-point Lloyd refinement. Two corpus scans total (seed collect
    * is a top-k, the mean update is one aggregation) regardless of m. */
  def fit(df: DataFrame, id: String, vec: String, m: Int, sub: Int, k: Int,
          scaleBits: Int = 24): Codebooks = {
    require(m > 0 && sub > 0 && k > 0,
      s"m, sub, k must be positive, got m=$m sub=$sub k=$k")
    require(m.toLong * sub * k <= Clustering.MaxDriverCentroidScalars,
      s"codebooks are driver-held: m*sub*k = ${m.toLong * sub * k} exceeds " +
        s"${Clustering.MaxDriverCentroidScalars} doubles")
    val seedRows = df.select(col(id), Similarity.vecDouble(col(vec)).as("v"))
      .orderBy(col(id)).limit(k).collect()
    val seeds: Seq[Seq[(Int, Array[Double])]] = (0 until m).map { s =>
      seedRows.zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Double](1).slice(s * sub, (s + 1) * sub).toArray
      }.toSeq
    }
    val scale = (1L << scaleBits).toDouble
    // One explode of m subspace structs per row (cell resolved INSIDE the
    // generator input, so the argmin runs exactly once per row — a
    // projected cell column above a Generate can be collapsed into the
    // post-explode projection and re-evaluated per exploded row), then
    // ONE (s, cell) aggregation with the sub per-dim fixed-point sums as
    // columns. Shuffle volume is m structs per vector, not m·sub dims.
    val vd = Similarity.vecDouble(col(vec))
    val subStructs = (0 until m).map { s =>
      val sv = slice(vd, s * sub + 1, sub)
      struct(lit(s).as("s"),
        Clustering.assignCell(sv, seeds(s)).as("cell"),
        sv.as("sv"))
    }
    val sumCols = (1 to sub).map { i =>
      sum(round(element_at(col("sv"), i) * lit(scale)).cast("long")).as(s"f$i")
    } :+ count(lit(1)).as("n")
    val rows = df
      .select(explode(array(subStructs: _*)).as("e"))
      .select(col("e.s").as("s"), col("e.cell").as("cell"), col("e.sv").as("sv"))
      .groupBy("s", "cell")
      .agg(sumCols.head, sumCols.tail: _*)
      .collect()
    val books = (0 until m).map { s =>
      rows.filter(_.getInt(0) == s).map { r =>
        val n = r.getLong(sub + 2)
        val arr = (0 until sub).map { i =>
          (r.getLong(2 + i).toDouble / n) / scale
        }.toArray
        r.getInt(1) -> arr
      }.sortBy(_._1).toSeq
    }
    Codebooks(m, sub, books)
  }

  /** PQ codes for a vector — array of m cell ids, pure in-scan argmin
    * over the codebook literals (ties to the lower cell, same contract
    * as [[Clustering.assignCell]]). */
  def encode(vec: Column, cb: Codebooks): Column =
    array((0 until cb.m).map { s =>
      Clustering.assignCell(slice(vec, s * cb.sub + 1, cb.sub), cb.books(s))
    }: _*)

  /** ADC lookup table for one query: lut(s)(cell) = ‖q_s − c_{s,cell}‖²,
    * indexed by CELL ID (gaps from dropped cells hold 0.0 and are never
    * referenced — encode can only emit live cells). Sequential left-fold
    * accumulation, matching the SQL `list_sum` shape. */
  def adcLut(q: Array[Double], cb: Codebooks): Array[Array[Double]] = {
    require(cb.books.forall(_.nonEmpty),
      "codebooks have an empty subspace — fit ran over an empty or " +
        "too-small corpus; refit with a non-empty input")
    (0 until cb.m).map { s =>
      val arr = new Array[Double](cb.books(s).map(_._1).max + 1)
      cb.books(s).foreach { case (cell, c) =>
        var d = 0.0
        var i = 0
        while (i < cb.sub) {
          val t = q(s * cb.sub + i) - c(i)
          d += t * t
          i += 1
        }
        arr(cell) = d
      }
      arr
    }.toArray
  }

  /** ADC distance column: m LUT lookups chained by explicit left-to-right
    * adds (a fixed association both engines replicate — an aggregate over
    * the m partials would be combine-order-dependent). `lut` is an
    * array<array<double>> column, `codes` the [[encode]] output. */
  def adcDist(lut: Column, codes: Column, m: Int): Column =
    (1 to m).map(s => element_at(element_at(lut, s), element_at(codes, s) + 1))
      .reduceLeft(_ + _)

  /** The `nProbe` coarse cells nearest to query `q`, ranked by the SAME
    * ‖c‖² − 2·q·c arithmetic (and (distance, cell) tie order) as
    * [[Clustering.assignCell]] — one shared implementation so the probe
    * ranking the oracles replicate cannot drift between the IVF-PQ
    * variants. */
  private[similarity] def probeCells(q: Array[Double], coarse: Seq[(Int, Array[Double])],
                         nProbe: Int): Seq[Int] =
    coarse.map { case (cell, c) =>
      var dot = 0.0
      var i = 0
      while (i < c.length) { dot += q(i) * c(i); i += 1 }
      (c.map(x => x * x).sum - dot * 2, cell)
    }.sorted.take(nProbe).map(_._2)

  /** Rank scored (query_id, vec_id, adc_dist) candidates per query and
    * keep the top `r` — the shared shortlist window of every ADC
    * variant (ties to the lower vec_id, like all rank stages here). */
  private[similarity] def shortlistTopR(scored: DataFrame, r: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("adc_dist"), col("vec_id"))
    scored.withColumn("srn", row_number().over(w))
      .where(col("srn") <= r)
      .select("query_id", "vec_id", "adc_dist")
  }

  /** ADC shortlist: fit codebooks, encode the corpus in-scan, score every
    * (query, code) pair via broadcast LUTs, keep the top-`r` per query by
    * (adc_dist, id). Queries must be a bounded probe set (collected to
    * build LUTs — the IVF probe-list discipline). The corpus side never
    * reads floats past the fit: candidates flow as (id, m codes). */
  def adcShortlist(corpus: DataFrame, queries: DataFrame, id: String,
                   vec: String, r: Int, m: Int, sub: Int,
                   cells: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cb = fit(corpus, id, vec, m, sub, cells)
    val qRows = queries
      .select(col(id).cast("long").as("query_id"),
        Similarity.vecDouble(col(vec)).as("v"))
      .orderBy("query_id").collect()
    val lutDf = qRows.toSeq.map { row =>
      (row.getLong(0),
        adcLut(row.getSeq[Double](1).toArray, cb).map(_.toSeq).toSeq)
    }.toDF("query_id", "lut")
    val codes = corpus.select(col(id).as("vec_id"),
      encode(col(vec), cb).as("codes"))
    shortlistTopR(codes.crossJoin(broadcast(lutDf))
      .withColumn("adc_dist", adcDist(col("lut"), col("codes"), m)), r)
  }

  /** End-to-end PQ search, production shape: ADC shortlist (compressed
    * domain, top-`shortlist` per query) → EXACT L2 rerank of only the
    * shortlisted candidates → top-`k`. Float vectors are read for
    * shortlist×queries rows, never the corpus — the rerank joins the
    * BROADCAST shortlist back to the corpus scan, so the heavy side
    * still moves no floats into a shuffle. The exact distance is a
    * sequential zip_with/aggregate fold (the SQL `list_sum` shape). */
  def adcTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
              k: Int, m: Int, sub: Int, cells: Int,
              shortlist: Int): DataFrame =
    rerankExact(corpus, queries, id, vec, k,
      adcShortlist(corpus, queries, id, vec, shortlist, m, sub, cells))

  /** Exact-L2 rerank of a (query_id, vec_id) shortlist: floats are read
    * for shortlist×queries rows only — the BROADCAST shortlist joins back
    * to the corpus scan, so the heavy side moves no floats into a
    * shuffle. Sequential zip_with/aggregate fold (the SQL `list_sum`
    * shape). */
  private[similarity] def rerankExact(corpus: DataFrame, queries: DataFrame, id: String,
                          vec: String, k: Int, short: DataFrame): DataFrame = {
    val cand = corpus
      .select(col(id).as("vec_id"), Similarity.vecDouble(col(vec)).as("cv"))
      .join(broadcast(short.select("query_id", "vec_id")), Seq("vec_id"))
    val qv = queries.select(col(id).cast("long").as("query_id"),
      Similarity.vecDouble(col(vec)).as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("l2"), col("vec_id"))
    cand.join(broadcast(qv), Seq("query_id"))
      .withColumn("l2", aggregate(
        zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
        lit(0.0), _ + _))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "l2")
  }

  /** Residual-encoded IVF-PQ — the classic formulation: PQ encodes
    * `x − centroid(cell(x))` instead of the raw vector, so the codebooks
    * spend their 8 bytes on the WITHIN-cell geometry the coarse layer
    * can't see (raw-vector PQ wastes codes re-describing which cell a
    * point sits in). Correspondingly the ADC tables become per
    * (query, probed cell): the query's residual differs per cell, so
    * each probed cell gets its own m×k LUT — still probe-set-bounded
    * driver state (nProbe LUTs per query). Scoring is a BROADCAST HASH
    * JOIN on the coarse cell (the same shape as [[ivfAdcTopK]]):
    * a corpus row meets exactly the queries probing its cell. Everything
    * else — fused fit (now over the in-scan residual column), in-scan
    * encoding, exact rerank on raw vectors — is unchanged and equally
    * deterministic, so the oracle replays the whole thing. */
  def ivfResidualAdcTopK(corpus: DataFrame, queries: DataFrame, id: String,
                         vec: String, k: Int, m: Int, sub: Int, cells: Int,
                         coarseK: Int, nProbe: Int,
                         shortlist: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // seedCentroids returns cells 0..k-1 in ascending order already
    val coarse = Clustering.seedCentroids(corpus, id, vec, coarseK)
    val coarseLit = array(coarse.map { case (_, c) =>
      array(c.toIndexedSeq.map(lit): _*)
    }: _*)
    val withResid = corpus
      .withColumn("__cell", Clustering.assignCell(col(vec), coarse))
      .withColumn("__resid", zip_with(Similarity.vecDouble(col(vec)),
        element_at(coarseLit, col("__cell") + 1), (a, b) => a - b))
    val cb = fit(withResid, id, "__resid", m, sub, cells)
    val qRows = queries
      .select(col(id).cast("long").as("query_id"),
        Similarity.vecDouble(col(vec)).as("v"))
      .orderBy("query_id").collect()
    val lutRows = qRows.toSeq.flatMap { row =>
      val q = row.getSeq[Double](1).toArray
      probeCells(q, coarse, nProbe).map { cell =>
        val ctr = coarse.find(_._1 == cell).get._2
        val qr = Array.tabulate(q.length)(i => q(i) - ctr(i))
        (row.getLong(0), cell, adcLut(qr, cb).map(_.toSeq).toSeq)
      }
    }
    val lutDf = lutRows.toDF("query_id", "cell", "lut")
    val coded = withResid.select(col(id).as("vec_id"),
      col("__cell").as("cell"), encode(col("__resid"), cb).as("codes"))
    val short = shortlistTopR(coded.join(broadcast(lutDf), Seq("cell"))
      .withColumn("adc_dist", adcDist(col("lut"), col("codes"), m)), shortlist)
    rerankExact(corpus, queries, id, vec, k, short)
  }

  /** Deterministic IVF-PQ: the full production composition — a coarse
    * cell layer prunes the candidate set BEFORE ADC scoring, so the
    * compressed-domain work per query drops from the corpus to the
    * probed cells' share of it:
    *
    *   - coarse cells = seed assignment over the `coarseK` lowest-id
    *     FULL vectors (the q114/q117 discipline — deterministic, so the
    *     probe ranking is SQL-replicable, unlike an MLlib-fitted coarse
    *     quantizer);
    *   - per query, cells rank by ‖q − seed_c‖² (same csq − 2·dot
    *     arithmetic as assignment, ties to the lower cell) and the top
    *     `nProbe` are probed — the recall/cost dial;
    *   - ADC scores only rows whose cell is probed (cell + codes both
    *     computed in-scan on one corpus pass), then the exact-L2 rerank
    *     of the shortlist.
    *
    * This variant PQ-encodes raw vectors (IVF prunes, PQ compresses
    * independently); residual encoding — PQ over (x − seed_cell) — is
    * the classic refinement and slots into [[encode]] unchanged. */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, id: String,
                 vec: String, k: Int, m: Int, sub: Int, cells: Int,
                 coarseK: Int, nProbe: Int, shortlist: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val coarse = Clustering.seedCentroids(corpus, id, vec, coarseK)
    val cb = fit(corpus, id, vec, m, sub, cells)
    val qRows = queries
      .select(col(id).cast("long").as("query_id"),
        Similarity.vecDouble(col(vec)).as("v"))
      .orderBy("query_id").collect()
    // One LUT row per (query, probed cell) — same raw-vector LUT repeated
    // across the query's probed cells — so scoring is a BROADCAST HASH
    // JOIN on the coarse cell (the q145 shape): a corpus row meets exactly
    // the queries probing its cell, instead of every query pre-filter as
    // the old crossJoin+array_contains nested-loop did. Broadcast size is
    // nProbe× the per-query LUT list — still probe-set-bounded.
    val lutRows = qRows.toSeq.flatMap { row =>
      val q = row.getSeq[Double](1).toArray
      val lut = adcLut(q, cb).map(_.toSeq).toSeq
      probeCells(q, coarse, nProbe).map(cell => (row.getLong(0), cell, lut))
    }
    val lutDf = lutRows.toDF("query_id", "cell", "lut")
    val coded = corpus.select(col(id).as("vec_id"),
      Clustering.assignCell(col(vec), coarse).as("cell"),
      encode(col(vec), cb).as("codes"))
    val short = shortlistTopR(coded.join(broadcast(lutDf), Seq("cell"))
      .withColumn("adc_dist", adcDist(col("lut"), col("codes"), m)), shortlist)
    rerankExact(corpus, queries, id, vec, k, short)
  }
}
