package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import graft.text.Retrieval
import graft.text.TextAnalysis.tokens

/** Ranked-retrieval queries (round 3): the scoring leg of the text-
  * analysis pipeline — BM25 over the documents corpus with a fixed query
  * term-set. Fully oracle-checked: integer-exact tf/df/dl feed an
  * identical IEEE-754 expression tree on both engines (rational idf, all
  * constants binary-exact — see Retrieval's scaladoc). */
object RetrievalQueries extends QueryPack {

  /** The fixed query term-set: common corpus words with a df spread. */
  private[graft] val Terms = Seq("table", "join", "hash")

  /** q92: BM25 top-10 docs per language for the fixed term-set. */
  private def bm25TopK(spark: SparkSession, dir: String): DataFrame =
    Retrieval.bm25TopK(Tables.documents(spark, dir),
        part = "lang", id = "doc_id", text = "text", terms = Terms, k = 10)
      .orderBy("lang", "rank")

  /** q136: RAG-style chunk retrieval end-to-end — q96's context-window
    * chunking composed with q92's BM25, the "retrieve the best PASSAGE,
    * not the best document" shape every RAG pipeline runs: chunks (50
    * tokens, stride 40) become the retrieval units, corpus statistics
    * (N, avgdl, df) are recomputed over CHUNKS per language, and the
    * top-5 chunks per language come back with (doc_id, chunk_id)
    * provenance. The sliced token arrays score DIRECTLY
    * ([[Retrieval.bm25TopKTokens]]) — no chunk-text materialization,
    * join, or re-tokenization between the two stages; chunking explodes
    * ~1 row per 40 tokens (narrow), tf/dl stay in-scan, stats broadcast,
    * and only (lang, cid, score) enters the rank shuffle. */
  private def ragChunkTopK(spark: SparkSession, dir: String): DataFrame = {
    val size = 50
    val stride = 40
    val chunks = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        graft.text.TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("lang"), col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          org.apache.spark.sql.functions.size(col("toks")) - 1,
          lit(stride))).as("start"))
      .select(col("lang"),
        // 1e6 chunk headroom per doc (collision would need a 40M-token
        // document at stride 40); a wider corpus keys on a struct instead
        (col("doc_id") * 1000000L + expr(s"start DIV $stride")).as("cid"),
        slice(col("toks"), col("start") + 1, lit(size)).as("ctoks"))
    Retrieval.bm25TopKTokens(chunks, part = "lang", id = "cid",
        toksCol = "ctoks", terms = Terms, k = 5)
      .select(col("lang"), expr("cid DIV 1000000").as("doc_id"),
        pmod(col("cid"), lit(1000000L)).as("chunk_id"),
        col("score"), col("rank"))
      .orderBy("lang", "rank")
  }

  /** q96: context-window chunking — every doc split into 50-token
    * chunks with stride 40 (10-token overlap), the LLM-training prep
    * step between cleaning and packing. One narrow pass: the token array
    * is sliced per start offset (sequence + posexplode), no shuffle at
    * all until the output sort; at 100 TB chunking is embarrassingly
    * parallel and stays inside the scan stage. */
  private def docChunks(spark: SparkSession, dir: String): DataFrame = {
    val size = 50
    val stride = 40
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.text.TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), org.apache.spark.sql.functions.size(col("toks")) - 1,
          lit(stride))).as("start"))
      .select(col("doc_id"), expr(s"start DIV $stride").as("chunk_id"),
        org.apache.spark.sql.functions.size(slice(col("toks"), col("start") + 1, lit(size)))
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("toks"), col("start") + 1, lit(size)), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  /** q97: sequence packing — the token stream per language, in
    * deterministic doc order, cut into fixed 2048-token training blocks:
    * a doc belongs to the block its cumulative start offset falls in
    * (GPT-style concat-then-chunk packing). One key shuffle + one sorted
    * window pass for the running offset, then a partial-aggregating
    * groupBy — no collect, no per-doc loop. */
  private def sequencePacking(spark: SparkSession, dir: String): DataFrame = {
    val capacity = 2048
    val w = Window.partitionBy("lang").orderBy("doc_id")
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("dl"))
      .withColumn("cum_before",
        coalesce(sum("dl").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pack_id", expr(s"cum_before DIV $capacity"))
      .groupBy("lang", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_tokens"),
        min("doc_id").as("first_doc"))
      .orderBy("lang", "pack_id")
  }

  /** q166: deterministic negative sampling for contrastive training —
    * every 10th doc anchors k=3 negatives drawn by an explicit LCG-style
    * residue (`(a·anchor + c + j·step) mod N`), nudged off the anchor on
    * self-collision. Reproducibility IS the point: RNG-based sampling
    * (`rand`, `sampleBy`) differs per engine/partitioning, this formula
    * is exact int64 on any engine, so resampled epochs are stable and
    * auditable. The residue join back to `documents` is the only
    * shuffle; anchors×k stays anchor-sized. At larger corpora keep
    * `a·max_id` inside int64 or switch the product to modular steps. */
  private def negativeSampling(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val raw = docs.where(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("anchor_id"))
      .crossJoin(broadcast(n))
      .select(col("anchor_id"), explode(array(lit(0), lit(1), lit(2))).as("j"),
        col("n_docs"))
      .withColumn("neg_raw",
        pmod(col("anchor_id") * 48271L + 11L + col("j") * 7919L, col("n_docs")))
      .withColumn("neg_id",
        when(col("neg_raw") === col("anchor_id"),
          pmod(col("neg_raw") + 1, col("n_docs"))).otherwise(col("neg_raw")))
    raw.join(docs.select(col("doc_id").as("neg_id"), col("lang").as("neg_lang")),
        "neg_id")
      .select("anchor_id", "j", "neg_id", "neg_lang")
      .orderBy("anchor_id", "j")
  }

  /** q169: inverted-index construction with delta-encoded, CAPPED
    * posting lists — the IR build step. Per term: exact document
    * frequency plus the first 1000 doc ids, sorted and gap-encoded
    * (`first, id−prev, …` — the standard postings compression input).
    * The cap is the 100 TB guard: `collect_list` only ever holds the
    * <= 1000 sub-cap ids per term (nulls are skipped), so a stop-word's
    * billion-doc posting list never materializes anywhere while its df
    * stays exact. The rank window and the aggregation share one
    * term-hash exchange. */
  private def invertedIndex(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val post = docs.select(col("doc_id"),
      explode(array_distinct(tokens(col("text")))).as("term"))
    val w = Window.partitionBy("term").orderBy("doc_id")
    post.withColumn("rn", row_number().over(w))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        sum(when(col("rn") <= 1000, 1L).otherwise(0L)).as("n_stored"),
        sort_array(collect_list(when(col("rn") <= 1000, col("doc_id"))))
          .as("ids"))
      .withColumn("postings_delta", array_join(
        transform(col("ids"), (x, i) =>
          when(i === 0, x).otherwise(x - element_at(col("ids"), i))
            .cast("string")), ","))
      .select("term", "df", "n_stored", "postings_delta")
      .orderBy("term")
  }

  /** q223: PHRASE search over a positional inverted index — the
    * retrieval primitive BM25's bag-of-words scoring can't express
    * (exact multi-word match, "table scan" as a unit). The index is
    * the classic (term, doc, position) postings relation; a phrase
    * query is a POSTING-LIST MERGE, expressed relationally as an
    * equi-join of the two terms' postings on (doc, adjacent position)
    * — each term predicate prunes the exploded stream to that term's
    * postings before any join (a real index lookup's access path, and
    * at 100 TB the join is posting-list-sized, never corpus-sized;
    * df-bounded like every inverted-index operator here). Output per
    * matching doc: occurrence count and first match position — the
    * fields a snippet generator consumes. */
  private def phraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val Seq(t1, t2) = Seq("table", "scan")
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(tokens(lower(col("text")))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
    val p1 = toks.where(col("tok") === t1).select(col("doc_id"), col("pos"))
    val p2 = toks.where(col("tok") === t2)
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    p1.join(p2, Seq("doc_id", "pos"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"), min("pos").as("first_pos"))
      .orderBy("doc_id")
  }

  /** q250: reciprocal-rank-fusion HYBRID retrieval (Cormack, Clarke &
    * Buettcher SIGIR'09) — the lexical leg (global BM25 over the fixed
    * term-set, q92's scorer with one corpus-wide statistics partition)
    * fused with the semantic leg (exact cosine against query vector 0,
    * q41's scorer) by RRF(d) = Σ_legs ⌊10⁶ / (60 + rank_d)⌋. The fusion
    * is pure INTEGER over the two row_number ranks (truncating division
    * of positives, `div` ≡ DuckDB `//`), so the only floats on the
    * surface are the two legs' scores — each already bit-reproducible
    * by its own query's contract. Docs outside a leg's top-50 contribute
    * 0 from that leg (the standard top-k RRF form — also what keeps the
    * fused frame k-bounded instead of corpus-bounded). Doc 0 is the
    * query and is excluded from both universes; at sf0.1 only a prefix
    * of docs carries an embedding, so the legs legitimately rank
    * different universes — exactly the partially-embedded-corpus case
    * hybrid search exists for.
    *
    * Scale shape: each leg is broadcast-stats + in-scan scoring + ONE
    * rank shuffle with a partial WindowGroupLimit below it (only k rows
    * per input partition shuffle); the fusion joins two ≤k-row frames —
    * driver-independent, corpus-size-independent. */
  private def rrfHybrid(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).where(col("doc_id") =!= 0)
      .withColumn("part", lit("all"))
    val lex = Retrieval.bm25TopK(docs, part = "part", id = "doc_id",
        text = "text", terms = Terms, k = 50)
      .select(col("doc_id"), col("score").as("bm25"),
        col("rank").as("rank_lex"))
    val emb = Tables.embeddings(spark, dir)
    val sem = graft.similarity.Similarity.bruteForceTopK(
        emb, emb.where(col("vec_id") === 0), id = "vec_id",
        vec = "embedding", k = 50)
      .select(col("neighbor_id").as("doc_id"), col("cosine"),
        col("rank").as("rank_sem"))
    val fused = lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr("1000000 div (60 + rank_lex)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + rank_sem)"), lit(0L)))
    val w = Window.orderBy(desc("rrf_micro"), asc("doc_id"))
    fused.withColumn("fused_rank", row_number().over(w))
      .where(col("fused_rank") <= 20)
      .select("fused_rank", "doc_id", "rrf_micro", "rank_lex", "bm25",
        "rank_sem", "cosine")
      .orderBy("fused_rank")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q223_phrase_search" -> phraseSearch,
    "q250_rrf_hybrid" -> rrfHybrid,
    "q92_bm25_topk" -> bm25TopK,
    "q169_inverted_index" -> invertedIndex,
    "q96_doc_chunks" -> docChunks,
    "q97_sequence_packing" -> sequencePacking,
    "q136_rag_chunk_topk" -> ragChunkTopK,
    "q166_negative_sampling" -> negativeSampling
  )

  // The SQL mirrors the Spark expression tree node for node (same casts,
  // same association); every float input is an exact integer and every
  // constant is binary-exact, so the scores hash-match bit for bit.
  override def oracles: Map[String, String] = Map(
    // Both legs replayed in full — the q92 BM25 expression tree with ONE
    // global statistics partition, the q41 cosine fold — then the exact
    // integer RRF arithmetic and both tie-broken rank stages.
    "q250_rrf_hybrid" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents WHERE doc_id <> 0),
        |f AS (
        |  SELECT doc_id,
        |         CAST(len(toks) AS BIGINT) AS dl,
        |         CAST(len(list_filter(toks, x -> x = 'table')) AS BIGINT) AS tf0,
        |         CAST(len(list_filter(toks, x -> x = 'join'))  AS BIGINT) AS tf1,
        |         CAST(len(list_filter(toks, x -> x = 'hash'))  AS BIGINT) AS tf2
        |  FROM d),
        |l AS (
        |  SELECT count(*) AS n_docs,
        |         CAST(sum(dl) AS BIGINT) AS sum_dl,
        |         CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |         CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |         CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |  FROM f),
        |s AS (
        |  SELECT f.doc_id,
        |         (CASE WHEN tf0 > 0 THEN
        |            ((CAST(n_docs - df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5))
        |            * ((CAST(tf0 AS DOUBLE) * 2.25)
        |               / (CAST(tf0 AS DOUBLE)
        |                  + 1.25 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
        |                                   / (CAST(sum_dl AS DOUBLE) / n_docs))))
        |          ELSE 0.0 END)
        |         + (CASE WHEN tf1 > 0 THEN
        |            ((CAST(n_docs - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5))
        |            * ((CAST(tf1 AS DOUBLE) * 2.25)
        |               / (CAST(tf1 AS DOUBLE)
        |                  + 1.25 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
        |                                   / (CAST(sum_dl AS DOUBLE) / n_docs))))
        |          ELSE 0.0 END)
        |         + (CASE WHEN tf2 > 0 THEN
        |            ((CAST(n_docs - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5))
        |            * ((CAST(tf2 AS DOUBLE) * 2.25)
        |               / (CAST(tf2 AS DOUBLE)
        |                  + 1.25 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
        |                                   / (CAST(sum_dl AS DOUBLE) / n_docs))))
        |          ELSE 0.0 END) AS bm25
        |  FROM f CROSS JOIN l),
        |lexr AS (
        |  SELECT doc_id, bm25,
        |         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank_lex
        |  FROM s),
        |lex AS (SELECT * FROM lexr WHERE rank_lex <= 50),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings),
        |q AS (SELECT dv AS qv FROM v WHERE vec_id = 0),
        |cs AS (
        |  SELECT c.vec_id AS doc_id,
        |         list_sum([q.qv[i] * c.dv[i] for i in range(1, len(q.qv) + 1)])
        |           / (sqrt(list_sum([q.qv[i] * q.qv[i] for i in range(1, len(q.qv) + 1)]))
        |              * sqrt(list_sum([c.dv[i] * c.dv[i] for i in range(1, len(c.dv) + 1)]))) AS cosine
        |  FROM v c CROSS JOIN q WHERE c.vec_id <> 0),
        |semr AS (
        |  SELECT doc_id, cosine,
        |         row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS rank_sem
        |  FROM cs),
        |sem AS (SELECT * FROM semr WHERE rank_sem <= 50),
        |fused AS (
        |  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
        |         lex.rank_lex, lex.bm25, sem.rank_sem, sem.cosine,
        |         COALESCE(1000000 // (60 + lex.rank_lex), 0)
        |           + COALESCE(1000000 // (60 + sem.rank_sem), 0) AS rrf_micro
        |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id),
        |r AS (
        |  SELECT doc_id, rrf_micro, rank_lex, bm25, rank_sem, cosine,
        |         row_number() OVER (ORDER BY rrf_micro DESC, doc_id ASC)
        |           AS fused_rank
        |  FROM fused)
        |SELECT fused_rank, doc_id, rrf_micro, rank_lex, bm25, rank_sem, cosine
        |FROM r WHERE fused_rank <= 20 ORDER BY fused_rank""".stripMargin,
    // positional postings replayed with the q213 parallel-unnest
    // pattern; same adjacency join, same 1-based positions
    "q223_phrase_search" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok,
        |         unnest(generate_series(1,
        |           len(regexp_split_to_array(trim(lower(text)), '\s+')))) AS pos
        |  FROM documents),
        |p1 AS (SELECT doc_id, pos FROM toks WHERE tok = 'table'),
        |p2 AS (SELECT doc_id, pos - 1 AS pos FROM toks WHERE tok = 'scan')
        |SELECT p1.doc_id, count(*) AS n_matches, min(p1.pos) AS first_pos
        |FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND p1.pos = p2.pos
        |GROUP BY p1.doc_id ORDER BY p1.doc_id""".stripMargin,
    // same rank cap, same sorted gap encoding; the joined string
    // compares exactly
    "q169_inverted_index" ->
      """WITH dt AS (
        |  SELECT DISTINCT doc_id, term FROM (
        |    SELECT doc_id,
        |           unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |    FROM documents) t),
        |r AS (
        |  SELECT term, doc_id,
        |         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        |  FROM dt),
        |a AS (
        |  SELECT term, count(*) AS df,
        |         count(*) FILTER (WHERE rn <= 1000) AS n_stored,
        |         list(doc_id ORDER BY doc_id) FILTER (WHERE rn <= 1000) AS ids
        |  FROM r GROUP BY term)
        |SELECT term, df, n_stored,
        |       array_to_string(list_transform(ids, (x, i) ->
        |         CASE WHEN i = 1 THEN x ELSE x - ids[i-1] END), ',')
        |         AS postings_delta
        |FROM a ORDER BY term""".stripMargin,
    // the LCG residue is plain int64 arithmetic; doc_ids are contiguous
    // 0..N-1 in the fixture but the join-back would also surface a gap
    // as a row-count mismatch rather than silently passing
    "q166_negative_sampling" ->
      """WITH n AS (SELECT count(*) AS n_docs FROM documents),
        |a AS (
        |  SELECT doc_id AS anchor_id, j, n.n_docs
        |  FROM documents CROSS JOIN n
        |  CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)
        |  WHERE doc_id % 10 = 0),
        |r AS (
        |  SELECT anchor_id, j, n_docs,
        |         (anchor_id * 48271 + 11 + j * 7919) % n_docs AS neg_raw
        |  FROM a),
        |s AS (
        |  SELECT anchor_id, j,
        |         CASE WHEN neg_raw = anchor_id THEN (neg_raw + 1) % n_docs
        |              ELSE neg_raw END AS neg_id
        |  FROM r)
        |SELECT s.anchor_id, CAST(s.j AS INTEGER) AS j, s.neg_id,
        |       d.lang AS neg_lang
        |FROM s JOIN documents d ON d.doc_id = s.neg_id
        |ORDER BY anchor_id, j""".stripMargin,
    "q92_bm25_topk" ->
      """WITH d AS (
        |  SELECT lang, doc_id,
        |         regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |f AS (
        |  SELECT lang, doc_id,
        |         CAST(len(toks) AS BIGINT) AS dl,
        |         CAST(len(list_filter(toks, x -> x = 'table')) AS BIGINT) AS tf0,
        |         CAST(len(list_filter(toks, x -> x = 'join'))  AS BIGINT) AS tf1,
        |         CAST(len(list_filter(toks, x -> x = 'hash'))  AS BIGINT) AS tf2
        |  FROM d),
        |l AS (
        |  SELECT lang,
        |         count(*) AS n_docs,
        |         CAST(sum(dl) AS BIGINT) AS sum_dl,
        |         CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |         CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |         CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |  FROM f GROUP BY lang),
        |s AS (
        |  SELECT f.lang, f.doc_id,
        |         (CASE WHEN tf0 > 0 THEN
        |            ((CAST(n_docs - df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5))
        |            * ((CAST(tf0 AS DOUBLE) * 2.25)
        |               / (CAST(tf0 AS DOUBLE)
        |                  + 1.25 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
        |                                   / (CAST(sum_dl AS DOUBLE) / n_docs))))
        |          ELSE 0.0 END)
        |         + (CASE WHEN tf1 > 0 THEN
        |            ((CAST(n_docs - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5))
        |            * ((CAST(tf1 AS DOUBLE) * 2.25)
        |               / (CAST(tf1 AS DOUBLE)
        |                  + 1.25 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
        |                                   / (CAST(sum_dl AS DOUBLE) / n_docs))))
        |          ELSE 0.0 END)
        |         + (CASE WHEN tf2 > 0 THEN
        |            ((CAST(n_docs - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5))
        |            * ((CAST(tf2 AS DOUBLE) * 2.25)
        |               / (CAST(tf2 AS DOUBLE)
        |                  + 1.25 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
        |                                   / (CAST(sum_dl AS DOUBLE) / n_docs))))
        |          ELSE 0.0 END) AS score
        |  FROM f JOIN l ON f.lang = l.lang),
        |r AS (
        |  SELECT lang, doc_id, score,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY score DESC, doc_id ASC) AS rank
        |  FROM s)
        |SELECT lang, doc_id, score, rank
        |FROM r WHERE rank <= 10 ORDER BY lang, rank""".stripMargin,
    // DuckDB list slice l[a:b] is 1-based inclusive and end-clamped —
    // exactly Spark's slice(l, a, len) with b = a + len - 1.
    // q92's score expression over q96's chunk slices: stats recomputed
    // per-lang over CHUNKS, provenance recovered from the composite cid
    "q136_rag_chunk_topk" ->
      """WITH d AS (
        |  SELECT lang, doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT lang, doc_id*1000000 + start // 40 AS cid,
        |         toks[start + 1 : start + 50] AS ctoks
        |  FROM (SELECT lang, doc_id, toks,
        |               unnest(range(0, len(toks), 40)) AS start
        |        FROM d)),
        |f AS (
        |  SELECT lang, cid,
        |         CAST(len(ctoks) AS BIGINT) AS dl,
        |         CAST(len(list_filter(ctoks, x -> x = 'table')) AS BIGINT) AS tf0,
        |         CAST(len(list_filter(ctoks, x -> x = 'join'))  AS BIGINT) AS tf1,
        |         CAST(len(list_filter(ctoks, x -> x = 'hash'))  AS BIGINT) AS tf2
        |  FROM c),
        |l AS (
        |  SELECT lang,
        |         count(*) AS n_docs,
        |         CAST(sum(dl) AS BIGINT) AS sum_dl,
        |         CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |         CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |         CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |  FROM f GROUP BY lang),
        |s AS (
        |  SELECT f.lang, f.cid,
        |         (CASE WHEN tf0 > 0 THEN
        |            ((CAST(n_docs - df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5))
        |            * ((CAST(tf0 AS DOUBLE) * 2.25)
        |               / (CAST(tf0 AS DOUBLE)
        |                  + 1.25 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
        |                                   / (CAST(sum_dl AS DOUBLE) / n_docs))))
        |          ELSE 0.0 END)
        |         + (CASE WHEN tf1 > 0 THEN
        |            ((CAST(n_docs - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5))
        |            * ((CAST(tf1 AS DOUBLE) * 2.25)
        |               / (CAST(tf1 AS DOUBLE)
        |                  + 1.25 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
        |                                   / (CAST(sum_dl AS DOUBLE) / n_docs))))
        |          ELSE 0.0 END)
        |         + (CASE WHEN tf2 > 0 THEN
        |            ((CAST(n_docs - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5))
        |            * ((CAST(tf2 AS DOUBLE) * 2.25)
        |               / (CAST(tf2 AS DOUBLE)
        |                  + 1.25 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
        |                                   / (CAST(sum_dl AS DOUBLE) / n_docs))))
        |          ELSE 0.0 END) AS score
        |  FROM f JOIN l ON f.lang = l.lang),
        |r AS (
        |  SELECT lang, cid, score,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY score DESC, cid ASC) AS rank
        |  FROM s)
        |SELECT lang, cid // 1000000 AS doc_id, cid % 1000000 AS chunk_id,
        |       score, rank
        |FROM r WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,
    "q96_doc_chunks" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, toks, unnest(range(0, len(toks), 40)) AS start
        |  FROM d)
        |SELECT doc_id,
        |       start // 40 AS chunk_id,
        |       CAST(len(toks[start + 1 : start + 50]) AS BIGINT) AS n_chunk_tokens,
        |       array_to_string(toks[start + 1 : start + 50], ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,
    "q97_sequence_packing" ->
      """WITH d AS (
        |  SELECT lang, doc_id,
        |         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS dl
        |  FROM documents),
        |c AS (
        |  SELECT lang, doc_id, dl,
        |         coalesce(sum(dl) OVER (PARTITION BY lang ORDER BY doc_id
        |                                ROWS BETWEEN UNBOUNDED PRECEDING
        |                                         AND 1 PRECEDING), 0) AS cum_before
        |  FROM d)
        |SELECT lang, CAST(cum_before // 2048 AS BIGINT) AS pack_id,
        |       count(*) AS n_docs,
        |       CAST(sum(dl) AS BIGINT) AS sum_tokens,
        |       min(doc_id) AS first_doc
        |FROM c GROUP BY 1, 2 ORDER BY lang, pack_id""".stripMargin
  )
}
