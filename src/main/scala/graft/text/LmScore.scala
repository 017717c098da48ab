package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-familiarity quality scoring — the CCNet/KenLM pattern reduced
  * to its distributable core: TRAIN a token-frequency model on the corpus
  * (one aggregation), then SCORE every document against it in-scan. Docs
  * whose tokens are mostly corpus-frequent read as "in-domain"; docs full
  * of rare tokens (boilerplate, code dumps, lorem ipsum, wrong-language
  * spill) score low and are prime filter candidates. The reference's
  * quality heuristics (stopword/length ratios, `qualityScore`) are
  * content-INDEPENDENT; this is the content-DEPENDENT complement a
  * pretraining pipeline runs next.
  *
  * Scale shape: the model is a bounded top-K vocabulary (one shuffle to
  * count, top-K collected — K is a constant, like the IVF centroid set),
  * shipped to every task as a map LITERAL, so scoring is zero-shuffle
  * in-scan arithmetic: no explode, no join, no re-aggregation by doc.
  * With a 100k+ vocabulary the same query becomes explode → broadcast
  * join → groupBy(doc) — one doc-key shuffle; the top-K literal is the
  * shape that wins while the model fits a task (it always does at K≤4096).
  * Exact-integer outputs (tf sums, token counts) keep the oracle
  * hash-stable; no `ln`, probed as non-portable for BM25 already.
  */
object LmScore {

  /** Lowercased whitespace tokens, empties removed (the corpus-model
    * normal form — distinct from [[TextAnalysis.tokens]], which
    * preserves case for the surface stats). */
  def normTokens(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), t => length(t) > 0)

  /** The model: top-`k` tokens by corpus frequency, ties broken by token
    * so the boundary is deterministic at every parallelism. Bounded
    * driver materialization (K rows), the same adjudicated pattern as
    * the IVF centroid collect. */
  def topKVocab(docs: DataFrame, textCol: String, k: Int): Seq[(String, Long)] = {
    docs.select(explode(normTokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
      .orderBy(desc("tf"), asc("tok"))
      .limit(k)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1)))
  }

  /** Score every doc against the vocabulary: `n_tokens` (normal-form
    * token count), `hit_count` (tokens found in the vocab), `hit_mass`
    * (sum of the corpus frequencies of those hits), and `familiar`
    * (at least half the doc's tokens are vocab hits — scale-invariant:
    * a head-token share, not an absolute frequency). */
  def familiarity(docs: DataFrame, idCol: String, textCol: String,
                  vocab: Seq[(String, Long)]): DataFrame = {
    val vmap = typedlit(vocab.toMap)
    docs.withColumn("__toks", normTokens(col(textCol)))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(filter(col("__toks"), t => element_at(vmap, t).isNotNull))
          .cast("long").as("hit_count"),
        aggregate(col("__toks"), lit(0L),
          (acc, t) => acc + coalesce(element_at(vmap, t), lit(0L)))
          .as("hit_mass"))
      .withColumn("familiar", col("hit_count") * 2 >= col("n_tokens"))
  }
}
