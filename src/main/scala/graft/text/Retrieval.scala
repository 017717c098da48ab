package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked retrieval over a document corpus: BM25 scoring of a fixed
  * query term-set, top-k per corpus partition (language). The scoring
  * leg the term-statistics query (q70) stops short of.
  *
  * Scale shape (100 TB corpus):
  *   - Per-doc term frequencies are codegen'd array expressions over the
  *     whitespace token array — dl and every tf_i come out of ONE narrow
  *     map pass over the scan; no explode, no shuffle of token rows.
  *   - Corpus statistics (N, Σdl, df per term) are a partial-aggregating
  *     groupBy on the (tiny-cardinality) partition column — map-side
  *     combine reduces each task to one row per language.
  *   - The stats frame (|langs| rows) broadcast-joins back onto the
  *     per-doc frame: scoring is again map-side, no repartitioning.
  *   - Only the final top-k ranks through a shuffle, and only the narrow
  *     (lang, doc_id, score) projection flows into it — document text
  *     never leaves the scan stage. Spark additionally plans a PARTIAL
  *     WindowGroupLimit below the exchange (row_number <= k pushdown),
  *     so at most k rows per language per input partition shuffle at
  *     all — the rank stage is size-bounded regardless of corpus size.
  *
  * Determinism: BM25 here is hash-exact across engines. All inputs to
  * the float expression are exact integers (tf, df, dl, N, Σdl); the
  * constants k1 = 1.25, k1+1 = 2.25, b = 0.75, 1−b = 0.25 and the ±0.5
  * idf smoothing are all exactly representable in binary, so both
  * engines evaluate the SAME IEEE-754 expression tree with one correctly
  * rounded operation per node. The classic `ln` idf is deliberately
  * replaced by its rational argument ((N − df + 0.5)/(df + 0.5)) —
  * logarithms are not guaranteed correctly rounded and differ between
  * libm and JVM intrinsics, and ln is monotone, so rational idf
  * preserves the ranking while keeping scores bit-reproducible.
  */
object Retrieval {

  val K1 = 1.25 // term-frequency saturation (exactly representable)
  val B = 0.75  // length normalization (exactly representable)

  /** One BM25 term contribution. All casts and the operation order
    * mirror the DuckDB oracle expression node for node. (private[graft]:
    * [[Bm25Index.query]] scores probed postings with the SAME node tree,
    * which is what makes the persisted path hash-identical to this
    * in-run scorer.) */
  private[graft] def bm25Term(tf: Column, df: Column, dl: Column,
      nDocs: Column, avgdl: Column): Column = {
    val idf = ((nDocs - df).cast("double") + lit(0.5)) /
      (df.cast("double") + lit(0.5))
    val num = tf.cast("double") * lit(K1 + 1)
    val den = tf.cast("double") +
      lit(K1) * (lit(1 - B) + lit(B) * dl.cast("double") / avgdl)
    when(tf > 0, idf * (num / den)).otherwise(lit(0.0))
  }

  /** Top-k docs per `part` (language) for the fixed `terms`, ranked by
    * BM25 with per-partition corpus statistics. Output:
    * (part, id, score, rank). */
  def bm25TopK(docs: DataFrame, part: String, id: String, text: String,
      terms: Seq[String], k: Int): DataFrame =
    bm25TopKTokens(
      docs.select(col(part), col(id),
        TextAnalysis.tokens(col(text)).as("__toks")),
      part, id, "__toks", terms, k)

  /** [[bm25TopK]] over a PRE-TOKENIZED unit column — the entry point for
    * retrieval units that aren't whole documents (chunk retrieval: the
    * sliced token arrays score directly, no join-and-resplit of chunk
    * text). Same plan shape: tf/dl in-scan, stats broadcast, partial
    * WindowGroupLimit under the rank exchange. */
  def bm25TopKTokens(docs: DataFrame, part: String, id: String,
      toksCol: String, terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && terms.size <= 16, "fixed small term set")
    val toks = col(toksCol)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === t)).cast("long").as(s"tf$i")
    }
    val perDoc = docs.select(
      col(part) +: col(id) +: size(toks).cast("long").as("dl") +: tfCols: _*)
    val dfAggs = terms.indices.map { i =>
      sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")
    }
    val statAggs = count(lit(1)).as("n_docs") +: sum("dl").as("sum_dl") +: dfAggs
    val stats = perDoc.groupBy(part)
      .agg(statAggs.head, statAggs.tail: _*)
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
    val score = terms.indices
      .map { i =>
        bm25Term(col(s"tf$i"), col(s"df$i"), col("dl"),
          col("n_docs"), col("avgdl"))
      }
      .reduceLeft(_ + _) // fixed left-assoc addition order, both engines
    val w = Window.partitionBy(part).orderBy(desc("score"), col(id).asc)
    perDoc.join(broadcast(stats), Seq(part))
      .withColumn("score", score)
      .select(col(part), col(id), col("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
