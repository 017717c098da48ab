package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables
import graft.text.Retrieval

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

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q92_bm25_topk" -> bm25TopK
  )

  // The SQL mirrors the Spark expression tree node for node (same casts,
  // same association); every float input is an exact integer and every
  // constant is binary-exact, so the scores hash-match bit for bit.
  override def oracles: Map[String, String] = Map(
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
        |FROM r WHERE rank <= 10 ORDER BY lang, rank""".stripMargin
  )
}
