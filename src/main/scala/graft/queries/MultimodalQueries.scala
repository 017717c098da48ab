package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.tables.Tables

/** Multimodal-column query: binary payloads + typed metadata through the
  * batched feature-extraction plumbing. The byte-level features ARE
  * SQL-expressible (payload = UTF-8 text), so this carries an oracle:
  * n_bytes must equal length(text) for the ASCII fixture and the mean
  * byte is reproducible via per-char code averaging. */
object MultimodalQueries extends QueryPack {

  private def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesizeFromDocuments(Tables.documents(spark, dir))
    Multimodal.extractFeatures(media, batchSize = 64).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("byte_mean"))
      .orderBy("media_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_media_features" -> mediaFeatures
  )

  override def oracles: Map[String, String] = Map(
    "q47_media_features" ->
      """SELECT doc_id AS media_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |                       ELSE 'video' END AS kind,
        |       length(text) AS n_bytes,
        |       CAST(list_sum(list_transform(regexp_split_to_array(text, ''),
        |                                    c -> unicode(c))) AS DOUBLE)
        |         / length(text) AS byte_mean
        |FROM documents ORDER BY media_id""".stripMargin
  )
}
