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

  /** q77: frame sampling through the typed Dataset path — per-video frame
    * counts and sliced payload bytes. The slice arithmetic is exactly
    * reproducible in SQL (frames = min(max(len/50,1),8); bytes =
    * min(len, frames*50)), so the stubbed decode's PLUMBING is still
    * oracle-gated end to end. */
  private def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesizeFromDocuments(Tables.documents(spark, dir))
    Multimodal.sampleFrames(media, everyN = 50).toDF()
      .groupBy(expr("media_id div 100").as("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("bytes"))).as("total_frame_bytes"))
      .orderBy("media_id")
  }

  /** q78: resize through the typed Dataset path — meta rewritten to the
    * target dimensions, payload and cardinality untouched. */
  private def resizeMeta(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.synthesizeFromDocuments(Tables.documents(spark, dir))
    Multimodal.resize(media, 224, 224).toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        min(col("meta.width")).as("min_w"),
        max(col("meta.height")).as("max_h"))
      .orderBy("kind")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_media_features" -> mediaFeatures,
    "q77_frame_sample" -> frameSample,
    "q78_resize_meta" -> resizeMeta
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
        |FROM documents ORDER BY media_id""".stripMargin,
    "q77_frame_sample" ->
      """SELECT doc_id AS media_id,
        |       least(greatest(length(text) // 50, 1), 8) AS n_frames,
        |       least(length(text),
        |             least(greatest(length(text) // 50, 1), 8) * 50) AS total_frame_bytes
        |FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id""".stripMargin,
    "q78_resize_meta" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |                       ELSE 'video' END AS kind,
        |       count(*) AS n, 224 AS min_w, 224 AS max_h
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
