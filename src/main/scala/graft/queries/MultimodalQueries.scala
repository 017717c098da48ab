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

  /** q149: REAL image decode — executors render deterministic gray PNGs
    * with `javax.imageio`, then decode them back and aggregate actual
    * pixels. The oracle replays the pixel formula ((doc_id·31 + 7x + 13y)
    * mod 256 over w×h) as pure SQL, so a wrong decoded dimension, a lossy
    * roundtrip, or a raster-order bug all hash-fail. This closes the one
    * decode the container allows to be real; audio/video stay stubbed. */
  private def pngDecode(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.pngFromDocuments(Tables.documents(spark, dir))
    Multimodal.pngStats(media).toDF().orderBy("media_id")
  }

  /** q164: image near-dup via 56-bit dHash over REAL decoded pixels —
    * the perceptual-dedup stage of a multimodal corpus pipeline. The
    * hash itself is in-scan per-image work (decode + integer grid
    * comparisons); the dedup grouping is ONE window over the hash. The
    * oracle replays the grid formula from the generator arithmetic, so
    * any decode/raster/sampling bug flips bits and hash-fails. */
  private def imageDHash(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.pngFromDocuments(Tables.documents(spark, dir))
    Multimodal.pngDHash(media).toDF()
      .withColumn("n_same", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("dhash")))
      .orderBy("media_id")
  }

  /** q211: REAL audio decode — executors render deterministic mono
    * 16-bit PCM WAV clips with `javax.sound.sampled`, then decode them
    * back (header → format, frames → samples) and aggregate actual
    * amplitudes. The oracle replays the sample formula
    * ((doc_id·37 + 11·i) mod 4096 − 2048 over n = n_chars mod 50 + 20)
    * as pure SQL, so a wrong sample rate, an endianness flip, a header
    * mis-parse, or a lossy roundtrip all hash-fail. With q149 this
    * closes BOTH decodes the JDK allows to be real; only video stays
    * stubbed. */
  private def wavDecode(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.wavFromDocuments(Tables.documents(spark, dir))
    Multimodal.wavStats(media).toDF().orderBy("media_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_media_features" -> mediaFeatures,
    "q77_frame_sample" -> frameSample,
    "q78_resize_meta" -> resizeMeta,
    "q149_png_decode" -> pngDecode,
    "q164_image_dhash" -> imageDHash,
    "q211_wav_decode" -> wavDecode
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
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // Pixel-formula replay: p runs row-major over w×h, x = p mod w,
    // y = p div w — the same raster order the Spark side writes and
    // reads. PNG is lossless, so the decoded aggregates must match the
    // formula exactly.
    "q149_png_decode" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars % 13 + 4 AS w, doc_id % 9 + 4 AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h,
        |         [ (doc_id*31 + (p % w)*7 + (p // w)*13) % 256
        |           for p in range(0, w*h) ] AS vs
        |  FROM d)
        |SELECT doc_id AS media_id,
        |       CAST(w AS INTEGER) AS img_w,
        |       CAST(h AS INTEGER) AS img_h,
        |       CAST(list_sum(vs) AS BIGINT) AS px_sum,
        |       CAST(list_min(vs) AS INTEGER) AS px_min,
        |       CAST(list_max(vs) AS INTEGER) AS px_max
        |FROM px ORDER BY media_id""".stripMargin,
    // dHash grid replay: sample x = gx*w//8, y = gy*h//8; bit (gy*7+gx)
    // set when the right neighbor sample is brighter. Same generator
    // arithmetic as q149; << and // are exact integer ops on both sides.
    "q164_image_dhash" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars % 13 + 4 AS w, doc_id % 9 + 4 AS h
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, w, h, CAST(list_sum(
        |    [ CASE WHEN (doc_id*31 + (((i % 7) + 1) * w // 8) * 7
        |                  + ((i // 7) * h // 8) * 13) % 256
        |               > (doc_id*31 + ((i % 7) * w // 8) * 7
        |                  + ((i // 7) * h // 8) * 13) % 256
        |           THEN 1::BIGINT << i ELSE 0::BIGINT END
        |      for i in range(0, 56) ]) AS BIGINT) AS dhash
        |  FROM d)
        |SELECT doc_id AS media_id,
        |       CAST(w AS INTEGER) AS img_w, CAST(h AS INTEGER) AS img_h,
        |       dhash, count(*) OVER (PARTITION BY dhash) AS n_same
        |FROM b ORDER BY media_id""".stripMargin,
    // Sample-formula replay: PCM is lossless, so the decoded amplitude
    // aggregates must match the generator arithmetic exactly; format
    // fields (8 kHz mono 16-bit) come from the parsed WAV header on the
    // Spark side and are literals here.
    "q211_wav_decode" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars % 50 + 20 AS n FROM documents),
        |s AS (
        |  SELECT doc_id, n,
        |         [ (doc_id*37 + 11*i) % 4096 - 2048
        |           for i in range(0, n) ] AS vs
        |  FROM d)
        |SELECT doc_id AS media_id,
        |       8000 AS sample_rate, 1 AS n_channels, 16 AS bits,
        |       CAST(n AS BIGINT) AS n_samples,
        |       CAST(list_sum(vs) AS BIGINT) AS amp_sum,
        |       CAST(list_min(vs) AS INTEGER) AS amp_min,
        |       CAST(list_max(vs) AS INTEGER) AS amp_max,
        |       CAST(list_sum(list_transform(vs, v -> v*v)) AS BIGINT)
        |         AS energy
        |FROM s ORDER BY media_id""".stripMargin
  )
}
