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

  /** q77: REAL frame sampling — executors encode multi-frame animated
    * GIFs, [[Multimodal.sampleFrames]] decodes the container, keeps
    * every 2nd frame, re-encodes each kept frame as PNG, and
    * [[Multimodal.pngStats]] decodes those back. The oracle replays the
    * per-frame pixel formula for exactly the sampled frame indices, so
    * the WHOLE chain (GIF encode → multi-frame decode → select → PNG
    * encode → PNG decode) is hash-gated. */
  private def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.gifFromDocuments(Tables.documents(spark, dir))
    Multimodal.pngStats(Multimodal.sampleFrames(media, everyN = 2)).toDF()
      .orderBy("media_id")
  }

  /** q78: REAL resize — decode each generated PNG, nearest-neighbor
    * resample to 8×6, re-encode, decode AGAIN and aggregate the
    * resampled pixels. The oracle replays src(x) = x·w₀ div 8,
    * src(y) = y·h₀ div 6 against the generator formula, so a wrong
    * sampling offset, a lossy re-encode, or an interpolating resampler
    * all hash-fail. */
  private def resizePixels(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.pngFromDocuments(Tables.documents(spark, dir))
    Multimodal.pngStats(Multimodal.resize(media, 8, 6)).toDF()
      .orderBy("media_id")
  }

  /** q230: REAL multi-frame video decode — executors render
    * deterministic ANIMATED GIFs (nf = doc_id mod 3 + 2 frames on a
    * 256-gray palette, NETSCAPE loop + per-frame delay metadata) with
    * `javax.imageio`, then decode them back frame by frame
    * (`getNumImages(true)` / `read(i)`) and aggregate actual pixels.
    * The oracle replays the per-frame formula ((doc_id·31 + 7x + 13y +
    * 97f) mod 256), so a dropped frame, a palette permutation the gray
    * ramp doesn't absorb, or a lossy quantization all hash-fail. With
    * q149 (PNG) and q211 (WAV) this makes every decode on the
    * multimodal surface real — no stubs remain. */
  private def gifDecode(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.gifFromDocuments(Tables.documents(spark, dir))
    Multimodal.gifFrameStats(media).toDF().orderBy("media_id", "frame_idx")
  }

  /** q149: REAL image decode — executors render deterministic gray PNGs
    * with `javax.imageio`, then decode them back and aggregate actual
    * pixels. The oracle replays the pixel formula ((doc_id·31 + 7x + 13y)
    * mod 256 over w×h) as pure SQL, so a wrong decoded dimension, a lossy
    * roundtrip, or a raster-order bug all hash-fail. The audio twin is
    * q211 (WAV) and the multi-frame video twin is q230 (animated GIF). */
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
    * mis-parse, or a lossy roundtrip all hash-fail. With q149 (PNG) and
    * q230 (animated GIF) every decode on this surface is real. */
  private def wavDecode(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.wavFromDocuments(Tables.documents(spark, dir))
    Multimodal.wavStats(media).toDF().orderBy("media_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_media_features" -> mediaFeatures,
    "q77_frame_sample" -> frameSample,
    "q78_resize_pixels" -> resizePixels,
    "q149_png_decode" -> pngDecode,
    "q230_gif_decode" -> gifDecode,
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
    // Sampled-frame replay: frames f with f % 2 = 0 out of
    // nf = doc_id % 3 + 2 survive sampling; each surviving frame's
    // pixels follow the GIF generator formula with its own 97f offset
    // and ride a PNG re-encode (lossless), so the aggregates are exact.
    "q77_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars % 11 + 4 AS w, doc_id % 7 + 4 AS h,
        |         doc_id % 3 + 2 AS nf
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, w, h, unnest(range(0, nf)) AS fi FROM d),
        |px AS (
        |  SELECT doc_id, w, h, fi,
        |         [ (doc_id*31 + (p % w)*7 + (p // w)*13 + 97*fi) % 256
        |           for p in range(0, w*h) ] AS vs
        |  FROM f WHERE fi % 2 = 0)
        |SELECT doc_id * 100 + fi AS media_id,
        |       CAST(w AS INTEGER) AS img_w, CAST(h AS INTEGER) AS img_h,
        |       CAST(list_sum(vs) AS BIGINT) AS px_sum,
        |       CAST(list_min(vs) AS INTEGER) AS px_min,
        |       CAST(list_max(vs) AS INTEGER) AS px_max
        |FROM px ORDER BY media_id""".stripMargin,
    // Nearest-neighbor replay: resized pixel (x, y) samples the source
    // at (x*w0 div 8, y*h0 div 6) — same integer arithmetic as the
    // Spark-side resampler; p runs row-major over the 8×6 target.
    "q78_resize_pixels" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars % 13 + 4 AS w0, doc_id % 9 + 4 AS h0
        |  FROM documents),
        |px AS (
        |  SELECT doc_id,
        |         [ (doc_id*31 + ((p % 8) * w0 // 8)*7
        |            + ((p // 8) * h0 // 6)*13) % 256
        |           for p in range(0, 48) ] AS vs
        |  FROM d)
        |SELECT doc_id AS media_id, 8 AS img_w, 6 AS img_h,
        |       CAST(list_sum(vs) AS BIGINT) AS px_sum,
        |       CAST(list_min(vs) AS INTEGER) AS px_min,
        |       CAST(list_max(vs) AS INTEGER) AS px_max
        |FROM px ORDER BY media_id""".stripMargin,
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
    // Per-frame pixel-formula replay: fi runs over the full frame range
    // (a dropped or duplicated frame changes n_frames AND the row set);
    // the gray-ramp palette makes GIF lossless, so aggregates are exact.
    "q230_gif_decode" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars % 11 + 4 AS w, doc_id % 7 + 4 AS h,
        |         doc_id % 3 + 2 AS nf
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS fi FROM d),
        |px AS (
        |  SELECT doc_id, w, h, nf, fi,
        |         [ (doc_id*31 + (p % w)*7 + (p // w)*13 + 97*fi) % 256
        |           for p in range(0, w*h) ] AS vs
        |  FROM f)
        |SELECT doc_id AS media_id,
        |       CAST(nf AS INTEGER) AS n_frames,
        |       CAST(fi AS INTEGER) AS frame_idx,
        |       CAST(w AS INTEGER) AS img_w, CAST(h AS INTEGER) AS img_h,
        |       CAST(list_sum(vs) AS BIGINT) AS px_sum,
        |       CAST(list_min(vs) AS INTEGER) AS px_min,
        |       CAST(list_max(vs) AS INTEGER) AS px_max
        |FROM px ORDER BY media_id, frame_idx""".stripMargin,
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
