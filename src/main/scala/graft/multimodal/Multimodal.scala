package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline (north star):
  * image/audio/video as opaque `binary` columns with typed metadata.
  *
  * The decode step is a clearly-marked STUB — the container ships no
  * image/audio codecs, so `fakeDecode` derives deterministic pseudo
  * features (byte histogram moments) from the payload. Everything around
  * it is the real Spark plumbing this operator needs at 100 TB: explicit
  * schema, binary payload column, typed Dataset boundary, batched
  * per-partition processing (the Scala analog of `mapInPandas` batch
  * shape), and partition-friendly outputs.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, sampleRate: Int,
                       durationMs: Long, format: String)
  case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte],
                         meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           byte_mean: Double, byte_entropy: Double,
                           feature: Array[Float])

  /** Deterministic synthetic media over `documents`: payload = UTF-8 text
    * bytes, kind/meta derived from stable columns. Stands in for reading
    * a real lakehouse media table. */
  def synthesizeFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("bytes"),
        struct(
          (pmod(col("n_chars"), lit(640)) + 16).cast("int").as("width"),
          (pmod(col("n_chars"), lit(480)) + 16).cast("int").as("height"),
          lit(16000).as("sampleRate"),
          (col("n_chars") * 10).as("durationMs"),
          lit("raw").as("format")).as("meta"))
      .as[MediaRecord]
  }

  /** STUB decode: byte histogram moments + a 16-dim pseudo-embedding.
    * Replace with a real codec (JNI/ImageIO/ffmpeg) in deployment; the
    * signature and batch shape are the contract. */
  private[multimodal] def fakeDecode(rec: MediaRecord): MediaFeatures = {
    val hist = new Array[Long](256)
    rec.bytes.foreach(b => hist(b & 0xff) += 1)
    val n = math.max(rec.bytes.length, 1)
    val mean = rec.bytes.map(b => (b & 0xff).toDouble).sum / n
    val entropy = -hist.filter(_ > 0).map { c =>
      val p = c.toDouble / n; p * math.log(p) / math.log(2)
    }.sum
    val feature = Array.tabulate(16) { i =>
      (hist.slice(i * 16, i * 16 + 16).sum.toDouble / n).toFloat
    }
    MediaFeatures(rec.media_id, rec.kind, rec.bytes.length, mean, entropy, feature)
  }

  /** Batched per-partition feature extraction — the `mapInPandas` analog:
    * the decoder sees fixed-size batches (amortizing model/codec init),
    * the engine sees a typed Dataset in and out, no driver involvement. */
  def extractFeatures(media: Dataset[MediaRecord],
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch init hook would live here (codec/model handle)
        batch.iterator.map(fakeDecode)
      }
    }
  }

  /** STUB resize: metadata-only transform + payload passthrough (a real
    * implementation re-encodes pixels; the plumbing — new meta, same
    * partitioning — is what the engine contracts). */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(r => r.copy(meta = r.meta.copy(width = w, height = h)))
  }

  /** STUB frame sampling for video payloads: deterministic byte-range
    * slices standing in for decoded frames; one output row per frame. */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val frames = math.max(r.bytes.length / math.max(everyN, 1), 1)
      (0 until math.min(frames, 8)).map { f =>
        val start = f * everyN
        val slice = r.bytes.slice(start, math.min(start + everyN, r.bytes.length))
        r.copy(media_id = r.media_id * 100 + f, bytes = slice,
          meta = r.meta.copy(durationMs = 0L))
      }
    }
  }
}
