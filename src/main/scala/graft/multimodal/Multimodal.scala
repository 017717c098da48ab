package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline (north star):
  * image/audio/video as opaque `binary` columns with typed metadata.
  *
  * IMAGE decode is REAL: PNG payloads (magic-sniffed) decode through the
  * JDK's `javax.imageio` — no external codec needed — and features come
  * from actual pixels ([[pngStats]] / the PNG branch of [[fakeDecode]]).
  * AUDIO decode is REAL too: WAV/PCM parses through the JDK's
  * `javax.sound.sampled` ([[wavFromDocuments]] / [[wavStats]]) — header,
  * format, and 16-bit sample extraction, no external codec. Only VIDEO
  * decode remains a clearly-marked STUB (the container ships no video
  * codecs): `fakeDecode` derives deterministic pseudo features
  * (byte histogram moments) from the raw payload. Everything around the
  * decode is the real Spark plumbing this operator needs at 100 TB:
  * explicit schema, binary payload column, typed Dataset boundary,
  * batched per-partition processing (the Scala analog of `mapInPandas`
  * batch shape), and partition-friendly outputs.
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

  private val PngMagic: Array[Byte] =
    Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)

  /** Real PNG decode via the JDK's `javax.imageio` (no external codec):
    * Some((width, height, gray samples row-major)) for a decodable PNG
    * payload, None otherwise. Pixel values are band-0 raster samples —
    * exact for the TYPE_BYTE_GRAY images [[pngFromDocuments]] writes
    * (PNG is lossless). */
  private[multimodal] def decodePng(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < PngMagic.length ||
        !bytes.startsWith(PngMagic)) return None
    // in-memory streams only — the default ImageIO disk cache would
    // create+delete a temp file per image
    javax.imageio.ImageIO.setUseCache(false)
    // a CORRUPT payload behind a valid magic makes ImageIO.read THROW
    // (it returns null only when no reader claims the stream); the
    // contract here is None for anything undecodable
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      Some((w, h, px))
    }
  }

  /** Decode: REAL for PNG payloads (histogram moments + 16-bin features
    * over actual `javax.imageio`-decoded pixels), STUB for everything
    * else (same moments over raw payload bytes — the container has no
    * audio/video codecs; replace with JNI/ffmpeg in deployment, the
    * signature and batch shape are the contract). */
  private[multimodal] def fakeDecode(rec: MediaRecord): MediaFeatures = {
    val values: Array[Int] = decodePng(rec.bytes) match {
      case Some((_, _, px)) => px
      case None => rec.bytes.map(b => b & 0xff)
    }
    val hist = new Array[Long](256)
    values.foreach(v => hist(v) += 1)
    val n = math.max(values.length, 1)
    val mean = values.map(_.toDouble).sum / n
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

  /** Per-image stats decoded from REAL pixels — the oracle-checkable
    * surface of the imageio path. */
  case class PngStats(media_id: Long, img_w: Int, img_h: Int,
                      px_sum: Long, px_min: Int, px_max: Int)

  /** Deterministic REAL PNGs over `documents`: each doc renders a small
    * TYPE_BYTE_GRAY image (w = n_chars mod 13 + 4, h = doc_id mod 9 + 4)
    * whose pixel (x, y) is (doc_id·31 + 7x + 13y) mod 256, encoded with
    * `javax.imageio` ON THE EXECUTORS (the encode is distributed work,
    * not fixture prep). Because PNG is lossless and the formula is pure
    * column arithmetic, a DuckDB oracle can replay the decoded pixel
    * aggregates without any codec — the decode itself is what's under
    * test. */
  def pngFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        (pmod(col("n_chars"), lit(13)) + 4).cast("int").as("w"),
        (pmod(col("doc_id"), lit(9)) + 4).cast("int").as("h"))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // keep encode in memory
        val bos = new java.io.ByteArrayOutputStream()
        it.map { case (id, w, h) =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0,
                java.lang.Math.floorMod(id * 31 + 7L * x + 13L * y, 256L).toInt)
              x += 1
            }
            y += 1
          }
          bos.reset()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRecord(id, "image", bos.toByteArray,
            MediaMeta(w, h, 0, 0L, "png"))
        }
      }
  }

  /** Decode every PNG payload (REAL `javax.imageio` decode) to
    * per-image dimension + pixel aggregates. Fails loudly on a payload
    * that does not decode — a silent skip would make a corrupt corpus
    * look clean. */
  def pngStats(media: Dataset[MediaRecord]): Dataset[PngStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { rec =>
        val (w, h, px) = decodePng(rec.bytes).getOrElse(
          throw new IllegalArgumentException(
            s"media_id=${rec.media_id}: payload is not a decodable PNG"))
        var sum = 0L
        var mn = 255
        var mx = 0
        px.foreach { v => sum += v; if (v < mn) mn = v; if (v > mx) mx = v }
        PngStats(rec.media_id, w, h, sum, mn, mx)
      }
    }
  }

  case class PngHash(media_id: Long, img_w: Int, img_h: Int, dhash: Long)

  /** 56-bit difference hash over an 8×8 nearest-neighbor sample grid:
    * bit (r·7+c) is set when the sampled pixel at grid (c+1, r) is
    * brighter than at (c, r). Pure integer — no resize interpolation,
    * so a codec-free oracle can replay it from the generator formula. */
  private[multimodal] def dHash(w: Int, h: Int, px: Array[Int]): Long = {
    var hash = 0L
    var i = 0
    while (i < 56) {
      val c = i % 7
      val y = (i / 7) * h / 8
      if (px(y * w + (c + 1) * w / 8) > px(y * w + c * w / 8))
        hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Perceptual hash of every PNG payload from REAL decoded pixels —
    * the image-dedup signal (near-identical renders collide; distinct
    * content doesn't). Decode + hash are per-row in-scan work; the only
    * shuffle downstream is whatever the caller groups on. */
  def pngDHash(media: Dataset[MediaRecord]): Dataset[PngHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { rec =>
        val (w, h, px) = decodePng(rec.bytes).getOrElse(
          throw new IllegalArgumentException(
            s"media_id=${rec.media_id}: payload is not a decodable PNG"))
        PngHash(rec.media_id, w, h, dHash(w, h, px))
      }
    }
  }

  /** Per-clip stats decoded from REAL PCM samples — the oracle-checkable
    * surface of the `javax.sound.sampled` path (the audio twin of
    * [[PngStats]]). All aggregates are exact int64 over the decoded
    * 16-bit samples. */
  case class WavStats(media_id: Long, sample_rate: Int, n_channels: Int,
                      bits: Int, n_samples: Long, amp_sum: Long,
                      amp_min: Int, amp_max: Int, energy: Long)

  /** Deterministic REAL WAV clips over `documents`: each doc renders a
    * mono 16-bit little-endian PCM clip at 8 kHz with
    * n = n_chars mod 50 + 20 samples, sample(i) =
    * (doc_id·37 + 11·i) mod 4096 − 2048, containerized with the JDK's
    * `javax.sound.sampled.AudioSystem` ON THE EXECUTORS (the encode is
    * distributed work, not fixture prep) — the audio analog of
    * [[pngFromDocuments]]. PCM is lossless and the formula is pure
    * integer arithmetic, so a codec-free DuckDB oracle can replay the
    * decoded sample aggregates; the WAV header/decode path itself is
    * what's under test. */
  def wavFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        (pmod(col("n_chars"), lit(50)) + 20).cast("int").as("n"))
      .as[(Long, Int)]
      .mapPartitions { it =>
        val bos = new java.io.ByteArrayOutputStream()
        val fmt = new javax.sound.sampled.AudioFormat(
          8000f, 16, 1, true, false) // 8 kHz mono signed 16-bit LE
        it.map { case (id, n) =>
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = (java.lang.Math.floorMod(id * 37 + 11L * i, 4096L) - 2048L).toInt
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          bos.reset()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          MediaRecord(id, "audio", bos.toByteArray,
            MediaMeta(0, 0, 8000, n * 1000L / 8000L, "wav"))
        }
      }
  }

  /** Decode every WAV payload (REAL `javax.sound.sampled` parse: header
    * → format, frames → 16-bit samples honoring the stream's declared
    * endianness) to per-clip format + amplitude aggregates. Fails
    * loudly on an undecodable payload — same contract as [[pngStats]]. */
  def wavStats(media: Dataset[MediaRecord]): Dataset[WavStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { rec =>
        val ais =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(rec.bytes))
          catch {
            case e: javax.sound.sampled.UnsupportedAudioFileException =>
              throw new IllegalArgumentException(
                s"media_id=${rec.media_id}: payload is not a decodable WAV", e)
          }
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16,
          s"media_id=${rec.media_id}: expected 16-bit PCM, got $fmt")
        val data = ais.readAllBytes()
        val nSamples = data.length / 2
        var sum = 0L
        var energy = 0L
        var mn = Int.MaxValue
        var mx = Int.MinValue
        var i = 0
        while (i < nSamples) {
          val (lo, hi) =
            if (fmt.isBigEndian) (data(2 * i + 1), data(2 * i))
            else (data(2 * i), data(2 * i + 1))
          val s = ((hi << 8) | (lo & 0xff)).toShort.toInt
          sum += s
          energy += s.toLong * s
          if (s < mn) mn = s
          if (s > mx) mx = s
          i += 1
        }
        WavStats(rec.media_id, fmt.getSampleRate.toInt, fmt.getChannels,
          fmt.getSampleSizeInBits, nSamples, sum, mn, mx, energy)
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
