package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline (north star):
  * image/audio/video as opaque `binary` columns with typed metadata.
  *
  * Every decode on this surface is REAL — no stubs remain:
  *  - IMAGE: PNG payloads (magic-sniffed) decode through the JDK's
  *    `javax.imageio` ([[pngStats]] / [[pngDHash]] / the PNG branch of
  *    [[fakeDecode]]); [[resize]] resamples actual pixels
  *    (nearest-neighbor) and re-encodes.
  *  - AUDIO: WAV/PCM parses through the JDK's `javax.sound.sampled`
  *    ([[wavFromDocuments]] / [[wavStats]]) — header, format, and
  *    16-bit sample extraction.
  *  - VIDEO (multi-frame): animated GIF encodes/decodes through the
  *    JDK's GIF `ImageWriter`/`ImageReader` ([[gifFromDocuments]] /
  *    [[gifFrameStats]]); [[sampleFrames]] decodes the container,
  *    selects every Nth frame, and re-encodes each as PNG.
  * `fakeDecode`'s byte-histogram branch is the generic fallback for
  * payloads with no JDK codec (it is a feature extractor over raw
  * bytes, not a stand-in for a decode). Everything around the decodes
  * is the real Spark plumbing this operator needs at 100 TB: explicit
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
    * over actual `javax.imageio`-decoded pixels); for any other payload
    * the same moments run over the raw bytes — a generic byte-level
    * feature extractor for formats without a JDK codec (codec-backed
    * paths are [[pngStats]]/[[wavStats]]/[[gifFrameStats]]). */
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

  /** REAL resize: decode the PNG payload, nearest-neighbor resample to
    * w×h (src(x) = x·w₀ div w, src(y) = y·h₀ div h — pure integer
    * arithmetic, no interpolation, so a codec-free oracle can replay
    * the resampled pixels from the generator formula), re-encode as a
    * lossless gray PNG. Per-row in-scan codec work, zero shuffle; the
    * mapPartitions batch shape amortizes the encoder across rows. */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val bos = new java.io.ByteArrayOutputStream()
      it.map { rec =>
        val (w0, h0, px) = decodePng(rec.bytes).getOrElse(
          throw new IllegalArgumentException(
            s"media_id=${rec.media_id}: resize needs a decodable PNG payload"))
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          val sy = y * h0 / h
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, px(sy * w0 + x * w0 / w))
            x += 1
          }
          y += 1
        }
        bos.reset()
        javax.imageio.ImageIO.write(img, "png", bos)
        rec.copy(bytes = bos.toByteArray,
          meta = rec.meta.copy(width = w, height = h, format = "png"))
      }
    }
  }

  // ---------------------------------------------------------------------
  // Multi-frame video stand-in: animated GIF through the JDK codec.
  // The third application of the PNG/WAV playbook — encode deterministic
  // media ON THE EXECUTORS, decode it back through the real codec, and
  // let a codec-free oracle replay the generator formula.
  // ---------------------------------------------------------------------

  /** Per-frame stats decoded from REAL multi-frame GIF payloads — the
    * video analog of [[PngStats]]/[[WavStats]]: one row per frame with
    * the frame count the reader reported and exact pixel aggregates. */
  case class GifFrameStats(media_id: Long, n_frames: Int, frame_idx: Int,
                           img_w: Int, img_h: Int, px_sum: Long,
                           px_min: Int, px_max: Int)

  /** 256-entry grayscale palette: the GIF color table becomes exactly
    * the identity ramp, so the roundtrip is lossless and a decoded
    * RGB's low byte IS the generator value (independent of any palette
    * index permutation the writer might apply). */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Per-frame GIF metadata making the sequence a genuine ANIMATED GIF:
    * a GraphicControlExtension (10 cs delay, no disposal) on every
    * frame plus the NETSCAPE 2.0 infinite-loop ApplicationExtension on
    * the first — the standard `javax_imageio_gif_image_1.0` tree.
    *
    * The LocalColorTable is REBUILT as the explicit identity gray ramp:
    * the writer's default image metadata does NOT inherit the image's
    * IndexColorModel palette (probed empirically — its LCT entries come
    * back zeroed, and writing through it quantizes pixels onto the
    * web-safe grays, a lossy roundtrip the q230 oracle would hash-fail).
    * With the ramp spelled out entry by entry the container stores index
    * i as gray level i and LZW keeps it exact. */
  private def animatedGifMeta(writer: javax.imageio.ImageWriter,
                              img: java.awt.image.BufferedImage,
                              withLoop: Boolean)
      : javax.imageio.metadata.IIOMetadata = {
    import javax.imageio.metadata.IIOMetadataNode
    val meta = writer.getDefaultImageMetadata(
      javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img), null)
    val fmt = meta.getNativeMetadataFormatName
    val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
    // drop the default LocalColorTable (palette-less) and any default GCE;
    // force sequential row order — the default ImageDescriptor says
    // interlaceFlag=TRUE and the writer's interlaced output scrambles/
    // drops rows at small heights (observed: an 11×4 frame came back
    // row-permuted with its last row zeroed)
    var n = root.getFirstChild
    while (n != null) {
      val next = n.getNextSibling
      if (n.getNodeName == "LocalColorTable" ||
          n.getNodeName == "GraphicControlExtension") root.removeChild(n)
      else if (n.getNodeName == "ImageDescriptor")
        n.asInstanceOf[IIOMetadataNode].setAttribute("interlaceFlag", "FALSE")
      n = next
    }
    val lct = new IIOMetadataNode("LocalColorTable")
    lct.setAttribute("sizeOfLocalColorTable", "256")
    lct.setAttribute("sortFlag", "FALSE")
    var i = 0
    while (i < 256) {
      val e = new IIOMetadataNode("ColorTableEntry")
      e.setAttribute("index", i.toString)
      e.setAttribute("red", i.toString)
      e.setAttribute("green", i.toString)
      e.setAttribute("blue", i.toString)
      lct.appendChild(e)
      i += 1
    }
    root.appendChild(lct)
    val gce = new IIOMetadataNode("GraphicControlExtension")
    gce.setAttribute("disposalMethod", "none")
    gce.setAttribute("userInputFlag", "FALSE")
    gce.setAttribute("transparentColorFlag", "FALSE")
    gce.setAttribute("delayTime", "10")
    gce.setAttribute("transparentColorIndex", "0")
    root.appendChild(gce)
    if (withLoop) {
      val apps = new IIOMetadataNode("ApplicationExtensions")
      val app = new IIOMetadataNode("ApplicationExtension")
      app.setAttribute("applicationID", "NETSCAPE")
      app.setAttribute("authenticationCode", "2.0")
      app.setUserObject(Array[Byte](1, 0, 0)) // loop forever
      apps.appendChild(app)
      root.appendChild(apps)
    }
    meta.setFromTree(fmt, root)
    meta
  }

  /** Deterministic REAL animated GIFs over `documents`: each doc renders
    * nf = doc_id mod 3 + 2 full frames of w = n_chars mod 11 + 4 by
    * h = doc_id mod 7 + 4, frame f's pixel (x, y) =
    * (doc_id·31 + 7x + 13y + 97f) mod 256 on the 256-gray palette,
    * written as ONE multi-frame GIF89a via `ImageWriter.writeToSequence`
    * ON THE EXECUTORS. GIF's LZW is lossless and the palette is the
    * identity ramp, so a codec-free DuckDB oracle can replay the decoded
    * per-frame aggregates; the multi-image container encode/decode path
    * is what's under test. */
  def gifFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        (pmod(col("n_chars"), lit(11)) + 4).cast("int").as("w"),
        (pmod(col("doc_id"), lit(7)) + 4).cast("int").as("h"),
        (pmod(col("doc_id"), lit(3)) + 2).cast("int").as("nf"))
      .as[(Long, Int, Int, Int)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        // one writer per partition — setOutput resets it between rows
        val writer =
          javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val bos = new java.io.ByteArrayOutputStream()
        // the metadata tree (256-entry palette DOM) depends only on
        // (w, h, withLoop), not on pixels — building it per FRAME was
        // the encode hot spot (measured ~2× on the corpus); ≤ w·h
        // distinct shapes per partition makes this cache tiny
        val metaCache = scala.collection.mutable.HashMap
          .empty[(Int, Int, Boolean), javax.imageio.metadata.IIOMetadata]
        it.map { case (id, w, h, nf) =>
          bos.reset()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                raster.setSample(x, y, 0, java.lang.Math.floorMod(
                  id * 31 + 7L * x + 13L * y + 97L * f, 256L).toInt)
                x += 1
              }
              y += 1
            }
            val meta = metaCache.getOrElseUpdate((w, h, f == 0),
              animatedGifMeta(writer, img, withLoop = f == 0))
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta),
              null)
            f += 1
          }
          writer.endWriteSequence()
          ios.flush(); ios.close()
          MediaRecord(id, "video", bos.toByteArray,
            MediaMeta(w, h, 0, nf * 100L, "gif"))
        }
      }
  }

  /** Real multi-frame decode via `javax.imageio`'s GIF `ImageReader`:
    * `getNumImages(true)` walks the container, `read(i)` decodes frame
    * i. Gray values come through `getRGB & 0xff` (palette lookup), so
    * the result is palette-order-independent. Empty seq for anything
    * undecodable. */
  private[multimodal] def decodeGifFrames(bytes: Array[Byte])
      : Seq[(Int, Int, Array[Int])] = {
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return Seq.empty
    val reader = readers.next()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      (0 until n).map { i =>
        val img = reader.read(i)
        val (w, h) = (img.getWidth, img.getHeight)
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { px(y * w + x) = img.getRGB(x, y) & 0xff; x += 1 }
          y += 1
        }
        (w, h, px)
      }
    } catch {
      case _: java.io.IOException | _: IndexOutOfBoundsException => Seq.empty
    } finally {
      reader.dispose(); iis.close()
    }
  }

  /** Decode every animated-GIF payload (REAL `javax.imageio` multi-frame
    * decode) to per-frame dimension + pixel aggregates. Fails loudly on
    * an undecodable payload — same contract as [[pngStats]]. */
  def gifFrameStats(media: Dataset[MediaRecord]): Dataset[GifFrameStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { rec =>
        val frames = decodeGifFrames(rec.bytes)
        if (frames.isEmpty)
          throw new IllegalArgumentException(
            s"media_id=${rec.media_id}: payload is not a decodable GIF")
        frames.zipWithIndex.map { case ((w, h, px), i) =>
          var sum = 0L
          var mn = 255
          var mx = 0
          px.foreach { v => sum += v; if (v < mn) mn = v; if (v > mx) mx = v }
          GifFrameStats(rec.media_id, frames.length, i, w, h, sum, mn, mx)
        }
      }
    }
  }

  /** REAL frame sampling: decode the multi-frame payload (animated GIF
    * via `javax.imageio`), keep every Nth frame, and re-encode each kept
    * frame as a standalone lossless gray PNG — one MediaRecord per kept
    * frame (media_id·100 + frame index). Decode→select→re-encode is all
    * per-row in-scan work; downstream [[pngStats]] closes the loop. */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val bos = new java.io.ByteArrayOutputStream()
      it.flatMap { rec =>
        val frames = decodeGifFrames(rec.bytes)
        if (frames.isEmpty)
          throw new IllegalArgumentException(
            s"media_id=${rec.media_id}: payload is not a decodable GIF")
        frames.zipWithIndex.collect {
          case ((w, h, px), f) if f % math.max(everyN, 1) == 0 =>
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { raster.setSample(x, y, 0, px(y * w + x)); x += 1 }
              y += 1
            }
            bos.reset()
            javax.imageio.ImageIO.write(img, "png", bos)
            MediaRecord(rec.media_id * 100 + f, "image", bos.toByteArray,
              MediaMeta(w, h, 0, 0L, "png"))
        }
      }
    }
  }
}
