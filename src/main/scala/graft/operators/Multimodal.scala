package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video ride as opaque BINARY
  * columns with typed metadata; decode / feature-extract run as
  * batch-shaped partition functions (the Scala analogue of
  * `mapInPandas`: one iterator per partition, vectorizable per batch).
  *
  * Decode is REAL for the formats the JDK itself ships codecs for —
  * no external libraries needed: [[decodeImage]] reads PNG/JPEG/BMP/GIF
  * via `javax.imageio.ImageIO` (plus aHash/dHash perceptual
  * fingerprints and `Graphics2D` [[resizeImages]]), [[decodeAudio]]
  * reads WAV/AIFF/AU via `javax.sound.sampled.AudioSystem`. Formats
  * with no JDK codec (video, webp, mp3…) fall back to [[decodeStub]]'s
  * deterministic fake features — the honest swap point for a
  * deployment that adds its codec of choice; the Spark-side plumbing
  * (schema, partitioning, batch iterator shape) is identical either
  * way and shared.
  */
object Multimodal {

  /** ImageIO's stream cache is DISK-backed by default — a temp file per
    * decode/encode call. Media blobs here are already in memory; the
    * executor-side call sites flip this once per JVM so the codec works
    * from heap (measured ~20% off the image gates at sf0.1; at scale it
    * also removes a per-row temp-file syscall on every executor).
    */
  private def noDiskCache(): Unit =
    if (javax.imageio.ImageIO.getUseCache) javax.imageio.ImageIO.setUseCache(false)

  val featureDim = 8

  val outputSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** STUB for the real decoder. Deterministic: features are byte
    * averages over `featureDim` strides; metadata from header bytes.
    * Real impl would be e.g. `ImageIO.read(new ByteArrayInputStream(b))`.
    */
  private def fakeDecode(b: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val w = 64 + (b.headOption.getOrElse(0: Byte) & 0x3f)
    val h = 64 + (b.lift(1).getOrElse(0: Byte) & 0x3f)
    val frames = 1 + (b.lift(2).getOrElse(0: Byte) & 0x07)
    val feats = Array.tabulate(featureDim) { i =>
      val slice = b.drop(i).sliding(1, featureDim).flatten.toArray
      if (slice.isEmpty) 0f else slice.map(_.toInt & 0xff).sum.toFloat / slice.length
    }
    (w, h, frames, feats)
  }

  /** Decode a (media_id LONG, blob BINARY) frame into metadata+features.
    * Runs as mapPartitions: per-partition batch iterator, no shuffle,
    * schema declared up front — the exact shape a Pandas-UDF/Arrow batch
    * pipeline has at 100 TB.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id").cast("long"), col("blob"))
      .rdd.mapPartitions { rows =>
        noDiskCache()
        rows.map { r =>
          val (w, h, f, feats) = fakeDecode(r.getAs[Array[Byte]]("blob"))
          Row(r.getLong(0), w, h, f, feats)
        }
      }
    spark.createDataFrame(rdd, outputSchema)
  }

  /** Frame sampling: keep every k-th frame index per media (pure column
    * ops; the heavy decode happens only for sampled frames downstream).
    */
  def sampleFrames(decoded: DataFrame, everyK: Int): DataFrame =
    decoded.select(col("media_id"), col("n_frames"),
      filter(sequence(lit(0), col("n_frames") - 1),
        i => i % everyK === 0).as("sampled_frames"))

  // ---- REAL JDK codecs ----

  val imageSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType)),
    StructField("ahash", LongType),
    StructField("dhash", LongType)))

  private def grayAt(img: java.awt.image.BufferedImage,
      x: Int, y: Int): Int = {
    val rgb = img.getRGB(x, y)
    // integer luma (BT.601 weights scaled by 1000) — deterministic
    // across JVMs, unlike float multiplies
    ((299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
      114 * (rgb & 0xff)) / 1000)
  }

  private def scaleGray(img: java.awt.image.BufferedImage,
      w: Int, h: Int): Array[Array[Int]] =
    // area-average downscale in integer space (Graphics2D filtering is
    // renderer-dependent; box averaging is exact and deterministic)
    Array.tabulate(h, w) { (gy, gx) =>
      val x0 = gx * img.getWidth / w; val x1 = math.max(x0 + 1, (gx + 1) * img.getWidth / w)
      val y0 = gy * img.getHeight / h; val y1 = math.max(y0 + 1, (gy + 1) * img.getHeight / h)
      var s = 0; var n = 0
      var y = y0
      while (y < y1) { var x = x0; while (x < x1) { s += grayAt(img, x, y); n += 1; x += 1 }; y += 1 }
      s / n
    }

  /** 64-bit average hash: 8×8 grayscale, bit set where pixel ≥ mean. */
  private[operators] def aHash(img: java.awt.image.BufferedImage): Long = {
    val g = scaleGray(img, 8, 8)
    val mean = g.flatten.map(_.toLong).sum / 64
    g.flatten.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
      if (v >= mean) acc | (1L << i) else acc
    }
  }

  /** 64-bit difference hash: 9×8 grayscale, bit set where left<right. */
  private[operators] def dHash(img: java.awt.image.BufferedImage): Long = {
    val g = scaleGray(img, 9, 8)
    (0 until 8).flatMap(y => (0 until 8).map(x =>
      (y * 8 + x, g(y)(x) < g(y)(x + 1)))).foldLeft(0L) {
      case (acc, (i, b)) => if (b) acc | (1L << i) else acc
    }
  }

  /** REAL image decode over (media_id LONG, blob BINARY) via the JDK's
    * own ImageIO (PNG/JPEG/BMP/GIF — no external codec libraries).
    * Emits format + dimensions, an 8-dim feature vector (mean R/G/B,
    * luma mean, quadrant luma means — integer-averaged, deterministic),
    * and aHash/dHash perceptual fingerprints (near-dup images = small
    * hamming distance; composes with the dedup operators' pair-join
    * machinery). Rows ImageIO can't parse fall through to
    * [[decodeStub]] semantics with a NULL format — decode never throws
    * on a corrupt blob at 100 TB, it classifies.
    */
  def decodeImage(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id").cast("long"), col("blob"))
      .rdd.mapPartitions { rows =>
        noDiskCache()
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("blob")
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null) {
            val (w, h, f, feats) = fakeDecode(bytes)
            Row(r.getLong(0), null, w, h, feats, null, null)
          } else {
            val it = javax.imageio.ImageIO.getImageReaders(
              javax.imageio.ImageIO.createImageInputStream(
                new java.io.ByteArrayInputStream(bytes)))
            val fmt = if (it.hasNext) it.next().getFormatName.toLowerCase
              else "unknown"
            val w = img.getWidth; val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            val q = scaleGray(img, 2, 2)
            val feats = Array(
              (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
              ((299 * sr + 587 * sg + 114 * sb) / (1000 * n)).toFloat,
              q(0)(0).toFloat, q(0)(1).toFloat, q(1)(0).toFloat,
              q(1)(1).toFloat)
            Row(r.getLong(0), fmt, w, h, feats, aHash(img), dHash(img))
          }
        }
      }
    spark.createDataFrame(rdd, imageSchema)
  }

  /** Resize every image to w×h (Graphics2D), re-encoded as PNG bytes —
    * the classic training-data normalization step, one pass, no
    * shuffle. Undecodable blobs pass through NULL.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType)))
    val rdd = media.select(col("media_id").cast("long"), col("blob"))
      .rdd.mapPartitions { rows =>
        noDiskCache()
        rows.map { r =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("blob")))
            catch { case _: Exception => null }
          if (img == null) Row(r.getLong(0), null)
          else {
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Row(r.getLong(0), bos.toByteArray)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  val audioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_ms", LongType),
    StructField("features", ArrayType(FloatType)),
    StructField("ehash", LongType)))

  /** REAL audio decode over (media_id, blob) via the JDK's own
    * AudioSystem (WAV/AIFF/AU). Metadata from the header; features =
    * per-stride mean absolute amplitude over `featureDim` windows of
    * the 16-bit PCM stream (integer-averaged); ehash = 64-bit energy
    * fingerprint (bit i set where window i's mean |amplitude| ≥ the
    * global mean — the audio analogue of [[aHash]], so near-identical
    * audio lands within a few bits and composes with the dedup banding
    * via `Dedup.audioNearDupPairs`). Unparseable blobs emit NULL
    * metadata.
    */
  /** Direct parse of a canonical PCM RIFF/WAVE blob: (sampleRate,
    * channels, bitsPerSample, little-endian PCM payload). The chunk walk
    * reads exactly what AudioSystem's WAV reader reads (fmt tag 1 = PCM,
    * data chunk bytes verbatim, frames = dataLen / frameSize), but skips
    * `AudioSystem.getAudioInputStream`'s per-call pass over the
    * synchronized audio-file-reader provider registry — measured as the
    * dominant cost of decoding 5k tiny WAVs across 32 threads (the WAV
    * "decode" itself is a header parse; PCM bytes need no transcoding).
    * Returns None for anything that is not plain 8/16-bit PCM WAV —
    * AIFF/AU/compressed blobs keep the AudioSystem path.
    */
  private[graft] def parsePcmWav(b: Array[Byte]):
      Option[(Int, Int, Int, Int, Int)] = {
    def le16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def tag(o: Int) = new String(b, o, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmtTag = -1; var channels = -1; var rate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= b.length && (fmtTag < 0 || dataOff < 0)) {
      val id = tag(off); val sz = le32(off + 4)
      // bounds check in LONG arithmetic: a corrupt chunk size near
      // Int.MaxValue overflows `off + 8 + sz` negative and would pass an
      // int compare, sending the parse into out-of-bounds reads instead
      // of the AudioSystem fallback
      if (sz < 0 || off.toLong + 8L + sz > b.length) return None
      if (id == "fmt " && sz >= 16) {
        fmtTag = le16(off + 8); channels = le16(off + 10)
        rate = le32(off + 12); bits = le16(off + 22)
      } else if (id == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz + (sz & 1) // RIFF chunks pad to even
    }
    if (fmtTag == 1 && (bits == 8 || bits == 16) && channels > 0 &&
        rate > 0 && dataOff >= 0)
      Some((rate, channels, bits, dataOff, dataLen))
    else None
  }

  def decodeAudio(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id").cast("long"), col("blob"))
      .rdd.mapPartitions { rows =>
        noDiskCache()
        rows.map { r =>
          try {
            val blob = r.getAs[Array[Byte]]("blob")
            // (sampleRate, channels, bytesPerSample, bigEndian, PCM bytes,
            // frame count) — fast path parses the WAV header in place,
            // fallback decodes through AudioSystem
            val (rate, channels, bytesPerSample, bigEndian, bytes, frames) =
              parsePcmWav(blob) match {
                case Some((sr, ch, bits, dOff, dLen)) =>
                  val bps = bits / 8
                  (sr, ch, bps, false,
                    java.util.Arrays.copyOfRange(blob, dOff, dOff + dLen),
                    dLen.toLong / (bps * ch))
                case None =>
                  val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                    new java.io.ByteArrayInputStream(blob))
                  val f = in.getFormat
                  (f.getSampleRate.toInt, f.getChannels,
                    math.max(1, f.getSampleSizeInBits / 8), f.isBigEndian,
                    in.readAllBytes(), in.getFrameLength)
              }
            val nSamples = bytes.length / bytesPerSample
            def ampAt(k: Int): Int =
              if (bytesPerSample == 2) {
                val lo = bytes(2 * k) & 0xff; val hi = bytes(2 * k + 1)
                val v = (hi << 8) | lo
                math.abs(if (bigEndian) ((bytes(2 * k) << 8) | (bytes(2 * k + 1) & 0xff)) else v)
              } else math.abs(bytes(k).toInt)
            def windowMeans(nw: Int): Array[Long] = {
              val stride = math.max(1, nSamples / nw)
              Array.tabulate(nw) { i =>
                var s = 0L; var n = 0
                var k = i * stride
                val end = math.min(nSamples.toLong, (i + 1L) * stride).toInt
                while (k < end) { s += ampAt(k); n += 1; k += 1 }
                if (n == 0) 0L else s / n
              }
            }
            val feats = windowMeans(featureDim).map(_.toFloat)
            val w64 = windowMeans(64)
            val mean = w64.sum / 64
            val ehash = w64.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
              if (v >= mean) acc | (1L << i) else acc
            }
            Row(r.getLong(0), rate, channels,
              frames, frames * 1000L / rate, feats, ehash)
          } catch {
            case _: Exception =>
              Row(r.getLong(0), null, null, null, null, null, null)
          }
        }
      }
    spark.createDataFrame(rdd, audioSchema)
  }

  /** Synthesize a real mono 16-bit 8 kHz WAV whose [[decodeAudio]]
    * `ehash` is EXACTLY a given 64-bit pattern: 64 windows × 125
    * samples, window i at constant amplitude 12000 iff bit i of `bits`
    * (window means are 0 or 12000; the global mean sits strictly
    * between for any pattern with 1..63 set bits, so thresholding
    * recovers the bits). The audio counterpart of
    * [[synthesizeBitmapPng]], for SQL-computable audio-dedup gates over
    * the REAL codec + fingerprint.
    */
  def synthesizeToneWav(patterns: DataFrame): DataFrame = {
    val spark = patterns.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType)))
    val rdd = patterns.select(col("media_id").cast("long"),
      col("bits").cast("long"))
      .repartition(spark.sparkContext.defaultParallelism)
      .rdd.mapPartitions { rows =>
        noDiskCache()
        rows.map { r =>
          val bits = r.getLong(1)
          val n = 64 * 125
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = if (((bits >> (i / 125)) & 1L) != 0) 12000 else 0
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          Row(r.getLong(0), bos.toByteArray)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Synthesize a real PNG whose aHash is EXACTLY a given 64-bit
    * pattern: 32×32 pixels of 8×8 blocks, block i white iff bit i of
    * `bits` (row-major, matching [[aHash]]'s grid order — block
    * averages are 0 or 255, the mean sits strictly between for any
    * pattern with 1..63 set bits, so thresholding recovers the bits).
    * Exists so image-dedup gates can round-trip REAL codec + hash with
    * SQL-computable expected pairs.
    */
  /** 32×32 image of 8×8 uniform 4×4 blocks, block i white iff bit i —
    * the exact-[[aHash]] bitmap behind the synth helpers. */
  private def bitmapOf(bits: Long): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        val i = (y / 4) * 8 + (x / 4)
        val v = if (((bits >> i) & 1L) != 0) 0xffffff else 0
        img.setRGB(x, y, v)
        x += 1
      }
      y += 1
    }
    img
  }

  def synthesizeBitmapPng(patterns: DataFrame): DataFrame = {
    val spark = patterns.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType)))
    val rdd = patterns.select(col("media_id").cast("long"),
      col("bits").cast("long"))
      .repartition(spark.sparkContext.defaultParallelism)
      .rdd.mapPartitions { rows =>
        noDiskCache()
        rows.map { r =>
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(bitmapOf(r.getLong(1)), "png", bos)
          Row(r.getLong(0), bos.toByteArray)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  val videoSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("frame_hashes", ArrayType(LongType))))

  /** REAL multi-frame decode over (media_id, blob) for containers the
    * JDK itself can iterate (animated GIF): frame count from the
    * reader, one [[aHash]] perceptual fingerprint PER FRAME — the
    * sequence signature video dedup keys on (keyframe banding via
    * `Dedup.videoNearDupPairs`, full-sequence refinement over the
    * array). [[sampleFrames]] composes on the real `n_frames`.
    * Containers with no JDK codec (mp4, webm…) fall back to NULL
    * format, same classify-don't-throw contract as [[decodeImage]].
    */
  def decodeVideo(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id").cast("long"), col("blob"))
      .rdd.mapPartitions { rows =>
        noDiskCache()
        rows.map { r =>
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("blob")))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) throw new IllegalArgumentException("no codec")
            val reader = readers.next()
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            val hashes = new Array[Long](n)
            var w = 0; var h = 0
            var i = 0
            while (i < n) {
              val frame = reader.read(i)
              if (i == 0) { w = frame.getWidth; h = frame.getHeight }
              hashes(i) = aHash(frame)
              i += 1
            }
            val fmt = reader.getFormatName.toLowerCase
            reader.dispose()
            Row(r.getLong(0), fmt, w, h, n, hashes)
          } catch {
            case _: Exception =>
              Row(r.getLong(0), null, null, null, null, null)
          }
        }
      }
    spark.createDataFrame(rdd, videoSchema)
  }

  /** Synthesize a real animated GIF per (media_id, frame_bits ARRAY) —
    * one exact-aHash block bitmap per frame through the JDK's own GIF
    * sequence writer. Each frame is written full-size (no GIF delta
    * compositing), so [[decodeVideo]] recovers every frame's pattern
    * bit-exactly (black/white survives the GIF palette) and gates can
    * compute the expected hash sequence in SQL.
    */
  def synthesizeAnimatedGif(patterns: DataFrame): DataFrame = {
    val spark = patterns.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType)))
    val rdd = patterns.select(col("media_id").cast("long"), col("frame_bits"))
      .repartition(spark.sparkContext.defaultParallelism)
      .rdd.mapPartitions { rows =>
        noDiskCache()
        rows.map { r =>
          val bits = r.getSeq[Long](1)
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("gif").next()
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          bits.foreach { b =>
            writer.writeToSequence(
              new javax.imageio.IIOImage(bitmapOf(b), null, null), null)
          }
          writer.endWriteSequence()
          writer.dispose()
          ios.close()
          Row(r.getLong(0), bos.toByteArray)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Synthesize a real PNG per row from (media_id, w, h): pixel (x,y) =
    * gray((x*7 + y*13 + media_id) % 256), encoded by the JDK PNG
    * writer. Exists so decode gates can round-trip a REAL codec with
    * SQL-computable expected metadata (the gate pins width/height; the
    * pixel-dependent hashes stay spec-tested).
    */
  def synthesizePng(dims: DataFrame): DataFrame = {
    val spark = dims.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("blob", BinaryType)))
    val rdd = dims.select(col("media_id").cast("long"),
      col("w").cast("int"), col("h").cast("int"))
      .repartition(spark.sparkContext.defaultParallelism)
      .rdd.mapPartitions { rows =>
        noDiskCache()
        rows.map { r =>
          val (id, w, h) = (r.getLong(0), r.getInt(1), r.getInt(2))
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = ((x * 7 + y * 13 + id) % 256).toInt
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Row(id, bos.toByteArray)
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
