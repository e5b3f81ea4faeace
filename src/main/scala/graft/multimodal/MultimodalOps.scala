package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extraction as a partition-batched pass.
  *
  * The image path is REAL end to end: `pngPayloadTable` encodes a
  * deterministic synthetic raster per document as an actual PNG
  * (javax.imageio — JDK-native, no external codec), `decodePng` decodes
  * it back on the executors, and the feature histogram is computed over
  * the decoded pixels. Because PNG is lossless and the planted raster is
  * a closed-form integer rule, the DuckDB oracle replays the expected
  * pixel statistics WITHOUT a decoder — any decode defect breaks the
  * hash match. The frame-sampling and resize ops run on raw payload
  * bytes (byte-level ops need no codec) with the same exact-replay
  * oracles.
  */
object MultimodalOps {

  // in-memory codec streams: the default ImageIO disk cache creates and
  // deletes one /tmp file PER IMAGE, which would dominate the decode hot
  // path extractFeatures is benchmarking (object init runs once per JVM,
  // including executors)
  javax.imageio.ImageIO.setUseCache(false)

  case class Payload(doc_id: Long, payload: Array[Byte], width: Int, height: Int)

  /** The shared dims rule (1 + n_chars mod 64/48): one definition for the
    * byte-payload metadata, the PNG fixture, and (unavoidably copied) the
    * oracle SQL. */
  private def widthCol = (lit(1) + pmod(col("n_chars"), lit(64))).cast("int")
  private def heightCol = (lit(1) + pmod(col("n_chars"), lit(48))).cast("int")
  case class Features(doc_id: Long, n_px: Long, mean_px: Double,
                      histogram: Array[Double])

  /** Build a multimodal table from `documents`: payload = UTF-8 bytes of
    * the text standing in for encoded media; metadata derived
    * deterministically so oracles can recompute it. */
  def payloadTable(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.table(spark, dir, "documents")
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        widthCol.as("width"),
        heightCol.as("height"),
        lit(3).as("channels"),
        lit("fake/rgb8").as("format")).as("meta"))
  }

  /** The planted raster: a closed-form integer rule so the oracle can
    * recompute every pixel without decoding. */
  def plantedPixel(docId: Long, y: Int, x: Int): Int =
    (((docId % 256) * 31 + y * 7 + x * 13) % 256).toInt

  /** Encode a raster as a REAL 8-bit grayscale PNG (lossless). */
  def encodePng(width: Int, height: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, pix(y, x)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode a PNG payload to (width, height, row-major gray samples). */
  def decodePng(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val px = new Array[Int](w * h)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(i) = raster.getSample(x, y, 0); i += 1; x += 1 }
      y += 1
    }
    (w, h, px)
  }

  /** Image payload table: one deterministic synthetic PNG per document,
    * dimensions derived from n_chars exactly like `payloadTable`. The
    * encode runs partition-batched on the executors and is WRITTEN ONCE
    * per JVM per sf dir as a parquet fixture (the ingest-side shape: at
    * 100 TB real media arrives already encoded, so queries should time
    * the scan + decode, not synthetic fixture generation). */
  private val pngDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def pngPayloadTable(spark: SparkSession, dir: String): Dataset[Payload] = {
    import spark.implicits._
    val fixture = pngDirs.computeIfAbsent(dir, { _ =>
      val out = graft.TempDirs.create("graft_png")
      graft.Tables.table(spark, dir, "documents")
        .select(col("doc_id"), widthCol.as("w"), heightCol.as("h"))
        .as[(Long, Int, Int)]
        .mapPartitions { it =>
          it.map { case (id, w, h) =>
            Payload(id, encodePng(w, h, (y, x) => plantedPixel(id, y, x)), w, h)
          }
        }
        .write.mode("overwrite").parquet(out)
      out
    })
    spark.read.parquet(fixture).as[Payload]
  }

  case class AudioPayload(doc_id: Long, payload: Array[Byte])
  case class AudioFeatures(doc_id: Long, n_samples: Long, sum_samples: Long,
                           max_abs: Long, zero_cross: Long)

  /** The planted waveform: a closed-form integer rule (range ±2000 at
    * 16-bit depth) so the oracle recomputes every sample without a
    * decoder — the audio twin of `plantedPixel`. */
  def plantedSample(docId: Long, i: Int): Int =
    (((docId * 131 + i * 17) % 4001) - 2000).toInt

  def plantedSampleCount(nChars: Long): Int = (160 + nChars % 128).toInt

  private val WavFormat = new javax.sound.sampled.AudioFormat(
    /* sampleRate = */ 8000f, /* bits = */ 16, /* channels = */ 1,
    /* signed = */ true, /* bigEndian = */ false)

  /** Encode 16-bit PCM samples as a REAL mono WAV (javax.sound.sampled —
    * JDK-native, no external codec). */
  def encodeWav(samples: Array[Int]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), WavFormat, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV payload back to its 16-bit samples via the real parser
    * (header, chunk layout, format negotiation — not a byte slice). */
  def decodeWav(payload: Array[Byte]): Array[Int] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val f = ais.getFormat
    require(f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
      s"unexpected WAV format: $f")
    val pcm = ais.readAllBytes()
    val out = new Array[Int](pcm.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((pcm(2 * i) & 0xFF) | (pcm(2 * i + 1) << 8)).toShort.toInt
      i += 1
    }
    out
  }

  /** Audio payload table: one deterministic synthetic WAV per document,
    * written once per JVM per sf dir (same ingest-side shape as
    * `pngPayloadTable`). */
  private val wavDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def wavPayloadTable(spark: SparkSession, dir: String): Dataset[AudioPayload] = {
    import spark.implicits._
    val fixture = wavDirs.computeIfAbsent(dir, { _ =>
      val out = graft.TempDirs.create("graft_wav")
      graft.Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .mapPartitions { it =>
          it.map { case (id, nc) =>
            val n = plantedSampleCount(nc)
            AudioPayload(id, encodeWav(Array.tabulate(n)(plantedSample(id, _))))
          }
        }
        .write.mode("overwrite").parquet(out)
      out
    })
    spark.read.parquet(fixture).as[AudioPayload]
  }

  /** Waveform features over the DECODED samples: count, sum, peak, and
    * zero crossings (sign boundary at >= 0) — all integer, so the oracle
    * replays them from the closed-form waveform and any codec defect
    * breaks the hash match. Partition-batched like extractFeatures. */
  def extractAudioFeatures(payloads: Dataset[AudioPayload]): Dataset[AudioFeatures] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions { it =>
      it.map { p =>
        val xs = decodeWav(p.payload)
        var sum = 0L
        var maxAbs = 0L
        var zc = 0L
        var i = 0
        while (i < xs.length) {
          sum += xs(i)
          if (math.abs(xs(i)) > maxAbs) maxAbs = math.abs(xs(i))
          if (i > 0 && (xs(i) >= 0) != (xs(i - 1) >= 0)) zc += 1
          i += 1
        }
        AudioFeatures(p.doc_id, xs.length.toLong, sum, maxAbs, zc)
      }
    }
  }

  case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Long, byte_sum: Long)

  /** Frame sampling over an opaque media payload — the video-shaped
    * multimodal op: the payload is cut into fixed-size frames and every
    * k-th frame is emitted with its exact byte statistics. The frame
    * "decode" is the same honest stub as extractFeatures (bytes stand in
    * for decoded samples); the sampling/slicing plumbing — explode shape,
    * per-frame bounds, tail frame shorter than frameSize — is real and
    * oracle-checked. */
  def sampleFrames(payloads: Dataset[Payload], frameSize: Int, every: Int): Dataset[Frame] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.flatMap { p =>
      val n = p.payload.length
      val nFrames = (n + frameSize - 1) / frameSize
      (0 until nFrames by every).iterator.map { f =>
        val from = f * frameSize
        val until = math.min(from + frameSize, n)
        var s = 0L
        var i = from
        while (i < until) { s += p.payload(i) & 0xFF; i += 1 }
        Frame(p.doc_id, f, until - from, s)
      }
    }
  }

  case class Resized(doc_id: Long, out_w: Int, out_h: Int, px_sum: Long, px_mean: Double)

  /** Nearest-neighbor resize — the image-shaped multimodal op: the
    * payload bytes are read as a row-major width x height "pixel" grid
    * (stub rule: pixel(y, x) = payload[(y·width + x) mod len], standing
    * in for a real decoded raster) and downsampled to outW x outH by
    * source-index truncation. Integer arithmetic end to end, so the
    * oracle replays it exactly on the text bytes. */
  def resize(payloads: Dataset[Payload], outW: Int, outH: Int): Dataset[Resized] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions { it =>
      it.filter(_.payload.nonEmpty).map { p =>
        val n = p.payload.length
        var sum = 0L
        var i = 0
        while (i < outW * outH) {
          val y = i / outW; val x = i % outW
          val sy = y * p.height / outH
          val sx = x * p.width / outW
          sum += p.payload((sy * p.width + sx) % n) & 0xFF
          i += 1
        }
        Resized(p.doc_id, outW, outH, sum, sum.toDouble / (outW * outH))
      }
    }
  }

  case class VideoFrame(doc_id: Long, frame_idx: Int, payload: Array[Byte],
                        width: Int, height: Int)
  case class FramePixels(doc_id: Long, frame_idx: Int, px: Array[Int])

  /** Video plant: 12 frames per doc; per-doc shot length in {2,3,4}; each
    * shot shifts the planted raster's base by 97 (mod 256), so frames
    * WITHIN a shot are pixel-identical and consecutive shots differ at
    * every pixel (per-pixel |delta| is 97 or 159 — far above any noise
    * threshold). Closed-form, so the oracle replays expected pixel sums
    * without a decoder. */
  val VideoFrames = 12
  def videoShotLen(docId: Long): Int = (2 + docId % 3).toInt
  def videoBase(docId: Long, f: Int): Int =
    (((docId % 256) * 31 + (f / videoShotLen(docId)) * 97) % 256).toInt

  /** Video payload table: VideoFrames real PNGs per doc (small rasters —
    * the keyframe-detection shape), written once per JVM per sf dir. */
  private val vidDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def videoPayloadTable(spark: SparkSession, dir: String): Dataset[VideoFrame] = {
    import spark.implicits._
    val fixture = vidDirs.computeIfAbsent(dir, { _ =>
      val out = graft.TempDirs.create("graft_vid")
      graft.Tables.table(spark, dir, "documents")
        .select(col("doc_id"),
          (lit(1) + pmod(col("n_chars"), lit(16))).cast("int").as("w"),
          (lit(1) + pmod(col("n_chars"), lit(12))).cast("int").as("h"))
        .as[(Long, Int, Int)]
        .flatMap { case (id, w, h) =>
          (0 until VideoFrames).iterator.map { f =>
            val base = videoBase(id, f)
            VideoFrame(id, f,
              encodePng(w, h, (y, x) => (base + y * 7 + x * 13) % 256), w, h)
          }
        }
        .write.mode("overwrite").parquet(out)
      out
    })
    spark.read.parquet(fixture).as[VideoFrame]
  }

  /** Decode every frame through the REAL PNG codec to its pixel array —
    * the narrow partition-batched pass feeding shot-boundary detection. */
  def decodeFramePixels(frames: Dataset[VideoFrame]): Dataset[FramePixels] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.mapPartitions { it =>
      it.map { fr =>
        val (_, _, px) = decodePng(fr.payload)
        FramePixels(fr.doc_id, fr.frame_idx, px)
      }
    }
  }

  case class PHash(doc_id: Long, phash: Long)

  /** Perceptual dHash over the DECODED raster: nearest-neighbor resize
    * to 9x8 (the same source-index-truncation mapping as `resize`),
    * then bit (r*8+c) set iff the pixel right of (r,c) is brighter —
    * the gradient fingerprint image-dedup pipelines key on. Runs
    * through the REAL PNG codec (any decode defect changes the hash,
    * which the oracle's closed-form raster replay would catch). One
    * narrow partition-batched pass; the hash is 8 bytes per image, so
    * downstream pair-finding shuffles hashes, never pixels. */
  def dHashes(payloads: Dataset[Payload]): Dataset[PHash] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions { it =>
      it.map { p =>
        val (w, h, px) = decodePng(p.payload)
        var v = 0L
        var r = 0
        while (r < 8) {
          val sy = r * h / 8
          var c = 0
          while (c < 8) {
            val left = px(sy * w + c * w / 9)
            val right = px(sy * w + (c + 1) * w / 9)
            if (right > left) v |= 1L << (r * 8 + c)
            c += 1
          }
          r += 1
        }
        PHash(p.doc_id, v)
      }
    }
  }

  /** Feature extraction as a partition-batched pass: one iterator per
    * partition (the mapInPandas batch shape, Scala-side), no per-row JVM
    * round trips, constant memory per partition. The decode is the REAL
    * PNG codec — histogram and mean run over decoded samples, so the
    * oracle's planted-raster replay verifies the decoder itself. */
  def extractFeatures(payloads: Dataset[Payload]): Dataset[Features] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions { it =>
      it.map { p =>
        val (_, _, px) = decodePng(p.payload)
        val hist = new Array[Double](8)
        var sum = 0L
        var i = 0
        while (i < px.length) {
          val b = px(i) & 0xFF
          hist(b >>> 5) += 1.0
          sum += b
          i += 1
        }
        val n = math.max(px.length, 1)
        Features(p.doc_id, px.length.toLong, sum.toDouble / n, hist.map(_ / n))
      }
    }
  }
}
