package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extraction as a partition-batched pass.
  *
  * The Spark-side shape is the real deliverable — schema (binary payload +
  * struct metadata), partition-level batching, and a typed feature output —
  * while the actual media decode is STUBBED (no image/audio codecs in this
  * container): `decodeStub` derives deterministic fake pixels from the
  * payload bytes. Swapping in a real decoder (JNI / javacv) changes only
  * that one function; the pipeline, schema, and batch shape stay.
  */
object MultimodalOps {

  case class Payload(doc_id: Long, payload: Array[Byte], width: Int, height: Int)
  case class Features(doc_id: Long, n_bytes: Long, mean_byte: Double,
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
        (lit(1) + pmod(col("n_chars"), lit(64))).cast("int").as("width"),
        (lit(1) + pmod(col("n_chars"), lit(48))).cast("int").as("height"),
        lit(3).as("channels"),
        lit("fake/rgb8").as("format")).as("meta"))
  }

  /** STUB decoder: stands in for e.g. JPEG decode. Deterministic: "pixels"
    * are the payload bytes themselves. A real implementation would return
    * width*height*channels decoded samples. */
  private def decodeStub(payload: Array[Byte], width: Int, height: Int): Array[Byte] =
    payload // ??? <- real codec goes here; stub keeps bytes as "pixels"

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

  /** Feature extraction as a partition-batched pass: one iterator per
    * partition (the mapInPandas batch shape, Scala-side), no per-row JVM
    * round trips, constant memory per partition. */
  def extractFeatures(payloads: Dataset[Payload]): Dataset[Features] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions { it =>
      it.map { p =>
        val px = decodeStub(p.payload, p.width, p.height)
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
