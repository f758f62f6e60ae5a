package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder prompt): image/audio/video as opaque
  * `binary` columns with typed metadata, decode/feature-extract as
  * partition-streaming typed transforms.
  *
  * The Spark-side mechanics are real and tested — schema, partition
  * behavior, typed `mapPartitions` signature, deterministic output. The
  * *decoder* itself is a clearly marked STUB (no imaging/audio libraries in
  * this environment): it derives features from an md5 digest of the payload
  * bytes, which keeps the pipeline deterministic and lets DuckDB verify the
  * full plumbing end-to-end (q46).
  *
  * Scale design: `mapPartitions` processes each partition as one iterator —
  * a real decoder amortizes model/codec init per partition (exactly where
  * an image decoder or ONNX session would be opened once), and the
  * transform is a narrow map: no shuffle, runs at scan parallelism.
  */
object Multimodal {

  case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)
  case class MediaFeatures(media_id: Long, media_type: String, n_bytes: Int,
                           features: Array[Double])

  val FeatureDim = 8

  /** Synthesize a media table from `documents`: payload = UTF-8 text bytes
    * standing in for encoded image/audio data, metadata derived
    * deterministically.
    */
  def synthesizeFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 640).cast(IntegerType).as("width"),
      (col("n_chars") % 480).cast(IntegerType).as("height"),
      when(col("doc_id") % 2 === 0, 0).otherwise(16000).cast(IntegerType).as("sample_rate"))

  /** STUB DECODER. A production build replaces the body below with a real
    * codec (e.g. javax.imageio / ffmpeg bindings / an ONNX feature
    * extractor) opened once per partition; none are available in this
    * container. The deterministic fake hashes the payload and scales digest
    * bytes into [0,1] — enough to exercise schema, batching, and
    * distribution exactly as the real thing would.
    */
  private def stubDecode(payload: Array[Byte], md: MessageDigest): Array[Double] = {
    val digest = md.digest(payload)
    Array.tabulate(FeatureDim)(i => (digest(i) & 0xff) / 255.0)
  }

  /** Decode/feature-extract each media row: one digest/codec instance per
    * partition, streamed row-at-a-time (no materialization of the
    * iterator).
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5") // per-partition init
      rows.map { r =>
        MediaFeatures(r.media_id, r.media_type, r.payload.length,
          stubDecode(r.payload, md))
      }
    }
  }

  /** STUB resize: a real implementation decodes, scales, and re-encodes
    * (codec opened once per partition, exactly like [[decodeFeatures]]);
    * the fake shrinks the payload proportionally to the area ratio and
    * rewrites the typed metadata — preserving the
    * payload-plus-metadata contract a downstream training pipeline reads.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here
      rows.map { r =>
        val ratio = (targetW.toLong * targetH).toDouble /
          math.max(r.width.toLong * r.height, 1L).toDouble
        val nBytes = math.max(1,
          math.min(r.payload.length, math.ceil(r.payload.length * ratio).toInt))
        r.copy(payload = r.payload.take(nBytes), width = targetW, height = targetH)
      }
    }
  }

  /** STUB frame sampler for video payloads: a real implementation seeks
    * keyframes; the fake slices the payload into `n` evenly spaced chunks
    * (preserving the (media_id, frame_no, frame_bytes) contract).
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val step = math.max(r.payload.length / math.max(n, 1), 1)
      (0 until math.min(n, r.payload.length)).map { f =>
        (r.media_id, f, r.payload.slice(f * step, math.min(f * step + step, r.payload.length)))
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }
}
