package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §7.5): treat image/audio/video as
  * opaque BINARY payloads with typed metadata, and run decode /
  * feature-extract as *batched per-partition* transforms.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment): [[FakeDecoder]] derives deterministic pseudo-features
  * from the payload bytes. Everything Spark-side — schema, binary
  * column handling, partition-batched UDF shape, and the frame-sampling
  * explode — is real and tested. Swapping in a real decoder is a
  * one-function change inside `mapPartitions` (same batch shape a
  * Pandas-UDF / Arrow batch would have).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted (stub) features. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int)

  /** STUB decoder: deterministic pseudo-features from payload bytes.
    * A real implementation would decode the container here; the
    * surrounding batching/partitioning contract is identical.
    */
  object FakeDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val n = r.payload.length
      val b0 = if (n > 0) r.payload(0) & 0xff else 0
      val b1 = if (n > 1) r.payload(1) & 0xff else 0
      MediaFeatures(r.media_id, r.kind, n,
        width = 64 + (b0 % 16) * 32,
        height = 64 + (b1 % 9) * 32,
        n_frames = math.max(n / 16, 1))
    }
  }

  /** Wrap a documents table as a media table (text bytes standing in for
    * a real payload column).
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      (when(col("doc_id") % 2 === 0, "image").otherwise("audio")).as("kind"),
      col("text").cast("binary").as("payload"))

  /** Feature extraction: per-partition batched decode (the mapPartitions
    * shape keeps decoder init cost amortized per partition, exactly like
    * an Arrow-batched UDF at scale).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // decoder/session init would happen once per partition here
      it.map(FakeDecoder.decode)
    }
  }

  /** Frame sampling: one output row per sampled frame (every `stride`-th
    * of n_frames), with its byte offset — the explode shape of a video
    * pipeline, minus the real decoder.
    */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features
      .select(col("media_id"), col("kind"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .select(col("media_id"), col("kind"), col("frame_idx"),
        (col("frame_idx") * 16L).as("byte_offset"))
}
