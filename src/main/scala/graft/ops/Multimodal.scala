package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §7.5): treat image/audio/video as
  * opaque BINARY payloads with typed metadata, and run decode /
  * feature-extract as *batched per-partition* transforms.
  *
  * [[HeaderDecoder]] really parses the two containers that need no
  * codec library (BMP headers, WAV RIFF chunks); every other format is
  * STUBBED (no image/audio libraries in this environment) via
  * [[FakeDecoder]]'s deterministic pseudo-features. Everything
  * Spark-side — schema, binary column handling, partition-batched UDF
  * shape, and the frame-sampling explode — is real and tested. Swapping
  * in a full decoder is a one-function change inside `mapPartitions`
  * (same batch shape a Pandas-UDF / Arrow batch would have).
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

  /** Real container parsers for the two formats whose headers need no
    * codec library — proof that the decode seam carries genuine binary
    * containers, not just the stub:
    *
    *  - BMP (`BM` magic, BITMAPINFOHEADER): width/height are the
    *    little-endian int32s at offsets 18/22 (height may be negative
    *    for top-down rows); a still image is 1 frame.
    *  - PNG (8-byte signature): the IHDR chunk is REQUIRED to be first,
    *    so width/height are the big-endian int32s at offsets 16/20; a
    *    still image is 1 frame.
    *  - WAV (`RIFF…WAVE`): the `fmt ` chunk carries channels /
    *    sample-rate / block-align; `data`'s size over block-align is the
    *    sample-frame count. Mapped into [[MediaFeatures]] as
    *    width = sample rate, height = channels (documented overload —
    *    the schema stays one struct for all modalities).
    *
    * Anything else falls back to [[FakeDecoder]] (disclosed stub: real
    * image/audio codecs are absent in this environment).
    */
  object HeaderDecoder {
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    private val PngSig = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

    def decode(r: MediaRow): MediaFeatures = {
      val p = r.payload
      if (p.length >= 26 && p(0) == 'B' && p(1) == 'M')
        MediaFeatures(r.media_id, "image", p.length,
          width = le32(p, 18), height = math.abs(le32(p, 22)), n_frames = 1)
      else if (p.length >= 24 &&
          PngSig.indices.forall(i => (p(i) & 0xff) == PngSig(i)) &&
          tag(p, 12) == "IHDR")
        MediaFeatures(r.media_id, "image", p.length,
          width = be32(p, 16), height = be32(p, 20), n_frames = 1)
      else if (p.length >= 44 && tag(p, 0) == "RIFF" && tag(p, 8) == "WAVE") {
        var (o, rate, channels, blockAlign, dataSize) = (12, 0, 0, 1, 0)
        var malformed = false
        while (!malformed && o + 8 <= p.length) {
          val (id, sz) = (tag(p, o), le32(p, o + 4))
          // le32 is signed and attacker-controlled: a negative or
          // overflowing size must stop the walk, not spin it (sz = -8
          // would advance by zero) or read out of bounds
          if (sz < 0) malformed = true
          else {
            if (id == "fmt " && o + 24 <= p.length) {
              channels = le16(p, o + 10)
              rate = le32(p, o + 12)
              blockAlign = math.max(1, le16(p, o + 20))
            } else if (id == "data") dataSize = sz
            val step = 8L + sz.toLong + (sz & 1) // chunks word-aligned
            o = math.min(o.toLong + step, p.length.toLong).toInt
          }
        }
        MediaFeatures(r.media_id, "audio", p.length,
          width = rate, height = channels,
          n_frames = math.max(dataSize / blockAlign, 1))
      } else FakeDecoder.decode(r)
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
  def extractFeatures(media: DataFrame,
      decoder: MediaRow => MediaFeatures =
        HeaderDecoder.decode): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // decoder/session init would happen once per partition here
      it.map(decoder)
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
