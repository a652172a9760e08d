package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §7.5): treat image/audio/video as
  * opaque BINARY payloads with typed metadata, and run decode /
  * feature-extract as *batched per-partition* transforms.
  *
  * Decode tiers, most-portable first: [[HeaderDecoder]] parses
  * container headers that need no codec (BMP/PNG/GIF/JPEG dims, WAV
  * RIFF chunks); [[PnmDecoder]] decodes full PNM rasters byte-exactly
  * (engine-portable — the DuckDB-oracle pixel queries use it);
  * [[ImageIoDecoder]] decodes JPEG/PNG/GIF/BMP pixels via the JDK's
  * own javax.imageio (r7 — no external library, JVM-deterministic,
  * spec-pinned against raster stats rather than the cross-engine
  * oracle); [[PcmDecoder]] decodes WAV PCM samples. Only exotic
  * codecs (video frames, compressed audio) remain stubbed via
  * [[FakeDecoder]]'s deterministic pseudo-features. Everything
  * Spark-side — schema, binary column handling, partition-batched UDF
  * shape, and the frame-sampling explode — is real and tested.
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
    *  - GIF (`GIF87a`/`GIF89a` magic): width/height are the
    *    little-endian uint16s of the logical screen descriptor at
    *    offsets 6/8; frame count is the number of image descriptors
    *    (0x2C introducer) found by walking the block structure — for
    *    animated GIFs that is the animation frame count.
    *  - JPEG (`FF D8` SOI): scan the marker stream for a start-of-frame
    *    segment (SOF0–SOF15, excluding DHT/JPG/DAC C4/C8/CC);
    *    height/width are the big-endian uint16s at SOF payload offsets
    *    3/5; a still image is 1 frame.
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
      else if (p.length >= 13 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
          p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a') {
        // logical screen descriptor, then a bounded block walk counting
        // image descriptors (= animation frames). Every size field is
        // attacker-controlled: all advances are strictly positive and
        // bounds-checked, malformed input stops the walk with the frames
        // counted so far (floor 1).
        var o = 13
        if ((p(10) & 0x80) != 0) o += 3 * (1 << ((p(10) & 7) + 1)) // global palette
        var frames = 0
        var done = false
        def skipSubBlocks(): Unit = {
          var n = if (o < p.length) p(o) & 0xff else 0
          o += 1
          while (n != 0 && o < p.length) {
            o += n
            n = if (o < p.length) p(o) & 0xff else 0
            o += 1
          }
        }
        while (!done && o < p.length) {
          (p(o) & 0xff) match {
            case 0x2c => // image descriptor
              frames += 1
              if (o + 10 <= p.length) {
                val flags = p(o + 9) & 0xff
                o += 10
                if ((flags & 0x80) != 0) o += 3 * (1 << ((flags & 7) + 1))
                o += 1 // LZW min code size
                skipSubBlocks()
              } else done = true
            case 0x21 => // extension: label byte + sub-blocks
              o += 2
              skipSubBlocks()
            case 0x3b => done = true // trailer
            case _ => done = true // malformed
          }
        }
        MediaFeatures(r.media_id, "image", p.length,
          width = le16(p, 6), height = le16(p, 8),
          n_frames = math.max(frames, 1))
      } else if (p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) {
        // JPEG: walk the marker stream to the first start-of-frame
        // segment (SOF0-SOF15 minus DHT/JPG/DAC). Segment lengths are
        // attacker-controlled: a length < 2 would walk backwards, so it
        // stops the scan instead.
        var o = 2
        var res: MediaFeatures = null
        var done = false
        while (!done && o + 3 < p.length) {
          if ((p(o) & 0xff) != 0xff) done = true // lost sync: malformed
          else {
            var m = o + 1
            while (m < p.length && (p(m) & 0xff) == 0xff) m += 1 // fill bytes
            // need marker + BOTH length bytes in bounds: a run of 0xff
            // fill bytes can leave m == p.length - 2, where reading
            // p(m + 2) below would throw on attacker-controlled input
            if (m + 2 >= p.length) done = true
            else {
              val marker = p(m) & 0xff
              if (marker == 0xd9 || marker == 0xda) done = true // EOI / SOS
              else if (marker >= 0xd0 && marker <= 0xd8) o = m + 1 // bare marker
              else {
                val len = ((p(m + 1) & 0xff) << 8) | (p(m + 2) & 0xff)
                val sof = marker >= 0xc0 && marker <= 0xcf &&
                  marker != 0xc4 && marker != 0xc8 && marker != 0xcc
                if (sof && m + 7 < p.length) {
                  res = MediaFeatures(r.media_id, "image", p.length,
                    width = ((p(m + 6) & 0xff) << 8) | (p(m + 7) & 0xff),
                    height = ((p(m + 4) & 0xff) << 8) | (p(m + 5) & 0xff),
                    n_frames = 1)
                  done = true
                } else if (len < 2) done = true
                else o = m + 1 + len
              }
            }
          }
        }
        if (res != null) res else FakeDecoder.decode(r)
      } else if (p.length >= 44 && tag(p, 0) == "RIFF" && tag(p, 8) == "WAVE") {
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

  /** Full-PIXEL features from a decoded raster: mean luma plus a
    * `side`×`side` box-downsampled luma thumbnail (the "resize" step of
    * an image pipeline, as area averaging). */
  case class PixelFeatures(media_id: Long, width: Int, height: Int,
      channels: Int, maxval: Int, mean_luma: Double, thumb: Array[Double])

  /** REAL full-pixel decoder for binary PNM rasters — P5 (grayscale
    * PGM) and P6 (RGB PPM), the codec-free raster formats — so the
    * decode seam carries genuine pixel data end-to-end, not only
    * container headers: header tokens with `#` comments, 1- or 2-byte
    * big-endian samples, luma = (299·R + 587·G + 114·B)/1000 (integer
    * BT.601 weights — engine-portable, no float codec variance).
    * Returns None for anything that is not a well-formed binary PNM
    * (callers fall back to [[HeaderDecoder]] / [[FakeDecoder]]).
    */
  object PnmDecoder {
    def decode(r: MediaRow, side: Int = 4): Option[PixelFeatures] = {
      val p = r.payload
      if (p.length < 2 || p(0) != 'P'.toByte ||
          (p(1) != '5'.toByte && p(1) != '6'.toByte)) return None
      val channels = if (p(1) == '6'.toByte) 3 else 1
      var o = 2
      def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
      // header token reader: skips whitespace and '#'-to-EOL comments
      def nextInt(): Option[Int] = {
        while (o < p.length && (isWs(p(o)) || p(o) == '#'.toByte)) {
          if (p(o) == '#'.toByte)
            while (o < p.length && p(o) != '\n'.toByte) o += 1
          else o += 1
        }
        val s = o
        while (o < p.length && p(o) >= '0'.toByte && p(o) <= '9'.toByte)
          o += 1
        if (o == s || o - s > 9) None
        else {
          var v = 0
          var i = s
          while (i < o) { v = v * 10 + (p(i) - '0'); i += 1 }
          Some(v)
        }
      }
      val hdr = for {
        w <- nextInt(); h <- nextInt(); mx <- nextInt()
        if w > 0 && h > 0 && mx > 0 && mx < 65536
        // exactly ONE whitespace byte separates maxval from raster
        if o < p.length && isWs(p(o))
      } yield (w, h, mx)
      hdr match {
        case None => None
        case Some((w, h, mx)) =>
          o += 1
          val bytesPer = if (mx > 255) 2 else 1
          val need = w.toLong * h * channels * bytesPer
          if (need > Int.MaxValue || p.length - o < need) return None
          def sampleAt(off: Int): Int =
            if (bytesPer == 1) p(off) & 0xff
            else ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)
          def lumaAt(x: Int, y: Int): Long = {
            val base = o + ((y.toLong * w + x) * channels * bytesPer).toInt
            if (channels == 1) sampleAt(base).toLong
            else (299L * sampleAt(base) +
              587L * sampleAt(base + bytesPer) +
              114L * sampleAt(base + 2 * bytesPer)) / 1000L
          }
          var total = 0L
          val t = math.min(side, math.min(w, h))
          val cells = Array.ofDim[Long](t * t)
          val counts = Array.ofDim[Long](t * t)
          var y = 0
          while (y < h) {
            val cy = math.min((y.toLong * t / h).toInt, t - 1)
            var x = 0
            while (x < w) {
              val l = lumaAt(x, y)
              total += l
              val cx = math.min((x.toLong * t / w).toInt, t - 1)
              cells(cy * t + cx) += l
              counts(cy * t + cx) += 1L
              x += 1
            }
            y += 1
          }
          Some(PixelFeatures(r.media_id, w, h, channels, mx,
            total.toDouble / (w.toLong * h),
            cells.zip(counts).map { case (s, n) => s.toDouble / n }))
      }
    }
  }

  /** Codec-image decoder via the JDK's own ImageIO (javax.imageio —
    * JPEG/PNG/GIF/BMP readers ship with every JVM, headless-safe, no
    * external library): decodes the payload to sRGB and folds the SAME
    * luma/thumbnail statistics as [[PnmDecoder]] (integer BT.601
    * weights over 8-bit samples), so [[imageNearDups]] works on real
    * JPEG/PNG corpora, not only PNM.
    *
    * Determinism note: ImageIO's JPEG IDCT is deterministic within a
    * JVM (and across runs of one corpus), which is what the mining
    * pipeline needs; it is NOT engine-portable bit-for-bit, so the
    * DuckDB-oracle m-family queries stay on the header/PNM paths and
    * the ImageIO path is pinned by spec parity against raster stats
    * instead. Anything unreadable returns None (corrupt payloads must
    * quarantine out of a 100 TB decode pass, never fail the task).
    */
  object ImageIoDecoder {
    def decode(r: MediaRow, side: Int = 4): Option[PixelFeatures] = {
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val channels =
            if (img.getColorModel.getNumColorComponents >= 3) 3 else 1
          val t = math.min(side, math.min(w, h))
          val cells = Array.ofDim[Long](t * t)
          val counts = Array.ofDim[Long](t * t)
          var total = 0L
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            val cy = math.min((y.toLong * t / h).toInt, t - 1)
            var x = 0
            while (x < w) {
              val rgb = row(x)
              val l = (299L * ((rgb >> 16) & 0xff) +
                587L * ((rgb >> 8) & 0xff) +
                114L * (rgb & 0xff)) / 1000L
              total += l
              val cx = math.min((x.toLong * t / w).toInt, t - 1)
              cells(cy * t + cx) += l
              counts(cy * t + cx) += 1L
              x += 1
            }
            y += 1
          }
          Some(PixelFeatures(r.media_id, w, h, channels, 255,
            total.toDouble / (w.toLong * h),
            cells.zip(counts).map { case (s, n) => s.toDouble / n }))
        }
      } catch { case _: Throwable => None }
    }
  }

  /** Per-partition batched full-pixel feature extraction — the same
    * mapPartitions batch shape as [[extractFeatures]], with genuinely
    * decoded pixels. PNM payloads take the byte-exact engine-portable
    * [[PnmDecoder]]; JPEG/PNG/GIF/BMP fall through to
    * [[ImageIoDecoder]] (JDK codecs). Rows neither can read are
    * dropped (use [[extractFeatures]] for header-level metadata).
    */
  def extractPixelFeatures(media: DataFrame,
      side: Int = 4): Dataset[PixelFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap(r => PnmDecoder.decode(r, side)
        .orElse(ImageIoDecoder.decode(r, side)))
    }
  }

  /** Perceptual average-hash (aHash) of a square luma thumbnail: bit i
    * set iff cell i is brighter than the thumbnail's mean. Robust to
    * re-encoding, mild noise, and (by construction, via the box-average
    * thumbnail) resizing — the standard cheap image-similarity
    * fingerprint. At most 64 cells (side ≤ 8).
    */
  def aHash(thumb: Array[Double]): Long = {
    require(thumb.nonEmpty && thumb.length <= 64,
      s"aHash takes 1..64 thumbnail cells, got ${thumb.length}")
    var mean = 0.0
    var i = 0
    while (i < thumb.length) { mean += thumb(i); i += 1 }
    mean /= thumb.length
    var h = 0L
    i = 0
    while (i < thumb.length) {
      if (thumb(i) > mean) h |= 1L << i
      i += 1
    }
    h
  }

  /** Near-duplicate image mining over PNM payloads — the multimodal
    * twin of the text near-dup family: decode pixels, 8×8 box-average
    * luma thumbnail, 64-bit [[aHash]], then pairs within `maxHamming`
    * bits. Candidate generation is pigeonhole banding (Manku, Jaiswal,
    * Sarma WWW'07, as in the simhash miner): the 64 bits split into
    * `maxHamming + 1` bands, so any pair within the radius agrees
    * exactly on ≥ 1 band — an equi-join per band, never all-pairs —
    * and candidates verify on the true Hamming distance
    * (`bit_count(xor)`, codegen'd). Emits (a, b, hamming) with a < b.
    *
    * Scale: hashing is a narrow mapPartitions decode; each band join
    * shuffles 16 bytes/row; near-identical corpora skew a band key
    * exactly like simhash's miner — the same salting applies if needed.
    */
  def imageNearDups(media: DataFrame, maxHamming: Int = 2): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 8,
      s"maxHamming must be in [0, 8), got $maxHamming")
    val spark = media.sparkSession
    import spark.implicits._
    val nBands = maxHamming + 1
    val width = 64 / nBands
    val hashes = extractPixelFeatures(media, side = 8)
      .map(p => (p.media_id, aHash(p.thumb)))
      .toDF("media_id", "ahash")
    val banded = hashes.select(col("media_id"), col("ahash"),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("ahash"), b * width)
            .bitwiseAND(lit((1L << width) - 1)).as("key"))
      }: _*)).as("bk"))
      .select(col("media_id"), col("ahash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("a"), col("y.media_id").as("b"),
        bit_count(col("x.ahash").bitwiseXOR(col("y.ahash"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Decoded-PCM audio features: the audio twin of the full-pixel path —
    * real samples, not just container metadata. `rms` is rounded to 4 dp
    * (sum of squared 16-bit samples stays far under 2⁵³, so the double
    * accumulation is order-exact and engine-portable).
    */
  case class AudioFeatures(media_id: Long, n_samples: Long,
      sample_rate: Long, channels: Long, peak: Long, rms: Double,
      duration_ms: Long)

  /** REAL PCM decoder for 16-bit little-endian WAV payloads — the one
    * audio format needing no codec library, so the audio decode seam
    * carries genuine samples end-to-end: RIFF chunk walk (same
    * bounds/overflow discipline as [[HeaderDecoder]]'s WAV branch) to
    * the `fmt `/`data` chunks, then every sample is read and folded
    * into peak / RMS energy — the loudness features an audio curation
    * pipeline filters on (silence/clipping detection). Returns None for
    * anything that is not PCM 16-bit WAV with an in-bounds data chunk.
    */
  object PcmDecoder {
    /** The RIFF chunk walk underlying every audio feature:
      * (sample rate, channels, data chunk offset, total sample count).
      * Rejects (None) non-PCM codecs, non-16-bit widths, and
      * truncated/overrunning data chunks — same hardening as before
      * the r13 split. No sample is decoded here, so consumers choose
      * their own per-row work bound. */
    private def header(r: MediaRow): Option[(Int, Int, Int, Int)] = {
      val p = r.payload
      if (p.length < 44 || tag(p, 0) != "RIFF" || tag(p, 8) != "WAVE")
        return None
      var o = 12
      var (rate, channels, bits) = (0, 0, 0)
      var (dataOff, dataSize) = (-1, 0)
      var malformed = false
      while (!malformed && o + 8 <= p.length) {
        val (id, sz) = (tag(p, o), le32(p, o + 4))
        if (sz < 0) malformed = true
        else {
          if (id == "fmt " && o + 24 <= p.length) {
            val codec = le16(p, o + 8)
            if (codec != 1) malformed = true // PCM only
            channels = le16(p, o + 10)
            rate = le32(p, o + 12)
            bits = le16(p, o + 22)
          } else if (id == "data") { dataOff = o + 8; dataSize = sz }
          val step = 8L + sz.toLong + (sz & 1)
          o = math.min(o.toLong + step, p.length.toLong).toInt
        }
      }
      if (malformed || bits != 16 || rate <= 0 || channels <= 0 ||
          dataOff < 0 || dataSize < 0 ||
          dataOff.toLong + dataSize.toLong > p.length) None
      else Some((rate, channels, dataOff, dataSize / 2))
    }

    /** Raw 16-bit PCM sample decode: (sample rate, channels, first
      * min(n, maxSamples) samples). `maxSamples` bounds per-row memory
      * and work — a windowed consumer ([[Multimodal.audioBandEnergies]])
      * must never materialize a pathological clip's full data chunk. */
    def samples(r: MediaRow,
        maxSamples: Int = Int.MaxValue): Option[(Int, Int, Array[Int])] =
      header(r).map { case (rate, channels, dataOff, n) =>
        val m = math.min(n, math.max(maxSamples, 0))
        val p = r.payload
        val out = new Array[Int](m)
        var i = 0
        while (i < m) {
          val off = dataOff + i * 2
          out(i) = ((p(off) & 0xff) | (p(off + 1) << 8)).toShort.toInt
          i += 1
        }
        (rate, channels, out)
      }

    def decode(r: MediaRow): Option[AudioFeatures] =
      header(r).map { case (rate, channels, dataOff, n) =>
        // Streaming fold over the data chunk — peak/rms need every
        // sample, but never an Array[Int] twice the payload's size.
        val p = r.payload
        var (i, peak, sumSq) = (0, 0L, 0.0)
        while (i < n) {
          val off = dataOff + i * 2
          val s = ((p(off) & 0xff) | (p(off + 1) << 8)).toShort.toInt
          if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
          sumSq += s.toDouble * s; i += 1
        }
        val rms =
          if (n == 0) 0.0
          else BigDecimal(math.sqrt(sumSq / n))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        AudioFeatures(r.media_id, n, rate, channels, peak, rms,
          n.toLong * 1000L / (rate.toLong * channels))
      }

    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def tag(b: Array[Byte], o: Int): String =
      if (o + 4 <= b.length)
        new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      else ""
  }

  /** Synthesize a REAL mono 16-bit PCM WAV payload per document:
    * canonical 44-byte RIFF header + one sample per text character,
    * sample = (code − 96)·256 (letters land in a quiet band, spaces
    * swing negative — a deterministic waveform both engines can state
    * in closed form). This is the audio analogue of [[asMedia]]: the
    * payload is a genuine container the [[PcmDecoder]] round-trips.
    */
  def asWavMedia(docs: DataFrame, sampleRate: Int = 8000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val n = text.length
        val dataSize = n * 2
        val out = new Array[Byte](44 + dataSize)
        def w32(o: Int, v: Int): Unit = {
          out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
          out(o + 2) = ((v >> 16) & 0xff).toByte
          out(o + 3) = ((v >> 24) & 0xff).toByte
        }
        def w16(o: Int, v: Int): Unit = {
          out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
        }
        def wtag(o: Int, s: String): Unit =
          s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
            .copyToArray(out, o)
        wtag(0, "RIFF"); w32(4, 36 + dataSize); wtag(8, "WAVE")
        wtag(12, "fmt "); w32(16, 16); w16(20, 1) // PCM
        w16(22, 1); w32(24, sampleRate) // mono
        w32(28, sampleRate * 2); w16(32, 2); w16(34, 16)
        wtag(36, "data"); w32(40, dataSize)
        var i = 0
        while (i < n) {
          w16(44 + i * 2, (text.charAt(i).toInt - 96) * 256)
          i += 1
        }
        MediaRow(id, "audio", out)
      }.toDF()
  }

  /** Per-partition batched PCM feature extraction — same mapPartitions
    * batch shape as [[extractFeatures]], with genuinely decoded
    * samples. Non-PCM rows are dropped.
    */
  def audioStats(media: DataFrame): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(it => it.flatMap(PcmDecoder.decode))
  }

  /** Container-level video features from an ISO-BMFF (MP4) box walk —
    * what a pretraining pipeline catalogs before any codec runs:
    * presentation duration, track inventory, the video track's coded
    * dimensions and codec fourcc. */
  case class VideoFeatures(media_id: Long, duration_ms: Long,
      timescale: Long, n_tracks: Long, width: Long, height: Long,
      video_codec: String, audio_codec: String)

  /** ISO-BMFF (MP4/MOV) box walker — header-real like the image
    * decoders (ISO/IEC 14496-12 box grammar: 4-byte big-endian size +
    * fourcc; size 1 = 64-bit largesize follows, size 0 = to end of
    * enclosing box; `moov`/`trak`/`mdia`/`minf`/`stbl` are pure
    * containers). Extracts:
    *  - `mvhd` (v0 or v1): movie timescale + duration →
    *    duration_ms = duration × 1000 / timescale;
    *  - one entry per `trak`: `tkhd` width/height (16.16 fixed point),
    *    `hdlr` handler fourcc (vide/soun), and the first `stsd`
    *    sample-entry fourcc (the codec: avc1, hvc1, mp4a, …);
    *  - width/height/video_codec from the FIRST `vide` track,
    *    audio_codec from the first `soun` track (`none` when absent).
    * Every size field is attacker-controlled: advances are strictly
    * positive and bounds-checked; a malformed size stops that box's
    * walk with whatever was decoded so far. Non-BMFF payloads (no
    * `ftyp`/`moov` at the top level) return None.
    */
  object Mp4Decoder {
    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def be64(b: Array[Byte], o: Int): Long =
      (be32(b, o) << 32) | be32(b, o + 4)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    private case class Trak(var handler: String = "",
      var codec: String = "", var w: Long = 0L, var h: Long = 0L)

    private val Containers =
      Set("moov", "trak", "mdia", "minf", "stbl")

    def decode(r: MediaRow): Option[VideoFeatures] = {
      val p = r.payload
      if (p.length < 16) return None
      var sawBmff = false
      var timescale = 0L
      var duration = 0L
      val traks = scala.collection.mutable.ArrayBuffer.empty[Trak]
      var cur: Trak = null

      def walk(start: Int, end: Int, depth: Int): Unit = {
        var o = start
        while (o + 8 <= end && depth < 8) {
          var size = be32(p, o)
          val typ = tag(p, o + 4)
          var hdr = 8
          if (size == 1L && o + 16 <= end) { size = be64(p, o + 8); hdr = 16 }
          else if (size == 0L) size = (end - o).toLong
          if (size < hdr || o + size > end) return // malformed: stop
          val bEnd = (o + size).toInt
          typ match {
            case "ftyp" => sawBmff = true
            case "moov" => sawBmff = true; walk(o + hdr, bEnd, depth + 1)
            case "trak" =>
              // save/restore around the recursion: a (malformed) trak
              // nested inside a trak must not leave the OUTER track's
              // remaining hdlr/stsd boxes unattributed
              val outer = cur
              cur = Trak(); traks += cur
              walk(o + hdr, bEnd, depth + 1)
              cur = outer
            case t if Containers(t) => walk(o + hdr, bEnd, depth + 1)
            case "mvhd" if o + hdr + 4 <= bEnd =>
              val v = p(o + hdr) & 0xff
              // v1 payload: ver/flags(4) ctime(8) mtime(8) timescale(4)
              // duration(8) — the be64 below reads bytes 24..31
              if (v == 1 && o + hdr + 32 <= bEnd) {
                timescale = be32(p, o + hdr + 20)
                duration = be64(p, o + hdr + 24)
              } else if (v == 0 && o + hdr + 20 <= bEnd) {
                timescale = be32(p, o + hdr + 12)
                duration = be32(p, o + hdr + 16)
              }
            case "tkhd" if cur != null && o + hdr + 4 <= bEnd =>
              val v = p(o + hdr) & 0xff
              // width/height are the LAST 8 bytes of the fixed-size
              // payload (v0: 84, v1: 96), 16.16 fixed point
              val wOff = o + hdr + (if (v == 1) 88 else 76)
              if (wOff + 8 <= bEnd) {
                cur.w = be32(p, wOff) >> 16
                cur.h = be32(p, wOff + 4) >> 16
              }
            case "hdlr" if cur != null && o + hdr + 12 <= bEnd =>
              cur.handler = tag(p, o + hdr + 8)
            case "stsd" if cur != null && o + hdr + 16 <= bEnd =>
              // ver/flags(4) entry_count(4) then the first sample
              // entry: size(4) + codec fourcc(4)
              cur.codec = tag(p, o + hdr + 12)
            case _ => () // leaf we don't decode (mdat, free, mdhd, …)
          }
          o = bEnd
        }
      }
      walk(0, p.length, 0)
      if (!sawBmff) return None
      val vid = traks.find(_.handler == "vide")
      val aud = traks.find(_.handler == "soun")
      Some(VideoFeatures(r.media_id,
        duration_ms =
          if (timescale > 0) duration * 1000L / timescale else 0L,
        timescale = timescale, n_tracks = traks.size.toLong,
        width = vid.map(_.w).getOrElse(0L),
        height = vid.map(_.h).getOrElse(0L),
        video_codec = vid.map(_.codec).filter(_.nonEmpty).getOrElse("none"),
        audio_codec = aud.map(_.codec).filter(_.nonEmpty).getOrElse("none")))
    }
  }

  /** Synthesize a REAL (minimal) ISO-BMFF container per doc, like
    * [[asWavMedia]] does for RIFF: `ftyp(isom)` + `moov[mvhd +
    * trak(avc1 video) + (odd ids) trak(mp4a audio)] + mdat(text
    * bytes)`. Deterministic in both engines: timescale 1000, duration
    * = 40 ticks/char (25 fps), video dimensions derived from the first
    * two text bytes exactly like [[FakeDecoder]], so the oracle states
    * every extracted field in closed form.
    */
  def asMp4Media(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        def be32(v: Long): Array[Byte] = Array(
          ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
          val body = payload.flatten.toArray
          be32(8L + body.length) ++
            typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body
        }
        val n = text.length
        val b0 = if (n > 0) text.charAt(0).toInt & 0xff else 0
        val b1 = if (n > 1) text.charAt(1).toInt & 0xff else 0
        val width = 64L + (b0 % 16) * 32L
        val height = 64L + (b1 % 9) * 32L
        val mvhd = box("mvhd",
          be32(0), // version 0 + flags
          be32(0), be32(0), // ctime, mtime
          be32(1000), // timescale
          be32(n.toLong * 40L), // duration: 40 ticks/char
          be32(0x00010000L), Array[Byte](0, 0x64.toByte, 0, 0), // rate, volume+res
          new Array[Byte](8), // reserved
          // identity matrix
          be32(0x00010000L), be32(0), be32(0),
          be32(0), be32(0x00010000L), be32(0),
          be32(0), be32(0), be32(0x40000000L),
          new Array[Byte](24), // pre_defined
          be32(3)) // next_track_ID
        def tkhd(trackId: Long, w: Long, h: Long): Array[Byte] = box("tkhd",
          be32(7), // version 0, flags: enabled|in_movie|in_preview
          be32(0), be32(0), be32(trackId), be32(0),
          be32(n.toLong * 40L), // duration (movie timescale)
          new Array[Byte](8), // reserved
          new Array[Byte](8), // layer, alt_group, volume, reserved
          be32(0x00010000L), be32(0), be32(0),
          be32(0), be32(0x00010000L), be32(0),
          be32(0), be32(0), be32(0x40000000L),
          be32(w << 16), be32(h << 16)) // 16.16 fixed point
        def hdlr(handler: String): Array[Byte] = box("hdlr",
          be32(0), be32(0),
          handler.getBytes(java.nio.charset.StandardCharsets.US_ASCII),
          new Array[Byte](12), Array[Byte](0)) // reserved + empty name
        def stsd(codec: String): Array[Byte] = box("stsd",
          be32(0), be32(1), // version/flags, entry_count
          box(codec, new Array[Byte](8))) // minimal sample entry
        def trak(trackId: Long, handler: String, codec: String,
            w: Long, h: Long): Array[Byte] =
          box("trak", tkhd(trackId, w, h),
            box("mdia", hdlr(handler),
              box("minf", box("stbl", stsd(codec)))))
        val traks =
          if (id % 2 == 1)
            Array(trak(1, "vide", "avc1", width, height),
              trak(2, "soun", "mp4a", 0, 0))
          else Array(trak(1, "vide", "avc1", width, height))
        val payload = box("ftyp",
            "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
            be32(512),
            "mp42".getBytes(java.nio.charset.StandardCharsets.US_ASCII)) ++
          box("moov", (Array(mvhd) ++ traks): _*) ++
          box("mdat", text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        MediaRow(id, "video", payload)
      }.toDF()
  }

  /** Per-partition batched ISO-BMFF feature extraction — the video
    * modality's catalog pass (m4). Non-BMFF rows are dropped. */
  def videoFeatures(media: DataFrame): Dataset[VideoFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(it => it.flatMap(Mp4Decoder.decode))
  }

  /** Walsh square-wave band energies per clip. */
  case class AudioBands(media_id: Long, e0: Long, e1: Long, e2: Long,
      e3: Long, dominant_band: Long)

  /** Spectral-proxy features over genuinely decoded PCM — the cheap
    * frequency summary of audio curation (silence vs tone vs noise
    * discrimination) WITHOUT a floating-point FFT: band k correlates
    * the first `window` samples against the ±1 square wave of period
    * 2^(k+1) (a Walsh function: sign_k(i) = +1 when ((i >> k) & 1) ==
    * 0), and energy_k = correlation². Walsh bases take only ±1, so the
    * whole feature is INTEGER-exact end to end — no libm trig parity
    * risk between engines, the DuckDB oracle matches byte-for-byte
    * (the reason this is Walsh and not a DFT: a cos()-based power at
    * 4 dp would hash-compare on the last ulp of two different libm
    * implementations). dominant_band = argmax energy, ties to the
    * smaller band. Non-PCM rows are dropped; `window` bounds per-row
    * work so a pathological clip can't stall a partition.
    */
  def audioBandEnergies(media: DataFrame,
      window: Int = 64): Dataset[AudioBands] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.flatMap { r =>
      PcmDecoder.samples(r, window).map { case (_, _, sm) =>
        val n = sm.length
        val c = new Array[Long](4)
        var i = 0
        while (i < n) {
          val s = sm(i).toLong
          var k = 0
          while (k < 4) {
            c(k) += (if (((i >> k) & 1) == 0) s else -s)
            k += 1
          }
          i += 1
        }
        val e = c.map(x => x * x)
        var dom = 0
        var k = 1
        while (k < 4) { if (e(k) > e(dom)) dom = k; k += 1 }
        AudioBands(r.media_id, e(0), e(1), e(2), e(3), dom.toLong)
      }
    })
  }
}
