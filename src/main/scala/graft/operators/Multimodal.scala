package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` payloads with typed metadata, plus
  * decode/feature-extract/resize/frame-sample stages.
  *
  * The Spark-side plumbing — schema, size-aware repartitioning, typed
  * per-partition batch processing (the JVM analogue of pandas-batch
  * UDFs) — is real and tested. Codecs are a [[MediaCodec]] parameter:
  * [[FakeCodec]] is the deterministic default (the x1-x3 oracle gates
  * replay its arithmetic in SQL), [[ImageIoCodec]] is a REAL image
  * binding over the JDK's javax.imageio (PNG/JPEG — no external
  * libraries, spec-verified through the same mapPartitions stages);
  * audio/video bindings would implement the same trait.
  */
object Multimodal {

  case class MediaMeta(
      mediaType: String,   // "image" | "audio" | "video"
      width: Int,          // px (image/video) | 0
      height: Int,
      sampleRateHz: Int,   // audio/video audio track | 0
      durationMs: Long,    // audio/video | 0
      codec: String)

  case class MediaRow(id: Long, meta: MediaMeta, payload: Array[Byte])

  case class MediaFeatures(
      id: Long,
      mediaType: String,
      nBytes: Long,
      // decoded-domain features (deterministic-fake today)
      meanIntensity: Double,
      stdIntensity: Double,
      histogram: Array[Long])   // 16-bin intensity histogram

  /** The codec seam: every pipeline stage is written against this
    * trait, so swapping the deterministic fake for a real binding is a
    * parameter, not a rewrite. Implementations must be Serializable —
    * they ride the mapPartitions closures to the executors. */
  trait MediaCodec extends Serializable {
    /** payload bytes → intensity series (decoded domain). */
    def decode(payload: Array[Byte]): Array[Double]

    /** intensity series → payload bytes (inverse of decode, used by the
      * resize stage's re-encode). */
    def encode(values: Array[Double]): Array[Byte]

    /** every `stride`-th decoded value. */
    def sampleFrames(decoded: Array[Double], stride: Int): Array[Double] =
      decoded.indices.collect { case i if i % stride == 0 => decoded(i) }.toArray

    /** linear rebin to n values. */
    def resize(decoded: Array[Double], n: Int): Array[Double] =
      if (decoded.isEmpty) new Array[Double](n)
      else Array.tabulate(n)(i => decoded((i.toLong * decoded.length / n).toInt))
  }

  /** Deterministic fake codec: "decodes" payload bytes to an intensity
    * series derived from the byte stream — the hash-gate default (x1-x3
    * oracles replay it in SQL, so it must stay bit-deterministic). */
  object FakeCodec extends MediaCodec {
    def decode(payload: Array[Byte]): Array[Double] =
      payload.map(b => (b & 0xFF).toDouble)

    def encode(values: Array[Double]): Array[Byte] =
      values.map(v => v.toInt.max(0).min(255).toByte)
  }

  /** Real image binding over the JDK's javax.imageio (PNG/JPEG/BMP/GIF —
    * no external libraries): decode reads the actual raster and emits
    * row-major REC.601 luminance; encode writes an n×1 grayscale PNG.
    * Proves the pipeline plumbing end-to-end on real images; the
    * Multimodal oracle gates keep [[FakeCodec]] because their DuckDB
    * side replays the fake's arithmetic in SQL. ImageIO.read returns
    * null (not an exception) for an undecodable payload — fail loud. */
  object ImageIoCodec extends MediaCodec {
    def decode(payload: Array[Byte]): Array[Double] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "ImageIoCodec: payload is not a decodable image")
      val out = new Array[Double](img.getWidth * img.getHeight)
      if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
        // grayscale: read the raster SAMPLES verbatim — getRGB would
        // route gray through the linear CS_GRAY color space and gamma-
        // shift every mid-range value (dark counts collapse to 0)
        val raster = img.getRaster
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            out(y * img.getWidth + x) = raster.getSample(x, y, 0).toDouble
            x += 1
          }
          y += 1
        }
      } else {
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            out(y * img.getWidth + x) =
              0.299 * ((rgb >> 16) & 0xFF) +
                0.587 * ((rgb >> 8) & 0xFF) +
                0.114 * (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
      }
      out
    }

    def encode(values: Array[Double]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        math.max(values.length, 1), 1,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      // raster setSample stores the gray byte verbatim (setRGB would
      // sRGB->linear convert and destroy dark values — see decode)
      val raster = img.getRaster
      values.zipWithIndex.foreach { case (v, i) =>
        raster.setSample(i, 0, 0, v.round.toInt.max(0).min(255))
      }
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      buf.toByteArray
    }
  }

  /** Real audio binding over the JDK's javax.sound.sampled (PCM WAV —
    * no external libraries): decode parses the actual RIFF container
    * and emits the first channel's samples normalized to [-1, 1];
    * encode writes 16-bit mono PCM WAV at 16 kHz. The audio twin of
    * [[ImageIoCodec]] — proves the same pipeline stages end-to-end on
    * real audio payloads; compressed codecs (mp3/ogg) would plug in as
    * further [[MediaCodec]] implementations with their decoder libs. */
  object WavCodec extends MediaCodec {
    def decode(payload: Array[Byte]): Array[Double] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        require(fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16,
          s"WavCodec: only 16-bit signed PCM supported, got $fmt")
        val bytes = in.readAllBytes()
        val frame = fmt.getFrameSize
        val out = new Array[Double](bytes.length / frame)
        val be = fmt.isBigEndian
        var i = 0
        while (i < out.length) {
          val o = i * frame
          val s =
            if (be) ((bytes(o) << 8) | (bytes(o + 1) & 0xFF)).toShort
            else ((bytes(o + 1) << 8) | (bytes(o) & 0xFF)).toShort
          out(i) = s / 32768.0
          i += 1
        }
        out
      } finally in.close()
    }

    def encode(values: Array[Double]): Array[Byte] = {
      val pcm = new Array[Byte](values.length * 2)
      var i = 0
      while (i < values.length) {
        val s = math.round(values(i).max(-1.0).min(1.0) * 32767.0).toShort
        pcm(2 * i) = (s & 0xFF).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, values.length.toLong)
      val buf = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
      buf.toByteArray
    }
  }

  /** Size-aware layout: media payloads are wildly skewed (a 4 KB icon vs
    * a 40 MB clip), so repartition by a payload-size-salted key before
    * the expensive decode stage — no 2 GB partitions, no straggler task
    * pinned to the one partition with all the videos. */
  def repartitionBySize(ds: Dataset[MediaRow], partitions: Int): Dataset[MediaRow] =
    ds.repartition(partitions,
      pmod(xxhash64(col("id"), length(col("payload"))), lit(partitions.toLong)))

  /** Decode + featurize, batched per partition (mapPartitions = the JVM
    * shape of a pandas-batch UDF: amortize any per-batch codec setup
    * across the whole partition iterator). */
  def extractFeatures(ds: Dataset[MediaRow],
                      codec: MediaCodec = FakeCodec): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      // per-batch codec init would go here (model load, native ctx, ...)
      rows.map { r =>
        val decoded = codec.decode(r.payload)
        val n = decoded.length
        val mean = if (n == 0) 0.0 else decoded.sum / n
        val std =
          if (n == 0) 0.0
          else math.sqrt(decoded.map(v => (v - mean) * (v - mean)).sum / n)
        val hist = new Array[Long](16)
        decoded.foreach(v => hist((v / 16).toInt.min(15)) += 1)
        MediaFeatures(r.id, r.meta.mediaType, r.payload.length.toLong,
          mean, std, hist)
      }
    }
  }

  /** Resize stage: 1 row -> 1 row, payload re-encoded at the target
    * geometry and the metadata updated to match — the batch-normalize
    * step every image pipeline runs before tensor conversion. Decoded
    * values are clipped back into byte range on re-encode (the fake
    * codec round-trip; a real codec binding swaps [[FakeCodec]] only,
    * the stage shape — mapPartitions after [[repartitionBySize]] — is
    * the production one). */
  def resizeMedia(ds: Dataset[MediaRow], n: Int,
                  codec: MediaCodec = FakeCodec): Dataset[MediaRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val bytes = codec.encode(codec.resize(codec.decode(r.payload), n))
        r.copy(meta = r.meta.copy(width = n, height = 1), payload = bytes)
      }
    }
  }

  /** Frame-sampling stage: 1 row -> n frame rows (video -> frames). */
  def sampleFrames(ds: Dataset[MediaRow], stride: Int,
                   codec: MediaCodec = FakeCodec): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      val frames = codec.sampleFrames(codec.decode(r.payload), stride)
      frames.zipWithIndex.map { case (v, i) => (r.id, i, v) }
    }.toDF("id", "frame_idx", "intensity")
  }
}
