package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` payloads with typed metadata, plus
  * decode/feature-extract/resize/frame-sample stages.
  *
  * The Spark-side plumbing — schema, size-aware repartitioning, typed
  * per-partition batch processing (the JVM analogue of pandas-batch
  * UDFs) — is real and tested. The codec itself is STUBBED with a
  * deterministic fake ([[FakeCodec]]): the container has no image/audio
  * libraries, and at integration time only `decode` changes — swap
  * [[FakeCodec]] for a real decoder binding, every stage signature stays
  * identical.
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

  /** Deterministic fake codec: "decodes" payload bytes to an intensity
    * series derived from the byte stream. Real codec integration swaps
    * this object only. */
  object FakeCodec {
    /** STUB — stands in for a real image/audio decode. */
    def decode(payload: Array[Byte]): Array[Double] =
      payload.map(b => (b & 0xFF).toDouble)

    /** STUB frame-sampler: every `stride`-th decoded value. */
    def sampleFrames(decoded: Array[Double], stride: Int): Array[Double] =
      decoded.indices.collect { case i if i % stride == 0 => decoded(i) }.toArray

    /** STUB resize: linear rebin to n values. */
    def resize(decoded: Array[Double], n: Int): Array[Double] =
      if (decoded.isEmpty) new Array[Double](n)
      else Array.tabulate(n)(i => decoded((i.toLong * decoded.length / n).toInt))
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
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      // per-batch codec init would go here (model load, native ctx, ...)
      rows.map { r =>
        val decoded = FakeCodec.decode(r.payload)
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
  def resizeMedia(ds: Dataset[MediaRow], n: Int): Dataset[MediaRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val resized = FakeCodec.resize(FakeCodec.decode(r.payload), n)
        val bytes = resized.map(v => v.toInt.max(0).min(255).toByte)
        r.copy(meta = r.meta.copy(width = n, height = 1), payload = bytes)
      }
    }
  }

  /** Frame-sampling stage: 1 row -> n frame rows (video -> frames). */
  def sampleFrames(ds: Dataset[MediaRow], stride: Int): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      val frames = FakeCodec.sampleFrames(FakeCodec.decode(r.payload), stride)
      frames.zipWithIndex.map { case (v, i) => (r.id, i, v) }
    }.toDF("id", "frame_idx", "intensity")
  }
}
