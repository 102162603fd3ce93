package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling — training-data
  * pipeline layer (builder brief). The engine treats media as opaque
  * `binary` columns plus typed metadata, exactly like a production
  * lakehouse: bytes are never interpreted by the engine, only by
  * per-partition decode functions.
  *
  * The Spark-side plumbing — schema, range partitioning by media id,
  * iterator-in/iterator-out batch shape (`mapPartitions` over typed
  * Datasets, the JVM analogue of `mapInPandas`) — is real and tested.
  * The codec step itself is a STUB: this container has no image/audio
  * libraries, so `decodeStub` derives deterministic pseudo-features
  * from the raw bytes (documented below); swap `decodeStub` for a real
  * codec (JavaCV/TwelveMonkeys/ffmpeg) without touching any plumbing.
  */
object Multimodal {

  /** One media object: opaque payload + typed metadata. */
  final case class MediaFile(
      media_id: Long,
      kind: String,             // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int,               // images/video
      height: Int,
      sample_rate: Int,         // audio
      duration_ms: Int)         // audio/video

  /** Decoded per-media features (fixed-width vector + scalars). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      mean_byte: Double,
      feature: Array[Float])    // FEATURE_DIM-dim embedding-like vector

  val FeatureDim = 16

  /** Synthesize a deterministic media table from `documents`: payload =
    * UTF-8 bytes of the text (a stand-in for real image/audio bytes);
    * metadata derived arithmetically from doc_id. This gives every
    * scale factor a media corpus without shipping binaries. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      to_binary(col("text"), lit("utf-8")).as("bytes"),
      (lit(64) + pmod(col("doc_id"), lit(64))).cast("int").as("width"),
      (lit(64) + pmod(col("doc_id") * 7, lit(64))).cast("int").as("height"),
      when(pmod(col("doc_id"), lit(3)) === 1, lit(16000)).otherwise(lit(0))
        .cast("int").as("sample_rate"),
      (pmod(col("doc_id") * 37, lit(90000)) + lit(1000)).cast("int")
        .as("duration_ms"))

  /** STUB decode: deterministic pseudo-features from raw bytes — a
    * 16-bin byte histogram (L1-normalized) plus byte-mean. Replace with
    * a real codec; the signature (one `MediaFile` in, one
    * `MediaFeatures` out, called inside a partition iterator) is the
    * production contract. */
  def decodeStub(m: MediaFile): MediaFeatures = {
    val hist = new Array[Float](FeatureDim)
    var sum = 0L
    var i = 0
    while (i < m.bytes.length) {
      val b = m.bytes(i) & 0xFF
      hist(b * FeatureDim / 256) += 1f
      sum += b
      i += 1
    }
    val n = math.max(1, m.bytes.length)
    var j = 0
    while (j < FeatureDim) { hist(j) /= n.toFloat; j += 1 }
    MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong,
      sum.toDouble / n, hist)
  }

  /** Decode/feature-extract over a media relation: typed
    * `mapPartitions` — the whole partition streams through one
    * iterator (batch shape ≡ `mapInPandas`), so per-call codec setup
    * (model load, ffmpeg context) amortizes across the partition.
    * Repartitions by media_id range so decode work spreads evenly
    * regardless of upstream file layout. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      partitions: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val typed = media.select(col("media_id"), col("kind"), col("bytes"),
        col("width"), col("height"), col("sample_rate"), col("duration_ms"))
      .as[MediaFile]
    val parted =
      if (partitions > 0) typed.repartitionByRange(partitions, col("media_id"))
      else typed
    parted.mapPartitions { it =>
      // per-partition setup for a real codec would happen here, once
      it.map(decodeStub)
    }
  }

  /** Resize stub for image media: the real implementation would decode,
    * scale to (w, h) and re-encode inside the partition iterator; the
    * stub rewrites the metadata and passes bytes through unchanged
    * (clearly marked — bytes are NOT actually resampled). */
  def resizeStub(spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions { it =>
      it.map(m =>
        if (m.kind == "image") m.copy(width = w, height = h) else m)
    }.toDF()
  }

  /** Frame-sampling stub for video media: emits one row per sampled
    * frame timestamp (every `everyMs`) with the parent payload's
    * metadata — the iterator-to-iterator *expanding* shape
    * (flatMap within mapPartitions) that real frame extraction uses. */
  def sampleFramesStub(spark: SparkSession, media: DataFrame,
      everyMs: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions { it =>
      it.flatMap { m =>
        if (m.kind != "video") Iterator.empty
        else (0 until m.duration_ms by everyMs).iterator.map(ts =>
          (m.media_id, ts, m.width, m.height))
      }
    }.toDF("media_id", "frame_ts_ms", "width", "height")
  }
}
