package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.queries.Tables

/** Plumbing tests for the multimodal layer: schema, batch shape,
  * determinism of the stub codec, and the expanding frame-sample
  * iterator. (The codec itself is a documented stub — no image/audio
  * libs in this container.) */
class MultimodalSpec extends SparkSpecBase {

  private lazy val media =
    Multimodal.syntheticMedia(Tables.documents(spark, sf)).cache()

  test("synthetic media has opaque bytes + typed metadata per kind") {
    val kinds = media.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet === Set("image", "audio", "video"))
    assert(media.filter(col("kind") === "audio" && col("sample_rate") =!= 16000)
      .count() === 0)
    assert(media.schema("bytes").dataType.typeName === "binary")
  }

  test("extractFeatures: one feature row per media, normalized histogram, deterministic") {
    val f1 = Multimodal.extractFeatures(spark, media, partitions = 4).collect()
    assert(f1.length === media.count())
    f1.foreach { f =>
      assert(f.feature.length === Multimodal.FeatureDim)
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3f)   // L1-normalized
      assert(f.mean_byte > 0 && f.n_bytes > 0)
    }
    val f2 = Multimodal.extractFeatures(spark, media, partitions = 2).collect()
    assert(f1.map(f => f.media_id -> f.mean_byte).toMap ===
      f2.map(f => f.media_id -> f.mean_byte).toMap,
      "features must not depend on partitioning")
  }

  test("resize stub rewrites image metadata only") {
    val out = Multimodal.resizeStub(spark, media, 32, 32)
    assert(out.filter(col("kind") === "image" && col("width") =!= 32).count() === 0)
    assert(out.filter(col("kind") === "audio").select("width").distinct().count() > 0)
  }

  test("frame sampling emits duration/interval rows per video") {
    val frames = Multimodal.sampleFramesStub(spark, media, everyMs = 10000)
    val perVideo = frames.groupBy("media_id").count()
    val expect = media.filter(col("kind") === "video")
      .select(col("media_id"), ceil(col("duration_ms") / 10000.0).as("exp"))
    val joined = perVideo.join(expect, "media_id")
      .filter(col("count") =!= col("exp"))
    assert(joined.count() === 0)
  }
}
