package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.queries.Tables

/** Tests for the multimodal layer: the REAL pure-JVM codecs (PNG /
  * WAV / animated GIF round trips with exactly-known ground truth),
  * plus the Spark plumbing — schema, batch shape, partitioning
  * invariance, and the expanding frame-sample iterator. */
class MultimodalSpec extends SparkSpecBase {

  private lazy val media =
    Multimodal.syntheticMedia(Tables.documents(spark, sf)).cache()

  test("codec round trip: PNG dims + mean, WAV rate/frames/RMS, GIF frames — exact") {
    val png = Multimodal.encodePng(20, 12, 137)
    val (w, h, mean, hist) = Multimodal.decodeImage(png)
    assert((w, h) === (20, 12))
    assert(mean === 137.0)                      // solid gray decodes exactly
    assert(hist(137 * Multimodal.FeatureDim / 256) === 20L * 12)

    val wav = Multimodal.encodeWav(1024, 1250, 8000)
    val (sr, n, rms, _) = Multimodal.decodeAudio(wav)
    assert((sr, n) === (8000, 1024L))
    assert(rms === 1250.0)                      // |sample| ≡ amp → RMS exact

    val gif = Multimodal.encodeGif(8, 8, Array(10, 50, 90, 130))
    val frames = Multimodal.decodeVideoFrames(gif)
    assert(frames.map(_._1) === Seq(0, 1, 2, 3))
    assert(frames.map(_._4) === Seq(10.0, 50.0, 90.0, 130.0))
    assert(frames.forall(f => f._2 == 8 && f._3 == 8))
  }

  test("synthetic media has real encoded bytes + typed metadata per kind") {
    val kinds = media.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet === Set("image", "audio", "video"))
    assert(media.filter(col("kind") === "audio" && col("sample_rate") =!= 8000)
      .count() === 0)
    assert(media.schema("bytes").dataType.typeName === "binary")
    // payloads are genuine container formats: PNG magic / RIFF / GIF8
    val heads = media.select(col("kind"), substring(col("bytes"), 1, 4).as("m"))
      .distinct().collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(heads("image") === Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    assert(heads("audio") === "RIFF".getBytes.toSeq)
    assert(heads("video") === "GIF8".getBytes.toSeq)
  }

  test("extractFeatures decodes every payload back to its synthesis parameters") {
    val f1 = Multimodal.extractFeatures(spark, media, partitions = 4).collect()
    assert(f1.length === media.count())
    f1.foreach { f =>
      assert(f.feature.length === Multimodal.FeatureDim)
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3f)   // L1-normalized
      val id = f.media_id
      f.kind match {
        case "image" =>
          assert(f.width_px === Multimodal.imageW(id))
          assert(f.height_px === Multimodal.imageH(id))
          assert(f.n_frames === 1)
          assert(f.mean_px === Multimodal.imageGray(id).toDouble)
        case "audio" =>
          assert(f.sample_rate_hz === Multimodal.AudioRate)
          assert(f.n_samples === Multimodal.audioSamples(id).toLong)
          assert(f.rms === Multimodal.audioAmp(id).toDouble)
        case "video" =>
          assert(f.n_frames === Multimodal.videoFrames(id))
          val grays = (0 until f.n_frames).map(Multimodal.videoGray(id, _))
          assert(f.mean_px === grays.sum.toDouble / grays.length)
      }
    }
    val f2 = Multimodal.extractFeatures(spark, media, partitions = 2).collect()
    assert(f1.map(f => f.media_id -> f.mean_px).toMap ===
      f2.map(f => f.media_id -> f.mean_px).toMap,
      "features must not depend on partitioning")
  }

  test("resizeImages re-encodes: new dims decode back, solid color survives scaling") {
    val out = Multimodal.resizeImages(spark, media, 32, 32)
    assert(out.filter(col("kind") === "image" && col("width") =!= 32).count() === 0)
    // non-image rows pass through untouched
    assert(out.filter(col("kind") === "audio").select("width").distinct().count() > 0)
    val one = out.filter(col("kind") === "image").limit(1).collect().head
    val (w, h, mean, _) = Multimodal.decodeImage(one.getAs[Array[Byte]]("bytes"))
    assert((w, h) === (32, 32))
    assert(mean === Multimodal.imageGray(one.getAs[Long]("media_id")).toDouble,
      "bilinear resize of a solid image keeps its color")
  }

  test("transcodeImages: PNG→JPEG keeps dims, bounds pixel drift; PNG→PNG exact") {
    val jpg = Multimodal.transcodeImages(spark,
      media.filter(col("kind") === "image"), "jpg").collect()
    jpg.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("bytes")
      assert((bytes(0) & 0xFF) === 0xFF && (bytes(1) & 0xFF) === 0xD8,
        "payload is not JPEG (SOI marker missing)")
      val id = r.getAs[Long]("media_id")
      val (w, h, mean, _) = Multimodal.decodeImage(bytes)
      assert((w, h) === (Multimodal.imageW(id), Multimodal.imageH(id)))
      assert(math.abs(mean - Multimodal.imageGray(id)) <= 2.0,
        s"JPEG drift over tolerance: id=$id mean=$mean")
    }
    // a lossless target round-trips the pixels exactly
    val png = Multimodal.transcodeImages(spark,
      media.filter(col("kind") === "image").limit(5), "png").collect()
    png.foreach { r =>
      val (_, _, mean, _) = Multimodal.decodeImage(r.getAs[Array[Byte]]("bytes"))
      assert(mean === Multimodal.imageGray(r.getAs[Long]("media_id")).toDouble)
    }
  }

  test("sampleFrames decodes real GIF frames; stride subsamples") {
    val frames = Multimodal.sampleFrames(spark, media, stride = 1)
    val perVideo = frames.groupBy("media_id").count()
    val expect = media.filter(col("kind") === "video")
      .select(col("media_id"), (lit(2) + pmod(col("media_id"), lit(5))).as("exp"))
    assert(perVideo.join(expect, "media_id")
      .filter(col("count") =!= col("exp")).count() === 0)
    val strided = Multimodal.sampleFrames(spark, media, stride = 2)
    assert(strided.filter(pmod(col("frame_idx"), lit(2)) =!= 0).count() === 0)
    assert(strided.count() < frames.count())
  }
}
